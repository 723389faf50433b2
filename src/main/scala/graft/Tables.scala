package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet test tables (TESTDATA.md).
  *
  * Each table is one parquet file under `/root/testdata/sf{X}/`. At scale
  * these would be partitioned directories; `spark.read.parquet` is agnostic
  * to that, so the same code path serves both.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")

  /** The events table's `ts` column has shipped in two physical forms across
    * fixture generations: TIMESTAMP(NANOS) (which the parquet reader rejects
    * by default — we read nanos as long and truncate to Spark-native micros)
    * and plain timestamp[us] (read natively). Branch on the LOADED schema so
    * either generation works, and normalize to TimestampType (session-TZ) so
    * downstream plans and gate hashes are identical either way.
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // epoch-nanos as long: integer division (`div`, not `/`) — double
        // division cannot represent epoch-nanos exactly (2^53 < 1.7e18)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // NTZ micros: reinterpret wall-clock as session-TZ instants so the
        // column type (and therefore every gate hash) matches the nanos path
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported fixture type $other — adapt Tables.loadEvents")
    }
  }

  /** Register every table as a temp view so Spark SQL text works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Column contract per fixture table. The driver regenerates
    * /root/testdata between rounds and physical types have drifted before
    * (events.ts: TIMESTAMP(NANOS) → timestamp[us] between rounds 6 and 7,
    * silently breaking 7 gates). `verifySchemas` turns the next drift into
    * ONE loud failure naming the table and column instead.
    */
  val expectedColumns: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Assert every fixture table's post-load contract: exact column set, and
    * the normalized types downstream plans rely on (timestamps really
    * timestamps, embeddings really float arrays). Known physical variants
    * are adapted inside `load` — this checks the RESULT of that adaptation,
    * so an unhandled new variant fails here with the table+column named.
    * Returns the list of violations (empty = contract holds).
    */
  def schemaViolations(spark: SparkSession, dir: String): Seq[String] = {
    import org.apache.spark.sql.types._
    all.flatMap { name =>
      val schema = load(spark, dir, name).schema
      val got = schema.map(_.name)
      val want = expectedColumns(name)
      val missing = want.filterNot(got.contains).map(c => s"$name: missing column $c")
      val extra = got.filterNot(want.contains).map(c => s"$name: unexpected column $c")
      def typeOf(c: String) = schema(c).dataType
      val typed: Seq[String] = name match {
        case "events" if missing.isEmpty =>
          Seq(
            ("ts", typeOf("ts") == TimestampType, "TimestampType after normalization"),
            ("value", typeOf("value") == DoubleType, "DoubleType"),
            ("props", typeOf("props") == StringType, "StringType (json text)"))
            .collect { case (c, ok, req) if !ok =>
              s"$name: column $c is ${typeOf(c)}, need $req" }
        case "embeddings" if missing.isEmpty =>
          typeOf("embedding") match {
            case ArrayType(FloatType, _) => Nil
            case t => Seq(s"$name: column embedding is $t, need array<float>")
          }
        case "orders" if missing.isEmpty =>
          if (Seq(TimestampType, TimestampNTZType, DateType).contains(typeOf("o_orderdate"))) Nil
          else Seq(s"$name: column o_orderdate is ${typeOf("o_orderdate")}, need a date/timestamp type")
        case "lineitem" if missing.isEmpty =>
          if (Seq(TimestampType, TimestampNTZType, DateType).contains(typeOf("l_shipdate"))) Nil
          else Seq(s"$name: column l_shipdate is ${typeOf("l_shipdate")}, need a date/timestamp type")
        case "documents" if missing.isEmpty =>
          Seq(("text", StringType), ("lang", StringType), ("source", StringType))
            .collect { case (c, t) if typeOf(c) != t =>
              s"$name: column $c is ${typeOf(c)}, need $t" }
        case _ => Nil
      }
      missing ++ extra ++ typed
    }
  }
}
