package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers graft's native expressions as SQL functions, so
  * `spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")` works
  * exactly like the Scala column API. Install with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }
  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // pure-SQL DML on manifest tables: INSERT INTO a `USING manifest`
    // view rewrites to a keyed merge BEFORE the post-hoc
    // HadoopFsRelation conversion could turn it into a raw parquet
    // write into the table root (see ManifestInsertRule)
    ext.injectResolutionRule(session =>
      new graft.plans.ManifestInsertRule(session))
    // SQL `VERSION AS OF` on catalog-registered manifest tables: the
    // analyzer refuses time travel on v1 relations before any
    // resolution rule runs, so the rewrite lives in a parser wrapper
    ext.injectParser((session, delegate) =>
      new graft.plans.ManifestSqlParser(session, delegate))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(vec, vec)")
        CosineSimilarity(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokens)")
        SimHash64(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_signature(shingles, numHashes, seed)")
        MinHashSignature(args(0), intArg(args(1), "numHashes"),
          longArg(args(2), "seed"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sigs"),
      new ExpressionInfo(classOf[HyperplaneSignatures].getName, "hyperplane_sigs"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "hyperplane_sigs(vec, bits, tables, seed)")
        HyperplaneSignatures(args(0), intArg(args(1), "bits"),
          intArg(args(2), "tables"), longArg(args(3), "seed"))
      }))
    // the sketch aggregates: GROUP BY-able from SQL text like any
    // built-in aggregate (SELECT k, kmv_sketch(xxhash64(u), 1024) ...)
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_sketch(hash_long, k)")
        KmvSketchAgg(args(0), intArg(args(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_merge"),
      new ExpressionInfo(classOf[KmvMergeAgg].getName, "kmv_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_merge(sketch, k)")
        KmvMergeAgg(args(0), intArg(args(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_keys"),
      new ExpressionInfo(classOf[TopKeysAgg].getName, "top_keys"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "top_keys(key_string, capacity)")
        TopKeysAgg(args(0), intArg(args(1), "capacity"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kll_sketch(value_double, k)")
        KllSketchAgg(args(0), intArg(args(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_merge"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kll_merge(sketch, k)")
        KllMergeAgg(args(0), intArg(args(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[WeightedQuantile].getName, "kll_quantile"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kll_quantile(sketch, q)")
        WeightedQuantile(args(0), doubleArg(args(1), "q"))
      }))
  }
}
