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

  /** The events table carries a TIMESTAMP(NANOS) column, which the parquet
    * reader rejects by default. Read nanos as long, then truncate to Spark's
    * native microsecond timestamps (the synthetic data is second-resolution,
    * so no precision is lost).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // integer division: `/` on longs is DOUBLE division, which cannot
    // represent epoch-nanos exactly (2^53 < 1.7e18) and rounds the
    // microsecond
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every table as a temp view so Spark SQL text works too. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
