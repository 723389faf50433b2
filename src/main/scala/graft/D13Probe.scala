package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-split probe for the adversarial-density composition (d13) at
  * the 100x dup-dense config: times the banded pre-collapse alone, then
  * the full composition, so the stage-1 vs stage-2 split is measured
  * (not inferred). SPARK_GRAFT_REPLICAS overrides the density.
  */
object D13Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "100").toInt)
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val n0 = base.count()
    val corpus = (0 until replicas).map { i =>
      base.select(
        (col("doc_id") + lit(i * n0)).as("doc_id"),
        (if (i == 0) col("text")
         else concat(col("text"), lit(s" pad$i"))).as("text"))
    }.reduce(_ union _).persist()
    corpus.count()

    val t0 = System.nanoTime()
    val pre = Dedup.bandedPreCollapse(corpus, "doc_id", "text").count()
    println(f"[d13probe-${replicas}x] stage1_precollapse rows $pre " +
      f"time ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    corpus.persist(); corpus.count()

    val t1 = System.nanoTime()
    val full = Dedup.bandedSurvivorsBy(corpus, "doc_id", "text",
      graft.functions.TextFunctions.qualityScore(col("text"))).count()
    println(f"[d13probe-${replicas}x] full_composition rows $full " +
      f"time ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
