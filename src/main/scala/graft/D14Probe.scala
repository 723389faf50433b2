package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for incremental MinHash near-dup dedup (d14): a FIXED
  * daily batch (sf0.1 documents) deduped against an index that grows
  * SPARK_GRAFT_REPLICAS x — the production shape where the corpus index
  * dwarfs the ingest batch. The cost driver to watch is the LSH banding
  * shuffle over index+batch signatures: it is linear in index size, and
  * the probe's 10x/100x rows should show that linearity (a superlinear
  * jump would mean a degenerate bucket survived the cap).
  */
object D14Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val n0 = base.count()
    // index: replicas x the base corpus under distinct ids, each block
    // token-padded so cross-block rows are near- but not exact-identical
    // (the worst case: every batch doc has ~replicas near-dup index hits)
    val index = (0 until replicas).map { i =>
      base.select((col("doc_id") + lit((i + 1) * n0)).as("doc_id"),
        concat(col("text"), lit(s" idx$i")).as("text"))
    }.reduce(_ union _).persist()
    val nIdx = index.count()
    val batch = base.persist()
    batch.count()

    val t0 = System.nanoTime()
    val survivors = Dedup.incrementalMinhashDedup(
      batch, index, "doc_id", "text").count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[d14probe-${replicas}x] index $nIdx batch $n0 " +
      f"survivors $survivors time $sec%.1f s")
    spark.stop()
  }
}
