package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** 10x scale probe for the transitive-closure dedup (d07): sf0.1
  * documents (50k docs, dup-dense). Checks the persist-leak fix — after
  * the run, no residual cached RDDs may remain (the old code pinned one
  * persisted join per label-propagation round plus the edge list).
  */
object D07Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    val t0 = System.nanoTime()
    val survivors = Dedup.clusteredSurvivors(docs,
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.8), "doc_id")
    val n = survivors.count()
    val sec = (System.nanoTime() - t0) / 1e9
    // everything transient must be released; only the probe's own zero
    // persists may remain
    val cached = spark.sparkContext.getPersistentRDDs.size
    println(f"[d07] survivors $n time $sec%.1f s residual_cached_rdds $cached")
    // d12: same components + per-component argmax window (dup subgraph only)
    val t1 = System.nanoTime()
    val best = Dedup.clusteredSurvivorsBy(docs,
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.8), "doc_id",
      graft.functions.TextFunctions.qualityScore(col("text")))
    val nb = best.count()
    val sec2 = (System.nanoTime() - t1) / 1e9
    println(f"[d12] survivors $nb time $sec2%.1f s")
    spark.stop()
  }
}
