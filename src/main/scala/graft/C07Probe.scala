package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Sampling}

/** Stage-split probe for the c07 composition at sf0.1: times each stage
  * boundary separately so the cost attribution is measured, not guessed.
  */
object C07Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[c07probe] $name rows $rows time ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val d = Tables.load(spark, dir, "documents")
    // the round-10 intake: ONE wide scan scores into a pinned narrow
    // bin table; thresholds/rates/mix read the pinned rows. The stage
    // copies below mirror CurationQueries.intakeMixedIds (the single
    // shared definition the gates use) — duplicated HERE only so each
    // stage can be timed separately; drift affects probe attribution
    // numbers, never gate results.
    val scored = d.select(col("doc_id"), col("lang"), col("source"),
        floor(qualityScore(col("text")) * lit(1000.0)).cast("long")
          .as("bin"))
      .persist()
    timed("scored(pinned)")(scored.count())
    val thr = Sampling.binnedQuantileThresholds(
      scored.select(col("lang"), col("bin")), "lang", qNum = 1, qDen = 2)
    val keptIds = scored.join(broadcast(thr), Seq("lang"))
      .filter(col("bin") >= col("thr_bin"))
      .select("doc_id", "lang", "source")
    timed("keptIds")(keptIds.count())
    val rates = Sampling.temperatureThresholds(keptIds, "source")
    val mixedIds = keptIds.join(broadcast(rates), Seq("source"))
      .filter(Sampling.splitHash(col("doc_id")) < col("__thr"))
      .select("doc_id", "lang", "source")
    timed("mixedIds")(mixedIds.count())
    val mixed = d.join(mixedIds.select("doc_id"), Seq("doc_id"))
    timed("mixed(text join)")(mixed.count())
    val pairs = Dedup.ngramJaccardPairs(mixed, "doc_id", "text",
      shingleSize = 3, threshold = 0.8)
    timed("pairs")(pairs.count())
    timed("cc_sub")(Dedup.componentLabels(pairs, "doc_id").count())
    timed("cc_full")(
      Dedup.connectedComponents(mixed.select("doc_id"), pairs, "doc_id").count())
    timed("split")(Dedup.leakageSafeSplit(mixed, pairs, "doc_id", 0.8, 0.1)
      .count())
    timed("full_fresh") {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      CurationQueries.defs("c07_curation_v2")(spark, dir).count()
    }
    spark.stop()
  }
}
