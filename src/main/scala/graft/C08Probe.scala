package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{Dedup, Sampling}

/** Dup-dense probe for the adversarial intake (c08 vs the exact-only c07
  * form): replicates the sf0.1 documents table `SPARK_GRAFT_REPLICAS`
  * times (default 10) with per-replica pads — every document becomes a
  * k-dense near-identical family, the boilerplate-heavy web shape — and
  * times the full intake (quality cut -> temperature mix -> pair family
  * -> leakage-safe split) with the banded pre-collapse ahead of the pair
  * family (c08). `SPARK_GRAFT_EXACT=1` also times the exact-only form
  * (c07's composition) on the same corpus — expect Ω(k²) verified pairs
  * per family there (the form that measured 40 min at 100x for the pure
  * dedup family, NOTES.md round 5); the banded form stays linear.
  */
object C08Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "lang", "source", "text")
    val n0 = base.count()
    val corpus = (0 until replicas).map { i =>
      base.select(
        (col("doc_id") + lit(i * n0)).as("doc_id"),
        col("lang"), col("source"),
        (if (i == 0) col("text")
         else concat(col("text"), lit(s" pad$i"))).as("text"))
    }.reduce(_ union _).persist()
    corpus.count()

    def intake(banded: Boolean, sizePrefilter: Boolean = true): Long = {
      val kept = corpus.join(
        Sampling.calibratedQuantileFilter(corpus, "lang", "doc_id",
          qualityScore(col("text")), bins = 1000, qNum = 1, qDen = 2)
          .select("doc_id"),
        Seq("doc_id"))
      val mixed = Sampling.temperatureMix(kept, "source", "doc_id")
      val pairInput =
        if (banded) Dedup.bandedPreCollapse(mixed, "doc_id", "text",
          sizePrefilter = sizePrefilter)
        else mixed
      Dedup.leakageSafeSplit(pairInput,
        Dedup.ngramJaccardPairs(pairInput, "doc_id", "text",
          shingleSize = 3, threshold = 0.8), "doc_id",
        trainFrac = 0.8, valFrac = 0.1).count()
    }

    if (!sys.env.get("SPARK_GRAFT_SKIP_BANDED").contains("1")) {
      val t0 = System.nanoTime()
      val nBanded = intake(banded = true)
      println(f"[c08probe-${replicas}x] banded_intake rows $nBanded " +
        f"time ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // A/B the star-edge size prefilter in ONE JVM (host noise swamps
    // cross-run comparison): alternate off/on passes
    if (sys.env.get("SPARK_GRAFT_AB_PREFILTER").contains("1")) {
      for (pass <- 1 to 2; pre <- Seq(false, true)) {
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
        corpus.persist(); corpus.count()
        val t = System.nanoTime()
        val n = intake(banded = true, sizePrefilter = pre)
        println(f"[c08probe-${replicas}x] banded_prefilter_${pre}_p$pass rows $n " +
          f"time ${(System.nanoTime() - t) / 1e9}%.1f s")
      }
    }

    if (sys.env.get("SPARK_GRAFT_EXACT").contains("1")) {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      corpus.persist(); corpus.count()
      val t1 = System.nanoTime()
      val nExact = intake(banded = false)
      println(f"[c08probe-${replicas}x] exact_intake rows $nExact " +
        f"time ${(System.nanoTime() - t1) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
