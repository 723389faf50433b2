package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the q51/q57 scale claim: SpaceSaving top-k over a synthetic
  * hot-key stream vs the exact groupBy it replaces. 20M rows, 50 hot
  * keys carrying ~90% of traffic over ~2M cold singletons — the "top
  * domains over a petabyte" shape. The exact form shuffles the full
  * key space; the sketch ships one capacity-bounded buffer per
  * partition. Also verifies both report the same top-10 (hot keys are
  * far above the N/capacity presence threshold).
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.expressions.TopKeys
    val n = 20000000L
    val keyed = spark.range(n).select(
      when(pmod(col("id"), lit(100)) < 90,
        concat(lit("hot_"), pmod(col("id"), lit(50)).cast("string")))
        .otherwise(concat(lit("cold_"), col("id").cast("string")))
        .as("key"))
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sketchprobe] $name time ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    keyed.count() // materialize codegen, warm input
    val exact = timed("exact_groupby_top10") {
      keyed.groupBy("key").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("key")).limit(10)
        .collect().map(_.getString(0)).toSeq
    }
    val sketch = timed("spacesaving_top10 (capacity 4096)") {
      keyed.agg(TopKeys.agg(col("key"), 4096).as("tk"))
        .select(explode(slice(col("tk"), 1, 10)).as("t"))
        .select(col("t.key")).collect().map(_.getString(0)).toSeq
    }
    println(s"[sketchprobe] top10 sets equal: ${exact.toSet == sketch.toSet}")

    // KMV distinct: ~2,000,050 true distinct keys
    import graft.expressions.{Kll, Kmv}
    val trueDistinct = timed("exact_count_distinct") {
      keyed.agg(countDistinct(col("key"))).head().getLong(0)
    }
    val kmvEst = timed("kmv_estimate (k=1024)") {
      keyed.select(xxhash64(col("key")).as("h"))
        .agg(Kmv.estimate(Kmv.sketch(col("h"), 1024), 1024).as("est"))
        .head().getDouble(0)
    }
    println(f"[sketchprobe] distinct exact $trueDistinct vs kmv $kmvEst%.0f " +
      f"(err ${100.0 * math.abs(kmvEst - trueDistinct) / trueDistinct}%.1f%%)")

    // KLL median of 20M uniform values vs the true order statistic
    val vals = spark.range(n).select(
      (col("id") * 2654435761L % 1000000L).cast("double").as("v"))
    val kllMed = timed("kll_median (k=256)") {
      vals.agg(Kll.quantile(Kll.sketch(col("v"), 256), 0.5)).head().getDouble(0)
    }
    println(f"[sketchprobe] kll p50 $kllMed%.0f vs uniform-true ~500000 " +
      f"(rank err ${100.0 * math.abs(kllMed - 500000.0) / 1000000.0}%.2f%%)")
    spark.stop()
  }
}
