package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measures what the DATA-bucketED manifest layout buys at the shape
  * it exists for: a fact-to-fact equi-join (both sides too big to
  * broadcast) plus a key-grouped aggregation. Two identical table
  * pairs — one seeded with `bucketCols`/`buckets`, one plain — run the
  * same join+agg; reports min-of-3 wall time and the executed plan's
  * shuffle-exchange count for each. The bucketed pair must plan ONE
  * exchange — the final few-rows scalar rollup, nothing data-sized
  * (the write amortized the join's two table-sized exchanges and the
  * key-grouped agg reuses the join's partitioning); the plain pair
  * pays the classic both-sides exchanges per query. Also times the
  * bucketized seed itself — the amortization cost the layout charges
  * once (after a small untimed warmup seed, so the first table does
  * not carry the session's first-job JIT/codegen cost).
  *
  * Run: sbt "runMain graft.BucketProbe" (optional args: nRows nBuckets)
  */
object BucketProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[16]").appName("bucket-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val nB = args.lift(1).map(_.toInt).getOrElse(32)

    def synth(salt: Long): DataFrame =
      spark.range(n).select(col("id").as("k"),
        pmod(col("id"), lit(4)).cast("string").as("part"),
        (col("id") * 7 % 1000 + salt).cast("double").as("v"),
        lit(1L).as("ver"))

    def seed(tag: String, bucketed: Boolean): (String, Double) = {
      val dir = Files.createTempDirectory(s"probe_bk_$tag")
        .resolve("t").toString
      val (_, s) = time {
        Layout.writeManifestTable(spark, dir, synth(if (tag.endsWith("a"))
          0L else 500L), Seq("part"),
          keys = Seq("k"), versionCol = Some("ver"),
          bucketCols = if (bucketed) Seq("k") else Nil,
          buckets = if (bucketed) nB else 0)
      }
      (dir, s)
    }

    // untimed warmup: pay the session's first-job JIT/codegen/parquet
    // path cost before any timed seed
    val warmDir = Files.createTempDirectory("probe_bk_warm")
      .resolve("t").toString
    Layout.writeManifestTable(spark,
      warmDir, synth(0L).limit(10000), Seq("part"),
      keys = Seq("k"), versionCol = Some("ver"),
      bucketCols = Seq("k"), buckets = nB)
    Layout.manifestTable(spark, warmDir).count()

    val (ba, sBa) = seed("buck_a", bucketed = true)
    val (bb, sBb) = seed("buck_b", bucketed = true)
    val (pa, sPa) = seed("plain_a", bucketed = false)
    val (pb, sPb) = seed("plain_b", bucketed = false)
    println(f"seed: bucketed $sBa%.1f/$sBb%.1f s, plain $sPa%.1f/$sPb%.1f " +
      f"s ($n rows per table, $nB buckets)")

    def query(l: String, r: String): DataFrame =
      Layout.manifestTable(spark, l)
        .join(Layout.manifestTable(spark, r), "k")
        .groupBy("k").agg(count(lit(1)).as("cnt"))
        .agg(sum("cnt").as("total"), count(lit(1)).as("keys"))

    def run(tag: String, l: String, r: String): Unit = {
      val times = (1 to 3).map { _ =>
        val (_, s) = time(query(l, r).collect())
        s
      }
      val q = query(l, r); q.collect()
      val nEx = PlanScan.shuffles(q.queryExecution.executedPlan).size
      println(f"$tag%-9s join+agg min-of-3 ${times.min}%.2f s  " +
        f"(runs ${times.map(t => f"$t%.2f").mkString("/")})  " +
        f"shuffle exchanges: $nEx")
    }

    run("bucketed", ba, bb)
    run("plain", pa, pb)
    spark.stop()
  }
}
