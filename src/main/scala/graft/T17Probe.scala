package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Chunker

/** Scale + skew probe for the span-removal operator (t17) and for the
  * repo-wide "the join's skew is AQE-splittable" claim.
  *
  * Part 1 — t17 under a planted hot key: replicates the sf0.1 documents
  * table `SPARK_GRAFT_REPLICAS` times with per-replica pads and
  * prepends the SAME 8-token boilerplate banner to every document, so
  * ONE tile hash occurs in every doc (the shared-site-banner shape).
  * Times the operator with and without the banner.
  *
  * MEASURED FINDING (recorded in NOTES.md): the banner partition does
  * NOT trip AQE's skew detection, because skew stats are COMPRESSED
  * shuffle-block sizes and a hot key whose rows carry identical tile
  * text compresses ~100x — the byte skew the detector watches for never
  * materializes, even at 100x density with lowered thresholds. The
  * stage does not stall either: the ownership side holds ONE row per
  * tile after the partial agg, so the hot partition's cost is linear in
  * its row count (no pair expansion), and the with/without-banner delta
  * stays small and flat across replicas. Row-count skew without byte
  * skew is benign here by construction.
  *
  * Part 2 — the mechanism itself: a synthetic join whose hot key
  * carries HIGH-ENTROPY payloads (incompressible, so the byte skew is
  * real) must show `skew=true` on the sort-merge join in the final
  * adaptive plan — proving the machinery is on and engages exactly
  * when byte skew exists, which is the condition under which a 100 TB
  * corpus join (distinct documents riding through a hot term/tile
  * bucket) would need it.
  *
  * Broadcast is disabled so joins take the sort-merge path they would
  * take at 100 TB; skew thresholds are lowered to probe scale.
  */
object T17Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        sys.env.getOrElse("SPARK_GRAFT_SKEW_FACTOR", "2.0"))
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESHOLD", "1m"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "512k"))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    val banner = "graft shared banner repeated across every single document"
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val n0 = base.count()

    def corpus(withBanner: Boolean) = (0 until replicas).map { i =>
      base.select(
        (col("doc_id") + lit(i * n0)).as("doc_id"),
        concat(lit(if (withBanner) banner + " " else ""), col("text"),
          lit(if (i == 0) "" else s" pad$i")).as("text"))
    }.reduce(_ union _)

    for (withBanner <- Seq(false, true)) {
      val c = corpus(withBanner).persist()
      c.count()
      val t0 = System.nanoTime()
      // slim projection so collect() is cheap; collect executes THIS
      // dataset's own QueryExecution — count()/foreach() plan separate
      // ones and the adaptive final plan would never materialize here
      val out = Chunker.removeRepeatedSpans(c, "doc_id", "text")
        .select("doc_id", "n_tiles_kept", "n_tiles")
      val n = out.collect().length
      val tag = if (withBanner) "hot_banner" else "no_banner"
      println(f"[t17probe-${replicas}x] span_removal_$tag rows $n " +
        f"time ${(System.nanoTime() - t0) / 1e9}%.1f s")
      if (withBanner) {
        val skew = out.queryExecution.executedPlan.toString.contains("skew=true")
        println(s"[t17probe-${replicas}x] t17_skew_split_fired $skew " +
          "(expected false: identical tile text compresses ~100x, no BYTE skew)")
      }
      c.unpersist(blocking = false)
    }

    // Part 2: real byte skew (high-entropy payload on the hot key) must
    // engage OptimizeSkewedJoin — the final plan shows skew=true
    val rows = 2000000L * math.min(replicas, 10)
    val left = spark.range(rows).select(
      when(col("id") % 10 === 0, lit(0L)).otherwise(col("id")).as("k"),
      sha2(concat(col("id").cast("string"), lit("payload")), 256).as("payload"))
    val right = spark.range(1000).select(col("id").as("k"), col("id").as("v"))
    val demo = left.join(right, "k")
      .agg(count(lit(1)).as("n"), max(length(col("payload"))).as("plen"))
    val t1 = System.nanoTime()
    val r = demo.collect()(0)
    val demoSkew = demo.queryExecution.executedPlan.toString.contains("skew=true")
    println(f"[t17probe-${replicas}x] synthetic_byte_skew rows ${r.getLong(0)} " +
      f"time ${(System.nanoTime() - t1) / 1e9}%.1f s skew_split_fired $demoSkew")
    if (!demoSkew)
      println("[t17probe] WARNING: synthetic byte-skew join was NOT split")
    spark.stop()
  }
}
