package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stateful-operator MEMORY probe: does state-store size plateau under
  * the watermark contract, or grow without bound? The m-family gates
  * prove streaming lifts CORRECT; this measures the other contract —
  * bounded state — under a long drain the gates never run:
  *
  *  - SESSIONIZER (m38's shape): K distinct keys emitting events over
  *    B micro-batches with event time advancing every batch and a
  *    short watermark. Expected: per-key session state is created,
  *    closed by the watermark, and EVICTED — numRowsTotal plateaus at
  *    ~(keys active inside one watermark horizon), not keys × batches.
  *  - STREAM-STREAM JOIN (m34's shape): two sides joined on key within
  *    a time bound, watermarked both sides. Expected: buffered rows
  *    plateau at ~(rows inside the join window), evicted as the
  *    watermark passes.
  *
  * Prints per-batch `numRowsTotal` / `stateMemory` from the progress
  * telemetry, then the min/max/final across the drain. An unbounded
  * operator shows monotone growth ~ batches; a bounded one flattens.
  * Run: `sbt "runMain graft.StateProbe [keys] [batches]"` (defaults
  * 100000 x 60; the NOTES record 1e6-key runs).
  */
object StateProbe {

  private def mkSpark(): SparkSession = SparkEntry.configure(
    SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false"))
    .getOrCreate()

  private final case class Stat(batch: Long, rowsTotal: Long,
                                memBytes: Long)

  /** Drain `batches` file-source micro-batches through `build`,
    * harvesting state-operator telemetry per batch. */
  private def drain(spark: SparkSession, tag: String, keys: Int,
                    batches: Int,
                    build: org.apache.spark.sql.DataFrame =>
                      org.apache.spark.sql.DataFrame): Seq[Stat] = {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory(s"graft_state_$tag")
    val srcDir = base.resolve("src").toString
    val ckpt = base.resolve("ckpt").toString
    val sink = base.resolve("sink").toString
    // one parquet file per micro-batch (maxFilesPerTrigger=1): each
    // batch carries `keys` events stamped batch-minutes apart, so the
    // watermark advances a full batch-width every trigger
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until batches).foreach { b =>
      spark.range(keys).select(
          col("id").as("k"),
          to_timestamp(lit(new java.sql.Timestamp(t0 + b * 60000L)))
            .as("ts"),
          lit(b).as("batch"))
        .coalesce(1).write.mode("append").parquet(srcDir)
      // strictly increasing mtimes fix the drain order
      Thread.sleep(2)
    }
    val stream = spark.readStream
      .schema("k BIGINT, ts TIMESTAMP, batch INT")
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val stats = scala.collection.mutable.ArrayBuffer.empty[Stat]
    val q = build(stream)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    while (q.isActive) {
      Thread.sleep(500)
      Option(q.lastProgress).foreach { p =>
        if (p.stateOperators.nonEmpty &&
            stats.lastOption.forall(_.batch != p.batchId))
          stats += Stat(p.batchId,
            p.stateOperators.map(_.numRowsTotal).sum,
            p.stateOperators.map(_.memoryUsedBytes).sum)
      }
    }
    q.awaitTermination()
    // the final progress may land after the loop exits
    Option(q.lastProgress).foreach { p =>
      if (p.stateOperators.nonEmpty &&
          stats.lastOption.forall(_.batch != p.batchId))
        stats += Stat(p.batchId,
          p.stateOperators.map(_.numRowsTotal).sum,
          p.stateOperators.map(_.memoryUsedBytes).sum)
    }
    stats.toSeq
  }

  private def report(tag: String, keys: Int, batches: Int,
                     stats: Seq[Stat]): Unit = {
    val rows = stats.map(_.rowsTotal)
    val mem = stats.map(_.memBytes)
    val headGrow = stats.take(stats.size / 2)
    val tailGrow = stats.drop(stats.size / 2)
    def slope(xs: Seq[Stat]): Double =
      if (xs.size < 2) 0.0
      else (xs.last.rowsTotal - xs.head.rowsTotal).toDouble /
        math.max(1, xs.last.batch - xs.head.batch)
    println(s"[state] $tag keys=$keys batches=$batches " +
      s"samples=${stats.size}")
    println(f"[state] $tag rowsTotal min=${rows.min} max=${rows.max} " +
      f"final=${rows.last}; memMB max=${mem.max / 1e6}%.1f")
    println(f"[state] $tag growth rows/batch: first-half " +
      f"${slope(headGrow)}%.0f, second-half ${slope(tailGrow)}%.0f " +
      "(a bounded operator's second half ~ 0; unbounded ~ keys)")
  }

  def main(args: Array[String]): Unit = {
    val keys = args.headOption.map(_.toInt).getOrElse(100000)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(60)
    val spark = mkSpark()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 1. SESSIONIZER: 10-second session gap, 2-minute watermark — with
    // batches a minute apart every session closes two batches later,
    // so live state must plateau at ~2 batches x keys, NOT grow
    val sess = drain(spark, "sessionize", keys, batches, df =>
      df.withWatermark("ts", "2 minutes")
        .groupBy(col("k"),
          org.apache.spark.sql.functions.session_window(col("ts"),
            "10 seconds"))
        .agg(count(lit(1)).as("n"), max(col("batch")).as("lastBatch"))
        .select(col("k"), col("n"), col("lastBatch")))
    report("sessionize", keys, batches, sess)

    // 2. STREAM-STREAM INNER JOIN: self-join key=key within 1 minute,
    // both sides watermarked 2 minutes — buffered rows must plateau at
    // ~2-3 batches x keys x 2 sides
    val joined = drain(spark, "join", keys, batches, df => {
      val a = df.select(col("k"), col("ts").as("tsa"),
        col("batch").as("ba")).withWatermark("tsa", "2 minutes")
      val b = df.select(col("k").as("kb"), col("ts").as("tsb"),
        col("batch").as("bb")).withWatermark("tsb", "2 minutes")
      a.join(b, a("k") === b("kb") &&
        b("tsb") >= a("tsa") - expr("interval 1 minute") &&
        b("tsb") <= a("tsa") + expr("interval 1 minute"))
        .select(col("k"), col("ba"), col("bb"))
    })
    report("stream-stream-join", keys, batches, joined)

    spark.stop()
  }
}
