package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

class SessionizeSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stateful sessionization: gap split in-batch, timeout across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")
    val out = Sessionize.sessions(events, gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: user 1 has two sessions already visible in-batch (gap >
      // 30m between 10:20 and 12:00); the 12:00 one stays open in state
      input.addData(
        (1L, ts("2023-01-01 10:00:00")),
        (1L, ts("2023-01-01 10:20:00")),
        (1L, ts("2023-01-01 12:00:00")),
        (2L, ts("2023-01-01 10:00:00")))
      q.processAllAvailable()
      // processAllAvailable also runs the follow-up timeout batch: the
      // batch-1 watermark (12:00) already times out user 2's open
      // session (ends 10:00, gap 30m), while user 1's 12:00 session
      // (timeout 12:30) stays in state
      val afterB1 = spark.table("sessions")
        .orderBy("user_id").collect()
      assert(afterB1.length == 2)
      assert(afterB1(0).getLong(0) == 1L)
      assert(afterB1(0).getAs[Timestamp]("session_start") == ts("2023-01-01 10:00:00"))
      assert(afterB1(0).getAs[Timestamp]("session_end") == ts("2023-01-01 10:20:00"))
      assert(afterB1(0).getAs[Long]("n_events") == 2L)
      assert(afterB1(1).getLong(0) == 2L)

      // batch 2: an event far in the future advances the watermark past
      // every open session's end+gap -> both time out and emit
      input.addData((3L, ts("2023-01-01 18:00:00")))
      q.processAllAvailable()
      // one more batch so timeouts fire with the advanced watermark
      input.addData((3L, ts("2023-01-01 18:00:01")))
      q.processAllAvailable()
      val all = spark.table("sessions")
        .orderBy("user_id", "session_start").collect()
      val got = all.map(r => (r.getLong(0),
        r.getAs[Timestamp](1).toString, r.getAs[Timestamp](2).toString,
        r.getLong(3))).toSeq
      assert(got.contains((1L, "2023-01-01 12:00:00.0", "2023-01-01 12:00:00.0", 1L)),
        s"open session of user 1 should time out; got $got")
      assert(got.contains((2L, "2023-01-01 10:00:00.0", "2023-01-01 10:00:00.0", 1L)),
        s"user 2 session should time out; got $got")
    } finally q.stop()
  }

  test("backward out-of-order across micro-batches: within-gap extends " +
      "session_start, beyond-gap splits an earlier session") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    // nonzero watermark delay so a later micro-batch may legally carry
    // events EARLIER than everything already seen (3h keeps the 10:00
    // backfill strictly above batch-1's watermark, not at it)
    val events = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "3 hours")
    val out = Sessionize.sessions(events, gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions_ooo")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: both users open a session at 12:00
      input.addData(
        (1L, ts("2023-01-01 12:00:00")),
        (2L, ts("2023-01-01 12:00:00")))
      q.processAllAvailable()
      // batch 2, all within the 2h watermark:
      //  user 1: 11:45 — within gap BEFORE the open session's start →
      //    must extend session_start backward (not glue with start
      //    pinned at 12:00, the pre-fix bug)
      //  user 2: 10:00 — more than a gap before the open session →
      //    must form its own earlier session and close it immediately
      //    (the pre-fix bug glued it in, spanning 10:00..12:00)
      input.addData(
        (1L, ts("2023-01-01 11:45:00")),
        (2L, ts("2023-01-01 10:00:00")))
      q.processAllAvailable()
      val afterB2 = spark.table("sessions_ooo").collect().map(r =>
        (r.getLong(0), r.getAs[Timestamp](1).toString,
          r.getAs[Timestamp](2).toString, r.getLong(3))).toSet
      assert(afterB2 == Set(
        (2L, "2023-01-01 10:00:00.0", "2023-01-01 10:00:00.0", 1L)),
        s"only user 2's earlier split session closes in-batch; got $afterB2")
      // drain: advance the watermark (minus 2h delay) past end+gap,
      // then one more batch so timeouts fire
      input.addData((9L, ts("2023-01-01 18:00:00")))
      q.processAllAvailable()
      input.addData((9L, ts("2023-01-01 18:00:01")))
      q.processAllAvailable()
      val all = spark.table("sessions_ooo").collect().map(r =>
        (r.getLong(0), r.getAs[Timestamp](1).toString,
          r.getAs[Timestamp](2).toString, r.getLong(3))).toSet
      assert(all.contains(
        (1L, "2023-01-01 11:45:00.0", "2023-01-01 12:00:00.0", 2L)),
        s"user 1's session must start at the backfilled 11:45; got $all")
      assert(all.contains(
        (2L, "2023-01-01 12:00:00.0", "2023-01-01 12:00:00.0", 1L)),
        s"user 2's open session stays separate from the 10:00 one; got $all")
    } finally q.stop()
  }

  test("backward event inside the open session's span is absorbed " +
      "without moving its boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "2 hours")
    val out = Sessionize.sessions(events, gapMinutes = 30)
    val q = out.writeStream.format("memory").queryName("sessions_mid")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        (1L, ts("2023-01-01 12:00:00")),
        (1L, ts("2023-01-01 12:20:00")))
      q.processAllAvailable()
      // a late event BETWEEN the open session's endpoints
      input.addData((1L, ts("2023-01-01 12:10:00")))
      q.processAllAvailable()
      input.addData((9L, ts("2023-01-01 18:00:00")))
      q.processAllAvailable()
      input.addData((9L, ts("2023-01-01 18:00:01")))
      q.processAllAvailable()
      val all = spark.table("sessions_mid").collect().map(r =>
        (r.getLong(0), r.getAs[Timestamp](1).toString,
          r.getAs[Timestamp](2).toString, r.getLong(3))).toSet
      assert(all.contains(
        (1L, "2023-01-01 12:00:00.0", "2023-01-01 12:20:00.0", 3L)),
        s"absorbed event must count without shifting boundaries; got $all")
    } finally q.stop()
  }

  test("the sessionizer runs green under the RocksDB state store (the " +
      "documented at-scale backend — Streams.useRocksDbStateStore)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    Streams.useRocksDbStateStore(spark)
    try {
      val input = MemoryStream[(Long, Timestamp)]
      val events = input.toDF().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
      val out = Sessionize.sessions(events, gapMinutes = 30)
      val q = out.writeStream.format("memory").queryName("sessions_rocks")
        .outputMode(OutputMode.Append).start()
      try {
        input.addData(
          (1L, ts("2023-01-01 10:00:00")),
          (1L, ts("2023-01-01 10:20:00")),
          (1L, ts("2023-01-01 12:00:00")),
          (2L, ts("2023-01-01 10:00:00")))
        q.processAllAvailable()
        input.addData((3L, ts("2023-01-01 18:00:00")))
        q.processAllAvailable()
        input.addData((3L, ts("2023-01-01 18:00:01")))
        q.processAllAvailable()
        val got = spark.table("sessions_rocks")
          .orderBy("user_id", "session_start").collect()
          .map(r => (r.getLong(0), r.getAs[Timestamp](1).toString,
            r.getAs[Timestamp](2).toString, r.getLong(3))).toSeq
        // identical closed-session set to the HDFS-provider run above
        assert(got.contains(
          (1L, "2023-01-01 10:00:00.0", "2023-01-01 10:20:00.0", 2L)) &&
          got.contains(
            (1L, "2023-01-01 12:00:00.0", "2023-01-01 12:00:00.0", 1L)) &&
          got.contains(
            (2L, "2023-01-01 10:00:00.0", "2023-01-01 10:00:00.0", 1L)),
          s"RocksDB run must emit the same sessions; got $got")
        // the query really ran on RocksDB, not a silent fallback:
        // only the RocksDB provider reports rocksdb* custom metrics
        val metricKeys = Option(q.lastProgress).toSeq
          .flatMap(_.stateOperators.toSeq)
          .flatMap(op => scala.jdk.CollectionConverters
            .SetHasAsScala(op.customMetrics.keySet).asScala)
        assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")),
          s"state operator must report RocksDB metrics ($metricKeys)")
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }
}
