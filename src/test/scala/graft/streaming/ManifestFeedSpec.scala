package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.Layout

/** The manifest append feed: Layout.appendsBetween (the batch body)
  * and the `manifest-feed` Structured Streaming source built on it —
  * version-window batches, restart replay from the checkpoint's offset
  * log, fold/compact transparency, loud refusal of rewrites, and the
  * retention-cursor integration. */
class ManifestFeedSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_feed_$tag").resolve("t").toString

  import org.apache.spark.sql.functions._

  private def seedTable(dir: String): Unit = {
    import spark.implicits._
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "a", 20.0, 1L),
        (3L, "b", 30.0, 1L), (4L, "c", 40.0, 1L))
        .toDF("k", "part", "v", "ver"),
      Seq("part"))
  }

  private def delta(dir: String, rows: Seq[(Long, String, Double, Long)],
                    del: Option[Seq[Boolean]] = None): Unit = {
    import spark.implicits._
    val base = rows.toDF("k", "part", "v", "ver")
    del match {
      case None =>
        Layout.mergeManifestDelta(spark, dir, base, Seq("k"), "ver")
      case Some(flags) =>
        val flagged = rows.zip(flags).map { case ((k, p, v, ver), d) =>
          (k, p, v, ver, d) }.toDF("k", "part", "v", "ver", "del")
        Layout.mergeManifestDelta(spark, dir, flagged, Seq("k"), "ver",
          deleteCol = Some("del"))
    }
  }

  private def keys(df: DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("appendsBetween: seed + deltas emit, fold/compact/evolve are " +
      "transparent, windows compose") {
    val dir = tmpDir("appends")
    seedTable(dir)                                        // v1 seed
    delta(dir, Seq((5L, "a", 50.0, 2L), (6L, "d", 60.0, 2L))) // v2 delta
    Layout.foldManifestDeltas(spark, dir)                 // v3 fold
    delta(dir, Seq((7L, "b", 70.0, 3L)))                  // v4 delta
    Layout.compactManifest(spark, dir, maxFiles = 0)      // v5 compact
    Layout.evolveManifest(spark, dir, "note STRING")      // v6 evolve
    // post-evolution deltas carry the evolved schema (loud contract)
    import spark.implicits._
    Layout.mergeManifestDelta(spark, dir,
      Seq((8L, "c", 80.0, 4L, null.asInstanceOf[String]))
        .toDF("k", "part", "v", "ver", "note"),
      Seq("k"), "ver")                                    // v7 delta
    assert(keys(Layout.appendsBetween(spark, dir, 0, 7)) ==
      Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
    assert(keys(Layout.appendsBetween(spark, dir, 1, 7)) ==
      Set(5L, 6L, 7L, 8L))
    assert(Layout.appendsBetween(spark, dir, 2, 3).isEmpty) // fold only
    assert(keys(Layout.appendsBetween(spark, dir, 3, 6)) == Set(7L))
    assert(Layout.appendsBetween(spark, dir, 7, 7).isEmpty)
    // rows align to the END version's schema (evolved column null-fills)
    val evolved = Layout.appendsBetween(spark, dir, 1, 7)
    assert(evolved.columns.contains("note") &&
      evolved.select("note").collect().forall(_.isNullAt(0)))
    // pre-evolution window carries the old schema
    assert(!Layout.appendsBetween(spark, dir, 1, 4).columns.contains("note"))
  }

  test("appendsBetween: delete-bearing deltas and copy-on-write " +
      "rewrites refuse loudly; partition-append merges pass") {
    import spark.implicits._
    val dir = tmpDir("refuse")
    seedTable(dir)                                        // v1
    delta(dir, Seq((5L, "a", 50.0, 2L), (3L, "b", 0.0, 2L)),
      del = Some(Seq(false, true)))                       // v2: has delete
    val e1 = intercept[IllegalArgumentException] {
      Layout.appendsBetween(spark, dir, 1, 2).collect()
    }
    assert(e1.getMessage.contains("delete rows"), e1.getMessage)
    // the flag is PER VERSION: a later clean delta window still streams
    delta(dir, Seq((6L, "d", 60.0, 3L)))                  // v3: clean
    assert(keys(Layout.appendsBetween(spark, dir, 2, 3)) == Set(6L))
    // copy-on-write rewrite of an existing partition refuses
    Layout.mergeManifest(spark, dir,
      Seq((1L, "a", 11.0, 4L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")                                    // v4: rewrite
    val e2 = intercept[IllegalArgumentException] {
      Layout.appendsBetween(spark, dir, 3, 4).collect()
    }
    assert(e2.getMessage.contains("copy-on-write"), e2.getMessage)
    // a merge that only CREATES a partition is a pure append
    Layout.mergeManifest(spark, dir,
      Seq((9L, "z", 90.0, 5L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")                                    // v5: new part z
    assert(keys(Layout.appendsBetween(spark, dir, 4, 5)) == Set(9L))
  }

  test("manifest-feed streaming source: drains appends exactly once, " +
      "replays across restart from the checkpoint, acks the retention " +
      "cursor, and fails loudly on a rewrite") {
    val dir = tmpDir("stream")
    val sink = tmpDir("sink")
    val ckpt = tmpDir("ckpt")
    seedTable(dir)                                        // v1
    def drain(): Unit = {
      val q = spark.readStream.format("manifest-feed")
        .option("path", dir)
        .option("startingVersion", "earliest")
        .option("consumer", "s1")
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain() // batch 1: the seed snapshot
    assert(keys(spark.read.parquet(sink)) == Set(1L, 2L, 3L, 4L))
    val cursorAfter1 = Layout.readFeedCursor(spark, dir, "s1")
    delta(dir, Seq((5L, "a", 50.0, 2L), (6L, "d", 60.0, 2L))) // v2
    delta(dir, Seq((7L, "b", 70.0, 3L)))                  // v3
    Layout.foldManifestDeltas(spark, dir)                 // v4 (skipped)
    delta(dir, Seq((8L, "c", 80.0, 4L)))                  // v5
    drain() // restart from checkpoint: only v2..v5, fold transparent
    val rows = spark.read.parquet(sink).collect()
    assert(rows.length == 8, s"exactly-once drain, got ${rows.length}")
    assert(keys(spark.read.parquet(sink)) == (1L to 8L).toSet)
    // the ack is LAZY BY DESIGN: committing an offset before the
    // sink's commit log records the batch would let a reap delete
    // versions a crash-replay still needs, so the cursor trails by up
    // to one batch — it must never be AHEAD of what drained
    val cursor2 = Layout.readFeedCursor(spark, dir, "s1")
    assert(cursor2.exists(v => v >= cursorAfter1.getOrElse(0) && v <= 5),
      s"cursor must trail the drain, never lead it ($cursor2)")
    // the acked cursor guards retention: a reap that would strand the
    // stream's next replay refuses, naming the consumer
    val e0 = intercept[IllegalArgumentException] {
      Layout.reapManifest(spark, dir, keepVersions = 1)
    }
    assert(e0.getMessage.contains("s1"), e0.getMessage)
    // a rewrite mid-feed fails the QUERY (not silently skipped)
    import spark.implicits._
    Layout.mergeManifest(spark, dir,
      Seq((1L, "a", 11.0, 5L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")                                    // v6: rewrite
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("copy-on-write"))),
      s"want the append-only refusal, got: ${e.getMessage}")
  }

  test("readStream.format(\"manifest\") IS the feed source: one format " +
      "string covers batch read, batch write, streaming read and sink") {
    val dir = tmpDir("unified")
    val sink = tmpDir("unisink")
    val ckpt = tmpDir("unickpt")
    seedTable(dir)                                        // v1
    delta(dir, Seq((5L, "a", 50.0, 2L)))                  // v2
    val q = spark.readStream.format("manifest")
      .option("path", dir)
      .option("startingVersion", "earliest")
      .load()
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(keys(spark.read.parquet(sink)) == Set(1L, 2L, 3L, 4L, 5L))
    // self-describing, same as the feed: a NON-matching .schema()
    // refuses (a matching one is accepted — that is what
    // readStream.table relays from the catalog)
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("manifest")
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, wrong STRING"))
        .option("path", dir).load()
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
  }

  test("streaming by BARE NAME: readStream.table feeds " +
      "writeStream.toTable across two catalog-registered manifest " +
      "tables — table-to-table replication with zero paths in the query") {
    val src = tmpDir("bysrc")
    val dst = tmpDir("bydst")
    val ckpt = tmpDir("byckpt")
    import spark.implicits._
    seedTable(src)                                        // v1: k 1..4
    Layout.writeManifestTable(spark, dst,
      Seq((99L, "z", 0.0, 0L)).toDF("k", "part", "v", "ver"), Seq("part"),
      keys = Seq("k"), versionCol = Some("ver"))
    spark.sql("DROP TABLE IF EXISTS t_by_src")
    spark.sql("DROP TABLE IF EXISTS t_by_dst")
    spark.sql(s"CREATE TABLE t_by_src USING manifest OPTIONS (path '$src')")
    spark.sql(s"CREATE TABLE t_by_dst USING manifest OPTIONS (path '$dst')")
    // mor=false: the sink lands copy-on-write so the destination's
    // catalog scans (which refuse pending deltas) stay served while
    // the stream runs — the posture for a table queried by name
    val q = spark.readStream
      .option("startingVersion", "earliest")
      .table("t_by_src")
      .writeStream.format("manifest")
      .option("mor", "false")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable("t_by_dst")
    q.awaitTermination()
    assert(keys(spark.table("t_by_dst")) == Set(1L, 2L, 3L, 4L, 99L))
    // the relayed catalog schema is accepted (a reordered match of the
    // live one); a DIFFERENT explicit schema still refuses
    val e = intercept[IllegalArgumentException] {
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "k BIGINT, wrong STRING"))
        .option("path", src).format("manifest").load()
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
    spark.sql("DROP TABLE t_by_src")
    spark.sql("DROP TABLE t_by_dst")
  }

  test("mode=changes by BARE NAME: the catalog relays the BASE schema " +
      "and the feed accepts it — the synthetic _change_type column is " +
      "the source's own addition, not schema drift") {
    val src = tmpDir("chname")
    val sink = tmpDir("chnamesink")
    val ckpt = tmpDir("chnameckpt")
    seedTable(src)                                        // v1: k 1..4
    spark.sql("DROP TABLE IF EXISTS t_ch_src")
    spark.sql(s"CREATE TABLE t_ch_src USING manifest OPTIONS (path '$src')")
    val q = spark.readStream
      .option("mode", "changes")
      .option("startingVersion", "earliest")
      .table("t_ch_src")
      .writeStream.format("parquet")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.read.parquet(sink)
    assert(out.columns.contains("_change_type"))
    assert(keys(out) == Set(1L, 2L, 3L, 4L))
    assert(out.select("_change_type").collect()
      .forall(_.getString(0) == "insert"))
    spark.sql("DROP TABLE t_ch_src")
  }

  test("maxVersionsPerTrigger paces a backfill into bounded batches; " +
      "mid-stream schema evolution keeps the pinned shape until restart") {
    val dir = tmpDir("paced")
    val sink = tmpDir("paced_sink")
    val ckpt = tmpDir("paced_ckpt")
    seedTable(dir)                                        // v1
    delta(dir, Seq((5L, "a", 50.0, 2L)))                  // v2
    delta(dir, Seq((6L, "d", 60.0, 2L)))                  // v3
    delta(dir, Seq((7L, "b", 70.0, 3L)))                  // v4
    def drain(): Unit = {
      val q = spark.readStream.format("manifest-feed")
        .option("path", dir).option("startingVersion", "earliest")
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(keys(spark.read.parquet(sink)) == (1L to 7L).toSet)
    // one checkpointed batch PER VERSION, not one giant batch
    val offsets = Option(new java.io.File(s"$ckpt/offsets").listFiles)
      .toSeq.flatten.map(_.getName).filterNot(_.startsWith("."))
      .filter(_.forall(_.isDigit)).map(_.toInt).sorted
    assert(offsets.size == 4, s"4 paced batches expected, got $offsets")
    // schema evolution ACROSS a restart: the resumed query picks up
    // the evolved schema, the recovery replay of the last committed
    // (pre-evolution) window null-fills the new column, and the new
    // append's value comes through — no crash, exact rows
    import spark.implicits._
    Layout.evolveManifest(spark, dir, "note STRING")      // v5
    Layout.mergeManifestDelta(spark, dir,
      Seq((8L, "c", 80.0, 4L, "n8")).toDF("k", "part", "v", "ver", "note"),
      Seq("k"), "ver")                                    // v6
    drain()
    val back = spark.read.option("mergeSchema", "true").parquet(sink)
    assert(keys(back) == (1L to 8L).toSet)
    val notes = back.select("k", "note").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(notes(8L).contains("n8") &&
      (1L to 7L).forall(notes(_).isEmpty),
      s"evolved column must carry only the post-evolution value: $notes")
  }

  test("sinkBatch guard: a replayed micro-batch id is a no-op publish, " +
      "so feed consumers never see duplicate rows") {
    import spark.implicits._
    val dir = tmpDir("sinkbatch")
    seedTable(dir)                                        // v1
    def d(k: Long, id: Long): Boolean =
      Layout.mergeManifestDelta(spark, dir,
        Seq((k, "a", k.toDouble, 2L)).toDF("k", "part", "v", "ver"),
        Seq("k"), "ver", batchId = id)
    assert(d(10L, 0L))                                    // v2, batch 0
    // the crash-replay: same id must publish NOTHING
    assert(!d(10L, 0L))
    assert(Layout.manifestVersion(spark, dir).contains(2),
      "a replayed batch must not bump the version")
    assert(d(11L, 1L))                                    // v3, batch 1
    // an id BEHIND the marker is MORE than a replay (the engine only
    // re-issues the last batch): fresh checkpoint / second writer /
    // changed id scheme — silent drop would be data loss, so it throws
    val reg = intercept[IllegalStateException] { d(12L, 0L) }
    assert(reg.getMessage.contains("BEHIND the recorded marker"),
      reg.getMessage)
    // the feed sees each appended row exactly once
    assert(keys(Layout.appendsBetween(spark, dir, 1, 3)) == Set(10L, 11L))
    // an unmanaged publish (fold) CARRIES the marker forward
    Layout.foldManifestDeltas(spark, dir)                 // v4
    assert(!d(13L, 1L), "the marker must survive a fold")
    assert(d(14L, 2L))
    // the copy-on-write path guards identically
    assert(Layout.mergeManifest(spark, dir,
      Seq((1L, "a", 99.0, 3L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver", batchId = 3L))
    assert(!Layout.mergeManifest(spark, dir,
      Seq((1L, "a", 77.0, 4L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver", batchId = 3L))
    assert(Layout.readManifest(spark, dir).filter(col("k") === 1L)
      .select("v").head().getDouble(0) == 99.0,
      "the replayed CoW merge must not have applied")
  }

  test("sinkBatch namespaces: independent writers with distinct sinkIds " +
      "keep independent id sequences — neither suppresses the other") {
    import spark.implicits._
    val dir = tmpDir("sinkns")
    seedTable(dir)                                        // v1
    def d(k: Long, id: Long, ns: String): Boolean =
      Layout.mergeManifestDelta(spark, dir,
        Seq((k, "a", k.toDouble, 2L)).toDF("k", "part", "v", "ver"),
        Seq("k"), "ver", batchId = id, sinkId = ns)
    assert(d(10L, 5L, "qA"))      // writer A is at batch 5
    // writer B starts at 0 — under ONE shared marker this would be an
    // id regression; with its own namespace it applies
    assert(d(11L, 0L, "qB"))
    assert(d(12L, 6L, "qA"))
    assert(d(13L, 1L, "qB"))
    // replays stay per-namespace
    assert(!d(14L, 6L, "qA"))
    assert(!d(14L, 1L, "qB"))
    // and regressions stay per-namespace too
    intercept[IllegalStateException] { d(15L, 4L, "qA") }
    assert(keys(Layout.readManifest(spark, dir)) ==
      Set(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L))
    // markers survive an unmanaged publish (fold) per namespace
    Layout.foldManifestDeltas(spark, dir)
    assert(!d(16L, 6L, "qA") && !d(16L, 1L, "qB"))
    assert(d(17L, 7L, "qA") && d(18L, 2L, "qB"))
  }

  test("changeTypeCol net diff applies as ONE publish per batch: no " +
      "reader-visible half-state, force-wins over the base version") {
    import spark.implicits._
    val src = tmpDir("net_src")
    val dst = tmpDir("net_dst")
    val ckpt = tmpDir("net_ckpt")
    seedTable(src)
    Layout.writeManifestTable(spark, dst,
      Layout.readManifest(spark, src), Seq("part"))
    def drain(): Unit = {
      val q = spark.readStream.format("manifest-feed")
        .option("path", src).option("mode", "changes")
        .option("startingVersion", "1").load()
        .writeStream.format("manifest")
        .option("path", dst)
        .option("keys", "k").option("versionCol", "ver")
        .option("changeTypeCol", "_change_type")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // one source publish with an update (delete+insert pair in the
    // diff), a pure delete, and a pure insert
    Layout.mergeManifest(spark, src,
      Seq((1L, "a", 11.0, 2L, false), (3L, "b", 0.0, 2L, true),
        (5L, "d", 50.0, 2L, false))
        .toDF("k", "part", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))
    val vBefore = Layout.manifestVersion(spark, dst).get
    drain()
    val vAfter = Layout.manifestVersion(spark, dst).get
    // ONE publish for the whole batch — the sequenced-halves scheme
    // would publish twice and expose a deleted-updated-keys half-state
    assert(vAfter == vBefore + 1,
      s"net-diff batch must publish exactly once (v$vBefore -> v$vAfter)")
    val got = Layout.readManifest(spark, dst).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 11.0, 2L -> 20.0, 4L -> 40.0, 5L -> 50.0), got)
    // EVERY retained dst version is a state the source actually had —
    // none shows k=1 missing (the half-state the two-publish scheme
    // persisted on a crash between halves)
    (1 to vAfter).foreach { v =>
      val snap = keys(Layout.readManifestVersion(spark, dst, v))
      assert(snap.contains(1L),
        s"dst v$v lost key 1 — a half-applied update is visible: $snap")
    }
  }

  test("manifest sink: declarative table-to-table replication — " +
      "readStream manifest-feed into writeStream manifest, exactly-once") {
    import spark.implicits._
    val src = tmpDir("repl_src")
    val dst = tmpDir("repl_dst")
    val ckpt = tmpDir("repl_ckpt")
    seedTable(src)                                        // src v1
    // the sink table seeds with the same snapshot (fixes partitioning)
    Layout.writeManifestTable(spark, dst,
      Layout.readManifest(spark, src), Seq("part"))
    def drain(): Unit = {
      val q = spark.readStream.format("manifest-feed")
        .option("path", src).load()
        .writeStream.format("manifest")
        .option("path", dst)
        .option("keys", "k").option("versionCol", "ver")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // anchor (nothing new since src's seed)
    delta(src, Seq((5L, "a", 50.0, 2L), (6L, "d", 60.0, 2L))) // src v2
    delta(src, Seq((7L, "b", 70.0, 3L)))                      // src v3
    drain()
    def table(p: String): Set[(Long, Double)] =
      Layout.readManifest(spark, p).select("k", "v").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(table(dst) == table(src), "replica must equal the source")
    // exactly-once: a re-drain with nothing new changes NOTHING
    val vBefore = Layout.manifestVersion(spark, dst)
    drain()
    assert(Layout.manifestVersion(spark, dst) == vBefore,
      "an empty re-drain must not publish")
    // contracts: unseeded sink and Complete mode refuse
    val e1 = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
      val q = spark.readStream.format("manifest-feed")
        .option("path", src).load()
        .writeStream.format("manifest")
        .option("path", tmpDir("repl_unseeded"))
        .option("keys", "k").option("versionCol", "ver")
        .option("checkpointLocation", tmpDir("repl_ck2"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e1).exists(c => Option(c.getMessage)
      .exists(_.contains("writeManifestTable"))), e1.getMessage)
  }

  test("LIVE mode=changes consumer across a metadata-only respec, a " +
      "budgeted migrate_partitions drain mid-feed, and post-drain DML: " +
      "op=repartition publishes emit nothing, every window equals the " +
      "batch diff, replication stays exact — nothing lost or doubled") {
    import spark.implicits._
    val src = tmpDir("respec_src")
    val dst = tmpDir("respec_dst")
    val dstCkpt = tmpDir("respec_dstck")
    val raw = tmpDir("respec_raw")
    val rawCkpt = tmpDir("respec_rawck")
    // seed: 30 keys partitioned by part; day is the future spec
    Layout.writeManifestTable(spark, src,
      (1L to 30L).map(i => (i, s"p${i % 3}", (i % 4).toInt, i * 1.0, 1L))
        .toDF("k", "part", "day", "v", "ver"), Seq("part"))       // v1
    // replica anchored at the same snapshot (different layout on
    // purpose — diffs are layout-independent)
    Layout.writeManifestTable(spark, dst,
      Layout.readManifest(spark, src), Seq("part"))
    def feed = spark.readStream.format("manifest-feed")
      .option("path", src).option("mode", "changes")
      .option("startingVersion", "1").load()
    // consumer A: full-CDC replication into dst
    def drainRepl(): Unit = {
      val q = feed.writeStream.format("manifest")
        .option("path", dst)
        .option("keys", "k").option("versionCol", "ver")
        .option("changeTypeCol", "_change_type")
        .option("checkpointLocation", dstCkpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // consumer B: raw change rows into parquet (window accounting)
    def drainRaw(): Unit = {
      val q = feed.writeStream.format("parquet")
        .option("path", raw).option("checkpointLocation", rawCkpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def rawRows(): Seq[(Long, Double, String)] =
      (try spark.read.parquet(raw).collect()
       catch { case _: Throwable => Array.empty[org.apache.spark.sql.Row] })
        .map(r => (r.getAs[Long]("k"), r.getAs[Double]("v"),
          r.getAs[String]("_change_type"))).toSeq.sorted
    def batchDiff(a: Int, b: Int): Seq[(Long, Double, String)] =
      Layout.manifestChanges(spark, src, a, b)
        .select("k", "v", "_change_type").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .toSeq.sorted
    def table(p: String): Map[Long, Double] =
      Layout.readManifest(spark, p).select("k", "v").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // ANCHOR both consumers before the respec (empty first drain)
    drainRepl(); drainRaw()
    assert(rawRows().isEmpty, "anchored at v1: nothing to emit yet")
    // 1) metadata-only respec: part -> day                       // v2
    Layout.changeManifestPartitionSpec(spark, src, Seq("day"))
    // 2) mid-feed DML on the MIXED table (update k=7, insert k=31;
    //    migrate-on-touch folds old-era p1 into the new spec)    // v3
    Layout.mergeManifest(spark, src,
      Seq((7L, "p1", 3, 77.0, 2L), (31L, "p1", 2, 310.0, 2L))
        .toDF("k", "part", "day", "v", "ver"), Seq("k"), "ver")
    val v3 = Layout.manifestVersion(spark, src).get
    drainRepl(); drainRaw()
    val window1 = rawRows()
    assert(window1 == batchDiff(1, v3),
      s"respec+DML window must equal the batch diff: $window1")
    assert(window1.nonEmpty && window1.forall(_._1 != 8L),
      "migrate-on-touch's row-identical moves must not leak as changes")
    // 3) budgeted drain runs MID-FEED: one old-era partition per run,
    //    each an op=repartition publish                        // v4..vN
    var spins = 0
    while (Layout.migrateManifestPartitions(spark, src,
        maxPartitions = 1).nonEmpty && spins < 10) spins += 1
    assert(spins >= 2, s"drain must run over several budgeted publishes " +
      s"(got $spins)")
    val vDrained = Layout.manifestVersion(spark, src).get
    drainRepl(); drainRaw()
    assert(rawRows() == window1,
      "row-identical drain publishes must emit ZERO change rows " +
        "on a live mid-feed consumer")
    // 4) post-drain DML on the now-single-spec table: delete k=2,
    //    update k=9, insert k=41                                  // +1
    Layout.mergeManifest(spark, src,
      Seq((2L, "p2", 2, 0.0, 3L, true), (9L, "p0", 1, 99.0, 3L, false),
        (41L, "p2", 1, 410.0, 3L, false))
        .toDF("k", "part", "day", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))
    val vFinal = Layout.manifestVersion(spark, src).get
    drainRepl(); drainRaw()
    assert(rawRows() == (window1 ++ batchDiff(vDrained, vFinal)).sorted,
      "post-drain DML must flow as exactly its own batch diff")
    // end state: replica equals source exactly (no dup/lost rows),
    // and the source is single-spec again
    assert(table(dst) == table(src), s"replica diverged: ${table(dst)}")
    assert(table(src).get(7L).contains(77.0) &&
      table(src).get(9L).contains(99.0) && !table(src).contains(2L) &&
      table(src).get(41L).contains(410.0))
    val m = Layout.readManifestMeta(spark, src,
      Layout.manifestVersion(spark, src).get)
    assert(m.oldEraRels.isEmpty && m.specHistory.isEmpty,
      "the drain must have converged mid-feed")
  }

  test("mode=changes + changeTypeCol: full-CDC replication with " +
      "updates and deletes, pure format strings") {
    import spark.implicits._
    val src = tmpDir("cdc_src")
    val dst = tmpDir("cdc_dst")
    val ckpt = tmpDir("cdc_ckpt")
    seedTable(src)   // k=1..4, v = 10/20/30/40, ver 1
    Layout.writeManifestTable(spark, dst,
      Layout.readManifest(spark, src), Seq("part"))
    def drain(): Unit = {
      val q = spark.readStream.format("manifest-feed")
        .option("path", src).option("mode", "changes")
        .option("startingVersion", "1").load()
        .writeStream.format("manifest")
        .option("path", dst)
        .option("keys", "k").option("versionCol", "ver")
        .option("changeTypeCol", "_change_type")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // UPDATE k=1, DELETE k=3, INSERT k=5 — a copy-on-write merge the
    // appends mode would refuse; the changes mode is built for it
    Layout.mergeManifest(spark, src,
      Seq((1L, "a", 11.0, 2L, false), (3L, "b", 0.0, 2L, true),
        (5L, "d", 50.0, 2L, false))
        .toDF("k", "part", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))
    drain()
    def table(p: String): Map[Long, Double] =
      Layout.readManifest(spark, p).select("k", "v").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(table(dst) == Map(1L -> 11.0, 2L -> 20.0, 4L -> 40.0,
      5L -> 50.0), table(dst))
    // a second round across a restart: pure delete + pure update
    Layout.mergeManifest(spark, src,
      Seq((2L, "a", 0.0, 3L, true), (4L, "c", 44.0, 3L, false))
        .toDF("k", "part", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))
    drain()
    assert(table(dst) == table(src) &&
      table(dst) == Map(1L -> 11.0, 4L -> 44.0, 5L -> 50.0), table(dst))
    // the NET-DIFF invariant: delete k=5 (ver 2) then RE-INSERT it
    // with a LOWER version in the same window — the diff emits
    // delete(ver=2) + insert(ver=1), and a version-ordered merge alone
    // would let the delete win; the sink must keep the key because the
    // batch contains an insert for it
    Layout.mergeManifest(spark, src,
      Seq((5L, "d", 0.0, 4L, true)).toDF("k", "part", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))
    Layout.mergeManifest(spark, src,
      Seq((5L, "d", 55.0, 1L, false))
        .toDF("k", "part", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))
    drain()
    assert(table(dst) == table(src) &&
      table(dst).get(5L).contains(55.0),
      s"re-inserted key must survive its own before-image: ${table(dst)}")
    // deleteCol and changeTypeCol refuse to combine
    intercept[IllegalArgumentException] {
      spark.readStream.format("manifest-feed")
        .option("path", src).option("mode", "changes").load()
        .writeStream.format("manifest")
        .option("path", dst).option("keys", "k")
        .option("versionCol", "ver")
        .option("changeTypeCol", "_change_type")
        .option("deleteCol", "x")
        .option("checkpointLocation", tmpDir("cdc_ck2"))
        .trigger(Trigger.AvailableNow()).start()
    }
  }

  test("chunked initial snapshot (mode=changes, snapshotChunkPartitions): " +
      "the earliest-anchored backfill pages as N>1 bounded batches, a " +
      "mid-snapshot restart resumes at the unfinished chunk, hash-exact") {
    import spark.implicits._
    val src = tmpDir("chunk_src")
    val sink = tmpDir("chunk_sink")
    val ckpt = tmpDir("chunk_ckpt")
    // 6 partitions so chunkPartitions=2 yields 3 snapshot chunks
    Layout.writeManifestTable(spark, src,
      (1L to 60L).map(i => (i, s"p${i % 6}", i * 1.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    Layout.mergeManifest(spark, src,
      Seq((61L, "p0", 610.0, 2L, false), (1L, "p1", 0.0, 2L, true))
        .toDF("k", "part", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))              // v2
    def stream = spark.readStream.format("manifest-feed")
      .option("path", src).option("mode", "changes")
      .option("startingVersion", "earliest")
      .option("snapshotChunkPartitions", "2").load()
    // Trigger.Once = exactly ONE micro-batch, i.e. a kill after the
    // first snapshot chunk — the deterministic mid-snapshot restart
    val q1 = stream.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.Once()).start()
    q1.awaitTermination()
    val afterOne = spark.read.parquet(sink).count()
    assert(afterOne > 0 && afterOne < 59,
      s"first batch must be ONE bounded chunk, not the snapshot " +
        s"($afterOne rows)")
    // restart: drains the remaining chunks (each its own batch) — the
    // snapshot completes through v2, no diffs beyond it exist
    val q2 = stream.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val got = spark.read.parquet(sink)
      .filter(col("_change_type") === "insert")
      .select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Layout.readManifest(spark, src).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want,
      "the chunked backfill must reassemble the exact snapshot")
    assert(spark.read.parquet(sink)
      .filter(col("_change_type") =!= "insert").isEmpty,
      "a pure snapshot backfill carries only inserts")
    // ≥3 chunks ran (6 partitions / 2 per chunk): the sink saw at
    // least 3 distinct batch files beyond the first
    val batches = new java.io.File(ckpt, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 3, s"snapshot must page as several batches " +
      s"($batches commits)")
    // post-snapshot publishes flow as NET DIFFS on the same checkpoint
    Layout.mergeManifest(spark, src,
      Seq((62L, "p2", 620.0, 3L, false))
        .toDF("k", "part", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))              // v3
    val q3 = stream.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    val tail = spark.read.parquet(sink)
      .filter(col("k") === 62L).collect()
    assert(tail.length == 1 &&
      tail.head.getAs[String]("_change_type") == "insert",
      s"post-snapshot increment must arrive as a diff: ${tail.toSeq}")
  }

  test("chunked snapshot with a MID-BACKFILL source publish: the " +
      "snapshot stays pinned to its version, the new publish follows " +
      "as a diff on the same checkpoint — nothing lost or doubled") {
    import spark.implicits._
    val src = tmpDir("midpub_src")
    val dst = tmpDir("midpub_dst")
    val ckpt = tmpDir("midpub_ckpt")
    Layout.writeManifestTable(spark, src,
      (1L to 60L).map(i => (i, s"p${i % 6}", i * 1.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))          // v1
    Layout.writeManifestTable(spark, dst,
      spark.emptyDataset[(Long, String, Double, Long)]
        .toDF("k", "part", "v", "ver"), Seq("part"))
    def writer = spark.readStream.format("manifest-feed")
      .option("path", src).option("mode", "changes")
      .option("startingVersion", "earliest")
      .option("snapshotChunkPartitions", "2").load()
      .writeStream.format("manifest")
      .option("path", dst)
      .option("keys", "k").option("versionCol", "ver")
      .option("changeTypeCol", "_change_type")
      .option("checkpointLocation", ckpt)
    // one chunk, then stop — mid-backfill
    val q1 = writer
      .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
    q1.awaitTermination()
    val partial = Layout.readManifest(spark, dst).count()
    assert(partial > 0 && partial < 60, s"one chunk only ($partial)")
    // the SOURCE moves while the backfill is paused: update + insert
    Layout.mergeManifest(spark, src,
      Seq((1L, "p1", 11.0, 2L, false), (61L, "p1", 610.0, 2L, false))
        .toDF("k", "part", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))               // v2
    // resume: the remaining chunks replay the PINNED v1 snapshot, then
    // the v1->v2 diff applies — the update must not be lost to a
    // stale chunk nor doubled
    val q2 = writer
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val got = Layout.readManifest(spark, dst).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Layout.readManifest(spark, src).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want && got.get(1L).contains(11.0) &&
      got.get(61L).contains(610.0),
      s"replica must equal the moved source: ${got.size} vs ${want.size}")
  }

  test("mid-backfill retention pin for an EXISTING consumer: the " +
      "sibling __snapshot cursor blocks a reap that would drop the " +
      "pinned snapshot version, and clears once the snapshot completes") {
    import spark.implicits._
    val src = tmpDir("pin_src")
    val sink = tmpDir("pin_sink")
    val ckpt = tmpDir("pin_ckpt")
    Layout.writeManifestTable(spark, src,
      (1L to 60L).map(i => (i, s"p${i % 6}", i * 1.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))            // v1
    Layout.mergeManifest(spark, src,
      Seq((61L, "p0", 610.0, 2L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")                                          // v2
    // EXISTING consumer: its prior deployment acked the live version
    Layout.writeFeedCursor(spark, src, "pinc", 2)
    def stream = spark.readStream.format("manifest-feed")
      .option("path", src).option("mode", "changes")
      .option("startingVersion", "earliest")
      .option("consumer", "pinc")
      .option("snapshotChunkPartitions", "2").load()
    // one chunk, then stop — mid-backfill with the snapshot pinned @v2
    val q1 = stream.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.Once()).start()
    q1.awaitTermination()
    // a second single-batch run: Spark commits batch N's offsets to
    // the source as the NEXT run starts, which is when the pin lands
    val q1b = stream.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.Once()).start()
    q1b.awaitTermination()
    assert(Layout.readFeedCursor(spark, src, "pinc").contains(2),
      "the existing cursor must never move backwards")
    assert(Layout.readFeedCursor(spark, src, "pinc.__snapshot")
      .contains(2), "mid-backfill must pin through the sibling cursor")
    // the source moves on AND the old deployment keeps acking the main
    // cursor forward — the exact shape where, without the sibling pin,
    // a keepVersions=1 reap would drop the pinned v2 mid-backfill and
    // wedge the stream permanently (the offset log pins v2)
    Layout.mergeManifest(spark, src,
      Seq((62L, "p1", 620.0, 3L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")                                          // v3
    Layout.writeFeedCursor(spark, src, "pinc", 3)
    val e = intercept[IllegalArgumentException] {
      Layout.reapManifest(spark, src, keepVersions = 1)
    }
    assert(e.getMessage.contains("pinc.__snapshot"), e.getMessage)
    // resume: the remaining chunks replay the RETAINED pinned v2, the
    // v2->v3 diff follows, the pin clears, and the reap proceeds
    val q2 = stream.writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(Layout.readFeedCursor(spark, src, "pinc.__snapshot").isEmpty,
      "the pin must clear once the snapshot completes")
    Layout.reapManifest(spark, src, keepVersions = 1)
    val got = spark.read.parquet(sink)
      .groupBy("k").agg(sum(when(col("_change_type") === "insert", 1)
        .otherwise(-1)).as("net"))
      .filter(col("net") > 0).select("k").collect()
      .map(_.getLong(0)).toSet
    assert(got == (1L to 62L).toSet,
      s"backfill + diff must cover exactly the live keys (${got.size})")
  }

  test("changeTypeCol sink migrates LEGACY doubled sink markers: a " +
      "checkpoint recorded under the two-publish 2*batchId(+1) scheme " +
      "resumes instead of hitting the id-regression guard") {
    import spark.implicits._
    val src = tmpDir("legacy_src")
    val dst = tmpDir("legacy_dst")
    val ckpt = tmpDir("legacy_ckpt")
    Layout.writeManifestTable(spark, src,
      (1L to 30L).map(i => (i, s"p${i % 3}", i * 1.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))            // v1
    Layout.writeManifestTable(spark, dst,
      spark.emptyDataset[(Long, String, Double, Long)]
        .toDF("k", "part", "v", "ver"), Seq("part"))
    def writer = spark.readStream.format("manifest-feed")
      .option("path", src).option("mode", "changes")
      .option("startingVersion", "earliest").load()
      .writeStream.format("manifest")
      .option("path", dst)
      .option("keys", "k").option("versionCol", "ver")
      .option("changeTypeCol", "_change_type")
      .option("checkpointLocation", ckpt)
    val q1 = writer.trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination()
    val lastId = Layout.readManifestMeta(spark, dst,
      Layout.manifestVersion(spark, dst).get).sinkBatch("#net")
    assert(lastId >= 0)
    // simulate the pre-upgrade marker state: the last batch was
    // recorded under the OLD doubled encoding (insert half = 2B+1) in
    // the BARE namespace, and no #net marker exists yet
    Layout.rewriteSinkMarker(spark, dst, "#net", -1L)
    Layout.rewriteSinkMarker(spark, dst, "", 2 * lastId + 1)
    // the source moves; the resumed (upgraded) sink's next batch id is
    // lastId+1, and the legacy marker 2*lastId+1 = 2*(lastId+1)-1 must
    // migrate rather than throw "BEHIND the recorded marker"
    Layout.mergeManifest(spark, src,
      Seq((31L, "p1", 310.0, 2L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")                                          // v2
    val q2 = writer.trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    val got = Layout.readManifest(spark, dst).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = Layout.readManifest(spark, src).select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want, s"replica must equal the moved source " +
      s"(${got.size} vs ${want.size})")
    // the resumed batch recorded its marker under #net — the scheme
    // never writes raw ids into the doubled bare namespace again
    val mEnd = Layout.readManifestMeta(spark, dst,
      Layout.manifestVersion(spark, dst).get)
    assert(mEnd.sinkBatch("#net") == lastId + 1,
      s"#net marker must advance (${mEnd.sinkBatch("#net")})")
    // a FULLY-APPLIED legacy marker makes the replayed batch a no-op:
    // claim the NEXT batch already applied pre-upgrade and verify the
    // skip (the source row never lands)
    Layout.rewriteSinkMarker(spark, dst, "#net", -1L)
    Layout.rewriteSinkMarker(spark, dst, "", 2 * (lastId + 2) + 1)
    Layout.mergeManifest(spark, src,
      Seq((32L, "p2", 320.0, 3L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    val q3 = writer.trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination()
    assert(!Layout.readManifest(spark, dst).select("k").collect()
      .map(_.getLong(0)).contains(32L),
      "a batch the legacy marker proves applied must replay as a skip")
  }

  test("manifest-feed: an explicit startingVersion excludes prior " +
      "versions; self-describing schema refuses .schema()") {
    val dir = tmpDir("fromnow")
    val sink = tmpDir("sink2")
    val ckpt = tmpDir("ckpt2")
    seedTable(dir)                                        // v1
    delta(dir, Seq((5L, "a", 50.0, 2L)))                  // v2 (pre-start)
    def drain(): Unit = {
      val q = spark.readStream.format("manifest-feed")
        .option("path", dir).option("startingVersion", "2").load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // the first batch is an empty ANCHOR (nothing newer than
            // startingVersion): zero rows, but the checkpoint now pins
            // the stream's position durably
    assert(spark.read.parquet(sink).isEmpty,
      "pre-start versions must not stream")
    delta(dir, Seq((6L, "d", 60.0, 3L)))                  // v3
    drain()
    assert(keys(spark.read.parquet(sink)) == Set(6L))
    val e = intercept[Exception] {
      spark.readStream.format("manifest-feed")
        .schema(org.apache.spark.sql.types.StructType(Nil))
        .option("path", dir).load()
    }
    assert(e.getMessage.contains("self-describing"), e.getMessage)
  }
}
