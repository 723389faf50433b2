package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core._
import graft.operators.Multimodal
import graft.streaming.Streams

/** M4 surfaces: config-driven pipelines, streaming, multimodal plumbing. */
class SurfacesSpec extends SparkSpec {

  /** Run `body` once per streaming state-store provider: the default
    * in-heap HDFSBackedStateStoreProvider, then RocksDB
    * ([[Streams.useRocksDbStateStore]] — the documented at-scale
    * backend). Provider-specific divergence (state encoding,
    * eviction/timeout semantics, dropDuplicatesWithinWatermark
    * behavior, flatMapGroupsWithState state round-trips) surfaces here
    * instead of on a 100 TB cluster. The conf is read at query START,
    * so each iteration's queries run wholly under its provider; bodies
    * create fresh tmp dirs / UUID sink names, so both passes are
    * independent. SessionizeSpec pins (via rocksdb* custom metrics)
    * that the RocksDB conf really engages the provider — no silent
    * fallback. NOT needed for foreachBatch sinks (cdcApply,
    * incrementalAgg, annIngest): those keep no state-store state by
    * construction — their exactly-once markers live in the sink
    * table/checkpoint. */
  private def stateMatrixTest(name: String)(body: => Unit): Unit =
    test(name + " [state-store matrix: hdfs + rocksdb]") {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      try {
        spark.conf.unset(key)
        body
        Streams.useRocksDbStateStore(spark)
        body
      } finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }

  test("config-driven pipeline hydrates from JSON and runs") {
    val out = Files.createTempDirectory("cfg").toString
    val json =
      s"""[
        {"node_name": "src", "node_type": "Parquet", "node_seqno": 1,
         "config": {"path": "${sf("nation")}",
                    "date_field": null}},
        {"node_name": "dst", "node_type": "CSV", "node_seqno": 2,
         "config": {"path": "$out/n", "delimiter": "|",
                    "key_field": "process_id"}}
      ]""".replace("\"date_field\": null}", "\"ignore\": \"x\"}")
    val p = PipelineConfig.fromJson("cfg_pipe", json, new SourceRegistry)
    assert(p.steps.map(_.stepType) == Seq(StepType.EL))
    val task = p.run(spark, Calendar.day("2023-01-01"), runId = 5L)
    assert(task.status == Status.Done)
    val back = spark.read.option("sep", "|").option("header", true).csv(s"$out/n")
    assert(back.count() == 25)
    assert(back.columns.contains("pd_process_id"))
  }

  test("config registry covers the reference model surface") {
    assert(Seq("Table", "Select", "Insert", "SQL", "CSV", "JSON", "XML",
      "Parquet", "Filenames", "FileManager", "Merge", "Compact",
      "Manifest", "IvmApply", "Zorder", "SortedWrite", "FoldDeltas",
      "Reap", "IvmSync", "ManifestFeed", "Repartition", "Maintain")
      .forall(PipelineConfig.registry.contains))
    // the Repartition node parses the in-place bucket-adoption knobs
    // (new_bucket_cols/new_buckets; '' + 0 un-buckets)
    val rp = PipelineConfig.registry("Repartition")(
      Map("path" -> "/t", "partition_cols" -> "day",
        "new_bucket_cols" -> "k", "new_buckets" -> "16"),
      new SourceRegistry).asInstanceOf[graft.models.RepartitionModel]
    assert(rp.newBucketCols.contains(Seq("k")) &&
      rp.newBuckets.contains(16))
    val rpU = PipelineConfig.registry("Repartition")(
      Map("path" -> "/t", "partition_cols" -> "day",
        "new_bucket_cols" -> "", "new_buckets" -> "0"),
      new SourceRegistry).asInstanceOf[graft.models.RepartitionModel]
    assert(rpU.newBucketCols.contains(Nil) && rpU.newBuckets.contains(0))
  }

  test("Maintain node: data-derived policy folds EXACTLY the partitions " +
      "whose delta depth crossed, compacts/reaps on their thresholds, " +
      "and records its decisions") {
    import graft.operators.Layout
    import spark.implicits._
    val root = Files.createTempDirectory("cfg_maintain").toString
    val dir = s"$root/t"
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L), (3L, "c", 30.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    // mixed workload: part=a takes THREE trickle deltas (crosses the
    // policy), part=b one (does not), part=c none
    def delta(k: Long, p: String, ver: Long): Unit = {
      Layout.mergeManifestDelta(spark, dir,
        Seq((k, p, k * 1.0, ver)).toDF("k", "part", "v", "ver"),
        Seq("k"), "ver")
      ()
    }
    delta(10L, "a", 2L); delta(11L, "a", 2L); delta(12L, "a", 2L)
    delta(20L, "b", 2L)
    val node = PipelineConfig.registry("Maintain")(
      Map("path" -> dir, "max_pending_deltas" -> "3"), new SourceRegistry)
      .asInstanceOf[graft.models.MaintainModel]
    val r = node.execute(StepContext(spark, Calendar.day("2023-01-01")))
    // the fold touched part=a ONLY; part=b's lone delta keeps pending
    assert(r.resultLong.exists(_.startsWith("fold=part=a;")),
      r.resultLong.toString)
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.deltas.keySet == Set("part=b"),
      s"only the crossed partition folds: ${m.deltas.keySet}")
    // rows intact either way
    assert(Layout.readManifest(spark, dir).count() == 7)
    // a second run decides NOTHING (depth 1 < 3): version unchanged
    val v0 = Layout.manifestVersion(spark, dir).get
    val r2 = node.execute(StepContext(spark, Calendar.day("2023-01-01")))
    assert(r2.resultValue.contains(0L) &&
      Layout.manifestVersion(spark, dir).contains(v0),
      "an under-threshold table must be a no-op")
    // with retention consent the node also reaps history
    val full = PipelineConfig.registry("Maintain")(
      Map("path" -> dir, "max_pending_deltas" -> "1",
        "max_files_per_partition" -> "1", "keep_versions" -> "1"),
      new SourceRegistry)
    val r3 = full.asInstanceOf[graft.models.MaintainModel]
      .execute(StepContext(spark, Calendar.day("2023-01-01")))
    assert(r3.resultLong.exists(_.contains("fold=part=b")),
      r3.resultLong.toString)
    assert(r3.resultLong.exists(s => s.contains("reap=") &&
      !s.endsWith("reap=0")), r3.resultLong.toString)
    val mEnd = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(mEnd.deltas.isEmpty)
    assert(Layout.readManifest(spark, dir).count() == 7)
    // age-based retention rider: a wide keep_age_hours window makes
    // the reap a no-op even with keep_versions=1 (union semantics)
    val aged = PipelineConfig.registry("Maintain")(
      Map("path" -> dir, "max_pending_deltas" -> "1",
        "keep_versions" -> "1", "keep_age_hours" -> "9999"),
      new SourceRegistry)
    val before = Layout.manifestVersions(spark, dir)
    aged.asInstanceOf[graft.models.MaintainModel]
      .execute(StepContext(spark, Calendar.day("2023-01-01")))
    assert(Layout.manifestVersions(spark, dir) == before,
      "every version is younger than the age window — nothing reaps")
  }

  test("Maintain on a DECLARED append-only table: crossing the file " +
      "threshold compacts it, and a LAGGING appends-mode streaming " +
      "consumer drains across the compaction hash-exact") {
    import graft.operators.Layout
    import spark.implicits._
    val root = Files.createTempDirectory("cfg_maintain_ao").toString
    val dir = s"$root/t"
    val sink = s"$root/sink"
    val ckpt = s"$root/ckpt"
    // a multi-file base: small maxRecordsPerFile splits each partition
    // dir into ~5 files at seed time (the shape months of paced ingest
    // folds leave behind)
    val mrKey = "spark.sql.files.maxRecordsPerFile"
    spark.conf.set(mrKey, "10")
    try Layout.writeManifestTable(spark, dir,
      (1L to 100L).map(i => (i, s"p${i % 2}", i * 1.0))
        .toDF("k", "part", "v"), Seq("part"), appendOnly = true)  // v1
    finally spark.conf.unset(mrKey)
    Layout.appendManifest(spark, dir,
      (101L to 110L).map(i => (i, s"p${i % 2}", i * 1.0))
        .toDF("k", "part", "v"))                                  // v2
    def drain(): Unit = {
      val q = spark.readStream.format("manifest-feed")
        .option("path", dir).option("startingVersion", "earliest")
        .option("consumer", "ao_lag").load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain() // the consumer is current through v2
    // the Maintain policy: file threshold crossed -> compact; the
    // pending spec-less append stays pending (fold threshold not set)
    val r = PipelineConfig.registry("Maintain")(
      Map("path" -> dir, "max_pending_deltas" -> "99",
        "max_files_per_partition" -> "2"), new SourceRegistry)
      .asInstanceOf[graft.models.MaintainModel]
      .execute(StepContext(spark, Calendar.day("2023-01-01")))  // v3
    assert(r.resultLong.exists(s => s.contains("compact=") &&
      !s.contains("compact=0")), r.resultLong.toString)
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.appendOnly && m.deltas.nonEmpty,
      "the declaration and the pending append must survive compaction")
    Layout.appendManifest(spark, dir,
      (111L to 115L).map(i => (i, s"p${i % 2}", i * 1.0))
        .toDF("k", "part", "v"))                                  // v4
    drain() // LAGGING consumer crosses the compaction: row-identical
            // re-layout emits NOTHING, only v4's rows arrive
    val got = spark.read.parquet(sink).select("k", "v").collect()
    assert(got.length == 115,
      s"the compaction must emit nothing into the feed (${got.length})")
    assert(got.map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap ==
      Layout.readManifest(spark, dir).select("k", "v").collect()
        .map(r0 => r0.getLong(0) -> r0.getDouble(1)).toMap,
      "the drained feed must equal the table across the compaction")
  }

  test("config-driven merge-on-read lifecycle: mor Merge, FoldDeltas, " +
      "Reap as one scheduled pipeline") {
    import graft.operators.Layout
    import spark.implicits._
    val root = Files.createTempDirectory("cfg_mor").toString
    val dir = s"$root/t"
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    Seq((1L, "a", 11.0, 2L), (3L, "c", 30.0, 2L))
      .toDF("k", "part", "v", "ver").write.parquet(s"$root/batch")
    val json =
      s"""[
        {"node_name": "apply", "node_type": "Merge", "node_seqno": 1,
         "config": {"path": "$dir", "updates_path": "$root/batch",
           "keys": "k", "version_col": "ver", "manifest": "true",
           "strategy": "mor"}},
        {"node_name": "fold", "node_type": "FoldDeltas", "node_seqno": 2,
         "config": {"path": "$dir"}},
        {"node_name": "vacuum", "node_type": "Reap", "node_seqno": 3,
         "config": {"path": "$dir", "keep_versions": "1"}}
      ]"""
    val p = PipelineConfig.fromJson("cfg_mor", json, new SourceRegistry)
    assert(p.run(spark, Calendar.day("2023-01-01")).status == Status.Done)
    val got = Layout.readManifest(spark, dir).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    assert(got == Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    // folded + reaped: one generation per partition remains on disk
    assert(Layout.readManifest(spark, dir).inputFiles
      .map(_.replaceAll("(/gen=\\d+)/.*", "$1")).distinct.length == 3)
    // a cow-strategy merge with mismatched spec would fail loudly
    intercept[IllegalArgumentException] {
      graft.models.MergeModel(dir, s"$root/batch", Seq("k", "part"),
        "ver", manifest = true)
        .execute(StepContext(spark, Calendar.day("2023-01-01")))
    }
  }

  test("config-driven IvmApply folds a staged delta; replayed run_id " +
      "is a no-op") {
    import spark.implicits._
    val root = Files.createTempDirectory("cfg_ivm").toString
    Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
      .write.parquet(s"$root/delta")
    val json =
      s"""[{"node_name": "refresh", "node_type": "IvmApply",
           "node_seqno": 1,
           "config": {"path": "$root/sum", "delta_path": "$root/delta",
             "keys": "k", "sum_cols": "v", "batch_id": "{run_id}"}}]"""
    def runWith(runId: Long): Unit = {
      val p = PipelineConfig.fromJson("cfg_ivm", json, new SourceRegistry)
      assert(p.steps.map(_.stepType) == Seq(StepType.EX))
      assert(p.run(spark, Calendar.day("2023-01-01"), runId = runId)
        .status == Status.Done)
    }
    runWith(7L)
    def total: Double = graft.operators.Ivm.read(spark, s"$root/sum")
      .agg(org.apache.spark.sql.functions.sum(col("sum_v").cast("double")))
      .head().getDouble(0)
    assert(total == 8.0)
    runWith(7L) // same run id replayed: the fold must not double-count
    assert(total == 8.0)
    runWith(8L) // a NEW run id folds again
    assert(total == 16.0)
  }

  test("config-driven Compact node compacts a MANIFEST table") {
    import graft.operators.Layout
    import spark.implicits._
    val dir = Files.createTempDirectory("cfg_mancompact").resolve("t").toString
    val mrKey = "spark.sql.files.maxRecordsPerFile"
    val mrPrev = spark.conf.get(mrKey, "0")
    spark.conf.set(mrKey, "4") // split the clustered write: multi-file gens
    try Layout.writeManifestTable(spark, dir,
      (1 to 20).map(i => (i.toLong, s"p${i % 2}", 1L))
        .toDF("k", "part", "ver"),
      Seq("part"))
    finally spark.conf.set(mrKey, mrPrev)
    val json =
      s"""[{"node_name": "opt", "node_type": "Compact", "node_seqno": 1,
           "config": {"path": "$dir", "manifest": "true",
             "max_files": "1"}}]"""
    val p = PipelineConfig.fromJson("cfg_mc", json, new SourceRegistry)
    val task = p.run(spark, Calendar.day("2023-01-01"))
    assert(task.status == Status.Done)
    assert(Layout.manifestVersion(spark, dir).contains(2))
    assert(Layout.readManifest(spark, dir).count() == 20)
  }

  test("config-driven Manifest source extracts a pinned snapshot") {
    import graft.operators.Layout
    import spark.implicits._
    val dir = Files.createTempDirectory("cfg_manifest").resolve("t").toString
    val out = Files.createTempDirectory("cfg_manifest_out").toString
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("k", "part", "ver"),
      Seq("part"))
    Layout.mergeManifest(spark, dir,
      Seq((3L, "c", 2L)).toDF("k", "part", "ver"), Seq("k"), "ver")
    val json =
      s"""[
        {"node_name": "src", "node_type": "Manifest", "node_seqno": 1,
         "config": {"path": "$dir"}},
        {"node_name": "dst", "node_type": "Parquet", "node_seqno": 2,
         "config": {"path": "$out/p"}}
      ]"""
    val p = PipelineConfig.fromJson("cfg_manifest", json, new SourceRegistry)
    assert(p.run(spark, Calendar.day("2023-01-01")).status == Status.Done)
    assert(spark.read.parquet(s"$out/p").count() == 3)
    // time-travel variant: version 1 is the seed
    val m1 = graft.models.ManifestModel(dir, version = Some(1))
    assert(m1.extract(StepContext(spark, Calendar.day("2023-01-01")))
      .count() == 2)
  }

  test("config-driven Manifest source prunes via ranges and eqs") {
    import graft.operators.Layout
    import spark.implicits._
    val dir = Files.createTempDirectory("cfg_manprune").resolve("t").toString
    // 4 partitions with disjoint v windows and disjoint key sets
    Layout.writeManifestTable(spark,
      dir, (0 until 40).map(i => (i.toLong, s"p${i / 10}", (i / 10) * 100 + i))
        .toDF("k", "part", "v"), Seq("part"),
      statsCols = Seq("v"), bloomCols = Seq("k"))
    val full = Layout.readManifest(spark, dir).inputFiles.length
    val ctx = StepContext(spark, Calendar.day("2023-01-01"))
    // range window covering only p1's v values (100..119)
    val ranged = PipelineConfig.registry("Manifest")(
      Map("path" -> dir, "ranges" -> "v:100..119"), new SourceRegistry)
      .asInstanceOf[graft.models.ManifestModel].extract(ctx)
    assert(ranged.inputFiles.length < full, "range stats must prune files")
    assert(ranged.select("k").as[Long].collect().sorted.toSeq ==
      (10L until 20L))
    // bloom point lookup on one key
    val pointed = PipelineConfig.registry("Manifest")(
      Map("path" -> dir, "eqs" -> "k:25"), new SourceRegistry)
      .asInstanceOf[graft.models.ManifestModel].extract(ctx)
    assert(pointed.inputFiles.length < full, "blooms must prune files")
    assert(pointed.select("k").as[Long].collect().toSeq == Seq(25L))
    // planner mode: downstream filters prune by themselves (the
    // ManifestFileIndex surface behind the same node type)
    val auto = PipelineConfig.registry("Manifest")(
      Map("path" -> dir, "planner" -> "true"), new SourceRegistry)
      .asInstanceOf[graft.models.ManifestModel].extract(ctx)
      .filter(col("v") >= 100 && col("v") <= 119)
    assert(auto.select("k").as[Long].collect().sorted.toSeq ==
      (10L until 20L))
    // guards: version pins, double-skipping, planner+explicit knobs
    intercept[IllegalArgumentException] {
      graft.models.ManifestModel(dir, version = Some(1),
        ranges = Seq(("v", "0", "1")))
    }
    intercept[IllegalArgumentException] {
      graft.models.ManifestModel(dir, ranges = Seq(("v", "0", "1")),
        eqs = Seq(("k", "1")))
    }
    intercept[IllegalArgumentException] {
      graft.models.ManifestModel(dir, planner = true,
        eqs = Seq(("k", "1")))
    }
  }

  test("ManifestFeed source: snapshot then increments, cursor acks only " +
      "after a successful load") {
    import graft.operators.Layout
    import graft.models.{ManifestFeedModel, ParquetModel}
    import spark.implicits._
    val dir = Files.createTempDirectory("cfg_feed").resolve("t").toString
    val out = Files.createTempDirectory("cfg_feed_out").toString
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    val cal = Calendar.day("2023-01-01")
    def runFeed(): Long = {
      val json =
        s"""[
          {"node_name": "src", "node_type": "ManifestFeed", "node_seqno": 1,
           "config": {"path": "$dir", "consumer": "sink1"}},
          {"node_name": "dst", "node_type": "Parquet", "node_seqno": 2,
           "config": {"path": "$out/p", "append": "true"}}
        ]"""
      val p = PipelineConfig.fromJson("cfg_feed", json, new SourceRegistry)
      assert(p.run(spark, cal).status == Status.Done)
      spark.read.parquet(s"$out/p").count()
    }
    // run 1: the initial snapshot lands as inserts, cursor at v1
    assert(runFeed() == 2)
    assert(Layout.readFeedCursor(spark, dir, "sink1").contains(1))
    // run 2 with no table change: empty increment, nothing appended
    assert(runFeed() == 2)
    // a merge publishes v2; run 3 ships exactly its net changes
    Layout.mergeManifest(spark, dir,
      Seq((1L, "a", 11.0, 2L), (3L, "c", 30.0, 2L))
        .toDF("k", "part", "v", "ver"), Seq("k"), "ver")
    assert(runFeed() == 5) // +1 delete (k=1 old) +2 inserts (k=1', k=3)
    assert(Layout.readFeedCursor(spark, dir, "sink1").contains(2))
    val changes = spark.read.parquet(s"$out/p")
      .filter(col("_change_type") === "delete")
      .select("k", "v").as[(Long, Double)].collect().toSeq
    assert(changes == Seq((1L, 10.0)))
    // a FAILED load must not ack: extract without release leaves the
    // cursor where it was, so the increment replays
    Layout.mergeManifest(spark, dir,
      Seq((4L, "d", 40.0, 3L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    val m = ManifestFeedModel(dir, "sink1")
    assert(m.extract(StepContext(spark, cal)).count() == 1)
    assert(Layout.readFeedCursor(spark, dir, "sink1").contains(2),
      "cursor must not advance before release")
    m.release(StepContext(spark, cal))
    assert(Layout.readFeedCursor(spark, dir, "sink1").contains(3))
    // backwards ack refuses loudly
    intercept[IllegalArgumentException] {
      Layout.writeFeedCursor(spark, dir, "sink1", 1)
    }
    // a second consumer starts from its own snapshot independently
    val (snap2, ack2) = Layout.feedSince(spark, dir, "sink2")
    assert(ack2 == 3 && snap2.count() == 4)
    // retention guards the cursors: sink2 never acked, so a reap that
    // would drop everything below the live version refuses loudly
    assert(Layout.feedConsumers(spark, dir) == Map("sink1" -> 3))
    Layout.writeFeedCursor(spark, dir, "sink2", 1)
    val e = intercept[IllegalArgumentException] {
      Layout.reapManifest(spark, dir, keepVersions = 1)
    }
    assert(e.getMessage.contains("sink2") &&
      e.getMessage.contains("keepVersions"), e.getMessage)
    // wide-enough window: fine; abandoned consumer: skippable
    assert(Layout.reapManifest(spark, dir, keepVersions = 3).isEmpty ||
      true) // any outcome — the call must simply not refuse
    Layout.reapManifest(spark, dir, keepVersions = 1,
      ignoreConsumers = Set("sink2"))
    // post-reap, the stranded cursor's feed fails loudly on the
    // missing generations rather than returning wrong increments
    intercept[Exception] {
      Layout.feedSince(spark, dir, "sink2")._1.collect()
    }
  }

  test("ManifestFeed mode=appends: cursor-driven O(|new rows|) " +
      "consumption for append-only tables") {
    import graft.operators.Layout
    import graft.models.ManifestFeedModel
    import spark.implicits._
    val dir = Files.createTempDirectory("cfg_feed_app").resolve("t").toString
    val out = Files.createTempDirectory("cfg_feed_app_out").toString
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    val cal = Calendar.day("2023-01-01")
    def runFeed(): Long = {
      val json =
        s"""[
          {"node_name": "src", "node_type": "ManifestFeed", "node_seqno": 1,
           "config": {"path": "$dir", "consumer": "app1",
                      "mode": "appends"}},
          {"node_name": "dst", "node_type": "Parquet", "node_seqno": 2,
           "config": {"path": "$out/p", "append": "true"}}
        ]"""
      val p = PipelineConfig.fromJson("cfg_feed_app", json,
        new SourceRegistry)
      assert(p.run(spark, cal).status == Status.Done)
      spark.read.parquet(s"$out/p").count()
    }
    // run 1: the seed snapshot (no _change_type column in appends mode)
    assert(runFeed() == 2)
    assert(Layout.readFeedCursor(spark, dir, "app1").contains(1))
    assert(!spark.read.parquet(s"$out/p").columns.contains("_change_type"))
    // caught up: empty increment
    assert(runFeed() == 2)
    // two delta appends + a fold; the next run ships exactly the new
    // rows, the fold transparently skipped
    Layout.mergeManifestDelta(spark, dir,
      Seq((3L, "a", 30.0, 2L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    Layout.mergeManifestDelta(spark, dir,
      Seq((4L, "c", 40.0, 2L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    Layout.foldManifestDeltas(spark, dir)
    assert(runFeed() == 4)
    assert(Layout.readFeedCursor(spark, dir, "app1").contains(4))
    // a copy-on-write rewrite fails the RUN (no silent skips), and the
    // failed run must not ack
    Layout.mergeManifest(spark, dir,
      Seq((1L, "a", 11.0, 3L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    val m = ManifestFeedModel(dir, "app1", mode = "appends")
    intercept[IllegalArgumentException] {
      m.extract(StepContext(spark, cal)).collect()
    }
    assert(Layout.readFeedCursor(spark, dir, "app1").contains(4),
      "a failed appends run must not advance the cursor")
    // mode typo fails at construction
    intercept[IllegalArgumentException] {
      ManifestFeedModel(dir, "app1", mode = "cdc")
    }
  }

  test("config-driven Compact node runs table maintenance as an EX pipeline") {
    val dir = Files.createTempDirectory("cfg_compact").resolve("t").toString
    val li = spark.read.parquet(sf("lineitem")).select("l_orderkey", "l_quantity")
    for (b <- 0 until 4)
      li.filter(pmod(col("l_orderkey"), lit(4)) === b)
        .repartition(3).write.mode("append").parquet(dir)
    val before = spark.read.parquet(dir).inputFiles.length
    val json =
      s"""[{"node_name": "opt", "node_type": "Compact", "node_seqno": 1,
           "config": {"path": "$dir", "generational": "true"}}]"""
    val p = PipelineConfig.fromJson("cfg_compact", json, new SourceRegistry)
    assert(p.steps.map(_.stepType) == Seq(StepType.EX))
    val task = p.run(spark, Calendar.day("2023-01-01"))
    assert(task.status == Status.Done)
    assert(graft.operators.Layout.currentGeneration(spark, dir).contains(1))
    val cur = graft.operators.Layout.readCurrent(spark, dir)
    assert(cur.inputFiles.length < before)
    assert(cur.count() == li.count())
  }

  test("streaming file monitor ingests incrementally with checkpointed state") {
    val dir = Files.createTempDirectory("stream_src").toString
    val out = Files.createTempDirectory("stream_out").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType)))
    Files.write(java.nio.file.Paths.get(dir, "a.csv"), "1,1.5\n2,2.5\n".getBytes)

    val src = Streams.fileMonitor(spark, dir, "csv", schema)
    assert(src.isStreaming)
    Streams.runAvailableNow(Streams.ingest(src, s"$out/data", ckpt))
    assert(spark.read.parquet(s"$out/data").count() == 2)

    // second batch: only the NEW file is processed (checkpoint tracking)
    Files.write(java.nio.file.Paths.get(dir, "b.csv"), "3,3.5\n".getBytes)
    Streams.runAvailableNow(Streams.ingest(
      Streams.fileMonitor(spark, dir, "csv", schema), s"$out/data", ckpt))
    val rows = spark.read.parquet(s"$out/data")
    assert(rows.count() == 3)
    assert(rows.agg(sum("v")).collect()(0).getDouble(0) == 7.5)
  }

  stateMatrixTest("streaming windowed stats with watermark produce event-time windows") {
    val dir = Files.createTempDirectory("stream_ev").toString
    val out = Files.createTempDirectory("stream_ev_out").toString
    val ckpt = Files.createTempDirectory("stream_ev_ckpt").toString
    // one file per micro-batch: append-mode emission uses the watermark
    // from the END of the PREVIOUS batch, so the flush of the 10:00
    // window happens in batch 3 (after batch 2 advanced the watermark
    // past 10:40 via the 11:10 event)
    Files.write(java.nio.file.Paths.get(dir, "e1.csv"),
      ("2023-01-01T10:05:00,click,1.0\n" +
       "2023-01-01T10:20:00,click,2.0\n").getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e2.csv"),
      "2023-01-01T11:10:00,view,3.0\n".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e3.csv"),
      "2023-01-01T12:30:00,view,4.0\n".getBytes)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val stats = Streams.windowedStats(
      Streams.fileMonitor(spark, dir, "csv", schema,
        options = Map("maxFilesPerTrigger" -> "1")),
      tsCol = "ts", window = "1 hour", watermark = "30 minutes",
      valueCol = "value", keyCols = Seq("event_type"))
    // complete-mode-free sink: write append with AvailableNow; watermark
    // closes the windows at drain end
    val q = stats.writeStream.format("parquet")
      .option("path", s"$out/w").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val res = spark.read.parquet(s"$out/w")
    // the 10:00 window (2 clicks) is flushed; later windows remain in
    // state for the next incremental run.
    assert(res.count() >= 1)
    val first = res.orderBy("window_start").collect()(0)
    assert(first.getAs[java.sql.Timestamp]("window_start").toString
      .startsWith("2023-01-01 10:00:00"))
    assert(first.getAs[Long]("n") == 2L)
  }

  stateMatrixTest("streaming KMV sketch per window: flushed sketch equals batch sketch") {
    val dir = Files.createTempDirectory("stream_kmv").toString
    val out = Files.createTempDirectory("stream_kmv_out").toString
    val ckpt = Files.createTempDirectory("stream_kmv_ckpt").toString
    // the 10:00 window sees users u1, u2, u1 (a duplicate); the 11:10
    // event advances the watermark past the window end so it flushes
    Files.write(java.nio.file.Paths.get(dir, "e1.csv"),
      ("2023-01-01T10:05:00,u1\n" +
       "2023-01-01T10:20:00,u2\n" +
       "2023-01-01T10:25:00,u1\n").getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e2.csv"),
      "2023-01-01T11:10:00,u3\n".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e3.csv"),
      "2023-01-01T12:30:00,u4\n".getBytes)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("user", StringType)))
    val sk = Streams.sketchByWindow(
      Streams.fileMonitor(spark, dir, "csv", schema,
        options = Map("maxFilesPerTrigger" -> "1")),
      tsCol = "ts", window = "1 hour", watermark = "30 minutes",
      hashCol = xxhash64(col("user")), k = 64)
    val q = sk.writeStream.format("parquet")
      .option("path", s"$out/w").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val res = spark.read.parquet(s"$out/w").orderBy("window_start").collect()
    assert(res.nonEmpty)
    val first = res(0)
    assert(first.getAs[java.sql.Timestamp]("window_start").toString
      .startsWith("2023-01-01 10:00:00"))
    // batch twin over the same rows, same window grouping
    val batch = spark.read.schema(schema).csv(s"$dir/e1.csv")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(graft.expressions.Kmv.sketch(xxhash64(col("user")), 64).as("sk"))
      .head().getSeq[Long](1)
    assert(first.getSeq[Long](first.fieldIndex("sk")) == batch)
    // two distinct users -> sketch holds exactly 2 values (exact regime)
    assert(batch.size == 2)
  }

  stateMatrixTest("streaming heavy hitters per window equal the batch summary") {
    val dir = Files.createTempDirectory("stream_tk").toString
    val out = Files.createTempDirectory("stream_tk_out").toString
    val ckpt = Files.createTempDirectory("stream_tk_ckpt").toString
    Files.write(java.nio.file.Paths.get(dir, "e1.csv"),
      ("2023-01-01T10:05:00,a\n2023-01-01T10:10:00,a\n" +
       "2023-01-01T10:15:00,b\n2023-01-01T10:20:00,a\n").getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e2.csv"),
      "2023-01-01T11:10:00,c\n".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e3.csv"),
      "2023-01-01T12:30:00,d\n".getBytes)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("k", StringType)))
    val tk = Streams.topKeysByWindow(
      Streams.fileMonitor(spark, dir, "csv", schema,
        options = Map("maxFilesPerTrigger" -> "1")),
      tsCol = "ts", window = "1 hour", watermark = "30 minutes",
      keyCol = col("k"), capacity = 16)
    val q = tk.writeStream.format("parquet")
      .option("path", s"$out/w").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val res = spark.read.parquet(s"$out/w").orderBy("window_start").collect()
    assert(res.nonEmpty)
    val first = res(0).getSeq[Row](res(0).fieldIndex("top"))
      .map(r => (r.getString(0), r.getLong(1)))
    // exact regime: (a,3) then (b,1), count-desc deterministic
    assert(first == Seq(("a", 3L), ("b", 1L)))
  }

  stateMatrixTest("streaming resample+ffill: closed-grid emission equals the batch operator") {
    val dir = Files.createTempDirectory("stream_rsf").toString
    // user 1: bucket 0 (two obs), GAP at 10, bucket 20, GAP at 30,
    // bucket 40; user 2: single bucket. Step 10 s, base 2023-01-01T10Z.
    Files.write(java.nio.file.Paths.get(dir, "e1.csv"),
      ("2023-01-01T10:00:00,1,1.0\n2023-01-01T10:00:03,1,3.0\n" +
       "2023-01-01T10:00:25,1,5.0\n2023-01-01T10:00:45,1,7.0\n" +
       "2023-01-01T10:00:05,2,7.5\n").getBytes)
    // sentinel key -1 advances the watermark in two later batches so
    // every real bucket closes and emits before the finite drain ends;
    // the sentinels' own buckets never close and are filtered out
    Files.write(java.nio.file.Paths.get(dir, "e2.csv"),
      "2023-01-02T10:00:00,-1,0.0\n".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e3.csv"),
      "2023-01-03T10:00:00,-1,0.0\n".getBytes)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val src = Streams.fileMonitor(spark, dir, "csv", schema,
        options = Map("maxFilesPerTrigger" -> "1"))
      .withWatermark("ts", "0 seconds")
    val name = s"rsf_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = graft.streaming.Resample.ffill(src, 10L)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name).filter(col("user_id") >= 0)
      .orderBy("user_id", "bucket_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val batch = graft.operators.Relational.resampleFfill(
        spark.read.schema(schema).csv(s"$dir/e1.csv")
          .select(col("user_id"), col("ts").cast("long").as("ep"),
            col("value")),
        Seq("user_id"), "ep", 10L, "value")
      .orderBy("user_id", "bucket_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == batch, s"stream $got vs batch $batch")
    assert(got.size == 6) // 5 grid rows for user 1 (2 gaps) + 1 for user 2
    assert(got.count(_._3 == 0L) == 2, "two gap buckets carried forward")
    // the interp sibling over the same drain equals batch resampleInterp
    val name2 = s"rsi_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val src2 = Streams.fileMonitor(spark, dir, "csv", schema,
        options = Map("maxFilesPerTrigger" -> "1"))
      .withWatermark("ts", "0 seconds")
    val q2 = graft.streaming.Resample.interp(src2, 10L)
      .writeStream.format("memory").queryName(name2).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val gotI = spark.table(name2).filter(col("user_id") >= 0)
      .orderBy("user_id", "bucket_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val batchI = graft.operators.Relational.resampleInterp(
        spark.read.schema(schema).csv(s"$dir/e1.csv")
          .select(col("user_id"), col("ts").cast("long").as("ep"),
            col("value")),
        Seq("user_id"), "ep", 10L, "value")
      .orderBy("user_id", "bucket_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(gotI == batchI, s"stream $gotI vs batch $batchI")
    // gaps are true lerps, not carries (differ from the ffill values)
    assert(gotI.map(_._4) != got.map(_._4))
  }

  stateMatrixTest("streaming resample: null-VALUE rows match batch n_obs and fill semantics") {
    // batch counts null-value rows in n_obs (count(*)) while excluding
    // them from the mean (count(value) divisor); all-null buckets are
    // fill-transparent (ffill carries through, interp lerps across) and
    // leading ones emit null. The stream must reproduce ALL of it.
    val dir = Files.createTempDirectory("stream_rsn").toString
    Files.write(java.nio.file.Paths.get(dir, "e1.csv"),
      ("2023-01-01T10:00:00,1,\n" +        // bucket 0: all-null (leading)
       "2023-01-01T10:00:05,1,\n" +        // bucket 0 again (n_obs 2)
       "2023-01-01T10:00:22,1,4.0\n" +     // bucket 20: anchor
       "2023-01-01T10:00:31,1,\n" +        // bucket 30: mixed null
       "2023-01-01T10:00:35,1,6.0\n" +     //   ... n_obs 2, mean 6.0
       "2023-01-01T10:00:45,1,\n" +        // bucket 40: interior all-null
       "2023-01-01T10:01:05,1,8.0\n").getBytes)  // bucket 60 (gap at 50)
    Files.write(java.nio.file.Paths.get(dir, "e2.csv"),
      "2023-01-02T10:00:00,-1,0.0\n".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e3.csv"),
      "2023-01-03T10:00:00,-1,0.0\n".getBytes)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    def stream(op: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
               valCol: String): Seq[(Long, Long, Long, Option[Double])] = {
      val src = Streams.fileMonitor(spark, dir, "csv", schema,
          options = Map("maxFilesPerTrigger" -> "1"))
        .withWatermark("ts", "0 seconds")
      val name = s"rsn_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      val q = op(src)
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name).filter(col("user_id") >= 0)
        .orderBy("user_id", "bucket_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    }
    def batch(op: (org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame)
        : Seq[(Long, Long, Long, Option[Double])] =
      op(spark.read.schema(schema).csv(s"$dir/e1.csv")
          .select(col("user_id"), col("ts").cast("long").as("ep"),
            col("value")))
        .orderBy("user_id", "bucket_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq
    val gotF = stream(df => graft.streaming.Resample.ffill(df, 10L).toDF(),
      "value_ffill")
    val batchF = batch(df => graft.operators.Relational.resampleFfill(
      df, Seq("user_id"), "ep", 10L, "value"))
    assert(gotF == batchF, s"ffill stream $gotF vs batch $batchF")
    // the null rows ARE in n_obs: bucket 0 has two, bucket 30 has two
    val base = gotF.map(_._2).min
    assert(gotF.map(t => (t._2 - base) -> t._3).toMap ==
      Map(0L -> 2L, 10L -> 0L, 20L -> 1L, 30L -> 2L, 40L -> 1L,
        50L -> 0L, 60L -> 1L))
    // leading all-null buckets emit null, the carry resumes after
    assert(gotF.take(2).forall(_._4.isEmpty) && gotF.drop(2).forall(_._4.nonEmpty))
    val gotI = stream(df => graft.streaming.Resample.interp(df, 10L),
      "value_interp")
    val batchI = batch(df => graft.operators.Relational.resampleInterp(
      df, Seq("user_id"), "ep", 10L, "value"))
    assert(gotI == batchI, s"interp stream $gotI vs batch $batchI")
    // the interior all-null bucket is lerped ACROSS, not carried
    val at40 = gotI.find(_._2 == base + 40L).get._4.get
    assert(at40 > 6.0 && at40 < 8.0, s"lerped across the null bucket: $at40")
  }

  stateMatrixTest("streaming resample: late rows for emitted buckets drop, open buckets absorb") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val src = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
    val name = s"rsl_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = graft.streaming.Resample.ffill(src, 10L)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000L)
      // batch 1: buckets 0 and 20 observed (watermark lands at 25 s)
      input.addData((1L, ts(2), 4.0), (1L, ts(25), 6.0))
      q.processAllAvailable()
      // batch 2 (wm 25): bucket 0 closes and EMITS with mean 4.0
      input.addData((1L, ts(100), 8.0))
      q.processAllAvailable()
      // batch 3 (wm 100): a LATE row for the already-emitted bucket 0
      // must DROP — while bucket 20 (still open until now) finalizes
      input.addData((1L, ts(3), 100.0))
      q.processAllAvailable()
      // close bucket 100 (wm must pass 110)
      input.addData((1L, ts(300), 9.0))
      q.processAllAvailable()
      val got = spark.table(name).orderBy("bucket_start")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
      assert(got.head == (0L, 1L, 4.0), s"late row must not reopen: $got")
      assert(got.count(_._1 == 0L) == 1, s"bucket 0 emitted once: $got")
      assert(got.contains((10L, 0L, 4.0)) && got.contains((20L, 1L, 6.0)))
      assert(got.contains((30L, 0L, 6.0)) && got.contains((100L, 1L, 8.0)))
    } finally q.stop()
  }

  stateMatrixTest("streaming resample: randomized out-of-order arrival still equals batch") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 200 events over 5 keys inside a 1-hour window, delivered in a
    // seeded-random order across 4 micro-batches; the 1-day watermark
    // delay absorbs ALL the disorder, and two far sentinels close every
    // real bucket — so the stream must equal the batch operator exactly
    val rnd = new scala.util.Random(7)
    val events = (1 to 200).map { i =>
      (rnd.nextInt(5).toLong, new Timestamp(1700000000000L +
        rnd.nextInt(3600) * 1000L), rnd.nextInt(1000) / 10.0)
    }
    val shuffled = rnd.shuffle(events)
    val input = MemoryStream[(Long, Timestamp, Double)]
    val src = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 day")
    val name = s"rsr_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = graft.streaming.Resample.ffill(src, 120L)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      shuffled.grouped(50).foreach { batch =>
        input.addData(batch); q.processAllAvailable()
      }
      // sentinels: advance the watermark across two batches so every
      // real bucket (all within the hour) closes and emits
      input.addData((-1L, new Timestamp(1700000000000L + 10L * 86400000L), 0.0))
      q.processAllAvailable()
      input.addData((-1L, new Timestamp(1700000000000L + 20L * 86400000L), 0.0))
      q.processAllAvailable()
      val got = spark.table(name).filter(col("user_id") >= 0)
        .orderBy("user_id", "bucket_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      val batchRes = graft.operators.Relational.resampleFfill(
          events.toDF("user_id", "ts", "value")
            .select(col("user_id"), col("ts").cast("long").as("ep"),
              col("value")),
          Seq("user_id"), "ep", 120L, "value")
        .orderBy("user_id", "bucket_start")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getDouble(3))).toSeq
      assert(got == batchRes,
        s"stream (${got.size} rows) != batch (${batchRes.size} rows)")
      assert(got.size > 50, "non-trivial grid")
    } finally q.stop()
  }

  stateMatrixTest("streaming resample: pathological gap fails loudly (maxGapBuckets)") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Timestamp, Double)]
    val src = input.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "0 seconds")
    val name = s"rsg_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = graft.streaming.Resample.ffill(src, 1L, maxGapBuckets = 100L)
      .writeStream.format("memory").queryName(name).outputMode("append")
      .start()
    try {
      def ts(sec: Long) = new Timestamp(sec * 1000L)
      input.addData((7L, ts(0), 1.0))
      q.processAllAvailable()
      input.addData((7L, ts(10000), 2.0))
      q.processAllAvailable()
      // the watermark now closes bucket 0 and then bucket 10000 — whose
      // 10,000-bucket gap at 1 s step must THROW (naming key and cap),
      // not materialize (two more batches: one advances the watermark
      // past bucket 10000's close, the next applies it)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        input.addData((7L, ts(20000), 3.0))
        q.processAllAvailable()
        input.addData((7L, ts(30000), 4.0))
        q.processAllAvailable()
        q.awaitTermination(20000)
      }
      val msg = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).take(8)
        .flatMap(t => Option(t.getMessage)).mkString(" | ")
      assert(msg.contains("maxGapBuckets"), s"guard message, got: $msg")
      assert(msg.contains("key 7"), s"offending key named, got: $msg")
    } finally q.stop()
  }

  test("streaming gopher filter: stateless battery, batch ≡ stream") {
    val dir = Files.createTempDirectory("stream_gopher").toString
    val good = (Seq("the", "a") ++ (1 to 60).map(i => s"word$i")).mkString(" ")
    Files.write(java.nio.file.Paths.get(dir, "d.csv"),
      (s"1,$good\n2,too short\n3,$good extra\n").getBytes)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("text", StringType)))
    val name = s"gf_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = Streams.gopherFilter(
        Streams.fileMonitor(spark, dir, "csv", schema))
      .select("id")
      .writeStream.format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table(name).collect().map(_.getLong(0)).toSet
    val batch = Streams.gopherFilter(
        spark.read.schema(schema).csv(s"$dir/d.csv"))
      .collect().map(_.getLong(0)).toSet
    assert(got == batch && got == Set(1L, 3L), s"stream $got batch $batch")
  }

  stateMatrixTest("stream-stream interval join: inclusive bounds, key equality, both sides unbounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(1672567200000L + sec * 1000L)
    val points = MemoryStream[(Long, Timestamp)]
    val windows = MemoryStream[(Long, Timestamp)]
    val joined = Streams.intervalJoin(
      points.toDF().toDF("user_id", "p_ts"),
      windows.toDF().toDF("user_id", "w_ts"),
      keyCols = Seq("user_id"), pointTsCol = "p_ts",
      intervalTsCol = "w_ts", spanSeconds = 10L,
      pointWatermark = "0 seconds", intervalWatermark = "0 seconds")
    val name = s"ssj_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
    // window [100, 110] for user 1; same-batch points at 100 (in,
      // boundary), 110 (in, boundary), 99 (below), user 2 at 105
      // (wrong key)
      windows.addData((1L, ts(100)))
      points.addData((1L, ts(110)), (1L, ts(100)), (1L, ts(99)),
        (2L, ts(105)))
      q.processAllAvailable()
      // the point watermark is now past 110 (0 s delay): a straggler
      // at 100 is LATE and must drop — the documented contract
      points.addData((1L, ts(100)), (1L, ts(111)))
      q.processAllAvailable()
      // a SECOND window arriving later still matches points already in
      // state (both sides genuinely unbounded): [105, 115] catches the
      // buffered 110 and the fresh 111
      windows.addData((1L, ts(105)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name)
      .collect().map(r => (r.getLong(0),
        (r.getTimestamp(1).getTime - 1672567200000L) / 1000,
        (r.getTimestamp(2).getTime - 1672567200000L) / 1000)).toSet
    // window@100: points 100, 110 (inclusive ends; 99 below, late 100
    // dropped); window@105: points 110 and 111
    assert(got == Set((1L, 100L, 100L), (1L, 110L, 100L),
      (1L, 110L, 105L), (1L, 111L, 105L)), s"got $got")
    // shared non-key columns are rejected loudly
    val e = intercept[IllegalArgumentException] {
      Streams.intervalJoin(points.toDF().toDF("user_id", "ts"),
        windows.toDF().toDF("user_id", "ts"), Seq("user_id"),
        "ts", "ts", 10L, "0 seconds", "0 seconds")
    }
    assert(e.getMessage.contains("rename one side"), e.getMessage)
  }

  stateMatrixTest("stream-stream interval join, left_outer: unmatched points emit nulls after watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(sec: Long) = new Timestamp(1672567200000L + sec * 1000L)
    val points = MemoryStream[(Long, Timestamp)]
    val windows = MemoryStream[(Long, Timestamp)]
    val joined = Streams.intervalJoin(
      points.toDF().toDF("user_id", "p_ts"),
      windows.toDF().toDF("user_id", "w_ts"),
      keyCols = Seq("user_id"), pointTsCol = "p_ts",
      intervalTsCol = "w_ts", spanSeconds = 10L,
      pointWatermark = "0 seconds", intervalWatermark = "0 seconds",
      joinType = "left_outer")
    val name = s"ssl_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      // point@100 for user 1 has no window on its key (user 2's window
      // at 95 would match the TIME range but not the key)
      points.addData((1L, ts(100)))
      windows.addData((2L, ts(95)))
      q.processAllAvailable()
      // later traffic advances BOTH watermarks far past the point at
      // 100 (+span): its no-match is now provable and the outer row
      // must emit with a null window timestamp
      points.addData((1L, ts(400)))
      windows.addData((2L, ts(400)))
      q.processAllAvailable()
      points.addData((1L, ts(800)))
      windows.addData((2L, ts(800)))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
    val unmatched = rows.filter(_.isNullAt(2))
      .map(r => (r.getLong(0),
        (r.getTimestamp(1).getTime - 1672567200000L) / 1000)).toSet
    assert(unmatched.contains((1L, 100L)), s"got ${unmatched.mkString(",")}")
    // no false inner matches across keys
    assert(rows.forall(r => r.isNullAt(2) || !r.isNullAt(1)))
    assert(!rows.exists(r => !r.isNullAt(2) && r.getLong(0) == 1L),
      "user 1 has no matching window; every user-1 row must be outer")
  }

  stateMatrixTest("streaming CDC apply: micro-batches merge latest-wins with tombstones") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_cdc").resolve("t").toString
    Seq((1L, 10.0, 1L, false), (2L, 20.0, 1L, false), (3L, 30.0, 1L, false))
      .toDF("k", "v", "ver", "del").drop("del")
      .write.parquet(dir)
    val input = MemoryStream[(Long, Double, Long, Boolean)]
    val q = Streams.cdcApply(
        input.toDF().toDF("k", "v", "ver", "del"),
        dir, Seq("k"), "ver", deleteCol = Some("del"))
      .option("checkpointLocation",
        Files.createTempDirectory("stream_cdc_ckpt").toString)
      .start()
    try {
      // batch 1: update k=1, insert k=4
      input.addData((1L, 11.0, 2L, false), (4L, 40.0, 2L, false))
      q.processAllAvailable()
      // batch 2: delete k=2, update k=4 again
      input.addData((2L, 0.0, 3L, true), (4L, 44.0, 3L, false))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 11.0, 3L -> 30.0, 4L -> 44.0), s"got $got")
  }

  test("streaming CDC apply, manifest mode: snapshot isolation across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Layout
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_cdcman").resolve("t").toString
    Layout.writeManifestTable(spark,
      dir, Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    // a reader pinned BEFORE the stream starts — must keep its snapshot
    // through every micro-batch apply (the rename-aside window cure)
    val pinned = Layout.readManifest(spark, dir)
    val input = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = Streams.cdcApply(
        input.toDF().toDF("k", "part", "v", "ver", "del"),
        dir, Seq("k"), "ver", deleteCol = Some("del"), manifest = true)
      .option("checkpointLocation",
        Files.createTempDirectory("stream_cdcman_ckpt").toString)
      .start()
    try {
      // batch 1: update k=1, insert k=3 into a new partition
      input.addData((1L, "a", 11.0, 2L, false), (3L, "c", 30.0, 2L, false))
      q.processAllAvailable()
      // batch 2: delete the ENTIRE b partition, bump k=3
      input.addData((2L, "b", 0.0, 3L, true), (3L, "c", 33.0, 3L, false))
      q.processAllAvailable()
    } finally q.stop()
    def snap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(1L -> 11.0, 3L -> 33.0))
    // one manifest version per micro-batch, seed + 2
    assert(Layout.manifestVersion(spark, dir).contains(3))
    // the pinned reader saw none of it
    assert(snap(pinned) == Map(1L -> 10.0, 2L -> 20.0))
  }

  test("streaming CDC apply, merge-on-read mode: delta-only micro-batches, " +
      "fold catches up") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Layout
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_cdcmor").resolve("t").toString
    Layout.writeManifestTable(spark,
      dir, Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    val baseFiles = Layout.readManifest(spark, dir).inputFiles.toSet
    val input = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = Streams.cdcApply(
        input.toDF().toDF("k", "part", "v", "ver", "del"),
        dir, Seq("k"), "ver", deleteCol = Some("del"), manifest = true,
        mor = true)
      .option("checkpointLocation",
        Files.createTempDirectory("stream_cdcmor_ckpt").toString)
      .start()
    try {
      input.addData((1L, "a", 11.0, 2L, false), (3L, "c", 30.0, 2L, false))
      q.processAllAvailable()
      input.addData((2L, "b", 0.0, 3L, true), (3L, "c", 33.0, 3L, false))
      q.processAllAvailable()
    } finally q.stop()
    def snap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    val want = Map(1L -> 11.0, 3L -> 33.0)
    assert(snap(Layout.readManifest(spark, dir)) == want)
    // every micro-batch was delta-only: the seed's files never rewrote
    val readFiles = Layout.readManifest(spark, dir).inputFiles.toSet
    assert(baseFiles.subsetOf(readFiles) && readFiles != baseFiles,
      "micro-batches must append delta generations, never rewrite base")
    // the scheduled fold catches up without changing a row
    assert(Layout.foldManifestDeltas(spark, dir).nonEmpty)
    assert(snap(Layout.readManifest(spark, dir)) == want)
    // the mor flag demands a manifest table
    intercept[IllegalArgumentException] {
      Streams.cdcApply(input.toDF().toDF("k", "part", "v", "ver", "del"),
        dir, Seq("k"), "ver", mor = true)
    }
  }

  test("streaming CDC apply, merge-on-read foldEvery: the cadence folds " +
      "pending deltas in-stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Layout
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_cdcfold").resolve("t").toString
    Layout.writeManifestTable(spark,
      dir, Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    val input = MemoryStream[(Long, String, Double, Long)]
    val q = Streams.cdcApply(input.toDF().toDF("k", "part", "v", "ver"),
        dir, Seq("k"), "ver", manifest = true, mor = true, foldEvery = 2)
      .option("checkpointLocation",
        Files.createTempDirectory("stream_cdcfold_ckpt").toString)
      .start()
    try {
      input.addData((1L, "a", 11.0, 2L))   // batch 0: delta, no fold yet
      q.processAllAvailable()
      input.addData((3L, "c", 30.0, 3L))   // batch 1: delta, then fold
      q.processAllAvailable()
    } finally q.stop()
    // the in-stream fold already caught up: a manual fold finds nothing
    assert(Layout.foldManifestDeltas(spark, dir).isEmpty,
      "foldEvery = 2 must have folded the two delta batches in-stream")
    def snap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getAs[Long]("k") -> r.getAs[Double]("v")).toMap
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    // the cadence is a merge-on-read discipline
    intercept[IllegalArgumentException] {
      Streams.cdcApply(input.toDF().toDF("k", "part", "v", "ver"),
        dir, Seq("k"), "ver", manifest = true, foldEvery = 2)
    }
  }

  test("streaming ANN ingest: micro-batches land in the live generation, queryable") {
    import graft.operators.AnnIndex
    val idxDir = Files.createTempDirectory("stream_ann_idx").toString
    val inDir = Files.createTempDirectory("stream_ann_in").toString
    val ckpt = Files.createTempDirectory("stream_ann_ckpt").toString
    val embs = spark.read.parquet(sf("embeddings"))
    // base index: everything except the two vectors we'll stream in
    AnnIndex.build(embs.filter(col("vec_id") >= 20L), idxDir,
      nlist = 16, m = 8)
    val before = AnnIndex.load(spark, idxDir).vectors.count()
    // two "new" vectors arrive as two files -> two micro-batches
    val fresh = embs.filter(col("vec_id") < 2L)
      .withColumn("vec_id", col("vec_id") + 100000L)
    fresh.filter(col("vec_id") === 100000L).coalesce(1)
      .write.parquet(s"$inDir/f0")
    fresh.filter(col("vec_id") === 100001L).coalesce(1)
      .write.parquet(s"$inDir/f1")
    val src = Streams.fileMonitor(spark, s"$inDir/f*", "parquet",
      fresh.schema, options = Map("maxFilesPerTrigger" -> "1"))
    val q = Streams.annIngest(src, idxDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val idx = AnnIndex.load(spark, idxDir)
    assert(idx.vectors.count() == before + 2, "both micro-batches landed")
    // the ingested vectors are queryable: each is its own best match
    val got = idx.topK(fresh, k = 1, excludeSelf = false)
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((100000L, 100000L), (100001L, 100001L)),
      s"self-retrieval after streaming ingest, got $got")
  }

  stateMatrixTest("streaming quantile sketch per window equals the batch sketch") {
    val dir = Files.createTempDirectory("stream_kll").toString
    val out = Files.createTempDirectory("stream_kll_out").toString
    val ckpt = Files.createTempDirectory("stream_kll_ckpt").toString
    Files.write(java.nio.file.Paths.get(dir, "e1.csv"),
      ("2023-01-01T10:05:00,3.0\n2023-01-01T10:10:00,1.0\n" +
       "2023-01-01T10:15:00,2.0\n").getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e2.csv"),
      "2023-01-01T11:10:00,9.0\n".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "e3.csv"),
      "2023-01-01T12:30:00,9.0\n".getBytes)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("v", DoubleType)))
    val q = Streams.quantilesByWindow(
      Streams.fileMonitor(spark, dir, "csv", schema,
        options = Map("maxFilesPerTrigger" -> "1")),
      tsCol = "ts", window = "1 hour", watermark = "30 minutes",
      valueCol = col("v"), k = 64)
      .writeStream.format("parquet")
      .option("path", s"$out/w").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val res = spark.read.parquet(s"$out/w").orderBy("window_start")
      .select(graft.expressions.Kll.quantile(col("sk"), 0.5).as("p50"),
        size(col("sk.values")).as("sz"))
      .collect()
    assert(res.nonEmpty)
    // the 10:00 window held {3,1,2}: exact-regime median 2, 3 points
    assert(res(0).getDouble(0) == 2.0 && res(0).getInt(1) == 3)
  }

  stateMatrixTest("streaming dedup drops within-watermark duplicate keys, bounded state") {
    val dir = Files.createTempDirectory("stream_dd").toString
    val out = Files.createTempDirectory("stream_dd_out").toString
    val ckpt = Files.createTempDirectory("stream_dd_ckpt").toString
    // duplicate key 'a' arrives twice within the watermark horizon; only
    // the first instance survives the dedup
    Files.write(java.nio.file.Paths.get(dir, "d1.csv"),
      ("2023-01-01T10:00:00,a,1.0\n" +
       "2023-01-01T10:01:00,a,2.0\n" +
       "2023-01-01T10:02:00,b,3.0\n").getBytes)
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("k", StringType), StructField("v", DoubleType)))
    val deduped = Streams.streamingDedup(
      Streams.fileMonitor(spark, dir, "csv", schema),
      keyCols = Seq("k"), tsCol = "ts", watermark = "1 hour")
    assert(deduped.isStreaming)
    Streams.runAvailableNow(Streams.ingest(deduped, s"$out/data", ckpt))
    val rows = spark.read.parquet(s"$out/data")
    assert(rows.count() == 2)
    assert(rows.select("k").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    assert(rows.filter(col("k") === "a").collect()(0).getAs[Double]("v") == 1.0)
  }

  test("streaming curation: quality gate + PII scrub + hash sample on a stream") {
    val dir = Files.createTempDirectory("stream_cur").toString
    val out = Files.createTempDirectory("stream_cur_out").toString
    val ckpt = Files.createTempDirectory("stream_cur_ckpt").toString
    // doc 1: fluent text with an email (kept, scrubbed); doc 2: punctuation
    // soup (quality-gated out). Batch semantics lift unchanged: the same
    // call on a batch DF must produce the same rows.
    val good = "the quick brown fox is one of the animals that run in the " +
      "field and it is known to all of the readers contact me at a@b.co ok"
    val junk = "!!! ??? ;;; ### $$$ %%%"
    Files.write(java.nio.file.Paths.get(dir, "c1.csv"),
      s"""1,"$good"\n2,"$junk"\n""".getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val curated = Streams.curate(
      Streams.fileMonitor(spark, dir, "csv", schema), "doc_id", "text")
    assert(curated.isStreaming)
    Streams.runAvailableNow(Streams.ingest(curated, s"$out/data", ckpt))
    val rows = spark.read.parquet(s"$out/data")
    assert(rows.count() == 1)
    val kept = rows.collect()(0)
    assert(kept.getAs[Long]("doc_id") == 1L)
    assert(kept.getAs[String]("text").contains("<EMAIL>"))
    // identical result on the same data as a BATCH frame
    val batch = spark.read.schema(schema).csv(dir)
    val batchKept = Streams.curate(batch, "doc_id", "text")
      .select("doc_id", "text").collect()
    assert(batchKept.length == 1 &&
      batchKept(0).getString(1) == kept.getAs[String]("text"))
  }

  test("streaming calibrated filter: batch thresholds on a stream, batch ≡ stream") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_cal").toString
    val out = Files.createTempDirectory("stream_cal_out").toString
    val ckpt = Files.createTempDirectory("stream_cal_ckpt").toString
    // calibration corpus: group x scores .1..1.0 → median bin 500
    val ref = (1L to 10L).map(i => (i, "x", i / 10.0)).toDF("id", "grp", "score")
    val thr = graft.operators.Sampling.quantileThresholds(
      ref, "grp", col("score"), bins = 1000, qNum = 1, qDen = 2)
    // stream: two docs of group x, one above / one below the cut
    Files.write(java.nio.file.Paths.get(dir, "s1.csv"),
      "100,x,0.7\n101,x,0.3\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("grp", StringType),
      StructField("score", DoubleType)))
    val filtered = Streams.calibratedFilter(
      Streams.fileMonitor(spark, dir, "csv", schema), thr, "grp",
      col("score"), bins = 1000)
    assert(filtered.isStreaming)
    Streams.runAvailableNow(Streams.ingest(filtered, s"$out/data", ckpt))
    val rows = spark.read.parquet(s"$out/data")
      .select("id", "bin", "thr_bin").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 100L
      && rows(0).getLong(1) == 700L && rows(0).getLong(2) == 500L)
    // identical result on the same data as a BATCH frame
    val batch = Streams.calibratedFilter(
      spark.read.schema(schema).csv(dir), thr, "grp", col("score"), 1000)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(batch == Seq(100L))
  }

  test("streaming temperature mix: batch rates on a stream, batch ≡ stream") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_tmix").toString
    val out = Files.createTempDirectory("stream_tmix_out").toString
    val ckpt = Files.createTempDirectory("stream_tmix_ckpt").toString
    // reference corpus: "big" 100 docs, "small" 1 doc ->
    // thr(big) = floor(sqrt(1/100) * 2^32) (keep ~10%), thr(small) = 2^32
    val ref = ((1L to 100L).map(i => (i, "big")) :+ (200L, "small"))
      .toDF("id", "src")
    val rates = graft.operators.Sampling.temperatureThresholds(ref, "src")
    Files.write(java.nio.file.Paths.get(dir, "s1.csv"),
      (1L to 100L).map(i => s"$i,big").mkString("", "\n", "\n200,small\n")
        .getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("src", StringType)))
    val mixed = Streams.temperatureMix(
      Streams.fileMonitor(spark, dir, "csv", schema), rates, "src", "id")
    assert(mixed.isStreaming)
    Streams.runAvailableNow(Streams.ingest(mixed, s"$out/data", ckpt))
    val streamIds = spark.read.parquet(s"$out/data")
      .select("id").collect().map(_.getLong(0)).toSet
    // identical result on the same data via the one-shot BATCH operator
    val batchIds = graft.operators.Sampling.temperatureMix(
      spark.read.schema(schema).csv(dir), "src", "id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(streamIds == batchIds)
    // the rebalance really engaged: small survives, big is downsampled
    assert(streamIds.contains(200L))
    val nBig = streamIds.count(_ <= 100L)
    assert(nBig > 0 && nBig < 30, s"expected ~10 of 100 big docs, got $nBig")
  }

  test("streaming range enrich: stream-static binned windows, batch ≡ stream") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_range").toString
    val out = Files.createTempDirectory("stream_range_out").toString
    val ckpt = Files.createTempDirectory("stream_range_ckpt").toString
    // static campaign windows; streamed points, one outside every window
    val intervals = Seq((10L, 0L, 9L), (20L, 5L, 14L), (30L, 100L, 109L))
      .toDF("iid", "s", "e")
    Files.write(java.nio.file.Paths.get(dir, "p1.csv"),
      "1,3\n2,7\n3,50\n4,105\n".getBytes)
    val schema = StructType(Seq(
      StructField("pid", LongType), StructField("p", LongType)))
    val enriched = Streams.rangeEnrich(
      Streams.fileMonitor(spark, dir, "csv", schema), intervals,
      "p", "s", "e", joinType = "left_outer")
    assert(enriched.isStreaming)
    Streams.runAvailableNow(Streams.ingest(enriched, s"$out/data", ckpt))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .select("pid", "p", "iid", "s", "e")
      .collect().map(_.mkString("|")).toSeq.sorted
    val streamed = canon(spark.read.parquet(s"$out/data"))
    // identical result from the one-shot BATCH operator on the same rows
    val batch = canon(graft.operators.Relational.rangeJoin(
      spark.read.schema(schema).csv(dir), intervals,
      "p", "s", "e", joinType = "left_outer"))
    assert(streamed == batch)
    // the enrich really engaged: point 7 matched two windows, 50 none
    assert(streamed.count(_.startsWith("2|")) == 2)
    assert(streamed.count(_.startsWith("3|")) == 1 &&
      streamed.exists(r => r.startsWith("3|") && r.contains("null")))
  }

  test("streaming media ingest: binaryFile monitor + real decode, batch ≡ stream") {
    import graft.operators.Multimodal
    val dir = Files.createTempDirectory("stream_media").toString
    val out = Files.createTempDirectory("stream_media_out").toString
    val ckpt = Files.createTempDirectory("stream_media_ckpt").toString
    // two REAL PNGs whose decoded stats are known from the pixel formula
    Files.write(java.nio.file.Paths.get(dir, "a.png"),
      Multimodal.syntheticGrayPng(1L, 8, 6))
    Files.write(java.nio.file.Paths.get(dir, "b.png"),
      Multimodal.syntheticGrayPng(2L, 8, 6))
    val stats = Multimodal.decodedStats(
      Streams.mediaMonitor(spark, dir, "image"))
    assert(stats.isStreaming)
    Streams.runAvailableNow(Streams.ingest(stats, s"$out/data", ckpt))
    val streamRows = spark.read.parquet(s"$out/data")
      .collect().map(_.toSeq).toSet
    // identical result on the same files as a BATCH frame
    val batchRows = Multimodal.decodedStats(
      Multimodal.fromBinaryFiles(
        spark.read.format("binaryFile").load(dir), "image"))
      .collect().map(_.toSeq).toSet
    assert(streamRows == batchRows && streamRows.size == 2)
    // the decode was real: dims survive, mean matches the pixel formula
    val byW = spark.read.parquet(s"$out/data").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(byW.forall { case (w, h, _) => w == 8 && h == 6 })
    val expected = (for (y <- 0 until 6; x <- 0 until 8)
      yield (7L * x + 13L * y + 31L * 1L) % 256L).sum.toDouble / 48
    assert(byW.map(_._3).contains(expected))
  }

  test("streaming near-dup index filter: persisted dHash index, batch ≡ stream") {
    import graft.operators.{Dedup, Multimodal}
    val dir = Files.createTempDirectory("stream_ndx").toString
    val out = Files.createTempDirectory("stream_ndx_out").toString
    val ckpt = Files.createTempDirectory("stream_ndx_ckpt").toString
    import spark.implicits._
    // persisted index: the family-0 base image (id 0)
    val indexFp = Multimodal.dHashFingerprints(
      Multimodal.syntheticCellImages(Seq(0L).toDF("id"), "id"))
    // stream: two near-dup variants of family 0 + one distinct family
    Files.write(java.nio.file.Paths.get(dir, "v1.png"),
      Multimodal.syntheticCellPng(1L, 36, 32, 4))
    Files.write(java.nio.file.Paths.get(dir, "v2.png"),
      Multimodal.syntheticCellPng(2L, 36, 32, 4))
    Files.write(java.nio.file.Paths.get(dir, "other.png"),
      Multimodal.syntheticCellPng(40L, 36, 32, 4))
    val kept = Streams.nearDupIndexFilter(
      Multimodal.dHashFingerprints(Streams.mediaMonitor(spark, dir, "image")),
      indexFp)
    assert(kept.isStreaming)
    Streams.runAvailableNow(Streams.ingest(kept, s"$out/data", ckpt))
    val streamFps = spark.read.parquet(s"$out/data")
      .select("fp").collect().map(_.getLong(0)).toSet
    // only the distinct-family image survives (variants are within
    // hamming 2 of the indexed base — OperatorsSpec pins the distances)
    val otherFp = Multimodal.ImageIoCodec.dHash(
      Multimodal.syntheticCellPng(40L, 36, 32, 4)).get
    assert(streamFps == Set(otherFp))
    // identical result on the same files as a BATCH frame
    val batchFps = Streams.nearDupIndexFilter(
      Multimodal.dHashFingerprints(
        Multimodal.fromBinaryFiles(
          spark.read.format("binaryFile").load(dir), "image")),
      indexFp)
      .select("fp").collect().map(_.getLong(0)).toSet
    assert(batchFps == streamFps)
  }

  test("streaming chunking: stateless token windows, batch ≡ stream") {
    val dir = Files.createTempDirectory("stream_chk").toString
    val out = Files.createTempDirectory("stream_chk_out").toString
    val ckpt = Files.createTempDirectory("stream_chk_ckpt").toString
    Files.write(java.nio.file.Paths.get(dir, "c1.csv"),
      "1,a b c d e\n2,x\n".getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val chunked = Streams.chunk(
      Streams.fileMonitor(spark, dir, "csv", schema), "doc_id", "text",
      chunkSize = 3, stride = 2)
    assert(chunked.isStreaming)
    Streams.runAvailableNow(Streams.ingest(chunked, s"$out/data", ckpt))
    val streamRows = spark.read.parquet(s"$out/data")
      .collect().map(_.toSeq).toSet
    val batchRows = Streams.chunk(
      spark.read.schema(schema).csv(dir), "doc_id", "text",
      chunkSize = 3, stride = 2).collect().map(_.toSeq).toSet
    assert(streamRows == batchRows && streamRows.size == 4)
  }

  test("streaming LM scoring: broadcast model, stateless, batch ≡ stream") {
    val dir = Files.createTempDirectory("stream_lm").toString
    val out = Files.createTempDirectory("stream_lm_out").toString
    val ckpt = Files.createTempDirectory("stream_lm_ckpt").toString
    Files.write(java.nio.file.Paths.get(dir, "c1.csv"),
      "1,the cat sat on the mat\n2,the cat ran\n3,zebra\n".getBytes)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val batch = spark.read.schema(schema).csv(dir)
    val model = graft.operators.LmScore.bigramModel(
      batch.filter(col("doc_id") === 1L), "text")
    val scored = Streams.lmScore(
      Streams.fileMonitor(spark, dir, "csv", schema), model, "doc_id", "text")
    assert(scored.isStreaming)
    Streams.runAvailableNow(Streams.ingest(scored, s"$out/data", ckpt))
    val streamRows = spark.read.parquet(s"$out/data")
      .collect().map(_.toSeq).toSet
    val batchRows = graft.operators.LmScore
      .bigramFitBroadcast(batch, model, "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(streamRows == batchRows)
    // doc 2 shares exactly the "the cat" bigram with the model corpus
    val d2 = streamRows.find(_.head == 2L).get
    assert(d2 == Seq(2L, 2L, 1L, 1L))
  }

  test("multimodal: binary schema, batched stub featurization, frame fanout") {
    val bytes1 = Array.fill[Byte](100)(1)
    val bytes2 = Array.fill[Byte](50)(2)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", bytes1, Row("png", 10, 10, null)),
        Row(2L, "video", bytes2, Row("mp4", 4, 4, 1000L)))),
      Multimodal.mediaSchema)

    val feats = Multimodal.extractFeatures(media, dim = 16)
    assert(feats.schema == Multimodal.featureSchema)
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n_bytes") == 100L)
    assert(rows(0).getSeq[Float](3).length == 16)
    // deterministic: same bytes -> same feature
    val again = Multimodal.extractFeatures(media, dim = 16)
      .orderBy("media_id").collect()
    assert(rows(0).getSeq[Float](3) == again(0).getSeq[Float](3))
    // different bytes -> different feature
    assert(rows(0).getSeq[Float](3) != rows(1).getSeq[Float](3))

    val frames = Multimodal.sampleFrames(media, n = 4)
    assert(frames.schema == Multimodal.frameSchema)
    assert(frames.count() == 4) // only the video row fans out
    assert(frames.select("media_id").distinct().collect()(0).getLong(0) == 2L)

    // resize keeps the media schema, restamps dimensions, recodes bytes
    val resized = Multimodal.resize(media, 8, 8)
    assert(resized.schema == Multimodal.mediaSchema)
    val rr = resized.orderBy("media_id").collect()
    assert(rr(0).getAs[Row]("meta").getAs[Int]("width") == 8)
    assert(rr(0).getAs[Row]("meta").getAs[Int]("height") == 8)
    assert(rr(0).getAs[Array[Byte]]("bytes").length == 1) // 8*8/64
    assert(rr(1).getAs[Row]("meta").getAs[Long]("duration_ms") == 1000L)
  }

  test("ImageIoCodec: real PNG decode, exact NN resize, band features, fallback") {
    import Multimodal.ImageIoCodec
    // a real 4x4 PNG with known pixels
    val png = Multimodal.syntheticGrayPng(1L, 4, 4)
    def px(x: Int, y: Int) = ((7 * x + 13 * y + 31) % 256)
    assert(ImageIoCodec.dimensions(png).contains((4, 4)))
    // decoded mean is the formula mean — the bytes really decode
    val (w, h, mean) = ImageIoCodec.stats(png).get
    val want = (for (y <- 0 until 4; x <- 0 until 4) yield px(x, y)).sum / 16.0
    assert((w, h) == (4, 4) && mean == want)
    // NN resize to 2x2 picks sources (0,0),(2,0),(0,2),(2,2), exactly
    val small = ImageIoCodec.resize(png, 2, 2)
    assert(ImageIoCodec.dimensions(small).contains((2, 2)))
    val (_, _, smean) = ImageIoCodec.stats(small).get
    assert(smean == Seq(px(0, 0), px(2, 0), px(0, 2), px(2, 2)).sum / 4.0)
    // band features: 2 bands of 2 rows each
    val f = ImageIoCodec.features(png, 2)
    assert(f(0) == ((for (y <- 0 to 1; x <- 0 to 3) yield px(x, y)).sum / 8.0).toFloat)
    assert(f(1) == ((for (y <- 2 to 3; x <- 0 to 3) yield px(x, y)).sum / 8.0).toFloat)
    // non-image payloads fall back to the stub (same values as StubCodec)
    val junk = Array.fill[Byte](32)(9)
    assert(ImageIoCodec.features(junk, 4).toSeq ==
      Multimodal.StubCodec.features(junk, 4).toSeq)
    assert(ImageIoCodec.resize(junk, 8, 8).toSeq ==
      Multimodal.StubCodec.resize(junk, 8, 8).toSeq)
    assert(ImageIoCodec.dimensions(junk).isEmpty)
    // end to end through the operator: resized fixture decodes at target
    val media = Multimodal.syntheticImages(
      spark.range(3).toDF("id"), "id", 6, 4)
    val out = Multimodal.resize(media, 3, 2, ImageIoCodec)
      .orderBy("media_id").collect()
    assert(out.forall(r => ImageIoCodec.dimensions(
      r.getAs[Array[Byte]]("bytes")).contains((3, 2))))
  }

  test("multimodal ingestion adapter from binaryFile-shaped rows") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("/data/x.png", Array.fill[Byte](10)(7)))),
      StructType(Seq(StructField("path", StringType),
        StructField("content", BinaryType))))
    val media = Multimodal.fromBinaryFiles(df, "image")
    val r = media.collect()(0)
    assert(r.getAs[String]("modality") == "image")
    assert(r.getAs[Row]("meta").getAs[String]("format") == "png")
    assert(media.schema("bytes").dataType == BinaryType)
  }
}
