package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class IvmSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_ivm_$tag").resolve("t").toString

  private def snap(df: DataFrame): Map[String, (Long, BigDecimal)] =
    df.collect().map(r => r.getAs[String]("k") ->
      (r.getAs[Long]("n_rows"),
        BigDecimal(r.getAs[java.math.BigDecimal]("sum_v")))).toMap

  test("applyDelta folds, retracts to zero, guards replays, pins readers") {
    val dir = tmpDir("fold")
    import spark.implicits._
    val d0 = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("k", "v")
    val d1 = Seq(("a", 4.0), ("c", 7.0)).toDF("k", "v")
    assert(Ivm.applyDelta(spark, dir, d0, Seq("k"), Seq("v"), batchId = 0))
    val pinned = Ivm.read(spark, dir)
    assert(Ivm.applyDelta(spark, dir, d1, Seq("k"), Seq("v"), batchId = 1))
    // pinned reader still sees the pre-apply snapshot
    assert(snap(pinned) ==
      Map("a" -> (2L, BigDecimal(3.0)), "b" -> (1L, BigDecimal(10.0))))
    assert(snap(Ivm.read(spark, dir)) == Map(
      "a" -> (3L, BigDecimal(7.0)), "b" -> (1L, BigDecimal(10.0)),
      "c" -> (1L, BigDecimal(7.0))))
    // replay guard: at-or-below ids are loud no-ops
    assert(!Ivm.applyDelta(spark, dir, d1, Seq("k"), Seq("v"), batchId = 1))
    assert(!Ivm.applyDelta(spark, dir, d0, Seq("k"), Seq("v"), batchId = 0))
    assert(Ivm.lastAppliedBatch(spark, dir).contains(1L))
    assert(snap(Ivm.read(spark, dir))("a") == ((3L, BigDecimal(7.0))))
    // retraction: weight -1 removes contributions; b empties and LEAVES
    val retract = Seq(("b", 10.0, -1L), ("a", 4.0, -1L), ("a", 0.5, 1L))
      .toDF("k", "v", "w")
    assert(Ivm.applyDelta(spark, dir, retract, Seq("k"), Seq("v"),
      batchId = 2, weightCol = Some("w")))
    assert(snap(Ivm.read(spark, dir)) == Map(
      "a" -> (3L, BigDecimal(3.5)), "c" -> (1L, BigDecimal(7.0))))
    // unmanaged apply (batchId = -1) applies and carries the marker
    assert(Ivm.applyDelta(spark, dir, Seq(("c", 1.0)).toDF("k", "v"),
      Seq("k"), Seq("v")))
    assert(Ivm.lastAppliedBatch(spark, dir).contains(2L))
    assert(snap(Ivm.read(spark, dir))("c") == ((2L, BigDecimal(8.0))))
    // missing column fails loudly
    intercept[IllegalArgumentException] {
      Ivm.applyDelta(spark, dir, Seq(("x", 1.0)).toDF("k", "other"),
        Seq("k"), Seq("v"))
    }
    // single-writer lease wraps applies too
    val lock = new java.io.File(s"$dir.__maint.lock")
    assert(lock.createNewFile())
    intercept[IllegalStateException] {
      Ivm.applyDelta(spark, dir, d0, Seq("k"), Seq("v"))
    }
    assert(lock.delete())
  }

  test("retraction below zero fails loudly and leaves the table untouched") {
    val dir = tmpDir("neg")
    import spark.implicits._
    assert(Ivm.applyDelta(spark, dir, Seq(("a", 1.0)).toDF("k", "v"),
      Seq("k"), Seq("v"), batchId = 0))
    // a retract for a key with no prior insert must NOT land as a
    // negative-count key — the apply is rejected wholesale
    val bad = Seq(("zz", 5.0, -1L), ("a", 1.0, 1L)).toDF("k", "v", "w")
    val e = intercept[IllegalStateException] {
      Ivm.applyDelta(spark, dir, bad, Seq("k"), Seq("v"),
        batchId = 1, weightCol = Some("w"))
    }
    assert(e.getMessage.contains("negative n_rows"))
    assert(e.getMessage.contains("zz"), s"sample keys named: ${e.getMessage}")
    // live summary and exactly-once marker unchanged — the delta can be
    // fixed and re-applied under the same batch id
    assert(Ivm.lastAppliedBatch(spark, dir).contains(0L))
    assert(snap(Ivm.read(spark, dir)) == Map("a" -> (1L, BigDecimal(1.0))))
    assert(Ivm.applyDelta(spark, dir, Seq(("a", 1.0, 1L)).toDF("k", "v", "w"),
      Seq("k"), Seq("v"), batchId = 1, weightCol = Some("w")))
    assert(snap(Ivm.read(spark, dir)) == Map("a" -> (2L, BigDecimal(2.0))))
  }

  test("sketch-valued summaries: fold = lossless merge, insert-only") {
    val dir = tmpDir("sk")
    import spark.implicits._
    import graft.expressions.{Kll, Kmv}
    import org.apache.spark.sql.functions.{col, lit, xxhash64}
    val all = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("a", 2L, 3.0),
      ("a", 3L, 4.0), ("b", 1L, 10.0)).toDF("k", "u", "v")
    // two deltas splitting every key's rows
    assert(Ivm.applyDelta(spark, dir, all.limit(2), Seq("k"), Nil,
      batchId = 0, kmvCols = Seq("u"), kllCols = Seq("v"), sketchK = 16))
    assert(Ivm.applyDelta(spark, dir, all.offset(2), Seq("k"), Nil,
      batchId = 1, kmvCols = Seq("u"), kllCols = Seq("v"), sketchK = 16))
    val folded = Ivm.read(spark, dir)
    val oneShot = all.groupBy("k").agg(
      Kmv.sketch(xxhash64(col("u")), 16).as("dsk"),
      Kll.sketch(col("v"), 16).as("dkll"))
    val cmp = folded.join(oneShot, "k")
      .select(col("k"), (col("kmv_u") === col("dsk")).as("kmv_eq"),
        (col("kll_v") === col("dkll")).as("kll_eq"),
        Kmv.estimate(col("kmv_u"), 16).as("est"),
        Kll.quantile(col("kll_v"), 0.5).as("p50"))
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(cmp("a") == ((true, true, 3.0, 2.0)), cmp("a").toString)
    assert(cmp("b") == ((true, true, 1.0, 10.0)), cmp("b").toString)
    // sketches cannot retract: combining with weightCol fails loudly
    intercept[IllegalArgumentException] {
      Ivm.applyDelta(spark, dir, all.withColumn("w", lit(1L)),
        Seq("k"), Nil, batchId = 2, weightCol = Some("w"),
        kmvCols = Seq("u"))
    }
  }

  test("sketch-valued syncFromManifest follows append-only tables and " +
      "refuses delete-bearing feeds loudly") {
    val dir = tmpDir("sksync")
    val tab = tmpDir("sksync_tab")
    import spark.implicits._
    import graft.expressions.{Kll, Kmv}
    import org.apache.spark.sql.functions.{col, xxhash64}
    Layout.writeManifestTable(spark, tab,
      Seq((1L, "a", 1L, 1.0, 1L), (2L, "a", 2L, 2.0, 1L),
        (3L, "b", 1L, 10.0, 1L)).toDF("id", "k", "u", "v", "ver"),
      Seq("k"))
    // seed sync: the full snapshot sketches in
    assert(Ivm.syncFromManifest(spark, dir, tab, Seq("k"), Nil,
      kmvCols = Seq("u"), kllCols = Seq("v"), sketchK = 16))
    // append-only merge (NEW ids only) -> the feed is pure inserts
    Layout.mergeManifest(spark, tab,
      Seq((4L, "a", 3L, 4.0, 2L), (5L, "b", 2L, 20.0, 2L))
        .toDF("id", "k", "u", "v", "ver"), Seq("id"), "ver")
    assert(Ivm.syncFromManifest(spark, dir, tab, Seq("k"), Nil,
      kmvCols = Seq("u"), kllCols = Seq("v"), sketchK = 16))
    assert(!Ivm.syncFromManifest(spark, dir, tab, Seq("k"), Nil,
      kmvCols = Seq("u"), kllCols = Seq("v"), sketchK = 16),
      "caught-up sync must no-op")
    // incrementally folded sketches == one-shot over the live table
    val oneShot = Layout.readManifest(spark, tab).groupBy("k").agg(
      Kmv.sketch(xxhash64(col("u")), 16).as("dsk"),
      Kll.sketch(col("v"), 16).as("dkll"))
    val cmp = Ivm.read(spark, dir).join(oneShot, "k")
      .select(col("k"), (col("kmv_u") === col("dsk")).as("kmv_eq"),
        (col("kll_v") === col("dkll")).as("kll_eq"))
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2))).toMap
    assert(cmp == Map("a" -> ((true, true)), "b" -> ((true, true))), cmp)
    // a key REWRITE puts a delete in the feed: the sketched sync must
    // refuse loudly and leave summary + marker untouched
    Layout.mergeManifest(spark, tab,
      Seq((1L, "a", 1L, 99.0, 3L)).toDF("id", "k", "u", "v", "ver"),
      Seq("id"), "ver")
    val e = intercept[IllegalArgumentException] {
      Ivm.syncFromManifest(spark, dir, tab, Seq("k"), Nil,
        kmvCols = Seq("u"), kllCols = Seq("v"), sketchK = 16)
    }
    assert(e.getMessage.contains("APPEND-ONLY"), e.getMessage)
    assert(Ivm.lastAppliedBatch(spark, dir).contains(2L),
      "marker must stay at the last good sync")
    // sum-only sync still follows the same CDC feed fine, and a NAMED
    // sync registers itself as a change-feed consumer: retention then
    // refuses to strand the materialized view
    assert(Ivm.syncFromManifest(spark, dir + "_sums", tab,
      Seq("k"), Seq("v"), consumer = Some("mv_sums")))
    assert(Layout.feedConsumers(spark, tab) == Map("mv_sums" -> 3))
    Layout.mergeManifest(spark, tab,
      Seq((6L, "b", 3L, 30.0, 4L)).toDF("id", "k", "u", "v", "ver"),
      Seq("id"), "ver")
    val re = intercept[IllegalArgumentException] {
      Layout.reapManifest(spark, tab, keepVersions = 1)
    }
    assert(re.getMessage.contains("mv_sums"), re.getMessage)
    // the next sync catches up and advances the cursor; reap proceeds
    assert(Ivm.syncFromManifest(spark, dir + "_sums", tab,
      Seq("k"), Seq("v"), consumer = Some("mv_sums")))
    Layout.reapManifest(spark, tab, keepVersions = 1)
    assert(Ivm.read(spark, dir + "_sums").count() == 2)
  }

  test("syncFromManifest stays exact on update-bearing deltas: without " +
      "the appendOnly assertion the changes diff retracts the old row") {
    val dir = tmpDir("updsync")
    val tab = tmpDir("updsync_tab")
    import spark.implicits._
    Layout.writeManifestTable(spark, tab,
      Seq((1L, "a", 10.0, 1L)).toDF("id", "k", "v", "ver"), Seq("k"))
    assert(Ivm.syncFromManifest(spark, dir, tab, Seq("k"), Seq("v")))
    // a delta that UPDATES the existing key — structurally identical
    // to a fresh insert (op=delta, no deletes), which is exactly why
    // the cheap appends route needs the caller's assertion
    Layout.mergeManifestDelta(spark, tab,
      Seq((1L, "a", 20.0, 2L)).toDF("id", "k", "v", "ver"),
      Seq("id"), "ver")
    assert(Ivm.syncFromManifest(spark, dir, tab, Seq("k"), Seq("v")))
    val got = Ivm.read(spark, dir).select("k", "n_rows", "sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue)).toSeq
    assert(got == Seq(("a", 1L, 20.0)),
      s"the update must retract the old row, not double-count: $got")
  }

  test("syncFromManifest routes provably append-only windows through " +
      "the appends feed: base generations are never touched") {
    val dir = tmpDir("appsync")
    val tab = tmpDir("appsync_tab")
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Layout.writeManifestTable(spark, tab,
      Seq((1L, "a", 1.0, 1L), (2L, "b", 2.0, 1L))
        .toDF("id", "k", "v", "ver"), Seq("k"))
    assert(Ivm.syncFromManifest(spark, dir, tab, Seq("k"), Seq("v"),
      kmvCols = Seq("id"), sketchK = 16,
      appendOnly = true))                                     // seed @ v1
    // two delta appends (fresh keys) + a fold-free window
    Layout.mergeManifestDelta(spark, tab,
      Seq((3L, "a", 3.0, 2L)).toDF("id", "k", "v", "ver"), Seq("id"), "ver")
    Layout.mergeManifestDelta(spark, tab,
      Seq((4L, "b", 4.0, 2L)).toDF("id", "k", "v", "ver"), Seq("id"), "ver")
    // STRUCTURAL route pin: hide every BASE generation — the appends
    // path reads only the new delta gen dirs, while the changes path
    // would have to resolve both snapshots and fail on the missing
    // bases. The sync must succeed anyway.
    val root = new java.io.File(tab)
    val hidden = Seq("k=a", "k=b").map { p =>
      val from = new java.io.File(root, s"$p/gen=1")
      val to = new java.io.File(root, s"$p/hidden_gen1")
      assert(from.renameTo(to), s"fixture rename failed for $p")
      (from, to)
    }
    try {
      assert(Ivm.syncFromManifest(spark, dir, tab, Seq("k"), Seq("v"),
        kmvCols = Seq("id"), sketchK = 16, appendOnly = true))
    } finally hidden.foreach { case (from, to) =>
      assert(to.renameTo(from), "fixture restore failed")
    }
    // the folded summary equals the one-shot aggregate over the table
    val got = Ivm.read(spark, dir).select("k", "n_rows", "sum_v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue)).toMap
    assert(got == Map("a" -> ((2L, 4.0)), "b" -> ((2L, 6.0))), got)
    // and the KMV distinct estimate stays exact (sketches fold on the
    // appends path too — an append-only window cannot retract)
    import graft.expressions.Kmv
    val est = Ivm.read(spark, dir)
      .select(col("k"), Kmv.estimate(col("kmv_id"), 16).as("d"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est == Map("a" -> 2.0, "b" -> 2.0), est)
  }

  test("crashed apply (orphan gen, no pointer swap) is invisible and " +
      "recovered by the next apply") {
    val dir = tmpDir("crash")
    import spark.implicits._
    Ivm.applyDelta(spark, dir, Seq(("a", 1.0)).toDF("k", "v"),
      Seq("k"), Seq("v"), batchId = 0)
    // simulate a crash AFTER the gen-2 write but BEFORE the swap
    Seq(("a", 99.0)).toDF("k", "v")
      .write.parquet(Layout.generationPath(dir, 2))
    assert(snap(Ivm.read(spark, dir)) == Map("a" -> (1L, BigDecimal(1.0))),
      "unswapped generation must be invisible")
    // the next apply overwrites the orphan and publishes atomically
    assert(Ivm.applyDelta(spark, dir, Seq(("a", 2.0)).toDF("k", "v"),
      Seq("k"), Seq("v"), batchId = 1))
    assert(snap(Ivm.read(spark, dir)) == Map("a" -> (2L, BigDecimal(3.0))))
  }
}
