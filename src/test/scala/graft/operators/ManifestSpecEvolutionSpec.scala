package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** METADATA-ONLY partition-spec evolution
  * ([[Layout.changeManifestPartitionSpec]]): a spec change publishes
  * one JSON and rewrites zero data; generations serve under their own
  * era's spec; copy-on-write merges migrate old-era partitions on
  * touch; merge-on-read deltas refuse unmigrated overlaps;
  * [[Layout.manifestTable]] unions one pruned relation per era;
  * [[Layout.repartitionManifest]] stays the optional migration
  * finisher. */
class ManifestSpecEvolutionSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_spec_$tag").resolve("t").toString

  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private def seed(dir: String): Unit =
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 1, 10.0, 1L), (2L, "a", 2, 20.0, 1L),
        (3L, "b", 1, 30.0, 1L), (4L, "b", 2, 40.0, 1L))
        .toDF("k", "part", "day", "v", "ver"),
      Seq("part"), statsCols = Seq("v"),
      keys = Seq("k"), versionCol = Some("ver"))

  private def content(df: DataFrame): Set[(Long, String, Int, Double)] =
    df.select("k", "part", "day", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getDouble(3))).toSet

  private def genDirs(dir: String): Set[String] = {
    def rec(f: java.io.File, prefix: String): Seq[String] = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory)
      kids.toSeq.flatMap { d =>
        val rel = if (prefix.isEmpty) d.getName else s"$prefix/${d.getName}"
        if (d.getName.startsWith("gen=")) Seq(rel)
        else rec(d, rel)
      }
    }
    rec(new java.io.File(dir), "").toSet
  }

  private def scans(p: org.apache.spark.sql.execution.SparkPlan):
      Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  test("changeManifestPartitionSpec is metadata-only: one publish, " +
      "zero data moved, reads exact across eras, new writes land under " +
      "the new spec, time travel keeps the old era's shape") {
    val dir = tmpDir("meta")
    seed(dir)                                              // v1, spec=part
    val before = content(Layout.readManifest(spark, dir))
    val dirsBefore = genDirs(dir)
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) // v2
    assert(genDirs(dir) == dirsBefore, "a spec change must move NO data")
    val m2 = Layout.readManifestMeta(spark, dir, 2)
    assert(m2.partitionCols == Seq("day") &&
      m2.specHistory == Seq(Seq("part")) && m2.op == "spec")
    // reads across the boundary are exact
    assert(content(Layout.readManifest(spark, dir)) == before)
    // a new-era merge lands under day= directories
    Layout.mergeManifest(spark, dir,
      Seq((10L, "c", 1, 100.0, 2L)).toDF("k", "part", "day", "v", "ver"),
      Seq("k"), "ver")                                     // v3
    assert(genDirs(dir).exists(_.startsWith("day=1/")),
      s"new write must land under the new spec: ${genDirs(dir)}")
    assert(content(Layout.readManifest(spark, dir)) ==
      before + ((10L, "c", 1, 100.0)))
    // old snapshots time-travel under their own spec and column order
    val v1 = Layout.readManifestVersion(spark, dir, 1)
    assert(content(v1) == before)
    // stats pruning still spans both eras (readManifestPruned is
    // rel-keyed, era-agnostic)
    val pruned = Layout.readManifestPruned(spark, dir,
      Seq(("v", "25.0", "45.0")))
    assert(pruned.select("k").collect().map(_.getLong(0)).toSet ==
      Set(3L, 4L))
  }

  test("copy-on-write merges MIGRATE old-era partitions on touch — " +
      "including into EXISTING new-era partitions without losing their " +
      "rows; deletes of old-era keys apply") {
    val dir = tmpDir("migrate")
    seed(dir)                                              // v1, part=a|b
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) // v2
    // a fresh-key merge creates new-era partition day=1
    Layout.mergeManifest(spark, dir,
      Seq((10L, "c", 1, 100.0, 2L)).toDF("k", "part", "day", "v", "ver"),
      Seq("k"), "ver")                                     // v3
    // now touch keys living in old-era part=a: k=1 (day=1) updates,
    // k=2 (day=2) deletes. part=a must migrate wholesale: its rows
    // land in day=1 (which ALREADY holds k=10 — that row must survive)
    // and day=2 disappears with the delete.
    Layout.mergeManifest(spark, dir,
      Seq((1L, "a", 1, 11.0, 3L, false), (2L, "a", 2, 20.0, 3L, true))
        .toDF("k", "part", "day", "v", "ver", "del"),
      Seq("k"), "ver", deleteCol = Some("del"))            // v4
    val m4 = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(!m4.entries.contains("part=a"),
      s"touched old-era partition must migrate away: ${m4.entries}")
    assert(m4.entries.contains("part=b"),
      "untouched old-era partition stays in place")
    assert(content(Layout.readManifest(spark, dir)) == Set(
      (1L, "a", 1, 11.0), (3L, "b", 1, 30.0), (4L, "b", 2, 40.0),
      (10L, "c", 1, 100.0)),
      "migration must preserve the landing partition's existing rows " +
        "and apply the update + delete")
    // migrating the REST via another touch empties the old era
    Layout.mergeManifest(spark, dir,
      Seq((3L, "b", 1, 31.0, 4L)).toDF("k", "part", "day", "v", "ver"),
      Seq("k"), "ver")                                     // v5
    val m5 = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m5.oldEraRels.isEmpty,
      s"all old-era partitions migrated: ${m5.entries.keys}")
    assert(content(Layout.readManifest(spark, dir)) == Set(
      (1L, "a", 1, 11.0), (3L, "b", 1, 31.0), (4L, "b", 2, 40.0),
      (10L, "c", 1, 100.0)))
    // old snapshots still serve their own eras after the migration
    assert(content(Layout.readManifestVersion(spark, dir, 1)).size == 4)
  }

  test("merge-on-read deltas refuse batches overlapping UNMIGRATED " +
      "old-era partitions (named remedies); fresh-key batches keep the " +
      "O(batch) path") {
    val dir = tmpDir("mor")
    seed(dir)
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day"))
    // fresh key whose old-spec rel (part=z) never existed: accepted
    Layout.mergeManifestDelta(spark, dir,
      Seq((20L, "z", 1, 200.0, 2L)).toDF("k", "part", "day", "v", "ver"),
      Seq("k"), "ver")
    assert(content(Layout.readManifest(spark, dir))
      .contains((20L, "z", 1, 200.0)))
    // a batch carrying part=a (an unmigrated old-era partition) refuses
    val e = intercept[IllegalArgumentException] {
      Layout.mergeManifestDelta(spark, dir,
        Seq((1L, "a", 1, 12.0, 3L)).toDF("k", "part", "day", "v", "ver"),
        Seq("k"), "ver")
    }
    assert(e.getMessage.contains("prior-spec") &&
      e.getMessage.contains("mergeManifest"), e.getMessage)
  }

  test("manifestTable over a mixed-spec table: union of per-era " +
      "relations, each pruning its own spec's partition predicates " +
      "exactly; single-index mounts refuse mixed tables with remedies") {
    val dir = tmpDir("union")
    seed(dir)                                              // part=a|b
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day"))
    Layout.mergeManifest(spark, dir,
      Seq((10L, "c", 1, 100.0, 2L), (11L, "c", 2, 110.0, 2L))
        .toDF("k", "part", "day", "v", "ver"),
      Seq("k"), "ver")                                     // day=1, day=2
    val t = Layout.manifestTable(spark, dir)
    assert(content(t) == Set(
      (1L, "a", 1, 10.0), (2L, "a", 2, 20.0), (3L, "b", 1, 30.0),
      (4L, "b", 2, 40.0), (10L, "c", 1, 100.0), (11L, "c", 2, 110.0)))
    val all = scannedFiles(Layout.manifestTable(spark, dir))
    // an OLD-spec predicate prunes the old era's directories (the new
    // era cannot prune on it at partition level — its files scan)
    val oldPruned = scannedFiles(
      Layout.manifestTable(spark, dir).filter(col("part") === "a"))
    assert(oldPruned < all,
      s"old-spec predicate must prune old-era dirs: $oldPruned vs $all")
    // a NEW-spec predicate prunes the new era's directories
    val newPruned = scannedFiles(
      Layout.manifestTable(spark, dir).filter(col("day") === 1))
    assert(newPruned < all,
      s"new-spec predicate must prune new-era dirs: $newPruned vs $all")
    // both at once composes
    val both = scannedFiles(Layout.manifestTable(spark, dir)
      .filter(col("part") === "a" && col("day") === 1))
    assert(both <= oldPruned && both <= newPruned)
    // the provider surface (USING manifest views — the paths the
    // parser-seam rewrite does not cover) serves mixed tables through
    // the union-backed fallback relation: correct rows, filters pushed
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW t_mixed " +
      s"USING manifest OPTIONS (path '$dir')")
    assert(spark.sql("SELECT count(*) FROM t_mixed").head().getLong(0)
      == 6L)
    assert(spark.sql("SELECT k FROM t_mixed WHERE part = 'a' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(spark.sql(
      "SELECT sum(v) FROM t_mixed WHERE day = 1").head().getDouble(0)
      == 140.0)
  }

  test("feeds stay correct across the spec boundary: the spec publish " +
      "is metadata-only to the append feed, the change feed diffs it " +
      "to nothing, and post-change appends stream") {
    val dir = tmpDir("feed")
    val rows = Seq((1L, "a", 1, 10.0, 1L)).toDF("k", "part", "day", "v", "ver")
    Layout.writeManifestTable(spark, dir, rows, Seq("part"),
      appendOnly = true)                                   // v1
    Layout.appendManifest(spark, dir,
      Seq((2L, "b", 2, 20.0, 1L)).toDF("k", "part", "day", "v", "ver")) // v2
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) // v3
    Layout.appendManifest(spark, dir,
      Seq((3L, "c", 3, 30.0, 2L)).toDF("k", "part", "day", "v", "ver")) // v4
    // append feed across the boundary: spec version emits nothing,
    // appended rows on both sides stream
    val feed = Layout.appendsBetween(spark, dir, 1, 4)
    assert(feed.select("k").collect().map(_.getLong(0)).toSet ==
      Set(2L, 3L))
    assert(Layout.appendsBetween(spark, dir, 2, 3).isEmpty,
      "the spec-change version is metadata-only to the append feed")
    // change feed: the spec version diffs to nothing
    assert(Layout.manifestChanges(spark, dir, 2, 3).isEmpty)
    // full reads union the eras (append-only: spec-less deltas + bases)
    assert(Layout.readManifest(spark, dir).count() == 3)
  }

  test("guards: spec change refuses pending deltas and live aliases; " +
      "rename/drop/widen refuse PRIOR-spec columns while unmigrated " +
      "generations remain; compact skips frozen old-era partitions; " +
      "repartitionManifest to the CURRENT spec finishes the migration") {
    val dir = tmpDir("guards")
    seed(dir)
    Layout.mergeManifestDelta(spark, dir,
      Seq((5L, "a", 1, 50.0, 2L)).toDF("k", "part", "day", "v", "ver"),
      Seq("k"), "ver")
    val e1 = intercept[IllegalArgumentException] {
      Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) }
    assert(e1.getMessage.contains("fold"), e1.getMessage)
    Layout.foldManifestDeltas(spark, dir)
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day"))
    // prior-spec column with live old-era generations: no rename/drop
    val e2 = intercept[IllegalArgumentException] {
      Layout.renameManifestColumn(spark, dir, "part", "segment") }
    assert(e2.getMessage.contains("prior spec") ||
      e2.getMessage.contains("partition column"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      Layout.dropManifestColumn(spark, dir, "part") }
    assert(e3.getMessage.contains("partition column"), e3.getMessage)
    // compaction leaves frozen old-era partitions alone
    assert(Layout.compactManifest(spark, dir, maxFiles = 0).isEmpty,
      "old-era partitions are frozen; nothing current-era to compact")
    // the migration finisher: repartition TO THE CURRENT SPEC is legal
    // exactly while old-era generations remain
    val before = content(Layout.readManifest(spark, dir))
    Layout.repartitionManifest(spark, dir, Seq("day"))
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.specHistory.isEmpty && m.oldEraRels.isEmpty)
    assert(content(Layout.readManifest(spark, dir)) == before)
    // after migration the old spec col is a plain data column again
    Layout.renameManifestColumn(spark, dir, "part", "segment")
    assert(Layout.readManifest(spark, dir).columns.contains("segment"))
    // and a re-run refuses (nothing left to migrate)
    val e4 = intercept[IllegalArgumentException] {
      Layout.repartitionManifest(spark, dir, Seq("day")) }
    assert(e4.getMessage.contains("already partitioned"), e4.getMessage)
  }

  test("SQL over a MIXED-SPEC table: respec_table changes the spec " +
      "from SQL, bare-name SELECTs serve the per-era union (both eras' " +
      "predicates prune), VERSION AS OF spans the boundary, and SQL " +
      "DML migrates touched old-era partitions on the way") {
    val dir = tmpDir("sqlmixed")
    seed(dir)                                              // v1, [part]
    spark.sql("DROP TABLE IF EXISTS t_sqlmixed")
    spark.sql(
      s"CREATE TABLE t_sqlmixed USING manifest OPTIONS (path '$dir')")
    // metadata-only spec change from pure SQL
    val out = spark.sql(
      s"SELECT * FROM respec_table('$dir', 'day')").collect().head
    assert(out.getSeq[String](1) == Seq("day") && out.getInt(2) == 2)
    Layout.mergeManifest(spark, dir,
      Seq((10L, "c", 3, 100.0, 2L), (11L, "c", 4, 110.0, 2L))
        .toDF("k", "part", "day", "v", "ver"),
      Seq("k"), "ver")                                     // v3: day=3,4
    // bare-name SELECT serves the union of eras
    assert(spark.sql("SELECT sum(v) FROM t_sqlmixed").head().getDouble(0)
      == 310.0)
    assert(spark.sql(
      "SELECT k FROM t_sqlmixed WHERE part = 'a' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(spark.sql("SELECT k FROM t_sqlmixed WHERE day = 3")
      .head().getLong(0) == 10L)
    // both eras' partition predicates PRUNE through the union
    def scanned(sql: String): Long = {
      val df = spark.sql(sql); df.collect()
      def scans(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => scans(q.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case o => o.children.flatMap(scans)
      }
      scans(df.queryExecution.executedPlan)
        .map(_.metrics("numFiles").value).sum
    }
    val all = scanned("SELECT * FROM t_sqlmixed")
    assert(scanned("SELECT * FROM t_sqlmixed WHERE part = 'a'") < all)
    assert(scanned("SELECT * FROM t_sqlmixed WHERE day = 3") < all)
    // time travel by bare name: v1 (pre-change) serves the old era
    assert(spark.sql("SELECT count(*) FROM t_sqlmixed VERSION AS OF 1")
      .head().getLong(0) == 4L)
    // SQL DML on the mixed table routes through the migrate-on-touch
    // merge: ONE publish, the touched old-era partition (part=a, via
    // k=1's own values) migrates to the current spec, untouched
    // old-era partitions stay frozen, and the read reflects the update
    val vBefore = Layout.manifestVersion(spark, dir).get
    val mBefore = Layout.readManifestMeta(spark, dir, vBefore)
    val frozenGen = mBefore.entries("part=b")
    spark.sql("UPDATE t_sqlmixed SET v = 0.5, ver = 9 WHERE k = 1")
    val mAfter = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(mAfter.version == vBefore + 1, "UPDATE must be one publish")
    assert(!mAfter.entries.contains("part=a") &&
      mAfter.entries.contains("part=b") &&
      mAfter.entries("part=b") == frozenGen,
      s"part=a migrates, part=b stays frozen (${mAfter.entries})")
    assert(mAfter.oldEraRels.size < mBefore.oldEraRels.size,
      "era debt must shrink with the statement")
    assert(spark.sql("SELECT v FROM t_sqlmixed WHERE k = 1")
      .head().getDouble(0) == 0.5)
    // UPDATE must not assign ANY live spec's columns on a mixed table
    // (a key's partition values are immutable across eras)
    val e = intercept[Exception] {
      spark.sql("UPDATE t_sqlmixed SET part = 'z' WHERE k = 2") }
    assert(e.getMessage.contains("partition column"), e.getMessage)
    spark.sql("DROP TABLE t_sqlmixed")
  }

  test("expression subqueries over a MIXED-SPEC table serve the native " +
      "per-era union, not the RDD fallback: correct values, zero " +
      "RowDataSourceScan in the executed plan") {
    val dir = tmpDir("subqmixed")
    seed(dir)                                              // v1, [part]
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) // v2
    spark.sql("DROP TABLE IF EXISTS t_subqmixed")
    spark.sql(
      s"CREATE TABLE t_subqmixed USING manifest OPTIONS (path '$dir')")
    def rowScans(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      def walk(p: org.apache.spark.sql.execution.SparkPlan): Int =
        (p match {
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => walk(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive
              .QueryStageExec => walk(q.plan)
          case _: org.apache.spark.sql.execution
              .RowDataSourceScanExec => 1
          case o => o.children.map(walk).sum
        }) + p.subqueries.map(walk).sum
      walk(df.queryExecution.executedPlan)
    }
    // scalar subquery: rows above the table's own average
    val scalar = spark.sql("SELECT k FROM t_subqmixed WHERE v > " +
      "(SELECT avg(v) FROM t_subqmixed) ORDER BY k")
    assert(rowScans(scalar) == 0,
      "the scalar subquery's mixed read must be the native union")
    assert(scalar.collect().map(_.getLong(0)).toSeq == Seq(3L, 4L))
    // EXISTS and IN (SELECT …) over the mixed table
    val exists = spark.sql("SELECT count(*) FROM t_subqmixed a WHERE " +
      "EXISTS (SELECT 1 FROM t_subqmixed b WHERE b.k = a.k + 1)")
    assert(rowScans(exists) == 0)
    assert(exists.collect().head.getLong(0) == 3L)
    val inq = spark.sql("SELECT sum(v) FROM t_subqmixed WHERE k IN " +
      "(SELECT k FROM t_subqmixed WHERE part = 'a')")
    assert(rowScans(inq) == 0)
    assert(inq.collect().head.getDouble(0) == 30.0)
    spark.sql("DROP TABLE t_subqmixed")
  }

  test("NESTED spec evolution ([p] -> [p, day]): gen dirs and deeper " +
      "partition trees coexist in one directory; reads, merges and " +
      "retention all stay exact") {
    val dir = tmpDir("nested")
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 1, 10.0, 1L), (2L, "a", 2, 20.0, 1L),
        (3L, "b", 1, 30.0, 1L))
        .toDF("k", "part", "day", "v", "ver"),
      Seq("part"), keys = Seq("k"), versionCol = Some("ver")) // v1
    Layout.changeManifestPartitionSpec(spark, dir,
      Seq("part", "day"))                                  // v2
    // new-era write nests day= beside part=a's own gen dirs
    Layout.mergeManifest(spark, dir,
      Seq((10L, "a", 3, 100.0, 2L)).toDF("k", "part", "day", "v", "ver"),
      Seq("k"), "ver")                                     // v3
    assert(genDirs(dir).exists(_.startsWith("part=a/day=3/")),
      s"nested era dirs: ${genDirs(dir)}")
    assert(content(Layout.readManifest(spark, dir)) == Set(
      (1L, "a", 1, 10.0), (2L, "a", 2, 20.0), (3L, "b", 1, 30.0),
      (10L, "a", 3, 100.0)))
    // touching an old-era key migrates part=a into part=a/day=*
    Layout.mergeManifest(spark, dir,
      Seq((1L, "a", 1, 11.0, 3L)).toDF("k", "part", "day", "v", "ver"),
      Seq("k"), "ver")                                     // v4
    val mLive = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(!mLive.entries.contains("part=a") &&
      mLive.entries.contains("part=a/day=1") &&
      mLive.entries.contains("part=a/day=2"), s"${mLive.entries}")
    assert(content(Layout.readManifest(spark, dir)) == Set(
      (1L, "a", 1, 11.0), (2L, "a", 2, 20.0), (3L, "b", 1, 30.0),
      (10L, "a", 3, 100.0)))
    // retention with the nested tree: dropping pre-migration versions
    // must delete part=a's RETIRED own-gen dirs but never the live
    // nested day= dirs beneath the same directory
    Layout.reapManifest(spark, dir, keepVersions = 1)
    assert(Layout.manifestVersions(spark, dir) == Seq(4))
    assert(content(Layout.readManifest(spark, dir)) == Set(
      (1L, "a", 1, 11.0), (2L, "a", 2, 20.0), (3L, "b", 1, 30.0),
      (10L, "a", 3, 100.0)),
      "reap must not eat live nested-era generations")
    assert(!genDirs(dir).exists(d => d.startsWith("part=a/gen=")),
      s"retired old-era gen dirs under part=a must reap: ${genDirs(dir)}")
  }

  test("a merge-on-read delta batch spanning MORE prior-spec tuples " +
      "than maxTouchedPartitions refuses loudly — a truncated overlap " +
      "scan could miss an unmigrated partition and silently duplicate " +
      "keys on every read") {
    val dir = tmpDir("deltacap")
    seed(dir)                                              // v1, [part]
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) // v2
    // 3 distinct prior-spec (part) tuples against a cap of 2: the
    // collect is truncated, so the overlap check CANNOT be trusted —
    // must refuse before accepting the delta
    val e = intercept[IllegalArgumentException] {
      Layout.mergeManifestDelta(spark, dir,
        Seq((1L, "a", 1, 1.0, 2L), (3L, "b", 1, 3.0, 2L),
          (5L, "c", 1, 5.0, 2L)).toDF("k", "part", "day", "v", "ver"),
        Seq("k"), "ver", maxTouchedPartitions = 2)
    }
    assert(e.getMessage.contains("prior-spec") &&
      e.getMessage.contains("split the batch"), e.getMessage)
  }

  test("bare-name substitution respects shadowing: a CTE or temp view " +
      "named like a mixed-spec catalog table wins over the physical " +
      "table") {
    val dir = tmpDir("shadow")
    seed(dir)                                              // v1, [part]
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) // v2
    spark.sql("DROP TABLE IF EXISTS t_shadow")
    spark.sql(s"CREATE TABLE t_shadow USING manifest OPTIONS (path '$dir')")
    // sanity: the bare name serves the mixed table (4 seeded rows)
    assert(spark.sql("SELECT count(*) FROM t_shadow").head().getLong(0)
      == 4L)
    // a CTE of the same name shadows it
    assert(spark.sql(
      "WITH t_shadow AS (SELECT 1 AS x) SELECT count(*) FROM t_shadow")
      .head().getLong(0) == 1L)
    // ... including for later CTEs in the same WITH
    assert(spark.sql(
      """WITH t_shadow AS (SELECT 1 AS x),
        |     u AS (SELECT * FROM t_shadow)
        |SELECT count(*) FROM u""".stripMargin).head().getLong(0) == 1L)
    // a CTE defined BEFORE the shadowing name still reads the table
    assert(spark.sql(
      """WITH u AS (SELECT * FROM t_shadow),
        |     t_shadow AS (SELECT 1 AS x)
        |SELECT count(*) FROM u""".stripMargin).head().getLong(0) == 4L)
    // a temp view of the same name shadows it too
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW t_shadow AS SELECT 1 AS x")
    assert(spark.sql("SELECT count(*) FROM t_shadow").head().getLong(0)
      == 1L)
    spark.sql("DROP VIEW t_shadow")
    assert(spark.sql("SELECT count(*) FROM t_shadow").head().getLong(0)
      == 4L)
    spark.sql("DROP TABLE t_shadow")
  }

  test("alias retirement on a mixed-spec table refuses up front with " +
      "the working remedy (compact cannot rewrite frozen old-era " +
      "generations), and the SQL RENAME path refuses before " +
      "publishing a half-applied alias") {
    val dir = tmpDir("aliasmix")
    seed(dir)                                              // v1, [part]
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) // v2
    spark.sql("DROP TABLE IF EXISTS t_aliasmix")
    spark.sql(
      s"CREATE TABLE t_aliasmix USING manifest OPTIONS (path '$dir')")
    // immediate-rewrite SQL RENAME refuses BEFORE landing the alias
    val e0 = intercept[Exception] {
      spark.sql("ALTER TABLE t_aliasmix RENAME COLUMN v TO val") }
    assert(e0.getMessage.contains("prior partition spec") &&
      e0.getMessage.contains("deferRewrite"), e0.getMessage)
    assert(Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get).colAliases.isEmpty,
      "the refused rename must not publish an alias")
    // the single-spec check is the OPERATOR's, under its own lease
    // (atomic with the alias publish — a concurrent spec change after
    // a caller-side pre-check cannot slip through): the direct call
    // with requireSingleSpec refuses identically
    val eDirect = intercept[IllegalArgumentException] {
      Layout.renameManifestColumn(spark, dir, "v", "val",
        requireSingleSpec = true) }
    assert(eDirect.getMessage.contains("prior partition spec"),
      eDirect.getMessage)
    // a deferred (metadata-only) rename is fine on a mixed table...
    Layout.renameManifestColumn(spark, dir, "v", "val")    // v3
    // ...but retiring it cannot work until the spec migration finishes
    val e = intercept[IllegalArgumentException] {
      Layout.clearManifestAliases(spark, dir) }
    assert(e.getMessage.contains("prior partition spec") &&
      e.getMessage.contains("migrateManifestPartitions"), e.getMessage)
    // Maintain clear_aliases WITHOUT a drain configured cannot ever
    // succeed — refuses loudly naming migrate_partitions as the remedy
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM maintain_table('$dir', " +
        "'clear_aliases=true')").collect() }
    assert(e2.getMessage.contains("migrate_partitions"), e2.getMessage)
    // WITH the drain configured, retirement DEFERS (run succeeds, the
    // decision trail says so) until a later run converges and retires
    val d1 = spark.sql(s"SELECT decisions FROM maintain_table('$dir', " +
      "'clear_aliases=true;migrate_partitions=1')").head().getString(0)
    assert(d1.contains("aliases=deferred") && d1.contains("migrate=part="),
      d1)
    var spins = 0
    while (Layout.readManifestMeta(spark, dir,
        Layout.manifestVersion(spark, dir).get).colAliases.nonEmpty &&
        spins < 8) {
      spark.sql(s"SELECT decisions FROM maintain_table('$dir', " +
        "'clear_aliases=true;migrate_partitions=1')").collect()
      spins += 1
    }
    val mDone = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(mDone.colAliases.isEmpty && mDone.oldEraRels.isEmpty &&
      mDone.specHistory.isEmpty,
      s"the drain+retire loop must converge (spins=$spins)")
    spark.sql("DROP TABLE t_aliasmix")
  }

  test("a merge that drains an era's LAST partition prunes specHistory " +
      "— the debt dashboard reads zero, the spec's column drops " +
      "cleanly, and later merges never consult the dead era") {
    val dir = tmpDir("dropspec")
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 1, 7, 10.0, 1L), (2L, "b", 2, 7, 20.0, 1L))
        .toDF("k", "part", "day", "hour", "v", "ver"),
      Seq("part"), keys = Seq("k"), versionCol = Some("ver")) // v1
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) // v2
    // touch every part-era key: the part era fully migrates, and the
    // PUBLISH ITSELF prunes the drained spec from the history — no
    // phantom debt survives (the round-16 review finding)
    Layout.mergeManifest(spark, dir,
      Seq((1L, "a", 1, 7, 11.0, 2L), (2L, "b", 2, 7, 21.0, 2L))
        .toDF("k", "part", "day", "hour", "v", "ver"),
      Seq("k"), "ver")                                     // v3
    val m3 = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m3.specHistory.isEmpty && m3.oldEraRels.isEmpty,
      s"the draining merge must prune the dead era (${m3.specHistory})")
    Layout.changeManifestPartitionSpec(spark, dir, Seq("hour")) // v4
    val m4 = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m4.specHistory == Seq(Seq("day")) &&
      m4.oldEraRels.forall(_.startsWith("day=")), s"${m4.specHistory}")
    // 'part' is in NO live spec: its column drops cleanly...
    Layout.dropManifestColumn(spark, dir, "part")          // v5
    // ...and a merge whose batch no longer carries 'part' still works
    // (the pre-scan only consults specs with live generations — the
    // belt to the pruning's suspenders, for tables published pre-fix)
    Layout.mergeManifest(spark, dir,
      Seq((1L, 1, 7, 12.0, 3L)).toDF("k", "day", "hour", "v", "ver"),
      Seq("k"), "ver")                                     // v6
    assert(Layout.readManifest(spark, dir)
      .filter(col("k") === 1L).head().getAs[Double]("v") == 12.0)
  }
}
