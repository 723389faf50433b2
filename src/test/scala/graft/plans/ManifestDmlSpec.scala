package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec
import graft.operators.Layout

/** Pure-SQL DML over manifest tables: `INSERT INTO <USING manifest
  * view> SELECT …` rewrites to a keyed merge (ManifestInsertRule) —
  * never a raw parquet write into the table root — and the batch
  * `df.write.format("manifest")` surface seeds/merges through the same
  * machinery. */
class ManifestDmlSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_dml_$tag").resolve("t").toString

  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private def snap(df: DataFrame): Map[Long, Double] =
    df.select("k", "v").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("INSERT INTO a USING-manifest view lands as a keyed merge: " +
      "upserts + inserts, snapshot history intact, no stray files") {
    val dir = tmpDir("insert")
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_dml
      USING manifest OPTIONS (path '$dir', keys 'k', versionCol 'ver')""")
    // positional INSERT: update k=1, insert k=3 — ONE merge publish
    // the view's column order is DATA COLUMNS FIRST then partition
    // cols (k, v, ver, part) — positional INSERT follows the view
    spark.sql("INSERT INTO t_dml SELECT * FROM VALUES " +
      "(1L, 11.0, 2L, 'a'), (3L, 30.0, 2L, 'c') AS s(k, v, ver, part)")
    assert(Layout.manifestVersion(spark, dir).contains(2))
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    // time travel still reaches the seed — the INSERT was a manifest
    // publish, not an in-place write
    assert(snap(Layout.readManifestVersion(spark, dir, 1)) ==
      Map(1L -> 10.0, 2L -> 20.0))
    // no part files outside generation dirs (the corruption the
    // rewrite exists to prevent)
    val stray = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    assert(stray.isEmpty, s"raw files in the table root: ${stray.toSeq}")
    // the view is snapshot-pinned at creation; re-mounting sees the new
    // rows through the planner-integrated index
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_dml2
      USING manifest OPTIONS (path '$dir')""")
    assert(spark.sql("SELECT count(*) FROM t_dml2").head().getLong(0) == 3)
  }

  test("INSERT column list must cover every column; arity and overwrite " +
      "refuse loudly; mor option lands a delta") {
    val dir = tmpDir("insert_guard")
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L)).toDF("k", "part", "v", "ver"), Seq("part"))
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_g
      USING manifest OPTIONS (path '$dir', keys 'k', versionCol 'ver')""")
    // arity mismatch
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO t_g SELECT 1L, 'a', 2.0") }
    assert(e1.getMessage.contains("arity") ||
      e1.getMessage.contains("not enough data columns"), e1.getMessage)
    // partial column list
    val e2 = intercept[Exception] {
      spark.sql("INSERT INTO t_g (k, v) SELECT 1L, 2.0") }
    assert(e2.getMessage.contains("every column") ||
      e2.getMessage.contains("not enough data columns"), e2.getMessage)
    // INSERT OVERWRITE refused with the manifest rationale
    val e3 = intercept[Exception] {
      spark.sql("INSERT OVERWRITE TABLE t_g SELECT 1L, 2.0, 2L, 'a'") }
    assert(e3.getMessage.contains("INSERT OVERWRITE a manifest table"),
      e3.getMessage)
    // a view mounted with mor 'true' appends a merge-on-read delta:
    // base generation untouched, pending delta recorded
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_mor
      USING manifest OPTIONS (path '$dir', keys 'k', versionCol 'ver',
                              mor 'true')""")
    spark.sql(
      "INSERT INTO t_mor SELECT * FROM VALUES (9L, 90.0, 2L, 'a') " +
        "AS s(k, v, ver, part)")
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.deltas.nonEmpty, "mor INSERT must land as a pending delta")
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(1L -> 10.0, 9L -> 90.0))
    // a view WITHOUT a merge spec (on a fresh table with no stored
    // mor spec either) names the fix
    val dir2 = tmpDir("nospec")
    Layout.writeManifestTable(spark, dir2,
      Seq((1L, "a", 1.0, 1L)).toDF("k", "part", "v", "ver"), Seq("part"))
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_nospec2
      USING manifest OPTIONS (path '$dir2')""")
    val e4 = intercept[Exception] {
      spark.sql("INSERT INTO t_nospec2 SELECT * FROM VALUES " +
        "(1L, 2.0, 2L, 'a') AS s(k, v, ver, part)") }
    assert(e4.getMessage.contains("keys 'k1,k2'"), e4.getMessage)
  }

  test("SQL UPDATE and DELETE rewrite to tombstone merges: snapshot " +
      "publish, time travel intact, partition/key assignments refuse") {
    val dir = tmpDir("mutate")
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "a", 20.0, 1L), (3L, "b", 30.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_mut
      USING manifest OPTIONS (path '$dir', keys 'k', versionCol 'ver')""")
    spark.sql("UPDATE t_mut SET v = v + 1.0 WHERE k <= 2")
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(1L -> 11.0, 2L -> 21.0, 3L -> 30.0))
    spark.sql("DELETE FROM t_mut WHERE k = 2")
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    // each statement was ONE snapshot publish; the seed still
    // time-travels
    assert(Layout.manifestVersion(spark, dir).contains(3))
    assert(snap(Layout.readManifestVersion(spark, dir, 1)) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // no stray parquet in the table root (the raw-write corruption the
    // rewrites exist to prevent)
    assert(!new java.io.File(dir).listFiles()
      .exists(f => f.isFile && f.getName.startsWith("part-")))
    // a DELETE touching nothing publishes an empty merge harmlessly
    spark.sql("DELETE FROM t_mut WHERE k = 999")
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(1L -> 11.0, 3L -> 30.0))
    // partition and key assignments refuse with the remedy
    val e1 = intercept[Exception] {
      spark.sql("UPDATE t_mut SET part = 'z' WHERE k = 1") }
    assert(e1.getMessage.contains("partition column"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE t_mut SET k = 99 WHERE k = 1") }
    assert(e2.getMessage.contains("merge key"), e2.getMessage)
    // mutations compute against the LIVE table, not the view's pinned
    // snapshot: an UPDATE bumping versions through view A, then a
    // DELETE through the ORIGINAL view must still remove the row (its
    // tombstone must carry the CURRENT version, or it loses the merge)
    spark.sql("UPDATE t_mut SET v = 100.0, ver = CAST(9 AS BIGINT) " +
      "WHERE k = 1")
    spark.sql("DELETE FROM t_mut WHERE k = 1")
    assert(snap(Layout.readManifest(spark, dir)) == Map(3L -> 30.0),
      "a row updated after the view was mounted must not survive " +
        "its own DELETE")
    // DML through a time-travel view refuses (pinned read vs live write)
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_pin
      USING manifest OPTIONS (path '$dir', keys 'k', versionCol 'ver',
                              versionAsOf '1')""")
    val e3 = intercept[Exception] {
      spark.sql("DELETE FROM t_pin WHERE k = 3") }
    assert(e3.getMessage.contains("versionAsOf"), e3.getMessage)
  }

  test("df.write.format(\"manifest\"): overwrite seeds, append merges, " +
      "existing-table overwrite refuses") {
    val dir = tmpDir("writer")
    Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
      .toDF("k", "part", "v", "ver")
      .write.format("manifest").option("path", dir)
      .option("partitionCols", "part").mode("overwrite").save()
    assert(Layout.manifestVersion(spark, dir).contains(1))
    Seq((2L, "b", 22.0, 2L), (3L, "c", 30.0, 2L))
      .toDF("k", "part", "v", "ver")
      .write.format("manifest").option("path", dir)
      .option("keys", "k").option("versionCol", "ver")
      .mode("append").save()
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(1L -> 10.0, 2L -> 22.0, 3L -> 30.0))
    val e = intercept[Exception] {
      Seq((9L, "z", 9.0, 9L)).toDF("k", "part", "v", "ver")
        .write.format("manifest").option("path", dir)
        .option("partitionCols", "part").mode("overwrite").save()
    }
    assert(e.getMessage.contains("refusing to overwrite"), e.getMessage)
    // a merge-on-read append must SUCCEED end to end: the writer's
    // returned relation is schema-only (constructing the planner index
    // here would refuse the pending delta it just created)
    Seq((4L, "c", 44.0, 3L)).toDF("k", "part", "v", "ver")
      .write.format("manifest").option("path", dir)
      .option("keys", "k").option("versionCol", "ver")
      .option("mor", "true").mode("append").save()
    assert(snap(Layout.readManifest(spark, dir)).get(4L).contains(44.0))
  }

  test("CTAS: CREATE TABLE … USING manifest AS SELECT seeds the table " +
      "AND registers it — DML by bare name works immediately") {
    val dir = tmpDir("ctas")
    spark.sql("DROP TABLE IF EXISTS t_ctas")
    spark.sql(s"""CREATE TABLE t_ctas
      USING manifest
      OPTIONS (path '$dir', partitionCols 'part', keys 'k',
               versionCol 'ver')
      AS SELECT k, CAST(v AS DOUBLE) AS v, ver, part FROM VALUES
        (1L, 10.0, 1L, 'a'), (2L, 20.0, 1L, 'b')
        AS s(k, v, ver, part)""")
    assert(Layout.manifestVersion(spark, dir).contains(1),
      "CTAS must seed the manifest (one publish)")
    assert(snap(spark.table("t_ctas")) == Map(1L -> 10.0, 2L -> 20.0))
    // the declared merge spec came from the CTAS options: bare-name
    // DML needs nothing restated
    spark.sql("INSERT INTO t_ctas SELECT 3L, 30.0, 2L, 'c'")
    spark.sql("UPDATE t_ctas SET v = 11.0, ver = 3 WHERE k = 1")
    assert(snap(spark.table("t_ctas")) ==
      Map(1L -> 11.0, 2L -> 20.0, 3L -> 30.0))
    assert(Layout.manifestVersion(spark, dir).contains(3))
    // seed time-travels by bare name
    assert(snap(spark.sql("SELECT * FROM t_ctas VERSION AS OF 1")) ==
      Map(1L -> 10.0, 2L -> 20.0))
    // TRUNCATE would delete files under retained versions — refuses
    val eTrunc = intercept[Exception] {
      spark.sql("TRUNCATE TABLE t_ctas") }
    assert(eTrunc.getMessage.contains("retained versions"),
      eTrunc.getMessage)
    // DROP TABLE removes only the catalog entry (external
    // registration) — the manifest table survives on disk
    spark.sql("DROP TABLE t_ctas")
    assert(Layout.manifestVersion(spark, dir).contains(3),
      "DROP TABLE must never touch the manifest's data")
  }

  test("PARTITIONED BY at SQL DDL: the CTAS clause maps onto the " +
      "manifest's layout; clause/option disagreement, wrong " +
      "registration clauses, and transform shapes refuse loudly") {
    // CTAS with the native clause — no partitionCols OPTION needed
    val dir = tmpDir("pby")
    spark.sql("DROP TABLE IF EXISTS t_pby")
    spark.sql(s"""CREATE TABLE t_pby
      USING manifest PARTITIONED BY (part)
      OPTIONS (path '$dir', keys 'k', versionCol 'ver')
      AS SELECT k, CAST(v AS DOUBLE) AS v, ver, part FROM VALUES
        (1L, 10.0, 1L, 'a'), (2L, 20.0, 1L, 'b')
        AS s(k, v, ver, part)""")
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.partitionCols == Seq("part"),
      "the clause must fix the manifest partition spec")
    assert(snap(spark.table("t_pby")) == Map(1L -> 10.0, 2L -> 20.0))
    // the catalog records the layout too (DESCRIBE shows it)
    assert(spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("t_pby"))
      .partitionColumnNames == Seq("part"))
    // a clause that disagrees with an explicit option refuses
    val dir2 = tmpDir("pby2")
    val eBoth = intercept[IllegalArgumentException] {
      spark.sql(s"""CREATE TABLE t_pby2
        USING manifest PARTITIONED BY (part)
        OPTIONS (path '$dir2', partitionCols 'ver')
        AS SELECT 1L AS k, 'a' AS part, 1L AS ver""") }
    assert(eBoth.getMessage.contains("disagrees"), eBoth.getMessage)
    // registering an EXISTING table under a different clause refuses
    // (Spark's own schema check misses a trailing subset of a
    // multi-column spec — the seam checks the LIVE spec exactly)
    val dir3 = tmpDir("pby3")
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    Layout.writeManifestTable(spark, dir3,
      Seq((1L, "a", 1, 10.0, 1L)).toDF("k", "part", "day", "v", "ver"),
      Seq("part", "day"))
    val eReg = intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE t_pby3 (k BIGINT, v DOUBLE, ver BIGINT, " +
        "part STRING, day INT) USING manifest PARTITIONED BY (day) " +
        s"OPTIONS (path '$dir3')") }
    assert(eReg.getMessage.contains("partitioned by (part, day)"),
      eReg.getMessage)
    // ... while the TRUE clause registers fine
    spark.sql("DROP TABLE IF EXISTS t_pby3")
    spark.sql("CREATE TABLE t_pby3 (k BIGINT, v DOUBLE, ver BIGINT, " +
      "part STRING, day INT) USING manifest PARTITIONED BY (part, day) " +
      s"OPTIONS (path '$dir3')")
    assert(spark.table("t_pby3").count() == 1L)
    // transform shapes (other than bucket — that one IS the
    // data-bucket layout, see the CLUSTERED BY test) have no manifest
    // meaning
    val eTf = intercept[IllegalArgumentException] {
      spark.sql(s"""CREATE TABLE t_pby4
        USING manifest PARTITIONED BY (days(part))
        OPTIONS (path '${tmpDir("pby4")}')
        AS SELECT 1L AS k, TIMESTAMP'2024-01-01' AS part""") }
    assert(eTf.getMessage.contains("not transforms"), eTf.getMessage)
    spark.sql("DROP TABLE IF EXISTS t_pby")
    spark.sql("DROP TABLE IF EXISTS t_pby3")
  }

  test("CLUSTERED BY ... INTO n BUCKETS at SQL DDL fixes the " +
      "manifest's DATA-bucket layout; SORTED BY, clause/option " +
      "disagreement and wrong registration clauses refuse") {
    val dir = tmpDir("cby")
    spark.sql("DROP TABLE IF EXISTS t_cby")
    spark.sql(s"""CREATE TABLE t_cby
      USING manifest PARTITIONED BY (part)
      CLUSTERED BY (k) INTO 4 BUCKETS
      OPTIONS (path '$dir', keys 'k', versionCol 'ver')
      AS SELECT id AS k, CAST(id AS DOUBLE) * 10 AS v, 1L AS ver,
        CAST(id % 2 AS STRING) AS part FROM range(40)""")
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.dataBuckets == 4 && m.dataBucketCols == Seq("k"),
      s"the clause must fix the bucket layout (got " +
        s"${m.dataBucketCols} x ${m.dataBuckets})")
    // the registered table serves the BucketSpec: a key-grouped
    // aggregation by bare SQL name runs exchange-free
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val g = spark.sql(
        "SELECT k, sum(v) AS sv FROM t_cby GROUP BY k")
      assert(g.count() == 40L)
      assert(graft.PlanScan.shuffles(g.queryExecution.executedPlan)
        .isEmpty, "bare-name groupBy on the bucket column must not " +
        "exchange")
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // SORTED BY would be an unsound table-wide claim
    val eS = intercept[IllegalArgumentException] {
      spark.sql(s"""CREATE TABLE t_cby_s
        USING manifest PARTITIONED BY (part)
        CLUSTERED BY (k) SORTED BY (v) INTO 4 BUCKETS
        OPTIONS (path '${tmpDir("cby_s")}', keys 'k', versionCol 'ver')
        AS SELECT 1L AS k, 1.0 AS v, 1L AS ver, 'a' AS part""") }
    assert(eS.getMessage.contains("SORTED BY"), eS.getMessage)
    // a clause plus a HALF-declared OPTIONS pair is self-consistent
    // DDL: the injection fills in only the missing key (no duplicate
    // OPTIONS entry, no bogus both-or-neither refusal)
    val dirH = tmpDir("cby_h")
    spark.sql("DROP TABLE IF EXISTS t_cby_h")
    spark.sql(s"""CREATE TABLE t_cby_h
      USING manifest PARTITIONED BY (part)
      CLUSTERED BY (k) INTO 4 BUCKETS
      OPTIONS (path '$dirH', keys 'k', versionCol 'ver', bucketBy 'k')
      AS SELECT id AS k, 1.0 AS v, 1L AS ver,
        CAST(id % 2 AS STRING) AS part FROM range(8)""")
    val mH = Layout.readManifestMeta(spark, dirH,
      Layout.manifestVersion(spark, dirH).get)
    assert(mH.dataBuckets == 4 && mH.dataBucketCols == Seq("k"),
      s"half-declared OPTIONS + clause must seed bucketed (got " +
        s"${mH.dataBucketCols} x ${mH.dataBuckets})")
    spark.sql("DROP TABLE IF EXISTS t_cby_h")
    // clause/option disagreement refuses
    val eD = intercept[IllegalArgumentException] {
      spark.sql(s"""CREATE TABLE t_cby_d
        USING manifest PARTITIONED BY (part)
        CLUSTERED BY (k) INTO 4 BUCKETS
        OPTIONS (path '${tmpDir("cby_d")}', keys 'k', versionCol 'ver',
          bucketBy 'v', buckets '4')
        AS SELECT 1L AS k, 1.0 AS v, 1L AS ver, 'a' AS part""") }
    assert(eD.getMessage.contains("disagrees"), eD.getMessage)
    // registering an existing table under a WRONG bucket clause
    // refuses; the true clause registers
    spark.sql("DROP TABLE IF EXISTS t_cby2")
    val eReg = intercept[IllegalArgumentException] {
      spark.sql("CREATE TABLE t_cby2 (k BIGINT, v DOUBLE, ver BIGINT, " +
        "part STRING) USING manifest PARTITIONED BY (part) " +
        s"CLUSTERED BY (k) INTO 8 BUCKETS OPTIONS (path '$dir')") }
    assert(eReg.getMessage.contains("bucket layout"), eReg.getMessage)
    spark.sql("CREATE TABLE t_cby2 (k BIGINT, v DOUBLE, ver BIGINT, " +
      "part STRING) USING manifest PARTITIONED BY (part) " +
      s"CLUSTERED BY (k) INTO 4 BUCKETS OPTIONS (path '$dir')")
    assert(spark.table("t_cby2").count() == 40L)
    spark.sql("DROP TABLE IF EXISTS t_cby")
    spark.sql("DROP TABLE IF EXISTS t_cby2")
  }

  test("MERGE INTO: a full CDC batch (update + delete + insert, " +
      "conditional clauses, star forms) as ONE statement, ONE publish; " +
      "inexpressible shapes refuse with remedies") {
    val dir = tmpDir("merge")
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L), (3L, "a", 30.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"),
      keys = Seq("k"), versionCol = Some("ver"))
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW t_mrg
      USING manifest OPTIONS (path '$dir')""")
    Seq((1L, "a", 11.0, 2L, "u"), (2L, "b", 0.0, 2L, "d"),
      (9L, "c", 90.0, 2L, "i"))
      .toDF("k", "part", "v", "ver", "op")
      .createOrReplaceTempView("mrg_batch")
    spark.sql("""
      MERGE INTO t_mrg t USING mrg_batch s ON t.k = s.k
      WHEN MATCHED AND s.op = 'd' THEN DELETE
      WHEN MATCHED THEN UPDATE SET v = s.v, ver = s.ver
      WHEN NOT MATCHED THEN INSERT (k, part, v, ver)
        VALUES (s.k, s.part, s.v, s.ver)""")
    assert(Layout.manifestVersion(spark, dir).contains(2),
      "the whole batch must land as exactly ONE publish")
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(1L -> 11.0, 3L -> 30.0, 9L -> 90.0))
    // the seed time-travels intact
    assert(snap(Layout.readManifestVersion(spark, dir, 1)) ==
      Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // star forms: analyzer-expanded SET * drops the key assignment
    // (identity by ON) and guards the partition column to the no-op
    Seq((3L, "a", 33.0, 3L)).toDF("k", "part", "v", "ver")
      .createOrReplaceTempView("mrg2")
    spark.sql("""MERGE INTO t_mrg t USING mrg2 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(snap(Layout.readManifest(spark, dir))(3L) == 33.0)
    // a star UPDATE that MOVES a partition raises in-plan
    Seq((3L, "MOVED", 34.0, 4L)).toDF("k", "part", "v", "ver")
      .createOrReplaceTempView("mrg3")
    val eMove = intercept[Exception] {
      spark.sql("""MERGE INTO t_mrg t USING mrg3 s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET *""") }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(eMove).exists(_.contains("partition")), eMove.toString)
    // NOT MATCHED BY SOURCE — reconcile-to-snapshot: target rows the
    // batch never carries take conditional UPDATE/DELETE clauses,
    // still ONE publish (full-outer classification). mrg2 carries only
    // k=3: k=1 is NMBS-deleted, k=9 NMBS-flagged, k=3 matched-updated.
    spark.sql("""MERGE INTO t_mrg t USING mrg2 s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET v = s.v + 1, ver = s.ver + 10
      WHEN NOT MATCHED BY SOURCE AND t.k = 1 THEN DELETE
      WHEN NOT MATCHED BY SOURCE THEN UPDATE SET ver = 99""")
    assert(Layout.manifestVersion(spark, dir).contains(4),
      "the NMBS reconcile must land as exactly ONE publish")
    assert(snap(Layout.readManifest(spark, dir)) ==
      Map(3L -> 34.0, 9L -> 90.0))
    assert(Layout.readManifest(spark, dir)
      .filter("k = 9").select("ver").head().getLong(0) == 99L,
      "an unclaimed NMBS row must take the unconditional NMBS clause")
    // NMBS supports only UPDATE/DELETE (there is no source row to
    // insert) — Spark's parser already refuses INSERT there, so the
    // guard pins the command-level check via the star-insert shape
    val e1 = intercept[Exception] {
      spark.sql("""MERGE INTO t_mrg t USING mrg2 s ON t.v = s.v
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET ver = 100""") }
    assert(messages(e1).exists(_.contains("equality on every merge key")),
      e1.toString)
    // duplicate source keys refuse before publishing
    Seq((3L, "a", 1.0, 5L), (3L, "a", 2.0, 6L))
      .toDF("k", "part", "v", "ver").createOrReplaceTempView("mrg_dup")
    val e2 = intercept[Exception] {
      spark.sql("""MERGE INTO t_mrg t USING mrg_dup s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v, ver = s.ver""") }
    assert(messages(e2).exists(_.contains("multiple source rows")),
      e2.toString)
    // an ON condition that does not pin the key refuses
    val e3 = intercept[Exception] {
      spark.sql("""MERGE INTO t_mrg t USING mrg2 s ON t.v = s.v
        WHEN MATCHED THEN UPDATE SET ver = s.ver""") }
    assert(messages(e3).exists(_.contains("equality on every merge key")),
      e3.toString)
    // no refused statement published anything
    assert(Layout.manifestVersion(spark, dir).contains(4))
  }
}
