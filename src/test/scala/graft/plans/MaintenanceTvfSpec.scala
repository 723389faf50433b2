package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.DatabaseSource
import graft.operators.Layout

/** SQL-driven maintenance: `maintain_table` / `reap_table` action TVFs
  * run the scheduled-surface Maintain/Reap machinery from pure
  * `spark.sql`, record their decisions in the step ledger when given a
  * JDBC URL, and propagate retention-consent refusals as loud errors. */
class MaintenanceTvfSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_tvf_$tag").resolve("t").toString

  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private def seed(dir: String): Unit = {
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"))
    for (n <- 2 to 4)
      Layout.mergeManifestDelta(spark, dir,
        Seq((n * 10L, "a", n * 1.0, n.toLong)).toDF("k", "part", "v", "ver"),
        Seq("k"), "ver")
  }

  test("maintain_table folds deep deltas + reaps via pure SQL; the " +
      "decisions land in pd_step_history through the given ledger") {
    val dir = tmpDir("maintain")
    seed(dir) // part=a carries 3 pending deltas; versions v1..v4
    val url = "jdbc:derby:memory:graft_tvf_m;create=true"
    val out = spark.sql(
      s"""SELECT * FROM maintain_table('$dir',
         |  'max_pending_deltas=3;keep_versions=2', '$url')""".stripMargin)
      .collect()
    assert(out.length == 1)
    val row = out.head
    assert(row.getAs[String]("status") == graft.core.Status.Done)
    val decisions = row.getAs[String]("decisions")
    assert(decisions.contains("fold=part=a"), decisions)
    assert(decisions.contains("reap="), decisions)
    // the fold landed: no pending deltas, rows intact
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.deltas.isEmpty)
    assert(Layout.readManifest(spark, dir).count() == 5)
    // retention applied through the same call
    assert(Layout.manifestVersions(spark, dir).size == 2)
    // the DECISION TRAIL: a pd_step_history row for the sql_maintain
    // pipeline carrying the same decisions string
    val c = DatabaseSource("t", url).connect()
    try {
      val rs = c.createStatement().executeQuery(
        "select t.result_long, t.status, s.step_a from pd_task_history t " +
          "join pd_step_history s on s.task_id = t.id")
      assert(rs.next(), "the SQL-driven run must write task + step rows")
      assert(rs.getString(1).contains("fold=part=a"), rs.getString(1))
      assert(rs.getString(2) == graft.core.Status.Done)
      assert(rs.getString(3).contains("Maintain"), rs.getString(3))
    } finally c.close()
  }

  test("reap_table applies retention from SQL and preserves the " +
      "strand-guard refusal; bad options refuse loudly") {
    val dir = tmpDir("reap")
    seed(dir)
    // a feed consumer acked at v1 blocks a keep_versions=1 reap — the
    // SQL surface must surface the SAME refusal, not swallow it
    Layout.writeFeedCursor(spark, dir, "lagging", 1)
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM reap_table('$dir', 'keep_versions=1')")
        .collect()
    }
    assert(e.getMessage.contains("lagging"), e.getMessage)
    // with the consumer explicitly ignored, the reap applies
    val out = spark.sql(
      s"""SELECT * FROM reap_table('$dir',
         |  'keep_versions=1;ignore_consumers=lagging')""".stripMargin)
      .collect().head
    assert(out.getAs[String]("status") == graft.core.Status.Done)
    assert(out.getAs[Long]("actions") > 0L)
    assert(Layout.manifestVersions(spark, dir).size == 1)
    // malformed options refuse with the k=v remedy
    val e2 = intercept[Exception] {
      spark.sql(s"SELECT * FROM reap_table('$dir', 'keep_versions')")
        .collect()
    }
    assert(e2.getMessage.contains("k=v"), e2.getMessage)
  }

  test("migrate_partitions drains a mixed-spec table to a single spec " +
      "over budgeted runs: content hash-stable throughout, oldest era " +
      "first, specHistory clears at convergence, the append feed sees " +
      "nothing, and a converged run is a quiet no-op") {
    val dir = tmpDir("migrate")
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 1, 10.0, 1L), (2L, "b", 1, 20.0, 1L),
        (3L, "c", 2, 30.0, 1L), (4L, "d", 2, 40.0, 1L))
        .toDF("k", "part", "day", "v", "ver"),
      Seq("part"), keys = Seq("k"), versionCol = Some("ver"))  // v1
    Layout.changeManifestPartitionSpec(spark, dir, Seq("day")) // v2
    def content() = Layout.readManifest(spark, dir)
      .select("k", "part", "day", "v", "ver").collect()
      .map(_.toSeq).toSet
    val before = content()
    def meta() = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(meta().oldEraRels.size == 4)
    // run 1: budget 2 — exactly the two lexicographically-first
    // old-era partitions migrate (one era: rel-name order)
    val out1 = spark.sql(s"SELECT decisions FROM maintain_table('$dir', " +
      "'migrate_partitions=2')").head().getString(0)
    assert(out1.contains("migrate=part=a,part=b"), out1)
    val m1 = meta()
    assert(m1.oldEraRels.size == 2 && m1.specHistory.nonEmpty)
    assert(content() == before, "migration must be row-identical")
    // the feed sees the migration as metadata-only (op=repartition)
    assert(Layout.appendsBetween(spark, dir, 2, m1.version).isEmpty,
      "budgeted migration must emit nothing on the append feed")
    // run 2: converges — history clears with the last old-era rel
    spark.sql(s"SELECT * FROM maintain_table('$dir', " +
      "'migrate_partitions=2')").collect()
    val m2 = meta()
    assert(m2.oldEraRels.isEmpty && m2.specHistory.isEmpty,
      s"converged (${m2.oldEraRels}, ${m2.specHistory})")
    assert(m2.entries.keySet == Set("day=1", "day=2"), s"${m2.entries}")
    assert(content() == before)
    // run 3: nothing left — quiet no-op, no publish
    val vConverged = m2.version
    val out3 = spark.sql(s"SELECT decisions FROM maintain_table('$dir', " +
      "'migrate_partitions=2')").head().getString(0)
    assert(out3.contains("migrate=;") || out3.endsWith("migrate="), out3)
    assert(meta().version == vConverged, "a converged drain must not publish")
  }
}
