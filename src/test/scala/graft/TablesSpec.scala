package graft

/** Fixture-drift guard (round-7 verdict #2).
  *
  * The driver regenerates /root/testdata between rounds; between rounds 6
  * and 7 events.ts drifted TIMESTAMP(NANOS) → timestamp[us] and silently
  * broke 7 gates. These tests pin the post-load contract so the NEXT
  * regeneration breaks here, loudly, with the table and column named.
  */
class TablesSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("every fixture table honors its post-load schema contract") {
    val violations = Tables.schemaViolations(spark, dir)
    assert(violations.isEmpty,
      s"\nfixture drift detected — adapt Tables.load:\n  ${violations.mkString("\n  ")}")
  }

  test("events.ts normalizes to TimestampType for either physical variant") {
    import org.apache.spark.sql.types.TimestampType
    val events = Tables.load(spark, dir, "events")
    assert(events.schema("ts").dataType == TimestampType)
    // and the values are sane instants, not garbage from a misapplied
    // nanos conversion: the synthetic data lives in a recent-year window
    val yr = events.selectExpr("min(year(ts))", "max(year(ts))").head()
    assert(yr.getInt(0) >= 2000 && yr.getInt(1) <= 2100,
      s"events.ts year range [${yr.getInt(0)}, ${yr.getInt(1)}] is implausible — " +
        "loadEvents mis-adapted the fixture's physical timestamp type")
  }

  test("schemaViolations names the column when a contract is broken") {
    // negative check: a fixture written with a renamed column must surface
    // that column by name (write a tiny drifted 'region' to a temp dir)
    val tmp = java.nio.file.Files.createTempDirectory("drift").toString
    spark.sql("SELECT 1 AS r_regionkey, 'x' AS r_wrong")
      .write.mode("overwrite").parquet(s"$tmp/region.parquet")
    Tables.all.filterNot(_ == "region").foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet")
        .write.mode("overwrite").parquet(s"$tmp/$t.parquet")
    }
    val violations = Tables.schemaViolations(spark, tmp)
    assert(violations.exists(v => v.contains("r_name") && v.contains("missing")))
    assert(violations.exists(v => v.contains("r_wrong") && v.contains("unexpected")))
  }
}
