package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement harness for the round-14 SQL-surface features —
  * the shapes a 100 TB deployment hits:
  *
  *  1. `MERGE … WHEN NOT MATCHED BY SOURCE` (the reconcile-to-snapshot
  *     statement) on a multi-million-row table: the full-outer
  *     classification is inherently O(table), but the PUBLISH must stay
  *     copy-on-write over the claimed partitions — measure wall time
  *     and verify the version advances exactly once.
  *  2. `TIMESTAMP AS OF` resolution over a LONG version chain: the
  *     binary search reads O(log versions) roots — measure resolution
  *     latency at 200 retained versions, against `manifest_history`'s
  *     deliberate O(versions) full listing.
  *
  * Findings go to NOTES.md (the LifecycleProbe/MetaScaleProbe
  * discipline). Run: `sbt "runMain graft.SqlSurfaceProbe"`.
  */
object SqlSurfaceProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Layout

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ---- 1. NMBS reconcile at ~12M rows -------------------------------
    val dir = java.nio.file.Files.createTempDirectory("g_ssp").toString
    val out = s"$dir/t"
    val orders = spark.read
      .parquet("/root/testdata/sf0.1/orders.parquet")
    // explode x80: ~12M rows, keys unique, years preserved
    val big = orders.crossJoin(
        spark.range(80).select(col("id").as("rep")))
      .select((col("o_orderkey") * 100 + col("rep")).as("k"),
        year(col("o_orderdate")).as("o_year"),
        col("o_totalprice").as("price"), lit(1L).as("ver"))
    timed("seed 12M rows, 7 partitions") {
      Layout.writeManifestTable(spark, out, big, Seq("o_year"),
        keys = Seq("k"), versionCol = Some("ver"))
    }
    spark.sql("DROP TABLE IF EXISTS ssp_t")
    spark.sql(s"CREATE TABLE ssp_t USING manifest OPTIONS (path '$out')")
    // the feed snapshot: half the keys, updated price
    big.filter(pmod(col("k"), lit(2)) === 0)
      .select(col("k"), col("o_year"), (col("price") + 1).as("price"))
      .createOrReplaceTempView("ssp_src")
    val v0 = Layout.manifestVersion(spark, out).get
    timed("NMBS reconcile (12M target, 6M source, 1 stmt)") {
      spark.sql("""
        MERGE INTO ssp_t t USING ssp_src c ON t.k = c.k
        WHEN MATCHED THEN UPDATE SET price = c.price,
                                     ver = CAST(2 AS BIGINT)
        WHEN NOT MATCHED THEN
          INSERT (k, o_year, price, ver)
          VALUES (c.k, c.o_year, c.price, CAST(2 AS BIGINT))
        WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    }
    require(Layout.manifestVersion(spark, out).contains(v0 + 1),
      "one statement, one publish")
    val n = timed("post-reconcile count") {
      spark.table("ssp_t").count() }
    println(s"[probe] rows after reconcile: $n (want ~6M, the source)")

    // ---- 2. timestamp resolution over a 200-version chain -------------
    val chain = s"$dir/chain"
    import spark.implicits._
    Layout.writeManifestTable(spark, chain,
      Seq((1L, "a", 1.0, 1L)).toDF("k", "part", "v", "ver"), Seq("part"))
    timed("publish 199 delta versions") {
      (2 to 200).foreach { i =>
        Layout.mergeManifestDelta(spark, chain,
          Seq((i.toLong, "a", i.toDouble, i.toLong))
            .toDF("k", "part", "v", "ver"), Seq("k"), "ver")
      }
    }
    val midTs = Layout.readManifestMeta(spark, chain, 100).publishedAtMs
    val resolved = timed("versionAtTimestamp over 200 versions") {
      Layout.versionAtTimestamp(spark, chain, midTs) }
    require(resolved == 100, s"wrong resolution: $resolved")
    timed("manifest_history over 200 versions (O(n) by design)") {
      spark.sql(s"SELECT count(*) FROM manifest_history('$chain')")
        .head().getLong(0)
    }
    spark.stop()
  }
}
