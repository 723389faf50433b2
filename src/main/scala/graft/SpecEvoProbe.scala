package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Partition-spec evolution at SCALE: what a spec change costs on a
  * table whose rewrite is genuinely expensive, and what the mixed-spec
  * read/merge paths pay afterwards. orders sf0.1 exploded x40 (~6M
  * rows) seeded under [o_year] (7 partitions), then:
  *
  *  1. `changeManifestPartitionSpec` -> [o_band] (metadata-only) —
  *     wall time vs `repartitionManifest` (the honest O(table)
  *     rewrite it replaces);
  *  2. mixed-era full read vs the pre-change read (union tax);
  *  3. per-era pruned reads (old-spec predicate / new-spec predicate)
  *     through manifestTable;
  *  4. a migration-on-touch merge (one old-era partition folds into
  *     the new spec) vs a plain same-spec merge of the same row count;
  *  5. the migration finisher (repartitionManifest to the current
  *     spec) as the deferred one-time cost.
  *
  * Run: `sbt "runMain graft.SpecEvoProbe [explode]"`. Numbers land in
  * NOTES.md.
  */
object SpecEvoProbe {
  private def timed[T](tag: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[specevo] $tag%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val explode = args.headOption.map(_.toInt).getOrElse(40)
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Layout
    val base = java.nio.file.Files.createTempDirectory("graft_specevo")
    val dir = base.resolve("t").toString
    val dirRw = base.resolve("t_rw").toString
    val orders = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    val rows = orders.crossJoin(
        spark.range(explode).select(col("id").as("__rep")))
      .select((col("o_orderkey") * explode + col("__rep")).as("k"),
        year(col("o_orderdate")).as("o_year"),
        pmod(col("o_orderkey") + col("__rep"), lit(16)).as("o_band"),
        col("o_totalprice").as("price"), lit(1L).as("ver"))
    val n = rows.count()
    println(s"[specevo] rows=$n explode=$explode")
    timed("seed under [o_year]")(
      Layout.writeManifestTable(spark, dir, rows, Seq("o_year"),
        keys = Seq("k"), versionCol = Some("ver")))
    timed("baseline single-spec full read")(
      Layout.readManifest(spark, dir).count())
    // the O(table) alternative, measured on an identical twin
    timed("seed twin")(
      Layout.writeManifestTable(spark, dirRw, rows, Seq("o_year"),
        keys = Seq("k"), versionCol = Some("ver")))
    timed("repartitionManifest [o_year]->[o_band] (O(table))")(
      Layout.repartitionManifest(spark, dirRw, Seq("o_band")))
    // the metadata-only change
    timed("changeManifestPartitionSpec (metadata-only)")(
      Layout.changeManifestPartitionSpec(spark, dir, Seq("o_band")))
    timed("mixed-era full read (all old-era)")(
      Layout.readManifest(spark, dir).count())
    // new-era growth: fresh keys land under o_band. Their OLD-spec
    // column values are out of the old era's range — a fresh batch
    // whose o_year values MATCH existing old-era partitions would
    // migrate those partitions wholesale (the merge cannot know the
    // keys are fresh without reading them; measured: such a batch
    // migrated the whole 6M-row old era in 5.2 s — the documented
    // migrate-on-touch contract)
    val fresh = rows.filter(pmod(col("k"), lit(37)) === 0)
      .withColumn("k", col("k") + 100000000L)
      .withColumn("o_year", col("o_year") + 1000)
      .withColumn("ver", lit(2L))
    timed(s"new-era merge (${fresh.count()} fresh rows)")(
      Layout.mergeManifest(spark, dir, fresh, Seq("k"), "ver"))
    timed("mixed-era full read (7 old + 16 new rels)")(
      Layout.readManifest(spark, dir).count())
    // pruned reads through the per-era planner union
    val minYear = rows.agg(min("o_year")).head().getInt(0)
    timed("manifestTable filter OLD-spec col (one year)") {
      val f = Layout.manifestTable(spark, dir)
        .filter(col("o_year") === minYear); f.count()
    }
    timed("manifestTable filter NEW-spec col (one band)") {
      val f = Layout.manifestTable(spark, dir)
        .filter(col("o_band") === 3L); f.count()
    }
    // migration on touch: update every row of ONE old-era year
    val touch = rows.filter(col("o_year") === minYear)
      .withColumn("price", col("price") + 1).withColumn("ver", lit(3L))
    timed(s"migrating merge (touch o_year=$minYear, " +
        s"${touch.count()} rows)")(
      Layout.mergeManifest(spark, dir, touch, Seq("k"), "ver"))
    // same-row-count merge on the already-uniform twin for comparison
    val touchRw = touch.withColumn("ver", lit(2L))
    timed("same-size merge on the single-spec twin")(
      Layout.mergeManifest(spark, dirRw, touchRw, Seq("k"), "ver"))
    // the BUDGETED finisher: drain the remaining old-era partitions 2
    // per run (the maintenance shape) — per-run cost must track the
    // budget's share of the table, not the table; content must be
    // byte-stable across runs; convergence clears specHistory
    val preDrain = Layout.readManifest(spark, dir).count()
    var run = 0
    while (Layout.readManifestMeta(spark, dir,
        Layout.manifestVersion(spark, dir).get).oldEraRels.nonEmpty) {
      run += 1
      val migrated = timed(s"migrateManifestPartitions budget=2 run $run")(
        Layout.migrateManifestPartitions(spark, dir, 2))
      println(s"[specevo]   migrated: ${migrated.mkString(", ")}")
    }
    require(Layout.readManifest(spark, dir).count() == preDrain,
      "budgeted drain must be row-identical")
    require(Layout.readManifestMeta(spark, dir,
        Layout.manifestVersion(spark, dir).get).specHistory.isEmpty,
      "drain must clear specHistory at convergence")
    // the one-shot alternative on what WOULD have been the same table
    // is the twin's repartition above — compare per-run vs one-shot
    timed("post-drain full read")(
      Layout.readManifest(spark, dir).count())
    spark.stop()
  }
}
