package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measures dynamic partition pruning through the manifest planner
  * index at the star-join shape gate m60 pins: a fact table whose only
  * selective predicate lives on the DIMENSION side. With DPP the dim
  * filter's result prunes fact partitions at runtime; without it the
  * join scans the whole fact table. Reports wall time and the fact
  * scan's file count with `spark.sql.optimizer.dynamicPartitionPruning
  * .enabled` on vs off.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DppProbe"
  */
object DppProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").appName("dpp-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 3M-row fact across 200 partitions (the MorProbe fixture)
    val fact = spark.read.parquet(s"$dir/orders.parquet")
      .crossJoin(broadcast(spark.range(20).toDF("rep")))
      .withColumn("o_orderkey", col("o_orderkey") * 32 + col("rep"))
      .drop("rep")
      .withColumn("part", pmod(col("o_orderkey"), lit(200)))
      .select(col("o_orderkey"), col("part"), col("o_totalprice"))
    val tdir = Files.createTempDirectory("probe_dpp").resolve("t").toString
    Layout.writeManifestTable(spark, tdir, fact, Seq("part"))
    // dim: 200 rows, the filter keeps 5 partitions. MUST be a
    // file-backed relation: Spark's PartitionPruning rule only inserts
    // the runtime filter when the filtering side is a storage scan — a
    // driver-local dim never qualifies (measured; DppDebug record in
    // NOTES). Real dimension tables live in storage anyway.
    val dimDir = Files.createTempDirectory("probe_dpp_dim").toString
    spark.range(200).select(col("id").as("d_part"),
      pmod(col("id"), lit(40)).as("d_tag"))
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)

    def run(): (Long, Long, Double) = {
      val f = Layout.manifestTable(spark, tdir)
      val joined = f.join(dim.filter(col("d_tag") === 7),
        col("part") === col("d_part"))
      val (n, t) = time(joined.count())
      // count() plans its own query; re-execute via collect on a fresh
      // frame to read the scan metrics of an executed plan
      val j2 = Layout.manifestTable(spark, tdir)
        .join(dim.filter(col("d_tag") === 7), col("part") === col("d_part"))
        .select("o_orderkey")
      j2.collect()
      val files = PlanScan.scannedFiles(j2, manifestOnly = true)
      (n, files, t)
    }

    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "true")
    val (nOn, filesOn, tOn) = run()
    val (_, _, tOn2) = run() // warm second sample
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      "false")
    val (nOff, filesOff, tOff) = run()
    val (_, _, tOff2) = run()
    require(nOn == nOff, s"row drift: $nOn vs $nOff")

    println(f"[probe] fact=3M rows/200 partitions, dim filter keeps 5")
    println(f"[probe] DPP on : files=$filesOn%d  t=$tOn%.2f/$tOn2%.2f s")
    println(f"[probe] DPP off: files=$filesOff%d  t=$tOff%.2f/$tOff2%.2f s")
    spark.stop()
  }
}
