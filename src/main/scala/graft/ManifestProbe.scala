package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measures the manifest discipline's cost envelope against the
  * rename-swap partitioned merge it replaces (round-11 addition):
  * same table, same update batch, three questions —
  *
  *  1. apply cost: mergeManifest vs merge with partitionCols, batch
  *     touching a small fraction of partitions (both are partition-
  *     pruned copy-on-write; the manifest adds one JSON publish);
  *  2. read cost: readManifest vs bare partitioned read (explicit
  *     per-partition roots vs one recursive listing);
  *  3. manifest serialization: bytes and wall time of the publish at
  *     the probe's partition count (the stated O(|partitions|) term).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ManifestProbe"
  */
object ManifestProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").appName("manifest-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      // ~200 partitions from the key space, the "daily partitions over
      // seven months" shape
      .withColumn("part", pmod(col("o_orderkey"), lit(200)))
      .select(col("o_orderkey"), col("part"), col("o_totalprice"),
        lit(1L).as("ver"))

    val renameDir = Files.createTempDirectory("probe_rename").resolve("t").toString
    val manifestDir = Files.createTempDirectory("probe_manifest").resolve("t").toString
    orders.write.partitionBy("part").parquet(renameDir)
    val (_, tSeed) = time(
      Layout.writeManifestTable(spark, manifestDir, orders, Seq("part")))

    // batch touches 5 of 200 partitions
    val batch = orders.filter(col("part") < 5)
      .select(col("o_orderkey"), col("part"),
        (col("o_totalprice") + 1).as("o_totalprice"), lit(2L).as("ver"))

    val (_, tRename) = time(Layout.merge(spark, renameDir, batch,
      Seq("o_orderkey"), "ver", partitionCols = Seq("part")))
    val (_, tManifest) = time(Layout.mergeManifest(spark, manifestDir,
      batch, Seq("o_orderkey"), "ver"))

    val (nPlain, tReadPlain) = time(
      spark.read.parquet(renameDir).count())
    val (nManifest, tReadManifest) = time(
      Layout.readManifest(spark, manifestDir).count())
    require(nPlain == nManifest, s"row mismatch: $nPlain vs $nManifest")

    val mBytes = new java.io.File(manifestDir)
      .listFiles().filter(_.getName.startsWith("_MANIFEST.v"))
      .map(_.length()).max

    println(f"[probe] partitions=200 touched=5 rows=$nPlain%d")
    println(f"[probe] seed(writeManifestTable)=$tSeed%.2f s")
    println(f"[probe] merge rename-swap=$tRename%.2f s  mergeManifest=$tManifest%.2f s")
    println(f"[probe] read plain=$tReadPlain%.2f s  readManifest=$tReadManifest%.2f s")
    println(f"[probe] manifest bytes=$mBytes%d (~${mBytes / 200}%d B/partition)")
    spark.stop()
  }
}
