package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measures what the hierarchical manifest buys over the flat one at a
  * partition count where the difference matters: metadata BYTES
  * WRITTEN per publish (flat rewrites one whole JSON; hierarchical
  * writes the touched content-addressed children + a root) and
  * metadata bytes READ by a pruned query (flat parses everything;
  * hierarchical loads only rollup-matching children).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.HierProbe"
  */
object HierProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  private def metaBytes(dir: String, prefix: String): Long =
    new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith(prefix)).map(_.length()).sum

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").appName("hier-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 400 partitions keyed so partition ranges are CONTIGUOUS in the
    // stats column (the daily-partition shape: rel order = time order)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .withColumn("part", format_string("p%04d",
        floor(col("o_orderkey") / 400.0).cast("int")))
      .select(col("o_orderkey"), col("part"), col("o_totalprice"),
        lit(1L).as("ver"))

    val flatDir = Files.createTempDirectory("probe_flat").resolve("t").toString
    val hierDir = Files.createTempDirectory("probe_hier").resolve("t").toString
    Layout.writeManifestTable(spark, flatDir, orders, Seq("part"),
      statsCols = Seq("o_orderkey"))
    Layout.writeManifestTable(spark, hierDir, orders, Seq("part"),
      statsCols = Seq("o_orderkey"), manifestBuckets = 16)

    // one batch touching 5 contiguous partitions
    val batch = orders.filter(col("part") <= "p0004")
      .withColumn("o_totalprice", col("o_totalprice") + 1)
      .withColumn("ver", lit(2L))
    def publishDelta(d: String): Long = {
      val before = metaBytes(d, "_M")
      Layout.mergeManifest(spark, d, batch, Seq("o_orderkey"), "ver")
      metaBytes(d, "_M") - before
    }
    val wFlat = publishDelta(flatDir)
    val wHier = publishDelta(hierDir)

    // a narrow key-range query: pruned read over the stats
    def pruned(d: String): (Long, Double) =
      time(Layout.readManifestBetween(spark, d, "o_orderkey",
        100L, 900L).count())
    val (nF, tF) = pruned(flatDir)
    val (nH, tH) = pruned(hierDir)
    require(nF == nH, s"row mismatch: $nF vs $nH")
    val parts = Layout.readManifest(spark, hierDir)
      .inputFiles.map(_.replaceAll(".*/(part=[^/]+)/.*", "$1"))
      .distinct.length

    println(f"[probe] partitions=$parts%d buckets=16 touched=5 rows=$nF%d")
    println(f"[probe] publish metadata bytes: flat=$wFlat%d hier=$wHier%d " +
      f"(${wFlat.toDouble / wHier}%.1fx less written)")
    println(f"[probe] pruned read: flat=$tF%.2f s hier=$tH%.2f s")
    spark.stop()
  }
}
