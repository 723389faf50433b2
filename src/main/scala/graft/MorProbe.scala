package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measures merge-on-read's cost shape against copy-on-write for the
  * workload it exists for: SMALL batches SCATTERED across MANY
  * partitions (continuous CDC trickle). Questions —
  *
  *  1. apply cost: mergeManifestDelta vs mergeManifest when the batch
  *     touches every partition (copy-on-write must rewrite all of
  *     them; merge-on-read writes only the batch);
  *  2. read tax: resolved read with pending deltas (1 and 5 batches
  *     deep) vs the folded read;
  *  3. fold cost: one foldManifestDeltas catching up 5 batches.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.MorProbe"
  */
object MorProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").appName("mor-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // 20x-replicated orders (unique keys) so partitions hold real data
    // volume relative to the per-partition fixed costs — the regime
    // the two strategies actually differ in
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .crossJoin(broadcast(spark.range(20).toDF("rep")))
      .withColumn("o_orderkey", col("o_orderkey") * 32 + col("rep"))
      .drop("rep")
      .withColumn("part", pmod(col("o_orderkey"), lit(200)))
      .select(col("o_orderkey"), col("part"), col("o_totalprice"),
        lit(1L).as("ver"))

    val cowDir = Files.createTempDirectory("probe_cow").resolve("t").toString
    val morDir = Files.createTempDirectory("probe_mor").resolve("t").toString
    Layout.writeManifestTable(spark, cowDir, orders, Seq("part"))
    Layout.writeManifestTable(spark, morDir, orders, Seq("part"))

    // a ~0.5%-of-rows batch scattered across ALL 200 partitions — the
    // trickle-CDC shape: copy-on-write's touched set is the whole table
    def scattered(v: Long) = orders
      .filter(pmod(xxhash64(col("o_orderkey"), lit(v)), lit(200)) === 0)
      .select(col("o_orderkey"), col("part"),
        (col("o_totalprice") + v).as("o_totalprice"), lit(v + 1).as("ver"))

    val b1 = scattered(1)
    val nBatch = b1.count()
    val (_, tCow) = time(Layout.mergeManifest(spark, cowDir, b1,
      Seq("o_orderkey"), "ver"))
    val (_, tMor) = time(Layout.mergeManifestDelta(spark, morDir, b1,
      Seq("o_orderkey"), "ver"))

    val (n1, tRead1) = time(Layout.readManifest(spark, morDir).count())
    // 4 more delta batches, then the 5-deep read
    val (_, tMor4) = time((2L to 5L).foreach(v =>
      Layout.mergeManifestDelta(spark, morDir, scattered(v),
        Seq("o_orderkey"), "ver")))
    val (n5, tRead5) = time(Layout.readManifest(spark, morDir).count())
    val (folded, tFold) = time(Layout.foldManifestDeltas(spark, morDir))
    val (nF, tReadF) = time(Layout.readManifest(spark, morDir).count())
    val (nC, tReadC) = time(Layout.readManifest(spark, cowDir).count())
    require(n1 == nF && n5 == nF && nF == nC,
      s"row drift: $n1 / $n5 / $nF / $nC")

    println(f"[probe] partitions=200 batchRows=$nBatch%d tableRows=$nF%d")
    println(f"[probe] merge 1 scattered batch: cow=$tCow%.2f s  mor=$tMor%.2f s")
    println(f"[probe] mor batches 2..5 total=$tMor4%.2f s (${tMor4 / 4}%.2f s each)")
    println(f"[probe] read: 1 delta deep=$tRead1%.2f s  5 deep=$tRead5%.2f s  " +
      f"folded=$tReadF%.2f s  cow=$tReadC%.2f s")
    println(f"[probe] fold(5 batches, ${folded.length}%d partitions)=$tFold%.2f s")
    spark.stop()
  }
}
