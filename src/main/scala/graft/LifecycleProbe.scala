package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** One-off sf1-scale probe of the MANIFEST LIFECYCLE (round-13 item:
  * catch any O(partitions²) or driver-memory cliff in manifest JSON
  * handling before the driver's bench does): seed a ~1.5M-row table
  * across 500 partitions, land 50 paced CDC delta batches, fold,
  * compact, reap, then a whole-table repartition — wall-clock and
  * manifest-root bytes recorded per phase. Findings go to NOTES.md.
  *
  * Run: `sbt "runMain graft.LifecycleProbe"` (optionally
  * SPARK_GRAFT_CPUS / SPARK_GRAFT_PROBE_ROWS / _PARTS / _BATCHES).
  */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val rows = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "1500000").toLong
    val parts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS", "500").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_PROBE_BATCHES", "50").toInt
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files
      .createTempDirectory("graft_lifecycle").toString
    val dir = s"$root/t"
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      val mf = new java.io.File(dir).listFiles() match {
        case null => 0L
        case fs => fs.filter(_.getName.startsWith("_MANIFEST.v"))
          .map(_.length()).maxOption.getOrElse(0L)
      }
      println(f"[lifecycle] $name%-28s $sec%8.2f s  manifestRoot=${mf}B")
      r
    }
    val base = spark.range(rows).select(col("id").as("k"),
      pmod(col("id"), lit(parts)).as("band"),
      pmod(col("id"), lit(16)).as("b16"),
      (col("id") % 997 * 1.0).as("v"), lit(1L).as("ver"))
    time(s"seed ${rows}r x ${parts}p") {
      Layout.writeManifestTable(spark, dir, base, Seq("band"),
        statsCols = Seq("k"))
    }
    // paced CDC: each batch updates ~5k keys scattered over ~50 bands
    val perBatch = 5000L
    time(s"$batches delta batches") {
      (0 until batches).foreach { b =>
        val lo = (b * perBatch) % rows
        Layout.mergeManifestDelta(spark, dir,
          spark.range(lo, lo + perBatch).select(col("id").as("k"),
            pmod(col("id"), lit(parts)).as("band"),
            pmod(col("id"), lit(16)).as("b16"),
            lit(b * 1.0).as("v"), lit(b + 2L).as("ver")),
          Seq("k"), "ver", batchId = b)
        if ((b + 1) % 10 == 0) println(s"[lifecycle]   batch ${b + 1}")
      }
    }
    val readTax = time("read resolved (pending)") {
      Layout.readManifest(spark, dir).count()
    }
    println(s"[lifecycle]   resolved rows = $readTax")
    time("foldManifestDeltas") { Layout.foldManifestDeltas(spark, dir) }
    time("compactManifest maxFiles=1") {
      Layout.compactManifest(spark, dir, maxFiles = 1)
    }
    time("reapManifest keep=1") { Layout.reapManifest(spark, dir) }
    time("repartitionManifest band->b16") {
      Layout.repartitionManifest(spark, dir, Seq("b16"))
    }
    println("[lifecycle] done")
    spark.stop()
  }
}
