package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** One-off probe of MANIFEST METADATA at the ≥100k-live-file regime
  * (round-13 watch item: per-file min/max stats now ride every
  * publish, and at 100 TB — 10⁵–10⁶ live files — the JSON text
  * manifest is the next metadata wall; Iceberg moved to Avro
  * manifests in exactly this regime). Measures, for a FLAT manifest
  * and a HIERARCHICAL one (manifestBuckets=64, the m54 machinery that
  * shards per-rel state — file stats included — into content-addressed
  * children):
  *
  *  - seed publish wall + root/shard bytes at ~100k files
  *  - full meta parse latency (readManifestMeta — what every commit
  *    and every live-index advance pays) + approx retained heap
  *  - a SMALL delta merge's publish wall at that file count (the
  *    trickle-CDC unit of work: rewrite cost must track the batch,
  *    not the standing file population)
  *  - planner-integrated read: pruned key-window latency + files
  *    scanned vs total
  *
  * Findings recorded in NOTES.md. Run:
  * `sbt "runMain graft.MetaScaleProbe"` (SPARK_GRAFT_PROBE_FILES to
  * size; default ~100k).
  */
object MetaScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val targetFiles =
      sys.env.getOrElse("SPARK_GRAFT_PROBE_FILES", "100000").toInt
    val parts = 500
    val filesPerPart = math.max(1, targetFiles / parts)
    val rowsPerFile = 10L
    val rows = parts.toLong * filesPerPart * rowsPerFile
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files
      .createTempDirectory("graft_metascale").toString

    def bytesOf(dir: String): Long = {
      val fs = new java.io.File(dir).listFiles()
      if (fs == null) 0L
      else fs.filter(f => f.getName.startsWith("_MANIFEST.v") ||
        f.getName.startsWith("_MBUCKET.")).map(_.length()).sum
    }
    def time[T](name: String)(body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[metascale] $name%-40s $sec%8.2f s")
      (r, sec)
    }

    Seq(("flat", 0), ("bucketed64", 64)).foreach { case (tag, buckets) =>
      val dir = s"$root/$tag"
      val base = spark.range(rows).select(col("id").as("k"),
        pmod(col("id"), lit(parts)).as("band"),
        (col("id") % 997 * 1.0).as("v"), lit(1L).as("ver"))
      val mrKey = "spark.sql.files.maxRecordsPerFile"
      spark.conf.set(mrKey, rowsPerFile.toString)
      try time(s"$tag seed ${rows}r -> ~${targetFiles} files") {
        Layout.writeManifestTable(spark, dir, base, Seq("band"),
          statsCols = Seq("k"), manifestBuckets = buckets,
          keys = Seq("k"), versionCol = Some("ver"))
      } finally spark.conf.set(mrKey, "0")
      val files = Layout.manifestTable(spark, dir).inputFiles.length
      println(s"[metascale] $tag live files: $files, metadata bytes: " +
        s"${bytesOf(dir)}")
      // meta parse latency + approx retained heap of the parsed meta
      System.gc(); Thread.sleep(200)
      val h0 = Runtime.getRuntime.totalMemory -
        Runtime.getRuntime.freeMemory
      val (m, _) = time(s"$tag readManifestMeta (full parse)") {
        Layout.readManifestMeta(spark, dir,
          Layout.manifestVersion(spark, dir).get)
      }
      System.gc(); Thread.sleep(200)
      val h1 = Runtime.getRuntime.totalMemory -
        Runtime.getRuntime.freeMemory
      println(f"[metascale] $tag meta heap ~ ${(h1 - h0) / 1e6}%.1f MB " +
        s"(fileStats rels=${m.fileStats.size})")
      // trickle-CDC unit of work at this file population — ONE
      // partition touched (the realistic trickle shape; a batch
      // scattered over every partition touches every metadata shard
      // and defeats the hierarchical win by construction)
      val preBytes = bytesOf(dir)
      time(s"$tag single-partition delta merge (100 rows)") {
        Layout.mergeManifestDelta(spark, dir,
          spark.range(100).select((col("id") + rows).as("k"),
            lit(7L).as("band"),
            lit(1.0).as("v"), lit(2L).as("ver")),
          Seq("k"), "ver")
      }
      println(s"[metascale] $tag metadata bytes WRITTEN by that " +
        s"publish: ${bytesOf(dir) - preBytes}")
      time(s"$tag fold (re-tighten)") {
        Layout.foldManifestDeltas(spark, dir)
      }
      // planner path: live-index construction + pruned key window
      val (_, _) = time(s"$tag manifestTable mount") {
        Layout.manifestTable(spark, dir)
      }
      val t = Layout.manifestTable(spark, dir)
      val keyMax = rows / 64
      time(s"$tag pruned key-window count") {
        t.filter(col("k") <= keyMax).count()
      }
      val q = Layout.manifestTable(spark, dir)
        .filter(col("k") <= keyMax)
      q.collect()
      println(s"[metascale] $tag scanned=" +
        s"${PlanScan.scannedFiles(q)} of $files files")
    }
    println("[metascale] done")
  }
}
