package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Partition-COUNT scaling probe (round-16 verdict item 2): the m48
  * multiskip gate exercises ~500-partition publish choreography and its
  * design claims the clustered one-file-per-dir write, the bounded
  * rename pool, and the root-listing stats derivation stay bounded as
  * the partition count grows — this probe MEASURES that at 10× (and an
  * intermediate point), for the flat manifest and the hierarchical one
  * (manifestBuckets=64, the m54 machinery), recording flat-vs-linear
  * per-partition cost:
  *
  *  - seed publish wall at N partitions (one file per partition — the
  *    cost under test is choreography, not data volume) and its
  *    per-partition unit cost across N (linear total = flat unit cost;
  *    a superlinear cliff shows up as a rising unit cost)
  *  - full meta parse (readManifestMeta) wall at each N
  *  - a single-partition copy-on-write merge at each standing N — the
  *    trickle unit of work must track the BATCH, not the table
  *  - a pruned single-partition read: wall + files scanned vs total
  *
  * Findings recorded in NOTES.md. Run:
  * `sbt "runMain graft.PartScaleProbe"` (SPARK_GRAFT_PROBE_PARTS to
  * override the comma-separated partition counts; default
  * 500,2000,5000).
  */
object PartScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val counts = sys.env.getOrElse("SPARK_GRAFT_PROBE_PARTS",
      "500,2000,5000").split(",").map(_.trim.toInt).toSeq
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files
      .createTempDirectory("graft_partscale").toString

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    println("[partscale] layout      parts   seed_s  s/1k_part  meta_s " +
      " merge_s  pruned_s  scanned/total")
    Seq(("flat", 0), ("bucketed64", 64)).foreach { case (tag, buckets) =>
      counts.foreach { parts =>
        val dir = s"$root/${tag}_$parts"
        val rows = parts.toLong * 10
        val base = spark.range(rows).select(col("id").as("k"),
          format_string("p%05d", pmod(col("id"), lit(parts))).as("part"),
          (col("id") % 997 * 1.0).as("v"), lit(1L).as("ver"))
        val (_, seedS) = time {
          Layout.writeManifestTable(spark, dir, base, Seq("part"),
            statsCols = Seq("k"), manifestBuckets = buckets,
            keys = Seq("k"), versionCol = Some("ver"))
        }
        val (m, metaS) = time {
          Layout.readManifestMeta(spark, dir,
            Layout.manifestVersion(spark, dir).get)
        }
        require(m.entries.size == parts,
          s"expected $parts partitions, got ${m.entries.size}")
        // trickle unit of work: ONE partition rewritten copy-on-write
        val (_, mergeS) = time {
          Layout.mergeManifest(spark, dir,
            spark.range(5).select((col("id") + rows).as("k"),
              lit("p00007").as("part"), lit(1.0).as("v"),
              lit(2L).as("ver")),
            Seq("k"), "ver")
        }
        val total = Layout.manifestTable(spark, dir).inputFiles.length
        val q = Layout.manifestTable(spark, dir)
          .filter(col("part") === "p00042")
        val (_, prunedS) = time { q.collect() }
        val scanned = PlanScan.scannedFiles(q)
        println(f"[partscale] $tag%-10s $parts%6d ${seedS}%8.2f " +
          f"${seedS * 1000 / parts}%9.3f ${metaS}%7.3f ${mergeS}%8.2f " +
          f"${prunedS}%9.3f  $scanned%d/$total%d")
        // free the tree as we go — 5k-partition trees add up
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(new java.io.File(dir))
      }
    }
    println("[partscale] done")
    spark.stop()
  }
}
