package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** One-off CONCURRENCY STRESS probe (round-13 item: the m73 gate
  * proves 2 threads x 4 publishes; a real deployment is N writers
  * trickling while maintenance folds — livelock/starvation cannot show
  * at 2 threads). Runs W concurrent delta writers x B batches each
  * (disjoint key slices so the final table is checkable) against a
  * continuous fold+compact maintenance loop, then the same publishes
  * sequentially, and reports:
  *
  *  - wall time concurrent vs sequential
  *  - optimistic-commit conflict retries (Layout.commitConflicts) and
  *    per-writer max lock-wait failures (starvation signal: a writer
  *    that cannot commit while maintenance churns)
  *  - row-exactness of the final snapshot (the correctness floor)
  *
  * Findings recorded in NOTES.md. Run:
  * `sbt "runMain graft.ConcStressProbe"` (SPARK_GRAFT_PROBE_WRITERS /
  * _BATCHES to size; defaults 6 x 16 ≈ 100 publishes).
  */
object ConcStressProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val writers = sys.env.getOrElse("SPARK_GRAFT_PROBE_WRITERS", "6").toInt
    val batches = sys.env.getOrElse("SPARK_GRAFT_PROBE_BATCHES", "16").toInt
    val parts = 64
    val seedRows = 200000L
    val batchRows = 500
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files
      .createTempDirectory("graft_concstress").toString

    def seed(dir: String): Unit = {
      Layout.writeManifestTable(spark, dir,
        spark.range(seedRows).select(col("id").as("k"),
          pmod(col("id"), lit(parts)).as("band"),
          (col("id") * 1.0).as("v"), lit(1L).as("ver")),
        Seq("band"), statsCols = Seq("k"),
        keys = Seq("k"), versionCol = Some("ver"))
    }
    // writer w's batch b: a disjoint fresh key slice scattered over
    // every partition (the trickle-CDC shape)
    def batch(w: Int, b: Int) =
      spark.range(batchRows).select(
        (col("id") + seedRows + (w.toLong * batches + b) * batchRows)
          .as("k"),
        pmod(col("id"), lit(parts)).as("band"),
        lit(1.0).as("v"), lit(2L).as("ver"))

    val expected = seedRows + writers.toLong * batches * batchRows

    // ---- concurrent run: W writers + a maintenance loop ----
    val dirC = s"$root/conc"
    seed(dirC)
    Layout.commitConflicts.set(0)
    val start = new CountDownLatch(1)
    val writersDone = new CountDownLatch(writers)
    @volatile var failure: Throwable = null
    @volatile var lockFailures = 0
    val pool = Executors.newFixedThreadPool(writers + 1)
    (0 until writers).foreach { w =>
      pool.submit(new Runnable { def run(): Unit = {
        try {
          start.await()
          (0 until batches).foreach { b =>
            var landed = false
            while (!landed) {
              try { Layout.mergeManifestDelta(spark, dirC, batch(w, b),
                Seq("k"), "ver"); landed = true }
              catch { case e: IllegalStateException
                  if e.getMessage.contains("maintenance writer") =>
                // commit queued behind a long lease: count + retry
                lockFailures += 1
              }
            }
          }
        } catch { case t: Throwable => failure = t }
        finally writersDone.countDown()
      }})
    }
    @volatile var maintRounds = 0
    pool.submit(new Runnable { def run(): Unit = {
      try {
        start.await()
        while (writersDone.getCount > 0) {
          Layout.foldManifestDeltas(spark, dirC)
          Layout.compactManifest(spark, dirC, maxFiles = 4)
          maintRounds += 1
        }
        // final catch-up so the read below is fold-complete
        Layout.foldManifestDeltas(spark, dirC); ()
      } catch { case t: Throwable => failure = t }
    }})
    val t0 = System.nanoTime()
    start.countDown()
    pool.shutdown()
    require(pool.awaitTermination(30, TimeUnit.MINUTES), "stress hung")
    if (failure != null) throw failure
    val concSec = (System.nanoTime() - t0) / 1e9
    val gotC = Layout.readManifest(spark, dirC).count()
    val conflicts = Layout.commitConflicts.get()
    println(f"[concstress] concurrent: ${writers}w x ${batches}b " +
      f"$concSec%8.1f s  rows=$gotC/$expected  " +
      s"conflictRetries=$conflicts lockWaitFailures=$lockFailures " +
      s"maintRounds=$maintRounds " +
      s"liveVersion=${Layout.manifestVersion(spark, dirC).get}")
    require(gotC == expected,
      s"concurrent run lost rows: $gotC vs $expected")

    // ---- sequential baseline: same publishes + same maintenance ----
    val dirS = s"$root/seq"
    seed(dirS)
    val t1 = System.nanoTime()
    (0 until writers).foreach { w =>
      (0 until batches).foreach { b =>
        Layout.mergeManifestDelta(spark, dirS, batch(w, b), Seq("k"), "ver")
        ()
      }
    }
    (0 until maintRounds.max(1)).foreach { _ =>
      Layout.foldManifestDeltas(spark, dirS)
      Layout.compactManifest(spark, dirS, maxFiles = 4); ()
    }
    val seqSec = (System.nanoTime() - t1) / 1e9
    val gotS = Layout.readManifest(spark, dirS).count()
    require(gotS == expected,
      s"sequential run lost rows: $gotS vs $expected")
    println(f"[concstress] sequential: same work $seqSec%8.1f s " +
      f"(concurrent = ${concSec / seqSec}%.2fx)")
    // hash-exactness: both orders produce the same table
    val sumC = Layout.readManifest(spark, dirC)
      .agg(sum(col("k")), sum(col("v"))).head()
    val sumS = Layout.readManifest(spark, dirS)
      .agg(sum(col("k")), sum(col("v"))).head()
    require(sumC == sumS, s"snapshots diverged: $sumC vs $sumS")
    println("[concstress] snapshots identical; done")
  }
}
