package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Ivm

/** Measures what incremental view maintenance buys over recompute
  * (round-11 addition): maintain the (user_id, event_type) rollup of
  * the events table across K delta batches two ways —
  *
  *  1. IVM: `Ivm.applyDelta` per batch (delta partials + summary
  *     union + one keyed shuffle of |summary| + |delta|);
  *  2. recompute: re-aggregate the full accumulated base per batch
  *     and rewrite the summary (what the reference's scheduled
  *     INSERT-SELECT refresh does).
  *
  * The interesting number is the per-batch cost RATIO as the
  * accumulated base grows: IVM's per-batch cost is flat in base size
  * (it never reads the base), recompute's grows linearly — at 100 TB
  * the recompute path is a full-table scan per refresh.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.IvmProbe"
  */
object IvmProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").appName("ivm-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_IVM_REP", "32").toInt
    val k = 4
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("user_id"), col("event_type"), col("value"),
        pmod(xxhash64(col("user_id"), col("event_type"), col("ts"),
          col("value")), lit(k)).as("__slice"))
      .cache()
    // big ACCUMULATED base (x rep), small fixed-size deltas (1/k of the
    // raw table): the production shape — a refresh folds a day into
    // months of history
    val seed = ev.crossJoin(spark.range(rep).toDF("__r")).drop("__r")
    val n = ev.count()
    println(s"base rows: ${n * rep} (events x $rep), " +
      s"delta rows: ~${n / k} x $k batches")

    val ivmDir = Files.createTempDirectory("probe_ivm").resolve("s").toString
    val rcRoot = Files.createTempDirectory("probe_rc").toString
    val (_, tSeedIvm) = time {
      Ivm.applyDelta(spark, ivmDir, seed.drop("__slice"),
        Seq("user_id", "event_type"), Seq("value"), batchId = 0)
    }
    val (_, tSeedRc) = time {
      seed.drop("__slice").write.parquet(s"$rcRoot/base")
    }
    println(f"seed fold: ivm ${tSeedIvm}%.2f s, base write ${tSeedRc}%.2f s")

    var tIvm = List.empty[Double]
    var tRc = List.empty[Double]
    for (b <- 0 until k) {
      val delta = ev.filter(col("__slice") === b)
      val (_, ti) = time {
        Ivm.applyDelta(spark, ivmDir, delta,
          Seq("user_id", "event_type"), Seq("value"), batchId = b + 1)
      }
      tIvm ::= ti
      // recompute posture (the reference's scheduled INSERT-SELECT
      // refresh): append the delta to the base, re-aggregate the WHOLE
      // base, rewrite the summary
      val (_, tr) = time {
        delta.drop("__slice").write.mode("append").parquet(s"$rcRoot/base")
        spark.read.parquet(s"$rcRoot/base")
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n_rows"),
            sum(col("value").cast("decimal(38,6)")).as("sum_value"))
          .write.mode("overwrite").parquet(s"$rcRoot/summary")
      }
      tRc ::= tr
      println(f"delta $b%d: ivm ${ti}%.2f s, recompute ${tr}%.2f s " +
        f"(x${tr / ti}%.1f)")
    }
    println(f"per-delta totals over $k%d batches: ivm ${tIvm.sum}%.2f s, " +
      f"recompute ${tRc.sum}%.2f s (x${tRc.sum / tIvm.sum}%.1f); " +
      "ivm cost is flat in base size (it never reads the base), " +
      "recompute's is linear")

    // correctness cross-check: the fold must agree with the one-shot
    // aggregate over everything
    val all = seed.unionByName(ev).drop("__slice")
    val oneShot = all.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("value").cast("decimal(38,6)")).as("sum_value"))
    val ivmRes = Ivm.read(spark, ivmDir)
    val diff = oneShot.exceptAll(ivmRes.select("user_id", "event_type",
      "n_rows", "sum_value")).count()
    println(s"ivm vs one-shot exceptAll: $diff (must be 0)")
    spark.stop()
  }
}
