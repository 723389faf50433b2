package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measures the two at-scale claims of the round-9 Layout additions on
  * replicated sf0.1 data:
  *
  *  1. merge: the partitioned copy-on-write path's cost tracks the
  *     TOUCHED partitions, not the table — vs the unpartitioned path
  *     whose rewrite scales with total table size. At 100 TB the
  *     difference is "rewrite one day" vs "rewrite the lake".
  *
  *  2. zorderWrite: scan row counts under single-dimension predicates
  *     on BOTH z columns vs a linear sort (which skips only on its
  *     leading column).
  *
  * Run: sbt "runMain graft.LayoutProbe" (SPARK_GRAFT_REPLICAS=10).
  */
object LayoutProbe {
  private def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan).map(_.metrics("numOutputRows").value).sum
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    val tmp = Files.createTempDirectory("graft_layoutprobe").toString

    // ---- merge: pruned vs full rewrite --------------------------------
    // lineitem x replicas, partitioned by ship month (~84 partitions);
    // the update batch touches exactly ONE month
    val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select(
        (col("l_orderkey") * 100 + col("l_linenumber") * 10 + col("rep"))
          .as("rid"),
        date_format(col("l_shipdate"), "yyyy-MM").as("mon"),
        col("l_quantity"), lit(1L).as("ver"))
    val partDir = s"$tmp/part"
    val flatDir = s"$tmp/flat"
    li.write.partitionBy("mon").parquet(partDir)
    li.write.parquet(flatDir)
    val total = spark.read.parquet(partDir).count()
    val batch = spark.read.parquet(partDir)
      .filter(col("mon") === "1995-06" && pmod(col("rid"), lit(10)) === 0)
      .select(col("rid"), col("mon"), (col("l_quantity") + 1).as("l_quantity"),
        lit(2L).as("ver"))
      .cache()
    val bn = batch.count()
    val (_, tPruned) = time(Layout.merge(spark, partDir, batch,
      Seq("rid"), "ver", partitionCols = Seq("mon")))
    val (_, tFull) = time(Layout.merge(spark, flatDir, batch.drop("mon")
      .join(spark.read.parquet(flatDir).select("rid", "mon").distinct(),
        "rid").select("rid", "mon", "l_quantity", "ver"),
      Seq("rid"), "ver"))
    println(f"[layoutprobe] merge ${replicas}x: table=$total%,d rows, " +
      f"batch=$bn%,d rows (1 of 84 months): pruned=$tPruned%.1fs " +
      f"full-rewrite=$tFull%.1fs")

    // ---- zorder: per-dimension skipping -------------------------------
    val zdir = s"$tmp/z"
    val ldir = s"$tmp/l"
    val src = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val (_, tz) = time(Layout.zorderWrite(src, zdir,
      Seq("l_orderkey", "l_partkey"), numFiles = 64))
    val (_, tl) = time(Layout.sortedWrite(src, ldir, Seq("l_orderkey"),
      numFiles = 64))
    val n = spark.read.parquet(zdir).count()
    val okProbe = src.select(max("l_orderkey")).head().getLong(0) / 2
    val pkProbe = src.select(max("l_partkey")).head().getLong(0) / 2
    def probe(dir: String, c: String, v: Long): Long =
      scanRows(spark.read.parquet(dir)
        .filter(col(c) >= v && col(c) <= v + 1000))
    val zOk = probe(zdir, "l_orderkey", okProbe)
    val lOk = probe(ldir, "l_orderkey", okProbe)
    val zPk = probe(zdir, "l_partkey", pkProbe)
    val lPk = probe(ldir, "l_partkey", pkProbe)
    println(f"[layoutprobe] zorder ${replicas}x ($n%,d rows, write " +
      f"z=$tz%.1fs linear=$tl%.1fs): scan rows for range predicates — " +
      f"orderkey: z=$zOk%,d linear=$lOk%,d; " +
      f"partkey: z=$zPk%,d linear=$lPk%,d (of $n%,d)")
    spark.stop()
  }
}
