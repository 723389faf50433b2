package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_layout_$tag").resolve("t").toString

  test("compact collapses append small-files, preserves rows and layout") {
    val dir = tmpDir("compact")
    val li = spark.read.parquet(sf("lineitem"))
      .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    // 5 micro-batch appends into a partitioned layout: each drops one
    // file per task per touched partition directory
    for (b <- 0 until 5)
      li.filter(pmod(col("l_orderkey"), lit(5)) === b)
        .write.mode("append").partitionBy("l_returnflag").parquet(dir)
    // full-row sort: (orderkey, linenumber) is NOT unique across the
    // source table, so a two-column sort leaves tie order unspecified
    def allRows(p: String): Seq[String] = spark.read.parquet(p)
      .collect().map(_.mkString("|")).toSeq.sorted
    val expected = allRows(dir)
    val (before, after) = Layout.compact(spark, dir, Seq("l_returnflag"))
    assert(after < before, s"no shrink: $before -> $after")
    // one clustered task per partition value (3 return flags)
    assert(after <= 3, s"expected <=3 files, got $after")
    assert(allRows(dir) == expected)
    // partition layout preserved: a flag predicate still prunes to that
    // flag's directory (scan metrics, not inputFiles — inputFiles lists
    // the pre-pruning file index)
    val one = spark.read.parquet(dir).filter(col("l_returnflag") === "R")
    one.collect()
    val readFiles = scanFiles(one)
    assert(readFiles < after, s"read $readFiles of $after files")
  }

  test("compact without partition columns coalesces a flat directory") {
    val dir = tmpDir("flat")
    val li = spark.read.parquet(sf("lineitem")).select("l_orderkey", "l_quantity")
    for (b <- 0 until 6)
      li.filter(pmod(col("l_orderkey"), lit(6)) === b)
        .repartition(4).write.mode("append").parquet(dir)
    val n = spark.read.parquet(dir).count()
    val (before, after) = Layout.compact(spark, dir)
    assert(after < before)
    assert(spark.read.parquet(dir).count() == n)
  }

  private def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numOutputRows").value).sum
  }

  private def scanFiles(df: DataFrame): Long =
    scans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum

  test("sortedWrite clusters row groups so key predicates skip them") {
    val shuffled = tmpDir("shuffled")
    val sorted = tmpDir("sorted")
    // enough rows for multiple row groups per file at a small block
    // size would be ideal; at spec scale we still see file-level
    // min/max skipping because range partitioning gives disjoint
    // per-FILE key ranges (the same stats machinery, coarser grain)
    val ev = spark.read.parquet(sf("events"))
      .select("event_id", "user_id", "value")
    ev.repartition(8).write.mode("overwrite").parquet(shuffled) // key-shuffled
    Layout.sortedWrite(ev, sorted, Seq("user_id"), numFiles = 8)
    assert(spark.read.parquet(sorted).count() == ev.count())
    val probe = ev.select(min("user_id")).head().getLong(0)
    val pred = (p: String) => spark.read.parquet(p)
      .filter(col("user_id") === probe)
    // same answer either way
    assert(pred(sorted).count() == pred(shuffled).count())
    val rowsSorted = scanOutputRows(pred(sorted))
    val rowsShuffled = scanOutputRows(pred(shuffled))
    // a shuffled layout carries the key in every file/row-group, so its
    // scan materializes (close to) every row before the filter; the
    // sorted layout's min/max stats confine the read to the one range
    assert(rowsSorted < rowsShuffled,
      s"sorted scan read $rowsSorted rows vs shuffled $rowsShuffled")
  }
}
