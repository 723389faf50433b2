package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileSpec extends SparkSpec {

  test("profile: one row per column, exact counts, nulls, min/max") {
    val df = spark.range(1000).select(
      col("id"),
      when(col("id") % 10 === 0, lit(null)).otherwise(col("id") % 7)
        .as("mod7_nullable"),
      concat(lit("v"), col("id") % 3).as("s"))
    val p = Profile.profile(df, Seq("id", "mod7_nullable", "s"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(p.size == 3)
    val idRow = p("id")
    assert(idRow.getLong(1) == 1000 && idRow.getLong(2) == 0)
    assert(idRow.getDouble(4) == 0.0 && idRow.getDouble(5) == 999.0)
    val m = p("mod7_nullable")
    assert(m.getLong(2) == 100) // every 10th null
    // approx distinct on 7 values is exact
    assert(m.getLong(3) == 7)
    // non-numeric column: min/max double are null, counts still real
    val s = p("s")
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getLong(3) == 3)
    // typed min/max as strings populate for EVERY column type
    assert(idRow.getString(6) == "0" && idRow.getString(7) == "999")
    assert(s.getString(6) == "v0" && s.getString(7) == "v2")
  }

  test("profile is ONE scan: a single leaf in the executed plan") {
    val df = spark.read.parquet(sf("lineitem"))
    val prof = Profile.profile(df, Seq("l_orderkey", "l_partkey", "l_quantity"))
    prof.collect()
    def leaves(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaves(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        leaves(q.plan)
      case s: org.apache.spark.sql.execution.FileSourceScanExec => 1
      case other => other.children.map(leaves).sum
    }
    assert(leaves(prof.queryExecution.executedPlan) == 1)
  }
}
