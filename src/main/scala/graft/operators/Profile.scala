package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiler — the "what is in this 100 TB table" first
  * query of any ingest: per-column row count, null count, approximate
  * distinct count (HLL++, mergeable partial), and min/max, computed for
  * ALL requested columns in a SINGLE scan with map-side partial
  * aggregation and a one-row final stage (no groupBy, no expand —
  * multiple `count(distinct)` over N columns would multiply the scan by
  * N through Expand, which is exactly what a profiler must not do).
  *
  * The wide one-row aggregate is reshaped to one row per column by an
  * explode over literal structs — driver-trivial, plan-trivial.
  *
  * min/max are emitted as DOUBLE (null for non-numeric-castable types)
  * so the output schema is fixed regardless of profiled column types —
  * a profiler that changes schema per input cannot be a pipeline stage.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        approx_count_distinct(col(c), rsd).as(s"__ad_$c"),
        min(col(c)).cast("double").as(s"__mn_$c"),
        max(col(c)).cast("double").as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val packed = explode(array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__ad_$c").as("approx_distinct"),
        col(s"__mn_$c").as("min_d"),
        col(s"__mx_$c").as("max_d"))
    }: _*)).as("p")
    one.select(col("__n"), packed)
      .select(
        col("p.column").as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col("p.n_nonnull")).as("n_nulls"),
        col("p.approx_distinct").as("approx_distinct"),
        col("p.min_d").as("min_d"),
        col("p.max_d").as("max_d"))
  }
}
