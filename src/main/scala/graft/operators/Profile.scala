package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * Two min/max renderings keep the output schema FIXED regardless of
  * profiled column types (a profiler that changes schema per input
  * cannot be a pipeline stage):
  *  - `min_d`/`max_d` DOUBLE — populated for numeric columns only,
  *    decided from the SCHEMA (not a runtime cast, so ANSI mode cannot
  *    blow up on a non-numeric column) — the "plot an axis" view;
  *  - `min_s`/`max_s` STRING — the native typed min/max of EVERY column
  *    rendered as text (dates, strings, timestamps included) — the
  *    data-card view. Ordering is the column's own type ordering; the
  *    cast to string happens after the aggregate, on one row.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def isNumeric(c: String): Boolean =
      df.schema(c).dataType.isInstanceOf[NumericType]
    val aggs: Seq[Column] = cols.flatMap { c =>
      val mnD = if (isNumeric(c)) min(col(c)).cast("double")
                else lit(null).cast("double")
      val mxD = if (isNumeric(c)) max(col(c)).cast("double")
                else lit(null).cast("double")
      Seq(
        count(col(c)).as(s"__nn_$c"),
        approx_count_distinct(col(c), rsd).as(s"__ad_$c"),
        mnD.as(s"__mn_$c"),
        mxD.as(s"__mx_$c"),
        min(col(c)).cast("string").as(s"__mns_$c"),
        max(col(c)).cast("string").as(s"__mxs_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val packed = explode(array(cols.map { c =>
      struct(
        lit(c).as("column"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__ad_$c").as("approx_distinct"),
        col(s"__mn_$c").as("min_d"),
        col(s"__mx_$c").as("max_d"),
        col(s"__mns_$c").as("min_s"),
        col(s"__mxs_$c").as("max_s"))
    }: _*)).as("p")
    one.select(col("__n"), packed)
      .select(
        col("p.column").as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col("p.n_nonnull")).as("n_nulls"),
        col("p.approx_distinct").as("approx_distinct"),
        col("p.min_d").as("min_d"),
        col("p.max_d").as("max_d"),
        col("p.min_s").as("min_s"),
        col("p.max_s").as("max_s"))
  }
}
