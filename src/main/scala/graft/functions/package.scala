package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level building blocks shared across the engine.
  *
  * Everything here is built from `org.apache.spark.sql.functions._` so it
  * stays inside whole-stage codegen — no UDFs in the hot path.
  */
package object functions {

  /** Deterministic, oracle-safe sum of a double column.
    *
    * Summing doubles is order-dependent, and Spark's partial aggregation
    * order is nondeterministic across partitions — two runs (or Spark vs
    * DuckDB) can differ in the last ULP. Casting each value to
    * DECIMAL(38,6) first makes the sum exact integer arithmetic, hence
    * bit-identical everywhere; the final cast back to double is a single
    * deterministic rounding. DuckDB equivalent:
    * `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)`.
    */
  def decSum(c: Column): Column =
    sum(c.cast("decimal(38,6)")).cast("double")

  /** Deterministic average: exact decimal sum / count, divided in double. */
  def decAvg(c: Column): Column =
    decSum(c) / count(c)
}
