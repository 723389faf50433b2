package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF (SURVEY.md §2.9's Aggregator row): exact weighted average
  * `sum(value*weight)/sum(weight)`, accumulating in BigDecimal at scale 6
  * so partial-aggregation ORDER cannot perturb the result — the
  * Aggregator twin of the `decSum`/`decAvg` determinism contract. Inputs
  * round like Spark's double->DECIMAL(38,6) cast (string-derived
  * BigDecimal, HALF_UP), so the DuckDB oracle
  * `CAST(SUM(CAST(v AS DECIMAL(38,6)) * CAST(w AS DECIMAL(38,6)))
  *  / SUM(CAST(w AS DECIMAL(38,6))) ...` reproduces it bit-for-bit.
  */
object WeightedAvg
    extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {

  private def dec6(d: Double): BigDecimal =
    BigDecimal.decimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)

  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))

  override def reduce(b: (BigDecimal, BigDecimal),
                      a: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + dec6(a._1) * dec6(a._2), b._2 + dec6(a._2))

  override def merge(x: (BigDecimal, BigDecimal),
                     y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)

  override def finish(b: (BigDecimal, BigDecimal)): Double =
    if (b._2.signum == 0) 0.0
    else (b._1(java.math.MathContext.DECIMAL128) / b._2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** Column form: `wavg(value, weight)`. */
  def apply(value: Column, weight: Column): Column =
    udaf(this, Encoders.product[(Double, Double)]).apply(value, weight)
}
