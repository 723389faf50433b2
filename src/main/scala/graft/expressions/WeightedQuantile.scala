package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Lower weighted quantile over a KLL sketch struct
  * (`struct<values:array<double> sorted asc, weights:array<long>>`):
  * the first value whose cumulative weight reaches `ceil(q x W)`.
  * In the sketch's exact regime (no compaction, all weights 1) this is
  * the classic discrete lower quantile. One pass over the (k log n)-
  * sized array per call; codegen'd via the reference-object kernel
  * pattern (BucketIndex precedent).
  */
case class WeightedQuantile(child: Expression, q: Double)
    extends UnaryExpression {

  require(q >= 0.0 && q <= 1.0, "quantile q must be in [0, 1]")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "weighted_quantile"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 2 &&
      s(0).dataType.isInstanceOf[ArrayType] &&
      s(1).dataType.isInstanceOf[ArrayType] => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"weighted_quantile expects a KLL sketch struct, got ${other.catalogString}")
  }

  def compute(row: InternalRow): Double = {
    val vs = row.getArray(0)
    val ws = row.getArray(1)
    val n = vs.numElements()
    if (n == 0) return Double.NaN
    var total = 0L
    var i = 0
    while (i < n) { total += ws.getLong(i); i += 1 }
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    i = 0
    while (i < n) {
      cum += ws.getLong(i)
      if (cum >= target) return vs.getDouble(i)
      i += 1
    }
    vs.getDouble(n - 1)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) Double.NaN else compute(v.asInstanceOf[InternalRow])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wqExpr", this, classOf[WeightedQuantile].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        double ${ev.value} = ${c.isNull} ? Double.NaN :
          $ref.compute((org.apache.spark.sql.catalyst.InternalRow) ${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
