package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Equi-depth bucket index: the count of `boundaries` (sorted ascending)
  * that are <= the input — i.e. a binary-search upper-bound over the
  * broadcast-with-the-plan cut-point array. Powers `Layout.zorderWrite`:
  * the `aggregate`-HOF formulation of the same scan is interpreted and
  * measured 32x slower than a linear sort write at 6M rows; this
  * codegen'd kernel does log2(|boundaries|) comparisons per row inside
  * whole-stage codegen. Null input -> bucket 0 (curve origin), matching
  * the HOF form it replaces.
  */
case class BucketIndex(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  require(boundaries.nonEmpty, "bucket boundaries must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def prettyName: String = "bucket_index"

  def compute(v: Double): Int = {
    // upper bound: first index with boundaries(i) > v; result = index
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else compute(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bucketExpr", this, classOf[BucketIndex].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        int ${ev.value} = ${c.isNull} ? 0 : $ref.compute(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // boundaries is an Array — exclude it from case-class equality semantics
  override def equals(o: Any): Boolean = o match {
    case other: BucketIndex =>
      child == other.child && boundaries.sameElements(other.boundaries)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + boundaries.length
}
