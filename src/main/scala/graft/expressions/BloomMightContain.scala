package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized `org.apache.spark.util.sketch
  * .BloomFilter` (the public Spark sketch `df.stat.bloomFilter` builds
  * distributed via treeAggregate). The filter's BYTES ship inside the
  * expression — the plan-embedded-summary pattern (NearestCentroids'
  * centroid matrix, LmFitScore's model) — and deserialize once per
  * executor into a transient field; the probe itself is codegen'd.
  *
  * Powers `Relational.bloomSemiJoinReduce`: semi-join reduction for the
  * dim-too-big-to-broadcast regime. A false positive only means a fact
  * row travels the shuffle and dies in the real join — results are
  * EXACTLY the plain join's (the oracle-gate claim); the win is the
  * (1 - selectivity) of the fact table that never enters the exchange.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a LongType key, got " +
      s"${child.dataType.catalogString}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  def contains(v: Long): Boolean = bloom.mightContainLong(v)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    // null keys never match (semi-join semantics: null = no partner)
    if (v == null) false else contains(v.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      classOf[BloomMightContain].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = !${c.isNull} && $ref.contains(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // bloomBytes is an Array — exclude it from case-class equality semantics
  override def equals(o: Any): Boolean = o match {
    case other: BloomMightContain =>
      child == other.child && java.util.Arrays.equals(bloomBytes, other.bloomBytes)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + bloomBytes.length
}
