package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Membership probe against a BROADCAST string set — the big-vocabulary
  * twin of [[BloomMightContain]]'s plan-embedded-summary pattern. Where
  * the bloom filter ships its (small, fixed-size) bytes inside the
  * expression, a calibrated vocabulary can reach multi-MB (the
  * boilerplate-line set's documented 100k cap): embedding it as a
  * literal would serialize it into every plan copy — per task on the
  * non-codegen path, per micro-batch on a stream — and balloon codegen
  * input. Here the expression carries only the torrent-broadcast
  * HANDLE (a few-hundred-byte stub); executors fetch the set once via
  * the broadcast machinery and every task on the executor shares it.
  * The probe itself is codegen'd (one HashSet.contains per value), so
  * it composes inside higher-order functions without leaving
  * whole-stage codegen.
  *
  * Exact membership, not probabilistic: this backs FILTERS whose
  * semantics are exact (drop exactly the calibrated lines), where a
  * bloom false positive would change answers, not just shuffle sizes.
  */
case class BroadcastSetContains(
    child: Expression,
    bc: Broadcast[java.util.HashSet[UTF8String]])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "broadcast_set_contains"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"broadcast_set_contains expects a StringType value, got " +
        s"${child.dataType.catalogString}")

  @transient private lazy val set: java.util.HashSet[UTF8String] = bc.value

  def contains(v: UTF8String): Boolean = set.contains(v)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    // null values are never members (matches IN / join-key semantics)
    if (v == null) false else contains(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bcSetExpr", this,
      classOf[BroadcastSetContains].getName)
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        boolean ${ev.value} = !${c.isNull} && $ref.contains(${c.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BroadcastSetContains {

  /** Broadcast `values` on `spark` and return a probe function usable
    * anywhere a Column composes — including inside higher-order-function
    * lambdas (`filter(split(...), l => probe(l))`).
    */
  def probe(spark: org.apache.spark.sql.SparkSession,
            values: Seq[String]): Column => Column = {
    val set = new java.util.HashSet[UTF8String](
      math.max(16, values.size * 2))
    values.foreach(v => set.add(UTF8String.fromString(v)))
    val bc = spark.sparkContext.broadcast(set)
    (c: Column) => kernels.toCol(BroadcastSetContains(kernels.toExpr(c), bc))
  }
}
