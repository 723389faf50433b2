package graft.expressions

import java.util.Arrays

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Bigram-LM fit scoring against a driver-embedded model: one pass over
  * the document's hashed grams with a BINARY SEARCH per gram over the
  * sorted model keys — O(grams · log |model|) per row, vs the map
  * literal's `GetMapValue` linear scan (O(grams · |model|); measured 6x
  * slower on the gate corpus). The model arrays ship with the serialized
  * plan, the broadcast-variable pattern without the ceremony (same as
  * [[NearestCentroids]]). Output is one struct so the three counters
  * come from a single pass.
  */
case class LmFitScore(child: Expression,
                      keys: Array[Long],
                      counts: Array[Long])
    extends UnaryExpression {
  require(keys.length == counts.length, "keys/counts must align")

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_hits", LongType, nullable = false),
    StructField("sum_model_count", LongType, nullable = false)))
  override def prettyName: String = "lm_fit_score"

  def compute(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    var hits = 0L
    var sum = 0L
    var i = 0
    while (i < n) {
      val idx = Arrays.binarySearch(keys, arr.getLong(i))
      if (idx >= 0) { hits += 1; sum += counts(idx) }
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, hits, sum))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lmExpr", this, classOf[LmFitScore].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // model arrays are excluded from case-class equality semantics
  override def equals(o: Any): Boolean = o match {
    case other: LmFitScore =>
      child == other.child && keys.sameElements(other.keys) &&
        counts.sameElements(other.counts)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + keys.length
}
