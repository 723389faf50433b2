package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** KLL-style mergeable quantile sketch buffer (Karnin-Lang-Liberty,
  * FOCS'16 — public literature; this is the standard simplified
  * uniform-capacity variant): level i holds values of weight 2^i; when
  * a level overflows its capacity `k`, it is sorted and every other
  * element (alternating offset) promotes to level i+1. Total state is
  * O(k log(n/k)) doubles; rank error is O(1/k) of n.
  *
  * Level 0 is kept UNSORTED on insert (O(1) amortized append); every
  * level is sorted at compaction and at eval. The alternating-offset
  * choice is derived from the per-level compaction counter, so a
  * single-partition stream is deterministic; across partition orders
  * the sketch varies within its error bounds (the gates pin the
  * below-capacity EXACT regime, where no compaction ever happens and
  * the result is order-independent).
  */
final class KllBuffer(val k: Int) extends Serializable {
  // levels(i) = values each representing 2^i original items
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)
  val compactions: ArrayBuffer[Long] = ArrayBuffer(0L)

  def insert(v: Double): Unit = { levels(0) += v; compactLevel(0) }

  def insertWeighted(v: Double, level: Int): Unit = {
    while (levels.size <= level) { levels += ArrayBuffer.empty; compactions += 0L }
    levels(level) += v
    compactLevel(level)
  }

  private def compactLevel(i: Int): Unit = {
    if (levels(i).size > k) {
      while (levels.size <= i + 1) { levels += ArrayBuffer.empty; compactions += 0L }
      val sorted = levels(i).sorted
      val offset = (compactions(i) & 1L).toInt // alternating
      compactions(i) += 1
      var j = offset
      while (j < sorted.size) { levels(i + 1) += sorted(j); j += 2 }
      levels(i).clear()
      compactLevel(i + 1)
    }
  }

  def mergeIn(other: KllBuffer): Unit = {
    var i = 0
    while (i < other.levels.size) {
      val lv = other.levels(i)
      var j = 0
      while (j < lv.size) { insertWeighted(lv(j), i); j += 1 }
      i += 1
    }
  }

  /** (values sorted asc, matching weights) over all levels. */
  def weightedPoints(): (Array[Double], Array[Long]) = {
    val pts = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.size) {
      val w = 1L << i
      levels(i).foreach(v => pts += ((v, w)))
      i += 1
    }
    val sorted = pts.sortBy(_._1).toArray
    (sorted.map(_._1), sorted.map(_._2))
  }

  def serialize(): Array[Byte] = {
    var bytes = 8 // k + nLevels
    levels.foreach(l => bytes += 12 + 8 * l.size) // size + compactions + data
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(k); bb.putInt(levels.size)
    var i = 0
    while (i < levels.size) {
      bb.putInt(levels(i).size)
      bb.putLong(compactions(i))
      levels(i).foreach(bb.putDouble)
      i += 1
    }
    bb.array()
  }
}

object KllBuffer {
  def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new KllBuffer(bb.getInt)
    val n = bb.getInt
    b.levels.clear(); b.compactions.clear()
    var i = 0
    while (i < n) {
      val sz = bb.getInt
      b.compactions += bb.getLong
      val lv = ArrayBuffer.empty[Double]
      var j = 0
      while (j < sz) { lv += bb.getDouble; j += 1 }
      b.levels += lv
      i += 1
    }
    b
  }
}

/** Shared eval/serde of the KLL aggregates: output is
  * `struct<values: array<double>, weights: array<long>>` — the sorted
  * weighted point set, queryable by [[WeightedQuantile]] and mergeable
  * by [[KllMergeAgg]] (the persisted-cube pattern of the KMV family
  * applied to QUANTILES: per-day latency sketches, any-range p99 by
  * merging kilobytes).
  */
abstract class KllAggBase extends TypedImperativeAggregate[KllBuffer] {
  def k: Int

  override def nullable: Boolean = false
  override def dataType: DataType = KllAggBase.outType

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def merge(buf: KllBuffer, other: KllBuffer): KllBuffer = {
    buf.mergeIn(other); buf
  }

  override def eval(buf: KllBuffer): Any = {
    val (vs, ws) = buf.weightedPoints()
    InternalRow(new GenericArrayData(vs), new GenericArrayData(ws))
  }

  override def serialize(buf: KllBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuffer =
    KllBuffer.deserialize(bytes)
}

object KllAggBase {
  val outType: StructType = StructType(Seq(
    StructField("values", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("weights", ArrayType(LongType, containsNull = false),
      nullable = false)))
}

/** Aggregate a DoubleType column into a KLL quantile sketch. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  require(k >= 8 && k <= 65536, "kll k must be in [8, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch expects a DoubleType input (cast first), got " +
      s"${child.dataType.catalogString}")
  override def prettyName: String = "kll_sketch"

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge PERSISTED KLL sketches (the struct produced by
  * [[KllSketchAgg]], e.g. read back from parquet) into one sketch —
  * weights re-enter at their original levels (weight 2^i -> level i),
  * so merged error bounds match a direct sketch's.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  require(k >= 8 && k <= 65536, "kll k must be in [8, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 2 &&
      s(0).dataType.isInstanceOf[ArrayType] &&
      s(1).dataType.isInstanceOf[ArrayType] => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_merge expects struct<values:array<double>,weights:array<long>>, " +
      s"got ${other.catalogString}")
  }
  override def prettyName: String = "kll_merge"

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      val vs = row.getArray(0)
      val ws = row.getArray(1)
      var i = 0
      val n = vs.numElements()
      while (i < n) {
        val w = ws.getLong(i)
        // weight 2^level -> level (weights are always powers of two)
        val level = java.lang.Long.numberOfTrailingZeros(w)
        buf.insertWeighted(vs.getDouble(i), level)
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Column API for the KLL quantile sketch family. */
object Kll {
  import kernels.{toCol, toExpr}

  def sketch(valueCol: Column, k: Int = 256): Column =
    toCol(KllSketchAgg(toExpr(valueCol), k).toAggregateExpression())

  def merge(sketchCol: Column, k: Int = 256): Column =
    toCol(KllMergeAgg(toExpr(sketchCol), k).toAggregateExpression())

  /** Quantile estimate from the sketch struct: the value whose
    * cumulative weight first reaches q x totalWeight (lower weighted
    * quantile — in the exact regime this matches SQL
    * `quantile_disc`/`percentile(..., q)` lower-rank semantics). */
  def quantile(sk: Column, q: Double): Column =
    toCol(WeightedQuantile(toExpr(sk), q))
}
