package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Per-GROUP bloom filter aggregate over a LongType hash column —
  * `df.stat.bloomFilter` builds ONE filter for a whole DataFrame; this
  * builds one per `groupBy` group in a single aggregation pass, which
  * is what per-partition equality data-skipping needs
  * ([[graft.operators.Layout]]'s manifest blooms: one filter per
  * partition per column, all partitions in one job).
  *
  * The buffer IS the public `org.apache.spark.util.sketch.BloomFilter`
  * (the q52 semi-join-reduction precedent): mergeable via
  * `mergeInPlace` (map-side partials combine), serialized with its own
  * `writeTo` format, probed later with `mightContainLong` on the
  * driver. Size/accuracy follow its formula: ~1.2 bytes x
  * `expectedItems` at fpp 1%. All filters built with the same
  * (expectedItems, fpp) are merge-compatible — the manifest pins both
  * table-wide so delta-merge unions never mismatch.
  *
  * Input contract: a LongType hash — compose with the codegen'd
  * `xxhash64(value.cast("string"))` so the build side and any probe
  * side hash through the same engine path (Spark's Cast rendering +
  * xxhash64), never a hand-rolled reimplementation. Null hashes (null
  * values) are skipped: an equality lookup is never null.
  */
case class BloomSketchAgg(
    child: Expression,
    expectedItems: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] {

  require(expectedItems >= 16 && expectedItems <= 100000000L,
    "bloom expectedItems must be in [16, 1e8]")
  require(fpp > 0 && fpp < 0.5, "bloom fpp must be in (0, 0.5)")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_sketch"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_sketch expects a LongType hash input (compose with " +
        s"xxhash64), got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other)
    buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    buf.writeTo(bos)
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object BloomSketch {
  import kernels.{toCol, toExpr}

  /** Aggregate a LongType hash column into serialized bloom bytes.
    * Compose as `BloomSketch.agg(xxhash64(col("k").cast("string")),
    * 10000)`. */
  def agg(hashCol: Column, expectedItems: Long,
          fpp: Double = 0.01): Column =
    toCol(BloomSketchAgg(toExpr(hashCol), expectedItems, fpp)
      .toAggregateExpression())

  /** Driver-side probe of serialized bloom bytes. */
  def mightContain(bytes: Array[Byte], hash: Long): Boolean =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
      .mightContainLong(hash)

  /** Driver-side union of two serialized blooms (delta-merge stats
    * widening: the union covers both generation sets). Both must come
    * from the same (expectedItems, fpp). */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = BloomFilter.readFrom(new java.io.ByteArrayInputStream(a))
    val fb = BloomFilter.readFrom(new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val bos = new java.io.ByteArrayOutputStream()
    fa.writeTo(bos)
    bos.toByteArray
  }
}
