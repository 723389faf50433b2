package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch (Metwally et al., "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams",
  * ICDT'05; merge rule per Agarwal et al., "Mergeable Summaries",
  * PODS'12 — public literature): one pass, bounded `capacity`-entry
  * state, returns per-key count bounds `[count - err, count]`.
  *
  * Guarantees (any partition/merge order):
  *  - every key with true count > N/capacity is PRESENT in the summary;
  *  - `count` is an upper bound on the true count, `count - err` a
  *    lower bound; when the input's distinct keys never exceed
  *    `capacity`, no eviction happens, err = 0 and counts are EXACT
  *    (and therefore deterministic — the regime the oracle gate pins).
  *
  * 100 TB posture: the frequency twin of [[KmvSketchAgg]] — a
  * `capacity`-bounded mergeable partial instead of a corpus-wide
  * groupBy. "Top domains / top tokens / hottest keys" over a petabyte
  * is one scan producing kilobytes per partition, merged on the driver
  * side of the final stage; the exact groupBy it replaces shuffles the
  * full key space. Also the probe half of skew handling: feed the
  * summary to salting decisions without a separate sampling pass.
  */
case class TopKeysAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]] {

  require(capacity >= 4 && capacity <= 65536,
    "top-keys capacity must be in [4, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_keys expects a string key, got ${child.dataType.catalogString}")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("count_hi", LongType, nullable = false),
    StructField("count_lo", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_keys"

  // value = Array(count, err)
  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]]()

  private def offer(buf: java.util.HashMap[String, Array[Long]],
                    key: String, cnt: Long, err: Long): Unit = {
    val cur = buf.get(key)
    if (cur != null) { cur(0) += cnt; cur(1) += err; () }
    else if (buf.size < capacity) { buf.put(key, Array(cnt, err)); () }
    else {
      // evict the min-count entry; the newcomer inherits its count as
      // error (SpaceSaving's pessimistic replacement)
      var minKey: String = null
      var minCnt = Long.MaxValue
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue()(0) < minCnt ||
            (e.getValue()(0) == minCnt &&
              (minKey == null || e.getKey < minKey))) {
          minCnt = e.getValue()(0); minKey = e.getKey
        }
      }
      buf.remove(minKey)
      buf.put(key, Array(minCnt + cnt, minCnt + err))
    }
  }

  override def update(buf: java.util.HashMap[String, Array[Long]],
                      input: InternalRow): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L, 0L)
    buf
  }

  override def merge(buf: java.util.HashMap[String, Array[Long]],
                     other: java.util.HashMap[String, Array[Long]]): java.util.HashMap[String, Array[Long]] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      offer(buf, e.getKey, e.getValue()(0), e.getValue()(1))
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Array[Long]]): Any = {
    // deterministic order: count desc, then key asc
    val entries = new Array[(String, Long, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
      i += 1
    }
    val sorted = entries.sortBy { case (k, c, _) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, c, err) =>
      InternalRow(UTF8String.fromString(k), c, c - err)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    var bytes = 4
    val it0 = buf.entrySet().iterator()
    while (it0.hasNext) {
      bytes += 4 + 16 +
        it0.next().getKey.getBytes(StandardCharsets.UTF_8).length
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(kb.length); bb.put(kb)
      bb.putLong(e.getValue()(0)); bb.putLong(e.getValue()(1))
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, Array[Long]]()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt)
      bb.get(kb)
      m.put(new String(kb, StandardCharsets.UTF_8),
        Array(bb.getLong, bb.getLong))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKeysAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKeysAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKeys {
  import kernels.{toCol, toExpr}

  /** Aggregate a string key column into a SpaceSaving summary:
    * `array<struct<key, count_hi, count_lo>>`, count-desc. */
  def agg(keyCol: Column, capacity: Int = 1024): Column =
    toCol(TopKeysAgg(toExpr(keyCol), capacity).toAggregateExpression())
}
