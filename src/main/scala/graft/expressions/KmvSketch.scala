package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared machinery of the KMV aggregates: a bounded TreeSet buffer of
  * the k minimum distinct (order-transformed) hash values, with the
  * merge/eval/serialize contract TypedImperativeAggregate needs. The
  * buffer serializes to 4 + 8k bytes (≤ 8 KB at the default k=1024).
  */
abstract class KmvAggBase
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  // NOTE: k's range check lives in the concrete case classes — a
  // require here would run in the superclass constructor, before the
  // subclass's k field exists (it also breaks Java deserialization on
  // executors, which constructs the first non-serializable superclass)
  def k: Int

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  /** Insert an (order-transformed) hash, keeping only the k smallest. */
  protected final def boundedAdd(buf: java.util.TreeSet[java.lang.Long],
                                 t: Long): Unit = {
    if (buf.size < k) { buf.add(t); () }
    else if (t < buf.last) { buf.add(t); if (buf.size > k) buf.pollLast(); () }
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) boundedAdd(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 } // ascending
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }
}

/** KMV (k-minimum-values) distinct sketch — the mergeable distinct-count
  * summary that, unlike HLL, also supports SET OPERATIONS (union and
  * intersection estimates), after Beyer et al., "On Synopses for
  * Distinct-Value Estimation Under Multiset Operations" (SIGMOD'07) and
  * the DataSketches theta-sketch family (public literature).
  *
  * The aggregate keeps the k smallest DISTINCT 64-bit hash values seen.
  * Stored values are `hash ^ Long.MinValue`, so SIGNED order equals
  * unsigned hash order — which makes every post-aggregation operation a
  * plain codegen'd array built-in: union = `slice(array_sort(
  * array_distinct(concat(a,b))), 1, k)`, intersection membership =
  * `array_intersect`. Only the aggregation itself is imperative (a
  * bounded TreeSet buffer).
  *
  * 100 TB posture: the sketch is an 8 KB mergeable partial — partial
  * aggregation combines map-side, per-partition/per-day sketches can be
  * PERSISTED and unioned at query time without rescanning the corpus
  * (the pre-aggregated-cube pattern HLL enables for counts, extended to
  * intersections: "users who did A and B" across arbitrary slices).
  * Relative standard error ~ 1/sqrt(k-1) (~3.1% at k=1024).
  *
  * Input contract: a LongType hash column — compose with the codegen'd
  * `xxhash64(cols...)` so hashing stays in whole-stage codegen and the
  * sketch is deterministic across engines/runs.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  require(k >= 16 && k <= 65536, "kmv k must be in [16, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a LongType hash input (compose with " +
      s"xxhash64), got ${child.dataType.catalogString}")
  override def prettyName: String = "kmv_sketch"

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    // unsigned-order-preserving transform; TreeSet dedups re-adds
    if (v != null) boundedAdd(buf, v.asInstanceOf[Long] ^ Long.MinValue)
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merges PERSISTED sketches: aggregates an `array<long>` sketch column
  * (as produced by [[KmvSketchAgg]] and written to parquet) back into
  * one sketch. This is the query half of the pre-aggregated-cube
  * pattern: build per-day/per-partition sketches ONCE at ingest,
  * persist the 8 KB arrays, answer any-slice distinct (and set-algebra)
  * queries by merging the slice's sketches — the raw corpus is never
  * rescanned. Same buffer, same bound, same result as re-sketching the
  * raw data (spec-asserted).
  */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends KmvAggBase {

  require(k >= 16 && k <= 65536, "kmv k must be in [16, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge expects an array<long> sketch, got ${other.catalogString}")
  }
  override def prettyName: String = "kmv_merge"

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) { boundedAdd(buf, arr.getLong(i)); i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Column-level API for the KMV sketch family. Everything below the
  * aggregate is built-in array functions — codegen'd, engine-native. */
object Kmv {
  import kernels.{toCol, toExpr}

  /** Aggregate a LongType hash column into a KMV sketch (sorted
    * `array<long>` of the k min transformed hashes). Compose as
    * `Kmv.sketch(xxhash64(col("user_id")), 1024)`. */
  def sketch(hashCol: Column, k: Int = 1024): Column =
    toCol(KmvSketchAgg(toExpr(hashCol), k).toAggregateExpression())

  /** Merge persisted sketches (an `array<long>` column) into one —
    * the cube-query aggregate. */
  def merge(sketchCol: Column, k: Int = 1024): Column =
    toCol(KmvMergeAgg(toExpr(sketchCol), k).toAggregateExpression())

  private val HALF = 9.223372036854776e18 // 2^63 as double
  private val FULL = 1.8446744073709552e19 // 2^64 as double

  /** Distinct-count estimate. Exact (= sketch size) while the input had
    * fewer than k distinct hashes; (k-1)/R otherwise, R = the kth
    * smallest hash as a fraction of the hash space. */
  def estimate(sk: Column, k: Int = 1024): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((element_at(sk, k).cast("double") + lit(HALF)) / lit(FULL)))

  /** Union of two sketches — the k min of the merged distinct values;
    * `estimate(union(a,b))` estimates |A ∪ B|. */
  def union(a: Column, b: Column, k: Int = 1024): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Intersection-size estimate via the inclusion trick: within the
    * union's k-min set, the fraction of values present in BOTH input
    * sketches estimates the Jaccard similarity; times |A ∪ B| gives
    * |A ∩ B|. */
  def intersectEstimate(a: Column, b: Column, k: Int = 1024): Column = {
    val u = union(a, b, k)
    val both = size(array_intersect(array_intersect(u, a), b)).cast("double")
    (both / size(u).cast("double")) * estimate(u, k)
  }
}
