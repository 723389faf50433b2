package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** IVF coarse-quantizer assignment: the indices of the `m` centroids
  * most cosine-similar to the input vector, ordered best-first (ties by
  * lower index). The centroid matrix is embedded in the expression —
  * IVF lists are small (nlist x dim; 64x64 doubles = 32 KB) and ship
  * with the serialized plan, which is the broadcast-variable pattern
  * without the ceremony. One pass per row: O(nlist * dim), no
  * allocation beyond the m-element result.
  */
case class NearestCentroids(child: Expression,
                            centroids: Array[Array[Double]],
                            m: Int)
    extends UnaryExpression with FloatOrDoubleArray {
  require(m >= 1 && m <= centroids.length)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  @transient private lazy val isFloat = vecType(child)
  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))

  def compute(vec: ArrayData): ArrayData = {
    val dim = vec.numElements()
    val n = centroids.length
    val sims = new Array[Double](n)
    var vn = 0.0
    var j = 0
    while (j < dim) { val x = elem(vec, j, isFloat); vn += x * x; j += 1 }
    val vnorm = math.sqrt(vn)
    var c = 0
    while (c < n) {
      val cent = centroids(c)
      var dot = 0.0
      var i = 0
      val d = math.min(dim, cent.length)
      while (i < d) { dot += elem(vec, i, isFloat) * cent(i); i += 1 }
      sims(c) = if (vnorm == 0.0 || norms(c) == 0.0) 0.0 else dot / (vnorm * norms(c))
      c += 1
    }
    // selection of top-m indices (m is tiny; O(m*n))
    val out = new Array[Int](m)
    val taken = new Array[Boolean](n)
    var r = 0
    while (r < m) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i) && sims(i) > bestSim) { best = i; bestSim = sims(i) }
        i += 1
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ncExpr", this, classOf[NearestCentroids].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // centroids is an Array — exclude it from case-class equality semantics
  override def equals(o: Any): Boolean = o match {
    case other: NearestCentroids =>
      child == other.child && m == other.m &&
        centroids.length == other.centroids.length &&
        centroids.indices.forall(i => centroids(i).sameElements(other.centroids(i)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + m) + centroids.length
}
