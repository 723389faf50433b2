package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al., TPAMI 2011) kernels: the vector is
  * split into `m` subspaces of `ds` dims; each subspace is encoded as the
  * id of its nearest codebook centroid — `m` BYTES per vector (32x
  * smaller than float32 at 64 dims), scanned with asymmetric-distance
  * lookups instead of full dot products.
  *
  * Codebooks are trained driver-side on a deterministic sample (plain L2
  * Lloyd per subspace) and shipped to executors inside the expression —
  * reproducible everywhere, no fitting state in the plan.
  */
private[graft] object PqCommon {
  /** codebooks(j)(c)(d): subspace j, centroid c, dim d. */
  type Codebooks = Array[Array[Array[Double]]]

  @inline def elemAt(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** Encode a vector into struct(code: binary(m), rnorm: double) — the PQ
  * code plus the L2 norm of the RECONSTRUCTED vector (needed to turn ADC
  * inner products into approximate cosines).
  */
case class PqEncode(child: Expression, codebooks: PqCommon.Codebooks)
    extends UnaryExpression with FloatOrDoubleArray {
  private val m = codebooks.length
  private val ds = codebooks(0)(0).length

  override def dataType: DataType = StructType(Seq(
    StructField("code", BinaryType, nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))
  override def prettyName: String = "pq_encode"

  @transient private lazy val isFloat = vecType(child)

  def compute(a: ArrayData): InternalRow = {
    val code = new Array[Byte](m)
    var rn = 0.0
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val base = j * ds
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d2 = 0.0; var d = 0
        while (d < ds) {
          val diff = PqCommon.elemAt(a, base + d, isFloat) - cent(d)
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      code(j) = best.toByte
      val cent = cb(best)
      var d = 0
      while (d < ds) { rn += cent(d) * cent(d); d += 1 }
      j += 1
    }
    InternalRow(code, math.sqrt(rn))
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEnc", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: LUT[j*256 + c] = dot(query_sub_j,
  * centroid_c_j), flattened to one array<double>. Built ONCE per query
  * row; scoring a code is then `m` array reads ([[PqAdcCos]]) instead of
  * a full-dimension dot product — the whole point of ADC scanning.
  */
case class PqLut(child: Expression, codebooks: PqCommon.Codebooks)
    extends UnaryExpression with FloatOrDoubleArray {
  private val m = codebooks.length
  private val k = codebooks(0).length
  private val ds = codebooks(0)(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val isFloat = vecType(child)

  def compute(a: ArrayData): ArrayData = {
    val lut = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val base = j * ds
      var c = 0
      while (c < k) {
        val cent = cb(c)
        var dot = 0.0; var d = 0
        while (d < ds) { dot += PqCommon.elemAt(a, base + d, isFloat) * cent(d); d += 1 }
        lut(j * k + c) = dot
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override protected def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Approximate cosine from a query LUT + query norm and a corpus PQ
  * struct: sum of `m` LUT lookups / (|q| * |x̂|). Inputs: lut
  * (array<double>), qnorm (double), pq struct(code, rnorm).
  */
case class PqAdcCos(lut: Expression, qnorm: Expression, pq: Expression, k: Int)
    extends TernaryExpression {

  override def first: Expression = lut
  override def second: Expression = qnorm
  override def third: Expression = pq
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cos"

  def compute(lutA: ArrayData, qn: Double, pqRow: InternalRow): Double = {
    val code = pqRow.getBinary(0)
    val rn = pqRow.getDouble(1)
    if (qn == 0.0 || rn == 0.0) return 0.0
    var s = 0.0
    var j = 0
    while (j < code.length) {
      s += lutA.getDouble(j * k + (code(j) & 0xFF))
      j += 1
    }
    s / (qn * rn)
  }

  override protected def nullSafeEval(l: Any, q: Any, p: Any): Any =
    compute(l.asInstanceOf[ArrayData], q.asInstanceOf[Double],
      p.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcCos].getName)
    defineCodeGen(ctx, ev, (l, q, p) => s"$ref.compute($l, $q, $p)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(lut = newFirst, qnorm = newSecond, pq = newThird)
}
