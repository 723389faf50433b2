package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * All built from `functions._` (zip_with / aggregate / transform), so the
  * math runs inside codegen with no UDF boundary. Floats are widened to
  * double BEFORE accumulation; `aggregate` is a sequential left fold, so
  * the summation order is the array order — deterministic across engines
  * (DuckDB's list_* functions fold the same way).
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Random-hyperplane (SimHash) signature of an embedding: `bits` sign
    * bits packed into a long. Hyperplanes are pseudo-random but fully
    * deterministic, derived from a splitmix64-style integer mix of
    * (seed, bitIndex, dimension) — no RNG state, reproducible on any
    * executor. Used to bucket vectors for approximate NN search.
    */
  def hyperplaneSignature(vec: Column, bits: Int, dim: Int, seed: Long = 42L): Column = {
    require(bits <= 63, "signature must fit a long")
    // mix(i, j): deterministic pseudo-random double in [-1, 1)
    def weight(i: Int, j: Int): Double = {
      var z = seed + i.toLong * 0x9E3779B97F4A7C15L + j.toLong * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
    }
    (0 until bits).map { i =>
      val proj = (0 until dim).map { j =>
        element_at(vec, j + 1).cast("double") * lit(weight(i, j))
      }.reduce(_ + _)
      when(proj >= 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }
}
