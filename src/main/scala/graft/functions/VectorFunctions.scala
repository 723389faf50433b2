package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.{kernels, CosineSimilarity, HyperplaneSignatures}

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

  /** Cosine similarity; 0.0 when either vector has zero norm. Native
    * Catalyst expression: one pass, no intermediate array per pair
    * (bit-equal to the zip_with/aggregate formulation it replaced).
    */
  def cosine(a: Column, b: Column): Column =
    kernels.toCol(CosineSimilarity(kernels.toExpr(a), kernels.toExpr(b)))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0), (acc, v) => acc + v))

  /** Per-vector symmetric int8 quantization: struct(q binary, qn double)
    * — 1 byte/dim through scans and broadcasts instead of 4. Pair with
    * [[int8Cos]] for the quantized ANN scan and rescore survivors with
    * [[cosine]].
    */
  def quantizeInt8(vec: Column): Column =
    kernels.toCol(graft.expressions.QuantizeInt8(kernels.toExpr(vec)))

  /** Approximate cosine over two [[quantizeInt8]] structs (integer dot). */
  def int8Cos(a: Column, b: Column): Column =
    kernels.toCol(graft.expressions.Int8CosApprox(
      kernels.toExpr(a), kernels.toExpr(b)))

  /** Random-hyperplane (SimHash) signatures of an embedding: `tables`
    * independent signatures of `bits` sign bits each, as array<long>.
    * Hyperplanes are pseudo-random but fully deterministic (splitmix64
    * mix of seed+table, bit, dimension) — reproducible on any executor.
    * Native expression; used to bucket vectors for approximate NN search.
    */
  def hyperplaneSignatures(vec: Column, bits: Int, tables: Int, seed: Long = 42L): Column =
    kernels.toCol(HyperplaneSignatures(kernels.toExpr(vec), bits, tables, seed))
}
