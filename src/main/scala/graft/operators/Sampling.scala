package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / data-mixing operators for training-corpus
  * construction. All decisions derive from a multiplicative hash of the
  * document id — no RNG state, so a sample is reproducible across runs,
  * executors, and retries (Spark's `sample()` is seed-stable only per
  * partitioning; these are stable, period).
  *
  * Scale design:
  *  - [[hashSample]] and [[domainMix]] are pure filters — zero shuffle; a
  *    100 TB corpus is sampled in the scan stage, and Parquet row-group
  *    statistics still prune because no row ordering is assumed.
  *  - [[stratifiedSample]] and [[tokenPack]] shuffle once, on the strata
  *    key (the unavoidable shuffle: a per-stratum quota / running budget
  *    is a per-stratum total order).
  */
object Sampling {

  /** Knuth's multiplicative constant (2654435761 = floor(2^32/phi), odd),
    * so `id -> (id * A) mod 2^32` is a BIJECTION on [0, 2^32): a hash
    * sample of fraction f keeps exactly-f of any 2^32-dense id range, not
    * approximately-f. Stays in integer arithmetic an ANSI oracle can
    * reproduce (product < 2^63 for ids < ~3.4e9; for wider ids pre-fold
    * with `pmod(id, 1L << 32)`).
    */
  val KnuthA = 2654435761L
  val HashMod = 4294967296L // 2^32

  /** The sampling hash: uniform on [0, 2^32) for any id distribution. */
  def splitHash(id: Column): Column = pmod(id * lit(KnuthA), lit(HashMod))

  /** Threshold for a keep-fraction, as the exact integer the oracle uses. */
  def fractionThreshold(fraction: Double): Long =
    (fraction * HashMod).toLong

  /** Deterministic Bernoulli(fraction) sample by id hash. Pure filter:
    * no shuffle, no state, reproducible on re-run and across engines.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(splitHash(col(idCol)) < lit(fractionThreshold(fraction)))

  /** Per-row weighted Bernoulli sample: keep a row with probability
    * `weight` (a column in [0,1] — e.g. a quality score), decided
    * deterministically from the id hash. The quality-weighted
    * downsampling step of corpus curation as a pure filter — zero
    * shuffle, scan-stage only, reproducible across runs and engines
    * (threshold arithmetic stays oracle-expressible: hash < floor
    * (weight·2^32)).
    */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.filter(splitHash(col(idCol)) <
      floor(weight * lit(HashMod.toDouble)).cast("long"))

  /** Per-stratum quota sample: the k docs with the smallest id-hash in
    * each stratum (hash order = a deterministic shuffle of the stratum).
    * One shuffle on the strata key; the sort is per-stratum, not global.
    */
  def stratifiedSample(
      df: DataFrame, strataCols: Seq[String], idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(splitHash(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Domain mixing: keep a per-group fraction of documents (the training
    * mixture weights of a multi-source corpus). Weights are a small
    * driver-side map compiled into a codegen'd CASE chain — no join, no
    * shuffle, no broadcast; groups absent from the map keep `defaultWeight`.
    */
  def domainMix(
      df: DataFrame, groupCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame = {
    val threshold = weights.toSeq.sortBy(_._1).foldRight(
      lit(fractionThreshold(defaultWeight)): Column) {
      case ((g, w), els) =>
        when(col(groupCol) === g, lit(fractionThreshold(w))).otherwise(els)
    }
    df.filter(splitHash(col(idCol)) < threshold)
  }

  /** Deterministic epoch shuffle: the training-data "random order" as a
    * pure computation. Each row gets `(shard, pos)` — shard from the
    * epoch-salted bijective hash, position = hash rank within the shard —
    * so an epoch's read order is (shard asc, pos asc): uniform, stable
    * across runs/retries, and different per epoch. Shuffling 100 TB this
    * way costs ONE shuffle on the shard key (shards ≈ output files) with
    * a per-shard sort — never a global total-order sort; re-shuffling for
    * the next epoch is a recompute with a different constant, not a
    * stored permutation.
    */
  def epochShuffle(
      df: DataFrame, idCol: String, epoch: Int, nShards: Int): DataFrame = {
    val h = splitHash(col(idCol) + lit(epoch.toLong * EpochSalt))
    val withShard = df
      .withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
    val w = Window.partitionBy("shard").orderBy(col("__h"), col(idCol))
    withShard
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }

  /** Epoch offset constant (odd, large): `id + epoch * EpochSalt` keeps
    * `id -> hash` a bijection per epoch while decorrelating epochs.
    */
  val EpochSalt = 1000003L

  /** Temperature-style domain rebalancing (the mC4/T5 alpha-sampling
    * scheme at alpha = 1/2): each group keeps fraction
    * `min(1, sqrt(n_min / n_group))`, so a group 100x the smallest is
    * downweighted 10x rather than capped by a hand-written weight map
    * (the [[domainMix]] complement: rates DERIVED from the data, not
    * configured). alpha is fixed at 1/2 deliberately — sqrt and division
    * are correctly-rounded IEEE ops, so the keep threshold is bit-equal
    * on any engine; a general `pow(x, alpha)` is not correctly rounded
    * and could disagree in the last ulp across libm implementations.
    *
    * Scale shape: one partial-aggregated count shuffle whose output is
    * |groups| rows, a broadcast of that tiny table back onto the scan,
    * and a pure hash filter — the corpus itself is never shuffled.
    */
  def temperatureMix(df: DataFrame, groupCol: String, idCol: String): DataFrame =
    df.join(broadcast(temperatureThresholds(df, groupCol)), Seq(groupCol))
      .filter(splitHash(col(idCol)) < col("__thr"))
      .drop("__thr")

  /** The rate-derivation half of [[temperatureMix]] on its own:
    * (groupCol, __thr) — the per-group keep threshold as the exact
    * integer the hash filter compares against. Exposed so the rates can
    * be computed ONCE on a reference corpus and applied elsewhere — to a
    * later batch, or to a document STREAM (per-microbatch counts would
    * drift with arrival order; batch-derived rates applied stream-static
    * are the production shape: see `Streams.temperatureMix`).
    */
  def temperatureThresholds(df: DataFrame, groupCol: String): DataFrame = {
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    counts.crossJoin(broadcast(nmin))
      .withColumn("__thr",
        floor(least(lit(1.0),
          sqrt(col("__nmin").cast("double") / col("__n").cast("double")))
          * lit(HashMod.toDouble)).cast("long"))
      .select(col(groupCol), col("__thr"))
  }

  /** Per-group quantile-calibrated filter: keep rows whose `score` is at
    * or above the group's q-quantile, with the quantile taken over a
    * fixed-width histogram of `bins` buckets on [0, 1) (production
    * quantiles at corpus scale: an exact sorted percentile per group
    * buffers every value of the group — unboundable at 100 TB — while a
    * histogram is a BOUNDED partial aggregate: at most `bins` rows per
    * group cross the wire regardless of corpus size). The cut is a bin
    * edge, so the whole computation stays in integer arithmetic any
    * engine reproduces exactly.
    *
    * Returns rows with (idCol, groupCol, bin, thr_bin) where
    * bin = floor(score * bins) and thr_bin is the group's smallest bin
    * with cumulative count >= q of the group total.
    *
    * Scale shape: one bounded-cardinality aggregation (partial agg
    * collapses every group to <= bins rows map-side), a window over that
    * tiny table, a broadcast join back onto the scan, and a filter.
    */
  def calibratedQuantileFilter(
      df: DataFrame, groupCol: String, idCol: String, score: Column,
      bins: Int, qNum: Int, qDen: Int): DataFrame = {
    val binned = df.select(col(idCol), col(groupCol),
      floor(score * lit(bins.toDouble)).cast("long").as("bin"))
    val thr = quantileThresholds(df, groupCol, score, bins, qNum, qDen)
    binned.join(broadcast(thr), Seq(groupCol))
      .filter(col("bin") >= col("thr_bin"))
      .select(col(idCol), col(groupCol), col("bin"), col("thr_bin"))
  }

  /** The calibration half of [[calibratedQuantileFilter]] on its own:
    * (groupCol, thr_bin) per group. Exposed so the thresholds can be
    * computed ONCE on a reference corpus and applied elsewhere — to a
    * later batch, or to a document STREAM (a bounded aggregate is not
    * streamable per-microbatch with these exact semantics, but a
    * batch-calibrated threshold applied to the stream is the production
    * shape: see `Streams.calibratedFilter`).
    */
  def quantileThresholds(
      df: DataFrame, groupCol: String, score: Column,
      bins: Int, qNum: Int, qDen: Int): DataFrame =
    binnedQuantileThresholds(
      df.select(col(groupCol),
        floor(score * lit(bins.toDouble)).cast("long").as("bin")),
      groupCol, qNum, qDen)

  /** [[quantileThresholds]] over an ALREADY-binned table (groupCol,
    * "bin"): identical arithmetic, no score recomputation. Exposed so a
    * composition that scores documents once into a narrow cached table
    * (the c07/c08 intake shape) can calibrate from it instead of
    * re-scanning and re-scoring the wide text column per stage.
    */
  def binnedQuantileThresholds(binned: DataFrame, groupCol: String,
                               qNum: Int, qDen: Int): DataFrame = {
    val hist = binned.groupBy(groupCol, "bin").agg(count(lit(1)).as("__n"))
    val wCum = Window.partitionBy(groupCol).orderBy("bin")
    val wTot = Window.partitionBy(groupCol)
    hist
      .withColumn("__cum", sum("__n").over(wCum))
      .withColumn("__tot", sum("__n").over(wTot))
      .filter(col("__cum") * qDen >= col("__tot") * qNum)
      .groupBy(groupCol).agg(min("bin").as("thr_bin"))
  }

  /** Pack documents into ~`budgetTokens`-sized shards per stratum (the
    * pre-step of sequence packing: a shard is the unit a trainer reads).
    * Shard id = the running token total BEFORE the doc, integer-divided by
    * the budget — so every shard except a stratum's last holds at least
    * `budgetTokens` minus one document's overhang. Deterministic: docs are
    * packed in id order. One shuffle (strata key), one window pass.
    */
  def tokenPack(
      df: DataFrame, strataCols: Seq[String], idCol: String,
      tokensCol: String, budgetTokens: Long): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("shard_id",
        floor((col("__cum") - col(tokensCol)) / lit(budgetTokens.toDouble))
          .cast("long"))
      .drop("__cum")
  }
}
