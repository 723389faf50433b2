package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination: remove from a training corpus every document
  * that shares at least one word n-gram with a benchmark/eval set — the
  * standard guard against test-set leakage when assembling training data
  * (GPT-3 appendix C / PaLM-style n-gram overlap, re-expressed as one
  * broadcast semi-join).
  *
  * Scale design: the benchmark side is small (eval suites are thousands of
  * documents), so its distinct gram set is BROADCAST and the 100 TB
  * training side is never shuffled — contamination detection happens in
  * the scan stage. Grams travel as xxhash64 longs (8 bytes each, computed
  * inside the scan projection) rather than strings; `hashGrams = false`
  * keeps the exact strings for oracle-checkable runs (identical output
  * absent 64-bit collisions, ~n²/2⁶⁴).
  */
object Decontaminate {

  /** Distinct word n-grams of a text column, hashed or as strings. */
  private def grams(textCol: Column, n: Int, hashed: Boolean): Column = {
    val sh = TextFunctions.wordShingles(textCol, n)
    if (hashed) transform(sh, g => xxhash64(g)) else sh
  }

  /** Training docs from `train` that share NO word n-gram with `bench`.
    * Column sets of `train` pass through unchanged.
    */
  def decontaminate(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 8, hashGrams: Boolean = true,
      broadcastBench: Boolean = true): DataFrame = {
    val benchGrams = bench
      .select(explode(grams(col(textCol), n, hashGrams)).as("__g"))
      .distinct()
    val b = if (broadcastBench) broadcast(benchGrams) else benchGrams
    val contaminated = train
      .select(col(idCol), explode(grams(col(textCol), n, hashGrams)).as("__g"))
      .join(b, "__g")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** SEMANTIC decontamination — the embedding-space member of the
    * family: remove every training row whose embedding sits within
    * `cosine >= threshold` of ANY benchmark embedding. Catches the
    * leakage the n-gram filter cannot see (paraphrases, translations,
    * templated rewrites of eval items — public embedding-similarity
    * decontamination practice). Same scale posture as
    * [[decontaminate]]: the bench side is small by contract and
    * BROADCASTS, so the check is one BroadcastNestedLoopJoin LeftAnti
    * in the training scan stage — the 100 TB side never shuffles and
    * never expands (each train row tests against the in-memory bench
    * vectors and passes or dies). For a bench set too large to
    * broadcast, pre-bucket both sides with [[Similarity]]'s LSH and
    * anti-join on the matched ids instead.
    *
    * NULL embeddings are UNVERIFIABLE: the cosine condition evaluates
    * to NULL, so the anti-join would silently pass the row — the wrong
    * default for a safety filter. `nullPolicy` decides: `"fail"`
    * (default) raises in-plan at the first NULL training embedding
    * (the check rides the scan projection — zero extra passes over the
    * 100 TB side); `"drop"` quarantines null-embedding rows out of the
    * output; `"keep"` restores the pass-through for corpora where null
    * embeddings are known-clean by contract. NULL BENCH embeddings are
    * always ignored (they can match nothing).
    */
  def semantic(train: DataFrame, bench: DataFrame, embCol: String,
               threshold: Double,
               broadcastBench: Boolean = true,
               nullPolicy: String = "fail"): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0, 1]")
    require(Set("fail", "drop", "keep")(nullPolicy),
      s"nullPolicy must be fail|drop|keep, got '$nullPolicy'")
    val checked = nullPolicy match {
      case "fail" => train.withColumn(embCol,
        when(col(embCol).isNull, raise_error(lit(
          s"semantic decontamination: NULL $embCol row is unverifiable " +
            "— drop nulls upstream or pass nullPolicy=drop/keep")))
          .otherwise(col(embCol)))
      case "drop" => train.filter(col(embCol).isNotNull)
      case "keep" => train
    }
    val b0 = bench.select(col(embCol).as("__bv"))
      .filter(col("__bv").isNotNull)
    val b = if (broadcastBench) broadcast(b0) else b0
    checked.join(b,
      graft.functions.VectorFunctions.cosine(col(embCol), col("__bv")) >=
        threshold,
      "left_anti")
  }

  /** The audit twin of [[decontaminate]]: for every CONTAMINATED training
    * doc, how many of its n-grams the bench set contains and how many
    * distinct bench documents it touches — the report a lab reads before
    * deciding whether the hit is true leakage or a common idiom. Same
    * shuffle shape as the filter (broadcast bench side, training side
    * shuffles once on the per-doc aggregate), so auditing costs what
    * filtering costs.
    */
  def overlapReport(
      train: DataFrame, bench: DataFrame, idCol: String, textCol: String,
      n: Int = 8, hashGrams: Boolean = true,
      broadcastBench: Boolean = true): DataFrame = {
    val benchGrams = bench
      .select(col(idCol).as("bench_id"),
        explode(grams(col(textCol), n, hashGrams)).as("__g"))
      .distinct()
    val b = if (broadcastBench) broadcast(benchGrams) else benchGrams
    train
      .select(col(idCol), explode(grams(col(textCol), n, hashGrams)).as("__g"))
      .join(b, "__g")
      .groupBy(idCol)
      .agg(countDistinct(col("__g")).as("n_shared_grams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }
}
