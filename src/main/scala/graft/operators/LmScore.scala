package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.wordNGramsAll

/** CCNet-style language-model corpus-fit scoring: a bigram model counted
  * over a reference slice, every document scored by how much of it the
  * model has seen. The score columns are INTEGER-exact (bigram totals,
  * model hits, summed model counts) so results are bit-stable across
  * engines; a float perplexity proxy (e.g. `-sum(log(cnt/total))/n`) is a
  * trivial client-side function of them — kept out of the contract
  * because `ln` is not bit-identical across runtimes.
  *
  * Scale design: bigrams travel as 8-byte xxhash64 longs through BOTH
  * shuffles (the model aggregation and the scoring join) — never as
  * strings; the scoring join is a plain shuffle join on the hash, so
  * model size is unbounded (prune with `minCount` to make the model
  * broadcastable when the reference slice is small relative to the
  * corpus). The right-join keeps documents with fewer than two tokens,
  * scored zero.
  */
object LmScore {

  def bigramFit(docs: DataFrame, refDocs: DataFrame,
                idCol: String, textCol: String,
                minCount: Long = 1L): DataFrame = {
    def grams(df: DataFrame) = df
      .select(col(idCol), explode(wordNGramsAll(col(textCol), 2)).as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("__h"))
    val model = grams(refDocs)
      .groupBy("__h").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
    grams(docs)
      .join(model, Seq("__h"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("__cnt")).as("n_hits"),
        sum(coalesce(col("__cnt"), lit(0L))).as("sum_model_count"))
      .join(docs.select(col(idCol)), Seq(idCol), "right")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("sum_model_count"), lit(0L)).as("sum_model_count"))
  }

  /** Collect the bigram model as a driver-side map (hashed gram →
    * count), pruned to `minCount`. The materialization step of the
    * broadcast scoring path: train once per reference snapshot, reuse
    * across batches and streams. HARD-BOUNDED: `minCount` is the knob
    * that makes the pruned vocabulary fit, but its default (1) prunes
    * nothing — so the collect is capped at `maxVocab` entries and FAILS
    * LOUDLY with the remedy rather than OOMing the driver on a large
    * reference corpus (the Boilerplate.topTemplates discipline: every
    * documented bound backed by a require). 4M entries ≈ 64 MB of
    * longs — comfortably broadcastable, which is the whole point of
    * this path; a model that exceeds it belongs on [[bigramFit]]'s
    * shuffle-join form instead.
    */
  def bigramModel(refDocs: DataFrame, textCol: String,
                  minCount: Long = 1L,
                  maxVocab: Int = 4000000): Map[Long, Long] = {
    val rows = refDocs
      .select(explode(wordNGramsAll(col(textCol), 2)).as("__g"))
      .select(xxhash64(col("__g")).as("__h"))
      .groupBy("__h").agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") >= minCount)
      .limit(maxVocab + 1)
      .collect()
    require(rows.length <= maxVocab,
      s"bigramModel: pruned vocabulary exceeds maxVocab=$maxVocab " +
        s"entries at minCount=$minCount — raise minCount (or maxVocab, " +
        "if the driver can hold it), or score with the unbounded " +
        "shuffle-join path bigramFit instead")
    rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Zero-shuffle scoring: the model rides into the plan as a map
    * literal (the broadcast-variable pattern), and every score column is
    * a pure projection over the document's own grams — no explode, no
    * join, no aggregation shuffle. Identical results to [[bigramFit]]
    * (spec-asserted); this is the 100 TB path when the pruned model fits
    * in memory, and — being stateless — the form that lifts directly to
    * Structured Streaming ([[graft.streaming.Streams.lmScore]]).
    */
  def bigramFitBroadcast(docs: DataFrame, model: Map[Long, Long],
                         idCol: String, textCol: String): DataFrame = {
    import graft.expressions.{kernels, LmFitScore}
    val sorted = model.toArray.sortBy(_._1)
    val keys = sorted.map(_._1)
    val counts = sorted.map(_._2)
    val hashed = transform(wordNGramsAll(col(textCol), 2), g => xxhash64(g))
    val score = kernels.toCol(
      LmFitScore(kernels.toExpr(hashed), keys, counts))
    docs.select(col(idCol), score.as("__s"))
      .select(col(idCol),
        col("__s.n_bigrams").as("n_bigrams"),
        col("__s.n_hits").as("n_hits"),
        col("__s.sum_model_count").as("sum_model_count"))
  }
}
