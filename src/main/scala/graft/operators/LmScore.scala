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
}
