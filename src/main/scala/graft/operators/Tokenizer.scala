package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Tokenizer-training substrate: the inner step of BPE training — count
  * adjacent symbol pairs across the corpus, weighted by word frequency
  * (Sennrich et al. 2016). A full BPE train iterates merge → recount;
  * each round is exactly this aggregation, so the scale shape of
  * training is the scale shape of this operator.
  *
  * Scale design: the corpus collapses to the term-frequency map first
  * (one shuffle, corpus-size → vocabulary-size), pair expansion runs
  * over the VOCABULARY (bounded, small), and the final top-k compiles
  * to TakeOrderedAndProject — per-partition heaps, no global sort.
  */
object Tokenizer {

  /** Top-`topK` adjacent character pairs by frequency-weighted count,
    * ties broken by pair string: `(pair, pair_count)`.
    */
  def bpePairCounts(df: DataFrame, textCol: String, topK: Int): DataFrame = {
    val tf = df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
    tf.filter(length(col("term")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, length(term) - 1), i -> substr(term, i, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair").asc)
      .limit(topK)
  }
}
