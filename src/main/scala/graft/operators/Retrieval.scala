package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 retrieval scoring (Robertson & Spärck Jones' probabilistic
  * ranking family; the Lucene-practice formulation — public literature):
  * score(q, d) = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)).
  *
  * The missing member between this engine's exact-match text family
  * (tf/df t08, decontamination d09) and its vector ANN family (s01+):
  * lexical top-k retrieval — "which training documents answer/leak this
  * benchmark question" by term statistics, no embeddings needed.
  *
  * 100 TB shape: the query side is SMALL (a benchmark, a probe set) and
  * broadcasts; the corpus tokenization keeps only rows whose term is in
  * the broadcast query-term set, so the only corpus-wide shuffle is the
  * (doc, query-term) tf aggregation — bounded by |q-terms| × matching
  * docs, not by corpus token count. Corpus length stats (N, Σlen) are
  * one narrow projection pass (in production, ingest-time metadata).
  *
  * Two idf modes:
  *  - `logIdf = true` (default, standard BM25): ln((N−df+0.5)/(df+0.5)+1).
  *    Production ranking; spec-tested on constructed data. Kept OUT of
  *    hash gates — ln is not a correctly-rounded IEEE op, so engines may
  *    disagree in the last ulp (this repo's oracle discipline).
  *  - `logIdf = false` (rational idf): (N−df+0.5)/(df+0.5), the raw
  *    Robertson odds without the log. Every operation in the whole score
  *    is then +,−,×,÷ over exactly-representable inputs — deterministic
  *    bit-exact on any IEEE engine, so DuckDB reproduces it and the gate
  *    hash-matches (the q54/q56 "only correctly-rounded ops" precedent).
  *
  * Per-(query, doc) term scores sum through DECIMAL(38,6) (decSum) so
  * the addition order Spark chooses cannot change the result.
  */
object Retrieval {

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queries: DataFrame, qIdCol: String, qTextCol: String,
           k1: Double = 1.2, b: Double = 0.75, topK: Int = 10,
           logIdf: Boolean = true): DataFrame = {
    import graft.functions.TextFunctions.tokens
    require(topK > 0, "topK must be positive")
    val qTerms = queries.select(col(qIdCol).as("qid"),
      explode(array_distinct(tokens(col(qTextCol)))).as("term"))
    // corpus stats: one narrow pass (token count only reaches the agg)
    val statsRow = docs
      .select(size(tokens(col(textCol))).as("__len"))
      .agg(count(lit(1)).as("n"), sum("__len").as("s")).head()
    val n = statsRow.getLong(0)
    val s = statsRow.getLong(1)
    require(n > 0, "bm25 needs a non-empty corpus")
    val avgdl = s.toDouble / n.toDouble
    // (doc, query-term) tf + doc length: the broadcast term-set join
    // keeps non-query tokens out of the aggregation shuffle entirely
    val termSet = broadcast(qTerms.select("term").distinct())
    val tf = docs
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("__toks"))
      .select(col("doc"), size(col("__toks")).as("len"),
        explode(col("__toks")).as("term"))
      .join(termSet, Seq("term"))
      .groupBy("doc", "term")
      .agg(count(lit(1)).as("tf"), max("len").as("len"))
    // document frequency per query term (bounded: |q-terms| rows)
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf =
      if (logIdf)
        log((lit(n).cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0))
      else
        (lit(n).cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))
    // exact operation order mirrored by the oracle: idf * (num / den)
    val num = col("tf").cast("double") * lit(k1 + 1.0)
    val den = col("tf").cast("double") + lit(k1) *
      (lit(1.0 - b) + lit(b) * (col("len").cast("double") / lit(avgdl)))
    val scored = qTerms
      .join(tf, Seq("term"))
      .join(broadcast(dft), Seq("term"))
      .withColumn("__w", idf * (num / den))
      .groupBy("qid", "doc")
      .agg(graft.functions.decSum(col("__w")).as("score"),
        count(lit(1)).as("n_terms"))
    val w = Window.partitionBy("qid")
      .orderBy(col("score").desc, col("doc").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select(col("qid"), col("doc").as("doc_id"), col("rank"),
        col("score"), col("n_terms"))
  }
}
