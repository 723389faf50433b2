package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Reciprocal-rank fusion of N ranked candidate lists (public RRF,
    * Cormack/Clarke/Buettcher SIGIR'09): fused(q, d) = Σ_i 1/(k + rank_i(q, d)),
    * summing only over the lists that contain d. Rank-only, so
    * heterogeneous score scales — BM25 vs cosine vs recency — fuse
    * WITHOUT calibration; k (default 60, the published constant)
    * damps the head so one list's #1 can't dominate alone. The third
    * member of the retrieval-composition family: c09's cascade rerank
    * when one signal gates another, rrfFuse when signals are peers.
    *
    * Inputs each carry (queryCol, docCol, `rank`) — [[bm25]]'s output
    * shape, or any row_number'd ranking. Already top-K-bounded per
    * query by contract, so the (query, doc) full-outer join chain and
    * the final per-query window touch ≤ Σ topK_i rows per query —
    * nothing corpus-scale. Arithmetic is one division + additions per
    * list (correctly-rounded IEEE ops in a fixed order), so a DuckDB
    * oracle spelling the same expression hash-matches.
    */
  def rrfFuse(rankings: Seq[DataFrame], queryCol: String, docCol: String,
              k: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.size >= 2, "rrfFuse wants at least two rankings")
    require(k >= 1, "k must be >= 1")
    require(topK > 0, "topK must be positive")
    val contribs = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(queryCol), col(docCol),
        (lit(1.0) / (lit(k.toDouble) + col("rank").cast("double")))
          .as(s"__c$i"))
    }
    val joined = contribs.reduce((a, b) =>
      a.join(b, Seq(queryCol, docCol), "full_outer"))
    val fused = contribs.indices.map(i => coalesce(col(s"__c$i"), lit(0.0)))
      .reduce(_ + _)
    val w = Window.partitionBy(queryCol)
      .orderBy(col("rrf").desc, col(docCol).asc)
    joined.withColumn("rrf", fused)
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= topK)
      .select(col(queryCol), col(docCol), col("rrf"), col("rank"))
  }

  /** A calibrated BM25 scoring model: per-query (term, idf) weight
    * lists plus the corpus length stats — computed ONCE on a reference
    * corpus (the same df/idf/avgdl arithmetic as [[bm25]]) and applied
    * elsewhere: to a later batch or to a document STREAM. The
    * quantileThresholds / temperatureThresholds posture: per-microbatch
    * corpus statistics would drift with arrival order, so the stats are
    * batch-derived and ride into the stream as literals.
    */
  final case class Bm25Model(queries: Seq[(Long, Seq[(String, Double)])],
                             avgdl: Double, k1: Double, b: Double)

  /** Calibrate a [[Bm25Model]] from a reference corpus. Bounded driver
    * collect: |query terms| rows (the query side is small by contract).
    */
  def bm25Model(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qIdCol: String, qTextCol: String,
                k1: Double = 1.2, b: Double = 0.75,
                logIdf: Boolean = true): Bm25Model = {
    import graft.functions.TextFunctions.tokens
    require(Seq(org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType)
        .contains(queries.schema(qIdCol).dataType),
      s"bm25Model needs an integral query id column; '$qIdCol' is " +
        queries.schema(qIdCol).dataType.catalogString)
    val qTerms = queries.select(col(qIdCol).cast("long").as("qid"),
      explode(array_distinct(tokens(col(qTextCol)))).as("term"))
    val statsRow = docs
      .select(size(tokens(col(textCol))).as("__len"))
      .agg(count(lit(1)).as("n"), sum("__len").as("s")).head()
    val n = statsRow.getLong(0)
    val s = statsRow.getLong(1)
    require(n > 0, "bm25Model needs a non-empty corpus")
    val termSet = broadcast(qTerms.select("term").distinct())
    val dft = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("term"))
      .join(termSet, Seq("term"))
      .groupBy("doc", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf =
      if (logIdf)
        log((lit(n).cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0))
      else
        (lit(n).cast("double") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5))
    val weights = qTerms.join(dft, Seq("term"))
      .select(col("qid"), col("term"), idf.as("idf"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    Bm25Model(
      weights.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq
        .sortBy(_._1)).toSeq.sortBy(_._1)
        .map { case (q, ts) => (q, ts) },
      s.toDouble / n.toDouble, k1, b)
  }

  /** STATELESS BM25 scoring of a document batch OR STREAM against a
    * broadcast [[Bm25Model]]: per row, each query's score is an
    * `aggregate` higher-order function over the literal (term, idf)
    * list — tf via `size(filter(tokens, _ == term))`, the same weight
    * arithmetic as [[bm25]], accumulated in DECIMAL(38,6) so the result
    * equals the batch decSum bit for bit. No join, no aggregation, no
    * watermark: batch ≡ stream by construction (the lmScore /
    * calibratedFilter lift shape). Emits (qid, doc_id, score, n_terms)
    * for every doc matching ≥ 1 term of the query.
    *
    * Global top-k is inherently a bounded aggregation — rank the
    * sink/output table downstream; the scoring itself is the
    * corpus-scale stateless part.
    */
  def bm25ScoreBroadcast(docs: DataFrame, idCol: String, textCol: String,
                         model: Bm25Model): DataFrame = {
    import graft.functions.TextFunctions.tokens
    require(model.queries.nonEmpty, "model has no queries")
    // tokenize ONCE per row into a materialized column — HOF lambda
    // bodies don't participate in common-subexpression elimination, so
    // an inline tokens(text) would re-run trim/lower/regex-split
    // ~2*|terms| times per document on the streaming hot path
    val toks = col("__toks")
    val len = size(toks).cast("double")
    def tfOf(term: Column): Column =
      size(filter(toks, x => x === term)).cast("double")
    val perQuery: Seq[Column] = model.queries.map { case (qid, terms) =>
      val termLit = typedlit(terms)
      val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)")
      val score = aggregate(termLit, zero, (acc, t) => {
        val tf = tfOf(t.getField("_1"))
        val w = t.getField("_2") * ((tf * lit(model.k1 + 1.0)) /
          (tf + lit(model.k1) * (lit(1.0 - model.b) +
            lit(model.b) * (len / lit(model.avgdl)))))
        acc + when(tf > lit(0.0), w.cast("decimal(38,6)"))
          .otherwise(zero)
      }).cast("double")
      val nTerms = size(filter(termLit,
        t => tfOf(t.getField("_1")) > lit(0.0))).cast("long")
      struct(lit(qid).as("qid"), score.as("score"), nTerms.as("n_terms"))
    }
    docs
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(array(perQuery: _*)).as("q"))
      .select(col("q.qid").as("qid"), col("doc_id"),
        col("q.score").as("score"), col("q.n_terms").as("n_terms"))
      .filter(col("n_terms") > 0)
  }
}
