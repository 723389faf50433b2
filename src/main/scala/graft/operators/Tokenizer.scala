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

  /** FULL BPE merge training (Sennrich et al. 2016): learn `numMerges`
    * merge rules from the corpus. Deterministic end to end: the merge
    * each round is the pair with the highest frequency-weighted count,
    * ties broken lexicographically on (left, right).
    *
    * Scale shape — the textbook reason BPE training is corpus-size-
    * independent: the ONLY corpus-scale step is one term-frequency
    * aggregation (partial-agg shuffle, corpus -> vocabulary rows); the
    * merge loop then runs on the driver over the BOUNDED vocab table
    * (top `maxVocab` terms by frequency — the k-means/PQ bounded-
    * collect precedent). 100 TB of text and 100 GB of text train the
    * same merges at the same loop cost once their vocab agrees.
    *
    * Returns (rank, left, right, pair_count) ordered by rank.
    */
  def trainBpeMerges(df: DataFrame, textCol: String, numMerges: Int,
                     maxVocab: Int = 65536): Seq[(Int, String, String, Long)] = {
    val vocab = df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("term").asc)
      .limit(maxVocab)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    var words = vocab.map { case (t, f) => (t.map(_.toString).toArray, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
        merges += ((round, a, b, c))
        words = words.map { case (syms, f) => (mergePair(syms, a, b), f) }
        round += 1
      }
    }
    merges.toSeq
  }

  /** The trained merge table as a DataFrame: (rank, left, right,
    * pair_count) — the artifact a tokenizer ships. */
  def bpeMerges(df: DataFrame, textCol: String, numMerges: Int,
                maxVocab: Int = 65536): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainBpeMerges(df, textCol, numMerges, maxVocab)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Greedy left-to-right single-pass merge of every non-overlapping
    * (a, b) occurrence — the exact replacement rule of training. */
  private[operators] def mergePair(syms: Array[String], a: String,
                                   b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Segment one term with a trained rank table: repeatedly apply the
    * LOWEST-ranked applicable merge (the standard BPE apply order, so
    * segmentation agrees with training on the training corpus). */
  def segment(term: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms = term.map(_.toString).toArray
    var live = syms.length > 1
    while (live) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0 || best == Int.MaxValue) live = false
      else {
        syms = mergePair(syms, syms(bi), syms(bi + 1))
        live = syms.length > 1
      }
    }
    syms
  }

  /** Apply trained merges to a document column: one row per (id, token)
    * with the token's BPE segments and their count — the tokenize step
    * a trainer feeds. The merge table rides into every task as a plain
    * rank map built once per partition (the broadcast-kernel shape; a
    * stateless projection, so it lifts to streams unchanged).
    */
  def segmentTokens(df: DataFrame, idCol: String, textCol: String,
                    merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranks = merges.map { case (r, a, b, _) => ((a, b), r) }.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    df.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        // per-row segmentation against the broadcast rank map
        graft.functions.TextFunctions.tokenize(text).map { t =>
          val segs = segment(t, bc.value)
          (id, t, segs, segs.length)
        }
      }
      .toDF(idCol, "token", "segments", "n_segments")
  }
}
