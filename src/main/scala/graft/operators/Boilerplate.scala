package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-document LINE-level boilerplate removal — the C4/CCNet web-
  * corpus cleaning step this engine's text family was missing: lines
  * (nav bars, cookie banners, copyright footers, share buttons) that
  * repeat VERBATIM across many documents carry no training signal and
  * poison dedup statistics; the published recipe drops any line
  * appearing in too many distinct documents while keeping the rest of
  * each document intact and in order (C4 arXiv:1910.10683 §2.2's
  * repeated-line rule; CCNet's shared-hash paragraph removal —
  * public practice). Distinct from [[Dedup]] (whole-doc),
  * t11 (dup passages, reporting) and t17 (within-corpus span removal
  * by n-gram): the unit here is the exact delimiter-bounded line and
  * the criterion is cross-document FREQUENCY.
  *
  * 100 TB shape: three key-bounded shuffles, nothing quadratic —
  * explode to (doc, pos, line); count distinct docs per line (the one
  * line-keyed aggregation); join the counts back (AQE broadcasts the
  * frequent-line side when it is small, which is boilerplate's whole
  * premise); rebuild each document with a per-doc sort of its
  * surviving (pos, line) pairs. Blank lines never count toward
  * frequency (they'd be "boilerplate" in every corpus) and are kept.
  */
object Boilerplate {

  /** Remove every line occurring in >= `minDocs` DISTINCT documents.
    * Returns (idCol, textCol) with the cleaned text; documents whose
    * every line was boilerplate drop out entirely (nothing left to
    * train on). NULL-text documents pass through with NULL text —
    * `posexplode_outer` keeps a null marker row for them, so the batch
    * rebuild agrees with [[removeLinesBroadcast]]'s NULL-in/NULL-out
    * (the only remaining batch/stream divergence is the documented
    * fully-boilerplate case: dropped here, empty string there).
    * `delimiter` is a literal string, not a regex.
    */
  def removeFrequentLines(docs: DataFrame, idCol: String, textCol: String,
                          minDocs: Int,
                          delimiter: String = "\n"): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would delete every non-blank line")
    require(delimiter.nonEmpty, "delimiter must be non-empty")
    val pat = java.util.regex.Pattern.quote(delimiter)
    val lines = docs.select(col(idCol).as("__id"),
      posexplode_outer(split(col(textCol), pat)).as(Seq("__pos", "__line")))
    val frequent = lines.filter(trim(col("__line")) =!= "")
      .groupBy("__line")
      .agg(countDistinct(col("__id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__line"), lit(true).as("__bp"))
    // null __line joins nothing (null key) so the marker row survives
    // the __bp filter; collect_list skips the null struct, and the
    // count-gated when() turns the empty rebuild back into NULL.
    lines.join(frequent, Seq("__line"), "left")
      .filter(col("__bp").isNull)
      .groupBy(col("__id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(col("__line").isNotNull,
            struct(col("__pos").as("p"), col("__line").as("l"))))),
          x => x.getField("l")), delimiter).as("__joined"),
        (count(col("__line")) > 0L).as("__nonnull"))
      .select(col("__id").as(idCol),
        when(col("__nonnull"), col("__joined")).as(textCol))
  }

  /** The frequent-line set itself, for calibrate-once reuse: compute on
    * a reference corpus, then apply to later batches or a STREAM via
    * [[removeLinesBroadcast]] (the bm25Model / calibratedFilter
    * posture — per-microbatch line counts would drift with arrival
    * order). Driver-side collect bounded by `maxLines`: a boilerplate
    * vocabulary larger than that means the threshold is too low, not
    * that the driver should be flooded.
    */
  def frequentLines(docs: DataFrame, idCol: String, textCol: String,
                    minDocs: Int, delimiter: String = "\n",
                    maxLines: Int = 100000): Seq[String] = {
    require(minDocs >= 2, "minDocs < 2 would delete every non-blank line")
    val pat = java.util.regex.Pattern.quote(delimiter)
    val rows = docs
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), pat)).as("__line"))
      .filter(trim(col("__line")) =!= "")
      .groupBy("__line").agg(countDistinct(col("__id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .limit(maxLines + 1)
      .collect()
    require(rows.length <= maxLines,
      s"more than $maxLines boilerplate lines at minDocs=$minDocs; " +
        "raise the threshold (or maxLines) — this set broadcasts")
    rows.map(_.getString(0)).toSeq.sorted
  }

  /** Apply a calibrated frequent-line set as ONE stateless projection
    * (no explode, no aggregation, no shuffle): split, higher-order
    * filter against the set, rejoin. Batch ≡ stream by construction —
    * the streaming lift of [[removeFrequentLines]]
    * ([[graft.streaming.Streams.boilerplateFilter]] wraps this).
    * Unlike the batch rebuild, a fully-boilerplate document survives
    * here as an empty string (a stream cannot drop rows mid-
    * projection); filter on the result where that matters. NULL text
    * stays NULL.
    *
    * The set travels as a TRUE broadcast variable probed by a codegen'd
    * expression ([[graft.expressions.BroadcastSetContains]]), not a
    * plan literal: at the 100k-line cap a literal map is multi-MB of
    * plan serialized per task (and per micro-batch on a stream); the
    * broadcast ships once per executor and the plan carries only the
    * handle (BoilerplateSpec pins the plan-size bound).
    */
  def removeLinesBroadcast(docs: DataFrame, textCol: String,
                           lines: Seq[String],
                           delimiter: String = "\n"): DataFrame = {
    val pat = java.util.regex.Pattern.quote(delimiter)
    val isBp = graft.expressions.BroadcastSetContains.probe(
      docs.sparkSession, lines)
    docs.withColumn(textCol,
      array_join(filter(split(col(textCol), pat),
        l => not(isBp(l))), delimiter))
  }
}
