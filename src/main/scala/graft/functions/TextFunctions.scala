package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: tokenizing,
  * quality scoring, language ID, fingerprinting.
  *
  * Design constraints:
  *  - Pure `Column` expressions (whole-stage codegen, no UDFs) so a pass
  *    over 100 TB of documents stays a single narrow projection — no
  *    shuffle, no python worker, no interpreter boundary.
  *  - Every function has an exact ANSI-SQL twin (used by the DuckDB
  *    oracle), so semantics are pinned down, not incidental.
  */
object TextFunctions {

  /** Lowercased whitespace tokens. `trim` first so leading/trailing blanks
    * don't produce empty tokens; empty string yields a single empty token
    * (same as DuckDB's regexp_split_to_array).
    */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Driver/executor-side twin of [[tokens]] for kernels that tokenize
    * inside typed transformations (same trim -> lower -> \s+ split;
    * blank input yields no tokens). */
  def tokenize(text: String): Array[String] = {
    val t = if (text == null) "" else text.trim.toLowerCase
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Ratio of ASCII punctuation characters to total characters.
    * Explicit char ranges (not \p{Punct}) so Java regex and RE2 agree.
    */
  def punctRatio(text: Column): Column = {
    val stripped = regexp_replace(text, "[!-/:-@\\[-`{-~]", "")
    when(length(text) === 0, lit(0.0))
      .otherwise((length(text) - length(stripped)).cast("double") / length(text))
  }

  /** English stopwords (public, minimal set). */
  val StopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "is", "it", "that", "for",
    "on", "with", "as", "at", "by", "this", "are", "was", "be", "or")

  /** Fraction of tokens that are stopwords — a classic fluency signal. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val sw = filter(toks, t => t.isin(StopwordsEn: _*))
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(sw).cast("double") / size(toks))
  }

  /** Mean token length — short-token spam / long-token garbage signal. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
          size(toks))
  }

  /** Composite quality score in [0,1]: rewards stopword presence and
    * moderate length, penalizes punctuation soup. Deliberately simple —
    * the value is having SOME deterministic quality axis to filter on.
    */
  /** Gopher-style quality-rule battery (Rae et al., "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher",
    * arXiv:2112.11446 §A1.1 — public filtering heuristics, the battery
    * behind most published web-corpus pipelines): per-document metrics
    * plus the conjunctive pass flag. Every metric is integer counts and
    * one double division in a fixed op order — no transcendentals — so
    * the whole battery is oracle-exact on any IEEE engine (the repo's
    * determinism discipline). Thresholds are the published ones:
    * 50 <= words <= 100k, mean word length in [3,10], duplicate-line
    * fraction <= 0.30, bullet-start lines <= 0.90, ellipsis-end lines
    * <= 0.30, >= 2 stopwords, >= 80% words with an alphabetic char.
    * Returns a struct; select `.getField`s or `col("g.*")`.
    */
  def gopherRules(text: Column): Column = {
    val toks = tokens(text)
    val nWords = size(toks).cast("long")
    val lenSum = aggregate(
      transform(toks, w => length(w).cast("long")), lit(0L), (a, x) => a + x)
    val meanLen = when(nWords === 0, lit(0.0))
      .otherwise(lenSum.cast("double") / nWords.cast("double"))
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletFrac = size(filter(lines, l => ltrim(l).rlike("^[-*•]")))
      .cast("double") / nLines.cast("double")
    val ellipsisFrac =
      size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$")))
        .cast("double") / nLines.cast("double")
    val dupLineFrac = (nLines - size(array_distinct(lines)).cast("long"))
      .cast("double") / nLines.cast("double")
    val stopCount =
      size(filter(toks, t => t.isin(StopwordsEn: _*))).cast("long")
    val alphaFrac = when(nWords === 0, lit(0.0))
      .otherwise(size(filter(toks, w => w.rlike("[a-zA-Z]")))
        .cast("double") / nWords.cast("double"))
    val pass = nWords >= 50 && nWords <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      dupLineFrac <= 0.3 && bulletFrac <= 0.9 && ellipsisFrac <= 0.3 &&
      stopCount >= 2 && alphaFrac >= 0.8
    struct(nWords.as("n_words"), meanLen.as("mean_word_len"),
      dupLineFrac.as("dup_line_frac"), bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"), stopCount.as("stopword_count"),
      alphaFrac.as("alpha_word_frac"), pass.as("gopher_pass"))
  }

  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / lit(500.0), lit(1.0))
    val sw = least(stopwordRatio(text) * 4.0, lit(1.0))
    val punct = greatest(lit(1.0) - punctRatio(text) * 5.0, lit(0.0))
    (lenScore + sw + punct) / 3.0
  }

  /** Language marker words. On real corpora these would be the top
    * function words per language; the mechanism (count marker hits,
    * argmax with deterministic tie-break) is what matters.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "pour"),
    "es" -> Seq("el", "los", "las", "y", "es", "una", "que", "por"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不"))

  /** N-gram/stopword heuristic language ID. Returns the language whose
    * marker-word hit count is highest; ties broken by language code order
    * (deterministic); zero hits => "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores: Seq[(String, Column)] = LangMarkers.map { case (lang, ws) =>
      lang -> size(filter(toks, t => t.isin(ws: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight builds the when-chain with "en" outermost, so the FIRST
    // language reaching the max wins (en > de > fr > es > zh).
    scores.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && s > 0, lit(lang)).otherwise(els)
    }
  }

  /** Polynomial rolling hash of the full text, mod 1e9+7 — a document
    * fingerprint that both Spark and ANSI SQL can compute exactly
    * (all arithmetic stays far below 2^63: acc < 1e9+7, *31 + codepoint
    * < ~3.3e10).
    *
    * DuckDB twin:
    *   list_reduce([0] || [unicode(c) for c in text], (a,c) -> (a*31+c) % 1000000007)
    */
  def fingerprint(text: Column): Column = {
    // Java split keeps a trailing empty string (limit -1); drop empties so
    // the fold sees exactly one code point per character, like the oracle.
    val chars = filter(split(text, ""), c => length(c) > 0)
    val codes = transform(chars, c => ascii(c).cast("long"))
    aggregate(codes, lit(0L), (acc, c) => (acc * 31L + c) % 1000000007L)
  }

  /** Character n-gram shingles (lowercased), distinct. */
  def charShingles(text: Column, n: Int): Column = {
    val t = lower(text)
    array_distinct(
      transform(sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
        i => substring(t, i, lit(n))))
  }

  /** Word n-gram shingles, distinct, first-seen order — the unit for
    * Jaccard similarity. Native single-pass expression; identical output
    * to the declarative
    * `array_distinct(transform(sequence, i => concat_ws(slice)))` form
    * (and to the DuckDB oracle twin), without per-shingle allocation.
    */
  def wordShingles(text: Column, n: Int): Column =
    graft.expressions.kernels.toCol(
      graft.expressions.WordNGrams(
        graft.expressions.kernels.toExpr(tokens(text)), n))

  // ---- Repetition signals (Gopher-style quality rules) ---------------------
  // Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1) filter
  // documents by duplicate-line/n-gram fractions. Our corpus is single-line,
  // so the signals are word-n-gram based; all are pure Column expressions
  // (per-document, no shuffle — a narrow projection over 100 TB).

  /** ALL word n-grams in order (NOT distinct — the counting unit for
    * repetition signals; empty when the document has fewer than n tokens).
    */
  def wordNGramsAll(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Fraction of tokens that are repeats of an earlier token: 1 - |distinct|/|all|. */
  def dupTokenFrac(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Fraction of n-gram occurrences taken by the single most frequent
    * n-gram — high values mean templated/looping text.
    */
  def topNGramFrac(text: Column, n: Int): Column = {
    val gs = wordNGramsAll(text, n)
    val counts = transform(array_distinct(gs), g => size(filter(gs, x => x === g)))
    when(size(gs) === 0, lit(0.0))
      .otherwise(array_max(counts).cast("double") / size(gs))
  }

  /** Fraction of n-grams that are duplicates of an earlier n-gram. */
  def dupNGramFrac(text: Column, n: Int): Column = {
    val gs = wordNGramsAll(text, n)
    when(size(gs) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(gs)).cast("double") / size(gs))
  }

  // ---- PII scrubbing (C4-style cleanup) ------------------------------------
  // Raffel et al. 2020 (C4) scrub pages by pattern filters before training.
  // Patterns stay in the Java-regex ∩ RE2 subset (no lookahead/backrefs) so
  // the DuckDB oracle twin matches byte for byte; replacement is codegen'd
  // regexp_replace — no UDF in the 100 TB path.

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhonePattern = "\\+?[0-9][0-9-]{6,}[0-9]"

  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Redact emails, then IPv4s, then phone-shaped digit runs (order matters:
    * the phone pattern would otherwise eat fragments of dotted IPs).
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")
}
