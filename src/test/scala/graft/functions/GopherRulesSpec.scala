package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions._

class GopherRulesSpec extends SparkSpec {

  private def metrics(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("id", "text")
      .select(gopherRules(col("text")).as("g")).select(col("g.*"))
      .head()
  }

  test("clean prose passes; every metric is exact") {
    val words = (Seq("the", "a") ++ (1 to 60).map(i => s"word$i"))
    val m = metrics(words.mkString(" "))
    assert(m.getAs[Long]("n_words") == 62)
    assert(m.getAs[Long]("stopword_count") == 2)
    assert(m.getAs[Double]("alpha_word_frac") == 1.0)
    assert(m.getAs[Double]("dup_line_frac") == 0.0)
    assert(m.getAs[Boolean]("gopher_pass"))
  }

  test("each rule flips the pass flag on its own") {
    val base = (Seq("the", "a") ++ (1 to 60).map(i => s"word$i")).mkString(" ")
    // too short
    assert(!metrics("the a word").getAs[Boolean]("gopher_pass"))
    // bullet-heavy lines (every line bullet-started -> frac 1.0 > 0.9)
    val bullets = (1 to 10).map(i => s"- $base").mkString("\n")
    val mb = metrics(bullets)
    assert(mb.getAs[Double]("bullet_line_frac") == 1.0)
    assert(!mb.getAs[Boolean]("gopher_pass"))
    // ellipsis-ended lines beyond 0.3
    val ell = (1 to 10).map(_ => s"$base ...").mkString("\n")
    val me = metrics(ell)
    assert(me.getAs[Double]("ellipsis_line_frac") == 1.0)
    assert(!me.getAs[Boolean]("gopher_pass"))
    // duplicate lines: 10 identical lines -> dup frac 0.9 > 0.3
    val dup = (1 to 10).map(_ => base).mkString("\n")
    val md = metrics(dup)
    assert(md.getAs[Double]("dup_line_frac") == 0.9)
    assert(!md.getAs[Boolean]("gopher_pass"))
    // numeric garbage: alpha fraction collapses
    val nums = (Seq("the", "a") ++ (1 to 60).map(i => s"$i$i$i")).mkString(" ")
    val mn = metrics(nums)
    assert(mn.getAs[Double]("alpha_word_frac") < 0.8)
    assert(!mn.getAs[Boolean]("gopher_pass"))
    // no stopwords
    val noStop = (1 to 60).map(i => s"word$i").mkString(" ")
    assert(!metrics(noStop).getAs[Boolean]("gopher_pass"))
    // mean word length out of range (single-char words)
    val shortWords = (Seq("the", "a") ++ (1 to 60).map(_ => "x")).mkString(" ")
    assert(!metrics(shortWords).getAs[Boolean]("gopher_pass"))
  }

  test("the battery is a pure projection: zero exchanges in the plan") {
    val df = spark.read.parquet(sf("documents"))
      .select(col("doc_id"), gopherRules(col("text")).as("g"))
      .filter(col("g.gopher_pass"))
    df.collect()
    val shuffles = df.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(shuffles.isEmpty, "corpus-wide quality filtering must not shuffle")
  }

  test("empty text degenerates safely (no division blow-up, fails the filter)") {
    // split('', '\s+') is [""] on BOTH Spark and DuckDB — one empty
    // token, length 0 (the engine-consistent degenerate the oracle
    // relies on); all ratios stay finite and the doc fails the filter
    val m = metrics("")
    assert(m.getAs[Long]("n_words") == 1)
    assert(m.getAs[Double]("mean_word_len") == 0.0)
    assert(m.getAs[Double]("alpha_word_frac") == 0.0)
    assert(!m.getAs[Boolean]("gopher_pass"))
  }
}
