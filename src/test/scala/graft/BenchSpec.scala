package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The bench harness must FAIL LOUDLY (round-7 verdict #3): a crashing
  * query becomes a named entry in the failed list and a nonzero exit, not
  * a silent -1.0 sentinel inside an exit-0 "clean" run.
  */
class BenchSpec extends SparkSpec {
  private val ok: (SparkSession, String) => DataFrame =
    (s, _) => s.range(10).toDF("id")
  // analysis-time failure — the exact shape of the round-7 fixture break
  // (DATATYPE_MISMATCH at plan analysis, before any task runs)
  private val boom: (SparkSession, String) => DataFrame =
    (s, _) => s.range(1).selectExpr("no_such_column + 1")
  // execution-time failure — must survive count()'s projection pruning,
  // so the failing expression sits in a filter, not a pruned select
  private val boomExec: (SparkSession, String) => DataFrame =
    (s, _) => s.range(1).toDF("id")
      .filter("assert_true(id > 0, 'deliberately broken') IS NULL")

  test("a deliberately broken query fails the run with exit code 1") {
    val outcomes = Bench.run(spark, "unused",
      Seq("good" -> ok, "broken" -> boom, "brokenExec" -> boomExec), passes = 1)
    val byName = outcomes.map(o => o.name -> o).toMap
    assert(byName("good").minSec.exists(_ >= 0))
    assert(byName("good").err.isEmpty)
    assert(byName("broken").minSec.isEmpty, "analysis failure must not report a time")
    assert(byName("broken").err.isDefined, "analysis failure must carry its error")
    assert(byName("brokenExec").minSec.isEmpty, "runtime failure must not report a time")
    assert(Bench.exitCode(outcomes) == 1)
  }

  test("an all-green run exits 0 with an empty failed list") {
    val outcomes = Bench.run(spark, "unused", Seq("a" -> ok, "b" -> ok), passes = 2)
    assert(outcomes.forall(_.minSec.isDefined))
    assert(outcomes.forall(_.spans.size == 2), "every pass records a span")
    assert(Bench.exitCode(outcomes) == 0)
  }

  test("warmup passes execute but leave no recorded samples") {
    var calls = 0
    val counting: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame =
      (s, _) => { calls += 1; s.range(1).toDF() }
    val outcomes = Bench.run(spark, "unused", Seq("a" -> counting),
      passes = 2, warmupPasses = 1)
    assert(calls == 3, s"1 warmup + 2 measured, got $calls")
    assert(outcomes.head.samples.size == 2,
      "warmup must not contribute a sample")
    // median: upper median of the recorded samples only
    assert(outcomes.head.medianSec.contains(outcomes.head.samples.sorted
      .apply(1)))
  }

  test("per-pass samples and mean are recorded alongside the min") {
    val outcomes = Bench.run(spark, "unused", Seq("a" -> ok), passes = 3)
    val o = outcomes.head
    assert(o.samples.size == 3, "one sample per pass")
    assert(o.minSec.contains(o.samples.min))
    assert(o.meanSec.exists(m => math.abs(m - o.samples.sum / 3) < 1e-12))
  }

  test("movers flags >=1.5x regressions vs a previous record, with spread") {
    val outcomes = Seq(
      Bench.Outcome("slow", Some(3.0), List(3.0, 3.1), Nil, None),
      Bench.Outcome("same", Some(1.0), List(1.0, 1.05), Nil, None),
      Bench.Outcome("new_query", Some(2.0), List(2.0), Nil, None),
      Bench.Outcome("failed", None, Nil, Nil, Some("x")))
    val prev = Map("slow" -> 1.0, "same" -> 0.9, "failed" -> 1.0)
    val lines = Bench.movers(outcomes, prev)
    assert(lines.size == 1, s"only the 3x mover is flagged: $lines")
    assert(lines.head.contains("slow") && lines.head.contains("3.00x"))
    assert(lines.head.contains("spread="), "spread annotation present")
  }

  test("regressions normalizes per-gate ratios by the board median so " +
      "uniform machine variance cancels and only true movers surface") {
    // the whole board ran 1.4x slower (machine variance) EXCEPT one
    // gate that genuinely tripled: only that gate may surface
    val baseline = Map("a" -> 1.0, "b" -> 2.0, "c" -> 4.0, "d" -> 1.0,
      "tiny" -> 0.01)
    val outcomes = Seq(
      Bench.Outcome("a", Some(1.4), List(1.4), Nil, None),
      Bench.Outcome("b", Some(2.8), List(2.8), Nil, None),
      Bench.Outcome("c", Some(5.6), List(5.6), Nil, None),
      Bench.Outcome("d", Some(3.0), List(3.0), Nil, None), // 3.0x raw
      // tiny gates below the floor never flag (pure jitter at sf0.1)
      Bench.Outcome("tiny", Some(0.05), List(0.05), Nil, None),
      Bench.Outcome("nobaseline", Some(9.0), List(9.0), Nil, None),
      Bench.Outcome("failed", None, Nil, Nil, Some("x")))
    val regs = Bench.regressions(outcomes, baseline)
    assert(regs.map(_._1) == Seq("d"), s"only the true mover flags: $regs")
    val (_, raw, norm) = regs.head
    assert(math.abs(raw - 3.0) < 1e-9)
    assert(norm > 1.5 && norm < 3.0,
      s"normalized by the 1.4x board median: $norm")
    // a uniformly-slower board with no true mover flags nothing
    val uniform = Seq(
      Bench.Outcome("a", Some(1.4), List(1.4), Nil, None),
      Bench.Outcome("b", Some(2.8), List(2.8), Nil, None),
      Bench.Outcome("c", Some(5.6), List(5.6), Nil, None))
    assert(Bench.regressions(uniform, baseline).isEmpty)
    assert(Bench.regressions(outcomes, Map.empty).isEmpty,
      "no baseline = record-only, never block")
  }

  test("parsePrevQueries reads the queries map out of a bench record line") {
    val line = """{"metric":"total","value":5.0,"queries":{"q1":1.25,"q2":3.75},"mean":{"q1":1.3},"failed":[],"sf":"x","passes":3}"""
    val m = Bench.parsePrevQueries(line)
    assert(m == Map("q1" -> 1.25, "q2" -> 3.75))
    assert(Bench.parsePrevQueries("not json").isEmpty)
  }

  test("a query that fails in only one pass still counts as failed") {
    // failure is sticky across passes: a flaky crash must not be masked by
    // a later lucky pass (min() is for noise, not for exceptions)
    var calls = 0
    val flaky: (SparkSession, String) => DataFrame = (s, _) => {
      calls += 1
      if (calls == 1) throw new RuntimeException("first-pass crash")
      s.range(10).toDF("id")
    }
    val outcomes = Bench.run(spark, "unused", Seq("flaky" -> flaky), passes = 2)
    assert(outcomes.head.minSec.isEmpty)
    assert(Bench.exitCode(outcomes) == 1)
  }

  test("appendedBaselineJson adds new gates without moving existing " +
      "entries, and parsePrevQueries round-trips it") {
    val base = Map("q1" -> 1.5, "m48" -> 9.6)
    val json = Bench.appendedBaselineJson(base,
      Seq("m83" -> 6.0, "q1" -> 99.0), passes = 3, sf = "/sf0.1")
    val back = Bench.parsePrevQueries(json)
    assert(back == Map("q1" -> 1.5, "m48" -> 9.6, "m83" -> 6.0),
      s"existing entries must not move, new ones append: $back")
    assert(json.contains("\"sf\":\"/sf0.1\""))
  }
}
