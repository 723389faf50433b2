package graft

import org.apache.spark.sql.functions._

/** The plan audit must verify NLJ intent STRUCTURALLY (broadcast hint /
  * provable <=1-row side), so compositions inherit their operators'
  * justification — and a genuine cartesian still trips it.
  */
class PlanScanSpec extends SparkSpec {

  test("a planted genuine cartesian is flagged") {
    // two multi-row relations, no hint, no condition: the classic
    // accidental crossJoin — must be reported however small the inputs
    val a = spark.range(100).toDF("x")
    val b = spark.range(100).toDF("y")
    val bad = PlanScan.unjustifiedNlj(a.crossJoin(b))
    assert(bad.nonEmpty)
  }

  test("a non-equi theta join without a tiny side is flagged") {
    val a = spark.range(100).toDF("x")
    val b = spark.range(100).toDF("y")
    val bad = PlanScan.unjustifiedNlj(a.join(b, col("x") < col("y")))
    assert(bad.nonEmpty)
  }

  test("an explicit broadcast() crossjoin is intended") {
    val corpus = spark.range(1000).toDF("x")
    val tiny = spark.range(3).toDF("y")
    assert(PlanScan.unjustifiedNlj(corpus.crossJoin(broadcast(tiny))).isEmpty)
  }

  test("a scalar-aggregate (<=1 row) side is intended without a hint") {
    val corpus = spark.range(1000).toDF("x")
    val scalar = corpus.agg(avg(col("x")).as("m"))
    val df = corpus.crossJoin(scalar).filter(col("x") > col("m"))
    assert(PlanScan.unjustifiedNlj(df).isEmpty)
  }

  test("compositions inherit justification: p07 inside c07 is not flagged") {
    val dir = "/root/testdata/sf0.001"
    assert(PlanScan.unjustifiedNlj(
      SparkEntry.queries("p07_temperature_mix")(spark, dir)).isEmpty)
    assert(PlanScan.unjustifiedNlj(
      SparkEntry.queries("c07_curation_v2")(spark, dir)).isEmpty)
  }

  test("full board: no registered gate plans an unjustified nested loop") {
    // every SparkEntry gate, audited structurally at sf0.001 — the
    // regression net for the class of bug where a refactor silently
    // turns an equi-join into a cartesian (it would still pass its
    // oracle at sf0.01 and wall at scale)
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val bad =
          try PlanScan.unjustifiedNlj(fn(spark, dir))
          catch { case e: Throwable =>
            Seq(s"failed to plan: ${e.getMessage}") }
        bad.map(b => s"$name: $b")
      }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
