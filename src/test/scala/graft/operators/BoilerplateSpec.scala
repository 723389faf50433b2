package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha\nSHARED FOOTER\nbody one"),
      (2L, "beta\nSHARED FOOTER\n\nbody two"),
      (3L, "SHARED FOOTER\ngamma"),
      (4L, "delta only"),
      (5L, "SHARED FOOTER")) // nothing but boilerplate
      .toDF("doc_id", "text")
  }

  test("removeFrequentLines drops cross-doc lines, keeps order and blanks") {
    val out = Boilerplate.removeFrequentLines(corpus, "doc_id", "text",
        minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "alpha\nbody one",
      2L -> "beta\n\nbody two", // the blank line is kept, not counted
      3L -> "gamma",
      4L -> "delta only"))
    // doc 5 was nothing but boilerplate: dropped entirely
    assert(!out.contains(5L))
  }

  test("blank lines never count as boilerplate even when universal") {
    import spark.implicits._
    val d = Seq((1L, "a\n\nx"), (2L, "b\n\ny"), (3L, "c\n\nz"))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentLines(d, "doc_id", "text", 2)
      .collect().map(_.getString(1)).toSet
    assert(out == Set("a\n\nx", "b\n\ny", "c\n\nz"))
  }

  test("delimiter is literal, not regex") {
    import spark.implicits._
    val d = Seq((1L, "keep.AD.keep2"), (2L, "other.AD.more"),
      (3L, "third.AD.third2")).toDF("doc_id", "text")
    val out = Boilerplate.removeFrequentLines(d, "doc_id", "text",
        minDocs = 3, delimiter = ".")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "keep.keep2", out(1L))
  }

  test("broadcast path: plan stays handle-sized at the 100k-line cap") {
    import spark.implicits._
    // the calibrated set travels as a broadcast variable, not a plan
    // literal: with 100k distinct lines (~2 MB of strings) the executed
    // plan must stay small — a literal-map implementation would embed
    // every line in the plan string and codegen input
    val big = (0 until 100000).map(i => s"boilerplate line number $i")
    val docs = Seq((1L, s"keep me\nboilerplate line number 7\nand me"))
      .toDF("doc_id", "text")
    val out = Boilerplate.removeLinesBroadcast(docs, "text", big)
    val planChars = out.queryExecution.executedPlan.toString.length
    assert(planChars < 100000,
      s"plan carries the vocabulary ($planChars chars) — must be a " +
        "broadcast handle, not a literal")
    assert(out.collect().map(_.getString(1)).toSeq == Seq("keep me\nand me"))
  }

  test("null-text docs pass through as NULL in batch AND broadcast paths") {
    import spark.implicits._
    val withNull = corpus.unionByName(
      Seq((6L, null: String)).toDF("doc_id", "text"))
    val batch = Boilerplate.removeFrequentLines(withNull, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(batch.contains(6L) && batch(6L).isEmpty,
      s"null-text doc must survive with NULL text, got $batch")
    // non-null docs unaffected by the null-preserving rebuild
    assert(batch(1L).contains("alpha\nbody one"))
    assert(!batch.contains(5L), "fully-boilerplate doc still drops")
    val bc = Boilerplate.removeLinesBroadcast(withNull, "text",
        Seq("SHARED FOOTER"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(bc(6L).isEmpty, "broadcast path keeps NULL as NULL")
  }

  test("calibrated broadcast path equals the batch rebuild on surviving docs") {
    val bp = Boilerplate.frequentLines(corpus, "doc_id", "text", minDocs = 3)
    assert(bp == Seq("SHARED FOOTER"))
    val viaSet = Boilerplate.removeLinesBroadcast(corpus, "text", bp)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val batch = Boilerplate.removeFrequentLines(corpus, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    batch.foreach { case (k, v) => assert(viaSet(k) == v, s"doc $k") }
    // the one documented divergence: a fully-boilerplate doc stays as
    // an empty string in the stateless projection
    assert(viaSet(5L) == "")
    // empty calibrated set = identity
    val id = Boilerplate.removeLinesBroadcast(corpus, "text", Nil)
      .collect().map(_.getString(1)).toSet
    assert(id == corpus.collect().map(_.getString(1)).toSet)
    // the bounded-collect contract fails loudly
    intercept[IllegalArgumentException] {
      Boilerplate.frequentLines(corpus, "doc_id", "text", minDocs = 2,
        maxLines = 0)
    }
  }
}
