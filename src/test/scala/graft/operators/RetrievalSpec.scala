package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple cherry"),     // both query terms, tf(apple)=2
      (2L, "apple date date date date date"),// one query term, longer doc
      (3L, "banana banana"),                 // one query term, short doc
      (4L, "date cherry fig")                // no query terms
    ).toDF("doc_id", "text")
  }

  private def query = {
    import spark.implicits._
    Seq((7L, "apple banana")).toDF("query_id", "qtext")
  }

  test("bm25 (log idf): matching docs only, sane ranking, exact score") {
    val got = Retrieval.bm25(corpus, "doc_id", "text",
        query, "query_id", "qtext", topK = 10)
      .orderBy("rank").collect()
    // doc 4 has no query terms: absent
    assert(got.map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
    // doc 1 matches BOTH terms (one at tf=2): must rank first
    assert(got.head.getLong(1) == 1L)
    assert(got.head.getLong(4) == 2L, "doc 1 matched both terms")
    // exact score check for doc 3 (single term, closed form):
    // N=4, S=4+6+2+3=15, avgdl=15/4; banana: df=2, tf=2, len=2
    val n = 4.0; val avgdl = 15.0 / 4.0
    val idf = math.log((n - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
    val w = idf * ((2.0 * (1.2 + 1.0)) /
      (2.0 + 1.2 * ((1.0 - 0.75) + 0.75 * (2.0 / avgdl))))
    val expected = new java.math.BigDecimal(w)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val doc3 = got.find(_.getLong(1) == 3L).get
    assert(doc3.getDouble(3) == expected,
      s"got ${doc3.getDouble(3)}, expected $expected")
  }

  test("bm25: tf saturates (k1) and length normalizes (b)") {
    import spark.implicits._
    // same tf, different lengths: shorter doc scores higher
    val c = Seq((1L, "x x filler filler filler filler filler filler"),
      (2L, "x x")).toDF("doc_id", "text")
    val q = Seq((1L, "x")).toDF("query_id", "qtext")
    val r = Retrieval.bm25(c, "doc_id", "text", q, "query_id", "qtext")
      .orderBy("rank").collect()
    assert(r.head.getLong(1) == 2L, "shorter doc ranks first at equal tf")
    // saturation: tf 100 vs tf 1 is far less than 100x the score
    val c2 = Seq((1L, ("x " * 100).trim), (2L, "x"))
      .toDF("doc_id", "text")
    val r2 = Retrieval.bm25(c2, "doc_id", "text", q, "query_id", "qtext")
      .collect().map(row => row.getLong(1) -> row.getDouble(3)).toMap
    assert(r2(1L) < r2(2L) * 25.0, s"tf must saturate, got $r2")
  }

  test("bm25 rational mode: same candidate set, deterministic reruns") {
    val a = Retrieval.bm25(corpus, "doc_id", "text", query,
      "query_id", "qtext", logIdf = false).collect()
    val b = Retrieval.bm25(corpus, "doc_id", "text", query,
      "query_id", "qtext", logIdf = false).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    assert(a.map(_.getLong(1)).toSet == Set(1L, 2L, 3L))
  }

  test("bm25ScoreBroadcast equals the batch scores bit for bit") {
    val model = Retrieval.bm25Model(corpus, "doc_id", "text",
      query, "query_id", "qtext")
    val broadcastScores = Retrieval
      .bm25ScoreBroadcast(corpus, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    val batch = Retrieval.bm25(corpus, "doc_id", "text",
        query, "query_id", "qtext", topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getLong(4))).toMap
    assert(broadcastScores == batch,
      s"broadcast $broadcastScores vs batch $batch")
  }

  test("bm25 topK truncates per query with deterministic tie-break") {
    import spark.implicits._
    // 5 identical docs: identical scores, rank by doc_id asc
    val c = (1L to 5L).map(i => (i, "x y")).toDF("doc_id", "text")
    val q = Seq((1L, "x")).toDF("query_id", "qtext")
    val r = Retrieval.bm25(c, "doc_id", "text", q, "query_id", "qtext",
      topK = 3).orderBy("rank").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
  }

  test("rrfFuse: union of candidates, single-list docs damped, exact arithmetic") {
    import spark.implicits._
    // list A ranks docs 10, 11, 12; list B ranks 11, 13 — doc 11 is the
    // only double-ranked candidate and must win despite being #2 in A
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 11L, 1), (1L, 13L, 2))
      .toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(a, b), "query_id", "doc_id", k = 60,
        topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.map(_._1).toSeq == Seq(11L, 10L, 13L, 12L), got.mkString(","))
    // exact arithmetic: doc 11 = 1/62 + 1/61; doc 10 = 1/61 (A only)
    assert(got(0)._2 == 1.0 / 62 + 1.0 / 61)
    assert(got(1)._2 == 1.0 / 61 && got(2)._2 == 1.0 / 62)
    // rank ties (same rrf) break by doc_id: two docs ranked #1 in
    // exactly one list each
    val c1 = Seq((1L, 20L, 1)).toDF("query_id", "doc_id", "rank")
    val c2 = Seq((1L, 19L, 1)).toDF("query_id", "doc_id", "rank")
    val tied = Retrieval.rrfFuse(Seq(c1, c2), "query_id", "doc_id")
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    assert(tied == Seq(19L, 20L))
    intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq(a), "query_id", "doc_id")
    }
  }
}
