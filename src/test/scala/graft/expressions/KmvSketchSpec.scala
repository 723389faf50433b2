package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSketchSpec extends SparkSpec {

  private val k = 256

  test("below-k inputs are EXACT: sketch holds every distinct hash") {
    val df = spark.range(100).select(xxhash64(col("id")).as("h"))
    val sk = df.agg(Kmv.sketch(col("h"), k).as("sk"))
      .select(size(col("sk")).as("n"),
        Kmv.estimate(col("sk"), k).as("est"))
      .head()
    assert(sk.getInt(0) == 100)
    assert(sk.getDouble(1) == 100.0)
  }

  test("estimate within 3-sigma of exact at 100k distinct (k=256, rse ~6.3%)") {
    val n = 100000L
    val df = spark.range(n).select(xxhash64(col("id")).as("h"))
    val est = df.agg(Kmv.sketch(col("h"), k).as("sk"))
      .select(Kmv.estimate(col("sk"), k)).head().getDouble(0)
    val err = math.abs(est - n) / n.toDouble
    assert(err < 0.19, s"estimate $est vs $n: err $err")
  }

  test("sketch is merge-order independent: repartitioned input, same sketch") {
    val df = spark.range(50000).select(xxhash64(col("id")).as("h"))
    def sk(parts: Int): Seq[Long] = df.repartition(parts)
      .agg(Kmv.sketch(col("h"), k).as("sk"))
      .head().getSeq[Long](0)
    assert(sk(1) == sk(13))
  }

  test("duplicates don't perturb: distinct-ness is over hash values") {
    val base = spark.range(5000).select(xxhash64(col("id")).as("h"))
    val dup = base.union(base).union(base)
    val a = base.agg(Kmv.sketch(col("h"), k)).head().getSeq[Long](0)
    val b = dup.agg(Kmv.sketch(col("h"), k)).head().getSeq[Long](0)
    assert(a == b)
  }

  test("union and intersection estimates track constructed overlap") {
    // A = [0, 60k), B = [40k, 100k): |A|=|B|=60k, |A∪B|=100k, |A∩B|=20k
    val a = spark.range(0, 60000).select(xxhash64(col("id")).as("h"))
      .agg(Kmv.sketch(col("h"), k).as("a"))
    val b = spark.range(40000, 100000).select(xxhash64(col("id")).as("h"))
      .agg(Kmv.sketch(col("h"), k).as("b"))
    val r = a.crossJoin(b).select(
      Kmv.estimate(Kmv.union(col("a"), col("b"), k), k).as("u"),
      Kmv.intersectEstimate(col("a"), col("b"), k).as("i")).head()
    val (u, i) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(u - 100000) / 100000.0 < 0.19, s"union est $u")
    // intersection: binomial on rho=0.2 at k=256 plus union error —
    // 3 sigma lands near 40% relative; the deterministic measured error
    // is far smaller, this bound is the never-flake ceiling
    assert(math.abs(i - 20000) / 20000.0 < 0.40, s"intersect est $i")
  }

  test("merge of partial sketches is LOSSLESS vs direct sketch of the raw data") {
    // per-group sketches (the persisted-cube shape), merged back, must
    // equal the sketch built in one pass over everything
    val df = spark.range(200000)
      .select(col("id"), (col("id") % 37).as("g"),
        xxhash64(col("id") % 70000).as("h"))
    val partials = df.groupBy("g").agg(Kmv.sketch(col("h"), k).as("sk"))
    val merged = partials.agg(Kmv.merge(col("sk"), k)).head().getSeq[Long](0)
    val direct = df.agg(Kmv.sketch(col("h"), k)).head().getSeq[Long](0)
    assert(merged == direct)
  }

  test("non-sketch input to merge is rejected at analysis") {
    val df = spark.range(10).select(col("id"))
    val e = intercept[Exception] {
      df.agg(Kmv.merge(col("id"), k)).head()
    }
    assert(e.getMessage.toLowerCase.contains("kmv") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("non-long input is rejected at analysis") {
    val df = spark.range(10).select(col("id").cast("string").as("s"))
    val e = intercept[Exception] {
      df.agg(Kmv.sketch(col("s"), k)).head()
    }
    assert(e.getMessage.toLowerCase.contains("kmv") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
