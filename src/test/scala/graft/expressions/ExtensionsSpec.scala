package graft.expressions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions (installed on the
  * shared test session via `.withExtensions(new GraftExtensions)` —
  * extensions bind at session BUILD time, so `getOrCreate` against an
  * existing session would silently skip them).
  */
class ExtensionsSpec extends graft.SparkSpec {

  test("cosine_sim / simhash64 / minhash_signature / hyperplane_sigs in SQL") {
    val r = spark.sql(
      """SELECT
        cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c1,
        cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c0,
        simhash64(array('the', 'quick', 'fox')) AS sh,
        minhash_signature(array('a b c', 'b c d'), 4, 42L) AS mh,
        hyperplane_sigs(array(CAST(0.5 AS FLOAT), CAST(-0.2 AS FLOAT)), 4, 2, 42L) AS hp
      """).collect()(0)
    assert(r.getAs[Double]("c1") == 1.0)
    assert(r.getAs[Double]("c0") == 0.0)
    assert(r.getAs[Long]("sh") != 0L)
    assert(r.getSeq[Long](3).length == 4)
    assert(r.getSeq[Long](4).length == 2)
    // SQL result equals the column-API result on the same input
    import org.apache.spark.sql.functions._
    val viaApi = spark.range(1).select(
      graft.functions.VectorFunctions.cosine(
        array(lit(1.0), lit(0.0)), array(lit(1.0), lit(0.0))).as("c"))
      .collect()(0).getDouble(0)
    assert(viaApi == r.getAs[Double]("c1"))
  }

  test("sketch aggregates from SQL text: kmv_sketch / kmv_merge / top_keys") {
    spark.range(1000).select((col("id") % 40).as("g"),
      concat(lit("u"), col("id") % 25).as("u"))
      .createOrReplaceTempView("ext_ev")
    // group sketches in SQL, merged in SQL — estimate equals the exact
    // distinct (below-k regime)
    val est = spark.sql(
      """SELECT kmv_merge(sk, 256) AS m FROM (
           SELECT g, kmv_sketch(xxhash64(u), 256) AS sk
           FROM ext_ev GROUP BY g)""")
      .select(org.apache.spark.sql.functions.size(col("m"))).head().getInt(0)
    assert(est == 25)
    val tk = spark.sql(
      "SELECT top_keys(u, 64) AS t FROM ext_ev")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(tk.size == 25 && tk.map(_.getLong(1)).sum == 1000)
    // KLL from SQL: group sketches merged, median of 0..999 (exact regime)
    val med = spark.sql(
      """SELECT kll_quantile(kll_merge(sk, 2048), 0.5) AS m FROM (
           SELECT g, kll_sketch(CAST(id0 AS DOUBLE), 2048) AS sk
           FROM (SELECT g, u, row_number() OVER (ORDER BY g, u) - 1 AS id0
                 FROM ext_ev) GROUP BY g)""")
      .head().getDouble(0)
    assert(med == 499.0, s"median $med")
  }

  test("sorted-long intersect and hashed minhash kernels: edge cases") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup

    def inter(a: Seq[Long], b: Seq[Long]): Double = spark.range(1).select(
      Dedup.jaccardHashed(
        array(a.map(lit(_)): _*).cast("array<long>"),
        array(b.map(lit(_)): _*).cast("array<long>")).as("j"))
      .collect()(0).getDouble(0)

    assert(inter(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)) == 0.5) // 2/4
    assert(inter(Seq(1L, 2L), Seq(3L, 4L)) == 0.0)         // disjoint
    assert(inter(Seq(1L, 2L), Seq(1L, 2L)) == 1.0)         // identical
    assert(inter(Seq.empty, Seq.empty) == 0.0)             // both empty -> 0

    // hashed minhash: identical hash sets -> identical signatures;
    // order-independent (sets, not sequences)
    val sigs = spark.range(1).select(
      Dedup.minhashSignatureHashed(
        array(lit(7L), lit(11L), lit(13L)), 16).as("a"),
      Dedup.minhashSignatureHashed(
        array(lit(13L), lit(7L), lit(11L)), 16).as("b"),
      Dedup.minhashSignatureHashed(
        array(lit(70L), lit(110L), lit(130L)), 16).as("c"))
      .collect()(0)
    assert(sigs.getSeq[Long](0) == sigs.getSeq[Long](1))
    assert(sigs.getSeq[Long](0) != sigs.getSeq[Long](2))
    assert(sigs.getSeq[Long](0).length == 16)
  }
}
