package graft.expressions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKeysSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.head().getSeq[Row](0).map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))

  test("no-eviction regime is EXACT and merge-order independent") {
    val df = spark.range(10000)
      .select(concat(lit("k"), col("id") % 50).as("key"))
    val expected = df.groupBy("key").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(1)))
      .sortBy { case (k, c, _) => (-c, k) }.toSeq
    val a = rows(df.agg(TopKeys.agg(col("key"), 256)))
    val b = rows(df.repartition(17).agg(TopKeys.agg(col("key"), 256)))
    assert(a == expected)
    assert(b == expected)
  }

  test("eviction regime: every key above N/capacity is present with valid bounds") {
    // 1 hot key (5000 rows) + 400 cold keys (10 rows each): N = 9000,
    // capacity 64 -> guarantee threshold N/64 ~ 141; only 'hot' exceeds it
    val hot = spark.range(5000).select(lit("hot").as("key"))
    val cold = spark.range(4000)
      .select(concat(lit("cold"), col("id") % 400).as("key"))
    val df = hot.union(cold).repartition(13)
    val got = rows(df.agg(TopKeys.agg(col("key"), 64)))
    assert(got.size == 64)
    val hotRow = got.find(_._1 == "hot")
    assert(hotRow.isDefined, "guaranteed heavy hitter missing")
    val (_, hi, lo) = hotRow.get
    assert(lo <= 5000 && 5000 <= hi, s"bounds [$lo,$hi] exclude true 5000")
    // and it ranks first — its lower bound dominates every other upper
    assert(got.head._1 == "hot")
  }

  test("lazy-heap eviction is bit-identical to the reference min-scan form") {
    // reference SpaceSaving with the ORIGINAL full-scan eviction
    // (smallest count, then smallest key) — the heap rewrite's contract
    def refOffer(m: scala.collection.mutable.LinkedHashMap[String, Array[Long]],
                 cap: Int, key: String, cnt: Long, err: Long): Unit =
      m.get(key) match {
        case Some(cur) => cur(0) += cnt; cur(1) += err
        case None if m.size < cap => m(key) = Array(cnt, err); ()
        case None =>
          val (minKey, minV) = m.minBy { case (k, v) => (v(0), k) }
          m.remove(minKey)
          m(key) = Array(minV(0) + cnt, minV(0) + err)
          ()
      }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 25) {
      val cap = 4 + rnd.nextInt(12)
      val keys = Seq.fill(300)(s"k${rnd.nextInt(40)}")
      // reference: sequential stream
      val ref = scala.collection.mutable.LinkedHashMap[String, Array[Long]]()
      keys.foreach(k => refOffer(ref, cap, k, 1L, 0L))
      // heap form, including a merge split at a random point (merge
      // offers (cnt, err) batches — the same offer path)
      val agg = TopKeysAgg(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), cap)
      val buf = agg.createAggregationBuffer()
      // drive the heap buffer through the same sequential stream via
      // the serialize/deserialize roundtrip halfway (exercises rebuild)
      val half = keys.length / 2
      val offer = classOf[TopKeysAgg].getDeclaredMethods
        .find(_.getName.endsWith("offer")).get
      offer.setAccessible(true)
      keys.take(half).foreach(k =>
        offer.invoke(agg, buf, k, Long.box(1L), Long.box(0L)))
      val buf2 = agg.deserialize(agg.serialize(buf))
      keys.drop(half).foreach(k =>
        offer.invoke(agg, buf2, k, Long.box(1L), Long.box(0L)))
      val got = {
        val it = buf2.map.entrySet().iterator()
        val b = scala.collection.mutable.Map[String, (Long, Long)]()
        while (it.hasNext) { val e = it.next()
          b(e.getKey) = (e.getValue()(0), e.getValue()(1)) }
        b.toMap
      }
      val want = ref.map { case (k, v) => k -> (v(0), v(1)) }.toMap
      assert(got == want, s"trial $trial cap $cap: heap form diverged")
    }
  }

  test("nulls are skipped; non-string keys rejected at analysis") {
    val df = spark.range(100).select(
      when(col("id") % 2 === 0, concat(lit("k"), col("id") % 5)).as("key"))
    val got = rows(df.agg(TopKeys.agg(col("key"), 16)))
    assert(got.map(_._2).sum == 50)
    val e = intercept[Exception] {
      spark.range(5).agg(TopKeys.agg(col("id"), 16)).head()
    }
    assert(e.getMessage.toLowerCase.contains("top_keys") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
