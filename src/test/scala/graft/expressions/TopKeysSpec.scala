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
