package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KllSketchSpec extends SparkSpec {

  test("exact regime (n <= k): quantiles are exact discrete order statistics") {
    val k = 1024
    val df = spark.range(1, 101).select(col("id").cast("double").as("v"))
    val sk = df.agg(Kll.sketch(col("v"), k).as("sk"))
    val r = sk.select(
      Kll.quantile(col("sk"), 0.5).as("p50"),
      Kll.quantile(col("sk"), 0.95).as("p95"),
      Kll.quantile(col("sk"), 0.0).as("p0"),
      Kll.quantile(col("sk"), 1.0).as("p100")).head()
    assert(r.getDouble(0) == 50.0) // ceil(0.5*100) = 50th of 1..100
    assert(r.getDouble(1) == 95.0)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 100.0)
  }

  test("compacted regime: rank error bounded at 1M values (k=256)") {
    val n = 1000000L
    val df = spark.range(n).select(col("id").cast("double").as("v"))
    val sk = df.agg(Kll.sketch(col("v"), 256).as("sk"))
    val r = sk.select(
      Kll.quantile(col("sk"), 0.5).as("p50"),
      Kll.quantile(col("sk"), 0.99).as("p99")).head()
    // uniform 0..n: value == rank, so |est - q*n| / n is the rank error
    assert(math.abs(r.getDouble(0) - 0.5 * n) / n < 0.03,
      s"p50 ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1) - 0.99 * n) / n < 0.03,
      s"p99 ${r.getDouble(1)}")
  }

  test("merge of persisted partials stays within bounds; exact regime merges exactly") {
    // exact regime: group sketches of 10 items each, merged -> all 100
    // items present, quantiles exact
    val df = spark.range(1, 101).select((col("id") % 10).as("g"),
      col("id").cast("double").as("v"))
    val partials = df.groupBy("g").agg(Kll.sketch(col("v"), 1024).as("sk"))
    val merged = partials.agg(Kll.merge(col("sk"), 1024).as("m"))
    val r = merged.select(Kll.quantile(col("m"), 0.5),
      size(col("m.values"))).head()
    assert(r.getInt(1) == 100)
    assert(r.getDouble(0) == 50.0)
    // compacted regime: merged partials vs direct, both within bounds
    val n = 200000L
    val big = spark.range(n).select((col("id") % 37).as("g"),
      col("id").cast("double").as("v"))
    val mBig = big.groupBy("g").agg(Kll.sketch(col("v"), 256).as("sk"))
      .agg(Kll.merge(col("sk"), 256).as("m"))
      .select(Kll.quantile(col("m"), 0.9)).head().getDouble(0)
    assert(math.abs(mBig - 0.9 * n) / n < 0.04, s"merged p90 $mBig")
  }

  test("non-double input rejected; empty sketch yields NaN") {
    val e = intercept[Exception] {
      spark.range(5).agg(Kll.sketch(col("id"), 256)).head()
    }
    assert(e.getMessage.toLowerCase.contains("kll") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
    val empty = spark.range(0).select(col("id").cast("double").as("v"))
      .agg(Kll.sketch(col("v"), 256).as("sk"))
      .select(Kll.quantile(col("sk"), 0.5)).head().getDouble(0)
    assert(empty.isNaN)
  }
}
