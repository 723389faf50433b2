package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Measures bloom semi-join reduction (q52's operator) at replicated
  * scale with broadcast disabled — the regime it exists for: the dim
  * side is too big to broadcast, so the plain plan shuffles the ENTIRE
  * fact table into the exchange; the bloom probe kills non-matching
  * fact rows in the scan stage first.
  *
  * Run: sbt "runMain graft.BloomProbe" (SPARK_GRAFT_REPLICAS=10).
  */
object BloomProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val replicas = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)

    val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select((col("l_orderkey") * 100 + col("rep")).as("fk"),
        col("l_quantity"))
      .persist()
    val fact = li.count()
    // selective dim: urgent orders only (~20% of keys), replicated
    val dim = Tables.load(spark, "/root/testdata/sf0.1", "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select((col("o_orderkey") * 100 + col("rep")).as("dk"))
      .persist()
    val dimN = dim.count()

    def agg(f: org.apache.spark.sql.DataFrame) =
      f.join(dim, f("fk") === dim("dk"))
        .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(38,6)")))
        .collect()

    val (_, tPlain) = time(agg(li))
    val ((reduced, surviving), tBloomBuildFilter) = time {
      val r = Relational.bloomSemiJoinReduce(li, "fk", dim, "dk",
        expectedItems = dimN).persist()
      (r, r.count())
    }
    val (_, tBloomJoin) = time(agg(reduced))
    println(f"[bloomprobe] ${replicas}x fact=$fact%,d dim=$dimN%,d: " +
      f"plain join $tPlain%.1fs (shuffles $fact%,d fact rows); " +
      f"bloom build+filter $tBloomBuildFilter%.1fs -> $surviving%,d " +
      f"survivors (${surviving * 100.0 / fact}%.1f%%), " +
      f"reduced join $tBloomJoin%.1fs")
    spark.stop()
  }
}
