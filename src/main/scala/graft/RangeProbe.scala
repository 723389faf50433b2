package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Scale probe for [[Relational.rangeJoin]]: the q46 shape (lineitem
  * points vs urgent-order 3-day windows) with the fact side replicated
  * SPARK_GRAFT_REPLICAS x and broadcast DISABLED — the at-scale regime
  * where the interval side no longer fits a broadcast and Spark's plan
  * for a raw BETWEEN predicate degenerates to a nested loop. Measures
  * the binned equi-join against that nested-loop form on identical
  * inputs (same aggregate, same result count).
  */
object RangeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    def ep(c: org.apache.spark.sql.Column) =
      c.cast("timestamp_ltz").cast("long")
    val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    val n0 = li.count()
    val facts = (0 until replicas).map { i =>
      li.select(ep(col("l_shipdate")).as("p"), col("l_extendedprice"))
    }.reduce(_ union _).persist()
    val nf = facts.count()
    val intervals = Tables.load(spark, "/root/testdata/sf0.1", "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        ep(col("o_orderdate")).as("s"),
        (ep(col("o_orderdate")) + lit(259200L)).as("e"))
      .persist()
    val ni = intervals.count()

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[range${replicas}x] $name rows $rows time ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timed("binned_range_join") {
      Relational.rangeJoin(facts, intervals, "p", "s", "e")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
        .count()
    }
    if (!sys.env.get("SPARK_GRAFT_SKIP_NLJ").contains("1")) {
      timed("raw_between_nlj") {
        facts.join(intervals, col("p") >= col("s") && col("p") <= col("e"))
          .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
          .count()
      }
    }
    println(s"[range${replicas}x] facts $nf intervals $ni")
    spark.stop()
  }
}
