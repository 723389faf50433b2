package graft
import org.apache.spark.sql.SparkSession
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    // intended broadcast-NLJ users: crossjoin-by-design queries
    val intendedNlj = Set("s01_brute_topk", "s03_cosine_pairs",
      "s07_quantized_topk", "s08_pq_topk", // quantized scans: crossJoin(broadcast) by design
      "s10_range_search", // radius query: broadcast crossjoin by design
      "s02_lsh_topk", "s04_ivf_topk", // recall gates EMBED the s01 brute reference scan
      "q16_subquery_avg", "q17_cross_join",
      "p07_temperature_mix") // scalar n_min attach: 1-row broadcast crossjoin by design
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val nlj = plan.contains("CartesianProduct") ||
          plan.contains("BroadcastNestedLoopJoin")
        val sort = plan.contains("SortMergeJoin")
        val flags = Seq(
          if (nlj && !intendedNlj.contains(name)) Some("UNEXPECTED-NLJ") else None,
          if (nlj && intendedNlj.contains(name)) Some("nlj-intended") else None,
          if (sort) Some("smj") else None).flatten
        if (flags.nonEmpty) println(f"SCAN $name%-28s ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"SCAN $name ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
