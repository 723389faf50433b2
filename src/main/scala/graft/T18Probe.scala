package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the t18 BM25 design claim at sf0.1: the broadcast
  * query-term set keeps the corpus token stream out of the tf
  * aggregation shuffle — only (doc, query-term) occurrences survive
  * the scan-stage join. Prints total corpus tokens vs rows entering
  * the aggregation, plus end-to-end times for the gate-shaped query
  * and the stateless broadcast-scoring form.
  */
object T18Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.functions.TextFunctions.tokens
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    val queries = Seq(
      (1L, "spark join window"),
      (2L, "fast hash merge batch"),
      (3L, "slow scan filter vector")).toDF("query_id", "qtext")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[t18probe] $name rows $n time ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val total = docs.select(explode(tokens(col("text"))).as("t")).count()
    val qTerms = queries
      .select(explode(array_distinct(tokens(col("qtext")))).as("term"))
      .distinct()
    val kept = docs.select(explode(tokens(col("text"))).as("term"))
      .join(broadcast(qTerms), Seq("term")).count()
    println(f"[t18probe] corpus tokens $total -> agg input $kept " +
      f"(${100.0 * kept / total}%.1f%% survive the broadcast term filter)")
    timed("bm25_topk")(graft.operators.Retrieval.bm25(
      docs, "doc_id", "text", queries, "query_id", "qtext",
      logIdf = false).count())
    val model = graft.operators.Retrieval.bm25Model(
      docs, "doc_id", "text", queries, "query_id", "qtext", logIdf = false)
    timed("bm25_broadcast_score")(graft.operators.Retrieval
      .bm25ScoreBroadcast(docs, "doc_id", "text", model).count())
    spark.stop()
  }
}
