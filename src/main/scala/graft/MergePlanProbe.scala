package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executed-plan evidence for the copy-on-write merge write job (r17
  * verdict item 4: the single-shuffle merge landed without an
  * after-plan): runs one partitioned mergeManifest under (a) the
  * default single-shuffle clustered window and (b) the skew-guard
  * two-exchange fallback (threshold forced to 1 byte), capturing every
  * executed write plan through a QueryExecutionListener and printing
  * the Exchange count + formatted plan of each merge rewrite.
  */
object MergePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val s = qe.executedPlan.toString()
          if (s.contains("InsertIntoHadoopFsRelationCommand") ||
              qe.logical.toString.contains("InsertIntoHadoopFsRelation")) {
            plans.add(qe.explainString(
              org.apache.spark.sql.execution.SimpleMode))
            ()
          }
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    def runMerge(tag: String, conf: Map[String, String]): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_mergeplan_$tag").resolve("t").toString
      val base = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"),
          col("o_totalprice"), lit(1L).as("ver"))
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        graft.operators.Layout.writeManifestTable(spark, dir, base,
          Seq("o_year"))
        plans.clear() // keep only the MERGE rewrite's write plans
        graft.operators.Layout.mergeManifest(spark, dir,
          base.filter(pmod(col("o_orderkey"), lit(10)) === 0)
            .withColumn("o_totalprice", col("o_totalprice") + 1)
            .withColumn("ver", lit(2L)),
          Seq("o_orderkey"), "ver")
        // the listener bus is async
        Thread.sleep(1500)
        import scala.jdk.CollectionConverters._
        val ps = plans.asScala.toSeq
        println(s"===== $tag: ${ps.size} write plan(s) captured")
        ps.zipWithIndex.foreach { case (p, i) =>
          val ex = p.linesIterator.count(l =>
            l.contains("Exchange") && !l.contains("Reused"))
          println(s"--- $tag write $i: $ex Exchange node(s)")
          println(p)
        }
      } finally conf.keys.foreach(spark.conf.unset)
    }
    runMerge("single_shuffle_default", Map.empty)
    runMerge("two_exchange_fallback",
      Map("spark.graft.merge.clusteredMergeMaxRelBytes" -> "1"))
    spark.stop()
  }
}
