package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface: converts between the public
  * `Column` API and Catalyst `Expression`s so graft's native expressions
  * can be exposed as normal columns. Lives under `org.apache.spark.sql`
  * purely for access; contains no logic.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** An analyzed LogicalPlan as a DataFrame — the seam a custom
    * RunnableCommand (graft's `INSERT INTO … USING manifest` rewrite)
    * needs to hand its already-resolved query to the DataFrame-level
    * merge machinery (Delta's DeltaAnalysis commands use the identical
    * `Dataset.ofRows` call from `org.apache.spark.sql.delta`). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** `CLUSTERED BY (cols) [SORTED BY …] INTO n BUCKETS` arrives in a
    * DDL plan's `partitioning` as a `BucketTransform` /
    * `SortedBucketTransform` — both `private[sql]`, so the extractor
    * lives here. Returns (numBuckets, bucketCols, sortCols) as
    * field-name paths; None for any other transform shape. */
  def bucketTransform(
      t: org.apache.spark.sql.connector.expressions.Transform):
      Option[(Int, Seq[Seq[String]], Seq[Seq[String]])] =
    org.apache.spark.sql.connector.expressions.BucketTransform.unapply(t)
      .map { case (n, cols, sorted) =>
        (n, cols.map(_.fieldNames.toSeq), sorted.map(_.fieldNames.toSeq))
      }

  /** Block until the listener bus has delivered all pending events — makes
    * QueryExecutionListener-based metric collection deterministic. */
  def waitListenerBus(spark: org.apache.spark.sql.SparkSession, timeoutMs: Long = 10000): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty(timeoutMs)

  /** Materialized local checkpoint WITHOUT the stats carry-over of
    * `Dataset.localCheckpoint`: the built-in calls
    * `LogicalRDD.rewriteStatsAndConstraints`, which computes the SOURCE
    * plan's `sizeInBytes` and stamps it onto the new leaf. Inside an
    * iterative loop that compounds: round t's plan multiplies the carried
    * sizes of round t-1's leaves across every join, so the carried
    * BigInteger doubles (or worse) in bit-length per round — by round
    * ~10 the stats computation itself takes minutes (measured: the CC
    * loop's 100k-chain probe wedged inside BigInteger.multiplyToomCook3
    * under `Dataset.checkpoint`). This variant executes the plan,
    * local-checkpoints the raw row RDD, and wraps it in a FRESH
    * LogicalRDD with default leaf stats — constant-size stats no matter
    * how many rounds compound. Trade-off: output partitioning/ordering
    * metadata is dropped (fine for loops that re-shuffle every round).
    */
  def flatLocalCheckpoint(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val rdd = cds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    cds.sparkSession.internalCreateDataFrame(rdd, cds.schema)
  }
}
