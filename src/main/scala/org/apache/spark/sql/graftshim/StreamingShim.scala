package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` door a DataSource-v1 streaming [[org.apache
  * .spark.sql.execution.streaming.Source]] needs: `MicroBatchExecution`
  * asserts that the DataFrame `getBatch` returns has
  * `isStreaming = true`, and the only way to mint such a frame is
  * `SparkSession.internalCreateDataFrame(rdd, schema,
  * isStreaming = true)` — accessible from the `org.apache.spark.sql`
  * package only. This shim is the same integration seam public
  * lakehouse sources use (Delta Lake's `DeltaSource` builds its batch
  * frames through the identical call from `org.apache.spark.sql.delta`);
  * it contains no logic beyond the delegation.
  */
object StreamingShim {

  /** Wrap an already-planned batch RDD as a STREAMING DataFrame of the
    * given schema. The RDD is lazy — nothing executes until the
    * micro-batch runs. */
  def streamingFrame(spark: org.apache.spark.sql.SparkSession,
                     rdd: RDD[InternalRow],
                     schema: StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** The mirror for a streaming SINK: `Sink.addBatch` hands a frame
    * tied to the micro-batch's incremental execution, which supports
    * exactly one action — re-wrap its planned RDD as a plain batch
    * frame so a multi-action consumer (a manifest merge runs a
    * touched-partition probe, the write, and a stats pass) can run.
    * Re-executions replay the same deterministic batch RDD. */
  def batchFrame(spark: org.apache.spark.sql.SparkSession,
                 rdd: RDD[InternalRow],
                 schema: StructType): org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}
