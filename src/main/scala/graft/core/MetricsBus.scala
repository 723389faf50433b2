package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.util.QueryExecutionListener

/** Collects `Dataset.observe` metrics across actions.
  *
  * A write action runs on a QueryExecution derived from (not identical
  * to) the DataFrame handed to the sink, so observed metrics must be
  * harvested from the EXECUTED plan via a QueryExecutionListener — the
  * idiomatic Spark channel for exactly this. Events arrive on the
  * listener bus; [[drain]] waits for the bus so metric reads are
  * deterministic.
  */
object MetricsBus {
  private val observed = new ConcurrentHashMap[String, Long]()
  private val registered = new ConcurrentHashMap[SparkSession, Boolean]()

  private final class Harvester extends QueryExecutionListener {
    private def harvest(qe: QueryExecution): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        if (name.startsWith("graft_")) observed.put(name, row.getLong(0))
      }
    def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      harvest(qe)
    def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      harvest(qe)
  }

  def ensure(spark: SparkSession): Unit =
    registered.computeIfAbsent(spark, s => {
      s.listenerManager.register(new Harvester)
      true
    })

  /** Wait for pending listener events, then read an observed metric. */
  def drain(spark: SparkSession): Unit =
    GraftSqlBridge.waitListenerBus(spark)

  def get(name: String): Option[Long] = Option(observed.get(name))
  def clear(name: String): Unit = observed.remove(name)
}
