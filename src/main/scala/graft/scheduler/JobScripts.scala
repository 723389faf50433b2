package graft.scheduler

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

import graft.core.CalendarDate

/** In-process twin of the reference's per-job `script.py`
  * (core.py:1640-1649): a fired job's PRIMARY format is user code —
  * the reference imports and executes the job directory's `script.py`,
  * then runs the DB-configured pipeline only if one exists. A JVM
  * library cannot import a source file at runtime the way Python can,
  * so user code registers a named body once at startup and the firing
  * resolves it by `pd_schedule.job_name` — the same job-keyed lookup,
  * expressed as a registry.
  *
  * Bodies receive the shared SparkSession and the run's logical
  * calendar date (derived from the firing tag, like the reference's
  * `run date`), so a script can do anything a pipeline can — including
  * building and running pipelines of its own.
  */
object JobScripts {

  /** A job body: (session, logical date) => side effects; a throw fails
    * the run (status E) exactly like a pipeline failure. */
  type Body = (SparkSession, CalendarDate) => Unit

  private val bodies = new ConcurrentHashMap[String, Body]()

  /** Register (or replace) the body for `jobName`. */
  def register(jobName: String)(body: Body): Unit = bodies.put(jobName, body)

  def deregister(jobName: String): Unit = bodies.remove(jobName)

  def resolve(jobName: String): Option[Body] = Option(bodies.get(jobName))

  /** Test aid: drop every registration. */
  def clear(): Unit = bodies.clear()
}
