package graft.scheduler

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.SparkSession

import graft.core._

/** The PRODUCTION job runner: what a fired schedule actually executes.
  * The reference spawns `job.py` subprocesses that hydrate their
  * pipeline from the metadata DB and run it (core.py:1558-1678,
  * job.py); in-process, a fired run hydrates the job's config-driven
  * pipeline from [[Repository]] and runs it on the shared SparkSession
  * under the scheduler-issued ledger run id (so `pd_*` key stamping and
  * run/task/step history line up with the firing).
  *
  * The run tag is the logical date: midnight tags hydrate a Day
  * calendar, intra-day tags an Hour calendar (the reference passes
  * `run date` the same way, cli.py:286-343).
  *
  * Execution order mirrors the reference's `_run` (core.py:1640-1649):
  * the job's registered [[JobScripts]] body runs FIRST (the reference's
  * `script.py`, the primary job format), then the DB-configured
  * pipeline if one exists. A job with neither fails the run (status E)
  * rather than vanishing silently; a script throw fails it before the
  * pipeline starts, like an exec_module error.
  */
final class PipelineJobRunner(spark: SparkSession, repo: Repository,
                              sources: SourceRegistry, ledger: Ledger)
  extends JobRunner {

  def run(job: JobSpec, tag: Long): Unit = run(job, tag, 0L)

  override def run(job: JobSpec, tag: Long, runId: Long): Unit = {
    val t = LocalDateTime.ofEpochSecond(tag, 0, ZoneOffset.UTC)
    val cal: CalendarDate =
      if (tag % 86400 == 0) Calendar.Day(t) else Calendar.Hour(t)
    val script = JobScripts.resolve(job.name)
    script.foreach(body => body(spark, cal))
    repo.loadPipeline(job.id, sources, ledger) match {
      case Some(pipeline) =>
        val task = pipeline.run(spark, cal, runId)
        if (task.status != Status.Done)
          throw new IllegalStateException(
            s"pipeline for job ${job.id} finished ${task.status}")
      case None =>
        if (script.isEmpty)
          throw new IllegalStateException(
            s"job ${job.id}: no script registered and no pipeline configured")
    }
  }
}
