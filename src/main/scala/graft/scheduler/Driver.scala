package graft.scheduler

import java.time.LocalDateTime
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import graft.core.{Ledger, Status}

/** Programmatic admin API (pydin/api.py:23-591; CLI verbs cli.py:81-92):
  * create/configure/enable/disable/delete/list jobs, run a job for a
  * logical date, cancel a run. The reference spawns job OS processes;
  * here jobs are in-process pipeline factories (SURVEY.md §7.4.5) and
  * cancellation interrupts the executor thread (→ status C/T via the
  * scheduler's status machine).
  */
final class Driver(val scheduler: Scheduler) {

  private val specs = new ConcurrentHashMap[Long, JobSpec]()

  def createJob(spec: JobSpec): JobSpec = {
    specs.put(spec.id, spec)
    scheduler.register(spec)
    spec
  }

  def configureJob(id: Long, f: JobSpec => JobSpec): Option[JobSpec] =
    Option(specs.get(id)).map { old =>
      val updated = f(old)
      specs.put(id, updated)
      scheduler.register(updated)
      updated
    }

  def enableJob(id: Long): Option[JobSpec] =
    configureJob(id, _.copy(enabled = true))

  def disableJob(id: Long): Option[JobSpec] =
    configureJob(id, _.copy(enabled = false))

  def deleteJob(id: Long): Unit = {
    specs.remove(id)
    scheduler.deregister(id)
  }

  def listJobs(): Seq[JobSpec] =
    specs.values.asScala.toSeq.sortBy(_.id)

  /** Run a job now for a logical date tag (the CLI's
    * `run job <id> date <d>` — cli.py:286-343). Ignores the cron
    * schedule; honors parallelism and sleep windows like any charge.
    */
  def runJob(id: Long, tag: Long,
             now: LocalDateTime = LocalDateTime.now()): Option[RunRecord] =
    Option(specs.get(id)).flatMap(j => scheduler.charge(j, tag, now))

  /** Final statuses of completed runs, newest last. */
  def runHistory(): Seq[(RunRecord, String)] =
    scheduler.history.asScala.toSeq

  // ---- scheduler lifecycle + run administration (web.py:173-233,
  // api.py:300-466) --------------------------------------------------------

  /** Start the scheduler's wall-clock tick loop. Returns false when it is
    * already running (the reference refuses a second scheduler process —
    * api.py:300-318). */
  def startScheduler(): Boolean =
    if (scheduler.isAlive) false
    else {
      scheduler.start()
      scheduler.ledger.foreach(_.componentStarted("SCHEDULER"))
      true
    }

  /** Stop the tick loop; queued runs stay queued and the scheduler can
    * be started again (api.py:320-335). */
  def stopScheduler(): Boolean =
    if (!scheduler.isAlive) false
    else {
      scheduler.stopTicking()
      scheduler.ledger.foreach(_.componentStopped("SCHEDULER"))
      true
    }

  def schedulerAlive: Boolean = scheduler.isAlive

  /** Deactivate a W/E/T run so it never executes (api.py:446-466). */
  def deactivateRun(runId: Long): Boolean = scheduler.deactivate(runId)

  /** Cancel every RUNNING run of one job (api.py:389-404). Returns the
    * number of runs interrupted. */
  def cancelJob(id: Long): Int =
    scheduler.runningRunIds(id).count(scheduler.cancel)

  /** Cancel all running runs of all jobs (api.py:405-417). Sweeps the
    * scheduler's live slot map (the source of truth), NOT the registered
    * job list — a run whose job was deleted mid-run is still executing
    * and must be cancelled too. */
  def cancelJobs(): Int =
    scheduler.liveRunIds.count(scheduler.cancel)
}
