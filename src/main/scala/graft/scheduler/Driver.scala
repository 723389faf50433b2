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
}
