package graft.scheduler

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Status

class DriverSpec extends AnyFunSuite {

  private class Recorder extends JobRunner {
    val runs = new ConcurrentLinkedQueue[(Long, Long)]()
    def run(job: JobSpec, tag: Long): Unit = runs.add((job.id, tag))
  }

  test("driver verbs: create/configure/enable/disable/delete/list/run") {
    val rec = new Recorder
    val s = new Scheduler(rec)
    val d = new Driver(s)

    d.createJob(JobSpec(1, "etl", enabled = false))
    // "-" never matches: manual-only job (an empty schedule fires every
    // tick in this cron dialect)
    d.createJob(JobSpec(2, "cleanup",
      schedule = Cron.Schedule(sec = Some("-"))))
    assert(d.listJobs().map(_.id) == Seq(1L, 2L))

    // disabled job does not fire from the clock
    s.tick(1678890600L)
    assert(s.drain())
    // ... but CAN be run manually with an explicit tag (api.py:352-387
    // allows running any configured job)
    d.enableJob(1)
    d.runJob(1, tag = 1672531200L)
    assert(s.drain())
    assert(rec.runs.asScala.toSeq == Seq((1L, 1672531200L)))
    assert(d.runHistory().map(_._2) == Seq(Status.Done))

    d.configureJob(2, _.copy(name = "cleanup2"))
    assert(d.listJobs().find(_.id == 2L).get.name == "cleanup2")
    d.deleteJob(2)
    assert(d.listJobs().map(_.id) == Seq(1L))
    s.stop()
  }

  test("cancelJobs reaches a run whose job was deleted mid-run") {
    val gate = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(1)
    val blocker = new JobRunner {
      def run(job: JobSpec, tag: Long): Unit = {
        started.countDown()
        gate.await() // parks until cancelled (interrupt) or released
      }
    }
    val s = new Scheduler(blocker)
    val d = new Driver(s)
    d.createJob(JobSpec(7, "orphan"))
    d.runJob(7, tag = 1672531200L)
    assert(started.await(10, java.util.concurrent.TimeUnit.SECONDS))
    // the job disappears from the registry while its run still executes —
    // the live slot map, not the job list, must drive the sweep
    d.deleteJob(7)
    assert(d.listJobs().isEmpty)
    assert(d.cancelJobs() == 1)
    assert(s.drain())
    s.stop()
  }
}
