package graft.scheduler

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Status

/** Virtual-clock scheduler tests (SURVEY.md §5.5): firing, parallelism
  * limit, sleep/wake windows, rerun budget, trigger chains, timeout.
  */
class SchedulerSpec extends AnyFunSuite {

  private class Recorder extends JobRunner {
    val runs = new ConcurrentLinkedQueue[(Long, Long)]() // (jobId, tag)
    @volatile var fail: Set[Long] = Set.empty
    @volatile var sleepMs: Long = 0
    @volatile var sleepFor: Map[Long, Long] = Map.empty // per-job override
    private val active = new AtomicInteger(0)
    val maxActive = new AtomicInteger(0) // high-water concurrent runs
    def run(job: JobSpec, tag: Long): Unit = {
      val a = active.incrementAndGet()
      maxActive.updateAndGet(m => math.max(m, a))
      try {
        val ms = sleepFor.getOrElse(job.id, sleepMs)
        if (ms > 0) Thread.sleep(ms)
        runs.add((job.id, tag))
        if (fail.contains(job.id)) sys.error(s"job ${job.id} failed")
      } finally active.decrementAndGet()
    }
  }

  // moment chosen so wday/yday are stable: 2023-03-15 14:30:00 UTC
  private val base = 1678890600L

  test("cron firing: every-30-minutes job fires only on the matching second") {
    val rec = new Recorder
    val s = new Scheduler(rec, executorThreads = 2)
    s.register(JobSpec(1, "half-hourly",
      schedule = Cron.Schedule(min = Some("/30"), sec = Some("0"))))
    s.tick(base)       // 14:30:00 -> fires
    s.tick(base + 1)   // 14:30:01 -> no (sec=1)
    s.tick(base + 60)  // 14:31:00 -> no (min=31)
    assert(s.drain())
    assert(rec.runs.size == 1)
    assert(rec.runs.peek() == (1L, base))
    s.stop()
  }

  test("inactive and out-of-window jobs do not fire") {
    val rec = new Recorder
    val s = new Scheduler(rec)
    s.register(JobSpec(1, "disabled", enabled = false,
      schedule = Cron.Schedule(sec = Some("0"))))
    s.register(JobSpec(2, "expired",
      schedule = Cron.Schedule(sec = Some("0")),
      endDate = Some(java.time.LocalDateTime.parse("2020-01-01T00:00:00"))))
    s.tick(base)
    assert(s.drain())
    assert(rec.runs.isEmpty)
    s.stop()
  }

  test("parallelism limit: N postpones the busy fire (W), then runs it; Y runs concurrently") {
    val rec = new Recorder
    rec.sleepMs = 400
    val s = new Scheduler(rec, executorThreads = 4)
    s.register(JobSpec(1, "serial", parallelism = "N",
      schedule = Cron.Schedule()))  // matches every second
    s.tick(base); Thread.sleep(50); s.tick(base + 1) // second fire while busy
    // the second firing is POSTPONED (status W), not lost (core.py:973-980):
    // it executes after the first completes, never concurrently
    assert(s.drain(timeoutSeconds = 10))
    assert(rec.runs.asScala.count(_._1 == 1L) == 2)
    assert(rec.runs.asScala.map(_._2).toSet == Set(base, base + 1)) // both tags ran
    assert(rec.maxActive.get() == 1) // serialized

    rec.runs.clear()
    s.deregister(1)
    s.register(JobSpec(2, "parallel", parallelism = "Y",
      schedule = Cron.Schedule()))
    s.tick(base + 10); Thread.sleep(50); s.tick(base + 11)
    assert(s.drain(timeoutSeconds = 10))
    assert(rec.runs.asScala.count(_._1 == 2L) == 2)
    s.stop()
  }

  test("sleep window parks the run as W; wake-up window releases it") {
    val rec = new Recorder
    val s = new Scheduler(rec)
    // sleeps 14:00-14:59; wake-up allowed at minute 45 only
    s.register(JobSpec(1, "sleeper",
      schedule = Cron.Schedule(min = Some("30"), sec = Some("0")),
      sleepPeriod = Some("14"), wakeUpPeriod = Some("45")))
    s.tick(base) // 14:30:00 -> queued W (sleep hour active)
    assert(s.drain())
    assert(rec.runs.isEmpty && s.waiting.size == 1)
    s.tick(base + 15 * 60) // 14:45 -> still hour 14: asleep
    assert(s.drain())
    assert(rec.runs.isEmpty)
    s.tick(base + 45 * 60) // 15:15 -> awake but minute 15 != 45: keep waiting
    assert(s.drain())
    assert(rec.runs.isEmpty)
    s.tick(base + 75 * 60) // 15:45 -> wake-up window matches: run
    assert(s.drain())
    assert(rec.runs.size == 1)
    s.stop()
  }

  test("fire while runs are parked: new fire queues behind (FIFO), nothing lost") {
    val rec = new Recorder
    val s = new Scheduler(rec)
    // fires at :30, sleeps all of hour 14, limit 1
    s.register(JobSpec(1, "sleepy-serial",
      schedule = Cron.Schedule(min = Some("30"), sec = Some("0")),
      sleepPeriod = Some("14"), parallelism = "N"))
    s.tick(base)            // 14:30:00 -> parks as W (sleep window)
    Thread.sleep(100)       // drain() waits for the W queue; don't use it here
    assert(s.waiting.size == 1)
    // 15:30: the new fire postpones behind the parked run (is_waiting,
    // core.py:973-976); the wake phase releases the first, and finish
    // regains the second — both tags execute, serialized
    s.tick(base + 3600)
    assert(s.drain(timeoutSeconds = 10))
    assert(rec.runs.size == 2)
    assert(rec.runs.asScala.map(_._2).toSet == Set(base, base + 3600))
    assert(rec.maxActive.get() == 1)
    s.stop()
  }

  test("clock resync: jumps skip forward; jitter and backward steps never double-fire") {
    // the pure advance rule (core.py:812-832 twin)
    assert(Scheduler.resync(100, 101) == 101) // normal: counter increments
    assert(Scheduler.resync(100, 103) == 101) // sub-tolerance lag: no skip
    assert(Scheduler.resync(100, 200) == 200) // suspended JVM: resync forward
    assert(Scheduler.resync(100, 50) == 101)  // wall stepped back: monotonic
    // replay a jumped wall-clock series through the loop's advance rule:
    // ticked moments must be strictly increasing (a backward step or
    // resync can never re-fire a moment) and a suspension must be
    // SKIPPED, not replayed as a burst of catch-up fires
    val walls = Seq(101L, 102L, 103L, 500L, 501L, 499L, 502L)
    var moment = 100L
    val ticked = scala.collection.mutable.ListBuffer(moment)
    walls.foreach { w =>
      moment = Scheduler.resync(moment, w)
      ticked += moment
    }
    assert(ticked.toList ==
      List(100L, 101L, 102L, 103L, 500L, 501L, 502L, 503L))
    assert(ticked.toList == ticked.toList.sorted && ticked.distinct == ticked)
    // and an every-second job fed those moments fires exactly once each
    val rec = new Recorder
    val s = new Scheduler(rec, executorThreads = 2)
    s.register(JobSpec(1, "every-second"))
    ticked.foreach(s.tick)
    assert(s.drain())
    assert(rec.runs.asScala.map(_._2).toList.sorted == ticked.toList)
    s.stop()
  }

  test("rerun: failed run retries on the interval, bounded by rerun_limit") {
    val rec = new Recorder
    rec.fail = Set(1L)
    val s = new Scheduler(rec, rerunDelaySeconds = 0L)
    s.register(JobSpec(1, "flaky",
      schedule = Cron.Schedule(sec = Some("0"), min = Some("30"), hour = Some("14")),
      rerunIntervalSeconds = Some(60), rerunLimit = 2))
    s.tick(base) // fires, fails
    assert(s.drain())
    assert(rec.runs.size == 1)
    s.tick(base + 30) // not on the interval -> no rerun
    assert(s.drain())
    assert(rec.runs.size == 1)
    s.tick(base + 60) // interval tick -> rerun 1 (fails again)
    assert(s.drain())
    assert(rec.runs.size == 2)
    s.tick(base + 120) // rerun 2 (seqno 3, at limit after this)
    assert(s.drain())
    assert(rec.runs.size == 3)
    s.tick(base + 180) // budget exhausted
    assert(s.drain())
    assert(rec.runs.size == 3)
    val statuses = s.history.asScala.map(_._2).toSeq
    assert(statuses.count(_ == Status.Error) == 3)
    s.stop()
  }

  test("deactivate drops a failed run from the rerun queue (api.py:446-466)") {
    val rec = new Recorder
    rec.fail = Set(1L)
    val s = new Scheduler(rec, rerunDelaySeconds = 0L)
    s.register(JobSpec(1, "flaky",
      schedule = Cron.Schedule(sec = Some("0"), min = Some("30"), hour = Some("14")),
      rerunIntervalSeconds = Some(60), rerunLimit = 5))
    s.tick(base) // fires, fails -> queued for rerun
    assert(s.drain())
    assert(rec.runs.size == 1)
    val Seq(failedId) = s.failedRunIds
    assert(s.deactivate(failedId))
    assert(!s.deactivate(failedId)) // idempotent-negative: already gone
    assert(s.deactivate(99999L) == false) // unknown run
    s.tick(base + 60) // rerun interval — but the run was deactivated
    assert(s.drain())
    assert(rec.runs.size == 1)
    assert(s.failedRunIds.isEmpty)
    s.stop()
  }

  test("rerun_delay quarantines failures; rerun_days expires the budget window") {
    val rec = new Recorder
    rec.fail = Set(1L)
    // 2-minute quarantine before a failure may rerun (reference default
    // is 14400 s — config.py:150)
    val s = new Scheduler(rec, rerunDelaySeconds = 120L)
    s.register(JobSpec(1, "flaky",
      schedule = Cron.Schedule(sec = Some("0"), min = Some("30"), hour = Some("14")),
      rerunIntervalSeconds = Some(60), rerunLimit = 5, rerunDays = 1))
    s.tick(base) // fires, fails at moment=base
    assert(s.drain())
    assert(rec.runs.size == 1)
    s.tick(base + 60) // interval matches but still quarantined
    assert(s.drain())
    assert(rec.runs.size == 1)
    s.tick(base + 120) // quarantine over -> rerun (fails again at +120)
    assert(s.drain())
    assert(rec.runs.size == 2)
    // jump past the rerun_days window: the failure ages out, no rerun
    s.tick(base + 120 + 2 * 86400)
    assert(s.drain())
    assert(rec.runs.size == 2)
    s.stop()
  }

  test("trigger chain: child fires on parent success with inherited tag") {
    val rec = new Recorder
    val s = new Scheduler(rec)
    s.register(JobSpec(1, "parent",
      schedule = Cron.Schedule(sec = Some("0"), min = Some("30"), hour = Some("14")),
      triggerList = Seq(2, 3)))
    s.register(JobSpec(2, "child", schedule = Cron.Schedule(sec = Some("-"))))
    s.register(JobSpec(3, "grandchild-src", schedule = Cron.Schedule(sec = Some("-")),
      triggerList = Seq(2)))
    s.tick(base)
    assert(s.drain())
    val runs = rec.runs.asScala.toSeq
    assert(runs.count(_._1 == 1L) == 1)
    assert(runs.count(_._1 == 2L) == 2) // triggered by both 1 and 3
    assert(runs.count(_._1 == 3L) == 1)
    assert(runs.forall(_._2 == base)) // tag inheritance
    s.stop()
  }

  test("failed parent does not trigger children") {
    val rec = new Recorder
    rec.fail = Set(1L)
    val s = new Scheduler(rec)
    s.register(JobSpec(1, "parent",
      schedule = Cron.Schedule(sec = Some("0"), min = Some("30"), hour = Some("14")),
      triggerList = Seq(2)))
    s.register(JobSpec(2, "child", schedule = Cron.Schedule(sec = Some("-"))))
    s.tick(base)
    assert(s.drain())
    assert(rec.runs.asScala.count(_._1 == 2L) == 0)
    s.stop()
  }

  test("cancel interrupts a running run and marks it C") {
    val rec = new Recorder
    rec.sleepMs = 5000
    val s = new Scheduler(rec)
    s.register(JobSpec(1, "cancellable",
      schedule = Cron.Schedule(sec = Some("0"), min = Some("30"), hour = Some("14"))))
    val run = { s.tick(base); Thread.sleep(200)
      s.history.asScala.toSeq } // not finished yet
    assert(run.isEmpty)
    // the charge created run id 1 (in-memory generator)
    assert(s.cancel(1L))
    assert(s.drain(timeoutSeconds = 10))
    assert(s.history.asScala.map(_._2).toSeq == Seq(Status.Canceled))
    assert(!s.cancel(999L)) // unknown run
    s.stop()
  }

  test("a timed-out run does not leak its interrupt into the next run on the thread") {
    val rec = new Recorder
    rec.sleepFor = Map(1L -> 3000L) // job 1 overruns; job 2 is instant
    val s = new Scheduler(rec, executorThreads = 1) // SAME pool thread
    s.register(JobSpec(1, "overrunner", parallelism = "N",
      schedule = Cron.Schedule(sec = Some("-")), timeoutSeconds = Some(1)))
    s.register(JobSpec(2, "innocent", parallelism = "N",
      schedule = Cron.Schedule(sec = Some("-"))))
    s.charge(s.job(1L).get, base)
    s.charge(s.job(2L).get, base) // queues behind job 1 on the one thread
    assert(s.drain(timeoutSeconds = 15))
    val byJob = s.history.asScala.toSeq.map { case (r, st) => r.job.id -> st }.toMap
    assert(byJob(1L) == Status.Timeout)
    assert(byJob(2L) == Status.Done) // would be T/C if the interrupt leaked
    s.stop()
  }

  test("timeout marks the run T") {
    val rec = new Recorder
    rec.sleepMs = 3000
    val s = new Scheduler(rec)
    s.register(JobSpec(1, "slow",
      schedule = Cron.Schedule(sec = Some("0"), min = Some("30"), hour = Some("14")),
      timeoutSeconds = Some(1)))
    s.tick(base)
    assert(s.drain(timeoutSeconds = 10))
    val statuses = s.history.asScala.map(_._2).toSeq
    assert(statuses == Seq(Status.Timeout))
    s.stop()
  }
}
