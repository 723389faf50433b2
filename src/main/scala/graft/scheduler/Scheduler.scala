package graft.scheduler

import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import graft.core.Status

/** A schedule entry (pd_schedule row — db/sqlite.sql:6-79; in-memory Job
  * of pydin/core.py:110-530). Period fields use the [[Cron]] dialect.
  */
final case class JobSpec(
    id: Long,
    name: String,
    enabled: Boolean = true,
    schedule: Cron.Schedule = Cron.Schedule(),
    startDate: Option[LocalDateTime] = None,
    endDate: Option[LocalDateTime] = None,
    /** 'Y' -> 999 concurrent runs, 'N' -> 1, or an int (core.py:429-442). */
    parallelism: String = "N",
    timeoutSeconds: Option[Int] = None,
    /** hour-matched sleep window; runs queued during it wait (core.py:485-498). */
    sleepPeriod: Option[String] = None,
    /** minute-matched wake-up window for sleeping runs (core.py:500-513). */
    wakeUpPeriod: Option[String] = None,
    rerunIntervalSeconds: Option[Int] = None,
    rerunLimit: Int = 0,
    rerunDays: Int = 1,
    /** jobs launched when this one succeeds (core.py:1765-1826). */
    triggerList: Seq[Long] = Nil,
    /** failure-alarm recipients (pd_schedule.email_list,
      * core.py:1283-1305); empty = no alerts for this job. */
    emailList: Seq[String] = Nil) {

  def isActive(t: LocalDateTime): Boolean =
    enabled &&
      startDate.forall(_.isBefore(t)) &&
      endDate.forall(_.isAfter(t))

  def isScheduled(t: LocalDateTime): Boolean = schedule.matches(t)

  def parallelLimit: Int = parallelism match {
    case "Y" => 999
    case "N" => 1
    case n if n.forall(_.isDigit) && n.nonEmpty => n.toInt
    case _ => 1
  }

  def isSleeping(t: LocalDateTime): Boolean =
    sleepPeriod.exists(p => Cron.matches(p, t.getHour))

  def isAwakening(t: LocalDateTime): Boolean =
    wakeUpPeriod.forall(p => Cron.matches(p, t.getMinute))
}

/** One queued/running/completed execution of a job. `parkedForSleep`
  * distinguishes a run waiting out its sleep window (released only in the
  * wake-up window) from one parked for parallelism/fairness (released as
  * soon as capacity frees).
  */
final case class RunRecord(runId: Long, job: JobSpec, tag: Long,
                           seqno: Int = 1, parkedForSleep: Boolean = false)

/** What actually happens when a job fires: user code returning normally
  * (Done) or throwing (Error). The scheduler owns status bookkeeping.
  */
trait JobRunner {
  def run(job: JobSpec, tag: Long): Unit
  /** Override to also receive the scheduler-issued ledger run id (key
    * stamping, run-history joins); the default forwards. Lambdas still
    * SAM-convert to the 2-arg form. */
  def run(job: JobSpec, tag: Long, runId: Long): Unit = run(job, tag)
}

/** The scheduling engine (pydin/core.py:47-1214), re-expressed with a
  * virtual clock for testability:
  *
  *  - `tick(moment)` = one scheduler second (`_process` — core.py:751-833):
  *    match active+scheduled jobs, charge them into the run queue, wake
  *    sleeping runs in their wake-up window, rerun failed runs within
  *    their budget.
  *  - charger semantics (core.py:964-1036): a fired job whose sleep
  *    window is active parks as status W; one over its parallelism limit
  *    is skipped; otherwise it is handed to the executor pool as status Q.
  *  - executor semantics (core.py:1038-1095): run with optional timeout;
  *    normal completion -> D, exception -> E, deadline -> T, cancel -> C.
  *  - child triggering (core.py:1765-1826): on D, jobs in `triggerList`
  *    are charged immediately with the SAME tag (logical-date
  *    inheritance).
  *
  * `start()` drives `tick` from the wall clock at 1 Hz (core.py:812-833);
  * tests drive it directly.
  */
final class Scheduler(runner: JobRunner,
                      /** pool size; reference default executors_number = 20
                        * (config.py:148). The reference's 5 charger threads
                        * have no twin: charging here is synchronous in
                        * tick(). */
                      executorThreads: Int = 20,
                      val ledger: Option[graft.core.JdbcLedger] = None,
                      /** quarantine before a failed run becomes
                        * rerun-eligible — SCHEDULER.rerun_delay, reference
                        * default 14400 s (config.py:150). */
                      rerunDelaySeconds: Long = 14400L,
                      /** failure-alarm sink (core.py:1283-1305); Noop =
                        * EMAIL_TOGGLE off. */
                      alerter: Alerter = Alerter.Noop) {

  private val jobs = new ConcurrentHashMap[Long, JobSpec]()
  private val runIdGen = new AtomicLong(0L)
  private val running = new ConcurrentHashMap[Long, AtomicLong]() // jobId -> active count
  val waiting = new ConcurrentLinkedQueue[RunRecord]() // status W
  // (run, rerunTimes, failedAtMoment) — failure time in scheduler-clock
  // seconds, for the rerun_delay quarantine and rerun_days budget window
  private val failed = new ConcurrentLinkedQueue[(RunRecord, Int, Long)]()
  private val lastMoment = new AtomicLong(0L)
  val history = new ConcurrentLinkedQueue[(RunRecord, String)]() // (run, final status)
  private val pool = Executors.newFixedThreadPool(executorThreads)
  private val timeoutPool = Executors.newScheduledThreadPool(1)
  private val alive = new AtomicBoolean(false)
  private val tickThread = new java.util.concurrent.atomic.AtomicReference[Thread]()
  private val inFlight = new ConcurrentHashMap[Long, CountDownLatch]()
  private val threads = new ConcurrentHashMap[Long, RunSlot]() // runId -> executor
  private val liveRuns = new ConcurrentHashMap[Long, RunRecord]() // runId -> executing run
  private val canceled = ConcurrentHashMap.newKeySet[Long]()
  /** Serializes park/regain decisions (charge, tick wake phase, finish
    * regain) so two concurrent finishes cannot both regain past the
    * parallelism limit. */
  private val parkLock = new Object

  /** Executor-thread handle for one run. Interrupts (cancel / timeout
    * killer) are delivered only under the slot lock while `done` is
    * false; the run's finally sets `done` and clears the flag under the
    * same lock, so an interrupt can never leak into the next queued run
    * on that pool thread. */
  private final class RunSlot(val thread: Thread) { var done = false }

  def register(job: JobSpec): Unit = jobs.put(job.id, job)
  def deregister(jobId: Long): Unit = jobs.remove(jobId)
  def job(jobId: Long): Option[JobSpec] = Option(jobs.get(jobId))

  /** Reload the in-memory schedule from the durable store — the
    * reference's periodic schedule refresh (`refresh_interval` 300 s,
    * config.py:149). Call from the tick loop or on demand. */
  def refreshFrom(repo: graft.core.Repository): Unit = {
    val fresh = repo.loadJobs()
    val freshIds = fresh.map(_.id).toSet
    fresh.foreach(register)
    jobs.keySet.asScala.toSet.diff(freshIds).foreach(jobs.remove(_))
  }

  def runningCount(jobId: Long): Int =
    Option(running.get(jobId)).map(_.get().toInt).getOrElse(0)

  /** One scheduler second at `moment` (epoch seconds). */
  def tick(moment: Long): Unit = {
    lastMoment.set(moment)
    val t = LocalDateTime.ofInstant(Instant.ofEpochSecond(moment), ZoneOffset.UTC)
    // 1. fire scheduled jobs (walk — core.py:905-912)
    jobs.values.asScala.foreach { j =>
      if (j.isActive(t) && j.isScheduled(t)) charge(j, moment, t)
    }
    // 2. wake parked runs (core.py:948-962, 1097-1143): sleep-parked runs
    // need their wake-up window; busy-parked runs need free capacity.
    parkLock.synchronized {
      val stillWaiting = mutable.ListBuffer[RunRecord]()
      var w = waiting.poll()
      while (w != null) {
        val windowOk =
          if (w.parkedForSleep) !w.job.isSleeping(t) && w.job.isAwakening(t)
          else !w.job.isSleeping(t)
        if (windowOk && runningCount(w.job.id) < w.job.parallelLimit) execute(w)
        else stillWaiting += w
        w = waiting.poll()
      }
      stillWaiting.foreach(waiting.add)
    }
    // 3. reruns (core.py:926-962): interval gate + rerun_delay
    // quarantine + rerun_limit retry budget + rerun_days age window
    val stillFailed = mutable.ListBuffer[(RunRecord, Int, Long)]()
    var f = failed.poll()
    while (f != null) {
      val (run, times, failedAt) = f
      val j = run.job
      val aged = moment - failedAt > j.rerunDays.toLong * 86400L
      val quarantined = moment < failedAt + rerunDelaySeconds
      val due = j.rerunIntervalSeconds.exists(i => i > 0 && moment % i == 0)
      if (times < j.rerunLimit && !aged) {
        if (due && !quarantined) execute(run.copy(seqno = run.seqno + 1))
        else stillFailed += f
      } // else: budget exhausted or outside the rerun_days window — drop
      f = failed.poll()
    }
    stillFailed.foreach(failed.add)
  }

  /** Queue one run of `job` with logical tag `tag` (charger —
    * core.py:964-1036). No firing is ever dropped: a job that is
    * sleeping, has runs already parked (FIFO fairness, is_waiting), or
    * is at its parallelism limit (is_busy) POSTPONES the run as status W
    * (_postpone, core.py:1013-1036); the wake phase / finish regain
    * execute it later. Every tag is a distinct logical run.
    */
  def charge(job: JobSpec, tag: Long,
             t: LocalDateTime = LocalDateTime.now(ZoneOffset.UTC)): Option[RunRecord] =
    parkLock.synchronized {
      val runId = ledger.map(_.startRun(job.id, tag))
        .getOrElse(runIdGen.incrementAndGet())
      if (job.isSleeping(t)) { // postpone for sleep window
        val run = RunRecord(runId, job, tag, parkedForSleep = true)
        ledger.foreach(_.setRunStatus(runId, Status.Waiting))
        waiting.add(run)
        Some(run)
      } else {
        val run = RunRecord(runId, job, tag)
        val hasParked = waiting.stream().anyMatch(_.job.id == job.id)
        if (hasParked || runningCount(job.id) >= job.parallelLimit) {
          ledger.foreach(_.setRunStatus(runId, Status.Waiting))
          waiting.add(run) // postpone for fairness/parallelism
        } else execute(run)
        Some(run)
      }
    }

  /** Hand a run to the executor pool (core.py:1038-1095). */
  private def execute(rec: RunRecord): Unit = {
    val latch = new CountDownLatch(1)
    inFlight.put(rec.runId, latch)
    liveRuns.put(rec.runId, rec)
    running.computeIfAbsent(rec.job.id, _ => new AtomicLong()).incrementAndGet()
    pool.submit(new Runnable {
      def run(): Unit = {
        Thread.interrupted() // defensive: start with a clean interrupt flag
        val job = jobs.getOrDefault(rec.job.id, rec.job)
        val slot = new RunSlot(Thread.currentThread())
        threads.put(rec.runId, slot)
        val killer = rec.job.timeoutSeconds.map(s =>
          timeoutPool.schedule(new Runnable {
            def run(): Unit =
              slot.synchronized { if (!slot.done) slot.thread.interrupt() }
          }, s.toLong, TimeUnit.SECONDS))
        val status =
          try {
            runner.run(job, rec.tag, rec.runId)
            Status.Done
          } catch {
            // interrupt is cancel (SIGTERM -> C, core.py:1685-1695) or
            // the timeout killer (-> T)
            case _: InterruptedException =>
              if (canceled.remove(rec.runId)) Status.Canceled else Status.Timeout
            case NonFatal(_) =>
              if (canceled.remove(rec.runId)) Status.Canceled else Status.Error
          } finally {
            killer.foreach(_.cancel(false))
            // close the interrupt window: once done is set (and any
            // pending flag cleared) under the lock, no cancel/killer can
            // interrupt this pool thread for THIS run anymore
            slot.synchronized { slot.done = true; Thread.interrupted() }
            threads.remove(rec.runId)
          }
        finish(rec, status)
      }
    })
  }

  /** Cancel a running run: interrupts its executor thread; the run
    * finishes with status C (the reference's SIGTERM path —
    * api.py:419-444, core.py:1685-1695). Returns false if the run is
    * not currently executing. */
  def cancel(runId: Long): Boolean =
    Option(threads.get(runId)) match {
      case Some(slot) =>
        slot.synchronized {
          if (slot.done) false
          else {
            canceled.add(runId)
            slot.thread.interrupt()
            true
          }
        }
      case None => false
    }

  private def finish(run: RunRecord, status: String): Unit = {
    liveRuns.remove(run.runId)
    running.get(run.job.id).decrementAndGet()
    regain(run.job.id) // freed capacity: release the next parked run now
    history.add((run, status))
    ledger.foreach(_.endRun(run.runId, status, None))
    // failure alarm (E/T with recipients): transport errors are swallowed
    // — alerting must never affect scheduling
    if ((status == Status.Error || status == Status.Timeout) &&
        run.job.emailList.nonEmpty)
      try alerter.alert(AlertEvent(run.job.id, run.job.name, run.runId,
        status, run.job.emailList))
      catch { case scala.util.control.NonFatal(_) => () }
    if (status == Status.Error && run.job.rerunLimit > 0)
      failed.add((run, run.seqno - 1, lastMoment.get()))
    if (status == Status.Done)
      run.job.triggerList.foreach { childId =>
        Option(jobs.get(childId)).foreach(child =>
          charge(child, run.tag)) // tag inheritance (core.py:1811-1818)
      }
    Option(inFlight.remove(run.runId)).foreach(_.countDown())
  }

  /** Release the first eligible parked run of `jobId` (FIFO) if capacity
    * allows — the work-conserving half of the postpone path: a run parked
    * for parallelism executes as soon as a slot frees, without waiting
    * for the next scheduler tick. Sleep-parked runs still wait for their
    * wake-up window (tick phase 2). */
  private def regain(jobId: Long): Unit = parkLock.synchronized {
    // the sleep check must use the SAME clock as tick(): wall-clock here
    // would wrongly hold (or release) a parked run in virtual-clock
    // deployments whenever real time and scheduler time disagree
    val t = LocalDateTime.ofInstant(
      Instant.ofEpochSecond(lastMoment.get()), ZoneOffset.UTC)
    val it = waiting.iterator()
    var released = false
    while (!released && it.hasNext) {
      val w = it.next()
      if (w.job.id == jobId && !w.parkedForSleep && !w.job.isSleeping(t) &&
          runningCount(jobId) < w.job.parallelLimit) {
        it.remove()
        execute(w)
        released = true
      }
    }
  }

  /** Deactivate a parked (W) or failed-awaiting-rerun (E/T) run: drop it
    * from the waiting/rerun queues so it never executes again, and stamp
    * `deactivated` in the ledger (api.py:446-466 — only W/E/T runs are
    * deactivatable; a RUNNING run must be canceled instead). Returns
    * false when the run is in neither queue.
    */
  def deactivate(runId: Long): Boolean = parkLock.synchronized {
    var removed = false
    val it = waiting.iterator()
    while (!removed && it.hasNext)
      if (it.next().runId == runId) { it.remove(); removed = true }
    if (!removed) {
      val fit = failed.iterator()
      while (!removed && fit.hasNext)
        if (fit.next()._1.runId == runId) { fit.remove(); removed = true }
    }
    if (removed) ledger.foreach(_.deactivateRun(runId))
    removed
  }

  def isAlive: Boolean = alive.get()

  /** Run ids currently parked as W (test/console aid). */
  def waitingRunIds: Seq[Long] = waiting.asScala.map(_.runId).toSeq

  /** Run ids currently EXECUTING for `jobId` — the cancel-job sweep's
    * selection (api.py:389-404 reads status R from run_history; here the
    * live slot map is the source of truth). */
  def runningRunIds(jobId: Long): Seq[Long] =
    liveRuns.asScala.collect {
      case (runId, rec) if rec.job.id == jobId => runId
    }.toSeq

  /** ALL currently executing run ids, regardless of job — the
    * cancel-everything sweep must enumerate the live slot map directly:
    * a run can outlive its job's registration (job deleted mid-run), so
    * sweeping the job list would never reach it. */
  def liveRunIds: Seq[Long] = liveRuns.asScala.keys.toSeq

  /** Run ids awaiting rerun after failure (test/console aid). */
  def failedRunIds: Seq[Long] = failed.asScala.map(_._1.runId).toSeq

  /** Block until all currently queued/running runs finish (test aid). */
  def drain(timeoutSeconds: Int = 60): Boolean = {
    val deadline = System.nanoTime() + timeoutSeconds * 1000000000L
    // stopTicking() only flips the flag: a tick already in progress can
    // still charge one more run AFTER this loop first observes empty
    // queues — the run then executes concurrently with whatever the
    // caller does post-drain (observed: a fired pipeline overwriting its
    // output dir while the caller read it back). Join the loop thread
    // first so no new work can arrive mid-drain. (Skip while ticking is
    // still on — then drain only means "current queue empty".) The
    // reference is cleared only once the thread is CONFIRMED dead: a
    // tick outliving the join window used to both leave the race open
    // and make a retry drain() skip the join entirely.
    if (!alive.get())
      Option(tickThread.get())
        .filter(_ != Thread.currentThread())
        .foreach { th =>
          while (th.isAlive && System.nanoTime() < deadline) th.join(100)
          if (!th.isAlive) tickThread.compareAndSet(th, null)
        }
    while (System.nanoTime() < deadline) {
      if (inFlight.isEmpty && waiting.isEmpty) return true
      Thread.sleep(10)
    }
    inFlight.isEmpty
  }

  /** Wall-clock loop at 1 Hz over a MONOTONIC moment counter
    * (core.py:552-560, 812-833): each pass ticks `moment` then advances
    * it via [[Scheduler.resync]] against the wall clock — one fire per
    * second under jitter, a resync (skip forward, never a replay burst)
    * when the loop falls behind, and no duplicated fires when the wall
    * clock steps backwards. */
  def start(): Thread = {
    alive.set(true)
    val th = new Thread(() => {
      var moment = System.currentTimeMillis() / 1000L
      while (alive.get()) {
        try tick(moment) catch { case NonFatal(_) => }
        val next = (moment + 1) * 1000L
        // sleep in bounded slices: a BACKWARD wall-clock step makes the
        // wait arbitrarily long (the counter never rewinds, so the loop
        // idles until real time catches up — correct), but stopTicking()
        // and stop() only flip the alive flag, so one monolithic sleep
        // would pin the tick thread for the whole step and time out
        // drain()'s join. Slices keep shutdown latency <= 500 ms.
        var remaining = next - System.currentTimeMillis()
        while (alive.get() && remaining > 0) {
          Thread.sleep(math.min(remaining, 500L))
          remaining = next - System.currentTimeMillis()
        }
        moment = Scheduler.resync(moment, System.currentTimeMillis() / 1000L)
      }
    }, "graft-scheduler")
    th.setDaemon(true)
    tickThread.set(th)
    th.start()
    th
  }

  /** Stop the TICK LOOP only: running/queued runs keep executing and the
    * scheduler can be started again — the in-process twin of killing the
    * reference's scheduler process while its spawned job processes live
    * on (api.py:320-335). */
  def stopTicking(): Unit = alive.set(false)

  /** Full terminal shutdown (tick loop + executor pools). */
  def stop(): Unit = {
    alive.set(false)
    pool.shutdown()
    timeoutPool.shutdown()
  }
}

object Scheduler {

  /** Next tick moment, given the last ticked moment and the wall clock —
    * the reference's `_timeshift`/`_synchronize`/`_increment`
    * (core.py:812-832). Normally the counter just increments, so every
    * scheduler second fires exactly once under sub-tolerance jitter
    * (long tick, late wakeup). When the loop has fallen behind the wall
    * clock by more than `toleranceSeconds` — suspended JVM, multi-second
    * GC pause, clock stepped forward — it RESYNCs to the wall clock: the
    * stale seconds are skipped, never replayed as a burst of catch-up
    * fires (the reference's sleep(1-delay) ValueError -> _synchronize
    * path). A backwards wall-clock step never rewinds the counter: the
    * loop idles until real time catches up rather than firing the same
    * moments twice (the reference sleeps out the positive wait the same
    * way).
    */
  def resync(lastMoment: Long, wallSeconds: Long,
             toleranceSeconds: Long = 2L): Long = {
    val expected = lastMoment + 1
    if (wallSeconds - expected > toleranceSeconds) wallSeconds else expected
  }
}
