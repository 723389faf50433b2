package graft.core

import java.time.LocalDateTime
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statuses shared by runs/tasks/steps (pydin/core.py:2376-2441 and the
  * scheduler lifecycle): Queued, Started, Running, Waiting, Done, Error,
  * Canceled, Timeout, Unknown.
  */
object Status {
  val Queued = "Q"; val Started = "S"; val Running = "R"; val Waiting = "W"
  val Done = "D"; val Error = "E"; val Canceled = "C"; val Timeout = "T"
  val Unknown = "U"
}

/** Step types (pydin/core.py:2501-2508): extract-transform-load,
  * extract-load, execute. */
sealed abstract class StepType(val code: String)
object StepType {
  case object ETL extends StepType("ETL")
  case object EL extends StepType("EL")
  case object EX extends StepType("EX")
}

/** Graph vertex (pydin/core.py:2899-2999): a model plus prev/next edges. */
final class Node(val model: PdModel) {
  val prev: mutable.ListBuffer[Node] = mutable.ListBuffer()
  val next: mutable.ListBuffer[Node] = mutable.ListBuffer()
  override def toString: String = model.modelName
}

/** One executable unit (pydin/core.py:2446-2896): an E[-T]-L chain or a
  * lone executable. The reference runs each step as 3 threads + queues;
  * here a step is ONE lazy DataFrame plan executed by a single action —
  * Spark's pipelined physical execution subsumes the thread/queue
  * machinery (SURVEY.md §3.1).
  */
final case class Step(id: Int, stepType: StepType,
                      a: PdModel, b: Option[PdModel], c: Option[PdModel]) {
  /** Steps launched when this one completes (Node.join semantics —
    * core.py:2770-2774). */
  val successors: mutable.ListBuffer[Step] = mutable.ListBuffer()

  def models: Seq[PdModel] = Seq(Some(a), b, c).flatten
  def name: String = models.map(_.modelName).mkString("-")

  /** Execute this step; returns the per-step metric set. */
  def run(ctx: StepContext): StepMetrics = {
    stepType match {
      case StepType.EX =>
        val r = a.asInstanceOf[Executable].execute(ctx)
        StepMetrics(resultValue = r.resultValue, resultLong = r.resultLong)
      case _ =>
        val ex = a.asInstanceOf[Extractable]
        val ld = models.last.asInstanceOf[Loadable]
        MetricsBus.ensure(ctx.spark)
        models.foreach(_.prepare(ctx))
        val readName = s"graft_read_${ctx.runId}_$id"
        val writeName = s"graft_write_${ctx.runId}_$id"
        MetricsBus.clear(readName); MetricsBus.clear(writeName)
        val extracted = ex.extract(ctx).observe(readName, count(lit(1)).as("n"))
        val transformed = b match {
          case Some(t: Transformable) if stepType == StepType.ETL =>
            t.transform(ctx, extracted)
          case _ => extracted
        }
        val toWrite = transformed.observe(writeName, count(lit(1)).as("n"))
        val res = ld.load(ctx, toWrite)
        // observed metrics are harvested from the executed write plan by
        // the session's QueryExecutionListener (MetricsBus)
        MetricsBus.drain(ctx.spark)
        val m = StepMetrics(
          recordsRead = MetricsBus.get(readName).getOrElse(-1L),
          recordsWritten = MetricsBus.get(writeName).getOrElse(-1L),
          filesWritten = res.filesWritten,
          bytesWritten = res.bytesWritten)
        models.foreach(_.release(ctx))
        m
    }
  }
}

final case class StepMetrics(
    recordsRead: Long = -1L, recordsWritten: Long = -1L,
    filesRead: Long = 0L, filesWritten: Long = 0L,
    bytesRead: Long = 0L, bytesWritten: Long = 0L,
    resultValue: Option[Long] = None, resultLong: Option[String] = None)

/** A pipeline run (pydin/core.py:2104-2443): walks the step graph from
  * the roots, accumulating metrics, writing the task/step ledger rows,
  * finalizing status D/E.
  */
final class Task(val pipeline: Pipeline, ledger: Ledger) {
  @volatile var status: String = Status.Started
  val metrics = new ConcurrentHashMap[Int, StepMetrics]()
  var error: Option[Throwable] = None

  def totals: StepMetrics = {
    import scala.jdk.CollectionConverters._
    metrics.values.asScala.foldLeft(StepMetrics(0, 0, 0, 0, 0, 0)) { (acc, m) =>
      StepMetrics(
        acc.recordsRead + math.max(m.recordsRead, 0),
        acc.recordsWritten + math.max(m.recordsWritten, 0),
        acc.filesRead + m.filesRead, acc.filesWritten + m.filesWritten,
        acc.bytesRead + m.bytesRead, acc.bytesWritten + m.bytesWritten,
        acc.resultValue.orElse(m.resultValue), m.resultLong.orElse(acc.resultLong))
    }
  }

  /** Run steps in dependency order: roots first, successors as their
    * predecessors finish (reference `Step.resume` — core.py:2770-2774).
    * Sequential walk; intra-step parallelism comes from Spark itself.
    */
  def run(ctx: StepContext): String = {
    val taskId = ledger.startTask(ctx, pipeline.name)
    status = Status.Running
    val done = mutable.Set[Int]()
    def runStep(s: Step): Unit = {
      if (!done.contains(s.id) && status == Status.Running) {
        done += s.id
        val stepRow = ledger.startStep(ctx, taskId, s)
        try {
          val m = s.run(ctx)
          metrics.put(s.id, m)
          ledger.endStep(ctx, stepRow, Status.Done, m)
          s.successors.foreach(runStep)
        } catch {
          case NonFatal(e) =>
            ledger.endStep(ctx, stepRow, Status.Error, StepMetrics(),
              Some(e.toString))
            error = Some(e)
            status = Status.Error
        }
      }
    }
    pipeline.roots.foreach(runStep)
    if (status == Status.Running) status = Status.Done
    ledger.endTask(ctx, taskId, status, totals)
    status
  }
}

/** Items accepted by the Pipeline DSL: models, or `Branch(...)` for
  * fan-out (the reference's nested-list syntax — core.py:1926-1928).
  */
sealed trait PipeItem
final case class One(model: PdModel) extends PipeItem
final case class Branch(items: Seq[Seq[PipeItem]]) extends PipeItem
object PipeItem {
  import scala.language.implicitConversions
  implicit def fromModel(m: PdModel): PipeItem = One(m)
  implicit def fromSeq(ms: Seq[Seq[PdModel]]): PipeItem =
    Branch(ms.map(_.map(One(_): PipeItem)))
}

/** DAG of models compiled to steps (pydin/core.py:1831-1971).
  *
  * `Pipeline(a, b, c)` chains nodes in order; `Branch(Seq(x1, x2), Seq(y))`
  * fans out from the previous node. `refresh` pattern-matches roles along
  * edges into ETL / EL / EX steps (core.py:1934-1956); executable nodes
  * join after the step containing their predecessor (core.py:2990-2997).
  */
final class Pipeline(val name: String, items: Seq[PipeItem],
                     val ledger: Ledger = Ledger.none,
                     val errorLimit: Int = 1) {

  val nodes: mutable.ListBuffer[Node] = mutable.ListBuffer()
  private var stepsById: Map[Int, Step] = Map.empty
  var roots: Seq[Step] = Nil

  bind(); refresh()

  /** Link nodes in argument order; a Branch fans out and the next item
    * attaches to every branch tail (core.py:1917-1932). */
  private def bind(): Unit = {
    var tails: Seq[Node] = Nil
    def attach(n: Node): Unit = {
      tails.foreach { t => t.next += n; n.prev += t }
      nodes += n
    }
    items.foreach {
      case One(m) =>
        val n = new Node(m)
        attach(n)
        tails = Seq(n)
      case Branch(branches) =>
        val newTails = branches.map { br =>
          var branchTails = tails
          var last: Node = null
          br.foreach {
            case One(m) =>
              val n = new Node(m)
              branchTails.foreach { t => t.next += n; n.prev += t }
              nodes += n
              branchTails = Seq(n); last = n
            case _: Branch =>
              throw new IllegalArgumentException("nested Branch not supported")
          }
          last
        }
        tails = newTails
    }
  }

  /** Compile the node graph into typed steps (core.py:1934-1956).
    *
    * A node can belong to several steps (a source fanning out to two
    * sinks heads two EL steps), so succession is wired on each step's
    * HEAD and TAIL nodes: step s precedes step s2 iff s2's head is a
    * `next` of s's tail and they are different steps.
    */
  private def refresh(): Unit = {
    var nextId = 0
    // (step, headNode, tailNode)
    val compiled = mutable.ListBuffer[(Step, Node, Node)]()

    def mkStep(t: StepType, head: Node, mid: Option[Node], tail: Node): Step = {
      nextId += 1
      val s = t match {
        case StepType.ETL =>
          Step(nextId, t, head.model, mid.map(_.model), Some(tail.model))
        case StepType.EL => Step(nextId, t, head.model, Some(tail.model), None)
        case StepType.EX => Step(nextId, t, head.model, None, None)
      }
      compiled += ((s, head, tail))
      s
    }

    // Walk extractable heads: E->L or E->T->L per outgoing edge
    nodes.foreach { n =>
      n.model match {
        case _: Extractable =>
          n.next.foreach { m =>
            m.model match {
              case _: Transformable =>
                m.next.foreach { l =>
                  l.model match {
                    case _: Loadable => mkStep(StepType.ETL, n, Some(m), l)
                    case _ =>
                  }
                }
              case _: Loadable => mkStep(StepType.EL, n, None, m)
              case _ =>
            }
          }
        case _ =>
      }
    }
    // Executable nodes become EX steps
    nodes.foreach { n =>
      n.model match {
        case _: Executable => mkStep(StepType.EX, n, None, n)
        case _ =>
      }
    }
    // Successor wiring on tail -> head edges
    compiled.foreach { case (s, _, tail) =>
      tail.next.foreach { m =>
        compiled.foreach { case (s2, head2, _) =>
          if ((head2 eq m) && (s2 ne s) && !s.successors.contains(s2))
            s.successors += s2
        }
      }
    }
    val allSteps = compiled.map(_._1).toSeq
    val successorIds = allSteps.flatMap(_.successors.map(_.id)).toSet
    roots = allSteps.filterNot(s => successorIds.contains(s.id))
    stepsById = allSteps.map(s => s.id -> s).toMap
  }

  def steps: Seq[Step] = stepsById.values.toSeq.sortBy(_.id)

  def run(spark: SparkSession,
          calendar: CalendarDate = Calendar.today(),
          runId: Long = 0L): Task = {
    val task = new Task(this, ledger)
    val ctx = StepContext(spark, calendar, runId, ledger = ledger)
    task.run(ctx)
    task
  }

  /** Revoke a previous run: call every model's recycle for `keyValue`
    * (delete-by-key idempotency — core.py:2317-2349). */
  def recycle(spark: SparkSession, calendar: CalendarDate, keyValue: Long): Unit = {
    val ctx = StepContext(spark, calendar, keyValue, ledger = ledger)
    nodes.map(_.model).distinct.foreach(_.recycle(ctx, keyValue))
  }

  /** Full recycle-rerun (core.py:2317-2349): revoke the prior run's
    * rows, mark its run-history row Canceled, then re-run under the
    * SAME run id so re-stamped rows keep their provenance key.
    */
  def recycleRun(spark: SparkSession, calendar: CalendarDate,
                 priorRunId: Long): Task = {
    recycle(spark, calendar, priorRunId)
    ledger match {
      case j: JdbcLedger => j.setRunStatus(priorRunId, Status.Canceled)
      case _ =>
    }
    run(spark, calendar, priorRunId)
  }
}

object Pipeline {
  def apply(items: PipeItem*): Pipeline = new Pipeline("pipeline", items)
  def named(name: String, items: PipeItem*): Pipeline = new Pipeline(name, items)
  def withLedger(name: String, ledger: Ledger, items: PipeItem*): Pipeline =
    new Pipeline(name, items, ledger)
}
