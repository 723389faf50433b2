package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Key fields stamped onto loaded records for provenance/idempotency
  * (pydin/fields.py:26-76; stamping loop models.py:227-232). The label is
  * `pd_<name>`; the value is the current run's id.
  */
sealed abstract class KeyField(val name: String) extends Serializable {
  def label: String = s"pd_$name"
}
object KeyField {
  case object RunId extends KeyField("run_id")
  case object TaskId extends KeyField("task_id")
  case object StepId extends KeyField("step_id")
  case object ProcessId extends KeyField("process_id")
}

/** The shared model knobs (pydin/models.py:33-254), implemented once as
  * DataFrame decorators instead of SQL-text rewriting:
  *
  *  - logical-date window: `dateField` + one of `daysBack`/`hoursBack`/
  *    `monthsBack` (+ `timezone`) selects a [[CalendarDate]] window from
  *    the pipeline's calendar; becomes a `between` predicate that
  *    Catalyst pushes into the scan (models.py:99-123, 856-860).
  *  - incremental high-water mark: `valueField` (+ `targetValue` override
  *    or the sink's `lastValue` probe) becomes `col(v) > lit(hwm)`
  *    (models.py:136-144, 862-867).
  *  - provenance stamping: `keyField` appends `lit(runId) as pd_*`
  *    on load (models.py:227-232).
  *  - `cleanup`: purge the target before load (truncate/delete/overwrite).
  *  - `chunkSize`: JDBC fetchsize/batchsize analogue (models.py:47).
  */
final case class ModelKnobs(
    dateField: Option[String] = None,
    daysBack: Option[Int] = None,
    hoursBack: Option[Int] = None,
    monthsBack: Option[Int] = None,
    timezone: Option[Int] = None,
    valueField: Option[String] = None,
    targetValue: Option[Any] = None,
    keyField: Option[KeyField] = None,
    insertKeyField: Boolean = true,
    chunkSize: Int = 1000,
    cleanup: Boolean = false) extends Serializable {

  /** The model's target window on `calendar` (models.py:99-112). */
  def targetDate(calendar: CalendarDate): CalendarDate = {
    var d: CalendarDate = calendar
    daysBack.foreach(n => d = d.daysBack(n))
    hoursBack.foreach(n => d = d.hoursBack(n))
    monthsBack.foreach(n => d = d.monthsBack(n))
    timezone.foreach(h => d = d.withTimezone(h))
    d
  }

  def dateWindow(df: DataFrame, calendar: CalendarDate): DataFrame =
    dateField match {
      case Some(f) =>
        val t = targetDate(calendar)
        df.where(col(f).between(
          lit(Timestamp.valueOf(t.start)), lit(Timestamp.valueOf(t.end))))
      case None => df
    }

  /** `col(valueField) > lastValue`, with `targetValue` taking precedence
    * over the probed `lastValue` (models.py:136-144). */
  def hwmFilter(df: DataFrame, lastValue: => Option[Any]): DataFrame =
    valueField match {
      case Some(f) =>
        targetValue.orElse(lastValue) match {
          case Some(v) => df.where(col(f) > lit(v))
          case None => df
        }
      case None => df
    }

  def stampKey(df: DataFrame, runId: Long): DataFrame =
    keyField match {
      case Some(k) if insertKeyField => df.withColumn(k.label, lit(runId))
      case _ => df
    }
}

/** Execution context handed to models: the session, the run's identity,
  * and the logical calendar date (set from the run tag).
  */
final case class StepContext(
    spark: SparkSession,
    calendar: CalendarDate,
    runId: Long = 0L,
    variables: Map[String, String] = Map.empty,
    ledger: Ledger = Ledger.none) {

  /** `{var}` templating for custom queries/paths (models.py:917-919). */
  def render(text: String): String = {
    val base = variables ++ Map(
      "run_id" -> runId.toString,
      "date_from" -> calendar.start.toString.replace('T', ' '),
      "date_to" -> calendar.end.toString.replace('T', ' '))
    base.foldLeft(text) { case (acc, (k, v)) => acc.replace(s"{$k}", v) }
  }
}

/** Result of a load action. */
final case class LoadResult(rowsWritten: Long, bytesWritten: Long = 0L,
                            filesWritten: Long = 0L)

/** Result of an execute action: int-like results become `resultValue`,
  * textual ones `resultLong` (models.py:408-418).
  */
final case class ExecResult(resultValue: Option[Long] = None,
                            resultLong: Option[String] = None)

/** Base node of the model graph (models.py:33). Concrete models mix in
  * one or more roles below. `prepare`/`release` bracket step execution
  * (models.py:198-232).
  */
trait PdModel extends Serializable {
  def modelName: String = getClass.getSimpleName.stripSuffix("$")
  def knobs: ModelKnobs = ModelKnobs()
  def prepare(ctx: StepContext): Unit = {}
  def release(ctx: StepContext): Unit = {}
  /** Delete rows stamped with `keyValue` so the run can be repeated
    * without duplicates (models.py:469-475). */
  def recycle(ctx: StepContext, keyValue: Long): Unit = {}
  /** Probe for the last committed value, for HWM increments
    * (models.py:1172-1178); most models have none. */
  def lastValue(ctx: StepContext): Option[Any] = None
}

/** Source role (models.py:257-295): produce a DataFrame. The chunked
  * queue-pumping of the reference collapses into lazy partitioned scan.
  */
trait Extractable extends PdModel {
  /** Raw read, before knob decoration. */
  protected def read(ctx: StepContext): DataFrame
  final def extract(ctx: StepContext): DataFrame = {
    val df = read(ctx)
    knobs.hwmFilter(knobs.dateWindow(df, ctx.calendar), lastValue(ctx))
  }
}

/** Transform role (models.py:298-342): DataFrame => DataFrame. */
trait Transformable extends PdModel {
  def transform(ctx: StepContext, df: DataFrame): DataFrame
}

/** Sink role (models.py:345-389): consume a DataFrame. Key-field
  * stamping (the reference's `process`) happens here.
  */
trait Loadable extends PdModel {
  protected def write(ctx: StepContext, df: DataFrame): LoadResult
  final def load(ctx: StepContext, df: DataFrame): LoadResult = {
    if (knobs.cleanup) clean(ctx)
    write(ctx, knobs.stampKey(df, ctx.runId))
  }
  /** Purge all data in the target (truncate/delete). */
  def clean(ctx: StepContext): Unit = {}
}

/** Action role (models.py:392-422): one-shot side effect. */
trait Executable extends PdModel {
  def execute(ctx: StepContext): ExecResult
}
