package graft.models

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.LongAccumulator

import graft.core._

/** Raised by [[TolerantMapper]] when the per-run error budget is spent —
  * the Task marks the step E, reproducing the reference's short-circuit
  * (`error_limit`, pydin/models.py:283-291,330-338 with default 1 at
  * core.py:1834).
  */
final class ErrorLimitExceeded(val errors: Long, val limit: Long)
  extends RuntimeException(s"error limit reached: $errors >= $limit")

/** Row-level transform with the reference's per-record error tolerance.
  *
  * Spark fails a whole task on the first exception; the reference counts
  * per-record failures and only aborts at `errorLimit` (SURVEY.md §7.4.1).
  * Here the user function is try-wrapped inside `mapPartitions`; failing
  * records are dropped and counted in a LongAccumulator (read back into
  * the step metrics), and `release` — which runs after the step's action
  * — throws [[ErrorLimitExceeded]] when the count reached the limit, so
  * the step lands in status E exactly when the reference would abort.
  *
  * For FORMAT-level tolerance (malformed CSV/JSON lines) use the
  * readers' native PERMISSIVE mode / `_corrupt_record` instead; this
  * model covers user-code failures.
  */
final case class TolerantMapper(
    fn: Row => Row,
    outSchema: StructType,
    errorLimit: Long = 1L,
    override val knobs: ModelKnobs = ModelKnobs())
  extends Transformable {

  @transient @volatile private var acc: LongAccumulator = _

  def errors: Long = Option(acc).map(_.value.longValue()).getOrElse(0L)

  def transform(ctx: StepContext, df: DataFrame): DataFrame = {
    val a = ctx.spark.sparkContext.longAccumulator(s"graft_errors_$modelName")
    acc = a
    val f = fn
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        try Some(f(r))
        catch { case NonFatal(_) => a.add(1L); None }
      }
    }(Encoders.row(outSchema))
  }

  override def release(ctx: StepContext): Unit = {
    val n = errors
    if (n >= errorLimit) throw new ErrorLimitExceeded(n, errorLimit)
  }
}
