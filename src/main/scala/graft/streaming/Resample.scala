package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming resample + forward-fill — the continuous counterpart of
  * batch [[graft.operators.Relational.resampleFfill]] (q53), built on
  * `flatMapGroupsWithState` + event-time timeout (the [[Sessionize]]
  * discipline): per key, a fixed `stepSeconds` grid whose buckets emit
  * exactly once, in order, as the watermark closes them — observed
  * buckets with their decimal-exact mean, gap buckets with the last
  * observed value carried forward.
  *
  * Semantics (matches the batch operator on the closed subset):
  *  - a bucket [b, b+step) is FINAL once the watermark passes b+step;
  *    it emits with `n_obs` and mean = CAST(SUM(CAST(v AS
  *    DECIMAL(38,6))) AS DOUBLE)/n — the same arithmetic as
  *    `graft.functions.decAvg`, replicated in BigDecimal so a batch
  *    q53 run over the same rows hash-matches value for value;
  *  - gap buckets between the previously emitted bucket and a newly
  *    final observed one emit the carried value with n_obs = 0 — so
  *    the emitted grid per key is exactly the batch operator's
  *    [min, max-observed] grid, never extrapolated past the last
  *    observation (the stream doesn't guess the future; a later
  *    observation extends the grid when it closes);
  *  - rows arriving for an already-emitted bucket are LATE and dropped
  *    (the watermark contract — same rows a windowed agg would drop).
  *
  * State per key is BOUNDED: the open buckets inside the watermark lag
  * (≤ lag/step + out-of-orderness) as (sum, count) partials — not the
  * events — plus one (lastBucket, lastValue) pair. 100 TB posture: key
  * cardinality × a few dozen entries, flat per-event cost, no replay.
  */
object Resample {

  final case class Point(user_id: Long, ts: Timestamp, value: Double)
  final case class Filled(user_id: Long, bucket_start: Long, n_obs: Long,
                          value_ffill: Double)
  /** pending: bucket -> (decimal-sum-as-string, count); last emitted
    * bucket/value carried for gap fill ("" sum sentinel unused). */
  final case class FillState(pending: Map[Long, (String, Long)],
                             lastBucket: Long, lastValue: Double,
                             hasLast: Boolean)

  private val Scale = 6

  private def dec(v: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(v).setScale(Scale,
      java.math.RoundingMode.HALF_UP)

  /** `events` must carry (user_id castable-to-long, ts timestamp WITH a
    * watermark, value castable-to-double); `stepSeconds` is the grid.
    */
  def ffill(events: DataFrame, stepSeconds: Long,
            maxGapBuckets: Long = 1000000L): Dataset[Filled] =
    grid(events, stepSeconds, lerp = false, maxGapBuckets)

  /** Streaming linear-interpolation resample — the continuous
    * counterpart of batch [[graft.operators.Relational.resampleInterp]]
    * (q56). Identical state machine to [[ffill]]: because a gap bucket
    * only ever emits at the moment the NEXT observed bucket finalizes,
    * both lerp endpoints are in hand at emission time — streaming
    * interpolation costs nothing over forward fill (the batch plan's
    * zero-extra-exchange property, mirrored in state). The lerp spells
    * the batch operator's exact double arithmetic
    * (`v0 + (v1-v0) * (t-t0)/(t1-t0)`), so batch and stream hash-match.
    * Output column is `value_interp`.
    */
  def interp(events: DataFrame, stepSeconds: Long,
             maxGapBuckets: Long = 1000000L): DataFrame =
    grid(events, stepSeconds, lerp = true, maxGapBuckets)
      .toDF().withColumnRenamed("value_ffill", "value_interp")

  private def grid(events: DataFrame, stepSeconds: Long, lerp: Boolean,
                   maxGapBuckets: Long): Dataset[Filled] = {
    require(stepSeconds > 0, "stepSeconds must be positive")
    require(maxGapBuckets > 0, "maxGapBuckets must be positive")
    implicit val pointEnc = Encoders.product[Point]
    implicit val stateEnc = Encoders.product[FillState]
    implicit val outEnc = Encoders.product[Filled]
    implicit val keyEnc = Encoders.scalaLong

    events.select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      // null key/ts/value rows would kill the continuous query at
      // Encoder time (primitive fields) — drop them in the scan stage.
      // Documented divergence from batch: batch counts a null-VALUE row
      // in n_obs (not in the mean); the stream excludes it entirely —
      // one bad sensor row must not take down the pipeline
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FillState, Filled](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, it, state: GroupState[FillState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          var st = state.getOption
            .getOrElse(FillState(Map.empty, 0L, 0.0, hasLast = false))
          if (!state.hasTimedOut) {
            it.foreach { p =>
              val epochSec = Math.floorDiv(p.ts.getTime, 1000L)
              val b = epochSec - Math.floorMod(epochSec, stepSeconds)
              // late: its bucket already emitted — nothing sound to do
              if (!(st.hasLast && b <= st.lastBucket)) {
                val (s0, n0) = st.pending.getOrElse(b, ("0", 0L))
                val s1 = new java.math.BigDecimal(s0).add(dec(p.value))
                st = st.copy(pending =
                  st.pending.updated(b, (s1.toPlainString, n0 + 1)))
              }
            }
          }
          // finalize every pending bucket the watermark has closed, in
          // order, gap-filling from the previously emitted bucket
          val out = scala.collection.mutable.ArrayBuffer.empty[Filled]
          st.pending.keys.toArray.sorted
            .takeWhile(b => (b + stepSeconds) * 1000L <= wmMs)
            .foreach { b =>
              val (s, n) = st.pending(b)
              val v = new java.math.BigDecimal(s).doubleValue() / n
              // the batch operator's maxBucketsPerKey guard, streamed:
              // a key silent for a decade then reappearing at a fine
              // step would emit the whole gap in ONE invocation — fail
              // loudly naming the key instead of materializing it
              if (st.hasLast &&
                  (b - st.lastBucket) / stepSeconds > maxGapBuckets)
                throw new IllegalStateException(
                  s"streaming resample: key $user gap of " +
                  s"${(b - st.lastBucket) / stepSeconds} buckets at " +
                  s"step=${stepSeconds}s > maxGapBuckets=$maxGapBuckets; " +
                  "raise maxGapBuckets or coarsen the step")
              if (st.hasLast) {
                var g = st.lastBucket + stepSeconds
                while (g < b) {
                  // gap: carry forward, or lerp toward the bucket that
                  // is closing right now (batch q56's exact arithmetic)
                  val gv =
                    if (!lerp) st.lastValue
                    else st.lastValue + (v - st.lastValue) *
                      ((g - st.lastBucket).toDouble /
                        (b - st.lastBucket).toDouble)
                  out += Filled(user, g, 0L, gv)
                  g += stepSeconds
                }
              }
              out += Filled(user, b, n, v)
              st = FillState(st.pending - b, b, v, hasLast = true)
            }
          if (st.pending.nonEmpty) {
            state.update(st)
            // fire when the earliest open bucket closes
            state.setTimeoutTimestamp(
              (st.pending.keys.min + stepSeconds) * 1000L)
          } else if (st.hasLast) {
            // nothing open: keep the carry for future gap fill, no
            // timeout needed (nothing further can emit without data)
            state.update(st)
          } else {
            state.remove()
          }
          out.iterator
      }
  }
}
