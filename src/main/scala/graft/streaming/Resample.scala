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
  * Semantics (matches the batch operator on the closed subset,
  * INCLUDING null-value rows):
  *  - a bucket [b, b+step) is FINAL once the watermark passes b+step;
  *    it emits with `n_obs` = ALL its rows (null values included, the
  *    batch `count(*)` contract) and mean = CAST(SUM(CAST(v AS
  *    DECIMAL(38,6))) AS DOUBLE)/count(v) over the NON-NULL values —
  *    the same arithmetic as `graft.functions.decAvg`, replicated in
  *    BigDecimal so a batch q53 run over the same rows hash-matches
  *    value for value;
  *  - a bucket whose values are ALL null behaves exactly like batch's
  *    null-mean bucket: it contributes its n_obs but no fill anchor —
  *    ffill carries the previous observed value through it (or null
  *    before the first observed value, batch's leading-edge nulls),
  *    interp lerps across it toward the next observed bucket;
  *  - gap buckets between the previously emitted bucket and a newly
  *    final one emit the carried/lerped value with n_obs = 0 — so the
  *    emitted grid per key is exactly the batch operator's
  *    [min, max-closed] grid, never extrapolated past the last
  *    closed bucket;
  *  - rows arriving for an already-emitted bucket are LATE and dropped
  *    (the watermark contract — same rows a windowed agg would drop).
  *
  * The one divergence from batch, inherent to append-mode streaming:
  * TRAILING all-null buckets (nothing observed after them yet). Batch,
  * seeing the whole finite input, emits them (ffill: carried value;
  * interp: null — no right anchor); the stream cannot know the tail is
  * final, so ffill emits them as they close (carried value — identical
  * to batch's answer whether or not more data arrives), while interp
  * holds them open until a later OBSERVED bucket provides the right
  * lerp anchor. A stream's open tail is by definition not final, so
  * nothing sound is withheld.
  *
  * State per key is BOUNDED: the open buckets inside the watermark lag
  * (≤ lag/step + out-of-orderness) as (sum, n_nonnull, n_rows)
  * partials — not the events — plus one (lastBucket, lastValue) pair.
  * 100 TB posture: key cardinality × a few dozen entries, flat
  * per-event cost, no replay.
  */
object Resample {

  final case class Point(user_id: Long, ts: Timestamp, value: Option[Double])
  final case class Filled(user_id: Long, bucket_start: Long, n_obs: Long,
                          value_ffill: Option[Double])
  /** pending: bucket -> (decimal-sum-as-string, n_nonnull, n_rows);
    * lastBucket/hasBucket track grid progress (last EMITTED bucket),
    * lastValue/hasValue the fill anchor (last OBSERVED mean) — they
    * decouple when all-null buckets emit under ffill. */
  final case class FillState(pending: Map[Long, (String, Long, Long)],
                             lastBucket: Long, hasBucket: Boolean,
                             lastValue: Double, hasValue: Boolean)

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
      // null KEY/TS rows have no bucket to live in and would kill the
      // continuous query at Encoder time (primitive fields) — drop them
      // in the scan stage. Null VALUES keep flowing: batch counts them
      // in n_obs (not in the mean), and so does the state machine.
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .as[Point]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FillState, Filled](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, it, state: GroupState[FillState]) =>
          val wmMs = state.getCurrentWatermarkMs()
          var st = state.getOption.getOrElse(
            FillState(Map.empty, 0L, hasBucket = false, 0.0, hasValue = false))
          if (!state.hasTimedOut) {
            it.foreach { p =>
              val epochSec = Math.floorDiv(p.ts.getTime, 1000L)
              val b = epochSec - Math.floorMod(epochSec, stepSeconds)
              // late: its bucket already emitted — nothing sound to do
              if (!(st.hasBucket && b <= st.lastBucket)) {
                val (s0, k0, n0) = st.pending.getOrElse(b, ("0", 0L, 0L))
                val (s1, k1) = p.value match {
                  case Some(v) =>
                    (new java.math.BigDecimal(s0).add(dec(v)).toPlainString,
                      k0 + 1)
                  case None => (s0, k0)
                }
                st = st.copy(pending =
                  st.pending.updated(b, (s1, k1, n0 + 1)))
              }
            }
          }
          // finalize pending buckets the watermark has closed, in order,
          // gap-filling from the previously emitted bucket. A bucket is
          // a fill ANCHOR only if it has non-null values; under interp,
          // anchorless (all-null) buckets wait for the next anchor to
          // supply the right lerp endpoint — under ffill they emit at
          // their own close (their fill value is already determined).
          val out = scala.collection.mutable.ArrayBuffer.empty[Filled]
          val closable = st.pending.keys.toArray.sorted
            .takeWhile(b => (b + stepSeconds) * 1000L <= wmMs)
          closable.foreach { b =>
            val (s, k, n) = st.pending(b)
            val isAnchor = k > 0
            if (isAnchor || !lerp) {
              val v: Option[Double] =
                if (isAnchor)
                  Some(new java.math.BigDecimal(s).doubleValue() / k)
                else if (st.hasValue) Some(st.lastValue) // ffill carry
                else None // batch's leading-edge nulls
              // the batch operator's maxBucketsPerKey guard, streamed:
              // a key silent for a decade then reappearing at a fine
              // step would emit the whole gap in ONE invocation — fail
              // loudly naming the key instead of materializing it
              if (st.hasBucket &&
                  (b - st.lastBucket) / stepSeconds > maxGapBuckets)
                throw new IllegalStateException(
                  s"streaming resample: key $user gap of " +
                  s"${(b - st.lastBucket) / stepSeconds} buckets at " +
                  s"step=${stepSeconds}s > maxGapBuckets=$maxGapBuckets; " +
                  "raise maxGapBuckets or coarsen the step")
              // gap run start: normally the bucket after the last
              // emitted one; before ANY emission (leading edge), the
              // key's grid starts at its smallest swept pending bucket
              // (batch's per-key min bound includes all-null buckets)
              val gapStartOpt: Option[Long] =
                if (st.hasBucket) Some(st.lastBucket + stepSeconds)
                else st.pending.keys.filter(_ < b)
                  .reduceOption(_ min _)
              gapStartOpt.foreach { gapStart =>
                var g = gapStart
                while (g < b) {
                  // gap run: unobserved buckets (n_obs 0) and — under
                  // interp — swept all-null buckets (their recorded
                  // n_obs); carry forward, or lerp toward the anchor
                  // that is closing right now (batch q56's arithmetic)
                  val gn = st.pending.get(g).map(_._3).getOrElse(0L)
                  val gv: Option[Double] =
                    if (!st.hasValue) None
                    else if (!lerp || !isAnchor) Some(st.lastValue)
                    else Some(st.lastValue +
                      (v.get - st.lastValue) *
                        ((g - st.lastBucket).toDouble /
                          (b - st.lastBucket).toDouble))
                  out += Filled(user, g, gn, gv)
                  g += stepSeconds
                }
              }
              out += Filled(user, b, n, v)
              st = FillState(
                st.pending.removedAll(
                  st.pending.keys.filter(_ <= b)),
                b, hasBucket = true,
                if (isAnchor) v.get else st.lastValue,
                hasValue = st.hasValue || isAnchor)
            }
          }
          if (st.pending.nonEmpty) {
            state.update(st)
            // fire when the earliest CLOSABLE-on-its-own bucket closes:
            // every pending bucket under ffill, anchors only under
            // interp (anchorless buckets cannot emit without a later
            // anchor, so no timer can help them)
            val fireable =
              if (lerp) st.pending.collect { case (b, (_, k, _)) if k > 0 => b }
              else st.pending.keys
            if (fireable.nonEmpty)
              state.setTimeoutTimestamp(
                (fireable.min + stepSeconds) * 1000L)
          } else if (st.hasBucket || st.hasValue) {
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
