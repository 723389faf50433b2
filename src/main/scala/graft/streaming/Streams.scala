package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType, TimestampType}

import org.apache.spark.sql.Row

/** Structured Streaming extensions (SURVEY.md §1.1/§2.9: the reference
  * has no streaming — its `Filenames` directory-monitor pattern and
  * chunked batch pull are the closest analogues; these are their
  * engine-native upgrades).
  *
  * Everything here is a thin declarative layer: `readStream` sources,
  * event-time windows with watermarks, and file-monitor ingestion.
  * State lives in the checkpoint, parallelism in the shuffle — nothing
  * to hand-roll.
  */
object Streams {

  /** Switch the session's streaming state store to RocksDB — the
    * at-scale backend for every stateful lift here (sessionize, dedup,
    * stream-stream joins, windowed aggs). The default in-heap
    * HDFSBackedStateStoreProvider costs ~2.6 KB of executor heap per
    * live key (StateProbe), so 10^8 live keys inside the watermark
    * horizon is ~260 GB of heap — at that scale RocksDB keeps state in
    * native memory + local SSD with the same eviction semantics
    * (StateProbe's plateau shapes are identical under both providers;
    * provider choice is recorded in the query checkpoint, so set it
    * BEFORE the first start and keep it for the checkpoint's life).
    * Takes effect for queries STARTED after the call. */
  def useRocksDbStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state" +
        ".RocksDBStateStoreProvider")

  /** Monitor a directory for new files of a given format — the streaming
    * upgrade of the reference's Filenames/FileManager polling loop.
    * Files are discovered incrementally (checkpoint-tracked), schema is
    * mandatory (streaming reads cannot infer).
    */
  def fileMonitor(spark: SparkSession, path: String, format: String,
                  schema: StructType,
                  options: Map[String, String] = Map.empty): DataFrame =
    spark.readStream.format(format).schema(schema)
      .options(options)
      .option("maxFilesPerTrigger", options.getOrElse("maxFilesPerTrigger", "100"))
      .load(path)

  /** Event-time tumbling-window counts/sums with a watermark — the
    * streaming twin of q22_events_hourly. Late rows beyond `watermark`
    * are dropped; state for closed windows is evicted automatically.
    */
  def windowedStats(events: DataFrame, tsCol: String, window: String,
                    watermark: String, valueCol: String,
                    keyCols: Seq[String] = Nil,
                    sumAgg: Column => Column = sum): DataFrame = {
    val keys = col(s"window") +: keyCols.map(col)
    events
      .withWatermark(tsCol, watermark)
      .groupBy((org.apache.spark.sql.functions.window(col(tsCol), window) +:
        keyCols.map(col)): _*)
      // sumAgg is pluggable so an oracle-gated lift can use the decimal
      // sum contract (graft.functions.decSum) for order-independence
      .agg(count(lit(1)).as("n"), sumAgg(col(valueCol)).as("sum_value"))
      .select((col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        keyCols.map(col)) :+ col("n") :+ col("sum_value"): _*)
  }

  /** Streaming exact dedup — the streaming twin of `Dedup.exact` /
    * `Dedup.exactByHash` (pass a hash column as the key for long texts).
    * `dropDuplicatesWithinWatermark` keeps only keys younger than the
    * event-time watermark in state, so state is BOUNDED at unbounded
    * input: a key reappearing within the watermark horizon is dropped,
    * one older than it has been evicted and passes again — the standard
    * at-scale contract for streaming ingest dedup.
    */
  def streamingDedup(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming corpus curation: the batch cleaning gate (quality score +
    * repetition signal + PII scrub + deterministic hash sample) applied
    * to a document STREAM. Every signal is a stateless Column expression,
    * so the exact batch semantics lift to Structured Streaming with no
    * state, no watermark, and no shuffle — ingest-time curation at
    * whatever rate the source delivers. Combine with [[streamingDedup]]
    * (on a content-hash column) for the full streaming clean-and-dedup.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.5, maxDupTokenFrac: Double = 0.9,
             sampleFraction: Double = 1.0): DataFrame = {
    import graft.functions.TextFunctions._
    import graft.operators.Sampling
    docs
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("dup_token_frac", dupTokenFrac(col(textCol)))
      .filter(col("quality") >= minQuality &&
        col("dup_token_frac") <= maxDupTokenFrac &&
        Sampling.splitHash(col(idCol)) <
          lit(Sampling.fractionThreshold(sampleFraction)))
      .withColumn(textCol, scrubPii(col(textCol)))
  }

  /** Streaming token-window chunking: [[graft.operators.Chunker]] lifted
    * to a document stream. The chunker is a pure flatMap projection
    * (tokenize → sequence → slice), so batch semantics carry over with no
    * state and no shuffle — documents arrive, chunks leave, at ingest
    * rate. The natural downstream of [[curate]]: clean on the stream,
    * chunk on the stream, land training-ready windows.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame =
    graft.operators.Chunker.chunkByTokens(docs, idCol, textCol, chunkSize, stride)

  /** Streaming calibrated-quality filtering: per-group quantile
    * thresholds computed ONCE in batch on a reference corpus
    * (`Sampling.quantileThresholds`) applied to a document stream as a
    * stream-static broadcast join + filter — stateless on the stream
    * side, so batch semantics lift exactly (the per-group histogram
    * itself is deliberately NOT recomputed per microbatch: a quantile
    * over "the corpus so far" would drift with arrival order, which is
    * precisely what a calibrated threshold is meant to prevent).
    */
  def calibratedFilter(docs: DataFrame, thresholds: DataFrame,
                       groupCol: String, score: org.apache.spark.sql.Column,
                       bins: Int): DataFrame =
    docs
      .withColumn("bin", floor(score * lit(bins.toDouble)).cast("long"))
      .join(broadcast(thresholds), Seq(groupCol))
      .filter(col("bin") >= col("thr_bin"))

  /** Monitor a directory for new MEDIA files (images, audio, video):
    * `binaryFile` is a regular file format, so it streams through the
    * same checkpoint-tracked discovery as any file source; payloads
    * land in the canonical media schema via
    * [[graft.operators.Multimodal.fromBinaryFiles]], and every decode /
    * featurize / stats operator is a stateless batched projection, so
    * batch semantics lift to the stream unchanged — ingest-time media
    * processing at whatever rate files arrive.
    */
  def mediaMonitor(spark: SparkSession, path: String,
                   modality: String): DataFrame =
    graft.operators.Multimodal.fromBinaryFiles(
      spark.readStream.format("binaryFile")
        .schema(StructType(Seq(
          StructField("path", StringType),
          StructField("modificationTime", TimestampType),
          StructField("length", LongType),
          StructField("content", BinaryType))))
        .load(path),
      modality)

  /** Streaming near-duplicate filter against a PERSISTED fingerprint
    * index — the ingest-time image/SimHash analogue of
    * [[calibratedFilter]]: drop stream rows whose 64-bit fingerprint is
    * within `maxHamming` of any index fingerprint. Stateless on the
    * stream side via the pigeonhole property: a hamming <= 3 match
    * shares at least one of the 4 fingerprint chunks, so four
    * equi-keyed stream-static anti-joins (one per chunk, hamming
    * verified in the join condition) are exact — no stream state, no
    * watermark, and the index side is the persisted artifact
    * `Multimodal.dHashFingerprints`/`Dedup` maintain in batch.
    * In-stream (new vs new) dedup composes via [[streamingDedup]] on
    * the exact fingerprint column.
    */
  def nearDupIndexFilter(stream: DataFrame, indexFp: DataFrame,
                         fpCol: String = "fp", maxHamming: Int = 3,
                         fpBits: Int = 64): DataFrame = {
    require(fpBits % 4 == 0, "chunking assumes 4 equal chunks")
    val width = fpBits / 4
    def chunk(c: Column, i: Int): Column =
      shiftrightunsigned(c, i * width).bitwiseAND(lit((1L << width) - 1L))
    (0 until 4).foldLeft(stream) { (df, i) =>
      val idx = indexFp.select(chunk(col(fpCol), i).as("__ickey"),
        col(fpCol).as("__ifp"))
      df.join(idx,
        chunk(col(fpCol), i) === col("__ickey") &&
          bit_count(col(fpCol).bitwiseXOR(col("__ifp"))) <= maxHamming,
        "left_anti")
    }
  }

  /** Streaming temperature-style domain rebalancing: per-group keep
    * rates derived ONCE in batch from a reference corpus
    * (`Sampling.temperatureThresholds`) applied to a document stream as
    * a stream-static broadcast join + deterministic hash filter —
    * stateless on the stream side, so batch semantics lift exactly.
    * The rates are deliberately NOT recomputed per microbatch: a
    * min(1, sqrt(n_min/n)) over "the groups seen so far" would drift
    * with arrival order and early microbatches would see wildly wrong
    * minima — the [[calibratedFilter]] rationale verbatim.
    */
  def temperatureMix(docs: DataFrame, rates: DataFrame,
                     groupCol: String, idCol: String): DataFrame = {
    import graft.operators.Sampling
    docs.join(broadcast(rates), Seq(groupCol))
      .filter(Sampling.splitHash(col(idCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Streaming interval enrich: [[graft.operators.Relational.rangeJoin]]
    * stream-static — the static interval table explodes over its bins at
    * plan-build time (including the auto-width probe, an action on the
    * STATIC side only), and the stream side is a stateless bin
    * projection into a stream-static equi-join, which Structured
    * Streaming supports for inner and left-preserving types. Batch ≡
    * stream by construction: no state, no watermark, no per-microbatch
    * statistics. The events-to-campaign attach as a continuous pipeline.
    */
  def rangeEnrich(stream: DataFrame, intervals: DataFrame,
                  pointCol: String, startCol: String, endCol: String,
                  binWidth: Long = 0L,
                  joinType: String = "inner"): DataFrame =
    graft.operators.Relational.rangeJoin(stream, intervals,
      pointCol, startCol, endCol, binWidth, joinType = joinType)

  /** STREAM-STREAM keyed interval join — the continuous twin of the
    * keyed range join (q47's attribution shape: clicks within a span
    * AFTER a purchase by the same user), and the one lift here where
    * BOTH sides are unbounded. Points pair with interval-opening rows
    * on `keyCols` equality plus the event-time range
    * `point.ts in [interval.ts, interval.ts + spanSeconds]` (both ends
    * inclusive, the BETWEEN contract). Structured Streaming's
    * stream-stream inner join buffers each side in state only as long
    * as the OTHER side's watermark says a match could still arrive —
    * the explicit time-range condition is what lets the engine compute
    * those state watermarks, so state stays bounded at
    * (watermark lag + span) x arrival rate, not history size; inner
    * matches emit as soon as both rows are present. Late rows beyond
    * the watermarks drop (the same rows the batch operator would keep:
    * run [[graft.operators.Relational.rangeJoin]] on the landed data
    * when exact late handling matters more than latency).
    *
    * Column-name contract: the two inputs share ONLY `keyCols`; the
    * joined row carries each key once plus both sides' payloads.
    *
    * `joinType` `left_outer` preserves unmatched POINTS (the
    * attribution-GAP shape: clicks no purchase explains): the engine
    * emits them with null interval columns only once the watermark
    * proves no matching interval can still arrive, so outer results
    * trail the inner ones by the watermark lag — correct, not late.
    */
  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   keyCols: Seq[String], pointTsCol: String,
                   intervalTsCol: String, spanSeconds: Long,
                   pointWatermark: String,
                   intervalWatermark: String,
                   joinType: String = "inner"): DataFrame = {
    require(keyCols.nonEmpty, "intervalJoin needs at least one key column")
    require(spanSeconds >= 0, "spanSeconds must be non-negative")
    val jt = joinType.toLowerCase.replace("-", "_")
    require(Set("inner", "left", "left_outer", "leftouter").contains(jt),
      s"intervalJoin supports inner/left_outer (got '$joinType'): " +
        "right/full outer would need interval-side completeness tracking")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet) --
      keyCols
    require(overlap.isEmpty,
      s"point and interval streams share non-key columns " +
        s"${overlap.mkString(",")}; rename one side")
    val p = points.withWatermark(pointTsCol, pointWatermark).alias("p")
    val iv = intervals.withWatermark(intervalTsCol, intervalWatermark)
      .alias("iv")
    val cond = keyCols.map(c => col(s"p.$c") === col(s"iv.$c"))
      .reduce(_ && _) &&
      col(s"p.$pointTsCol") >= col(s"iv.$intervalTsCol") &&
      col(s"p.$pointTsCol") <= col(s"iv.$intervalTsCol") +
        expr(s"INTERVAL $spanSeconds SECONDS")
    keyCols.foldLeft(p.join(iv, cond,
        if (jt == "inner") "inner" else "left_outer")) { (df, c) =>
      df.drop(iv(c))
    }
  }

  /** Streaming per-window KMV distinct sketch — the ingest half of the
    * q50 sketch cube run CONTINUOUSLY: each event-time window's sketch
    * flushes once the watermark closes it (append mode), ready to land
    * in the persisted cube table that `Kmv.merge` queries. Per-window
    * state is the BOUNDED k-min buffer (≤ 8 KB at k=1024), not the key
    * set — streaming distinct over unbounded key cardinality with flat
    * state, where a streaming `dropDuplicates` would grow state with
    * every new key. Batch ≡ stream: the flushed sketch array-equals the
    * batch sketch of the same window's rows (SurfacesSpec).
    */
  def sketchByWindow(events: DataFrame, tsCol: String, window: String,
                     watermark: String, hashCol: Column,
                     keyCols: Seq[String] = Nil, k: Int = 1024): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy((org.apache.spark.sql.functions.window(col(tsCol), window) +:
        keyCols.map(col)): _*)
      .agg(graft.expressions.Kmv.sketch(hashCol, k).as("sk"))
      .select((col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        keyCols.map(col)) :+ col("sk"): _*)

  /** Streaming per-window quantile sketch — the KLL member of the
    * windowed-sketch family: closed event-time windows emit their
    * mergeable quantile summary (per-window state is the O(k log n)
    * KLL buffer). Landed windows form the persisted quantile cube
    * `Kll.merge` queries over any range.
    */
  def quantilesByWindow(events: DataFrame, tsCol: String, window: String,
                        watermark: String, valueCol: Column,
                        keyCols: Seq[String] = Nil,
                        k: Int = 256): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy((org.apache.spark.sql.functions.window(col(tsCol), window) +:
        keyCols.map(col)): _*)
      .agg(graft.expressions.Kll.sketch(valueCol, k).as("sk"),
        count(lit(1)).as("n"))
      .select((col("window.start").as("window_start") +:
        col("window.end").as("window_end") +:
        keyCols.map(col)) :+ col("sk") :+ col("n"): _*)

  /** Streaming per-window heavy hitters — [[sketchByWindow]]'s
    * frequency twin: each closed event-time window emits its
    * SpaceSaving top-keys summary (capacity-bounded state per open
    * window, same guarantees as the batch aggregate). "Hottest keys
    * per hour, continuously" without keeping the key space in state.
    */
  def topKeysByWindow(events: DataFrame, tsCol: String, window: String,
                      watermark: String, keyCol: Column,
                      capacity: Int = 1024): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window))
      .agg(graft.expressions.TopKeys.agg(keyCol, capacity).as("top"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("top"))

  /** Streaming LM-fit scoring: [[graft.operators.LmScore]]'s broadcast
    * path on a document stream — the model (trained once on a static
    * reference corpus via `LmScore.bigramModel`) rides into the plan as
    * a map literal, and scoring is a stateless projection: no join, no
    * aggregation, no watermark. Batch ≡ stream by construction.
    */
  def lmScore(docs: DataFrame, model: Map[Long, Long],
              idCol: String, textCol: String): DataFrame =
    graft.operators.LmScore.bigramFitBroadcast(docs, model, idCol, textCol)

  /** Streaming Gopher-rule quality filter: the published web-corpus
    * heuristic battery ([[graft.functions.TextFunctions.gopherRules]])
    * on a document stream — pure codegen'd column expressions, no
    * state, no watermark, batch ≡ stream by construction. Returns the
    * passing documents with the metric struct attached (drop it or
    * keep it for the data card).
    */
  def gopherFilter(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("gopher",
        graft.functions.TextFunctions.gopherRules(col(textCol)))
      .filter(col("gopher.gopher_pass"))

  /** Streaming line-boilerplate removal: a frequent-line set
    * calibrated ONCE on a reference corpus
    * ([[graft.operators.Boilerplate.frequentLines]]) applied to a
    * document stream as one stateless split/filter/rejoin projection —
    * no explode, no aggregation, no watermark, batch ≡ stream by
    * construction (per-microbatch line frequencies would drift with
    * arrival order; the calibratedFilter/bm25 posture). The C4
    * repeated-line rule at ingest rate.
    */
  def boilerplateFilter(docs: DataFrame, textCol: String,
                        lines: Seq[String],
                        delimiter: String = "\n"): DataFrame =
    graft.operators.Boilerplate.removeLinesBroadcast(docs, textCol,
      lines, delimiter)

  /** Streaming BM25 scoring: a batch-calibrated
    * [[graft.operators.Retrieval.Bm25Model]] (per-query term idf
    * weights + corpus length stats) rides into the stream as literals,
    * and scoring is a stateless higher-order-function projection — no
    * join, no aggregation, no watermark. Batch ≡ stream by
    * construction; per-microbatch df/avgdl would drift with arrival
    * order, so the stats are reference-corpus-derived (the
    * calibratedFilter / temperatureMix posture). Rank the scored sink
    * downstream for top-k.
    */
  def bm25Score(docs: DataFrame,
                model: graft.operators.Retrieval.Bm25Model,
                idCol: String, textCol: String): DataFrame =
    graft.operators.Retrieval.bm25ScoreBroadcast(docs, idCol, textCol, model)

  /** Continuous CDC apply: every micro-batch of change rows (full rows
    * + version + optional tombstone flag) merges into the keyed parquet
    * table via [[graft.operators.Layout.merge]] — latest-wins upsert +
    * delete, partition-pruned copy-on-write when `partitionCols` is
    * set. The checkpoint gives exactly-once batch tracking, and
    * re-applying a batch is idempotent by merge's contract, so a
    * replayed micro-batch after a crash converges to the same table.
    * Apply batches in version order (the no-tombstone-retention replay
    * semantics documented on merge).
    *
    * With `manifest = true` the target is a MANIFEST table
    * ([[graft.operators.Layout.writeManifestTable]] seeds it;
    * `partitionCols` comes from the manifest and the argument is
    * ignored): each micro-batch publishes one new partition-granular
    * snapshot via [[graft.operators.Layout.mergeManifest]], so
    * concurrent readers NEVER observe the rename-aside missing-
    * partition window partitioned `merge` documents — the required
    * mode when readers run continuously against the table under CDC.
    *
    * With `mor = true` (manifest only) each micro-batch lands as a
    * pending MERGE-ON-READ delta generation
    * ([[graft.operators.Layout.mergeManifestDelta]]): per batch the
    * base is never read — the right cost shape when micro-batches are
    * small and scatter across many partitions — and readers resolve
    * latest-wins in-plan. Schedule
    * [[graft.operators.Layout.foldManifestDeltas]] (or a `FoldDeltas`
    * DSL node) to bound the accumulated read tax. Exactly-once: the
    * checkpoint's micro-batch id rides into the merge as the
    * manifest's `sinkBatch` marker, so a checkpoint-replayed batch is
    * a loud no-op in BOTH manifest modes — no duplicate publish, no
    * duplicate delta generation for a downstream `manifest-feed`
    * consumer to re-emit. `foldEvery = N` folds the pending deltas
    * back into single base generations after every Nth micro-batch —
    * the self-contained cadence that bounds the read tax without an
    * external maintenance schedule (the fold keys off the checkpoint's
    * batch id, so a restart keeps the cadence).
    *
    * Returns the configured writer — caller sets checkpoint/trigger
    * and starts it (the [[ingest]]/[[annIngest]] shape).
    */
  def cdcApply(stream: DataFrame, path: String, keys: Seq[String],
               versionCol: String, partitionCols: Seq[String] = Nil,
               deleteCol: Option[String] = None,
               manifest: Boolean = false,
               mor: Boolean = false,
               foldEvery: Int = 0): DataStreamWriter[Row] = {
    require(partitionCols.isEmpty || !manifest,
      "cdcApply(manifest = true): the table's partitioning comes from " +
        "its manifest (seeded by writeManifestTable) and the " +
        s"partitionCols argument (${partitionCols.mkString(",")}) is " +
        "not consulted — pass partitionCols = Nil")
    require(!mor || manifest,
      "cdcApply(mor = true) needs manifest = true: merge-on-read " +
        "deltas are a manifest-table discipline")
    require(foldEvery == 0 || mor,
      "foldEvery is the merge-on-read fold cadence; it needs mor = true")
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        if (mor) {
          graft.operators.Layout.mergeManifestDelta(batch.sparkSession,
            path, batch, keys, versionCol, deleteCol = deleteCol,
            batchId = id)
          if (foldEvery > 0 && (id + 1) % foldEvery == 0) {
            graft.operators.Layout.foldManifestDeltas(
              batch.sparkSession, path)
            ()
          }
        }
        else if (manifest)
          graft.operators.Layout.mergeManifest(batch.sparkSession, path,
            batch, keys, versionCol, deleteCol = deleteCol, batchId = id)
        else
          graft.operators.Layout.merge(batch.sparkSession, path, batch,
            keys, versionCol, partitionCols, deleteCol = deleteCol)
        ()
      }
    }
  }

  /** Continuous embedding ingest into the persisted generational ANN
    * index ([[graft.operators.AnnIndex]]): every micro-batch of
    * (vec_id, embedding) rows encodes with the index's PERSISTED
    * quantizers (`AnnIndex.add` — no retraining, the daily-ingest
    * posture) and appends to the live generation's partitioned corpus.
    * The checkpoint gives exactly-once batch tracking; readers loaded
    * before an append see their pinned snapshot (generational
    * discipline), after it the new vectors are queryable. Run
    * `AnnIndex.compact` on a maintenance schedule to fold the
    * append small-files into a fresh generation.
    *
    * Returns the configured writer — caller sets checkpoint/trigger
    * and starts it (the [[ingest]] shape).
    */
  def annIngest(stream: DataFrame,
                indexPath: String): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      if (!batch.isEmpty) {
        graft.operators.AnnIndex.add(batch.sparkSession, indexPath, batch)
        ()
      }
    }

  /** Continuous incremental aggregate maintenance
    * ([[graft.operators.Ivm]]): each micro-batch of raw delta rows
    * folds into the persisted keyed summary (count + exact decimal
    * sums) — a standing GROUP BY over an unbounded stream with the
    * state OUTSIDE the stream (a queryable table, not a state store),
    * so readers see atomically-published snapshots and the query
    * restarts stateless. Unlike [[cdcApply]] (latest-wins merge,
    * naturally idempotent), delta addition is not — so the micro-batch
    * id rides into [[graft.operators.Ivm.applyDelta]]'s marker and a
    * checkpoint-replayed batch is a no-op, keeping the fold
    * exactly-once end to end.
    *
    * Returns the configured writer — caller sets checkpoint/trigger
    * and starts it (the [[ingest]] shape).
    */
  def incrementalAgg(stream: DataFrame, path: String, keys: Seq[String],
                     sumCols: Seq[String],
                     weightCol: Option[String] = None,
                     kmvCols: Seq[String] = Nil,
                     kllCols: Seq[String] = Nil,
                     sketchK: Int = 4096): DataStreamWriter[Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      if (!batch.isEmpty) {
        graft.operators.Ivm.applyDelta(batch.sparkSession, path, batch,
          keys, sumCols, batchId = id, weightCol = weightCol,
          kmvCols = kmvCols, kllCols = kllCols, sketchK = sketchK)
        ()
      }
    }

  /** Continuous ingestion: stream files from `srcPath` into a partitioned
    * parquet sink with exactly-once file tracking via the checkpoint.
    * The streaming E->L step.
    */
  def ingest(df: DataFrame, outPath: String, checkpoint: String,
             partitionBy: Seq[String] = Nil): DataStreamWriter[Row] = {
    var w = df.writeStream
      .format("parquet")
      .option("path", outPath)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w
  }

  /** Drain a streaming DataFrame through an AvailableNow APPEND-mode
    * memory sink and return the sink's table — the test/gate harness
    * for finite stream-equals-batch checks (pair with the sentinel
    * staging pattern when windows must close first).
    */
  def drainAppendToTable(spark: SparkSession, df: DataFrame,
                         tag: String): DataFrame = {
    val name = s"${tag}_sink_${java.util.UUID.randomUUID.toString.replace("-", "")}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Run an AvailableNow streaming query to completion (drains whatever
    * is currently in the source, then stops — the batch-boundary pattern
    * for testable streaming pipelines).
    */
  def runAvailableNow(w: DataStreamWriter[Row]): StreamingQuery = {
    val q = w.start()
    q.awaitTermination()
    q
  }
}
