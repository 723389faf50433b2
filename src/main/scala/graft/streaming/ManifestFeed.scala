package graft.streaming

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.operators.Layout

/** `spark.readStream.format("manifest-feed")` — a Structured Streaming
  * SOURCE over a manifest table's append feed, the `readStream`
  * surface a lakehouse table needs (the pattern of Delta Lake's
  * streaming source, re-expressed over the graft manifest):
  *
  *  - OFFSETS ARE MANIFEST VERSIONS. Each micro-batch covers the
  *    versions published since the last batch; the checkpoint's offset
  *    log replays exactly the same version window after a restart, so
  *    the feed is exactly-once end-to-end with any idempotent/
  *    transactional sink (the same replay guarantee every file-backed
  *    source gives).
  *  - BATCHES READ ONLY WHAT THE VERSIONS ADDED.
  *    [[graft.operators.Layout.appendsBetween]] opens just the
  *    generation dirs the window's publishes appended — O(|new rows|)
  *    per batch however large the table, the only viable shape for a
  *    standing consumer of a 100 TB table. Its append-only contract is
  *    checked structurally per version from the manifest's own
  *    provenance: delete-bearing deltas and copy-on-write rewrites
  *    fail the query loudly (consume [[graft.operators.Layout
  *    .manifestChanges]] batchwise for full CDC); folds/compactions
  *    pass silently because they are row-identical re-layouts.
  *  - RETENTION INTEGRATES. With `.option("consumer", name)` the
  *    source acks the table's durable `_FEED.name` cursor as batches
  *    COMMIT, so [[graft.operators.Layout.reapManifest]] refuses any
  *    retention floor that would strand this stream. Without it, size
  *    `keepVersions` to the stream's maximum lag.
  *
  * Options: `path` (required); `mode` — `"appends"` (default: the
  * O(|new rows|) append-only contract above) or `"changes"` (full
  * CDC: each batch is the NET `_change_type` insert/delete rows
  * between its endpoint snapshots via [[graft.operators.Layout
  * .manifestChanges]] — rewrites, updates and deletes are first-class,
  * at snapshot-diff cost bounded by the changed partitions; a window
  * anchored at `earliest` ships the snapshot as inserts first);
  * `startingVersion` — an integer version, `"earliest"` (= 0), or
  * absent (= the live version when the query starts);
  * `consumer` — ack a feed cursor on batch commit;
  * `maxVersionsPerTrigger` — cap each micro-batch's version window so
  * a backfill over a long history replays as bounded batches (each
  * its own checkpoint entry) instead of one giant batch;
  * `snapshotChunkPartitions` — (mode=changes, anchored at `earliest`)
  * page the INITIAL SNAPSHOT itself as bounded per-partition chunks,
  * each its own checkpointed batch, a restart resuming at the first
  * unfinished chunk — without it the snapshot ships as one batch.
  *
  * Two deliberate asymmetries, both on the safe side:
  *  - absent `startingVersion` anchors at the live version when the
  *    query is FIRST created, and the anchor persists under the
  *    query's checkpoint metadata (the Kafka-source discipline) — so
  *    restarts never re-anchor, and recovery replays of the first
  *    batch see the original window;
  *  - the `consumer` cursor ack trails by up to one batch: the engine
  *    commits a source offset only after the SINK's commit log records
  *    the batch, so a crash-replay always still finds its versions
  *    retained. The cursor is never ahead of what durably drained.
  */
final class ManifestFeedSource(sqlContext: SQLContext, path: String,
                               startingVersion: Int,
                               consumer: Option[String],
                               maxVersionsPerTrigger: Option[Int] = None,
                               mode: String = "appends",
                               snapshotChunkPartitions: Option[Int] = None)
    extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  maxVersionsPerTrigger.foreach(n => require(n > 0,
    s"maxVersionsPerTrigger must be positive (got $n)"))
  snapshotChunkPartitions.foreach(n => require(n > 0,
    s"snapshotChunkPartitions must be positive (got $n)"))
  require(mode == "appends" || mode == "changes",
    s"manifest-feed mode must be 'appends' (append-only contract, " +
      s"O(|new rows|) per batch) or 'changes' (full CDC: net " +
      s"_change_type insert/delete rows via snapshot diffs); got '$mode'")
  require(snapshotChunkPartitions.isEmpty || mode == "changes",
    "snapshotChunkPartitions paces the mode=changes INITIAL SNAPSHOT; " +
      "appends mode paces via maxVersionsPerTrigger")

  private val spark = sqlContext.sparkSession

  // ---- Chunked initial snapshot (mode=changes, anchored at earliest) -
  //
  // A CDC stream anchored at version 0 must first ship the END snapshot
  // as inserts. Unchunked, that is ONE micro-batch — at 100 TB an
  // unbounded unit of work a mid-flight failure redoes wholesale. With
  // `snapshotChunkPartitions = n`, the snapshot's partitions split into
  // ceil(|rels| / n) CHUNKS, each its own checkpointed micro-batch
  // (Flink-CDC's snapshot-chunking shape): a restart resumes at the
  // first unfinished chunk. The offset log encodes the phase —
  //   plain "V"                : snapshot complete through version V
  //   {"v":V,"c":C,"of":K}     : snapshot of version V, C of K chunks
  //                              delivered
  // — and the chunk plan re-derives deterministically from V's manifest
  // (sorted rel list, K fixed in the offset), so a restart with a
  // CHANGED chunk-size option still replays the original boundaries.
  // Diffs only start once the snapshot completes; the snapshot version
  // must stay retained until then (ack/retention note below).
  private case class FeedOffset(version: Int, chunk: Int, chunks: Int) {
    def midSnapshot: Boolean = chunks > 0 && chunk < chunks
    def toOffset: Offset =
      if (chunks > 0 && chunk < chunks)
        SerializedOffset(s"""{"v":$version,"c":$chunk,"of":$chunks}""")
      else LongOffset(version.toLong)
  }

  private def parseOffset(json: String): FeedOffset = {
    val t = json.trim
    if (t.startsWith("{")) {
      val node = ManifestFeedSource.json.readTree(t)
      FeedOffset(node.get("v").asInt(), node.get("c").asInt(),
        node.get("of").asInt())
    } else FeedOffset(t.toInt, -1, -1)
  }

  private def parseOffset(o: Offset): FeedOffset = o match {
    case l: LongOffset => FeedOffset(l.offset.toInt, -1, -1)
    case other => parseOffset(other.json)
  }

  /** The snapshot version `v`'s partitions in chunk order — stable
    * across restarts (the manifest is immutable per version). */
  private def snapshotRels(v: Int): Seq[String] =
    Layout.readManifestMeta(spark, path, v).allRels

  private def chunkOf(rels: Seq[String], chunk: Int, chunks: Int):
      Seq[String] = {
    val size = math.max(1, (rels.size + chunks - 1) / chunks)
    rels.slice(chunk * size, (chunk + 1) * size)
  }

  override val schema: StructType = {
    val base = ManifestFeedSource.liveSchema(spark, path)
    if (mode == "changes") ManifestFeedSource.withChangeType(base)
    else base
  }

  private def liveVersion: Int =
    Layout.manifestVersion(spark, path).getOrElse(
      throw new IllegalStateException(
        s"$path stopped being a manifest table mid-stream"))

  override def getOffset: Option[Offset] = {
    val live = liveVersion
    if (live > startingVersion) Some(LongOffset(live.toLong)) else None
  }

  // --- admission control (the FileStreamSource pattern): the engine
  // drives batch boundaries through latestOffset, and AvailableNow
  // pins the drain target at prepare time — versions published while
  // the drain runs wait for the next trigger, exactly the wrapper
  // semantics Spark applies to its own file source.
  @volatile private var availableNowTarget: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(liveVersion)

  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset = {
    val target = availableNowTarget.getOrElse(liveVersion)
      .max(startingVersion)
    // admission control: cap each micro-batch's version window so a
    // backfill from `earliest` on a long-history table replays as
    // bounded batches (each its own checkpoint entry and sink commit)
    // instead of one giant batch a mid-flight failure would redo
    // wholesale. AvailableNow still drains to the prepared target —
    // just across several batches.
    val s = Option(start) match {
      case Some(l: LongOffset) => FeedOffset(l.offset.toInt, -1, -1)
      case Some(other) => parseOffset(other.json)
      case None => FeedOffset(startingVersion, -1, -1)
    }
    // chunked initial snapshot: while the earliest-anchored changes
    // stream has not finished its snapshot, each trigger advances ONE
    // chunk (its own checkpointed batch); versions only pace after
    val chunking = snapshotChunkPartitions.filter(_ =>
      mode == "changes" && (s.midSnapshot ||
        (s.version == 0 && s.chunks < 0)))
    chunking match {
      case Some(n) if s.midSnapshot =>
        // resume the in-flight snapshot: its version and chunk count
        // are pinned in the offset — the option may have changed,
        // the boundaries must not
        FeedOffset(s.version, s.chunk + 1, s.chunks).toOffset
      case Some(n) if target > 0 =>
        // begin the snapshot of the drain target
        val k = math.max(1,
          (snapshotRels(target).size + n - 1) / n)
        FeedOffset(target, 1, k).toOffset
      case _ =>
        val capped = maxVersionsPerTrigger
          .fold(target)(mv => target.min(s.version + mv))
        LongOffset(capped.max(s.version).toLong)
    }
  }

  override def reportLatestOffset():
      org.apache.spark.sql.connector.read.streaming.Offset =
    LongOffset(liveVersion.toLong)

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val s = start.map(parseOffset)
      .getOrElse(FeedOffset(startingVersion, -1, -1))
    val e = parseOffset(end)
    val from = s.version
    val to = e.version
    // a snapshot-chunk window: either endpoint mid-snapshot means this
    // batch ships a slice of version `to`'s partitions as inserts —
    // start plain 0 = from chunk 0, end plain = through the last chunk
    val chunkWindow = s.midSnapshot || e.midSnapshot
    // an empty replay window (recovery re-issuing the anchor batch)
    // builds its zero-row frame from the PINNED schema in BOTH modes —
    // no meta read, no existence checks, and retention having reaped
    // the anchor version cannot fail it
    val raw =
      if (!chunkWindow && from >= to)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else if (mode == "changes") {
        if (chunkWindow) {
          // chunked initial snapshot: the chunk plan re-derives from
          // the PINNED snapshot version and chunk count (both in the
          // offset), so a restart — even with a changed chunk-size
          // option — replays exactly the original boundaries
          val k = if (e.midSnapshot) e.chunks else s.chunks
          val c1 = if (s.midSnapshot) s.chunk else 0
          val c2 = if (e.midSnapshot) e.chunk else k
          val rels = snapshotRels(to)
          val slice = (c1 until c2).flatMap(chunkOf(rels, _, k))
          Layout.readManifestRelsOf(spark, path, to, slice)
            .withColumn("_change_type", lit("insert"))
        }
        // full CDC: net insert/delete rows between the window's
        // endpoint snapshots — rewrites and deletes are first-class
        // here (the appends contract does not apply). A window
        // anchored at 0 ships the end snapshot as inserts
        // (snapshot-then-follow; with snapshotChunkPartitions it pages
        // through the chunk windows above instead).
        else if (from == 0)
          Layout.readManifestVersion(spark, path, to)
            .withColumn("_change_type", lit("insert"))
        else Layout.manifestChanges(spark, path, from, to)
      } else Layout.appendsBetween(spark, path, from, to)
    // align every window to the source's declared schema (pinned at
    // query start): columns a mid-stream evolution added stay out
    // until the query restarts, and — after a restart with an EVOLVED
    // schema — a replayed pre-evolution window null-fills the new
    // columns (the engine re-issues the last committed window's
    // getBatch on recovery, so this path always runs across an
    // evolution boundary)
    val batch = raw.select(schema.fields.toSeq.map(f =>
      (if (raw.columns.contains(f.name)) col(f.name)
       else lit(null).cast(f.dataType)).as(f.name)): _*)
    org.apache.spark.sql.graftshim.StreamingShim.streamingFrame(
      spark, batch.queryExecution.toRdd, schema)
  }

  /** Batch committed: advance the durable feed cursor (idempotent; a
    * crash before this ack replays the increment — at-least-once into
    * the cursor, exactly-once through the checkpoint's offset log).
    * Mid-snapshot chunk commits must NOT ack the snapshot version (the
    * rest of the backfill still needs it retained) — instead the
    * retention floor pins until the snapshot completes, so a
    * concurrent reap refuses to strand the remaining chunks (the
    * strand-guard fires on any cursor below its floor): a NEW consumer
    * pins through its own cursor at version 0; an EXISTING consumer
    * (re-anchored at earliest on a fresh checkpoint, its old cursor
    * high) cannot move its cursor backwards — it pins through a
    * SIBLING `<name>.__snapshot` cursor at the pinned snapshot
    * version, deleted once the snapshot completes. Without the sibling
    * pin a reap could drop the pinned version mid-backfill, and — the
    * offset log pinning that version — every restart would re-read the
    * reaped version and wedge the stream until the checkpoint is
    * discarded. */
  @volatile private var snapshotPinMaybePresent = true

  override def commit(end: Offset): Unit = {
    val e = parseOffset(end)
    consumer.foreach { c =>
      if (!e.midSnapshot) {
        // the snapshot completed (or this stream never chunked): drop
        // the sibling pin if one exists — including one left by a
        // crashed prior run — then ack normally
        if (snapshotPinMaybePresent) {
          Layout.deleteFeedCursor(spark, path, s"$c.__snapshot")
          snapshotPinMaybePresent = false
        }
        // monotone ack: a re-anchored consumer whose OLD deployment
        // acked past this query's window (the sibling-pin scenario)
        // keeps its high cursor — writeFeedCursor would rightly refuse
        // the backwards move, which must not fail the stream
        if (!Layout.readFeedCursor(spark, path, c).exists(_ > e.version))
          Layout.writeFeedCursor(spark, path, c, e.version)
      }
      else if (Layout.readFeedCursor(spark, path, c).isEmpty)
        Layout.writeFeedCursor(spark, path, c, 0)
      else {
        Layout.writeFeedCursor(spark, path, s"$c.__snapshot", e.version)
        snapshotPinMaybePresent = true
      }
    }
  }

  override def stop(): Unit = ()

  override def toString: String = s"ManifestFeedSource[$path]"
}

object ManifestFeedSource {
  private[streaming] val json =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private[streaming] def liveSchema(
      spark: org.apache.spark.sql.SparkSession, path: String): StructType = {
    val v = Layout.manifestVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"$path is not a manifest table; seed it with writeManifestTable"))
    Layout.manifestSchema(Layout.readManifestMeta(spark, path, v))
  }

  /** The `mode=changes` schema: the table's columns plus the
    * `_change_type` tag — ONE definition, shared by the provider's
    * sourceSchema and the source's own schema so they cannot drift. */
  private[streaming] def withChangeType(base: StructType): StructType =
    StructType(base.fields :+ org.apache.spark.sql.types.StructField(
      "_change_type", org.apache.spark.sql.types.StringType))
}

/** Registration seam for the `manifest-feed` source (wired through
  * `META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`,
  * so `.format("manifest-feed")` resolves with no class name). */
final class ManifestFeedProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "manifest-feed"

  private def opt(parameters: Map[String, String], key: String):
      Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v }

  private def pathOf(parameters: Map[String, String]): String =
    opt(parameters, "path").getOrElse(throw new IllegalArgumentException(
      "manifest-feed needs .option(\"path\", <manifest table dir>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]):
      (String, StructType) = {
    val base = ManifestFeedSource.liveSchema(sqlContext.sparkSession,
      pathOf(parameters))
    val served =
      if (opt(parameters, "mode").contains("changes"))
        ManifestFeedSource.withChangeType(base)
      else base
    // the feed is self-describing — the manifest stores the table
    // schema. A CALLER-provided schema is accepted only when it is a
    // (possibly reordered) match of the live one: that is what
    // `readStream.table(name)` relays from the catalog registration
    // (whose column order is data-cols-then-partition-cols, not the
    // stored order), and what a post-registration evolution makes
    // stale — refuse the drift loudly instead of serving rows under
    // the wrong shape. Explicit .schema() calls that do not match get
    // the same refusal with the drop-it remedy.
    schema.foreach { given =>
      val g = given.fields.map(f => (f.name, f.dataType)).toSet
      val l = served.fields.map(f => (f.name, f.dataType)).toSet
      // in changes mode the catalog (readStream.table) relays the BASE
      // table schema — the synthetic _change_type column is the feed's
      // own addition, so a base match is as valid as a served match
      val b = base.fields.map(f => (f.name, f.dataType)).toSet
      require(g == l || g == b,
        "manifest-feed is self-describing (the manifest stores the " +
          "table schema) and the provided schema does not match the " +
          s"live one — table evolved after the catalog registration? " +
          "REFRESH TABLE / re-CREATE TABLE; or drop the .schema(...) " +
          s"call (got ${given.toDDL}; live ${served.toDDL})")
    }
    (shortName(), served)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val path = pathOf(parameters)
    // the anchor version PERSISTS under the query's own metadata dir
    // (the Kafka-source discipline): a restarted query re-creates the
    // source, and re-deriving "live version now" would both re-anchor
    // an idle stream and hand recovery replays of batch 0 a `from`
    // NEWER than their checkpointed end. First creation computes and
    // writes it; every restart reads it back.
    val spark = sqlContext.sparkSession
    val hc = spark.sparkContext.hadoopConfiguration
    val anchor = new org.apache.hadoop.fs.Path(metadataPath, "anchor")
    val fs = anchor.getFileSystem(hc)
    val starting =
      if (fs.exists(anchor)) {
        val in = fs.open(anchor)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toInt
        finally in.close()
      } else {
        val v = opt(parameters, "startingVersion") match {
          case Some("earliest") => 0
          case Some(s) =>
            require(s.forall(_.isDigit),
              s"startingVersion must be an integer version or " +
                s"'earliest' (got '$s')")
            s.toInt
          case None => Layout.manifestVersion(spark, path)
            .getOrElse(throw new IllegalArgumentException(
              s"$path is not a manifest table; seed it with " +
                "writeManifestTable"))
        }
        // tmp + rename: a crash mid-write must leave NO anchor file
        // (next start recomputes), never a truncated one a restart
        // would misparse (the HDFSMetadataLog discipline)
        val tmp = new org.apache.hadoop.fs.Path(metadataPath,
          "anchor.tmp")
        val out = fs.create(tmp, true)
        try out.write(v.toString.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        require(fs.rename(tmp, anchor) || fs.exists(anchor),
          s"could not publish the feed anchor at $anchor")
        v
      }
    new ManifestFeedSource(sqlContext, path, starting,
      opt(parameters, "consumer"),
      opt(parameters, "maxVersionsPerTrigger").map(_.toInt),
      opt(parameters, "mode").getOrElse("appends"),
      opt(parameters, "snapshotChunkPartitions").map(_.toInt))
  }
}
