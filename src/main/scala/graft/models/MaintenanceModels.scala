package graft.models

import graft.core._
import graft.operators.Layout

/** Table-maintenance actions as PIPELINE NODES: the [[Layout]]
  * operators (latest-wins merge / CDC apply, compaction — rename-swap,
  * generational, or manifest discipline) exposed through the
  * reference's one-shot action role (`Executable`, models.py:392-422)
  * so the config-driven DSL (`PipelineConfig`, pydin core.py:1418-1504)
  * and therefore any SCHEDULED job can run table maintenance
  * declaratively — compact nightly, apply a staged CDC batch on a
  * calendar window — instead of as hand-written library calls.
  */

/** Latest-wins keyed upsert / CDC apply of a staged parquet batch at
  * `updatesPath` onto the keyed table at `path` (the MERGE INTO node).
  * `manifest = true` targets a manifest table
  * ([[Layout.mergeManifest]] — partition-granular snapshot publish,
  * the continuous-readers mode); `strategy = "mor"` (manifest only)
  * appends the batch as pending merge-on-read delta generations
  * ([[Layout.mergeManifestDelta]] — O(|batch|), the base is never
  * read; schedule a [[FoldDeltasModel]] to fold); otherwise
  * [[Layout.merge]] (rename-swap, maintenance-window semantics),
  * partition-pruned when `partitionCols` is set. Returns the applied
  * batch's row count.
  */
final case class MergeModel(
    path: String,
    updatesPath: String,
    keys: Seq[String],
    versionCol: String,
    partitionCols: Seq[String] = Nil,
    deleteCol: Option[String] = None,
    manifest: Boolean = false,
    strategy: String = "cow",
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  require(strategy == "cow" || strategy == "mor",
    s"Merge strategy must be 'cow' or 'mor', got '$strategy'")
  require(strategy == "cow" || manifest,
    "strategy = 'mor' needs manifest = true (merge-on-read deltas are " +
      "a manifest-table discipline)")

  def execute(ctx: StepContext): ExecResult = {
    val updates = ctx.spark.read.parquet(ctx.render(updatesPath))
    val target = ctx.render(path)
    if (manifest && strategy == "mor")
      Layout.mergeManifestDelta(ctx.spark, target, updates, keys,
        versionCol, deleteCol = deleteCol)
    else if (manifest)
      Layout.mergeManifest(ctx.spark, target, updates, keys, versionCol,
        deleteCol = deleteCol)
    else
      Layout.merge(ctx.spark, target, updates, keys, versionCol,
        partitionCols, deleteCol = deleteCol)
    ExecResult(resultValue = Some(updates.count()))
  }
}

/** Fold pending merge-on-read deltas back into single base generations
  * (the OPTIMIZE half of the delta-merge discipline,
  * [[Layout.foldManifestDeltas]]): a scheduled fold bounds the read
  * tax that accumulating deltas impose. Safely re-runnable — with no
  * pending deltas it is a no-op. Returns the folded partition count.
  */
final case class FoldDeltasModel(
    path: String,
    sortCols: Seq[String] = Nil,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  def execute(ctx: StepContext): ExecResult =
    ExecResult(resultValue = Some(Layout.foldManifestDeltas(ctx.spark,
      ctx.render(path), sortCols).length.toLong))
}

/** Snapshot source over a MANIFEST table (the read half of the
  * maintenance DSL): extract resolves the live manifest — or a pinned
  * `version` for time travel — once, so the pipeline's whole run sees
  * one consistent snapshot even while a CDC stream publishes new ones.
  *
  * Data-skipping: `ranges` (col, lo, hi) triples route through
  * [[Layout.readManifestPruned]] — only partition generations whose
  * stored [min, max] intersects EVERY window are scanned; `eqs`
  * (col, value) pairs route through [[Layout.readManifestEq]]'s bloom
  * point-lookup. Bounds/values are config STRINGS: both paths Cast
  * them to the column's stored type in-plan (the same Cast the
  * residual filter uses), so "1996-03-01" against a date column means
  * the date, not a string compare. The two prune on different stats
  * (range mins/maxes vs blooms) and serve the LIVE snapshot only —
  * at most one may be set, and neither composes with a pinned
  * `version` (read the pinned snapshot and filter in-plan instead).
  */
final case class ManifestModel(
    path: String,
    version: Option[Int] = None,
    ranges: Seq[(String, String, String)] = Nil,
    eqs: Seq[(String, String)] = Nil,
    planner: Boolean = false,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Extractable {

  require(ranges.isEmpty || eqs.isEmpty,
    "ranges (min/max stats pruning) and eqs (bloom point lookup) are " +
      "separate skipping reads; set at most one")
  require(version.isEmpty || (ranges.isEmpty && eqs.isEmpty),
    "data-skipping reads serve the LIVE snapshot; a pinned version " +
      "cannot compose with ranges/eqs — read the version and filter")
  require(!planner || (ranges.isEmpty && eqs.isEmpty),
    "planner = true prunes from the pipeline's OWN pushed-down " +
      "filters (Layout.manifestTable); explicit ranges/eqs are the " +
      "non-planner knobs — drop them")

  protected def read(ctx: StepContext): org.apache.spark.sql.DataFrame = {
    val target = ctx.render(path)
    if (planner) Layout.manifestTable(ctx.spark, target, version)
    else version match {
      case Some(v) => Layout.readManifestVersion(ctx.spark, target, v)
      case None =>
        if (ranges.nonEmpty)
          Layout.readManifestPruned(ctx.spark, target,
            ranges.map { case (c, lo, hi) =>
              (c, ctx.render(lo): Any, ctx.render(hi): Any)
            })
        else if (eqs.nonEmpty)
          Layout.readManifestEq(ctx.spark, target,
            eqs.map { case (c, v) => (c, ctx.render(v): Any) })
        else Layout.readManifest(ctx.spark, target)
    }
  }
}

/** Incremental change-feed source over a MANIFEST table
  * ([[Layout.feedSince]]): each scheduled run extracts exactly the
  * increment this `consumer` has not yet acknowledged — the full
  * snapshot as inserts on the first run, the net `_change_type`
  * insert/delete rows since the acked version after that, an empty
  * frame when caught up. The cursor advances in `release`, which the
  * pipeline invokes only AFTER the downstream load succeeded — a
  * failed run replays the same increment on the next tick
  * (at-least-once; pair with an idempotent sink such as a Merge or
  * IvmApply node for exactly-once effect). This is the manifest-table
  * analogue of the reference's high-water-mark incremental extract
  * (models.py:136-144): the HWM is the manifest version, probed and
  * advanced here instead of `max(value_field)` on the sink.
  */
final case class ManifestFeedModel(
    path: String,
    consumer: String,
    mode: String = "changes",
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Extractable {

  require(mode == "changes" || mode == "appends",
    s"ManifestFeed mode must be 'changes' (full CDC, _change_type " +
      s"rows via exceptAll diffs) or 'appends' (append-only contract, " +
      s"O(|new rows|) via Layout.appendsBetween); got '$mode'")

  @transient private var pendingAck: Option[(String, Int)] = None

  protected def read(ctx: StepContext): org.apache.spark.sql.DataFrame = {
    val target = ctx.render(path)
    if (mode == "appends") {
      // the cheap path for append-only tables: reads ONLY the
      // generation dirs published since the acked cursor (no snapshot
      // diffing), failing loudly on rewrites — the same contract the
      // manifest-feed streaming source enforces
      val live = Layout.manifestVersion(ctx.spark, target).getOrElse(
        throw new IllegalArgumentException(
          s"$target is not a manifest table"))
      Layout.readFeedCursor(ctx.spark, target, consumer) match {
        case Some(from) =>
          // appendsBetween validates the window's provenance eagerly —
          // stage the ack only once it accepted the window
          val df = Layout.appendsBetween(ctx.spark, target, from, live)
          pendingAck = Some((target, live))
          df
        case None =>
          // a NEW consumer starts from the live snapshot (feedSince's
          // first-pull semantics) — anchoring at version 0 would walk
          // every historical version's metadata and permanently fail
          // on any table whose early versions were already reaped.
          // Pin the read to the CAPTURED version: readManifest would
          // re-resolve the live pointer, and a publish racing between
          // the two reads would make the emitted snapshot newer than
          // the staged ack — the next run would re-emit those rows as
          // duplicates into an append-only sink.
          val df = Layout.readManifestVersion(ctx.spark, target, live)
          pendingAck = Some((target, live))
          df
      }
    } else {
      val (df, ack) = Layout.feedSince(ctx.spark, target, consumer)
      pendingAck = Some((target, ack))
      df
    }
  }

  override def release(ctx: StepContext): Unit = {
    pendingAck.foreach { case (target, v) =>
      Layout.writeFeedCursor(ctx.spark, target, consumer, v)
    }
    pendingAck = None
  }
}

/** Small-file compaction of the parquet table at `path` (the OPTIMIZE
  * node): [[Layout.compactManifest]] when `manifest = true` (partition-
  * granular snapshot publish; `maxFiles` is its selection threshold,
  * returns compacted-partition count), [[Layout.compactGen]] under the
  * generational `_CURRENT` discipline when `generational = true` (no
  * reader window), plain rename-swap [[Layout.compact]] otherwise
  * (both return the file-count reduction).
  */
final case class CompactModel(
    path: String,
    partitionCols: Seq[String] = Nil,
    generational: Boolean = false,
    manifest: Boolean = false,
    maxFiles: Int = 4,
    sortCols: Seq[String] = Nil,
    zorderCols: Seq[String] = Nil,
    zorderBits: Int = 8,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  require((sortCols.isEmpty && zorderCols.isEmpty) || manifest,
    "sortCols/zorderCols are manifest compaction knobs; plain/" +
      "generational compaction keeps arrival order (use SortedWrite/" +
      "Zorder nodes for whole-table re-clustering)")

  def execute(ctx: StepContext): ExecResult = {
    val target = ctx.render(path)
    if (manifest)
      ExecResult(resultValue = Some(Layout.compactManifest(ctx.spark,
        target, maxFiles, sortCols, zorderCols,
        zorderBits).length.toLong))
    else {
      val (before, after) =
        if (generational) Layout.compactGen(ctx.spark, target, partitionCols)
        else Layout.compact(ctx.spark, target, partitionCols)
      ExecResult(resultValue = Some(before - after))
    }
  }
}

/** Partition-spec change for a manifest table (the scheduled
  * re-partitioning rewrite): [[Layout.repartitionManifest]] — the
  * whole table rewrites under `partitionCols` behind one snapshot
  * publish, pending merge-on-read deltas folded in, old versions still
  * time-traveling under the old layout until retention drops them.
  * `newBucketCols`/`newBuckets` (both or neither) change the table's
  * DATA-bucket layout in the same rewrite — the scheduled way to
  * bucket / re-bucket / un-bucket an existing table in place.
  * Returns the new partition count. */
final case class RepartitionModel(
    path: String,
    partitionCols: Seq[String],
    sortCols: Seq[String] = Nil,
    newBucketCols: Option[Seq[String]] = None,
    newBuckets: Option[Int] = None,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  def execute(ctx: StepContext): ExecResult =
    ExecResult(resultValue = Some(Layout.repartitionManifest(ctx.spark,
      ctx.render(path), partitionCols, sortCols,
      newBucketCols, newBuckets).toLong))
}

/** Self-driving materialized-view refresh (the scheduled
  * [[graft.operators.Ivm.syncFromManifest]] node): catch the summary
  * at `path` up to the manifest table at `tablePath` — seeds on first
  * run, folds only the change feed when behind, no-ops when current.
  * Blindly re-runnable on any schedule. Returns 1 when the summary
  * advanced, 0 when it was already current.
  */
final case class IvmSyncModel(
    path: String,
    tablePath: String,
    keys: Seq[String],
    sumCols: Seq[String],
    kmvCols: Seq[String] = Nil,
    kllCols: Seq[String] = Nil,
    sketchK: Int = 4096,
    consumer: Option[String] = None,
    appendOnly: Boolean = false,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  def execute(ctx: StepContext): ExecResult =
    ExecResult(resultValue = Some(
      if (graft.operators.Ivm.syncFromManifest(ctx.spark,
        ctx.render(path), ctx.render(tablePath), keys, sumCols,
        kmvCols = kmvCols, kllCols = kllCols, sketchK = sketchK,
        consumer = consumer, appendOnly = appendOnly)) 1L
      else 0L))
}

/** Scheduled retention sweep (the VACUUM node): delete manifest
  * generations/versions beyond the newest `keepVersions`
  * ([[Layout.reapManifest]]) or, with `generational = true`,
  * superseded `_CURRENT` generations ([[Layout.reapGenerations]]).
  * Schedule it AFTER the longest reader/feed-consumer lag the table
  * serves — the library cannot know when the last pinned snapshot
  * drains. Returns the deleted entry count.
  */
final case class ReapModel(
    path: String,
    keepVersions: Int = 1,
    generational: Boolean = false,
    ignoreConsumers: Set[String] = Set.empty,
    // additionally retain every version needed to time-travel within
    // the last keepAgeMs (the Delta VACUUM retention posture; 0 =
    // version-count only) — count and age compose as the union
    keepAgeMs: Long = 0L,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  def execute(ctx: StepContext): ExecResult = {
    val target = ctx.render(path)
    val n =
      if (generational) Layout.reapGenerations(ctx.spark, target).length
      else Layout.reapManifest(ctx.spark, target, keepVersions,
        ignoreConsumers, keepAgeMs).length
    ExecResult(resultValue = Some(n.toLong))
  }
}

/** Scheduled Z-order re-cluster of a parquet table (the
  * `OPTIMIZE ... ZORDER BY` node): rewrite the table at `path`
  * clustered on 2-4 `zCols` via [[Layout.clusterRewrite]] —
  * count-verified before the rename-aside swap, single-writer leased,
  * row-identical. A nightly job keeps multi-dimension scan locality
  * (and therefore parquet row-group skipping on EVERY z column)
  * current as CDC appends decluster the layout. Returns the verified
  * row count.
  */
final case class ZorderModel(
    path: String,
    zCols: Seq[String],
    bits: Int = 8,
    numFiles: Int = 0,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  def execute(ctx: StepContext): ExecResult =
    ExecResult(resultValue = Some(Layout.clusterRewrite(ctx.spark,
      ctx.render(path), zCols, zorder = true, bits = bits,
      numFiles = numFiles)))
}

/** Scheduled linear re-cluster (the single-dimension OPTIMIZE node):
  * rewrite the table at `path` range-clustered + sorted on `sortCols`
  * via [[Layout.clusterRewrite]] — disjoint per-file key ranges and
  * tight row-group min/max on the leading sort key. Returns the
  * verified row count.
  */
final case class SortedWriteModel(
    path: String,
    sortCols: Seq[String],
    numFiles: Int = 0,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  def execute(ctx: StepContext): ExecResult =
    ExecResult(resultValue = Some(Layout.clusterRewrite(ctx.spark,
      ctx.render(path), sortCols, zorder = false, numFiles = numFiles)))
}

/** Incremental-aggregate fold (the REFRESH MATERIALIZED VIEW ...
  * INCREMENTALLY node): fold the staged delta batch at `deltaPath`
  * into the [[graft.operators.Ivm]] summary at `path`. `batchId`
  * (calendar-rendered, so a scheduled job can pass its window tag)
  * rides into the exactly-once marker: re-running the same job window
  * is a no-op, which makes the node safely re-runnable — the
  * scheduler's rerun daemon can retry it blindly. Returns 1 when the
  * batch applied, 0 when the replay guard skipped it.
  */
final case class IvmApplyModel(
    path: String,
    deltaPath: String,
    keys: Seq[String],
    sumCols: Seq[String],
    batchId: Option[String] = None,
    weightCol: Option[String] = None,
    kmvCols: Seq[String] = Nil,
    kllCols: Seq[String] = Nil,
    sketchK: Int = 4096,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  def execute(ctx: StepContext): ExecResult = {
    val delta = ctx.spark.read.parquet(ctx.render(deltaPath))
    val applied = graft.operators.Ivm.applyDelta(ctx.spark,
      ctx.render(path), delta, keys, sumCols,
      batchId = batchId.map(b => ctx.render(b).toLong).getOrElse(-1L),
      weightCol = weightCol, kmvCols = kmvCols, kllCols = kllCols,
      sketchK = sketchK)
    ExecResult(resultValue = Some(if (applied) 1L else 0L))
  }
}

/** SELF-DRIVING maintenance policy (the `Maintain` node): one
  * scheduled run inspects the live manifest and chooses — with
  * data-derived thresholds, not caller-chosen cadences — exactly the
  * work the table needs:
  *
  *  - FOLD the partitions whose pending merge-on-read delta depth
  *    reached `maxPendingDeltas` (others keep accruing — a fold per
  *    trickle batch would pay the rewrite without bounding anything);
  *  - COMPACT when `maxFilesPerPartition` > 0 (the file-count
  *    selection is [[Layout.compactManifest]]'s own, partition by
  *    partition; `sortCols`/`zorderCols` make the rewrite re-cluster);
  *  - REAP versions below a `keepVersions` > 0 retention window (with
  *    the cursor strand-guard consent every reap has).
  *
  * The decisions land in the step ledger (`resultLong` — e.g.
  * `fold=part=a,part=c;compact=2;reap=5`), so an operator can read
  * back WHY maintenance ran from `pd_step_history`. A run that decides
  * nothing is a cheap no-op: one manifest JSON read.
  */
final case class MaintainModel(
    path: String,
    maxPendingDeltas: Int = 3,
    maxFilesPerPartition: Int = 0,
    keepVersions: Int = 0,
    sortCols: Seq[String] = Nil,
    zorderCols: Seq[String] = Nil,
    ignoreConsumers: Set[String] = Set.empty,
    // age-based retention rider on the reap strand (0 = count only)
    keepAgeMs: Long = 0L,
    // retire RENAME/DROP alias debt (a deferred SQL rename —
    // `spark.graft.rename.deferRewrite` — or Scala-surface renames):
    // when the live manifest carries alias chains or haunted dropped
    // names, pay the full rewrite (fold + compact every partition) and
    // clear them, re-enabling the planner-index/bare-name SQL surface.
    // The rewrite is O(table) BY DESIGN — the whole point of deferral
    // is that maintenance pays it on the operator's schedule, not a
    // DDL statement's.
    clearAliases: Boolean = false,
    // BUDGETED spec-migration drain (0 = off): each run copy-on-write
    // rewrites up to N oldest-era partitions into the current partition
    // spec ([[Layout.migrateManifestPartitions]]) — the incremental
    // alternative to a one-shot repartitionManifest. At 100 TB the
    // all-or-nothing finisher is hours of rewrite in one commit; a
    // scheduled drain converges over k runs while reads and writes stay
    // fully serviced, and each run's decision lands in the step ledger.
    migratePartitions: Int = 0,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  require(maxPendingDeltas >= 1,
    "maxPendingDeltas must be >= 1 (the depth at which a fold pays)")

  def execute(ctx: StepContext): ExecResult = {
    val s = ctx.spark
    val target = ctx.render(path)
    val v = Layout.manifestVersion(s, target).getOrElse(
      throw new IllegalArgumentException(
        s"$target is not a manifest table; Maintain drives manifest " +
          "maintenance only"))
    val m = Layout.readManifestMeta(s, target, v)
    // fold exactly the partitions whose delta depth crossed the policy
    val deep = m.deltas.collect {
      case (rel, gens) if gens.size >= maxPendingDeltas => rel
    }.toSeq.sorted
    val folded =
      if (deep.isEmpty) Nil
      else Layout.foldManifestDeltas(s, target, sortCols, only = deep)
    // budgeted spec-migration drain: up to N oldest-era partitions per
    // run; a no-op once the table converged to a single spec
    val migrated =
      if (migratePartitions <= 0) Nil
      else Layout.migrateManifestPartitions(s, target, migratePartitions,
        sortCols)
    // alias retirement needs EVERY live file on the current names:
    // fold any remaining deltas, rewrite all partitions, verify+clear.
    // On a still-mixed-spec table compact cannot rewrite the frozen
    // old-era generations — refuse up front with the working remedy
    // instead of half-failing inside clearManifestAliases
    val wantAliases = clearAliases &&
      (m.colAliases.nonEmpty || m.droppedCols.nonEmpty)
    // one post-migration re-read serves the old-era and deltas checks
    val m2 =
      if (!wantAliases) m
      else Layout.readManifestMeta(s, target,
        Layout.manifestVersion(s, target).get)
    // clear_aliases on a still-mixed table: with a drain configured on
    // THIS Maintain (migrate_partitions > 0) the retirement simply
    // DEFERS until a later run converges — each run still publishes
    // its migrate decisions; throwing here would fail the scheduled
    // step N times and lose its ledger record. With NO drain
    // configured the setup cannot ever succeed, so that refuses loudly
    // with the remedy.
    val aliasDeferred = wantAliases && m2.oldEraRels.nonEmpty
    if (aliasDeferred)
      require(migratePartitions > 0,
        s"Maintain clear_aliases on $target: partition(s) still live " +
          s"under a prior partition spec " +
          s"(${m2.oldEraRels.take(3).mkString(", ")}" +
          s"${if (m2.oldEraRels.size > 3) ", …" else ""}) — finish the " +
          "spec migration first: set migrate_partitions=N on this " +
          "Maintain (budgeted drain) or run repartitionManifest, then " +
          "retry clear_aliases")
    val aliasDebt = wantAliases && !aliasDeferred
    if (aliasDebt) {
      if (m2.deltas.nonEmpty)
        Layout.foldManifestDeltas(s, target, sortCols)
      Layout.compactManifest(s, target, 0, sortCols, zorderCols)
      Layout.clearManifestAliases(s, target)
    }
    val compacted =
      if (maxFilesPerPartition <= 0 || aliasDebt) Nil
      else Layout.compactManifest(s, target, maxFilesPerPartition,
        sortCols, zorderCols)
    val reaped =
      if (keepVersions <= 0 && keepAgeMs <= 0L) Nil
      else Layout.reapManifest(s, target,
        if (keepVersions <= 0) 1 else keepVersions,
        ignoreConsumers, keepAgeMs)
    ExecResult(
      resultValue = Some((folded.size + migrated.size + compacted.size +
        reaped.size).toLong),
      resultLong = Some(
        s"fold=${folded.mkString(",")};compact=${compacted.size};" +
          s"reap=${reaped.size}" +
          (if (migratePartitions > 0)
            s";migrate=${migrated.mkString(",")}" else "") +
          (if (aliasDebt) ";aliases=cleared"
           else if (aliasDeferred) ";aliases=deferred(migration pending)"
           else "")))
  }
}
