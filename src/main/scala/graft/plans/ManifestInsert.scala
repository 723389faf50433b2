package graft.plans

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, Filter, InsertAction, InsertIntoStatement, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types.StructType

import graft.operators.Layout

/** The pure-SQL DML surface of manifest tables: rewrites
  * `INSERT INTO <view> SELECT …` over a `USING manifest` relation into
  * a keyed copy-on-write merge (or a merge-on-read delta append with
  * `mor 'true'`), BEFORE Spark's own DataSourceAnalysis would convert
  * it to a raw parquet write into the table root — which would corrupt
  * the manifest (part files outside any generation dir). The same seam
  * Delta Lake's DeltaAnalysis uses for its DML.
  *
  * {{{
  *   CREATE TEMPORARY VIEW orders_live
  *   USING manifest OPTIONS (path '/data/orders',
  *                           keys 'o_orderkey', versionCol 'o_ver');
  *   INSERT INTO orders_live SELECT * FROM staged_batch;
  * }}}
  *
  * Merge keys/version come from the view's OPTIONS, falling back to
  * the table's stored merge-on-read resolution spec; with neither the
  * statement fails loudly naming the fix. `UPDATE <view> SET … WHERE`
  * and `DELETE FROM <view> WHERE` rewrite the same way (Spark itself
  * refuses them on v1 relations): the matched rows of the LIVE
  * snapshot — expressions re-bound by name at run time, see
  * [[ManifestMutateCommand]] — re-project through the assignments and
  * merge (tombstone-flagged for DELETE). `MERGE INTO` — the production
  * CDC statement — rewrites to ONE net-outcome force-wins publish, see
  * [[ManifestMergeCommand]]. Registered via
  * [[graft.expressions.GraftExtensions]] (`injectResolutionRule`, so
  * it wins over the post-hoc HadoopFsRelation conversion).
  */
final class ManifestInsertRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => stripAlias(child)
    // UPDATE/DELETE targets keep the temp-view wrapper the analyzer
    // strips for INSERT targets
    case v: org.apache.spark.sql.catalyst.plans.logical.View =>
      stripAlias(v.child)
    case other => other
  }

  private def mergeActionResolved(a: MergeAction): Boolean = a match {
    case UpdateAction(c, as, _) => c.forall(_.resolved) &&
      as.forall(x => x.key.resolved && x.value.resolved)
    case InsertAction(c, as) => c.forall(_.resolved) &&
      as.forall(x => x.key.resolved && x.value.resolved)
    case DeleteAction(c) => c.forall(_.resolved)
    case UpdateStarAction(c) => c.forall(_.resolved)
    case InsertStarAction(c) => c.forall(_.resolved)
    case _ => false
  }

  /** A resolved DML target that is a manifest table: its path, mount
    * OPTIONS, schema/output, and the column set an UPDATE must not
    * assign (columns whose values place rows in partitions). */
  private final case class DmlTarget(
      path: String,
      options: Map[String, String],
      schema: StructType,
      output: Seq[Attribute],
      partitionCols: Seq[String])

  private def manifestTarget(table: LogicalPlan): Option[DmlTarget] =
    stripAlias(table) match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation
            if fs.location.isInstanceOf[ManifestFileIndex] =>
          val idx = fs.location.asInstanceOf[ManifestFileIndex]
          Some(DmlTarget(idx.table, fs.options,
            lr.schema.asInstanceOf[StructType], lr.output,
            idx.partitionSchema.fieldNames.toSeq))
        // a MIXED-SPEC table (metadata-only spec change, unmigrated
        // generations): the commands below read the LIVE table through
        // the per-era union and WRITE through mergeManifest, whose
        // copy-on-write path migrates touched old-era partitions to
        // the current spec — so SQL DML works and every statement
        // SHRINKS the spec debt. The UPDATE partition-assignment guard
        // covers every live spec's columns: a key's partition values
        // are immutable across eras (the standing merge contract).
        // Merge-on-read deltas overlapping unmigrated keys keep their
        // loud refusal inside mergeManifestDelta (per-partition
        // resolution cannot span eras).
        case mx: MixedSpecManifestRelation =>
          val spark = org.apache.spark.sql.SparkSession.active
          val v = Layout.manifestVersion(spark, mx.table).getOrElse(
            throw new IllegalStateException(
              s"${mx.table} stopped being a manifest table"))
          val m = Layout.readManifestMeta(spark, mx.table, v)
          Some(DmlTarget(mx.table, mx.options,
            lr.schema.asInstanceOf[StructType], lr.output,
            m.liveSpecs.flatten.distinct))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case i: InsertIntoStatement if i.query.resolved =>
        manifestTarget(i.table) match {
          case Some(t) =>
            require(!i.overwrite,
              "INSERT OVERWRITE a manifest table is not supported: " +
                "overwriting discards history that retained versions " +
                "still reference — re-seed with writeManifestTable or " +
                "apply deletes as a merge with a tombstone flag")
            require(i.partitionSpec.isEmpty,
              "static PARTITION clauses are not supported on manifest " +
                "tables: partition routing is derived from the rows " +
                "themselves (the merge contract)")
            ManifestInsertCommand(t.path, t.options,
              t.schema, i.query, i.userSpecifiedCols, i.byName)
          case None => i
        }

      // DELETE FROM <view> WHERE …  →  tombstone merge of the matched
      // rows. Spark's own check would otherwise refuse ("DELETE is
      // only supported with v2 tables"). The condition is captured as
      // an EXPRESSION and re-bound by name onto the LIVE snapshot at
      // run time — binding to the view's pinned snapshot would carry
      // stale row versions into the tombstones, and a row updated
      // since the view was mounted would survive its own DELETE.
      case d: DeleteFromTable if d.table.resolved &&
          d.condition.resolved =>
        manifestTarget(d.table) match {
          case Some(t) =>
            ManifestMutateCommand(t.path, t.options, t.schema,
              condition = Some(d.condition), assignments = Nil,
              verb = "DELETE")
          case None => d
        }

      // MERGE INTO <target> USING <source> ON … WHEN MATCHED [AND c]
      // THEN UPDATE/DELETE WHEN NOT MATCHED [AND c] THEN INSERT  →
      // the production CDC statement, as ONE net-outcome force-wins
      // copy-on-write publish (Spark supports MERGE only on v2
      // tables; its refusal lives in CheckAnalysis, after resolution,
      // which is exactly the window this rule runs in). Clause shapes
      // the keyed merge cannot express refuse with named remedies.
      case mg: MergeIntoTable if mg.targetTable.resolved &&
          mg.sourceTable.resolved && mg.mergeCondition.resolved &&
          (mg.matchedActions ++ mg.notMatchedActions ++
            mg.notMatchedBySourceActions).forall(mergeActionResolved) =>
        manifestTarget(mg.targetTable) match {
          case Some(t) =>
            require(!mg.withSchemaEvolution,
              "MERGE INTO a manifest table does not support WITH " +
                "SCHEMA EVOLUTION: evolve explicitly (evolveManifest/" +
                "widenManifestColumn) first")
            ManifestMergeCommand(t.path, t.options, t.schema,
              t.output, mg.sourceTable, mg.mergeCondition,
              mg.matchedActions, mg.notMatchedActions,
              mg.notMatchedBySourceActions)
          case None => mg
        }

      // UPDATE <view> SET c = expr, … WHERE …  →  merge of the LIVE
      // matched rows re-projected through the assignments (same
      // run-time re-binding as DELETE). Partition columns must not
      // move rows (the merge contract) and key assignments change row
      // identity — both refuse with the remedy.
      case u: UpdateTable if u.table.resolved &&
          u.assignments.forall(a => a.key.resolved && a.value.resolved) &&
          u.condition.forall(_.resolved) =>
        manifestTarget(u.table) match {
          case Some(t) =>
            def nameOf(e: org.apache.spark.sql.catalyst.expressions
                .Expression): Option[String] = e match {
              case ar: AttributeReference => Some(ar.name)
              case _ => None
            }
            val unnamed = u.assignments.filter(a => nameOf(a.key).isEmpty)
            require(unnamed.isEmpty,
              s"UPDATE SET targets must be top-level columns " +
                s"(got ${unnamed.map(_.key.sql).mkString(", ")})")
            val assigned = u.assignments.map(a =>
              nameOf(a.key).get -> a.value)
            val assignedParts = assigned.map(_._1)
              .filter(t.partitionCols.contains)
            require(assignedParts.isEmpty,
              s"UPDATE cannot assign partition column(s) " +
                s"${assignedParts.mkString(", ")}: moved rows would " +
                "change partitions, which the merge contract forbids — " +
                "DELETE + INSERT the rows instead")
            ManifestMutateCommand(t.path, t.options, t.schema,
              condition = u.condition, assignments = assigned,
              verb = "UPDATE")
          case None => u
        }
    }
}

/** Runs a rewritten UPDATE/DELETE: the matched rows of the LIVE
  * snapshot (condition/assignment expressions re-bound by COLUMN NAME
  * onto a freshly-mounted relation — read-current semantics, not the
  * view's pinned snapshot) re-project through the assignments and
  * apply as ONE keyed merge — tombstone-flagged for DELETE — through
  * the same machinery as every other write path: atomic snapshot
  * publish, optimistic commit, time travel intact. */
final case class ManifestMutateCommand(
    path: String,
    options: Map[String, String],
    tableSchema: StructType,
    condition: Option[org.apache.spark.sql.catalyst.expressions.Expression],
    assignments: Seq[(String,
      org.apache.spark.sql.catalyst.expressions.Expression)],
    verb: String) extends LeafRunnableCommand {

  private def opt(key: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  override def run(session: SparkSession): Seq[Row] = {
    val v = Layout.manifestVersion(session, path).getOrElse(
      throw new IllegalStateException(s"$path stopped being a manifest " +
        "table after the view was created"))
    val m = Layout.readManifestMeta(session, path, v)
    require(!m.appendOnly,
      s"$verb on $path: the table is DECLARED append-only — updates " +
        "and deletes are structurally inexpressible on it")
    val keys = opt("keys").map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq)
      .getOrElse(m.morKeys)
    val versionCol = opt("versionCol").orElse(m.morVersionCol)
    require(keys.nonEmpty && versionCol.nonEmpty,
      s"$verb on a manifest table needs its merge spec: add " +
        "OPTIONS (keys 'k1,k2', versionCol 'ver') to the view (or " +
        "establish the table's merge-on-read spec with a first " +
        "mergeManifestDelta)")
    require(opt("versionAsOf").isEmpty && opt("timestampAsOf").isEmpty,
      s"$verb through a time-travel (versionAsOf/timestampAsOf) view " +
        "is ambiguous: " +
        "the view serves a PINNED snapshot but a mutation would land on " +
        "the LIVE table — mount an un-pinned view for DML")
    val badKeys = assignments.map(_._1)
      .filter(c => keys.exists(_.equalsIgnoreCase(c)))
    require(badKeys.isEmpty,
      s"UPDATE cannot assign merge key(s) ${badKeys.mkString(", ")}: " +
        "that changes row identity — DELETE + INSERT instead")
    // LIVE snapshot, fresh mount: the mutation's row versions must be
    // the table's CURRENT ones, or the merge's latest-wins would let
    // rows updated since the view was created survive their own
    // DELETE / shed this UPDATE. manifestTable (not the provider
    // relation): on a MIXED-SPEC table it serves the native per-era
    // planner-index union — whole-stage codegen and exact per-era
    // pruning — where the provider's v1 fallback drops to .rdd
    val fresh = Layout.manifestTable(session, path)
    val outByName = fresh.queryExecution.analyzed.output
      .map(a => a.name -> a).toMap
    def rebind(e: org.apache.spark.sql.catalyst.expressions.Expression):
        org.apache.spark.sql.Column =
      org.apache.spark.sql.graftbridge.GraftSqlBridge.column(
        e.transform {
          case a: AttributeReference => outByName.getOrElse(a.name,
            throw new IllegalStateException(
              s"$verb references column '${a.name}' which the live " +
                "table no longer has (renamed since the view was " +
                "created?) — re-create the view"))
        })
    val matched = condition.fold(fresh)(c => fresh.filter(rebind(c)))
    val byName = assignments.toMap
    val projected = matched.select(tableSchema.fields.toSeq.map { f =>
      byName.get(f.name) match {
        case Some(e) => rebind(e).cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    } ++ (if (verb == "DELETE")
            Seq(org.apache.spark.sql.functions.lit(true).as("__sql_del"))
          else Nil): _*)
    Layout.mergeManifest(session, path, projected, keys, versionCol.get,
      deleteCol = if (verb == "DELETE") Some("__sql_del") else None)
    Seq.empty
  }
}

/** Runs the rewritten INSERT: aligns the query's output to the table
  * schema (by position, by the INSERT's column list, or by name), then
  * applies it as ONE manifest merge — atomic snapshot publish, the
  * same machinery every other write path uses. */
final case class ManifestInsertCommand(
    path: String,
    options: Map[String, String],
    tableSchema: StructType,
    query: LogicalPlan,
    userCols: Seq[String],
    byName: Boolean) extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  private def opt(key: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  override def run(session: SparkSession): Seq[Row] = {
    require(opt("versionAsOf").isEmpty && opt("timestampAsOf").isEmpty,
      "INSERT through a time-travel (versionAsOf/timestampAsOf) view " +
        "is ambiguous: " +
        "the view serves a PINNED snapshot but the merge would land on " +
        "the LIVE table — mount an un-pinned view for DML")
    val df = org.apache.spark.sql.graftbridge.GraftSqlBridge
      .ofRows(session, query)
    val names = tableSchema.fieldNames.toSeq
    // the INSERT's target column order: an explicit column list must
    // cover EVERY table column (a keyed merge has no notion of partial
    // rows — missing columns cannot default), BY NAME matches the
    // query's own output names, else classic positional semantics
    val targetOrder =
      if (userCols.nonEmpty) {
        val unknown = userCols.filterNot(names.contains)
        require(unknown.isEmpty,
          s"INSERT column(s) ${unknown.mkString(", ")} do not exist in " +
            s"the manifest table (${names.mkString(", ")})")
        val missing = names.filterNot(userCols.contains)
        require(missing.isEmpty,
          s"INSERT into a manifest table must list every column " +
            s"(missing ${missing.mkString(", ")}): a keyed merge has " +
            "no column defaults")
        userCols
      } else if (byName) {
        val missing = names.filterNot(df.columns.contains)
        require(missing.isEmpty,
          s"INSERT BY NAME: query output lacks table column(s) " +
            s"${missing.mkString(", ")}")
        df.columns.toSeq
      } else {
        require(df.columns.length == names.size,
          s"INSERT arity mismatch: query produces ${df.columns.length} " +
            s"column(s), the manifest table has ${names.size} " +
            s"(${names.mkString(", ")})")
        names
      }
    // align positionally onto the target order, cast to stored types —
    // binding the query's output ATTRIBUTES, not their names: an
    // auto-generated name like `30.0` (a bare literal in the SELECT)
    // would mis-parse as a nested reference under col()
    val outAttrs = df.queryExecution.analyzed.output
    val aligned = df.select(outAttrs.zip(targetOrder).map {
      case (attr, target) =>
        org.apache.spark.sql.graftbridge.GraftSqlBridge.column(attr)
          .cast(tableSchema(target).dataType).as(target)
    }: _*)
    // merge spec: view OPTIONS first, stored merge-on-read spec second
    val v = Layout.manifestVersion(session, path).getOrElse(
      throw new IllegalStateException(s"$path stopped being a manifest " +
        "table after the view was created"))
    val m = Layout.readManifestMeta(session, path, v)
    if (m.appendOnly) {
      // a DECLARED append-only table needs no merge spec at all: the
      // INSERT is a pure spec-less append (rows live forever)
      Layout.appendManifest(session, path, aligned)
      return Seq.empty
    }
    val keys = opt("keys").map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq)
      .getOrElse(m.morKeys)
    val versionCol = opt("versionCol").orElse(m.morVersionCol)
    require(keys.nonEmpty && versionCol.nonEmpty,
      "INSERT INTO a manifest table needs its merge spec: add " +
        "OPTIONS (keys 'k1,k2', versionCol 'ver') to the view (or " +
        "establish the table's merge-on-read spec with a first " +
        "mergeManifestDelta)")
    if (opt("mor").exists(_.toBoolean))
      Layout.mergeManifestDelta(session, path, aligned, keys,
        versionCol.get)
    else
      Layout.mergeManifest(session, path, aligned, keys, versionCol.get)
    Seq.empty
  }
}

/** Runs a rewritten MERGE INTO: the source joins the LIVE snapshot on
  * the merge condition (right-outer — rows of the table the batch
  * never matches stay out of the publish entirely), each row takes its
  * FIRST applicable clause in statement order (the SQL MERGE
  * contract), and the resulting net batch — updates re-projected
  * through their assignments, deletes tombstone-flagged, inserts
  * aligned to the table schema — applies as ONE force-wins
  * copy-on-write publish through the same machinery as every other
  * write path. A full CDC batch is one statement, one publish, no
  * reader-visible half-state. Multiple batch rows landing on one key
  * (an ON condition weaker than the key, or a duplicated source)
  * refuse loudly BEFORE publishing — latest-wins between them would be
  * arrival-order nondeterminism.
  *
  * `WHEN NOT MATCHED BY SOURCE` (the reconcile-to-snapshot shape:
  * "make the table equal this feed, deleting what the feed dropped")
  * widens the join to FULL-outer — the cost is inherently a full
  * table scan, because the clause acts on rows the batch never
  * carries, and the planner can prune nothing (stated honestly; the
  * PUBLISH is still copy-on-write at partition granularity over the
  * claimed rows only). Target-only rows take UPDATE/DELETE clauses
  * exactly like matched ones; their expressions can reference only
  * target columns (Spark's analyzer enforces that before this
  * command runs). */
final case class ManifestMergeCommand(
    path: String,
    options: Map[String, String],
    tableSchema: StructType,
    targetAttrs: Seq[Attribute],
    source: LogicalPlan,
    mergeCondition: Expression,
    matchedActions: Seq[MergeAction],
    notMatchedActions: Seq[MergeAction],
    notMatchedBySourceActions: Seq[MergeAction] = Nil)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  private def opt(key: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  /** One clause, normalized: which join side it claims (MATCHED /
    * NOT MATCHED [BY TARGET] / NOT MATCHED BY SOURCE), optional guard,
    * and a per-column value function over the joined frame.
    * `partGuarded` names partition columns a star-expanded UPDATE
    * assigns: the merge contract forbids moving a row across
    * partitions, so the assignment applies only when it is a no-op and
    * raises otherwise (in-plan, before anything publishes). */
  private final case class Act(side: Int, delete: Boolean,
                               cond: Option[Expression],
                               assigns: Option[Map[String, Expression]],
                               partGuarded: Set[String] = Set.empty)
  private val SideMatched = 0
  private val SideNotMatched = 1 // source row with no target match
  private val SideNmbs = 2       // target row with no source match

  override def run(session: SparkSession): Seq[Row] = {
    require(opt("versionAsOf").isEmpty && opt("timestampAsOf").isEmpty,
      "MERGE INTO through a time-travel (versionAsOf/timestampAsOf) " +
        "view is ambiguous: the view serves a PINNED snapshot but the " +
        "merge would land on the LIVE table — mount an un-pinned view " +
        "for DML")
    val v = Layout.manifestVersion(session, path).getOrElse(
      throw new IllegalStateException(s"$path stopped being a manifest " +
        "table after the view was created"))
    val m = Layout.readManifestMeta(session, path, v)
    require(!m.appendOnly,
      s"MERGE INTO $path: the table is DECLARED append-only — updates " +
        "and deletes are structurally inexpressible on it; append " +
        "event batches with INSERT instead")
    // every LIVE spec's columns: on a mixed-spec table a key's
    // partition values are immutable under every era it may live in
    // (mergeManifest's cross-era pre-scan derives the key's old-era
    // partition from the row's own values)
    val specCols = m.liveSpecs.flatten.distinct
    val keys = opt("keys").map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq)
      .getOrElse(m.morKeys)
    val versionCol = opt("versionCol").orElse(m.morVersionCol)
    require(keys.nonEmpty && versionCol.nonEmpty,
      "MERGE INTO a manifest table needs its merge spec: declare it at " +
        "seed (writeManifestTable keys/versionCol), establish it with a " +
        "first mergeManifestDelta, or add OPTIONS (keys, versionCol) " +
        "to the view")

    // --- rebinding: the resolved condition/assignments reference the
    // ORIGINAL target attrs (the mounted view's pinned relation) and
    // the source plan's attrs. The merge must read the LIVE snapshot
    // (the UPDATE/DELETE discipline), and the source's columns must
    // survive a name collision with the table's — so the source
    // projects to reserved names (__s_i) and every expression rebinds
    // by exprId to either the live table column or the renamed source
    // column, resolved BY NAME against the joined frame.
    // native per-era union on mixed tables — see ManifestMutateCommand
    val fresh = Layout.manifestTable(session, path)
    val tgtNames = targetAttrs.map(a => a.exprId -> a.name).toMap
    tableSchema.fieldNames.foreach(n => require(!n.startsWith("__s_") &&
      n != "__s_present" && n != "__t_present" && n != "__mrg_action" &&
      n != "__mrg_del",
      s"table column '$n' collides with MERGE INTO's reserved names"))
    val srcDF0 = org.apache.spark.sql.graftbridge.GraftSqlBridge
      .ofRows(session, source)
    val srcAttrs = srcDF0.queryExecution.analyzed.output
    val srcNames: Map[ExprId, String] = srcAttrs.zipWithIndex
      .map { case (a, i) => a.exprId -> s"__s_$i" }.toMap
    // source column NAME -> renamed (__s_i) for star expansion
    val srcByName: Map[String, String] = srcAttrs.zipWithIndex
      .map { case (a, i) => a.name.toLowerCase -> s"__s_$i" }.toMap
    def bridgeCol(e: Expression): Column =
      org.apache.spark.sql.graftbridge.GraftSqlBridge.column(e)
    val src = srcDF0.select(srcAttrs.zipWithIndex.map { case (a, i) =>
      bridgeCol(a).as(s"__s_$i") } :+ lit(true).as("__s_present"): _*)
    def rebind(e: Expression): Column = bridgeCol(e.transform {
      case a: AttributeReference =>
        srcNames.get(a.exprId).map(n => UnresolvedAttribute(Seq(n)))
          .orElse(tgtNames.get(a.exprId).map { n =>
            require(fresh.columns.exists(_.equalsIgnoreCase(n)),
              s"MERGE references column '$n' which the live table no " +
                "longer has (renamed since the view was created?) — " +
                "re-create the view")
            UnresolvedAttribute(Seq(n))
          })
          .getOrElse(throw new IllegalStateException(
            s"MERGE INTO $path: cannot rebind ${a.sql} — it belongs to " +
              "neither the target nor the source"))
    })

    // the ON condition must pin EVERY merge key by equality: "matched"
    // in the statement must mean "same key" in the publish, or updates
    // would land on rows the keyed merge then routes elsewhere
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val keyEqs = conjuncts(mergeCondition).flatMap {
      case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r) =>
        Seq(l, r).collect {
          case a: AttributeReference if tgtNames.contains(a.exprId) &&
              keys.exists(_.equalsIgnoreCase(a.name)) =>
            a.name.toLowerCase
        }
      case _ => Nil
    }.toSet
    val unpinned = keys.filterNot(k => keyEqs.contains(k.toLowerCase))
    require(unpinned.isEmpty,
      s"MERGE INTO $path: the ON condition must contain an equality on " +
        s"every merge key — missing ${unpinned.mkString(", ")} (keys: " +
        s"${keys.mkString(", ")})")

    // --- normalize the clauses (statement order preserved)
    def norm(a: MergeAction, side: Int): Act = a match {
      case UpdateAction(c, as, fromStar) =>
        // `SET *` reaches here pre-expanded by the analyzer with
        // fromStar = true and an assignment for EVERY column —
        // including keys (identity by the ON equality: drop) and
        // partition columns (forbidden to move: keep, but guarded
        // in-plan to the no-op case)
        var guarded = Set.empty[String]
        val asg = as.flatMap { x =>
          val n = x.key match {
            case ar: AttributeReference => ar.name
            case other => throw new IllegalArgumentException(
              s"MERGE UPDATE SET targets must be top-level columns " +
                s"(got ${other.sql})")
          }
          val isKey = keys.exists(_.equalsIgnoreCase(n))
          val isPart = specCols.exists(_.equalsIgnoreCase(n))
          require(fromStar || !isKey,
            s"MERGE UPDATE cannot assign merge key '$n': that changes " +
              "row identity — DELETE + INSERT instead")
          require(fromStar || !isPart,
            s"MERGE UPDATE cannot assign partition column '$n': moved " +
              "rows would change partitions, which the merge contract " +
              "forbids — DELETE + INSERT instead")
          if (isKey) None // star: the ON equality makes it identity
          else {
            if (isPart) guarded += n.toLowerCase
            Some(n.toLowerCase -> x.value)
          }
        }.toMap
        Act(side, delete = false, c, Some(asg), guarded)
      case UpdateStarAction(c) =>
        // un-expanded star (defensive: the analyzer normally expands):
        // every table column from the source's same-named column, keys
        // dropped (identity), partition columns guarded
        var guarded = Set.empty[String]
        val asg = tableSchema.fieldNames.flatMap { n =>
          val s = srcByName.getOrElse(n.toLowerCase,
            throw new IllegalArgumentException(
              s"MERGE UPDATE SET *: source has no column '$n'"))
          if (keys.exists(_.equalsIgnoreCase(n))) None
          else {
            if (specCols.exists(_.equalsIgnoreCase(n)))
              guarded += n.toLowerCase
            Some(n.toLowerCase -> (UnresolvedAttribute(Seq(s)): Expression))
          }
        }.toMap
        Act(side, delete = false, c, Some(asg), guarded)
      case DeleteAction(c) => Act(side, delete = true, c, None)
      case InsertAction(c, as) =>
        val asg = as.map { x =>
          val n = x.key match {
            case ar: AttributeReference => ar.name
            case u: UnresolvedAttribute => u.name
            case other => throw new IllegalArgumentException(
              s"MERGE INSERT targets must be top-level columns " +
                s"(got ${other.sql})")
          }
          n.toLowerCase -> x.value
        }.toMap
        val missing = tableSchema.fieldNames
          .filterNot(n => asg.contains(n.toLowerCase))
        require(missing.isEmpty,
          s"MERGE INSERT must assign every table column (missing " +
            s"${missing.mkString(", ")}): a keyed merge has no column " +
            "defaults")
        Act(side, delete = false, c, Some(asg))
      case InsertStarAction(c) =>
        val asg = tableSchema.fieldNames.map { n =>
          val s = srcByName.getOrElse(n.toLowerCase,
            throw new IllegalArgumentException(
              s"MERGE INSERT *: source has no column '$n'"))
          n.toLowerCase -> (UnresolvedAttribute(Seq(s)): Expression)
        }.toMap
        Act(side, delete = false, c, Some(asg))
      case other => throw new IllegalArgumentException(
        s"MERGE INTO a manifest table: unsupported clause $other")
    }
    notMatchedBySourceActions.foreach {
      case _: UpdateAction | _: DeleteAction => ()
      case other => throw new IllegalArgumentException(
        "MERGE WHEN NOT MATCHED BY SOURCE supports only UPDATE and " +
          s"DELETE (got $other): the row exists in the target; there " +
          "is nothing to insert")
    }
    val acts = matchedActions.map(norm(_, SideMatched)) ++
      notMatchedActions.map(norm(_, SideNotMatched)) ++
      notMatchedBySourceActions.map(norm(_, SideNmbs))
    if (acts.isEmpty) return Seq.empty

    // --- classify each joined row to its FIRST applicable clause;
    // rows no clause claims stay out of the batch. Without NOT MATCHED
    // BY SOURCE clauses the join is right-outer (target rows the batch
    // never matches never enter the plan); with them it must be
    // FULL-outer — the full-table cost is inherent to the clause's
    // semantics, not this implementation.
    val tgt = fresh.withColumn("__t_present", lit(true))
    val joinType =
      if (notMatchedBySourceActions.isEmpty) "right_outer" else "full_outer"
    val joined = tgt.join(src, rebind(mergeCondition), joinType)
    val actionCol = acts.zipWithIndex.foldRight(lit(0)) {
      case ((a, i), els) =>
        val side = a.side match {
          case SideMatched =>
            col("__t_present").isNotNull && col("__s_present").isNotNull
          case SideNotMatched => col("__t_present").isNull
          case _ => col("__s_present").isNull
        }
        when(side && a.cond.map(rebind).getOrElse(lit(true)), lit(i + 1))
          .otherwise(els)
    }
    val classified = joined.withColumn("__mrg_action", actionCol)
      .filter(col("__mrg_action") > 0)
    val outCols = tableSchema.fields.toSeq.map { f =>
      acts.zipWithIndex.foldRight(lit(null).cast(f.dataType)) {
        case ((a, i), els) =>
          val value: Column = a.assigns match {
            case Some(asg) => asg.get(f.name.toLowerCase)
              .map { e =>
                val v = rebind(e).cast(f.dataType)
                if (!a.partGuarded.contains(f.name.toLowerCase)) v
                else // star-assigned partition column: no-op or raise
                  when(v <=> col(f.name), col(f.name)).otherwise(
                    org.apache.spark.sql.functions.raise_error(
                      org.apache.spark.sql.functions.concat(
                        lit(s"MERGE UPDATE SET * would move a row's " +
                          s"partition column '${f.name}' from '"),
                        col(f.name).cast("string"),
                        lit("' — the merge contract forbids partition " +
                          "moves; DELETE + INSERT the row instead"))))
              }
              .getOrElse(col(f.name)) // unassigned UPDATE col: target's
            case None => col(f.name) // DELETE carries the before-image
          }
          when(col("__mrg_action") === (i + 1), value).otherwise(els)
      }.as(f.name)
    }
    val deleteIdxs = acts.zipWithIndex.collect {
      case (a, i) if a.delete => i + 1 }
    val batch = classified.select(outCols :+
      (if (deleteIdxs.isEmpty) lit(false)
       else col("__mrg_action").isin(deleteIdxs: _*)).as("__mrg_del"): _*)

    // one batch row per key, or the publish's latest-wins would pick
    // an arrival-order winner (Delta refuses the same way)
    val dup = batch.groupBy(keys.map(col): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dup.isEmpty,
      s"MERGE INTO $path: multiple source rows land on target key " +
        s"${dup.headOption.map(_.toString).getOrElse("")} — the ON " +
        "condition (plus clause guards) must match each key at most " +
        "once per statement; de-duplicate the source")

    if (!batch.isEmpty) {
      Layout.mergeManifest(session, path, batch, keys, versionCol.get,
        deleteCol = Some("__mrg_del"), forceWins = true)
      ()
    }
    Seq.empty
  }
}
