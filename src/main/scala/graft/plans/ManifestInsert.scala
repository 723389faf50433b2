package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, Filter, InsertIntoStatement, LogicalPlan, Project, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col
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
  * merge (tombstone-flagged for DELETE). SQL MERGE INTO remains out of
  * scope (a multi-clause conditional semantics worth a dedicated
  * surface, not a rewrite). Registered via
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

  /** The (index, relation) behind a resolved DML target, when it is a
    * manifest table mounted through [[ManifestFileIndex]]. */
  private def manifestTarget(table: LogicalPlan):
      Option[(ManifestFileIndex, HadoopFsRelation, LogicalRelation)] =
    stripAlias(table) match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation
            if fs.location.isInstanceOf[ManifestFileIndex] =>
          Some((fs.location.asInstanceOf[ManifestFileIndex], fs, lr))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case i: InsertIntoStatement if i.query.resolved =>
        manifestTarget(i.table) match {
          case Some((idx, fs, lr)) =>
            require(!i.overwrite,
              "INSERT OVERWRITE a manifest table is not supported: " +
                "overwriting discards history that retained versions " +
                "still reference — re-seed with writeManifestTable or " +
                "apply deletes as a merge with a tombstone flag")
            require(i.partitionSpec.isEmpty,
              "static PARTITION clauses are not supported on manifest " +
                "tables: partition routing is derived from the rows " +
                "themselves (the merge contract)")
            ManifestInsertCommand(idx.table, fs.options,
              lr.schema.asInstanceOf[StructType], i.query,
              i.userSpecifiedCols, i.byName)
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
          case Some((idx, fs, lr)) =>
            ManifestMutateCommand(idx.table, fs.options,
              lr.schema.asInstanceOf[StructType],
              condition = Some(d.condition), assignments = Nil,
              verb = "DELETE")
          case None => d
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
          case Some((idx, fs, lr)) =>
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
              .filter(idx.partitionSchema.fieldNames.contains)
            require(assignedParts.isEmpty,
              s"UPDATE cannot assign partition column(s) " +
                s"${assignedParts.mkString(", ")}: moved rows would " +
                "change partitions, which the merge contract forbids — " +
                "DELETE + INSERT the rows instead")
            ManifestMutateCommand(idx.table, fs.options,
              lr.schema.asInstanceOf[StructType],
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
    require(opt("versionAsOf").isEmpty,
      s"$verb through a versionAsOf (time-travel) view is ambiguous: " +
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
    // DELETE / shed this UPDATE
    val fresh = session.read.format("manifest")
      .option("path", path).load()
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
    require(opt("versionAsOf").isEmpty,
      "INSERT through a versionAsOf (time-travel) view is ambiguous: " +
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
    // align positionally onto the target order, cast to stored types
    val aligned = df.select(df.columns.toSeq.zip(targetOrder).map {
      case (qc, target) =>
        col(qc).cast(tableSchema(target).dataType).as(target)
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
