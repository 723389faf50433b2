package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, SubqueryAlias}
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
  * INSERT fails loudly naming the fix. UPDATE/DELETE stay expressed as
  * merges with tombstone flags through the Scala/streaming surfaces —
  * a SQL MERGE INTO needs a parser extension and is documented out of
  * scope. Registered via [[graft.expressions.GraftExtensions]]
  * (`injectResolutionRule`, so it wins over the post-hoc
  * HadoopFsRelation conversion).
  */
final class ManifestInsertRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => stripAlias(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case i: InsertIntoStatement if i.query.resolved =>
        stripAlias(i.table) match {
          case lr: LogicalRelation => lr.relation match {
            case fs: HadoopFsRelation
                if fs.location.isInstanceOf[ManifestFileIndex] =>
              val idx = fs.location.asInstanceOf[ManifestFileIndex]
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
            case _ => i
          }
          case _ => i
        }
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
