package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** SQL time travel for catalog-registered manifest tables:
  *
  * {{{
  *   SELECT * FROM orders VERSION AS OF 3
  * }}}
  *
  * Spark's analyzer supports `VERSION AS OF` only for DataSource V2
  * relations and throws UNSUPPORTED_FEATURE.TIME_TRAVEL for session-
  * catalog v1 tables BEFORE any injected resolution rule can run (the
  * refusal happens inside ResolveRelations' own iteration). The seam
  * that runs earlier is the parser: this wrapper post-processes the
  * parsed tree and replaces `RelationTimeTravel` over an identifier
  * that names a `USING manifest` catalog table with a relation over
  * the PINNED [[ManifestFileIndex]] — the exact snapshot semantics the
  * `versionAsOf` view option gives, now by bare table name. Anything
  * else (other providers, temp views, timestamps) passes through to
  * the analyzer's own handling and error messages.
  */
final class ManifestSqlParser(session: SparkSession,
                              delegate: ParserInterface)
    extends ParserInterface {

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
        if v.nonEmpty && v.forall(_.isDigit) =>
      manifestRelation(u.multipartIdentifier, v.toInt).getOrElse(tt)
  }

  /** The pinned relation, iff `parts` names a session-catalog table
    * whose provider is `manifest`; None leaves the node untouched. */
  private def manifestRelation(parts: Seq[String],
                               ver: Int): Option[LogicalPlan] = {
    val ident = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case _ => return None
    }
    val cat = session.sessionState.catalog
    val meta =
      try {
        if (!cat.tableExists(ident)) return None
        cat.getTableMetadata(ident)
      } catch { case scala.util.control.NonFatal(_) => return None }
    if (!meta.provider.exists(_.equalsIgnoreCase("manifest"))) return None
    val path = meta.storage.properties.collectFirst {
      case (k, p) if k.equalsIgnoreCase("path") => p
    }.orElse(meta.storage.locationUri
      .map(u => new org.apache.hadoop.fs.Path(u).toString))
    path.map { p =>
      val idx = new ManifestFileIndex(session, p, Some(ver))
      val rel = HadoopFsRelation(idx, idx.partitionSchema, idx.dataSchema,
        None, new ParquetFileFormat, meta.storage.properties)(session)
      SubqueryAlias(ident.table, LogicalRelation(rel))
    }
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewrite(delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    rewrite(delegate.parsePlanWithParameters(sqlText, ctx))

  override def parseQuery(sqlText: String): LogicalPlan =
    rewrite(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String):
      org.apache.spark.sql.catalyst.expressions.Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseTableSchema(sqlText: String):
      org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)

  override def parseDataType(sqlText: String):
      org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)

  override def parseRoutineParam(sqlText: String):
      org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
}
