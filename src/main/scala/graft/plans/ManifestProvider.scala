package graft.plans

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}

/** The manifest table as a plain Spark SQL data source — the DDL
  * surface on top of [[ManifestFileIndex]]:
  *
  * {{{
  *   CREATE TEMPORARY VIEW orders_live
  *   USING manifest OPTIONS (path '/data/orders');
  *   -- time travel to any retained snapshot:
  *   CREATE TEMPORARY VIEW orders_v3
  *   USING manifest OPTIONS (path '/data/orders', versionAsOf '3');
  * }}}
  *
  * (equivalently `spark.read.format("manifest").option("path", …)
  * .load()`). Every read resolves through the planner-integrated
  * index, so partition predicates prune exactly and stats/bloom
  * conjuncts skip generations with zero bespoke API — the same
  * relation [[graft.operators.Layout.manifestTable]] builds, now
  * reachable from pure SQL. Snapshot-pinned at view creation; pending
  * merge-on-read deltas refuse loudly (the index's contract).
  */
final class ManifestProvider extends RelationProvider
    with DataSourceRegister {

  override def shortName(): String = "manifest"

  private def opt(parameters: Map[String, String], key: String):
      Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase(key) => v }

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]):
      BaseRelation = {
    val path = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "manifest source needs OPTIONS (path '<manifest table dir>')"))
    val version = opt(parameters, "versionAsOf").map { v =>
      require(v.forall(_.isDigit),
        s"versionAsOf must be an integer manifest version (got '$v')")
      v.toInt
    }
    val spark = sqlContext.sparkSession
    val idx = new ManifestFileIndex(spark, path, version)
    // the index's (dataSchema ++ partitionSchema) IS the stored column
    // order — manifest tables store data columns first by construction
    HadoopFsRelation(idx, idx.partitionSchema, idx.dataSchema, None,
      new ParquetFileFormat, Map.empty)(spark)
  }
}
