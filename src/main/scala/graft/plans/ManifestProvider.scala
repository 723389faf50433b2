package graft.plans

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Layout

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
    with StreamSinkProvider with DataSourceRegister {

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

  /** The WRITE side: `df.writeStream.format("manifest")` — each
    * micro-batch applies as a keyed latest-wins merge onto a
    * PRE-SEEDED manifest table (seed with
    * [[graft.operators.Layout.writeManifestTable]]; the seed fixes the
    * partitioning, so auto-seeding from an arbitrary first batch would
    * silently decide the table's layout). Options: `path`, `keys`
    * (comma-separated), `versionCol` (required); `deleteCol` for CDC
    * tombstones, or `changeTypeCol` when the stream carries
    * `_change_type` insert/delete tags (the `manifest-feed
    * mode=changes` shape — the sink derives the delete flag and drops
    * the tag, so full-CDC table-to-table replication needs no code
    * between the format strings); `mor` (default true — merge-on-read
    * delta appends,
    * the right cost shape for trickle batches; false = copy-on-write);
    * `foldEvery` (N — fold pending deltas after every Nth batch). The
    * checkpoint's micro-batch id rides into the manifest's `sinkBatch`
    * marker, so a crash-replayed batch is a no-op publish:
    * exactly-once end to end. The declarative twin of
    * [[graft.streaming.Streams.cdcApply]].
    */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(partitionColumns.isEmpty,
      "manifest sink: the table's partitioning comes from its seed " +
        "(writeManifestTable); drop .partitionBy(...)")
    require(outputMode != OutputMode.Complete(),
      "manifest sink applies incremental batches (append/update); " +
        "Complete mode would re-merge the whole result every trigger")
    val path = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "manifest sink needs .option(\"path\", <manifest table dir>)"))
    val keys = opt(parameters, "keys").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    require(keys.nonEmpty,
      "manifest sink needs .option(\"keys\", \"k1,k2\")")
    val versionCol = opt(parameters, "versionCol").getOrElse(
      throw new IllegalArgumentException(
        "manifest sink needs .option(\"versionCol\", <col>)"))
    val deleteCol = opt(parameters, "deleteCol")
    // a CDC stream (manifest-feed mode=changes) tags rows with
    // _change_type instead of a boolean flag: changeTypeCol derives
    // the delete flag in the sink, so full-CDC replication stays a
    // pure format-string pipeline
    val changeTypeCol = opt(parameters, "changeTypeCol")
    require(deleteCol.isEmpty || changeTypeCol.isEmpty,
      "deleteCol and changeTypeCol are exclusive (a boolean flag " +
        "column vs a _change_type insert/delete tag)")
    // net-diff application (changeTypeCol) must be COPY-ON-WRITE: the
    // sequenced delete-then-insert halves only sequence when the first
    // MATERIALIZES before the second reads — merge-on-read resolution
    // is version-ordered across all pending deltas, so a re-inserted
    // key with a lower version would lose to its own before-image
    require(changeTypeCol.isEmpty ||
        !opt(parameters, "mor").exists(_.toBoolean),
      "changeTypeCol batches apply as sequenced copy-on-write merges " +
        "(merge-on-read cannot order a net diff's delete-then-" +
        "reinsert); drop mor=true")
    val mor = changeTypeCol.isEmpty &&
      opt(parameters, "mor").forall(_.toBoolean)
    val foldEvery = opt(parameters, "foldEvery").map(_.toInt).getOrElse(0)
    require(foldEvery == 0 || mor,
      "foldEvery is the merge-on-read fold cadence; it needs mor=true")
    new Sink {
      override def addBatch(batchId: Long,
                            data: org.apache.spark.sql.DataFrame): Unit = {
        val spark = data.sparkSession
        require(Layout.manifestVersion(spark, path).isDefined,
          s"$path is not a manifest table — seed it with " +
            "Layout.writeManifestTable before starting the sink (the " +
            "seed fixes the partitioning)")
        // re-wrap: addBatch's frame supports one action, a merge needs
        // several (see StreamingShim.batchFrame)
        val raw = org.apache.spark.sql.graftshim.StreamingShim
          .batchFrame(spark, data.queryExecution.toRdd, data.schema)
        def merge(b: org.apache.spark.sql.DataFrame,
                  dCol: Option[String], id: Long): Unit =
          if (mor) {
            Layout.mergeManifestDelta(spark, path, b, keys,
              versionCol, deleteCol = dCol, batchId = id)
            ()
          } else {
            Layout.mergeManifest(spark, path, b, keys, versionCol,
              deleteCol = dCol, batchId = id)
            ()
          }
        changeTypeCol match {
          case Some(ct) =>
            // net-diff application is SEQUENCED: deletes (the window's
            // before-images) first, then inserts (its after-images) —
            // the only order under which delete+re-insert of a key
            // lands as REPLACE. A single version-ordered merge cannot
            // express it: the diff's per-key sequencing is not encoded
            // in versionCol, so a re-insert carrying a LOWER version
            // than the row it replaces would lose to both the batch's
            // delete row and the replica's existing row. Each half
            // carries its own monotone sink id (2i, 2i+1), so a crash
            // between the halves replays exactly the missing one.
            // Tags outside insert|delete (a foreign CDF's
            // update_pre/postimage, a typo, a null) fail loudly
            // in-plan instead of applying as upserts.
            import org.apache.spark.sql.functions.{col, concat, lit, raise_error, when}
            val checked = raw.withColumn(ct,
              when(col(ct).isin("insert", "delete"), col(ct))
                .otherwise(raise_error(concat(
                  lit("manifest sink changeTypeCol: unknown tag '"),
                  col(ct),
                  lit("' — expected insert|delete (net-diff feeds " +
                    "only; pre/post-image CDF shapes need reduction " +
                    "upstream)")))))
            val dels = checked.filter(col(ct) === "delete").drop(ct)
              .withColumn("__ct_del", lit(true))
            val ins = checked.filter(col(ct) === "insert").drop(ct)
            if (!dels.isEmpty)
              merge(dels, Some("__ct_del"), 2 * batchId)
            if (!ins.isEmpty)
              merge(ins, None, 2 * batchId + 1)
          case None =>
            if (!raw.isEmpty) merge(raw, deleteCol, batchId)
        }
        if (mor && foldEvery > 0 && (batchId + 1) % foldEvery == 0) {
          Layout.foldManifestDeltas(spark, path)
          ()
        }
      }
      override def toString: String = s"ManifestSink[$path]"
    }
  }
}
