package graft.plans

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Sink, Source}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Layout

/** The v1-relation safety net for MIXED-SPEC manifest tables: a
  * [[org.apache.spark.sql.sources.PrunedFilteredScan]] over the
  * per-era union ([[graft.operators.Layout.manifestTable]]), so any
  * consumer the parser-seam rewrite does not reach — `CREATE TABLE`'s
  * DDL-time schema resolution, `CREATE TEMPORARY VIEW USING manifest`,
  * DataFrame-API mounts, subqueries inside DML conditions (UPDATE /
  * DELETE WHERE clauses pass through rewriteMixed untouched because
  * their TARGET must) — reads the table CORRECTLY (never a refusal,
  * never one era's rows). Bare-name SQL reads elsewhere, including
  * SELECT-side expression subqueries, never land here: the parser seam
  * substitutes the native codegen'd per-era union for them.
  * Pushed Eq/range/In/null filters
  * translate into the underlying per-era planner indexes, so partition
  * pruning and stats skipping still fire per era; Spark re-applies
  * every filter above the scan, so untranslated shapes stay sound.
  * SQL DML targets resolving here route through the same commands as
  * single-spec tables (see [[ManifestInsertRule]]): the copy-on-write
  * merge migrates touched old-era partitions on the way, so every DML
  * statement shrinks the spec debt.
  * Version-absent mounts resolve the LIVE version at each buildScan
  * (the read-committed-per-scan contract of the single-index mount). */
final class MixedSpecManifestRelation(
    spark: org.apache.spark.sql.SparkSession,
    val table: String,
    version: Option[Int],
    sqlCtx: SQLContext,
    // the mount's OPTIONS (keys/versionCol/mor/versionAsOf…): carried
    // so the SQL DML rewrite can read the merge spec off the relation,
    // exactly as it does off a single-spec HadoopFsRelation's options
    val options: Map[String, String] = Map.empty) extends BaseRelation
    with org.apache.spark.sql.sources.PrunedFilteredScan {
  import org.apache.spark.sql.{Column, functions => F}
  import org.apache.spark.sql.sources

  override def sqlContext: SQLContext = sqlCtx
  override val schema: org.apache.spark.sql.types.StructType = {
    val v = version.orElse(
      graft.operators.Layout.manifestVersion(spark, table)).get
    graft.operators.Layout.manifestSchema(
      graft.operators.Layout.readManifestMeta(spark, table, v))
  }

  private def translate(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(F.col(a) === F.lit(v))
    case sources.GreaterThan(a, v) => Some(F.col(a) > F.lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(F.col(a) >= F.lit(v))
    case sources.LessThan(a, v) => Some(F.col(a) < F.lit(v))
    case sources.LessThanOrEqual(a, v) => Some(F.col(a) <= F.lit(v))
    case sources.In(a, vs) => Some(F.col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(F.col(a).isNull)
    case sources.IsNotNull(a) => Some(F.col(a).isNotNull)
    case sources.And(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case sources.Not(c) => translate(c).map(!_)
    case sources.StringStartsWith(a, p) =>
      Some(F.col(a).startsWith(p))
    case _ => None // re-applied above the scan anyway
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[sources.Filter]):
      org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    val base = graft.operators.Layout.manifestTable(spark, table, version)
    val filtered = filters.flatMap(translate)
      .foldLeft(base)((d, c) => d.filter(c))
    // empty requiredColumns = bare existence/count scan: zero-column
    // rows at the right cardinality
    filtered.select(requiredColumns.toIndexedSeq.map(F.col): _*).rdd
  }
}

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
  * reachable from pure SQL. A `versionAsOf` mount is pinned to that
  * snapshot (time travel); a version-absent mount is LIVE — each scan
  * serves the current manifest version (see [[ManifestFileIndex]]),
  * so `CREATE TABLE … USING manifest` registrations read fresh across
  * sessions with no REFRESH choreography. Pending
  * merge-on-read deltas refuse loudly (the index's contract).
  *
  * PERSISTENT registration (the catalog surface): `CREATE TABLE name
  * USING manifest OPTIONS (path '…')` stores the mount in the session
  * catalog — `SHOW TABLES`/`DESCRIBE` see it, every session against
  * the same metastore resolves it by bare name, and the stored merge
  * spec (declared at seed, or fixed by the first merge-on-read delta)
  * makes INSERT/UPDATE/DELETE/MERGE work with no per-view OPTIONS.
  * Schema evolution after registration refuses at scan time with the
  * remedy (re-CREATE TABLE): the catalog pins the creation-time
  * schema.
  */
final class ManifestProvider extends RelationProvider
    with CreatableRelationProvider
    with StreamSinkProvider with StreamSourceProvider
    with DataSourceRegister {

  // `spark.readStream.format("manifest")` streams the table through
  // the manifest-feed source — ONE format string covers batch read,
  // batch write, streaming read and streaming sink, so a consumer
  // never has to know the feed is a separate provider (the options —
  // startingVersion, mode=appends/changes, maxVersionsPerBatch — are
  // the feed's, documented on [[graft.streaming.ManifestFeedSource]])
  private val feed = new graft.streaming.ManifestFeedProvider

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[org.apache.spark.sql.types
                              .StructType],
                            providerName: String,
                            parameters: Map[String, String]):
      (String, org.apache.spark.sql.types.StructType) =
    (shortName(),
      feed.sourceSchema(sqlContext, schema, providerName, parameters)._2)

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[org.apache.spark.sql.types
                              .StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    feed.createSource(sqlContext, metadataPath, schema, providerName,
      parameters)

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
    val spark = sqlContext.sparkSession
    val version = opt(parameters, "versionAsOf").map { v =>
      require(v.forall(_.isDigit),
        s"versionAsOf must be an integer manifest version (got '$v')")
      require(opt(parameters, "timestampAsOf").isEmpty,
        "versionAsOf and timestampAsOf are mutually exclusive")
      v.toInt
    }.orElse(opt(parameters, "timestampAsOf").map { t =>
      // any timestamp-castable literal under the SESSION zone (the SQL
      // `TIMESTAMP AS OF` contract — same Cast), or pure-digit epoch
      // millis — resolved to the newest version published at or before
      // the instant
      val ms =
        if (t.nonEmpty && t.forall(_.isDigit)) t.toLong
        else {
          import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
          import org.apache.spark.sql.types.TimestampType
          val cast = Cast(Literal(t), TimestampType,
            Some(spark.sessionState.conf.sessionLocalTimeZone))
          Option(cast.eval(null)).map(_.asInstanceOf[Long] / 1000L)
            .getOrElse(throw new IllegalArgumentException(
              s"timestampAsOf '$t' is not a timestamp — pass epoch " +
                "millis or any timestamp-castable literal " +
                "('yyyy-MM-dd', 'yyyy-MM-dd HH:mm:ss[.SSS]', ISO-8601 " +
                "with offset)"))
        }
      graft.operators.Layout.versionAtTimestamp(spark, path, ms)
    })
    // MIXED-SPEC tables (a metadata-only partition-spec change with
    // unmigrated generations): one HadoopFsRelation serves one spec, so
    // the provider returns a union-backed relation instead — correct
    // for EVERY v1 consumer (DDL-time schema resolution, DESCRIBE,
    // expression subqueries), with Eq/range/In filters translated into
    // the per-era planner indexes so pruning still fires. Hot-path
    // bare-name SELECTs never reach it: the parser seam substitutes
    // native per-era relations (see ManifestSqlParser.rewriteMixed).
    val vLive = version.orElse(
      graft.operators.Layout.manifestVersion(spark, path)).getOrElse(
      throw new IllegalArgumentException(
        s"$path is not a manifest table; seed it with writeManifestTable"))
    val meta = graft.operators.Layout.readManifestMeta(spark, path, vLive)
    if (meta.liveSpecs.size > 1)
      new MixedSpecManifestRelation(spark, path, version, sqlContext,
        parameters)
    else {
      val idx = new ManifestFileIndex(spark, path, version)
      // the index's (dataSchema ++ partitionSchema) IS the stored column
      // order — manifest tables store data columns first by construction.
      // The view OPTIONS ride along so the INSERT rewrite
      // ([[ManifestInsertRule]]) can read the merge spec (keys,
      // versionCol, mor) off the relation.
      HadoopFsRelation(idx, idx.partitionSchema, idx.dataSchema,
        idx.dataBucketSpec, new ParquetFileFormat, parameters)(spark)
    }
  }

  /** The BATCH write surface: `df.write.format("manifest")` —
    * SaveMode.Overwrite/ErrorIfExists/Ignore SEED a new table
    * ([[graft.operators.Layout.writeManifestTable]]; `partitionCols`
    * option required, plus optional `statsCols`/`bloomCols`), and
    * SaveMode.Append applies a keyed merge onto an existing one
    * (`keys` + `versionCol` options; `mor 'true'` lands it as a
    * merge-on-read delta). Overwrite of an EXISTING manifest table
    * refuses loudly — it would discard history retained versions still
    * reference. */
  override def createRelation(sqlContext0: SQLContext,
                              mode: org.apache.spark.sql.SaveMode,
                              parameters: Map[String, String],
                              data: org.apache.spark.sql.DataFrame):
      BaseRelation = {
    import org.apache.spark.sql.SaveMode
    val sqlContext = sqlContext0
    val path = opt(parameters, "path").getOrElse(
      throw new IllegalArgumentException(
        "manifest writer needs .option(\"path\", <table dir>)"))
    val spark = sqlContext.sparkSession
    val exists = Layout.manifestVersion(spark, path).isDefined
    def seed(): Unit = {
      val pcols = opt(parameters, "partitionCols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      require(pcols.nonEmpty,
        "seeding a manifest table needs .option(\"partitionCols\", " +
          "\"p1,p2\") — the seed fixes the table's partitioning")
      def cols(key: String): Seq[String] = opt(parameters, key).toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      Layout.writeManifestTable(spark, path, data, pcols,
        statsCols = cols("statsCols"), bloomCols = cols("bloomCols"),
        appendOnly = opt(parameters, "appendOnly").exists(_.toBoolean),
        // declared merge spec: stored in the manifest so every later
        // writer (SQL DML by bare table name included) needs no OPTIONS
        keys = cols("keys"), versionCol = opt(parameters, "versionCol"),
        // DATA bucketing (shuffle-free co-bucketed joins): fixed at
        // seed like the partitioning
        bucketCols = cols("bucketBy"),
        buckets = opt(parameters, "buckets").map(_.toInt).getOrElse(0))
    }
    mode match {
      case SaveMode.Append =>
        require(exists,
          s"$path is not a manifest table; seed it first " +
            "(mode=overwrite with partitionCols, or writeManifestTable)")
        val live = Layout.manifestVersion(spark, path).get
        val m = Layout.readManifestMeta(spark, path, live)
        if (m.appendOnly) {
          // declared append-only: pure spec-less append, no options
          Layout.appendManifest(spark, path, data)
          ()
        } else {
          // explicit options first, the table's STORED merge spec
          // second (declared at seed or fixed by the first delta)
          val keys = Some(opt(parameters, "keys").toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
            .filter(_.nonEmpty).getOrElse(m.morKeys)
          val versionCol = opt(parameters, "versionCol")
            .orElse(m.morVersionCol)
          require(keys.nonEmpty && versionCol.nonEmpty,
            "manifest append is a keyed merge: set .option(\"keys\", " +
              "\"k1,k2\") and .option(\"versionCol\", <col>), or seed " +
              "the table with a declared merge spec")
          if (opt(parameters, "mor").exists(_.toBoolean))
            Layout.mergeManifestDelta(spark, path, data, keys,
              versionCol.get)
          else
            Layout.mergeManifest(spark, path, data, keys, versionCol.get)
          ()
        }
      case SaveMode.Overwrite =>
        require(!exists,
          s"$path is already a manifest table: refusing to overwrite " +
            "(history retained versions reference would vanish); merge " +
            "onto it with mode=append, or reap + delete it explicitly " +
            "first")
        seed()
      case SaveMode.ErrorIfExists =>
        require(!exists, s"$path is already a manifest table")
        seed()
      case SaveMode.Ignore =>
        if (!exists) seed()
    }
    // schema-only handle: constructing the planner index here would
    // REFUSE after a successful merge-on-read append (pending deltas),
    // and callers of .save() don't consume the relation anyway — mount
    // a view via createRelation/`USING manifest` to read
    val outSchema = data.schema
    new BaseRelation {
      override val sqlContext: SQLContext = sqlContext0
      override def schema: org.apache.spark.sql.types.StructType =
        outSchema
    }
  }

  /** The WRITE side: `df.writeStream.format("manifest")` — each
    * micro-batch applies as a keyed latest-wins merge onto a
    * PRE-SEEDED manifest table (seed with
    * [[graft.operators.Layout.writeManifestTable]]; the seed fixes the
    * partitioning, so auto-seeding from an arbitrary first batch would
    * silently decide the table's layout). A DECLARED append-only sink
    * table ingests every batch as a pure spec-less append instead —
    * the event-stream shape, no keyed options accepted. Keyed options:
    * `path`, `keys`
    * (comma-separated), `versionCol`; `deleteCol` for CDC
    * tombstones, or `changeTypeCol` when the stream carries
    * `_change_type` insert/delete tags (the `manifest-feed
    * mode=changes` shape — the sink reduces each batch to its per-key
    * NET outcome and applies it as ONE force-wins copy-on-write
    * publish, so full-CDC table-to-table replication needs no code
    * between the format strings and readers never observe a
    * half-applied batch); `mor` (default true — merge-on-read
    * delta appends,
    * the right cost shape for trickle batches; false = copy-on-write);
    * `foldEvery` (N — fold pending deltas after every Nth batch);
    * `sinkId` — the exactly-once marker namespace (set distinct ids
    * when several queries write the same table). The checkpoint's
    * micro-batch id rides into the manifest's `sinkBatch` marker, so a
    * crash-replayed batch is a no-op publish and an id REGRESSION (a
    * fresh checkpoint against an existing table, a second writer on
    * the same namespace) fails loudly instead of silently dropping
    * batches: exactly-once end to end. The declarative twin of
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
    // keys/versionCol are the KEYED-merge spec; a DECLARED append-only
    // sink table needs neither (checked against the table in addBatch)
    val keys = opt(parameters, "keys").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val versionCol = opt(parameters, "versionCol")
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
    // diff's per-key precedence (batch over base, regardless of
    // versionCol) is applied with a force-wins merge — merge-on-read
    // resolution is version-ordered across all pending deltas, so a
    // re-inserted key with a lower version would lose to its own
    // before-image
    require(changeTypeCol.isEmpty ||
        !opt(parameters, "mor").exists(_.toBoolean),
      "changeTypeCol batches apply as force-wins copy-on-write merges " +
        "(merge-on-read resolution is version-ordered and cannot give " +
        "a net diff absolute precedence); drop mor=true")
    val mor = changeTypeCol.isEmpty &&
      opt(parameters, "mor").forall(_.toBoolean)
    val foldEvery = opt(parameters, "foldEvery").map(_.toInt).getOrElse(0)
    require(foldEvery == 0 || mor,
      "foldEvery is the merge-on-read fold cadence; it needs mor=true")
    // independent writers on the same table namespace their
    // exactly-once markers: without distinct sinkIds, two queries'
    // checkpoint id sequences would collide on one marker and the
    // merge guard would refuse the slower one's batches (loudly — see
    // Layout.replayedSinkBatch — never silently)
    val sinkId = opt(parameters, "sinkId").getOrElse("")
    new Sink {
      override def addBatch(batchId: Long,
                            data: org.apache.spark.sql.DataFrame): Unit = {
        val spark = data.sparkSession
        val liveV = Layout.manifestVersion(spark, path).getOrElse(
          throw new IllegalArgumentException(
            s"$path is not a manifest table — seed it with " +
              "Layout.writeManifestTable before starting the sink (the " +
              "seed fixes the partitioning)"))
        // re-wrap: addBatch's frame supports one action, a merge needs
        // several (see StreamingShim.batchFrame)
        val raw = org.apache.spark.sql.graftshim.StreamingShim
          .batchFrame(spark, data.queryExecution.toRdd, data.schema)
        // a DECLARED append-only sink table takes the batch as a pure
        // spec-less append — the event-stream ingestion shape; the
        // keyed options make no sense against it
        val liveMeta = Layout.readManifestMeta(spark, path, liveV)
        if (liveMeta.appendOnly) {
          require(keys.isEmpty && versionCol.isEmpty &&
              deleteCol.isEmpty && changeTypeCol.isEmpty &&
              opt(parameters, "mor").isEmpty,
            s"$path is a DECLARED append-only table: drop the keyed " +
              "sink options (keys/versionCol/deleteCol/changeTypeCol/" +
              "mor) — every batch is a pure append")
          if (!raw.isEmpty) {
            Layout.appendManifest(spark, path, raw,
              batchId = batchId, sinkId = sinkId)
            ()
          }
          return
        }
        // explicit options first, the table's STORED merge spec second
        val mergeKeys = if (keys.nonEmpty) keys else liveMeta.morKeys
        val mergeVer = versionCol.orElse(liveMeta.morVersionCol)
        require(mergeKeys.nonEmpty,
          "manifest sink needs .option(\"keys\", \"k1,k2\") — or seed " +
            "the table with a declared merge spec")
        require(mergeVer.nonEmpty,
          "manifest sink needs .option(\"versionCol\", <col>) — or " +
            "seed the table with a declared merge spec")
        changeTypeCol match {
          case Some(ct) =>
            // MARKER NAMESPACE: net-outcome batches record their
            // exactly-once marker under "<sinkId>#net". The
            // pre-round-13 changeTypeCol sink published each batch as
            // TWO publishes with ids 2*batchId / 2*batchId+1 in the
            // BARE namespace — recording raw ids there would be
            // ambiguous against leftover doubled markers (a doubled
            // 2k+1 can numerically EQUAL a raw replay id, silently
            // dropping a live batch) and resuming a legacy checkpoint
            // would otherwise hit the loud id-regression guard. On the
            // first post-upgrade batch (#net marker absent) a bare
            // legacy marker is consulted under the DOUBLED semantics,
            // so upgraded streams resume exactly-once; the stale bare
            // marker stays behind, harmless. (Don't name another
            // writer's sinkId "<x>#net" by hand.)
            val netSinkId = s"$sinkId#net"
            val m0 = Layout.readManifestMeta(spark, path, liveV)
            if (m0.sinkBatch(netSinkId) < 0) {
              val legacy = m0.sinkBatch(sinkId)
              if (legacy == 2 * batchId + 1) return // applied pre-upgrade
              if (legacy > 2 * batchId + 1) throw new IllegalStateException(
                s"manifest sink on $path: batch id $batchId is BEHIND " +
                  s"the legacy doubled marker $legacy of sink namespace " +
                  s"'$sinkId' — a fresh checkpoint was pointed at an " +
                  "existing table or a second writer shares the " +
                  "namespace; use a distinct sinkId")
              // legacy == 2*batchId: the delete half applied, the
              // insert half was lost to a crash — the net force-wins
              // re-apply below completes it (idempotent over the
              // half). legacy <= 2*batchId-1: the previous batch
              // finished; proceed normally.
            }
            // ONE atomic publish per batch: the insert/delete tags
            // reduce to the per-key NET outcome — the after-image row
            // when the window inserted the key (an update's delete
            // half is subsumed), the delete-flagged before-image only
            // when it did not — and the whole net frame applies as a
            // single FORCE-WINS copy-on-write merge: batch rows
            // outrank base rows regardless of versionCol, so a key
            // re-created with a LOWER version still replaces the
            // replica's row, and no reader ever observes the
            // deleted-but-not-yet-reinserted half-state two sequenced
            // publishes would expose (nor can a crash persist it).
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
            val ins = checked.filter(col(ct) === "insert").drop(ct)
            val dels = checked.filter(col(ct) === "delete").drop(ct)
              // a delete whose key the same window re-inserted is the
              // before-image of an update: the insert row IS the net
              // outcome, the delete half must not survive beside it
              .join(ins.select(mergeKeys.map(col): _*).distinct(),
                mergeKeys, "left_anti")
            val net = ins.withColumn("__ct_del", lit(false))
              .unionByName(dels.withColumn("__ct_del", lit(true)))
            if (!net.isEmpty) {
              Layout.mergeManifest(spark, path, net, mergeKeys,
                mergeVer.get, deleteCol = Some("__ct_del"),
                batchId = batchId, sinkId = netSinkId, forceWins = true)
              ()
            }
          case None =>
            if (!raw.isEmpty) {
              if (mor)
                Layout.mergeManifestDelta(spark, path, raw, mergeKeys,
                  mergeVer.get, deleteCol = deleteCol,
                  batchId = batchId, sinkId = sinkId)
              else
                Layout.mergeManifest(spark, path, raw, mergeKeys,
                  mergeVer.get, deleteCol = deleteCol,
                  batchId = batchId, sinkId = sinkId)
              ()
            }
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
