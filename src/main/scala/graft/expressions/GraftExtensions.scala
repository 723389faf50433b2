package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers graft's native expressions as SQL functions, so
  * `spark.sql("SELECT cosine_sim(a.embedding, b.embedding) ...")` works
  * exactly like the Scala column API. Install with
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }
  private def doubleArg(e: Expression, what: String): Double = e match {
    case Literal(v: Double, _) => v
    case Literal(v: java.math.BigDecimal, _) => v.doubleValue()
    case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toDouble
    case Literal(v: Int, _) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }
  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) =>
      s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // pure-SQL DML on manifest tables: INSERT INTO a `USING manifest`
    // view rewrites to a keyed merge BEFORE the post-hoc
    // HadoopFsRelation conversion could turn it into a raw parquet
    // write into the table root (see ManifestInsertRule)
    ext.injectResolutionRule(session =>
      new graft.plans.ManifestInsertRule(session))
    // SQL `VERSION AS OF` on catalog-registered manifest tables: the
    // analyzer refuses time travel on v1 relations before any
    // resolution rule runs, so the rewrite lives in a parser wrapper
    ext.injectParser((session, delegate) =>
      new graft.plans.ManifestSqlParser(session, delegate))
    // --- the SQL-admin table functions over manifest tables: history,
    // the append feed, and the change diff as FROM-clause relations,
    // so a SQL-only operator can inspect and incrementally consume a
    // table without any Scala (the DESCRIBE HISTORY / table_changes
    // posture). Arguments must be literals — these resolve table state
    // during analysis, exactly like a DDL statement would.
    // COST: history parses one version ROOT per retained version — on
    // FLAT manifests with very many files the root carries all per-rel
    // maps (MetaScaleProbe: 11.4 MB / 0.15 s at 100k files), so a long
    // history gets expensive; seed large tables with manifestBuckets
    // (the root then holds only rollups) or bound retention.
    ext.injectTableFunction((
      new FunctionIdentifier("manifest_history"),
      new ExpressionInfo("graft.operators.Layout", "manifest_history"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "manifest_history(path)")
        val path = stringArg(args(0), "manifest_history path")
        val spark = org.apache.spark.sql.SparkSession.active
        val vs = graft.operators.Layout.manifestVersions(spark, path)
        require(vs.nonEmpty,
          s"$path is not a manifest table (or fully reaped)")
        val rows = vs.map { v =>
          val m = graft.operators.Layout.readManifestMeta(spark, path, v)
          org.apache.spark.sql.Row(v,
            if (m.publishedAtMs > 0L)
              new java.sql.Timestamp(m.publishedAtMs) else null,
            if (m.op.isEmpty) null else m.op, m.opDeletes,
            m.allRels.size, m.deltas.size)
        }
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "version INT, published_at TIMESTAMP, op STRING, " +
            "op_deletes BOOLEAN, partitions INT, pending_delta_rels INT")
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          .fromExternalRows(
            org.apache.spark.sql.catalyst.types.DataTypeUtils
              .toAttributes(schema), rows)
      }))
    // DESCRIBE DETAIL: one row summarizing the LIVE table — the facts
    // an operator (or a dashboard) wants before anything else. All
    // from one root parse; zero data-file access.
    ext.injectTableFunction((
      new FunctionIdentifier("manifest_detail"),
      new ExpressionInfo("graft.operators.Layout", "manifest_detail"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "manifest_detail(path)")
        val path = stringArg(args(0), "manifest_detail path")
        val spark = org.apache.spark.sql.SparkSession.active
        val v = graft.operators.Layout.manifestVersion(spark, path)
          .getOrElse(throw new IllegalArgumentException(
            s"$path is not a manifest table"))
        val m = graft.operators.Layout.readManifestMeta(spark, path, v)
        val retained = graft.operators.Layout
          .manifestVersions(spark, path)
        val row = org.apache.spark.sql.Row(
          path, v,
          if (m.publishedAtMs > 0L)
            new java.sql.Timestamp(m.publishedAtMs) else null,
          retained.size,
          m.partitionCols, m.allRels.size,
          m.deltas.values.map(_.size).sum,
          if (m.bytes.isEmpty) null
          else java.lang.Long.valueOf(m.bytes.values.sum),
          m.appendOnly, m.morKeys, m.morVersionCol.orNull,
          m.statsCols, m.bloomCols, m.droppedCols,
          m.colAliases.keys.toSeq.sorted,
          // SPEC-MIGRATION DEBT (mixed-spec tables after a metadata-only
          // respec): how many partitions — and how many bytes — still
          // live under a prior partition spec, and which specs those
          // are. The dashboard a budgeted migrate_partitions Maintain
          // drains against; 0/0/[] on single-spec tables.
          m.oldEraRels.size,
          java.lang.Long.valueOf(
            m.oldEraRels.flatMap(m.bytes.get).sum),
          m.specHistory.map(_.mkString(",")),
          // DATA-bucket layout (empty/0 on unbucketed tables): the
          // co-located-join contract repartition_table can adopt
          m.dataBucketCols, m.dataBuckets)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "path STRING, version INT, published_at TIMESTAMP, " +
            "retained_versions INT, partition_cols ARRAY<STRING>, " +
            "partitions INT, pending_deltas INT, bytes BIGINT, " +
            "append_only BOOLEAN, merge_keys ARRAY<STRING>, " +
            "version_col STRING, stats_cols ARRAY<STRING>, " +
            "bloom_cols ARRAY<STRING>, dropped_cols ARRAY<STRING>, " +
            "renamed_cols ARRAY<STRING>, old_era_partitions INT, " +
            "old_era_bytes BIGINT, prior_specs ARRAY<STRING>, " +
            "bucket_cols ARRAY<STRING>, buckets INT")
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          .fromExternalRows(
            org.apache.spark.sql.catalyst.types.DataTypeUtils
              .toAttributes(schema), Seq(row))
      }))
    // file-level listing with the per-FILE skipping stats (m69) — the
    // debugging view for "why did this scan touch that file"
    ext.injectTableFunction((
      new FunctionIdentifier("manifest_files"),
      new ExpressionInfo("graft.operators.Layout", "manifest_files"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "manifest_files(path)")
        val path = stringArg(args(0), "manifest_files path")
        val spark = org.apache.spark.sql.SparkSession.active
        val v = graft.operators.Layout.manifestVersion(spark, path)
          .getOrElse(throw new IllegalArgumentException(
            s"$path is not a manifest table"))
        val m = graft.operators.Layout.readManifestMeta(spark, path, v)
        val rows = m.fileStats.toSeq.sortBy(_._1).flatMap {
          case (rel, files) => files.toSeq.sortBy(_._1).map {
            case (file, cols) =>
              org.apache.spark.sql.Row(rel, file,
                cols.map { case (c, mm) => c -> mm._1.orNull },
                cols.map { case (c, mm) => c -> mm._2.orNull })
          }
        }
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "partition STRING, file STRING, " +
            "stats_min MAP<STRING,STRING>, stats_max MAP<STRING,STRING>")
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          .fromExternalRows(
            org.apache.spark.sql.catalyst.types.DataTypeUtils
              .toAttributes(schema), rows)
      }))
    // the SHOW PARTITIONS / DESCRIBE DETAIL posture: one row per live
    // partition with its base generation, pending-delta count, bytes
    // (recorded at publish — zero filesystem calls) and the
    // data-skipping min/max per stats column — what an operator reads
    // before deciding to compact, repartition, or reap
    ext.injectTableFunction((
      new FunctionIdentifier("manifest_partitions"),
      new ExpressionInfo("graft.operators.Layout", "manifest_partitions"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "manifest_partitions(path)")
        val path = stringArg(args(0), "manifest_partitions path")
        val spark = org.apache.spark.sql.SparkSession.active
        val v = graft.operators.Layout.manifestVersion(spark, path)
          .getOrElse(throw new IllegalArgumentException(
            s"$path is not a manifest table"))
        val m = graft.operators.Layout.readManifestMeta(spark, path, v)
        val rows = m.allRels.map { rel =>
          val st = m.stats.getOrElse(rel, Map.empty)
          val spec = graft.operators.Layout.specOfRel(rel)
          org.apache.spark.sql.Row(rel,
            m.entries.get(rel).map(Integer.valueOf).orNull,
            m.deltas.getOrElse(rel, Nil).size,
            m.bytes.get(rel).map(java.lang.Long.valueOf).orNull,
            st.map { case (c, mm) => c -> mm._1.orNull },
            st.map { case (c, mm) => c -> mm._2.orNull },
            spec,
            // old_era marks partitions a budgeted spec migration still
            // owes a rewrite — WHERE old_era lists the drain frontier
            spec != m.partitionCols)
        }
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "partition STRING, base_gen INT, pending_deltas INT, " +
            "bytes BIGINT, stats_min MAP<STRING,STRING>, " +
            "stats_max MAP<STRING,STRING>, spec_cols ARRAY<STRING>, " +
            "old_era BOOLEAN")
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          .fromExternalRows(
            org.apache.spark.sql.catalyst.types.DataTypeUtils
              .toAttributes(schema), rows)
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("manifest_appends"),
      new ExpressionInfo("graft.operators.Layout", "manifest_appends"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "manifest_appends(path, fromVersion, toVersion)")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.operators.Layout.appendsBetween(spark,
          stringArg(args(0), "manifest_appends path"),
          intArg(args(1), "fromVersion"), intArg(args(2), "toVersion"))
          .queryExecution.analyzed
      }))
    ext.injectTableFunction((
      new FunctionIdentifier("manifest_changes"),
      new ExpressionInfo("graft.operators.Layout", "manifest_changes"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "manifest_changes(path, fromVersion, toVersion)")
        val spark = org.apache.spark.sql.SparkSession.active
        graft.operators.Layout.manifestChanges(spark,
          stringArg(args(0), "manifest_changes path"),
          intArg(args(1), "fromVersion"), intArg(args(2), "toVersion"))
          .queryExecution.analyzed
      }))
    // --- SQL-driven MAINTENANCE (the OPTIMIZE/VACUUM posture): the
    // observation TVFs above tell an operator WHAT a table needs;
    // these two let the same SQL session ACT on it — maintain_table
    // runs the self-driving Maintain policy (fold deep deltas, compact
    // beyond a file-count threshold, reap past retention), reap_table
    // runs retention alone. Both execute DURING ANALYSIS like every
    // DDL statement, route through the EXACT scheduled-surface
    // machinery (PipelineConfig's registry builds the model from the
    // same knob names a config-table row uses; the run goes through a
    // real one-node Pipeline), and — with a ledger URL — land their
    // decisions in pd_step_history exactly like a scheduled run, so
    // "who compacted this table and why" has one answer regardless of
    // the surface that asked. Retention-consent refusals (stranded
    // feed consumers) propagate as errors — SQL gets the same loud
    // refusal the Scala surface gives.
    def runMaintenance(nodeType: String, args: Seq[Expression]):
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation = {
      require(args.nonEmpty && args.length <= 3,
        s"${nodeType.toLowerCase}_table(path [, 'k1=v1;k2=v2' " +
          "[, ledger_jdbc_url]])")
      val path = stringArg(args(0), s"$nodeType path")
      val opts: Map[String, String] =
        if (args.length < 2) Map.empty
        else stringArg(args(1), s"$nodeType options").split(";")
          .map(_.trim).filter(_.nonEmpty).map { kv =>
            val i = kv.indexOf('=')
            require(i > 0, s"$nodeType options must be k=v;k=v (got '$kv')")
            kv.substring(0, i).trim -> kv.substring(i + 1).trim
          }.toMap
      val ledger =
        if (args.length < 3) graft.core.Ledger.none
        else graft.core.Ledger.jdbc(graft.core.DatabaseSource(
          "sql_maintenance", stringArg(args(2), s"$nodeType ledger url")))
      val model = graft.core.PipelineConfig.registry(nodeType)(
        opts + ("path" -> path), new graft.core.SourceRegistry)
      val spark = org.apache.spark.sql.SparkSession.active
      val task = graft.core.Pipeline.withLedger(
        s"sql_${nodeType.toLowerCase}", ledger, model).run(spark)
      if (task.status != graft.core.Status.Done)
        throw task.error.getOrElse(new IllegalStateException(
          s"$nodeType on $path failed (${task.status})"))
      val t = task.totals
      val row = org.apache.spark.sql.Row(path, task.status,
        t.resultValue.map(java.lang.Long.valueOf).orNull,
        t.resultLong.orNull)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "path STRING, status STRING, actions BIGINT, decisions STRING")
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation
        .fromExternalRows(
          org.apache.spark.sql.catalyst.types.DataTypeUtils
            .toAttributes(schema), Seq(row))
    }
    ext.injectTableFunction((
      new FunctionIdentifier("maintain_table"),
      new ExpressionInfo("graft.models.MaintainModel", "maintain_table"),
      (args: Seq[Expression]) => runMaintenance("Maintain", args)))
    ext.injectTableFunction((
      new FunctionIdentifier("reap_table"),
      new ExpressionInfo("graft.models.ReapModel", "reap_table"),
      (args: Seq[Expression]) => runMaintenance("Reap", args)))
    // METADATA-ONLY partition-spec change from SQL (the CLI
    // respec-table verb's twin): one JSON publish, zero data moved —
    // Layout.changeManifestPartitionSpec's contract
    ext.injectTableFunction((
      new FunctionIdentifier("respec_table"),
      new ExpressionInfo("graft.operators.Layout", "respec_table"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "respec_table(path, 'col1,col2')")
        val path = stringArg(args(0), "respec_table path")
        val cols = stringArg(args(1), "respec_table partition cols")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val spark = org.apache.spark.sql.SparkSession.active
        graft.operators.Layout.changeManifestPartitionSpec(
          spark, path, cols)
        val row = org.apache.spark.sql.Row(path, cols,
          graft.operators.Layout.manifestVersion(spark, path)
            .map(Integer.valueOf).orNull)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "path STRING, partition_cols ARRAY<STRING>, version INT")
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          .fromExternalRows(
            org.apache.spark.sql.catalyst.types.DataTypeUtils
              .toAttributes(schema), Seq(row))
      }))
    // FULL-REWRITE layout change from SQL (the CLI repartition-table
    // verb's twin): one snapshot publish, deltas folded in. The 4-arg
    // form also changes the DATA-bucket layout in the same rewrite —
    // repartition_table(path, 'p1,p2', 'k', 16) buckets in place,
    // ('', 0) un-buckets — the in-place adoption path for co-located
    // joins on an existing table.
    ext.injectTableFunction((
      new FunctionIdentifier("repartition_table"),
      new ExpressionInfo("graft.operators.Layout", "repartition_table"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 4,
          "repartition_table(path, 'col1,col2'[, 'bucketCols', buckets])")
        val path = stringArg(args(0), "repartition_table path")
        val cols = stringArg(args(1), "repartition_table partition cols")
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val bCols =
          if (args.length < 4) None
          else Some(stringArg(args(2), "repartition_table bucket cols")
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        val bN =
          if (args.length < 4) None
          else Some(intArg(args(3), "repartition_table buckets"))
        val spark = org.apache.spark.sql.SparkSession.active
        val nParts = graft.operators.Layout.repartitionManifest(
          spark, path, cols, newBucketCols = bCols, newBuckets = bN)
        val row = org.apache.spark.sql.Row(path, cols, nParts)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "path STRING, partition_cols ARRAY<STRING>, partitions INT")
        org.apache.spark.sql.catalyst.plans.logical.LocalRelation
          .fromExternalRows(
            org.apache.spark.sql.catalyst.types.DataTypeUtils
              .toAttributes(schema), Seq(row))
      }))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(vec, vec)")
        CosineSimilarity(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(tokens)")
        SimHash64(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash_signature(shingles, numHashes, seed)")
        MinHashSignature(args(0), intArg(args(1), "numHashes"),
          longArg(args(2), "seed"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("hyperplane_sigs"),
      new ExpressionInfo(classOf[HyperplaneSignatures].getName, "hyperplane_sigs"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "hyperplane_sigs(vec, bits, tables, seed)")
        HyperplaneSignatures(args(0), intArg(args(1), "bits"),
          intArg(args(2), "tables"), longArg(args(3), "seed"))
      }))
    // the sketch aggregates: GROUP BY-able from SQL text like any
    // built-in aggregate (SELECT k, kmv_sketch(xxhash64(u), 1024) ...)
    ext.injectFunction((
      new FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_sketch(hash_long, k)")
        KmvSketchAgg(args(0), intArg(args(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kmv_merge"),
      new ExpressionInfo(classOf[KmvMergeAgg].getName, "kmv_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kmv_merge(sketch, k)")
        KmvMergeAgg(args(0), intArg(args(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_keys"),
      new ExpressionInfo(classOf[TopKeysAgg].getName, "top_keys"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "top_keys(key_string, capacity)")
        TopKeysAgg(args(0), intArg(args(1), "capacity"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kll_sketch(value_double, k)")
        KllSketchAgg(args(0), intArg(args(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_merge"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "kll_merge"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kll_merge(sketch, k)")
        KllMergeAgg(args(0), intArg(args(1), "k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("kll_quantile"),
      new ExpressionInfo(classOf[WeightedQuantile].getName, "kll_quantile"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "kll_quantile(sketch, q)")
        WeightedQuantile(args(0), doubleArg(args(1), "q"))
      }))
  }
}
