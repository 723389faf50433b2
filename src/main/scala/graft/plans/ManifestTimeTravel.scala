package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation, UnresolvedTable}
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.{AddColumns, AlterColumns, DropColumns, LogicalPlan, RenameColumn, SubqueryAlias, TruncateTable}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** SQL time travel AND schema evolution for catalog-registered
  * manifest tables:
  *
  * {{{
  *   SELECT * FROM orders VERSION AS OF 3
  *   SELECT * FROM orders TIMESTAMP AS OF '2026-08-16 12:00:00'
  *   ALTER TABLE orders ADD COLUMNS (note STRING)
  *   ALTER TABLE orders RENAME COLUMN qty TO quantity
  *   ALTER TABLE orders ALTER COLUMN quantity TYPE BIGINT
  *   ALTER TABLE orders DROP COLUMN note
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
  * `versionAsOf`/`timestampAsOf` view options give, now by bare table
  * name (timestamps resolve through [[graft.operators.Layout
  * .versionAtTimestamp]]). The same seam rewrites the four ALTER
  * TABLE evolution verbs onto [[ManifestAlterCommand]] and refuses
  * TRUNCATE. Anything over a non-manifest identifier — other
  * providers, temp views, non-foldable timestamps — passes through to
  * the analyzer's own handling and error messages.
  */
final class ManifestSqlParser(session: SparkSession,
                              delegate: ParserInterface)
    extends ParserInterface {

  private def rewrite(plan: LogicalPlan): LogicalPlan = plan.transform {
    case tt @ RelationTimeTravel(u: UnresolvedRelation, None, Some(v))
        if v.nonEmpty && v.forall(_.isDigit) =>
      manifestMount(u.multipartIdentifier).map { case (ident, p, props) =>
        pinnedRelation(ident, p, props, v.toInt)
      }.getOrElse(tt)
    // TIMESTAMP AS OF <foldable ts>: resolve to the newest retained
    // version published at or before the instant, then pin exactly
    // like VERSION AS OF. A too-early timestamp fails HERE with the
    // earliest retained stamp named (Layout.versionAtTimestamp) —
    // passing it through would only reach Spark's generic
    // TIME_TRAVEL-unsupported error. Non-foldable expressions
    // (current_timestamp(), subqueries) do pass through to that error.
    case tt @ RelationTimeTravel(u: UnresolvedRelation, Some(ts), None) =>
      (manifestMount(u.multipartIdentifier), tsMillis(ts)) match {
        case (Some((ident, p, props)), Some(ms)) =>
          pinnedRelation(ident, p, props,
            graft.operators.Layout.versionAtTimestamp(session, p, ms))
        case _ => tt
      }

    // SQL schema evolution on catalog-registered manifest tables —
    // ALTER TABLE … ADD COLUMNS / RENAME COLUMN / DROP COLUMN /
    // ALTER COLUMN TYPE. Same seam as time travel, same reason: the
    // analyzer's ResolveSessionCatalog hard-refuses RENAME/DROP/ALTER
    // COLUMN on v1 session-catalog tables (and would route ADD COLUMNS
    // to a catalog-only schema edit that corrupts the manifest
    // contract) before any injected rule runs. Each verb rewrites to
    // [[ManifestAlterCommand]]: the Layout evolution machinery plus a
    // catalog-schema move, so the next bare-name scan serves the new
    // shape. Non-manifest tables pass through untouched.
    case a @ AddColumns(u: UnresolvedTable, cols) =>
      manifestMount(u.multipartIdentifier).map { case (ident, p, _) =>
        val ddl = cols.map { c =>
          require(c.path.isEmpty,
            s"ALTER TABLE ADD COLUMNS on a manifest table supports " +
              s"only top-level columns (got ${(c.path.get.name :+
                c.colName).mkString(".")})")
          require(c.position.isEmpty,
            "ALTER TABLE ADD COLUMNS on a manifest table appends at " +
              "the end — FIRST/AFTER positions would reorder the " +
              "stored column order that every generation shares")
          require(c.default.isEmpty,
            "ALTER TABLE ADD COLUMNS on a manifest table does not " +
              "support DEFAULT: existing rows null-fill (a keyed " +
              "merge has no column defaults)")
          require(c.nullable,
            s"ALTER TABLE ADD COLUMNS: new column ${c.colName} must " +
              "be nullable — existing generations null-fill it")
          s"${c.colName} ${c.dataType.sql}"
        }.mkString(", ")
        ManifestAlterCommand(ident, p, "add", addDdl = ddl): LogicalPlan
      }.getOrElse(a)
    case r @ RenameColumn(u: UnresolvedTable, col, newName) =>
      manifestMount(u.multipartIdentifier).map { case (ident, p, _) =>
        require(col.name.length == 1,
          s"RENAME COLUMN on a manifest table supports only top-level " +
            s"columns (got ${col.name.mkString(".")})")
        ManifestAlterCommand(ident, p, "rename",
          renameFrom = col.name.head, renameTo = newName): LogicalPlan
      }.getOrElse(r)
    case d @ DropColumns(u: UnresolvedTable, cols, ifExists) =>
      manifestMount(u.multipartIdentifier).map { case (ident, p, _) =>
        val names = cols.map { c =>
          require(c.name.length == 1,
            s"DROP COLUMN on a manifest table supports only top-level " +
              s"columns (got ${c.name.mkString(".")})")
          c.name.head
        }
        ManifestAlterCommand(ident, p, "drop", dropCols = names,
          dropIfExists = ifExists): LogicalPlan
      }.getOrElse(d)
    // TRUNCATE TABLE on an EXTERNAL datasource table deletes the files
    // under its location — on a manifest table that would rip data out
    // from under retained versions and feed cursors, bypassing every
    // contract. Refuse with the remedies BEFORE Spark's v1 command can
    // touch a byte. (DROP TABLE is safe: external registrations drop
    // only the catalog entry.)
    case t @ TruncateTable(u: UnresolvedTable) =>
      manifestMount(u.multipartIdentifier).foreach { case (_, p, _) =>
        throw new IllegalArgumentException(
          s"TRUNCATE TABLE on manifest table $p would delete data " +
            "files that retained versions and feed cursors still " +
            "reference — DELETE FROM <table> to tombstone every row " +
            "(history intact), or reap + remove the directory " +
            "explicitly to destroy the table")
      }
      t
    // `PARTITIONED BY` at SQL DDL over `USING manifest`:
    //  - CTAS: Spark's v1 CreatableRelationProvider API cannot carry
    //    the clause to the provider, so without this seam it is
    //    silently DROPPED (the seed then refuses for want of the
    //    partitionCols OPTION — or, with both stated, the OPTION wins
    //    while the clause reads differently). Map the clause onto the
    //    provider's partitionCols OPTION; refuse a disagreeing
    //    clause/option pair and non-identity transforms.
    //  - CREATE TABLE (registration over an existing table): Spark's
    //    own user-schema check catches most wrong clauses via its
    //    partition-cols-last reordering, but accepts a TRAILING SUBSET
    //    (PARTITIONED BY (b) on a table partitioned by (a, b)) and
    //    would record the wrong layout in the catalog — validate the
    //    clause against the table's LIVE spec, loudly.
    case cta: org.apache.spark.sql.catalyst.plans.logical.CreateTableAsSelect
        if manifestTableSpec(cta.tableSpec).isDefined &&
          cta.partitioning.nonEmpty =>
      val ts = manifestTableSpec(cta.tableSpec).get
      val (bucket, partTs) = splitBucketClause(cta.partitioning,
        "CREATE TABLE ... AS SELECT")
      val cols = identityPartitionCols(partTs, "CREATE TABLE ... AS SELECT")
      val declared = specOption(ts, "partitionCols")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      require(cols.isEmpty || declared.forall(_ == cols),
        s"CREATE TABLE ... USING manifest: PARTITIONED BY " +
          s"(${cols.mkString(", ")}) disagrees with OPTIONS " +
          s"(partitionCols '${declared.getOrElse(Nil).mkString(",")}') — " +
          "state the layout once (the clause alone is enough)")
      // CLUSTERED BY ... INTO n BUCKETS → the provider's
      // bucketBy/buckets OPTIONS (the data-bucket layout), same
      // state-it-once discipline
      val declaredB = specOption(ts, "bucketBy")
        .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
      val declaredN = specOption(ts, "buckets").map(_.trim.toInt)
      bucket.foreach { case (n, bcols) =>
        require(declaredB.forall(_ == bcols) && declaredN.forall(_ == n),
          s"CREATE TABLE ... USING manifest: CLUSTERED BY " +
            s"(${bcols.mkString(", ")}) INTO $n BUCKETS disagrees with " +
            s"OPTIONS (bucketBy '${declaredB.getOrElse(Nil).mkString(",")}'" +
            s", buckets '${declaredN.getOrElse(0)}') — state the layout " +
            "once (the clause alone is enough)")
      }
      val lit = (s: String) =>
        org.apache.spark.sql.catalyst.expressions.Literal(s)
      val added =
        (if (declared.isEmpty && cols.nonEmpty)
           Seq("partitionCols" -> lit(cols.mkString(",")))
         else Nil) ++
        bucket.toSeq.flatMap { case (n, bcols) =>
          // fill in whichever half of the OPTIONS pair is missing
          // independently: a clause plus a half-declared pair is
          // self-consistent DDL (the agreement require above already
          // held), and injecting only the absent keys never duplicates
          // an OptionList entry
          (if (declaredB.isEmpty)
             Seq("bucketBy" -> lit(bcols.mkString(","))) else Nil) ++
          (if (declaredN.isEmpty)
             Seq("buckets" -> lit(n.toString)) else Nil)
        }
      if (added.isEmpty) cta
      else cta.copy(tableSpec = ts.copy(optionExpression =
        org.apache.spark.sql.catalyst.plans.logical.OptionList(
          ts.optionExpression.options ++ added)))
    case ct: org.apache.spark.sql.catalyst.plans.logical.CreateTable
        if manifestTableSpec(ct.tableSpec).isDefined &&
          ct.partitioning.nonEmpty =>
      val ts = manifestTableSpec(ct.tableSpec).get
      val (bucket, partTs) = splitBucketClause(ct.partitioning,
        "CREATE TABLE")
      val cols = identityPartitionCols(partTs, "CREATE TABLE")
      specOption(ts, "path").orElse(ts.location).foreach { p =>
        graft.operators.Layout.manifestVersion(session, p).foreach { v =>
          val meta = graft.operators.Layout.readManifestMeta(session, p, v)
          require(cols.isEmpty || cols == meta.partitionCols,
            s"CREATE TABLE ... USING manifest PARTITIONED BY " +
              s"(${cols.mkString(", ")}): $p is partitioned by " +
              s"(${meta.partitionCols.mkString(", ")}) — a registration " +
              "cannot change an existing table's layout (that is " +
              "repartition_manifest / migrate_partitions maintenance)")
          bucket.foreach { case (n, bcols) =>
            require(bcols == meta.dataBucketCols && n == meta.dataBuckets,
              s"CREATE TABLE ... USING manifest CLUSTERED BY " +
                s"(${bcols.mkString(", ")}) INTO $n BUCKETS: $p is " +
                (if (meta.dataBuckets == 0) "not data-bucketed"
                 else s"bucketed by (${meta.dataBucketCols.mkString(", ")}" +
                   s") into ${meta.dataBuckets} buckets") +
                " — a registration cannot change an existing table's " +
                "bucket layout (fixed at seed)")
          }
        }
      }
      ct
    case ac @ AlterColumns(u: UnresolvedTable, specs) =>
      manifestMount(u.multipartIdentifier) match {
        case Some((ident, p, _)) =>
          require(specs.length == 1,
            "ALTER COLUMN on a manifest table takes one column at a time")
          val s0 = specs.head
          require(s0.column.name.length == 1,
            s"ALTER COLUMN on a manifest table supports only top-level " +
              s"columns (got ${s0.column.name.mkString(".")})")
          require(s0.newDataType.nonEmpty && s0.newNullability.isEmpty &&
              s0.newComment.isEmpty && s0.newPosition.isEmpty &&
              s0.newDefaultExpression.isEmpty && !s0.dropDefault,
            "ALTER COLUMN on a manifest table supports only TYPE " +
              "changes (lossless widenings — widenManifestColumn's " +
              "contract); nullability/comment/position/default edits " +
              "have no manifest meaning")
          ManifestAlterCommand(ident, p, "widen",
            widenCol = s0.column.name.head,
            widenType = s0.newDataType.get.sql): LogicalPlan
        case None => ac
      }
  }

  /** The DDL's table spec, iff it declares `USING manifest`. */
  private def manifestTableSpec(
      ts: org.apache.spark.sql.catalyst.plans.logical.TableSpecBase):
      Option[org.apache.spark.sql.catalyst.plans.logical
        .UnresolvedTableSpec] = ts match {
    case u: org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec
        if u.provider.exists(_.equalsIgnoreCase("manifest")) => Some(u)
    case _ => None
  }

  /** A foldable string OPTION off the parsed spec (OPTIONS values are
    * literals; anything non-foldable is not ours to interpret). */
  private def specOption(
      ts: org.apache.spark.sql.catalyst.plans.logical.UnresolvedTableSpec,
      key: String): Option[String] =
    ts.optionExpression.options.collectFirst {
      case (k, e) if k.equalsIgnoreCase(key) && e.foldable =>
        String.valueOf(e.eval(null))
    }

  /** Plain column names out of a `PARTITIONED BY` clause; transform
    * shapes (days/hours/...) have no manifest meaning and refuse.
    * Bucket transforms never reach here — [[splitBucketClause]] peels
    * them off first. */
  private def identityPartitionCols(
      parts: Seq[org.apache.spark.sql.connector.expressions.Transform],
      stmt: String): Seq[String] =
    parts.map {
      case t if t.name == "identity" && t.references.length == 1 &&
          t.references.head.fieldNames.length == 1 =>
        t.references.head.fieldNames.head
      case other => throw new IllegalArgumentException(
        s"$stmt ... USING manifest supports only plain top-level " +
          s"columns in PARTITIONED BY (got '$other'): manifest " +
          "partitioning is by stored column values, not transforms")
    }

  /** Peel `CLUSTERED BY (cols) [SORTED BY ...] INTO n BUCKETS` out of
    * the DDL's transform list (Spark's unified plan carries it
    * alongside the identity partition transforms): the manifest's
    * DATA-bucket layout, mapped onto the provider's bucketBy/buckets
    * OPTIONS. `SORTED BY` refuses — bucket files are per PARTITION
    * DIRECTORY, so a table-wide sorted-bucket claim would be unsound
    * (Spark's own fast path requires one file per bucket table-wide,
    * which a partitioned manifest never has). */
  private def splitBucketClause(
      parts: Seq[org.apache.spark.sql.connector.expressions.Transform],
      stmt: String): (Option[(Int, Seq[String])],
        Seq[org.apache.spark.sql.connector.expressions.Transform]) = {
    // BucketTransform is private[sql]; its extractor is exposed via
    // the access bridge (matches both bucket and sorted_bucket shapes)
    val unbucket =
      org.apache.spark.sql.graftbridge.GraftSqlBridge.bucketTransform _
    val (b, rest) = parts.partition(unbucket(_).isDefined)
    val spec = b.map(unbucket(_).get).map { case (n, cols, sorted) =>
      require(sorted.isEmpty,
        s"$stmt ... USING manifest: SORTED BY has no manifest " +
          "meaning — bucket files are per partition directory, so a " +
          "table-wide sorted-bucket claim would be unsound; drop the " +
          "clause (sorted compaction is maintain_table's job)")
      val names = cols.map { c =>
        require(c.length == 1,
          s"$stmt ... USING manifest: CLUSTERED BY supports only " +
            s"top-level columns (got ${c.mkString(".")})")
        c.head
      }
      (n, names)
    }
    (spec.headOption, rest)
  }

  /** Evaluate a parsed `TIMESTAMP AS OF` expression to epoch millis —
    * defined only for foldable expressions castable to timestamp under
    * the SESSION time zone (string/timestamp/date literals and
    * arithmetic over them). */
  private def tsMillis(e: org.apache.spark.sql.catalyst.expressions
      .Expression): Option[Long] =
    try {
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types.TimestampType
      if (!e.resolved) return None
      val cast = Cast(e, TimestampType,
        Some(session.sessionState.conf.sessionLocalTimeZone))
      if (!cast.foldable) None
      else Option(cast.eval(null)).map(_.asInstanceOf[Long] / 1000L)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** (identifier, table path, storage properties), iff `parts` names a
    * session-catalog table whose provider is `manifest`; None leaves
    * the node untouched. */
  private def manifestMount(parts: Seq[String]):
      Option[(TableIdentifier, String, Map[String, String])] = {
    val ident = parts match {
      case Seq(t) => TableIdentifier(t)
      case Seq(db, t) => TableIdentifier(t, Some(db))
      case _ => return None
    }
    val cat = session.sessionState.catalog
    // a temp view (or global temp view) SHADOWS the catalog table of
    // the same name — tableExists/getTableMetadata ignore temp views,
    // so without this guard a bare name would silently read the
    // physical table instead of the shadowing view
    if (cat.isTempView(parts)) return None
    val meta =
      try {
        if (!cat.tableExists(ident)) return None
        cat.getTableMetadata(ident)
      } catch { case scala.util.control.NonFatal(_) => return None }
    if (!meta.provider.exists(_.equalsIgnoreCase("manifest"))) return None
    meta.storage.properties.collectFirst {
      case (k, p) if k.equalsIgnoreCase("path") => p
    }.orElse(meta.storage.locationUri
      .map(u => new org.apache.hadoop.fs.Path(u).toString))
      .map(p => (ident, p, meta.storage.properties))
  }

  private def pinnedRelation(ident: TableIdentifier, path: String,
                             props: Map[String, String],
                             ver: Int): LogicalPlan =
    SubqueryAlias(ident.table, eraRelations(path, props, ver))

  /** The snapshot `ver` as a LogicalPlan: ONE planner-index relation
    * when every generation is under the version's current partition
    * spec (the overwhelmingly common case — plan unchanged), or a
    * UNION of one spec-mounted relation per era after a METADATA-ONLY
    * [[graft.operators.Layout.changeManifestPartitionSpec]] — each
    * branch prunes its own spec's partition predicates exactly, and a
    * per-branch Project aligns every era to the STORED column order so
    * the union is positional-exact. */
  private def eraRelations(path: String, props: Map[String, String],
                           ver: Int): LogicalPlan = {
    val m = graft.operators.Layout.readManifestMeta(session, path, ver)
    val eras = m.liveSpecs
    def branch(spec: Option[Seq[String]]): LogicalPlan = {
      val idx = new ManifestFileIndex(session, path, Some(ver), spec)
      val rel = HadoopFsRelation(idx, idx.partitionSchema, idx.dataSchema,
        idx.dataBucketSpec, new ParquetFileFormat, props)(session)
      val lr = LogicalRelation(rel)
      if (spec.isEmpty) lr
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        idx.fullSchema.fieldNames.toSeq.map(n =>
          lr.output.find(_.name == n).get), lr)
    }
    if (eras.size <= 1) branch(None)
    else org.apache.spark.sql.catalyst.plans.logical.Union(
      eras.map(spec => branch(Some(spec))))
  }

  /** Bare-name reads of MIXED-SPEC manifest tables: the v1 catalog
    * resolution path builds ONE HadoopFsRelation, which can only serve
    * one partition spec — so after a metadata-only spec change a bare
    * SELECT would refuse at index construction. This pass substitutes
    * the per-era UNION ([[eraRelations]]) for plain reads — including
    * reads inside EXPRESSION SUBQUERIES (scalar/EXISTS/IN), whose
    * plans hang off expressions rather than children — pinned to the
    * resolution-time version (each statement re-resolves, so reads
    * stay current). DML TARGETS are deliberately left untouched: the
    * merge machinery routes by path through its own rules, and a
    * UNION target would break them — targets resolve through
    * [[MixedSpecManifestRelation]] and route into the same DML
    * commands. Single-spec tables never reach the substitution —
    * the mount check reads the manifest root only for `USING manifest`
    * catalog tables. */
  private def rewriteMixed(plan: LogicalPlan): LogicalPlan =
    rewriteMixed(plan, Set.empty)

  /** `bound` carries the CTE names in scope (lower-cased): a CTE
    * shadows any catalog table of the same name for the plans that can
    * see it, so a bound bare name must never be substituted. Each CTE
    * definition sees the names declared BEFORE it (Spark's sequential
    * CTE scope, plus its own name under RECURSIVE); the main body sees
    * them all. Temp views are handled in [[manifestMount]]. */
  private def rewriteMixed(plan: LogicalPlan,
                           bound: Set[String]): LogicalPlan = plan match {
    case i: org.apache.spark.sql.catalyst.plans.logical.InsertIntoStatement =>
      i.copy(query = rewriteMixed(i.query, bound))
    case u: org.apache.spark.sql.catalyst.plans.logical.UpdateTable => u
    case d: org.apache.spark.sql.catalyst.plans.logical.DeleteFromTable => d
    case mg: org.apache.spark.sql.catalyst.plans.logical.MergeIntoTable =>
      mg.copy(sourceTable = rewriteMixed(mg.sourceTable, bound))
    case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
      var inScope = bound
      val ctes = w.cteRelations.map { case (name, alias, maxRec) =>
        val defScope =
          if (w.allowRecursion) inScope + name.toLowerCase else inScope
        val rewritten = alias.copy(
          child = rewriteMixed(alias.child, defScope))
        inScope += name.toLowerCase
        (name, rewritten, maxRec)
      }
      w.copy(child = rewriteMixed(w.child, inScope), cteRelations = ctes)
    case u: UnresolvedRelation
        if u.multipartIdentifier.size == 1 &&
          bound.contains(u.multipartIdentifier.head.toLowerCase) =>
      u // shadowed by an enclosing CTE — leave for normal resolution
    case u: UnresolvedRelation =>
      manifestMount(u.multipartIdentifier).flatMap {
        case (ident, p, props) =>
          graft.operators.Layout.manifestVersion(session, p).flatMap { v =>
            val m = graft.operators.Layout.readManifestMeta(session, p, v)
            if (m.liveSpecs.size <= 1) None
            else Some(SubqueryAlias(ident.table,
              eraRelations(p, props, v)): LogicalPlan)
          }
      }.getOrElse(u)
    // subqueries INSIDE expressions (scalar subqueries, EXISTS, IN
    // (SELECT …)) carry their own plans — without this hop a mixed
    // table read inside one falls to the MixedSpecManifestRelation
    // RDD fallback (correct, but off codegen); with it, every read
    // position serves the native per-era union. DML targets stay
    // untouched above (their own cases return before reaching here).
    case other => other.mapChildren(rewriteMixed(_, bound))
      .transformExpressions {
        case se: org.apache.spark.sql.catalyst.expressions
            .SubqueryExpression =>
          se.withNewPlan(rewriteMixed(se.plan, bound))
      }
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    rewriteMixed(rewrite(delegate.parsePlan(sqlText)))

  override def parsePlanWithParameters(sqlText: String,
                                       ctx: ParameterContext): LogicalPlan =
    rewriteMixed(rewrite(delegate.parsePlanWithParameters(sqlText, ctx)))

  override def parseQuery(sqlText: String): LogicalPlan =
    rewriteMixed(rewrite(delegate.parseQuery(sqlText)))

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
