package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

import graft.operators.Layout

/** One SQL `ALTER TABLE` verb over a catalog-registered manifest
  * table, rewritten at the parser seam ([[ManifestSqlParser]] — the
  * analyzer refuses RENAME/DROP/ALTER COLUMN on v1 session-catalog
  * tables before any resolution rule runs, the `VERSION AS OF`
  * situation again):
  *
  *  - `ADD COLUMNS (c TYPE, …)`      → [[Layout.evolveManifest]]
  *  - `RENAME COLUMN a TO b`         → [[Layout.renameManifestColumn]]
  *  - `DROP COLUMN c [, …]`          → [[Layout.dropManifestColumn]]
  *  - `ALTER COLUMN c TYPE t`        → [[Layout.widenManifestColumn]]
  *
  * Every verb is METADATA-ONLY on the table itself (the Layout
  * machinery's evolve/rename/widen/drop contracts: alias chains, old
  * snapshots time-traveling under their own schema, haunted-name
  * refusals) — and this command ALSO moves the catalog registration to
  * the evolved shape (`alterTableDataSchema` + a relation-cache
  * refresh), so the "re-CREATE TABLE after evolution" remedy of plain
  * Scala-side evolution disappears: the next bare-name scan serves the
  * new schema with no choreography. Partition columns never evolve, so
  * the catalog's partition schema is untouched by construction.
  */
final case class ManifestAlterCommand(
    ident: TableIdentifier,
    path: String,
    verb: String, // "add" | "rename" | "drop" | "widen"
    addDdl: String = "",
    renameFrom: String = "",
    renameTo: String = "",
    dropCols: Seq[String] = Nil,
    dropIfExists: Boolean = false,
    widenCol: String = "",
    widenType: String = "") extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    verb match {
      case "add" => Layout.evolveManifest(session, path, addDdl)
      case "rename" =>
        val defer = session.conf
          .get("spark.graft.rename.deferRewrite", "false").toBoolean
        // single-spec precondition for the immediate-rewrite path: on a
        // mixed-spec table the rewrite below cannot retire the chain
        // (compactManifest skips frozen old-era generations), which
        // would leave the rename half-applied — alias published,
        // bare-name surface disabled, no rewrite able to finish it.
        // The check runs INSIDE renameManifestColumn's maintenance
        // lease (requireSingleSpec), atomic with the alias publish — a
        // concurrent changeManifestPartitionSpec between a caller-side
        // pre-check and the rename could otherwise publish that state.
        // NARROWED, not fully closed: a respec landing between the
        // rename's publish and clearManifestAliases below still fails
        // this statement AFTER the alias landed — but into the
        // RECOVERABLE deferred-alias state (clearManifestAliases
        // refuses loudly with the drain remedy; a scheduled Maintain
        // with clear_aliases + migrate_partitions converges it — the
        // exact lifecycle ManifestSpecEvolutionSpec pins), never the
        // wedge this guard exists for (alias published on a table no
        // rewrite can serve)
        Layout.renameManifestColumn(session, path, renameFrom, renameTo,
          requireSingleSpec = !defer)
        // the catalog's bare-name scans go through the planner index,
        // which refuses live alias chains (a file-level scan cannot
        // coalesce across names — no parquet field-ids, the Iceberg
        // answer, in this format). A SQL-surface rename therefore PAYS
        // THE REWRITE immediately by default: fold any pending deltas,
        // rewrite every live file under the new name, retire the chain
        // — so the very next bare-name statement serves. Stated
        // honestly: this is O(table) — on a 100 TB table that is an
        // accidental full rewrite hiding behind one DDL statement, so
        // `SET spark.graft.rename.deferRewrite=true` takes the Scala
        // surface's METADATA-ONLY path instead: the rename lands as an
        // alias chain (Layout.readManifest coalesces across names;
        // bare-name scans refuse with the remedy until maintenance),
        // and a scheduled/SQL `Maintain` with `clear_aliases=true`
        // pays the rewrite on the operator's schedule.
        //  `manifest_detail(...)` exposes the pending debt as
        // `renamed_cols`.
        if (!defer) {
          val vr = Layout.manifestVersion(session, path).get
          if (Layout.readManifestMeta(session, path, vr).deltas.nonEmpty)
            Layout.foldManifestDeltas(session, path)
          Layout.compactManifest(session, path, maxFiles = 0)
          Layout.clearManifestAliases(session, path)
        }
      case "drop" =>
        val v = Layout.manifestVersion(session, path).getOrElse(
          throw new IllegalStateException(
            s"$path stopped being a manifest table"))
        val have = Layout.readManifestMeta(session, path, v)
        val schema = Layout.manifestSchema(have).fieldNames.toSet
        dropCols.foreach { c =>
          if (schema.contains(c)) Layout.dropManifestColumn(session, path, c)
          else if (!dropIfExists) throw new IllegalArgumentException(
            s"DROP COLUMN $c: no such column in $path " +
              s"(${schema.mkString(", ")}) — add IF EXISTS to skip")
        }
      case "widen" =>
        Layout.widenManifestColumn(session, path, widenCol, widenType)
      case other => throw new IllegalStateException(
        s"unknown manifest ALTER verb '$other'")
    }
    // move the catalog registration to the evolved shape: the stored
    // schema is the source of truth, the catalog entry follows it
    val v = Layout.manifestVersion(session, path).getOrElse(
      throw new IllegalStateException(
        s"$path stopped being a manifest table"))
    val m = Layout.readManifestMeta(session, path, v)
    val full = Layout.manifestSchema(m)
    val dataSchema = StructType(
      full.fields.filterNot(f => m.partitionCols.contains(f.name)))
    val cat = session.sessionState.catalog
    // alterTable with the rebuilt full schema, NOT alterTableDataSchema:
    // the latter refuses renames/drops ("we don't support dropping
    // columns") — but here the MANIFEST is the source of truth and its
    // own machinery already validated the evolution; the catalog entry
    // just mirrors it (data columns first, partition columns after —
    // the CatalogTable layout)
    val old = cat.getTableMetadata(ident)
    cat.alterTable(old.copy(schema =
      StructType(dataSchema.fields ++ old.partitionSchema.fields)))
    // drop the cached LogicalRelation so the next bare-name scan
    // mounts a fresh index under the new schema
    cat.refreshTable(ident)
    Seq.empty
  }
}
