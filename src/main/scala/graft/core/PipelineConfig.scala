package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import graft.models._

/** Config-table-driven pipelines (pydin/core.py:1418-1504): a pipeline
  * hydrated from rows of (node_name, node_type, node_config-JSON,
  * node_seqno) — the reference's `pd_pipeline_config`/`pd_node_config`.
  * The reflection lookup (`getattr(pd, node_type)` — core.py:1442)
  * becomes an explicit registry map; node_config JSON becomes model
  * constructor arguments. Nodes chain in seqno order.
  */
object PipelineConfig {

  final case class NodeConfig(
      nodeName: String,
      nodeType: String,
      nodeSeqno: Int,
      config: Map[String, String])

  private val mapper = new ObjectMapper().registerModule(DefaultScalaModule)

  type Builder = (Map[String, String], SourceRegistry) => PdModel

  private def get(c: Map[String, String], k: String): String =
    c.getOrElse(k, throw new IllegalArgumentException(s"missing config key: $k"))

  private def knobsOf(c: Map[String, String]): ModelKnobs = ModelKnobs(
    dateField = c.get("date_field"),
    daysBack = c.get("days_back").map(_.toInt),
    hoursBack = c.get("hours_back").map(_.toInt),
    monthsBack = c.get("months_back").map(_.toInt),
    timezone = c.get("timezone").map(_.toInt),
    valueField = c.get("value_field"),
    keyField = c.get("key_field").map {
      case "run_id" => KeyField.RunId
      case "task_id" => KeyField.TaskId
      case "process_id" => KeyField.ProcessId
      case other => throw new IllegalArgumentException(s"unknown key field: $other")
    },
    chunkSize = c.get("chunk_size").map(_.toInt).getOrElse(1000),
    cleanup = c.get("cleanup").exists(_.toBoolean))

  /** node_type string -> model builder; mirrors the reference's exported
    * model names (pydin/__init__.py:3-22). */
  val registry: Map[String, Builder] = Map(
    "Table" -> ((c, src) => TableModel(src.database(get(c, "source_name")),
      get(c, "table_name"), c.get("schema_name"), c.get("db_link"),
      append = c.get("append").forall(_.toBoolean), knobs = knobsOf(c))),
    "Select" -> ((c, src) => SelectModel(src.database(get(c, "source_name")),
      text = c.get("text"), textPath = c.get("path"), knobs = knobsOf(c))),
    "Insert" -> ((c, src) => InsertModel(src.database(get(c, "source_name")),
      get(c, "table_name"), c.get("schema_name"),
      select = c.get("select"), selectPath = c.get("select_path"),
      knobs = knobsOf(c))),
    "SQL" -> ((c, src) => SqlModel(src.database(get(c, "source_name")),
      text = c.get("text"), textPath = c.get("path"), knobs = knobsOf(c))),
    "CSV" -> ((c, _) => CsvModel(get(c, "path"),
      head = c.get("head").forall(_.toBoolean),
      delimiter = c.getOrElse("delimiter", ";"),
      encoding = c.getOrElse("encoding", "UTF-8"),
      knobs = knobsOf(c))),
    "JSON" -> ((c, _) => JsonModel(get(c, "path"), knobs = knobsOf(c))),
    "XML" -> ((c, _) => XmlModel(get(c, "path"),
      rowTag = c.getOrElse("row_tag", "record"),
      rootTag = c.getOrElse("root_tag", "data"), knobs = knobsOf(c))),
    "Parquet" -> ((c, _) => ParquetModel(get(c, "path"),
      partitionBy = c.get("partition_by").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      append = c.get("append").exists(_.toBoolean),
      maxRecordsPerFile = c.get("max_records_per_file").map(_.toLong),
      knobs = knobsOf(c))),
    "Filenames" -> ((c, _) => FilenamesModel(get(c, "path"),
      mask = c.get("mask"),
      recursive = c.get("recursive").forall(_.toBoolean),
      createdFromExpr = c.get("created_from"),
      createdToExpr = c.get("created_to"))),
    "FileManager" -> ((c, _) => FileManagerModel(get(c, "path"),
      action = get(c, "action"),
      destinations = c.get("destination").toSeq,
      mask = c.get("mask"),
      zip = c.get("zip").exists(_.toBoolean),
      unzip = c.get("unzip").exists(_.toBoolean))),
    // table-maintenance action nodes (MaintenanceModels): a scheduled
    // config-driven job can MERGE a staged CDC batch or COMPACT a table
    // declaratively; list-valued keys are comma-separated
    "Merge" -> ((c, _) => MergeModel(get(c, "path"),
      updatesPath = get(c, "updates_path"),
      keys = get(c, "keys").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      versionCol = get(c, "version_col"),
      partitionCols = c.get("partition_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      deleteCol = c.get("delete_col"),
      manifest = c.get("manifest").exists(_.toBoolean),
      strategy = c.getOrElse("strategy", "cow"))),
    "FoldDeltas" -> ((c, _) => FoldDeltasModel(get(c, "path"),
      sortCols = c.get("sort_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))),
    "IvmSync" -> ((c, _) => IvmSyncModel(get(c, "path"),
      tablePath = get(c, "table_path"),
      keys = get(c, "keys").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      sumCols = get(c, "sum_cols").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq,
      kmvCols = c.get("kmv_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      kllCols = c.get("kll_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      sketchK = c.get("sketch_k").map(_.toInt).getOrElse(4096),
      consumer = c.get("consumer"),
      appendOnly = c.get("append_only").exists(_.toBoolean))),
    "Maintain" -> ((c, _) => MaintainModel(get(c, "path"),
      maxPendingDeltas = c.get("max_pending_deltas").map(_.toInt)
        .getOrElse(3),
      maxFilesPerPartition = c.get("max_files_per_partition")
        .map(_.toInt).getOrElse(0),
      keepVersions = c.get("keep_versions").map(_.toInt).getOrElse(0),
      sortCols = c.get("sort_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      zorderCols = c.get("zorder_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      ignoreConsumers = c.get("ignore_consumers").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet,
      keepAgeMs = (c.get("keep_age_hours").map(_.toDouble).getOrElse(0.0)
        * 3600000L).toLong,
      clearAliases = c.get("clear_aliases").exists(_.toBoolean),
      migratePartitions = c.get("migrate_partitions").map(_.toInt)
        .getOrElse(0))),
    "Reap" -> ((c, _) => ReapModel(get(c, "path"),
      keepVersions = c.get("keep_versions").map(_.toInt).getOrElse(1),
      generational = c.get("generational").exists(_.toBoolean),
      ignoreConsumers = c.get("ignore_consumers").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet,
      keepAgeMs = (c.get("keep_age_hours").map(_.toDouble).getOrElse(0.0)
        * 3600000L).toLong)),
    "Manifest" -> ((c, _) => ManifestModel(get(c, "path"),
      version = c.get("version").map(_.toInt),
      // "col:lo..hi;col2:lo..hi" — first ':' splits the column (bounds
      // may contain ':' in timestamps), '..' splits the window
      ranges = c.get("ranges").toSeq.flatMap(_.split(";"))
        .map(_.trim).filter(_.nonEmpty).map { s =>
          val Array(col, w) = s.split(":", 2)
          val b = w.split("\\.\\.", 2)
          require(b.length == 2,
            s"Manifest ranges entry '$s' must be col:lo..hi")
          (col.trim, b(0).trim, b(1).trim)
        },
      // "col:value;col2:value2"
      eqs = c.get("eqs").toSeq.flatMap(_.split(";"))
        .map(_.trim).filter(_.nonEmpty).map { s =>
          val Array(col, v) = s.split(":", 2)
          (col.trim, v.trim)
        },
      planner = c.get("planner").exists(_.toBoolean),
      knobs = knobsOf(c))),
    "ManifestFeed" -> ((c, _) => ManifestFeedModel(get(c, "path"),
      consumer = get(c, "consumer"),
      mode = c.get("mode").getOrElse("changes"), knobs = knobsOf(c))),
    "Compact" -> ((c, _) => CompactModel(get(c, "path"),
      partitionCols = c.get("partition_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      generational = c.get("generational").exists(_.toBoolean),
      manifest = c.get("manifest").exists(_.toBoolean),
      maxFiles = c.get("max_files").map(_.toInt).getOrElse(4),
      sortCols = c.get("sort_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      zorderCols = c.get("zorder_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      zorderBits = c.get("zorder_bits").map(_.toInt).getOrElse(8))),
    "Repartition" -> ((c, _) => RepartitionModel(get(c, "path"),
      partitionCols = get(c, "partition_cols").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq,
      sortCols = c.get("sort_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      // new_bucket_cols '' + new_buckets 0 un-buckets; both absent
      // keeps the current layout
      newBucketCols = c.get("new_bucket_cols").map(
        _.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
      newBuckets = c.get("new_buckets").map(_.toInt))),
    "Zorder" -> ((c, _) => ZorderModel(get(c, "path"),
      zCols = get(c, "z_cols").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq,
      bits = c.get("bits").map(_.toInt).getOrElse(8),
      numFiles = c.get("num_files").map(_.toInt).getOrElse(0))),
    "SortedWrite" -> ((c, _) => SortedWriteModel(get(c, "path"),
      sortCols = get(c, "sort_cols").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq,
      numFiles = c.get("num_files").map(_.toInt).getOrElse(0))),
    "IvmApply" -> ((c, _) => IvmApplyModel(get(c, "path"),
      deltaPath = get(c, "delta_path"),
      keys = get(c, "keys").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      sumCols = get(c, "sum_cols").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq,
      batchId = c.get("batch_id"),
      weightCol = c.get("weight_col"),
      kmvCols = c.get("kmv_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      kllCols = c.get("kll_cols").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty),
      sketchK = c.get("sketch_k").map(_.toInt).getOrElse(4096))))

  def buildNode(nc: NodeConfig, sources: SourceRegistry): PdModel =
    registry.getOrElse(nc.nodeType,
      throw new IllegalArgumentException(s"unknown node type: ${nc.nodeType}"))
      .apply(nc.config, sources)

  /** Hydrate a pipeline from node-config rows (seqno order = chain order,
    * matching the reference's linear add — core.py:1452-1461). */
  def build(name: String, nodes: Seq[NodeConfig],
            sources: SourceRegistry, ledger: Ledger = Ledger.none): Pipeline = {
    val items = nodes.sortBy(_.nodeSeqno)
      .map(nc => One(buildNode(nc, sources)): PipeItem)
    new Pipeline(name, items, ledger)
  }

  /** Parse a JSON array of node configs:
    * `[{"node_name":..,"node_type":..,"node_seqno":1,"config":{...}}]`.
    */
  def parseJson(json: String): Seq[NodeConfig] = {
    val parsed = mapper.readValue(json, classOf[Seq[Map[String, Any]]])
    parsed.map { m =>
      NodeConfig(
        nodeName = m.getOrElse("node_name", "").toString,
        nodeType = m.getOrElse("node_type",
          throw new IllegalArgumentException("node_type required")).toString,
        nodeSeqno = m.get("node_seqno").map(_.toString.toInt).getOrElse(0),
        config = m.getOrElse("config", Map.empty[String, Any])
          .asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> String.valueOf(v) })
    }
  }

  def fromJson(name: String, json: String, sources: SourceRegistry,
               ledger: Ledger = Ledger.none): Pipeline =
    build(name, parseJson(json), sources, ledger)
}
