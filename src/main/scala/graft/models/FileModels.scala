package graft.models

import java.time.format.DateTimeFormatter

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.types.StructType

import graft.core._

/** File-endpoint base (pydin/models.py:1191-1250): path resolution with
  * date patterns, existence/empty checks, cleanup purge. Reference file
  * names take strftime patterns (models.py:1207); here the equivalent
  * `%Y-%m-%d`-style tokens are rendered from the step's calendar date.
  *
  * Distributed-writer note: single-file sinks become directories of part
  * files (SURVEY.md §7.4.2); `coalesce1` gives the strict one-file layout
  * when required.
  */
abstract class FileModel extends PdModel {
  def path: String
  def coalesce1: Boolean = false

  private val strftimeMap = Seq(
    "%Y" -> "yyyy", "%m" -> "MM", "%d" -> "dd",
    "%H" -> "HH", "%M" -> "mm", "%S" -> "ss")

  /** Render `%Y/%m/%d`-style tokens against the step calendar and `{var}`
    * templates against the context. */
  def resolvedPath(ctx: StepContext): String = {
    var p = ctx.render(path)
    if (p.contains('%')) {
      val d = knobs.targetDate(ctx.calendar).start
      strftimeMap.foreach { case (tok, fmt) =>
        if (p.contains(tok))
          p = p.replace(tok, d.format(DateTimeFormatter.ofPattern(fmt)))
      }
    }
    p
  }

  protected def fs(ctx: StepContext, p: String): FileSystem =
    new Path(p).getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)

  def exists(ctx: StepContext): Boolean = {
    val p = resolvedPath(ctx)
    fs(ctx, p).exists(new Path(p))
  }

  def delete(ctx: StepContext): Unit = {
    val p = resolvedPath(ctx)
    val f = fs(ctx, p)
    if (f.exists(new Path(p))) f.delete(new Path(p), true)
  }

  protected def maybeCoalesce(df: DataFrame): DataFrame =
    if (coalesce1) df.coalesce(1) else df

  protected def writeStats(ctx: StepContext, p: String): (Long, Long) = {
    val f = fs(ctx, p)
    val it = f.listFiles(new Path(p), true)
    var files = 0L; var bytes = 0L
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && !s.getPath.getName.startsWith("_")) {
        files += 1; bytes += s.getLen
      }
    }
    (files, bytes)
  }
}

/** CSV source + sink (models.py:1253-1376). Dialect knobs map to Spark
  * reader/writer options: delimiter→sep, terminator→lineSep,
  * enclosure→quote/quoteAll, trim→ignoreLeading/TrailingWhiteSpace,
  * head→header, columns→explicit schema or positional names.
  * `stringType=true` reproduces the reference's all-strings typing
  * (csv.DictReader — models.py:1355); inferSchema is the Spark-native
  * upgrade.
  */
final case class CsvModel(
    path: String,
    head: Boolean = true,
    columns: Seq[String] = Nil,
    schema: Option[StructType] = None,
    delimiter: String = ";",
    terminator: Option[String] = None,
    enclosure: Option[String] = Some("\""),
    trim: Boolean = false,
    encoding: String = "UTF-8",
    stringType: Boolean = false,
    append: Boolean = false,
    override val coalesce1: Boolean = false,
    override val knobs: ModelKnobs = ModelKnobs())
  extends FileModel with Extractable with Loadable {

  private def commonOpts: Map[String, String] =
    Map("sep" -> delimiter, "encoding" -> encoding,
      "quote" -> enclosure.getOrElse("\u0000")) ++
      terminator.map("lineSep" -> _)

  protected def read(ctx: StepContext): DataFrame = {
    var r = ctx.spark.read.options(commonOpts)
      .option("header", head)
      .option("ignoreLeadingWhiteSpace", trim)
      .option("ignoreTrailingWhiteSpace", trim)
    schema.foreach(s => r = r.schema(s))
    if (schema.isEmpty && !stringType) r = r.option("inferSchema", true)
    var df = r.csv(resolvedPath(ctx))
    if (columns.nonEmpty) df = df.toDF(columns: _*)
    df
  }

  protected def write(ctx: StepContext, df: DataFrame): LoadResult = {
    val p = resolvedPath(ctx)
    maybeCoalesce(df).write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .options(commonOpts)
      .option("header", head)
      .option("quoteAll", enclosure.isDefined)
      .csv(p)
    val (files, bytes) = writeStats(ctx, p)
    LoadResult(-1L, bytes, files) // rows filled by the step's metrics listener
  }

  override def clean(ctx: StepContext): Unit = delete(ctx)
}

/** JSON source + sink (models.py:1379-1411). The reference holds ONE file
  * with a top-level array; `multiline=true` reads that layout. Writes are
  * JSON-lines part files (the distributed-native layout — the reference's
  * read-modify-write append has no distributed analogue, SURVEY.md §7.4.2).
  */
final case class JsonModel(
    path: String,
    multiline: Boolean = true,
    encoding: String = "UTF-8",
    append: Boolean = false,
    override val coalesce1: Boolean = false,
    override val knobs: ModelKnobs = ModelKnobs())
  extends FileModel with Extractable with Loadable {

  protected def read(ctx: StepContext): DataFrame =
    ctx.spark.read
      .option("multiLine", multiline)
      .option("encoding", encoding)
      .json(resolvedPath(ctx))

  protected def write(ctx: StepContext, df: DataFrame): LoadResult = {
    val p = resolvedPath(ctx)
    maybeCoalesce(df).write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .json(p)
    val (files, bytes) = writeStats(ctx, p)
    LoadResult(-1L, bytes, files)
  }

  override def clean(ctx: StepContext): Unit = delete(ctx)
}

/** XML source + sink over Spark 4's built-in xml format
  * (models.py:1414-1456: root element, one child per record, one
  * sub-element per field — exactly rowTag/rootTag).
  */
final case class XmlModel(
    path: String,
    rowTag: String = "record",
    rootTag: String = "data",
    encoding: String = "UTF-8",
    append: Boolean = false,
    override val coalesce1: Boolean = false,
    override val knobs: ModelKnobs = ModelKnobs())
  extends FileModel with Extractable with Loadable {

  protected def read(ctx: StepContext): DataFrame =
    ctx.spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("encoding", encoding)
      .load(resolvedPath(ctx))

  protected def write(ctx: StepContext, df: DataFrame): LoadResult = {
    val p = resolvedPath(ctx)
    maybeCoalesce(df).write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .format("xml")
      .option("rowTag", rowTag).option("rootTag", rootTag)
      .option("declaration", s"""version="1.0" encoding="$encoding"""")
      .save(p)
    val (files, bytes) = writeStats(ctx, p)
    LoadResult(-1L, bytes, files)
  }

  override def clean(ctx: StepContext): Unit = delete(ctx)
}

/** Parquet source + sink — not in the reference's format list but the
  * native format of this engine's substrate; partitioned layout is the
  * 100 TB path.
  */
final case class ParquetModel(
    path: String,
    partitionBy: Seq[String] = Nil,
    append: Boolean = false,
    /** cap rows per output file (spark.sql.files `maxRecordsPerFile`
      * write option) — output sharding control: a 100 TB curation run
      * lands trainer-sized files instead of one file per task. */
    maxRecordsPerFile: Option[Long] = None,
    override val knobs: ModelKnobs = ModelKnobs())
  extends FileModel with Extractable with Loadable {

  protected def read(ctx: StepContext): DataFrame =
    ctx.spark.read.parquet(resolvedPath(ctx))

  protected def write(ctx: StepContext, df: DataFrame): LoadResult = {
    val p = resolvedPath(ctx)
    var w = df.write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    maxRecordsPerFile.foreach(n => w = w.option("maxRecordsPerFile", n))
    w.parquet(p)
    val (files, bytes) = writeStats(ctx, p)
    LoadResult(-1L, bytes, files)
  }

  override def clean(ctx: StepContext): Unit = delete(ctx)
}

/** ORC source + sink — the second columnar format Spark ships natively;
  * same partitioned-layout scale path as [[ParquetModel]]. Widens the
  * reference's CSV/JSON/XML matrix to the formats a lakehouse actually
  * exchanges.
  */
final case class OrcModel(
    path: String,
    partitionBy: Seq[String] = Nil,
    append: Boolean = false,
    override val knobs: ModelKnobs = ModelKnobs())
  extends FileModel with Extractable with Loadable {

  protected def read(ctx: StepContext): DataFrame =
    ctx.spark.read.orc(resolvedPath(ctx))

  protected def write(ctx: StepContext, df: DataFrame): LoadResult = {
    val p = resolvedPath(ctx)
    var w = df.write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.orc(p)
    val (files, bytes) = writeStats(ctx, p)
    LoadResult(-1L, bytes, files)
  }

  override def clean(ctx: StepContext): Unit = delete(ctx)
}

/** The reference's only built-in transform (models.py:425-437): a user
  * function over records. Declarative `DataFrame => DataFrame` is the
  * engine-native form; arbitrary row-level logic drops to `Dataset.map`
  * with an explicit encoder at the call site.
  */
final case class Mapper(
    func: DataFrame => DataFrame = identity,
    override val knobs: ModelKnobs = ModelKnobs())
  extends Transformable {
  def transform(ctx: StepContext, df: DataFrame): DataFrame = func(df)
}
