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

  /** Strict ONE-FILE sink layout (reference fidelity: the CSV/JSON/XML
    * models write a single file at `path`, and append is read-modify-
    * write — models.py:1366-1374, 1405-1409, 1441-1454). When true,
    * the distributed write lands in a tmp directory and the DRIVER
    * streams the part bytes into the single destination file, with
    * format-aware stitching (CSV header once, JSON one top-level
    * array, XML one root element). Append rewrites the destination
    * (exactly the reference's semantics — there is no distributed
    * append into one file). This is the small-export escape hatch the
    * reference's users rely on, NOT the 100 TB path: partitioned
    * directories are.
    */
  def singleFile: Boolean = false

  protected def maybeCoalesce(df: DataFrame): DataFrame =
    if (coalesce1) df.coalesce(1) else df

  /** Run `writeTmp` into a tmp dir, then stitch its part files into the
    * single file at `p` via `merge(parts, oldFile, out)`; `oldFile` is
    * the pre-existing destination (append mode only), read IN PLACE —
    * the stitched output lands in a sibling `.__single_new` file and
    * only swaps over the destination once complete (rename-aside, the
    * compact discipline), so a crash at any point leaves either the
    * old complete file or the new complete file reachable, never a
    * torn half: before the swap the destination is untouched; between
    * the two renames the old copy sits at `.__single_old` and the next
    * run's crash-recovery step restores it.
    */
  protected def materializeSingle(
      ctx: StepContext, p: String, appendMode: Boolean,
      writeTmp: String => Unit,
      merge: (Seq[Path], Option[Path], java.io.OutputStream,
        FileSystem) => Unit): LoadResult = {
    val f = fs(ctx, p)
    val dest = new Path(p)
    val aside = new Path(p + ".__single_old")
    // crash recovery: a previous run died between its two renames —
    // the aside IS the only complete copy; restore it before anything
    if (!f.exists(dest) && f.exists(aside)) f.rename(aside, dest)
    require(!f.exists(dest) || f.getFileStatus(dest).isFile,
      s"single-file sink target $p exists and is a directory")
    val tmpDir = new Path(p + ".__single_tmp")
    f.delete(tmpDir, true)
    writeTmp(tmpDir.toString)
    val parts = f.listStatus(tmpDir)
      .filter(s => s.isFile && s.getLen > 0 &&
        !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath).sortBy(_.getName).toSeq
    val old = if (appendMode && f.exists(dest) &&
      f.getFileStatus(dest).getLen > 0) Some(dest) else None
    val tmpNew = new Path(p + ".__single_new")
    f.delete(tmpNew, false)
    val out = f.create(tmpNew, true)
    try merge(parts, old, out, f) finally out.close()
    // swap: old moves aside (atomic), new moves in (atomic), aside goes
    f.delete(aside, false)
    if (f.exists(dest)) f.rename(dest, aside)
    f.rename(tmpNew, dest)
    f.delete(aside, false)
    f.delete(tmpDir, true)
    LoadResult(-1L, f.getFileStatus(dest).getLen, 1L)
  }

  /** Whole-file read — single-file stitching is a driver-side export
    * path and the reference's own append is a full read-modify-write. */
  protected def readFully(f: FileSystem, p: Path,
                          charset: String = "UTF-8"): String = {
    val in = f.open(p)
    try new String(in.readAllBytes(), charset)
    finally in.close()
  }

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
    override val singleFile: Boolean = false,
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
    if (singleFile) return writeSingle(ctx, p, df)
    maybeCoalesce(df).write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .options(commonOpts)
      .option("header", head)
      .option("quoteAll", enclosure.isDefined)
      .csv(p)
    val (files, bytes) = writeStats(ctx, p)
    LoadResult(-1L, bytes, files) // rows filled by the step's metrics listener
  }

  /** One CSV file at `p` (models.py:1366-1374): header written exactly
    * once (creation only — an append never repeats it, like the
    * reference's writeheader-on-create), part bytes streamed after it.
    */
  private def writeSingle(ctx: StepContext, p: String,
                          df: DataFrame): LoadResult =
    materializeSingle(ctx, p, append,
      tmp => df.write.mode(SaveMode.Overwrite).options(commonOpts)
        .option("header", head)
        .option("quoteAll", enclosure.isDefined)
        .csv(tmp),
      (parts, old, out, f) => {
        var headerDone = false
        old.foreach { o =>
          val in = f.open(o)
          try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
          finally in.close()
          headerDone = true
        }
        parts.foreach { part =>
          val in = f.open(part)
          try {
            if (head && headerDone) {
              // skip this part's header line: consume bytes until the
              // read-so-far suffix equals the TERMINATOR sequence
              // (custom lineSep or \n) — an ends-with test over a ring
              // of the last |term| bytes, correct for ANY terminator
              // including multi-char values with internal repeats
              // (the single-byte mismatch-reset state machine this
              // replaces could over- or under-skip those). Valid for
              // any ASCII-compatible charset, which is what Spark's
              // csv writer supports for lineSep-delimited text.
              val term = terminator.getOrElse("\n")
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              val ring = new Array[Byte](term.length)
              var seen = 0L
              var b = in.read()
              var done = false
              while (b != -1 && !done) {
                ring((seen % term.length).toInt) = b.toByte
                seen += 1
                done = seen >= term.length && term.indices.forall { i =>
                  ring(((seen - term.length + i) % term.length).toInt) == term(i)
                }
                if (!done) b = in.read()
              }
            }
            org.apache.hadoop.io.IOUtils.copyBytes(in, out, 65536, false)
          } finally in.close()
          headerDone = true
        }
      })

  override def clean(ctx: StepContext): Unit = delete(ctx)
}

/** JSON source + sink (models.py:1379-1411). The reference holds ONE file
  * with a top-level array; `multiline=true` (the default) reads that
  * layout — and the `singleFile=true` sink writes it, including
  * read-modify-write append. Default writes are JSON-lines part files
  * (the distributed-native layout, SURVEY.md §7.4.2): read THOSE back
  * with `multiline=false` (the m02 gate's shape) — a multiline read of
  * a JSON-lines directory parses each part as one document. Pick the
  * pair that matches your layout: (singleFile write, default read) or
  * (default write, multiline=false read).
  */
final case class JsonModel(
    path: String,
    multiline: Boolean = true,
    encoding: String = "UTF-8",
    append: Boolean = false,
    override val coalesce1: Boolean = false,
    override val singleFile: Boolean = false,
    override val knobs: ModelKnobs = ModelKnobs())
  extends FileModel with Extractable with Loadable {

  protected def read(ctx: StepContext): DataFrame =
    ctx.spark.read
      .option("multiLine", multiline)
      .option("encoding", encoding)
      .json(resolvedPath(ctx))

  protected def write(ctx: StepContext, df: DataFrame): LoadResult = {
    val p = resolvedPath(ctx)
    if (singleFile) return writeSingle(ctx, p, df)
    maybeCoalesce(df).write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .json(p)
    val (files, bytes) = writeStats(ctx, p)
    LoadResult(-1L, bytes, files)
  }

  /** One JSON file holding a TOP-LEVEL ARRAY — the reference's exact
    * layout (models.py:1379-1411, json.load/json.dump of a list);
    * readable back with the default `multiline=true`. Append splices
    * the new objects before the old file's closing bracket (the
    * reference's read-modify-write, performed once on the driver).
    */
  private def writeSingle(ctx: StepContext, p: String,
                          df: DataFrame): LoadResult =
    materializeSingle(ctx, p, append,
      tmp => df.write.mode(SaveMode.Overwrite)
        .option("encoding", encoding).json(tmp),
      (parts, old, out, f) => {
        val w = new java.io.OutputStreamWriter(out, encoding)
        var first = true
        old.foreach { o =>
          // old array minus its closing bracket (and trailing space)
          val body = readFully(f, o, encoding).trim.stripSuffix("]").trim
            .stripSuffix(",")
          w.write(body)
          first = body.trim == "[" // old array was empty
        }
        if (old.isEmpty) w.write("[")
        parts.foreach { part =>
          readFully(f, part, encoding).linesIterator
            .filter(_.nonEmpty).foreach { line =>
              if (!first) w.write(",\n") else first = false
              w.write(line)
            }
        }
        w.write("]\n")
        w.flush()
      })

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
    override val singleFile: Boolean = false,
    override val knobs: ModelKnobs = ModelKnobs())
  extends FileModel with Extractable with Loadable {

  protected def read(ctx: StepContext): DataFrame =
    ctx.spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("encoding", encoding)
      .load(resolvedPath(ctx))

  protected def write(ctx: StepContext, df: DataFrame): LoadResult = {
    val p = resolvedPath(ctx)
    if (singleFile) return writeSingle(ctx, p, df)
    maybeCoalesce(df).write
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .format("xml")
      .option("rowTag", rowTag).option("rootTag", rootTag)
      .option("charset", encoding)
      .option("declaration", s"""version="1.0" encoding="$encoding"""")
      .save(p)
    val (files, bytes) = writeStats(ctx, p)
    LoadResult(-1L, bytes, files)
  }

  /** One XML file: declaration + a single `rootTag` element wrapping
    * every record (models.py:1414-1456's exact document shape). Each
    * part file carries its own declaration + root, so the stitch keeps
    * the first part's preamble, splices later parts' row content, and
    * closes the root once; append splices before the old file's
    * closing root tag (the reference's read-modify-write).
    */
  private def writeSingle(ctx: StepContext, p: String,
                          df: DataFrame): LoadResult = {
    val rootClose = s"</$rootTag>"
    def rowsOf(xml: String): String = {
      // content strictly inside the root element (handles both
      // <root>...</root> and an empty self-closing/absent body)
      val open = xml.indexOf(s"<$rootTag")
      if (open < 0) "" else {
        val bodyStart = xml.indexOf('>', open) + 1
        val close = xml.lastIndexOf(rootClose)
        if (close <= bodyStart) "" else xml.substring(bodyStart, close)
      }
    }
    materializeSingle(ctx, p, append,
      tmp => df.write.mode(SaveMode.Overwrite).format("xml")
        .option("rowTag", rowTag).option("rootTag", rootTag)
        .option("charset", encoding)
        .option("declaration", s"""version="1.0" encoding="$encoding"""")
        .save(tmp),
      (parts, old, out, f) => {
        val w = new java.io.OutputStreamWriter(out, encoding)
        old match {
          case Some(o) =>
            val oldXml = readFully(f, o, encoding)
            val close = oldXml.lastIndexOf(rootClose)
            require(close >= 0,
              s"append target $p is not a $rootTag-rooted XML document")
            w.write(oldXml.substring(0, close))
          case None =>
            w.write("<?xml version=\"1.0\" encoding=\"" + encoding +
              "\"?>\n" + s"<$rootTag>")
        }
        parts.foreach(part => w.write(rowsOf(readFully(f, part, encoding))))
        w.write(s"\n$rootClose\n")
        w.flush()
      })
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
