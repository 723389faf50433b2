package graft.models

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.sql.Timestamp
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable
import scala.util.matching.Regex

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

import graft.core._

/** File listing with predicates (pydin/models.py:1459-1651): recursive
  * walk, regex filename mask, modification-time window. The reference's
  * three protocol walkers (os.listdir / SFTP listdir_attr / FTP nlst —
  * models.py:1559-1615) collapse into the [[RemoteFs]] seam: Hadoop
  * FileSystem covers local/HDFS/S3 by URI scheme, and registered
  * protocol handlers (FTP built in; SFTP pluggable) cover socket
  * endpoints. The `created` date-range spec that the reference `eval`s
  * against a calendar namespace (models.py:1640-43) is replaced by
  * explicit [[CalendarDate]] bounds — never eval.
  */
final case class FilesFilter(
    path: String,
    mask: Option[String] = None,
    recursive: Boolean = true,
    createdFrom: Option[CalendarDate] = None,
    createdTo: Option[CalendarDate] = None) {

  @transient private lazy val rx: Option[Regex] = mask.map(_.r)

  /** The predicate core, protocol-independent: name mask + mtime window. */
  def matchesMeta(name: String, mtimeMillis: Long): Boolean = {
    val nameOk = rx.forall(_.findFirstIn(name).isDefined)
    val fromOk = createdFrom.forall(d =>
      mtimeMillis >= Timestamp.valueOf(d.start).getTime)
    val toOk = createdTo.forall(d =>
      mtimeMillis <= Timestamp.valueOf(d.end).getTime)
    nameOk && fromOk && toOk
  }

  def matches(st: FileStatus): Boolean =
    matchesMeta(st.getPath.getName, st.getModificationTime)

  def select(fs: FileSystem): Seq[FileStatus] =
    new HadoopRemoteFs(fs).list(path, recursive)
      .map(s => new Path(s.path)).map(fs.getFileStatus).filter(matches)

  /** Matched entries through the protocol seam. */
  def select(rfs: RemoteFs, root: String): Seq[RemoteStat] =
    rfs.list(root, recursive).filter(s => matchesMeta(s.name, s.mtime))
}

/** Extractable over a file listing (pydin/models.py:1654-1661): one
  * record per matched file with the reference's row shape
  * (models.py:1575-1579). Endpoint-aware: `path` may be any registered
  * scheme (ftp://..., sftp://... with a registered handler) or a Hadoop
  * URI; `host` reports the endpoint like the reference's server rows.
  */
final case class FilenamesModel(
    path: String,
    mask: Option[String] = None,
    recursive: Boolean = true,
    createdFrom: Option[CalendarDate] = None,
    createdTo: Option[CalendarDate] = None,
    /** Calendar EXPRESSIONS resolved against the run's calendar at read
      * time (e.g. "calendar.yesterday", "days_back(3)") — the parsed
      * replacement for the reference's eval'd `created` spec. */
    createdFromExpr: Option[String] = None,
    createdToExpr: Option[String] = None,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Extractable {

  val schema: StructType = StructType(Seq(
    StructField("host", StringType),
    StructField("path", StringType),
    StructField("root", StringType),
    StructField("dir", StringType),
    StructField("file", StringType),
    StructField("is_dir", BooleanType),
    StructField("is_file", BooleanType),
    StructField("mtime", TimestampType),
    StructField("size", LongType)))

  protected def read(ctx: StepContext): DataFrame = {
    val rendered = ctx.render(path)
    val from = createdFrom.orElse(
      createdFromExpr.map(CalendarExpr.resolveDate(_, ctx.calendar)))
    val to = createdTo.orElse(
      createdToExpr.map(CalendarExpr.resolveDate(_, ctx.calendar)))
    val filter = FilesFilter(rendered, mask, recursive, from, to)
    val (rfs, root) = RemoteFsRegistry.open(rendered,
      ctx.spark.sparkContext.hadoopConfiguration)
    val rows =
      try filter.select(rfs, root).map { st =>
        val dir = st.path.take(st.path.lastIndexOf('/')) match {
          case "" => "/"
          case d => d
        }
        Row(rfs.host, st.path, root, dir, st.name, st.isDir, !st.isDir,
          new Timestamp(st.mtime), st.size)
      } finally rfs.close()
    ctx.spark.createDataFrame(
      ctx.spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000 + 1)),
      schema)
  }
}

/** File-management action (pydin/models.py:1664-2392): copy/move/delete
  * matched files, optional gzip/gunzip in flight, atomic
  * tempname-then-rename (models.py:1956-1959), multiple destinations
  * (models.py:1722-1732), per-file metrics (models.py:1912-1924).
  *
  * The reference's 13-case protocol matrix (localhost x SSH x SFTP x
  * FTP on each side — models.py:1774-1908) collapses through the
  * [[RemoteFs]] seam into ONE streaming transfer: source and every
  * destination resolve independently by URI scheme (Hadoop local/HDFS/
  * S3, built-in FTP, registered SFTP/custom), so every protocol pairing
  * works by construction. Driver-side, as in the reference.
  */
final case class FileManagerModel(
    path: String,
    action: String, // copy | move | delete
    destinations: Seq[String] = Nil,
    mask: Option[String] = None,
    recursive: Boolean = false,
    zip: Boolean = false,
    unzip: Boolean = false,
    tempname: Boolean = true,
    nodirectory: Boolean = false,
    createdFrom: Option[CalendarDate] = None,
    createdTo: Option[CalendarDate] = None,
    override val knobs: ModelKnobs = ModelKnobs())
  extends PdModel with Executable {

  def execute(ctx: StepContext): ExecResult = {
    // A copy/move with no destinations would copy nothing and (for move)
    // then delete every matched source — silent data loss from a one-field
    // misconfiguration. Fail fast instead.
    require(action == "delete" || destinations.nonEmpty,
      s"FileManagerModel action='$action' requires at least one destination")
    val conf = ctx.spark.sparkContext.hadoopConfiguration
    val rendered = ctx.render(path)
    // one endpoint handle per distinct URI, closed when the sweep ends
    val handles = mutable.LinkedHashMap[String, (RemoteFs, String)]()
    def endpoint(uri: String): (RemoteFs, String) =
      handles.getOrElseUpdate(uri, RemoteFsRegistry.open(uri, conf))
    try {
      val (sfs, srcRoot) = endpoint(rendered)
      val filter = FilesFilter(rendered, mask, recursive, createdFrom, createdTo)
      val files = filter.select(sfs, srcRoot).filterNot(_.isDir)
      var filesRead = 0L; var bytesRead = 0L
      var filesWritten = 0L; var bytesWritten = 0L

      files.foreach { st =>
        filesRead += 1; bytesRead += st.size
        if (action == "copy" || action == "move") {
          destinations.foreach { dRoot =>
            val (dfs, dstRoot) = endpoint(ctx.render(dRoot))
            dfs.mkdirs(dstRoot)
            val baseName =
              if (zip) st.name + ".gz"
              else if (unzip) st.name.stripSuffix(".gz")
              else st.name
            // nodirectory flattens the tree into the destination root
            val rel =
              if (nodirectory) baseName
              else {
                val r = st.path.stripPrefix(srcRoot).stripPrefix("/")
                if (r.isEmpty || !r.contains('/')) baseName
                else r.split('/').dropRight(1).:+(baseName).mkString("/")
              }
            val finalDst = s"${dstRoot.stripSuffix("/")}/$rel"
            val tmpDst = if (tempname) finalDst + ".tmp" else finalDst
            val parent = finalDst.take(finalDst.lastIndexOf('/'))
            if (parent.nonEmpty) dfs.mkdirs(parent)
            transfer(sfs, st.path, dfs, tmpDst)
            if (tempname) {
              dfs.delete(finalDst)
              dfs.rename(tmpDst, finalDst)
            }
            filesWritten += 1
            val written = dfs.stat(finalDst).map(_.size).getOrElse(0L)
            bytesWritten += written
            ctx.ledger.logFile(ctx, modelName, rel.split('/').last,
              finalDst, written, action)
          }
        }
        if (action == "move" || action == "delete") {
          sfs.delete(st.path)
          if (action == "delete")
            ctx.ledger.logFile(ctx, modelName, st.name, st.path, st.size, action)
        }
      }
      ExecResult(resultValue = Some(filesRead),
        resultLong = Some(s"files_read=$filesRead bytes_read=$bytesRead " +
          s"files_written=$filesWritten bytes_written=$bytesWritten"))
    } finally handles.values.foreach(_._1.close())
  }

  /** Stream copy with optional gzip/gunzip in flight
    * (models.py:1936-1955) — protocol-agnostic on both ends. */
  private def transfer(sfs: RemoteFs, src: String,
                       dfs: RemoteFs, dst: String): Unit = {
    val rawIn = new BufferedInputStream(sfs.open(src))
    val in = if (unzip) new GZIPInputStream(rawIn) else rawIn
    val rawOut = new BufferedOutputStream(dfs.create(dst))
    val out = if (zip) new GZIPOutputStream(rawOut) else rawOut
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally { out.close(); in.close() }
  }
}
