package graft.models

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.sql.Timestamp
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable
import scala.util.matching.Regex

import org.apache.hadoop.fs.{FileStatus, FileSystem, FileUtil, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.core._

/** File listing with predicates (pydin/models.py:1459-1651): recursive
  * walk, regex filename mask, modification-time window. The reference's
  * three protocol walkers (os.listdir / SFTP listdir_attr / FTP nlst —
  * models.py:1559-1615) collapse into the Hadoop FileSystem API, which
  * covers local/HDFS/S3 by URI scheme. The `created` date-range spec that
  * the reference `eval`s against a calendar namespace (models.py:1640-43)
  * is replaced by explicit [[CalendarDate]] bounds — never eval.
  */
final case class FilesFilter(
    path: String,
    mask: Option[String] = None,
    recursive: Boolean = true,
    createdFrom: Option[CalendarDate] = None,
    createdTo: Option[CalendarDate] = None) {

  @transient private lazy val rx: Option[Regex] = mask.map(_.r)

  def walk(fs: FileSystem): Seq[FileStatus] = {
    val root = new Path(path)
    if (!fs.exists(root)) return Nil
    val out = mutable.ListBuffer[FileStatus]()
    def go(p: Path): Unit =
      fs.listStatus(p).foreach { st =>
        out += st
        if (st.isDirectory && recursive) go(st.getPath)
      }
    go(root)
    out.toSeq
  }

  def matches(st: FileStatus): Boolean = {
    val nameOk = rx.forall(_.findFirstIn(st.getPath.getName).isDefined)
    val m = st.getModificationTime
    val fromOk = createdFrom.forall(d =>
      m >= Timestamp.valueOf(d.start).getTime)
    val toOk = createdTo.forall(d => m <= Timestamp.valueOf(d.end).getTime)
    nameOk && fromOk && toOk
  }

  def select(fs: FileSystem): Seq[FileStatus] = walk(fs).filter(matches)
}

/** Extractable over a file listing (pydin/models.py:1654-1661): one
  * record per matched file with the reference's row shape
  * (models.py:1575-1579).
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
    val p = new Path(ctx.render(path))
    val fs = p.getFileSystem(ctx.spark.sparkContext.hadoopConfiguration)
    val from = createdFrom.orElse(
      createdFromExpr.map(CalendarExpr.resolveDate(_, ctx.calendar)))
    val to = createdTo.orElse(
      createdToExpr.map(CalendarExpr.resolveDate(_, ctx.calendar)))
    val filter = FilesFilter(ctx.render(path), mask, recursive, from, to)
    val rows = filter.select(fs).map { st =>
      val full = Path.getPathWithoutSchemeAndAuthority(st.getPath).toString
      Row("localhost", full, p.toString,
        Option(st.getPath.getParent).map(d =>
          Path.getPathWithoutSchemeAndAuthority(d).toString).orNull,
        st.getPath.getName, st.isDirectory, st.isFile,
        new Timestamp(st.getModificationTime), st.getLen)
    }
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
  * The reference's 13-case protocol matrix (localhost x SSH x SFTP x FTP)
  * is covered by Hadoop FileSystem URIs — local, HDFS, S3 — which is the
  * cluster-native equivalent; driver-side, as in the reference.
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
    val srcRoot = new Path(ctx.render(path))
    val fs = srcRoot.getFileSystem(conf)
    val filter = FilesFilter(ctx.render(path), mask, recursive, createdFrom, createdTo)
    val files = filter.select(fs).filter(_.isFile)
    var filesRead = 0L; var bytesRead = 0L
    var filesWritten = 0L; var bytesWritten = 0L

    files.foreach { st =>
      val src = st.getPath
      filesRead += 1; bytesRead += st.getLen
      if (action == "copy" || action == "move") {
        destinations.foreach { dRoot =>
          val dstRoot = new Path(ctx.render(dRoot))
          val dfs = dstRoot.getFileSystem(conf)
          dfs.mkdirs(dstRoot)
          val baseName =
            if (zip) src.getName + ".gz"
            else if (unzip) src.getName.stripSuffix(".gz")
            else src.getName
          // nodirectory flattens the tree into the destination root
          val qualifiedRoot = fs.makeQualified(srcRoot).toString
          val rel =
            if (nodirectory) baseName
            else {
              val r = src.toString.stripPrefix(qualifiedRoot).stripPrefix("/")
              if (r.isEmpty || !r.contains('/')) baseName
              else r.split('/').dropRight(1).:+(baseName).mkString("/")
            }
          val finalDst = new Path(dstRoot, rel)
          val tmpDst = if (tempname)
            new Path(finalDst.getParent, finalDst.getName + ".tmp") else finalDst
          dfs.mkdirs(finalDst.getParent)
          transfer(fs, src, dfs, tmpDst)
          if (tempname) {
            dfs.delete(finalDst, false)
            dfs.rename(tmpDst, finalDst)
          }
          filesWritten += 1
          val written = dfs.getFileStatus(finalDst).getLen
          bytesWritten += written
          ctx.ledger.logFile(ctx, modelName, finalDst.getName,
            finalDst.toString, written, action)
        }
      }
      if (action == "move" || action == "delete") {
        fs.delete(src, false)
        if (action == "delete")
          ctx.ledger.logFile(ctx, modelName, src.getName, src.toString,
            st.getLen, action)
      }
    }
    ExecResult(resultValue = Some(filesRead),
      resultLong = Some(s"files_read=$filesRead bytes_read=$bytesRead " +
        s"files_written=$filesWritten bytes_written=$bytesWritten"))
  }

  /** Stream copy with optional gzip/gunzip in flight
    * (models.py:1936-1955). */
  private def transfer(sfs: FileSystem, src: Path,
                       dfs: FileSystem, dst: Path): Unit = {
    if (!zip && !unzip && sfs.getUri == dfs.getUri) {
      FileUtil.copy(sfs, src, dfs, dst, false, sfs.getConf)
      return
    }
    val rawIn = new BufferedInputStream(sfs.open(src))
    val in = if (unzip) new GZIPInputStream(rawIn) else rawIn
    val rawOut = new BufferedOutputStream(dfs.create(dst, true))
    val out = if (zip) new GZIPOutputStream(rawOut) else rawOut
    try {
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally { out.close(); in.close() }
  }
}
