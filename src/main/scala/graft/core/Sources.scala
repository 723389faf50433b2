package graft.core

import java.io.{File, FileInputStream, InputStreamReader}
import java.sql.{Connection, DriverManager}
import java.util.Properties

import scala.collection.mutable

/** A named data source (pydin/sources.py:1-141 + Connector heuristic,
  * utils.py:1194-1290): either a database (JDBC) or a file-system/server
  * endpoint. The reference classifies an INI section by its keys —
  * `vendor_name`/`driver_name`/`database` → Database, `protocol`/`host`/
  * `port` → Server; same heuristic here.
  */
sealed trait Source { def name: String }

final case class DatabaseSource(
    name: String,
    url: String,
    driver: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None,
    vendor: Option[String] = None) extends Source {

  def jdbcProperties: Properties = {
    val p = new Properties()
    user.foreach(p.setProperty("user", _))
    password.foreach(p.setProperty("password", _))
    driver.foreach(p.setProperty("driver", _))
    p
  }

  /** Driver-side connection for passthrough SQL (SqlModel, same-DB
    * Insert fast path, recycle deletes). */
  def connect(): Connection = {
    driver.foreach(Class.forName)
    DriverManager.getConnection(url, user.orNull, password.orNull)
  }
}

/** A file-system endpoint: any Hadoop-FS URI scheme (file://, hdfs://,
  * s3a://...). Replaces the reference's localhost/SSH/SFTP/FTP protocol
  * matrix (sources.py:34-141) with the FileSystem abstraction
  * (SURVEY.md §2.5).
  */
final case class FileSystemSource(
    name: String,
    root: String,
    protocol: String = "file",
    host: Option[String] = None,
    port: Option[Int] = None) extends Source

/** Registry of named sources, loadable from an INI file
  * (`~/.pydin/sources.ini` in the reference — utils.py:1194-1290).
  */
final class SourceRegistry {
  private val sources = mutable.Map[String, Source]()

  def add(s: Source): this.type = { sources(s.name.toLowerCase) = s; this }
  def get(name: String): Source = sources.getOrElse(name.toLowerCase,
    throw new NoSuchElementException(s"unknown source: $name"))
  def database(name: String): DatabaseSource = get(name) match {
    case d: DatabaseSource => d
    case other => throw new IllegalArgumentException(
      s"source $name is not a database (${other.getClass.getSimpleName})")
  }
  def names: Seq[String] = sources.keys.toSeq.sorted

  def loadIni(file: File): this.type = {
    val sections = SourceRegistry.parseIni(file)
    sections.foreach { case (section, kv) =>
      val has = (k: String) => kv.contains(k)
      if (has("url") || has("vendor_name") || has("driver_name") || has("database")) {
        add(DatabaseSource(
          name = section,
          url = kv.getOrElse("url",
            s"jdbc:${kv.getOrElse("vendor_name", "")}:${kv.getOrElse("database", "")}"),
          driver = kv.get("driver_name"),
          user = kv.get("username").orElse(kv.get("user")),
          password = kv.get("password"),
          vendor = kv.get("vendor_name")))
      } else if (has("protocol") || has("host") || has("port")) {
        add(FileSystemSource(
          name = section,
          root = kv.getOrElse("root", "/"),
          protocol = kv.getOrElse("protocol", "file"),
          host = kv.get("host"),
          port = kv.get("port").map(_.toInt)))
      }
    }
    this
  }
}

object SourceRegistry {
  /** Minimal INI parser: `[section]` headers, `key=value` lines, `#`/`;`
    * comments. No external dependency. */
  def parseIni(file: File): Seq[(String, Map[String, String])] = {
    val src = scala.io.Source.fromInputStream(
      new FileInputStream(file), "UTF-8")
    try {
      val out = mutable.ListBuffer[(String, mutable.Map[String, String])]()
      var current: Option[mutable.Map[String, String]] = None
      for (raw <- src.getLines()) {
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
          if (line.startsWith("[") && line.endsWith("]")) {
            val m = mutable.Map[String, String]()
            out += ((line.substring(1, line.length - 1).trim, m))
            current = Some(m)
          } else if (line.contains('=')) {
            val i = line.indexOf('=')
            current.foreach(_(line.take(i).trim.toLowerCase) = line.drop(i + 1).trim)
          }
        }
      }
      out.map { case (n, m) => (n, m.toMap) }.toSeq
    } finally src.close()
  }
}
