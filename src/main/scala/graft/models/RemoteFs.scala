package graft.models

import java.io.{InputStream, OutputStream}
import java.net.URI
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.concurrent.TrieMap
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** One file/directory entry as seen through a [[RemoteFs]]. `path` is the
  * absolute path WITHOUT scheme/authority (the protocol handle owns the
  * endpoint; paths are plain).
  */
final case class RemoteStat(path: String, name: String, isDir: Boolean,
                            mtime: Long, size: Long)

/** The PROTOCOL SEAM for file endpoints — the reference's `Localhost` /
  * `Server` connection objects (pydin/sources.py:14-122) re-expressed as
  * one capability interface, so `FileManager`'s 13-case protocol matrix
  * (models.py:1774-1908: localhost x SSH x SFTP x FTP, every
  * source/target pairing) collapses into a single streaming transfer
  * between ANY two implementations: every (src protocol, dst protocol)
  * pair works by construction instead of by enumeration.
  *
  * Implementations ship for Hadoop FileSystems (local/HDFS/S3 — the
  * cluster-native path), FTP (RFC 959 client over plain sockets,
  * [[FtpRemoteFs]]), and a local-directory-backed endpoint
  * ([[LocalDirRemoteFs]]) used both as a mounted-"server" adapter and as
  * the loopback test double for protocols whose client libraries are not
  * vendorable here (SFTP needs an SSH implementation; register a
  * jsch/sshj-backed RemoteFs under the "sftp" scheme in one line via
  * [[RemoteFsRegistry.register]]). The behavioral bar for ANY
  * registration is executable: `RemoteFsContract` (test sources) runs
  * the same integration-contract suite — byte-exact streaming, list/stat
  * semantics, rename/delete behavior, two-handle transfers — against
  * every shipped endpoint, and `SftpContractSpec` instantiates it over
  * whatever factory the "sftp" scheme resolves to; a production SFTP
  * client must pass it unchanged.
  */
trait RemoteFs extends AutoCloseable {
  /** Endpoint host for metadata rows (reference's fileinfo host field,
    * models.py:1575). */
  def host: String
  /** All entries under `path` (files and dirs), optionally recursive.
    * Empty when `path` does not exist. */
  def list(path: String, recursive: Boolean): Seq[RemoteStat]
  def stat(path: String): Option[RemoteStat]
  def open(path: String): InputStream
  /** Create/overwrite a file; parent must exist. */
  def create(path: String): OutputStream
  def mkdirs(path: String): Unit
  /** Delete one file (or empty directory); false when absent. */
  def delete(path: String): Boolean
  def rename(src: String, dst: String): Boolean
  def exists(path: String): Boolean = stat(path).isDefined
  def close(): Unit = ()
}

/** Hadoop FileSystem adapter — local, HDFS, S3A, and any other scheme
  * the Hadoop conf knows. close() is a no-op: Hadoop caches and owns the
  * FileSystem instances.
  */
final class HadoopRemoteFs(fs: FileSystem) extends RemoteFs {
  def host: String = Option(fs.getUri.getHost).getOrElse("localhost")

  private def toStat(st: org.apache.hadoop.fs.FileStatus): RemoteStat =
    RemoteStat(Path.getPathWithoutSchemeAndAuthority(st.getPath).toString,
      st.getPath.getName, st.isDirectory, st.getModificationTime, st.getLen)

  def list(path: String, recursive: Boolean): Seq[RemoteStat] = {
    val root = new Path(path)
    if (!fs.exists(root)) return Nil
    val out = mutable.ListBuffer[RemoteStat]()
    def go(p: Path): Unit =
      fs.listStatus(p).foreach { st =>
        out += toStat(st)
        if (st.isDirectory && recursive) go(st.getPath)
      }
    go(root)
    out.toSeq
  }

  def stat(path: String): Option[RemoteStat] =
    if (fs.exists(new Path(path))) Some(toStat(fs.getFileStatus(new Path(path))))
    else None

  def open(path: String): InputStream = fs.open(new Path(path))
  def create(path: String): OutputStream = fs.create(new Path(path), true)
  def mkdirs(path: String): Unit = fs.mkdirs(new Path(path))
  def delete(path: String): Boolean = fs.delete(new Path(path), false)
  def rename(src: String, dst: String): Boolean =
    fs.rename(new Path(src), new Path(dst))
  override def exists(path: String): Boolean = fs.exists(new Path(path))
}

/** A "remote server" backed by a local directory root — the adapter for
  * endpoints mounted into the filesystem (NFS/FUSE), and the loopback
  * test double for socket protocols without a vendorable client. Paths
  * are resolved under `root`; `/x/y` maps to `root/x/y`.
  */
final class LocalDirRemoteFs(root: String, val host: String = "localhost")
  extends RemoteFs {

  private def res(path: String) = Paths.get(root, path.stripPrefix("/"))

  private def toStat(p: java.nio.file.Path): RemoteStat = {
    val rel = "/" + Paths.get(root).relativize(p).toString
    RemoteStat(rel, p.getFileName.toString, Files.isDirectory(p),
      Files.getLastModifiedTime(p).toMillis, if (Files.isDirectory(p)) 0L else Files.size(p))
  }

  def list(path: String, recursive: Boolean): Seq[RemoteStat] = {
    val r = res(path)
    if (!Files.isDirectory(r)) return Nil
    val out = mutable.ListBuffer[RemoteStat]()
    def go(d: java.nio.file.Path): Unit =
      Files.list(d).iterator().asScala.toSeq.sortBy(_.toString).foreach { p =>
        out += toStat(p)
        if (Files.isDirectory(p) && recursive) go(p)
      }
    go(r)
    out.toSeq
  }

  def stat(path: String): Option[RemoteStat] = {
    val p = res(path)
    if (Files.exists(p)) Some(toStat(p)) else None
  }

  def open(path: String): InputStream = Files.newInputStream(res(path))
  def create(path: String): OutputStream = Files.newOutputStream(res(path))
  def mkdirs(path: String): Unit = Files.createDirectories(res(path))
  def delete(path: String): Boolean = Files.deleteIfExists(res(path))
  def rename(src: String, dst: String): Boolean = {
    Files.move(res(src), res(dst), StandardCopyOption.REPLACE_EXISTING); true
  }
}

/** Scheme-dispatch for file endpoints (the seam's registry). URIs with a
  * registered scheme open through their factory; everything else —
  * scheme-less local paths, file:, hdfs:, s3a: — goes through Hadoop.
  * `ftp` ships registered; `sftp`/custom protocols are one `register`
  * call (the reference wires Server objects the same way through its
  * connection cache, sources.py:41-42).
  */
object RemoteFsRegistry {
  private val factories = TrieMap[String, URI => RemoteFs]()

  register("ftp", uri => FtpRemoteFs.connect(uri))

  def register(scheme: String, factory: URI => RemoteFs): Unit =
    factories.put(scheme.toLowerCase, factory)

  def registered(scheme: String): Boolean = factories.contains(scheme.toLowerCase)

  /** Open the endpoint for `uriStr`; returns the handle and the PATH part
    * the caller should address within it. */
  def open(uriStr: String, conf: Configuration): (RemoteFs, String) = {
    val uri = URI.create(uriStr.replace(" ", "%20"))
    Option(uri.getScheme).map(_.toLowerCase).flatMap(factories.get) match {
      case Some(f) => (f(uri), Option(uri.getPath).filter(_.nonEmpty).getOrElse("/"))
      case None =>
        val p = new Path(uriStr)
        (new HadoopRemoteFs(p.getFileSystem(conf)),
          Path.getPathWithoutSchemeAndAuthority(p).toString)
    }
  }
}
