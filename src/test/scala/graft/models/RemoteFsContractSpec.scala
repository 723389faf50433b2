package graft.models

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The INTEGRATION CONTRACT every [[RemoteFs]] endpoint must honor —
  * byte-exact streaming, list/stat semantics, directory/rename/delete
  * behavior, and the two-handle transfer shape `FileManagerModel` uses.
  *
  * This is the reference's `Server` protocol surface (sources.py:20-141,
  * models.py:1774-1908) as executable requirements. In particular it is
  * the acceptance suite for a PRODUCTION SFTP factory: no SSH
  * implementation is vendorable in this environment, so the `sftp`
  * scheme ships with a loopback stand-in — registering a real client,
  *
  * {{{
  * RemoteFsRegistry.register("sftp", uri => new SshjRemoteFs(uri, ...))
  * }}}
  *
  * is one line, and the registered factory must pass [[SftpContractSpec]]
  * (this trait instantiated over the `sftp` scheme) UNCHANGED. The same
  * contract runs against every shipped endpoint — local-directory,
  * Hadoop, and the real-socket FTP client — so the stand-in is held to
  * exactly the bar a real client will be.
  */
trait RemoteFsContract extends BeforeAndAfterAll { this: AnyFunSuite =>

  /** Display name for test labels. */
  def name: String
  /** A fresh endpoint handle; repeated calls must address the SAME
    * backing store (two handles = the FileManager transfer pattern). */
  def makeFs(): RemoteFs
  /** Path mapper for endpoints without a chrooted namespace (Hadoop
    * local: absolute paths need a scratch-root prefix). */
  def p(rel: String): String = rel

  private def withFs[A](f: RemoteFs => A): A = {
    val fs = makeFs()
    try f(fs) finally fs.close()
  }

  private def put(fs: RemoteFs, path: String, bytes: Array[Byte]): Unit = {
    val os = fs.create(path)
    try os.write(bytes) finally os.close()
  }

  private def get(fs: RemoteFs, path: String): Array[Byte] = {
    val is = fs.open(path)
    try is.readAllBytes() finally is.close()
  }

  test(s"$name: byte-exact roundtrip — all 256 byte values, 1 MiB, empty") {
    withFs { fs =>
      fs.mkdirs(p("/c"))
      val all = Array.tabulate[Byte](256)(_.toByte)
      put(fs, p("/c/bin.dat"), all)
      assert(get(fs, p("/c/bin.dat")).toSeq == all.toSeq)
      val big = Array.tabulate[Byte](1 << 20)(i => (i * 31).toByte)
      put(fs, p("/c/big.dat"), big)
      assert(fs.stat(p("/c/big.dat")).exists(_.size == big.length))
      assert(java.util.Arrays.equals(get(fs, p("/c/big.dat")), big))
      put(fs, p("/c/empty.dat"), Array.empty[Byte])
      assert(fs.stat(p("/c/empty.dat")).exists(_.size == 0L))
      assert(get(fs, p("/c/empty.dat")).isEmpty)
    }
  }

  test(s"$name: list/stat semantics — names, sizes, dirs, recursion, absence") {
    withFs { fs =>
      fs.mkdirs(p("/l/sub"))
      put(fs, p("/l/a.txt"), "aa".getBytes("UTF-8"))
      put(fs, p("/l/sub/b.txt"), "bbb".getBytes("UTF-8"))
      val flat = fs.list(p("/l"), recursive = false)
      assert(flat.map(_.name).toSet == Set("a.txt", "sub"))
      assert(flat.find(_.name == "a.txt").exists(s => !s.isDir && s.size == 2L))
      assert(flat.find(_.name == "sub").exists(_.isDir))
      val deep = fs.list(p("/l"), recursive = true)
      assert(deep.map(_.name).toSet == Set("a.txt", "sub", "b.txt"))
      assert(fs.list(p("/absent"), recursive = true).isEmpty)
      assert(fs.stat(p("/absent")).isEmpty && !fs.exists(p("/absent")))
      assert(fs.exists(p("/l/a.txt")))
      // a freshly written file carries a real mtime (the mtime/created
      // filters of FilesModel depend on it)
      assert(fs.stat(p("/l/a.txt")).exists(_.mtime > 0L))
      assert(fs.host.nonEmpty)
    }
  }

  test(s"$name: mkdirs idempotent + intermediates; rename; overwrite; delete") {
    withFs { fs =>
      fs.mkdirs(p("/m/x")) // intermediate /m created implicitly
      fs.mkdirs(p("/m/x")) // second call must not fail
      put(fs, p("/m/x/f1"), "one".getBytes("UTF-8"))
      assert(fs.rename(p("/m/x/f1"), p("/m/x/f2")))
      assert(!fs.exists(p("/m/x/f1")) && fs.exists(p("/m/x/f2")))
      put(fs, p("/m/x/f2"), "TWO!".getBytes("UTF-8")) // create() overwrites
      assert(get(fs, p("/m/x/f2")).toSeq == "TWO!".getBytes("UTF-8").toSeq)
      assert(fs.delete(p("/m/x/f2")))
      assert(!fs.exists(p("/m/x/f2")))
      assert(!fs.delete(p("/m/x/f2"))) // absent -> false, not a throw
    }
  }

  test(s"$name: two-handle streaming transfer (the FileManager shape)") {
    withFs { src =>
      withFs { dst =>
        src.mkdirs(p("/t1"))
        dst.mkdirs(p("/t2"))
        put(src, p("/t1/x.bin"), Array.tabulate[Byte](4096)(i => (i * 7).toByte))
        val in = src.open(p("/t1/x.bin"))
        val out = dst.create(p("/t2/x.bin"))
        try in.transferTo(out) finally { in.close(); out.close() }
        assert(get(dst, p("/t2/x.bin")).toSeq == get(src, p("/t1/x.bin")).toSeq)
      }
    }
  }
}

/** Local-directory endpoint (mounted-server adapter / loopback double). */
class LocalDirContractSpec extends AnyFunSuite with RemoteFsContract {
  def name = "LocalDirRemoteFs"
  private lazy val root = Files.createTempDirectory("contract_localdir").toString
  def makeFs(): RemoteFs = new LocalDirRemoteFs(root)
}

/** Hadoop FileSystem endpoint over the local scheme (the cluster-native
  * path — same adapter serves HDFS/S3A). */
class HadoopContractSpec extends AnyFunSuite with RemoteFsContract {
  def name = "HadoopRemoteFs"
  private lazy val root = Files.createTempDirectory("contract_hadoop").toString
  def makeFs(): RemoteFs =
    RemoteFsRegistry.open(root, new Configuration())._1
  override def p(rel: String): String = root + rel
}

/** Real-socket FTP client against the in-process RFC 959 server. */
class FtpContractSpec extends AnyFunSuite with RemoteFsContract {
  def name = "FtpRemoteFs"
  private lazy val root = Files.createTempDirectory("contract_ftp")
  private lazy val srv = new TestFtpServer(root)
  def makeFs(): RemoteFs =
    FtpRemoteFs.connect(URI.create(s"ftp://demo:pw@127.0.0.1:${srv.port}"))
  override def afterAll(): Unit = srv.stop()
}

/** The `sftp` scheme as registered in [[RemoteFsRegistry]] — out of the
  * box the loopback stand-in; swap in a jsch/sshj-backed factory and
  * THIS suite is its acceptance gate (see [[RemoteFsContract]]).
  */
class SftpContractSpec extends AnyFunSuite with RemoteFsContract {
  def name = "sftp scheme"
  private lazy val root = Files.createTempDirectory("contract_sftp").toString
  def makeFs(): RemoteFs = {
    // register the stand-in unless a real factory is already present
    if (!RemoteFsRegistry.registered("sftp"))
      RemoteFsRegistry.register("sftp",
        uri => new LocalDirRemoteFs(root, Option(uri.getHost).getOrElse("edge")))
    RemoteFsRegistry.open("sftp://edge/", new Configuration())._1
  }
}
