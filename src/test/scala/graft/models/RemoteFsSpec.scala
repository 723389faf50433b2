package graft.models

import java.nio.file.{Files, Paths}
import java.util.zip.GZIPInputStream

import graft.SparkSpec
import graft.core.{Calendar, StepContext}

/** The protocol seam under test: the reference's 13-case FileManager
  * matrix (models.py:1774-1908) collapses to (src endpoint, dst
  * endpoint) pairs — local<->FTP (real RFC 959 sockets against
  * [[TestFtpServer]]), local<->"sftp" (registered loopback endpoint;
  * the real client plugs in via the same one-line registration), and
  * FTP->sftp cross-protocol streaming.
  */
class RemoteFsSpec extends SparkSpec {

  private def ctx = StepContext(spark, Calendar.day("2023-01-01"))

  private def write(dir: String, name: String, content: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), content.getBytes("UTF-8"))
  }
  private def readStr(path: String): String =
    new String(Files.readAllBytes(Paths.get(path)), "UTF-8")

  test("FTP endpoint: list, copy local->ftp, move ftp->ftp, delete on ftp") {
    val serverRoot = Files.createTempDirectory("ftp_root")
    val srv = new TestFtpServer(serverRoot)
    val url = s"ftp://demo:pw@127.0.0.1:${srv.port}"
    try {
      // upload: local -> ftp (the _copy_from_localhost_to_remote case)
      val local = Files.createTempDirectory("ftp_src").toString
      write(local, "a.dat", "alpha")
      write(local, "b.dat", "beta")
      write(local, "skip.txt", "no")
      val up = FileManagerModel(local, action = "copy", mask = Some("\\.dat$"),
        destinations = Seq(s"$url/in")).execute(ctx)
      assert(up.resultValue.contains(2L))
      assert(readStr(s"$serverRoot/in/a.dat") == "alpha")
      assert(readStr(s"$serverRoot/in/b.dat") == "beta")
      assert(!Files.exists(Paths.get(s"$serverRoot/in/skip.txt")))
      // atomic tempname left no droppings
      assert(!Files.exists(Paths.get(s"$serverRoot/in/a.dat.tmp")))

      // listing through the same seam (FilenamesModel over ftp://)
      val listed = FilenamesModel(s"$url/in", mask = Some("\\.dat$"))
        .extract(ctx).collect()
      assert(listed.length == 2)
      assert(listed.map(_.getAs[String]("file")).sorted.toSeq == Seq("a.dat", "b.dat"))
      assert(listed.forall(_.getAs[String]("host") == "127.0.0.1"))
      assert(listed.forall(_.getAs[Long]("size") > 0))

      // remote -> remote on the same server (move = copy + delete)
      FileManagerModel(s"$url/in", action = "move", mask = Some("^a\\."),
        destinations = Seq(s"$url/archive")).execute(ctx)
      assert(readStr(s"$serverRoot/archive/a.dat") == "alpha")
      assert(!Files.exists(Paths.get(s"$serverRoot/in/a.dat")))

      // download: ftp -> local with gunzip-free straight copy
      val dl = Files.createTempDirectory("ftp_dl").toString
      FileManagerModel(s"$url/in", action = "copy",
        destinations = Seq(dl)).execute(ctx)
      assert(readStr(s"$dl/b.dat") == "beta")

      // delete on the remote
      FileManagerModel(s"$url/in", action = "delete").execute(ctx)
      assert(!Files.exists(Paths.get(s"$serverRoot/in/b.dat")))
    } finally srv.stop()
  }

  test("FTP without MLSD: NLST+SIZE/MDTM fallback lists and copies") {
    val serverRoot = Files.createTempDirectory("ftp959_root")
    val srv = new TestFtpServer(serverRoot, mlsd = false)
    val url = s"ftp://demo:pw@127.0.0.1:${srv.port}"
    try {
      write(serverRoot.toString, "old.csv", "x,y")
      val listed = FilenamesModel(s"$url/", mask = Some("\\.csv$"))
        .extract(ctx).collect()
      assert(listed.length == 1)
      assert(listed.head.getAs[Long]("size") == 3L)
      val dl = Files.createTempDirectory("ftp959_dl").toString
      FileManagerModel(s"$url/", action = "copy",
        destinations = Seq(dl)).execute(ctx)
      assert(readStr(s"$dl/old.csv") == "x,y")
    } finally srv.stop()
  }

  test("registered sftp-scheme endpoint drives the same matrix (seam contract)") {
    // the loopback endpoint stands in for an SSH-backed client: the
    // registration line is exactly what a production jsch/sshj adapter
    // uses (RemoteFsRegistry scaladoc)
    val sftpRoot = Files.createTempDirectory("sftp_root").toString
    RemoteFsRegistry.register("sftp",
      uri => new LocalDirRemoteFs(sftpRoot, uri.getHost))
    val local = Files.createTempDirectory("sftp_src").toString
    write(local, "r.bin", "payload")

    // local -> sftp with gzip in flight
    FileManagerModel(local, action = "copy", zip = true,
      destinations = Seq("sftp://edge-node/landing")).execute(ctx)
    val gz = Paths.get(sftpRoot, "landing", "r.bin.gz")
    assert(Files.exists(gz))
    val back = new GZIPInputStream(Files.newInputStream(gz)).readAllBytes()
    assert(new String(back, "UTF-8") == "payload")

    // sftp -> sftp move within the endpoint
    FileManagerModel("sftp://edge-node/landing", action = "move",
      destinations = Seq("sftp://edge-node/archive")).execute(ctx)
    assert(Files.exists(Paths.get(sftpRoot, "archive", "r.bin.gz")))
    assert(!Files.exists(Paths.get(sftpRoot, "landing", "r.bin.gz")))

    // host column reports the endpoint, as the reference's rows do
    val rows = FilenamesModel("sftp://edge-node/archive").extract(ctx).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("host") == "edge-node")
  }

  test("cross-protocol: ftp source streams to sftp destination") {
    val ftpRoot = Files.createTempDirectory("xp_ftp")
    val srv = new TestFtpServer(ftpRoot)
    val sftpRoot = Files.createTempDirectory("xp_sftp").toString
    RemoteFsRegistry.register("sftp",
      uri => new LocalDirRemoteFs(sftpRoot, uri.getHost))
    try {
      write(ftpRoot.toString, "feed.json", """{"k":1}""")
      // the reference needs a dedicated _copy_from_remote_by_ftp_to_
      // remote_by_sftp case (models.py:1884-1897); the seam gets it free
      FileManagerModel(s"ftp://demo:pw@127.0.0.1:${srv.port}/", action = "copy",
        mask = Some("\\.json$"),
        destinations = Seq("sftp://warehouse/stage")).execute(ctx)
      assert(readStr(s"$sftpRoot/stage/feed.json") == """{"k":1}""")
    } finally srv.stop()
  }
}
