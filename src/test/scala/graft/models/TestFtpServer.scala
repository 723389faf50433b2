package graft.models

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import scala.jdk.CollectionConverters._

/** In-process FTP server for loopback tests: the RFC 959 + RFC 3659
  * subset [[FtpRemoteFs]] speaks (USER/PASS/TYPE/PASV/MLSD/NLST/RETR/
  * STOR/DELE/MKD/RMD/CWD/SIZE/MDTM/RNFR/RNTO/QUIT), serving a local
  * root directory. `mlsd = false` simulates a pre-3659 server so the
  * NLST+probe fallback path gets coverage. Test scaffolding only.
  */
final class TestFtpServer(root: Path, mlsd: Boolean = true) {

  private val server = new ServerSocket(0, 8,
    java.net.InetAddress.getByName("127.0.0.1"))
  @volatile private var alive = true

  def port: Int = server.getLocalPort

  private val mdtmFmt = DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
    .withZone(ZoneOffset.UTC)

  private def res(p: String): Path = Paths.get(root.toString, p.stripPrefix("/"))

  private val acceptor = new Thread(() => {
    while (alive) {
      try {
        val s = server.accept()
        new Thread(() => session(s), "ftp-session").start()
      } catch { case _: Exception => () }
    }
  }, "ftp-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def session(sock: Socket): Unit = {
    val in = new BufferedReader(
      new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    val out = new PrintWriter(sock.getOutputStream, true)
    def send(s: String): Unit = { out.print(s + "\r\n"); out.flush() }
    var dataSrv: ServerSocket = null
    var rnfr: String = null
    send("220 graft test FTP")
    try {
      var line = in.readLine()
      while (line != null) {
        val sp = line.indexOf(' ')
        val (cmd, arg) =
          if (sp < 0) (line.toUpperCase, "")
          else (line.take(sp).toUpperCase, line.drop(sp + 1))
        def withData(f: Socket => Unit): Unit =
          if (dataSrv == null) send("425 use PASV first")
          else {
            send("150 opening data connection")
            val d = dataSrv.accept()
            try f(d) finally { d.close(); dataSrv.close(); dataSrv = null }
            send("226 transfer complete")
          }
        cmd match {
          case "USER" => send(if (arg == "demo" || arg == "anonymous") "331 need password" else "530 unknown user")
          case "PASS" => send("230 logged in")
          case "TYPE" => send("200 binary")
          case "QUIT" => send("221 bye"); sock.close(); return
          case "PASV" =>
            if (dataSrv != null) dataSrv.close()
            dataSrv = new ServerSocket(0, 1,
              java.net.InetAddress.getByName("127.0.0.1"))
            val p = dataSrv.getLocalPort
            send(s"227 entering passive mode (127,0,0,1,${p / 256},${p % 256})")
          case "MLSD" if mlsd =>
            val dir = res(arg)
            if (!Files.isDirectory(dir)) send("550 no such directory")
            else withData { d =>
              val w = new PrintWriter(d.getOutputStream, true)
              Files.list(dir).iterator().asScala.toSeq.sortBy(_.toString).foreach { p =>
                val typ = if (Files.isDirectory(p)) "dir" else "file"
                val size = if (Files.isDirectory(p)) 0L else Files.size(p)
                val mod = mdtmFmt.format(Instant.ofEpochMilli(
                  Files.getLastModifiedTime(p).toMillis))
                w.print(s"type=$typ;size=$size;modify=$mod; ${p.getFileName}\r\n")
              }
              w.flush()
            }
          case "MLSD" => send("500 MLSD not supported")
          case "NLST" =>
            val dir = res(arg)
            if (!Files.isDirectory(dir)) send("550 no such directory")
            else withData { d =>
              val w = new PrintWriter(d.getOutputStream, true)
              Files.list(dir).iterator().asScala.toSeq.sortBy(_.toString)
                .foreach(p => w.print(s"${p.getFileName}\r\n"))
              w.flush()
            }
          case "RETR" =>
            val f = res(arg)
            if (!Files.isRegularFile(f)) send("550 no such file")
            else withData(d => Files.copy(f, d.getOutputStream))
          case "STOR" =>
            withData { d =>
              Files.createDirectories(res(arg).getParent)
              Files.copy(d.getInputStream, res(arg),
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            }
          case "DELE" =>
            if (Files.isRegularFile(res(arg)) && Files.deleteIfExists(res(arg)))
              send("250 deleted")
            else send("550 no such file")
          case "RMD" =>
            if (Files.isDirectory(res(arg)) && Files.deleteIfExists(res(arg)))
              send("250 removed")
            else send("550 cannot remove")
          case "MKD" =>
            if (Files.exists(res(arg))) send("550 exists")
            else { Files.createDirectories(res(arg)); send(s"""257 "$arg" created""") }
          case "CWD" =>
            // probe-only server: no session cwd state, paths are absolute
            send(if (Files.isDirectory(res(arg))) "250 ok" else "550 no such dir")
          case "SIZE" =>
            if (Files.isRegularFile(res(arg))) send(s"213 ${Files.size(res(arg))}")
            else send("550 no such file")
          case "MDTM" =>
            if (Files.isRegularFile(res(arg)))
              send(s"213 ${mdtmFmt.format(Instant.ofEpochMilli(Files.getLastModifiedTime(res(arg)).toMillis))}")
            else send("550 no such file")
          case "RNFR" =>
            if (Files.exists(res(arg))) { rnfr = arg; send("350 ready") }
            else send("550 no such file")
          case "RNTO" =>
            if (rnfr == null) send("503 RNFR first")
            else {
              Files.createDirectories(res(arg).getParent)
              Files.move(res(rnfr), res(arg),
                java.nio.file.StandardCopyOption.REPLACE_EXISTING)
              rnfr = null; send("250 renamed")
            }
          case _ => send("502 not implemented")
        }
        line = in.readLine()
      }
    } catch { case _: Exception => () }
    finally { if (dataSrv != null) dataSrv.close(); sock.close() }
  }

  def stop(): Unit = { alive = false; server.close() }
}
