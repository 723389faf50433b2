package graft.scheduler

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets

/** Failure alerting — the reference's per-job email alarm
  * (`pd_schedule.email_list` + SMTP error handler, pydin/core.py:
  * 1283-1305, config.py:130-138) as a pluggable seam: the scheduler
  * calls [[Alerter.alert]] whenever a run lands in a failure status
  * (E or T) for a job that names recipients; implementations decide
  * transport. [[SmtpAlerter]] is the built-in SMTP transport, an
  * RFC 5321 client over plain sockets (same no-external-jar approach as
  * the FTP client in `models/RemoteFs.scala`); alert failures are
  * swallowed by the scheduler — alerting must never affect scheduling.
  */
final case class AlertEvent(
    jobId: Long,
    jobName: String,
    runId: Long,
    status: String, // E or T
    recipients: Seq[String])

trait Alerter {
  def alert(event: AlertEvent): Unit
}

object Alerter {
  /** Default: alerts disabled (EMAIL_TOGGLE = False, config.py:130). */
  object Noop extends Alerter {
    def alert(event: AlertEvent): Unit = ()
  }

  /** Test/inspection sink: records every event. */
  final class Recording extends Alerter {
    val events = new java.util.concurrent.ConcurrentLinkedQueue[AlertEvent]()
    def alert(event: AlertEvent): Unit = events.add(event)
  }
}

/** Minimal RFC 5321 SMTP submission client: HELO, MAIL FROM, one RCPT
  * per recipient, DATA with a plain-text failure report, QUIT. No TLS
  * and no AUTH — the in-datacenter relay case (the reference's default
  * config is likewise an unauthenticated host/port pair); wrap or
  * replace the [[Alerter]] for anything richer.
  */
final class SmtpAlerter(host: String, port: Int, from: String,
                        timeoutMs: Int = 10000) extends Alerter {

  def alert(event: AlertEvent): Unit = {
    if (event.recipients.isEmpty) return
    val sock = new Socket()
    sock.connect(new InetSocketAddress(host, port), timeoutMs)
    sock.setSoTimeout(timeoutMs)
    try {
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = new PrintWriter(sock.getOutputStream, false)
      def send(line: String): Unit = { out.print(line + "\r\n"); out.flush() }
      def expect(codes: Set[Int]): Unit = {
        var line = in.readLine()
        if (line == null) sys.error("smtp: connection closed")
        // skip multi-line replies ("250-..." continues, "250 ..." ends)
        while (line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
        val code = line.take(3).toInt
        require(codes.contains(code), s"smtp: unexpected reply $line")
      }
      expect(Set(220))
      send(s"HELO graft"); expect(Set(250))
      send(s"MAIL FROM:<$from>"); expect(Set(250))
      event.recipients.foreach { r =>
        send(s"RCPT TO:<$r>"); expect(Set(250, 251))
      }
      send("DATA"); expect(Set(354))
      val body = Seq(
        s"From: <$from>",
        s"To: ${event.recipients.map(r => s"<$r>").mkString(", ")}",
        s"Subject: [graft] job ${event.jobName} (id ${event.jobId}) " +
          s"run ${event.runId} finished with status ${event.status}",
        "",
        s"Job: ${event.jobName} (id ${event.jobId})",
        s"Run: ${event.runId}",
        s"Status: ${event.status} (${if (event.status == "T") "timeout"
          else "error"})")
      // dot-stuff per RFC 5321 §4.5.2
      body.foreach(l => send(if (l.startsWith(".")) "." + l else l))
      send("."); expect(Set(250))
      send("QUIT")
    } finally sock.close()
  }
}
