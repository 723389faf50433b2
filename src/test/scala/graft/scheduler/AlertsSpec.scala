package graft.scheduler

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.concurrent.{CountDownLatch, TimeUnit}

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Status

/** Failure alerting: the SMTP client against an in-process RFC 5321
  * server (the TestFtpServer precedent), and the scheduler's alert hook
  * (E and T fire with recipients; success doesn't; alert failures don't
  * break scheduling).
  */
class AlertsSpec extends AnyFunSuite {

  /** One-connection SMTP server capturing the full dialogue. */
  private final class TestSmtpServer {
    val server = new ServerSocket(0)
    val from = mutable.Buffer[String]()
    val rcpt = mutable.Buffer[String]()
    val data = mutable.Buffer[String]()
    val done = new CountDownLatch(1)
    val thread = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = new PrintWriter(sock.getOutputStream, false)
      def send(l: String): Unit = { out.print(l + "\r\n"); out.flush() }
      send("220 test ESMTP")
      var inData = false
      var line = in.readLine()
      while (line != null) {
        if (inData) {
          if (line == ".") { inData = false; send("250 OK") }
          else data += (if (line.startsWith("..")) line.drop(1) else line)
        } else line.split(":", 2)(0).split(" ")(0).toUpperCase match {
          case "HELO" | "EHLO" => send("250 test")
          case "MAIL" => from += line.drop(10).trim; send("250 OK")
          case "RCPT" => rcpt += line.drop(8).trim; send("250 OK")
          case "DATA" => inData = true; send("354 go")
          case "QUIT" => send("221 bye"); sock.close(); done.countDown(); line = null
          case _ => send("250 OK")
        }
        if (line != null) line = in.readLine()
      }
      done.countDown()
    })
    thread.setDaemon(true)
    thread.start()
    def port: Int = server.getLocalPort
  }

  test("SmtpAlerter: full dialogue, recipients, dot-stuffed body") {
    val srv = new TestSmtpServer
    new SmtpAlerter("127.0.0.1", srv.port, "graft@test").alert(
      AlertEvent(7L, "nightly_etl", 42L, "E", Seq("a@x.io", "b@y.io")))
    assert(srv.done.await(5, TimeUnit.SECONDS))
    assert(srv.from.toSeq == Seq("<graft@test>"))
    assert(srv.rcpt.toSeq == Seq("<a@x.io>", "<b@y.io>"))
    val body = srv.data.mkString("\n")
    assert(body.contains("Subject: [graft] job nightly_etl (id 7) run 42" +
      " finished with status E"))
    assert(body.contains("Status: E (error)"))
  }

  test("scheduler alerts on E with recipients; success and no-list stay silent") {
    val rec = new Alerter.Recording
    val runner: JobRunner = (job: JobSpec, _: Long) =>
      if (job.name == "boom") sys.error("fail") else ()
    val s = new Scheduler(runner, alerter = rec)
    val ok = JobSpec(1L, "fine", emailList = Seq("ops@x.io"))
    val boom = JobSpec(2L, "boom", emailList = Seq("ops@x.io"))
    val silent = JobSpec(3L, "boom") // fails, but no recipients
    Seq(ok, boom, silent).foreach(s.register)
    s.charge(ok, 1L); s.charge(boom, 1L); s.charge(silent, 1L)
    assert(s.drain())
    val events = rec.events.toArray(Array.empty[AlertEvent])
    assert(events.length == 1)
    assert(events(0).jobId == 2L && events(0).status == "E" &&
      events(0).recipients == Seq("ops@x.io"))
    s.stop()
  }

  test("a throwing alerter does not affect run completion") {
    val bad = new Alerter {
      def alert(e: AlertEvent): Unit = sys.error("smtp down")
    }
    val runner: JobRunner = (_: JobSpec, _: Long) => sys.error("fail")
    val s = new Scheduler(runner, alerter = bad)
    val job = JobSpec(1L, "boom", emailList = Seq("ops@x.io"), rerunLimit = 1)
    s.register(job)
    s.charge(job, 1L)
    assert(s.drain())
    // the run completed with E despite the alerter throwing
    assert(s.history.toArray(Array.empty[(RunRecord, String)])
      .exists { case (r, st) => r.job.id == 1L && st == Status.Error })
    s.stop()
  }
}
