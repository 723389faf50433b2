package graft.scheduler

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.ConcurrentLinkedQueue

import org.scalatest.funsuite.AnyFunSuite

class RestServerSpec extends AnyFunSuite {

  private class Recorder extends JobRunner {
    val runs = new ConcurrentLinkedQueue[(Long, Long)]()
    def run(job: JobSpec, tag: Long): Unit = runs.add((job.id, tag))
  }

  test("REST surface: auth, create/enable/run/history round trip") {
    val rec = new Recorder
    val sched = new Scheduler(rec)
    val driver = new Driver(sched)
    val srv = new RestServer(driver, token = "s3cret").start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    val http = HttpClient.newHttpClient()

    def call(path: String, token: Option[String] = Some("s3cret"),
             post: Option[String] = None): HttpResponse[String] = {
      var b = HttpRequest.newBuilder(URI.create(base + path))
      token.foreach(t => b = b.header("Authorization", s"Bearer $t"))
      post.foreach(p => b = b.POST(HttpRequest.BodyPublishers.ofString(p)))
      http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    }

    try {
      // auth gate (web.py:146-151)
      assert(call("/api/test", token = None).statusCode() == 401)
      assert(call("/api/test", token = Some("wrong")).statusCode() == 401)
      assert(call("/api/test").body() == """{"status":"ok"}""")
      assert(call("/api/help").body().contains("/api/run-job"))

      // create (disabled job with a never-matching schedule: manual-only)
      val created = call("/api/create-job",
        post = Some("name=rest-job&sec=-"))
      assert(created.statusCode() == 200 && created.body() == """{"created":1}""")
      assert(call("/api/jobs").body() ==
        """[{"id":1,"name":"rest-job","enabled":true}]""")

      assert(call("/api/disable-job", post = Some("id=1")).body() ==
        """{"disabled":true}""")
      assert(call("/api/enable-job", post = Some("id=1")).body() ==
        """{"enabled":true}""")
      assert(call("/api/enable-job", post = Some("id=99")).statusCode() == 404)

      // run with an explicit logical tag
      val run = call("/api/run-job", post = Some("id=1&tag=1672531200"))
      assert(run.statusCode() == 200 && run.body().contains(""""tag":1672531200"""))
      assert(sched.drain())
      assert(rec.runs.peek() == (1L, 1672531200L))
      val hist = call("/api/history").body()
      assert(hist.contains(""""status":"D""""))

      // all 13 reference endpoints advertised (web.py:154-322)
      val help = call("/api/help").body()
      Seq("test", "help", "jobs", "create-job", "enable-job", "disable-job",
        "run-job", "cancel-run", "deactivate-run", "start-scheduler",
        "stop-scheduler", "history", "sync-repo")
        .foreach(e => assert(help.contains(s"/api/$e"), s"missing /api/$e"))

      // scheduler lifecycle over REST: start is exclusive, stop re-arms
      assert(call("/api/start-scheduler", post = Some("")).body() ==
        """{"started":true}""")
      assert(call("/api/start-scheduler", post = Some("")).statusCode() == 409)
      assert(call("/api/stop-scheduler", post = Some("")).body() ==
        """{"stopped":true}""")
      assert(call("/api/stop-scheduler", post = Some("")).statusCode() == 409)
      assert(call("/api/start-scheduler", post = Some("")).body() ==
        """{"started":true}""")
      assert(call("/api/stop-scheduler", post = Some("")).body() ==
        """{"stopped":true}""")

      // deactivate-run: parked W runs are deactivatable, unknown ids 404
      // (park a second run behind a parallelism-1 job mid-flight is racy
      // over HTTP, so park via a sleep window instead: job asleep all day)
      val sleepy = call("/api/create-job",
        post = Some("name=sleepy&sec=-&id=7"))
      assert(sleepy.statusCode() == 200)
      driver.configureJob(7L, _.copy(sleepPeriod = Some("0-23")))
      val parked = call("/api/run-job", post = Some("id=7&tag=1672531200"))
      assert(parked.statusCode() == 200)
      val runId = """"run_id":(\d+)""".r.findFirstMatchIn(parked.body())
        .get.group(1).toLong
      assert(call("/api/deactivate-run",
        post = Some(s"run_id=$runId")).body() == """{"deactivated":true}""")
      assert(call("/api/deactivate-run",
        post = Some(s"run_id=$runId")).statusCode() == 404) // already gone
      assert(sched.waitingRunIds.isEmpty)
    } finally { srv.stop(); sched.stop() }
  }

  test("/api/sync-repo pulls the git job repo and registers restored jobs") {
    // publisher side: a repository with one job, pushed to a bare remote
    val dbA = graft.core.DatabaseSource("restsyncA",
      "jdbc:derby:memory:graftrestsyncA;create=true")
    val repoA = new graft.core.Repository(dbA)
    val id = repoA.saveJob(JobSpec(0L, "synced-job",
      schedule = Cron.Schedule(sec = Some("-"))))
    val remote = java.nio.file.Files.createTempDirectory("sync_remote").toString
    val tree = java.nio.file.Files.createTempDirectory("sync_tree").toString
    new ProcessBuilder("git", "init", "-q", "--bare", remote).start().waitFor()
    graft.core.JobsRepo.createRepo(repoA, tree, remote = Some(remote))
    graft.core.JobsRepo.pushRepo(repoA, tree)

    // subscriber side: fresh db + clone behind the REST server
    val dbB = graft.core.DatabaseSource("restsyncB",
      "jdbc:derby:memory:graftrestsyncB;create=true")
    val repoB = new graft.core.Repository(dbB)
    val clone = java.nio.file.Files.createTempDirectory("sync_clone").toString
    new ProcessBuilder("git", "clone", "-q", remote, clone).start().waitFor()
    val sched = new Scheduler(new Recorder)
    val driver = new Driver(sched)
    val srv = new RestServer(driver, token = "s3cret",
      repo = Some(repoB), repoDir = Some(clone)).start()
    val http = HttpClient.newHttpClient()
    try {
      val r = http.send(HttpRequest.newBuilder(
          URI.create(s"http://127.0.0.1:${srv.boundPort}/api/sync-repo"))
        .header("Authorization", "Bearer s3cret")
        .POST(HttpRequest.BodyPublishers.ofString("")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200 && r.body() == """{"synced":1}""")
      assert(driver.listJobs().exists(j => j.id == id && j.name == "synced-job"))
      assert(repoB.loadJobs().exists(_.id == id)) // durable too
    } finally { srv.stop(); sched.stop() }
  }

  test("scheduler refresh from the durable repository") {
    val db = graft.core.DatabaseSource("restdb",
      "jdbc:derby:memory:graftrest;create=true")
    val repo = new graft.core.Repository(db)
    val id = repo.saveJob(JobSpec(0L, "from-db",
      schedule = Cron.Schedule(sec = Some("-"))))
    val sched = new Scheduler(new Recorder)
    sched.refreshFrom(repo)
    assert(sched.job(id).exists(_.name == "from-db"))
    repo.deleteJob(id)
    sched.refreshFrom(repo)
    assert(sched.job(id).isEmpty)
    sched.stop()
  }

  test("lakehouse table verbs over REST: tables/describe/maintain/reap") {
    val spark = graft.SparkSpec.session // shared local session
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import graft.operators.Layout
    val root = java.nio.file.Files.createTempDirectory("rest_tables")
      .toString
    val dir = s"$root/orders"
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"),
      keys = Seq("k"), versionCol = Some("ver"))
    (1 to 3).foreach(i => Layout.mergeManifestDelta(spark, dir,
      Seq((10L + i, "a", i * 1.0, 2L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver"))
    val srv = new RestServer(new Driver(new Scheduler(new Recorder)),
      token = "s3cret").start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    val http = HttpClient.newHttpClient()
    def call(path: String, post: Option[String] = None):
        HttpResponse[String] = {
      var b = HttpRequest.newBuilder(URI.create(base + path))
        .header("Authorization", "Bearer s3cret")
      post.foreach(p0 => b = b.POST(HttpRequest.BodyPublishers.ofString(p0)))
      http.send(b.build(), HttpResponse.BodyHandlers.ofString())
    }
    def enc(s0: String): String =
      java.net.URLEncoder.encode(s0, "UTF-8")
    try {
      val listed = call(s"/api/tables?root=${enc(root)}").body()
      assert(listed.contains("\"name\":\"orders\"") &&
        listed.contains("\"version\":4") &&
        listed.contains("\"pendingDeltaRels\":1"), listed)
      val desc = call(s"/api/describe-table?path=${enc(dir)}").body()
      assert(desc.contains("\"keys\":[\"k\"]") &&
        desc.contains("\"versionCol\":\"ver\"") &&
        desc.contains("\"retainedVersions\":[1,2,3,4]") &&
        desc.contains("\"name\":\"part\""), desc)
      assert(call(s"/api/describe-table?path=${enc(root)}/nope")
        .statusCode() == 404)
      val maint = call("/api/maintain-table", post = Some(
        s"path=${enc(dir)}&max_pending_deltas=3")).body()
      assert(maint.contains("fold=part=a"), maint)
      val reaped = call("/api/reap-table", post = Some(
        s"path=${enc(dir)}&keep_versions=1")).body()
      assert(reaped.contains("\"reaped\":") &&
        !reaped.contains("\"reaped\":0"), reaped)
      assert(Layout.readManifest(spark, dir).count() == 5)
      // metadata-only partition-spec change over HTTP: one publish,
      // rows intact, the new spec live
      val respec = call("/api/respec-table", post = Some(
        s"path=${enc(dir)}&partition_cols=ver")).body()
      assert(respec.contains("\"respec\":\"ver\""), respec)
      val m2 = Layout.readManifestMeta(spark, dir,
        Layout.manifestVersion(spark, dir).get)
      assert(m2.partitionCols == Seq("ver") &&
        m2.specHistory == Seq(Seq("part")))
      assert(Layout.readManifest(spark, dir).count() == 5)
      // full-rewrite repartition over HTTP finishes the migration AND
      // adopts a data-bucket layout in place
      val repart = call("/api/repartition-table", post = Some(
        s"path=${enc(dir)}&partition_cols=ver" +
          "&new_bucket_cols=k&new_buckets=2")).body()
      assert(repart.contains("\"repartition\":\"ver\""), repart)
      val m3 = Layout.readManifestMeta(spark, dir,
        Layout.manifestVersion(spark, dir).get)
      assert(m3.specHistory.isEmpty && m3.dataBuckets == 2 &&
        m3.dataBucketCols == Seq("k"))
      assert(Layout.readManifest(spark, dir).count() == 5)
    } finally srv.stop()
  }
}
