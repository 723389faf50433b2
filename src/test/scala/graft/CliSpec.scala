package graft

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}

import graft.core.{DatabaseSource, JdbcLedger}

/** The interactive console (cli.py:115-129) driven end to end over
  * scripted stdin: create, list, enable/disable, help, an unknown verb
  * that must NOT kill the loop, component status, and quit.
  */
class CliSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftcli;create=true"

  private def runConsole(script: String): String = {
    val out = new ByteArrayOutputStream()
    Cli.console(url, new BufferedReader(new StringReader(script)),
      new PrintStream(out, true, "UTF-8"))
    new String(out.toByteArray, "UTF-8")
  }

  test("console drives create/list/enable/help/status and survives typos") {
    val text = runConsole(
      """help
        |create-job name=nightly hour=2 min=30 sec=0
        |list-jobs
        |disable-job 1
        |list-jobs
        |enable-job 1
        |nonsense-verb
        |help run-job
        |status
        |quit
        |""".stripMargin)
    assert(text.contains("create-job name=<n>")) // help list
    assert(text.contains("created job 1 (nightly)"))
    assert(text.contains("nightly"))
    assert(text.contains(" 1 N nightly")) // disabled listing
    assert(text.contains(" 1 Y nightly")) // re-enabled listing
    assert(text.contains("unknown command: nonsense-verb"))
    assert(text.contains("execute the job's pipeline now")) // verb help
    assert(text.contains("SCHEDULER")) // component status from pd_components
    assert(text.contains("bye"))
  }

  test("one-shot deactivate-run stamps the ledger row") {
    val db = DatabaseSource("clidb", url)
    val ledger = new JdbcLedger(db)
    val runId = ledger.startRun(1L, 1672531200L)
    ledger.setRunStatus(runId, "W")
    val out = new ByteArrayOutputStream()
    assert(Cli.execute(url, Seq("deactivate-run", runId.toString),
      new PrintStream(out, true, "UTF-8")) == 0)
    val c = db.connect()
    try {
      val rs = c.createStatement().executeQuery(
        s"select deactivated from pd_run_history where id = $runId")
      assert(rs.next() && rs.getTimestamp(1) != null)
    } finally c.close()
  }

  test("components registry: 9 ledger tables exist, seeded rows present") {
    val db = DatabaseSource("clidb2", url)
    new JdbcLedger(db)
    val c = db.connect()
    try {
      val meta = c.getMetaData
      val expect = Seq("pd_run_history", "pd_task_history", "pd_step_history",
        "pd_query_log", "pd_file_log", "pd_schedule", "pd_pipeline_config",
        "pd_node_config", "pd_components")
      expect.foreach { t =>
        val rs = meta.getTables(null, null, t.toUpperCase, null)
        assert(rs.next(), s"missing ledger table $t")
      }
      val rs = c.createStatement().executeQuery(
        "select id from pd_components order by id")
      val ids = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString(1)).toSeq
      assert(ids == Seq("RESTAPI", "SCHEDULER"))
    } finally c.close()
  }

  test("install writes config skeletons; GraftConfig round-trips with defaults") {
    import graft.core.GraftConfig
    val dir = java.nio.file.Files.createTempDirectory("graft_install").toString
    val out = new ByteArrayOutputStream()
    assert(Cli.execute(url, Seq("install", dir),
      new PrintStream(out, true, "UTF-8")) == 0)
    val cfg = GraftConfig.load(new java.io.File(s"$dir/graft.ini"))
    // skeleton carries the reference defaults (config.py:146-156)
    assert(cfg.chargersNumber == 5 && cfg.executorsNumber == 20)
    assert(cfg.refreshInterval == 300 && cfg.rerunDelay == 14400)
    assert(cfg.apiPort == 8080 && cfg.apiToken.isEmpty)
    assert(cfg.databaseUrl.contains(url))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/sources.ini")))

    // overridden knobs flow into the scheduler factory
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/custom.ini"),
      "[SCHEDULER]\nexecutors_number = 3\nrerun_delay = 60\n[API]\nport = 9999\n")
    val c2 = GraftConfig.load(new java.io.File(s"$dir/custom.ini"))
    assert(c2.executorsNumber == 3 && c2.rerunDelay == 60 && c2.apiPort == 9999)
    assert(c2.chargersNumber == 5) // absent key keeps the default
    val sched = GraftConfig.schedulerFrom(c2, (_, _) => ())
    assert(!sched.isAlive)
    sched.stop()
  }

  test("serve: cron fire -> pipeline hydration -> Spark run -> ledger (end to end)") {
    val serveUrl = "jdbc:derby:memory:graftserve;create=true"
    val outDir = java.nio.file.Files.createTempDirectory("serve_out").toString
    val out = new ByteArrayOutputStream()
    val ps = new PrintStream(out, true, "UTF-8")
    // a job firing every second with a config-driven EL pipeline
    assert(Cli.execute(serveUrl,
      Seq("create-job", "name=every-second", "sec=*"), ps) == 0)
    val nodes = java.nio.file.Files.createTempFile("nodes", ".json")
    java.nio.file.Files.writeString(nodes,
      s"""[{"node_name":"src","node_type":"Parquet","node_seqno":1,
         |  "config":{"path":"${sf("region")}"}},
         | {"node_name":"dst","node_type":"JSON","node_seqno":2,
         |  "config":{"path":"$outDir/r"}}]""".stripMargin)
    assert(Cli.execute(serveUrl,
      Seq("configure-pipeline", "1", s"@$nodes"), ps) == 0)
    // the engine process, bounded to a few wall-clock seconds
    assert(Cli.execute(serveUrl, Seq("serve", "duration=6", "token=t"), ps) == 0)
    val text = new String(out.toByteArray, "UTF-8")
    assert(text.contains("serving: REST on port"))
    assert(text.contains("serve finished"))
    // the fired run(s) executed the pipeline for real
    assert(spark.read.json(s"$outDir/r").count() == 5)
    // and the ledger recorded completed runs
    val db = DatabaseSource("servedb", serveUrl)
    val c = db.connect()
    try {
      val rs = c.createStatement().executeQuery(
        "select count(*) from pd_run_history where status = 'D'")
      rs.next()
      assert(rs.getLong(1) >= 1L, "no Done runs recorded")
    } finally c.close()
  }

  test("live-engine verbs: cancel-run/-job/-jobs + restart-scheduler over REST; config/script verbs") {
    import graft.scheduler._
    val liveUrl = "jdbc:derby:memory:graftcli4;create=true"
    val db = DatabaseSource("clidb4", liveUrl)
    val ledger = new JdbcLedger(db)
    val runner: JobRunner = (_, _) => Thread.sleep(60000) // until canceled
    val sched = new Scheduler(runner, executorThreads = 4, ledger = Some(ledger))
    val driver = new Driver(sched)
    val srv = new RestServer(driver, token = "graft").start() // stamps url
    val out = new ByteArrayOutputStream()
    val ps = new PrintStream(out, true, "UTF-8")
    def text = new String(out.toByteArray, "UTF-8")
    def waitUntil(cond: => Boolean): Unit = {
      val dl = System.nanoTime() + 10000000000L
      while (!cond && System.nanoTime() < dl) Thread.sleep(20)
      assert(cond)
    }
    try {
      val job = JobSpec(7L, "sleeper", parallelism = "Y")
      driver.createJob(job)
      // cancel-run: CLI -> pd_components url -> REST -> thread interrupt
      val r1 = sched.charge(job, 1700000000L).get
      waitUntil(sched.runningRunIds(7L).contains(r1.runId))
      assert(Cli.execute(liveUrl, Seq("cancel-run", r1.runId.toString), ps) == 0)
      waitUntil(sched.history.size == 1)
      assert(sched.history.peek()._2 == core.Status.Canceled)
      // cancel-job: both running runs of job 7 go C
      sched.charge(job, 1700000001L); sched.charge(job, 1700000002L)
      waitUntil(sched.runningRunIds(7L).size == 2)
      assert(Cli.execute(liveUrl, Seq("cancel-job", "7"), ps) == 0)
      waitUntil(sched.history.size == 3)
      // cancel-jobs: the bulk sweep
      sched.charge(job, 1700000003L)
      waitUntil(sched.runningRunIds(7L).size == 1)
      assert(Cli.execute(liveUrl, Seq("cancel-jobs"), ps) == 0)
      waitUntil(sched.history.size == 4)
      assert(text.contains("\"canceled\""))
      // restart-scheduler: stop (not ticking -> false) then start -> ticking
      assert(Cli.execute(liveUrl, Seq("restart-scheduler"), ps) == 0)
      waitUntil(sched.isAlive)
      driver.stopScheduler()
      // an explicit url= override also reaches the engine
      assert(Cli.execute(liveUrl, Seq("cancel-run", "99999",
        s"url=http://127.0.0.1:${srv.boundPort}"), ps) // unknown run -> 404
        == 1)
    } finally { srv.stop(); sched.stop() }

    // config/script one-shots (headless forms)
    val dir = java.nio.file.Files.createTempDirectory("graft_cfg").toString
    assert(Cli.execute(liveUrl, Seq("create-config", s"$dir/graft.ini"), ps) == 0)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/graft.ini")))
    assert(Cli.execute(liveUrl, Seq("edit-config", s"$dir/graft.ini"), ps) == 0)
    assert(Cli.execute(liveUrl, Seq("edit-config", s"$dir/absent.ini"), ps) == 1)
    val repo = new core.Repository(db)
    val jid = repo.saveJob(JobSpec(0L, "scripted"))
    assert(Cli.execute(liveUrl, Seq("edit-script", jid.toString), ps) == 0)
    assert(text.contains("no script body"))
    JobScripts.register("scripted") { (_, _) => () }
    try {
      assert(Cli.execute(liveUrl, Seq("edit-script", jid.toString), ps) == 0)
      assert(text.contains("has a registered script body"))
    } finally JobScripts.clear()
    assert(Cli.execute(liveUrl, Seq("edit-script", "424242"), ps) == 1)
  }

  test("scheduler/REST lifecycle updates pd_components liveness") {
    import graft.scheduler._
    val db = DatabaseSource("clidb3", "jdbc:derby:memory:graftcli3;create=true")
    val ledger = new JdbcLedger(db)
    val sched = new Scheduler((_, _) => (), ledger = Some(ledger))
    val driver = new Driver(sched)
    assert(ledger.componentStatus("SCHEDULER").exists(_._1 != "Y"))
    assert(driver.startScheduler())
    assert(ledger.componentStatus("SCHEDULER").exists(_._1 == "Y"))
    assert(driver.stopScheduler())
    assert(ledger.componentStatus("SCHEDULER").exists(_._1 == "N"))

    val srv = new RestServer(driver, token = "t").start()
    try {
      val st = ledger.componentStatus("RESTAPI")
      assert(st.exists(_._1 == "Y"))
      assert(st.exists(_._3.exists(_.contains(srv.boundPort.toString))))
    } finally srv.stop()
    assert(ledger.componentStatus("RESTAPI").exists(_._1 == "N"))
    sched.stop()
  }

  test("table verbs: list/describe/maintain/reap/history drive a real " +
      "manifest table from the one-shot CLI") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    import graft.operators.Layout
    val root = java.nio.file.Files.createTempDirectory("cli_tables")
      .toString
    val dir = s"$root/orders"
    Layout.writeManifestTable(spark, dir,
      Seq((1L, "a", 10.0, 1L), (2L, "b", 20.0, 1L))
        .toDF("k", "part", "v", "ver"), Seq("part"),
      statsCols = Seq("k"), keys = Seq("k"), versionCol = Some("ver"))
    (1 to 3).foreach(i => Layout.mergeManifestDelta(spark, dir,
      Seq((10L + i, "a", i * 1.0, 2L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver"))
    def run(cmd: String*): String = {
      val out = new ByteArrayOutputStream()
      assert(Cli.execute(url, cmd.toSeq,
        new PrintStream(out, true, "UTF-8")) == 0, cmd.mkString(" "))
      new String(out.toByteArray, "UTF-8")
    }
    val listed = run("list-tables", root)
    assert(listed.contains("orders") && listed.contains("v4") &&
      listed.contains("keyed"), listed)
    val desc = run("describe-table", dir)
    assert(desc.contains("keys=k") && desc.contains("versionCol=ver"),
      desc)
    assert(desc.contains("partitioned by: part") &&
      desc.contains("pending-delta: 1"), desc)
    assert(desc.contains("retained versions: 1, 2, 3, 4"), desc)
    assert(desc.contains("v ") && desc.contains("double"), desc)
    val hist = run("table-history", dir)
    assert(hist.contains("op=seed") && hist.contains("op=delta"), hist)
    // maintain folds the deep partition, then reap with consent
    val maint = run("maintain-table", dir, "max_pending_deltas=3")
    assert(maint.contains("fold=part=a"), maint)
    // an age window covering every publish makes the reap a no-op
    // (count + age compose as the union)
    val agedNoop = run("reap-table", dir, "keep_versions=1",
      "keep_age_hours=9999")
    assert(agedNoop.contains("reaped 0"), agedNoop)
    val reaped = run("reap-table", dir, "keep_versions=1")
    assert(reaped.contains("reaped") && !reaped.contains("reaped 0"),
      reaped)
    assert(Layout.readManifest(spark, dir).count() == 5)
    // full-rewrite repartition verb: same spec restated, but adopting
    // a data-bucket layout in place makes it a real (non-noop) rewrite
    val repart = run("repartition-table", dir, "partition_cols=part",
      "new_bucket_cols=k", "new_buckets=2")
    assert(repart.contains("repartition") &&
      repart.contains("partitions)"), repart)
    val mB = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(mB.dataBuckets == 2 && mB.dataBucketCols == Seq("k"))
    assert(Layout.readManifest(spark, dir).count() == 5)
    // a non-table path reports instead of stack-tracing
    val out2 = new ByteArrayOutputStream()
    assert(Cli.execute(url, Seq("describe-table", s"$root/nope"),
      new PrintStream(out2, true, "UTF-8")) == 1)
    assert(new String(out2.toByteArray, "UTF-8")
      .contains("not a manifest table"))
  }
}
