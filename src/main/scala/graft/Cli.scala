package graft

import java.io.{BufferedReader, PrintStream}
import java.time.LocalDateTime

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.scheduler._

/** Command-line manager (pydin/cli.py:22-662): one-shot verbs against a
  * durable schedule DB, or — with no verb (or `console`) — the
  * reference's interactive console loop (cli.py:115-129): a prompt that
  * parses the same verbs until `quit`.
  *
  * {{{
  * graft.Cli <dbUrl>                          # interactive console
  * graft.Cli <dbUrl> create-job name=<n> [hour=<cron>] [min=<cron>] ...
  * graft.Cli <dbUrl> list-jobs | history | status
  * graft.Cli <dbUrl> enable-job <id> | disable-job <id> | delete-job <id>
  * graft.Cli <dbUrl> configure-pipeline <jobId> <nodesJson|@file>
  * graft.Cli <dbUrl> run-job <id> [date=<yyyy-MM-dd>]
  * graft.Cli <dbUrl> run-jobs [date=<yyyy-MM-dd>]
  * graft.Cli <dbUrl> deactivate-run <runId>
  * graft.Cli <dbUrl> help [verb]
  * }}}
  *
  * `run-job` hydrates the job's config-driven pipeline
  * (pd_pipeline_config/pd_node_config) and executes it in-process with
  * run/task/step ledger rows — the reference's `run job <id> date <d>`
  * (cli.py:286-343) without the subprocess hop (SURVEY.md §7.4.5).
  * Live-engine verbs (cancel-run/cancel-job/cancel-jobs/
  * restart-scheduler) reach the running `serve` process over its REST
  * surface, discovered from the pd_components registry — the same
  * CLI-drives-API shape as the reference (cli.py:361-397).
  */
object Cli {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { println(usage); sys.exit(2) }
    if (args.length == 1 || args(1) == "console") {
      console(args(0),
        new BufferedReader(new java.io.InputStreamReader(System.in)),
        System.out)
    } else {
      val code = execute(args(0), args.drop(1).toSeq, System.out)
      if (code != 0) sys.exit(code)
    }
  }

  /** The reference's interactive `start_console` (cli.py:115-129):
    * prompt, parse, dispatch, repeat until `quit`. Errors print and the
    * loop continues — a typo must not kill the session.
    */
  def console(url: String, in: BufferedReader, out: PrintStream): Unit = {
    out.println("graft manager console — type `help` for commands, `quit` to leave")
    var live = true
    while (live) {
      out.print(f"${LocalDateTime.now().getHour}%02d:${LocalDateTime.now().getMinute}%02d $$ ")
      out.flush()
      val line = in.readLine()
      if (line == null || line.trim == "quit") live = false
      else if (line.trim.nonEmpty) {
        try execute(url, line.trim.split("\\s+").toSeq, out)
        catch { case e: Exception => out.println(s"error: ${e.getMessage}") }
      }
    }
    out.println("bye")
  }

  /** Dispatch one verb; returns a process exit code (0 ok). Shared by
    * the one-shot path and the console loop. */
  def execute(url0: String, command: Seq[String], out: PrintStream): Int = {
    // auto-create embedded Derby DBs (also lets callers avoid the ';'
    // attribute, which tools like sbt's command parser swallow)
    val url = if (url0.startsWith("jdbc:derby:") && !url0.contains(";"))
      url0 + ";create=true" else url0
    val db = DatabaseSource("metadb", url)
    val repo = new Repository(db)
    val ledger = Ledger.jdbc(db)
    val rest = command.drop(1)
    val kv: Map[String, String] = rest.filter(_.contains('='))
      .map { a => val i = a.indexOf('='); a.take(i) -> a.drop(i + 1) }.toMap

    command.head match {
      case "help" =>
        rest.headOption match {
          case Some(verb) => helpTexts.collectFirst {
            case (v, t) if v == verb => t
          } match {
            case Some(t) => out.println(s"$verb\n  $t")
            case None => out.println(s"unknown command: $verb"); return 2
          }
          case None =>
            out.println("commands:")
            helpTexts.foreach { case (v, t) => out.println(f"  $v%-22s $t") }
        }
        0

      case "create-job" =>
        val spec = JobSpec(0L, kv.getOrElse("name", "job"),
          enabled = kv.get("enabled").forall(_.toBoolean),
          schedule = Cron.Schedule(kv.get("mday"), kv.get("hour"),
            kv.get("min"), kv.get("sec"), kv.get("wday"), kv.get("yday")),
          parallelism = kv.getOrElse("parallelism", "N"),
          timeoutSeconds = kv.get("timeout").map(_.toInt),
          emailList = kv.get("email_list").toSeq.flatMap(_.split(';'))
            .map(_.trim).filter(_.nonEmpty))
        val id = repo.saveJob(spec)
        out.println(s"created job $id (${spec.name})")
        0

      case "list-jobs" =>
        repo.loadJobs().foreach { j =>
          val cron = Seq(j.schedule.mday, j.schedule.hour, j.schedule.min,
            j.schedule.sec, j.schedule.wday, j.schedule.yday)
            .map(_.getOrElse("*")).mkString(" ")
          out.println(f"${j.id}%4d ${if (j.enabled) "Y" else "N"} ${j.name}%-24s [$cron]")
        }
        0

      case "enable-job" => repo.setJobStatus(rest(0).toLong, enabled = true)
        out.println(s"enabled ${rest(0)}"); 0
      case "disable-job" => repo.setJobStatus(rest(0).toLong, enabled = false)
        out.println(s"disabled ${rest(0)}"); 0
      case "delete-job" => repo.deleteJob(rest(0).toLong)
        out.println(s"deleted ${rest(0)}"); 0

      case "configure-pipeline" =>
        val jobId = rest(0).toLong
        // `@path` reads the JSON from a file — shells and launchers
        // (sbt's arg parser included) mangle inline JSON quoting
        val json = if (rest(1).startsWith("@"))
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(rest(1).drop(1))), "UTF-8")
        else rest(1)
        val nodes = PipelineConfig.parseJson(json)
        val pid = repo.savePipeline(jobId, s"job_${jobId}_pipeline", nodes)
        out.println(s"configured pipeline $pid for job $jobId (${nodes.size} nodes)")
        0

      case "run-job" =>
        val jobId = rest.find(!_.contains('=')).map(_.toLong)
          .getOrElse(sys.error("run-job <id>"))
        runOne(jobId, kv, repo, ledger, out)

      case "run-jobs" => // bulk verb (cli.py run_jobs): every enabled job
        val enabled = repo.loadJobs().filter(_.enabled)
        if (enabled.isEmpty) { out.println("no enabled jobs"); 0 }
        else enabled.map(j => runOne(j.id, kv, repo, ledger, out)).max

      case "deactivate-run" => // api.py:446-466, ledger-level stamp
        ledger.deactivateRun(rest(0).toLong)
        out.println(s"deactivated run ${rest(0)}")
        0

      // live-engine verbs (cli.py:169-210, 361-397): the reference CLI
      // drives its RUNNING scheduler through the API server; here the
      // engine's REST url comes from the pd_components registry that a
      // `serve` process stamps on startup (or an explicit url=).
      case "cancel-run" | "cancel-job" | "cancel-jobs" | "restart-scheduler" =>
        // the registry url is only trusted while the component is LIVE:
        // componentStopped() flips status to 'N' but leaves the url
        // column, so a stale row must not be dialed (api.py:320-335
        // keeps the same live-only contract via the pid check)
        val base = kv.get("url")
          .orElse(ledger.componentStatus("RESTAPI")
            .filter(_._1 == "Y").flatMap(_._3))
          .getOrElse {
            out.println("no running RESTAPI registered in pd_components; " +
              "pass url=<http://host:port>")
            return 1
          }
        val token = kv.getOrElse("token", "graft")
        def post(path: String, form: (String, String)*): (Int, String) =
          try restPost(base, token, path, form.toMap)
          catch { case scala.util.control.NonFatal(e) =>
            (-1, s"engine unreachable at $base (${e.getClass.getSimpleName}: " +
              s"${e.getMessage}); pass url=<http://host:port> of a live engine")
          }
        command.head match {
          case "cancel-run" => // cli.py:379-387
            val (c, b) = post("/api/cancel-run", "run_id" -> rest(0))
            out.println(b); if (c == 200) 0 else 1
          case "cancel-job" => // cli.py:361-369: all running runs of one job
            val (c, b) = post("/api/cancel-job", "id" -> rest(0))
            out.println(b); if (c == 200) 0 else 1
          case "cancel-jobs" => // cli.py:371-377: every running run
            val (c, b) = post("/api/cancel-jobs")
            out.println(b); if (c == 200) 0 else 1
          case _ => // restart-scheduler (cli.py:169-174): stop, then start
            val (_, b1) = post("/api/stop-scheduler")
            val (c2, b2) = post("/api/start-scheduler")
            out.println(s"$b1 $b2"); if (c2 == 200) 0 else 1
        }

      case "create-config" => // cli.py:399-406: global config skeleton
        val path = rest.headOption.getOrElse("graft.ini")
        GraftConfig.writeSkeleton(path, dbUrl = Some(url))
        out.println(s"global config created ($path)")
        0

      case "edit-config" => // cli.py:408-426; spawn $EDITOR only on a real
        // terminal, print the path in headless runs (tests, pipes)
        val path = rest.headOption.getOrElse("graft.ini")
        val exists = new java.io.File(path).exists
        sys.env.get("EDITOR") match {
          case Some(ed) if exists && System.console() != null =>
            new ProcessBuilder(ed, path).inheritIO().start().waitFor()
            out.println(s"edited $path"); 0
          case _ =>
            out.println(if (exists) s"edit $path with your editor"
              else s"$path not found — run create-config first")
            if (exists) 0 else 1
        }

      case "edit-script" => // cli.py:212-230: the per-job user script; the
        // JVM twin is a registered JobScripts body — report its status
        // and the registration incantation
        repo.loadJobs().find(_.id == rest(0).toLong) match {
          case None => out.println(s"no job ${rest(0)}"); 1
          case Some(j) =>
            out.println(
              if (JobScripts.resolve(j.name).isDefined)
                s"job ${j.id} ('${j.name}') has a registered script body"
              else s"job ${j.id} ('${j.name}') has no script body; register " +
                s"""one at startup: JobScripts.register("${j.name}") """ +
                "{ (spark, date) => ... }")
            0
        }

      case "serve" =>
        // the engine process (reference: scheduler.py + web.py behind one
        // launch): scheduler ticking, config-driven pipelines executing
        // on fire, REST admin surface, periodic schedule refresh
        // (core.py:812-833 + config refresh_interval). `duration=<sec>`
        // bounds the lifetime (tests/ops); absent = run until killed.
        val cfg = kv.get("config")
          .map(p => GraftConfig.load(new java.io.File(p)))
          .getOrElse(GraftConfig.default)
        val spark = SparkEntry.configure(SparkSession.builder()
          .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
          .config("spark.ui.enabled", "false")).getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        val runner = new PipelineJobRunner(spark, repo, new SourceRegistry, ledger)
        val sched = GraftConfig.schedulerFrom(cfg, runner, Some(ledger))
        sched.refreshFrom(repo)
        val driver = new Driver(sched)
        repo.loadJobs().foreach(driver.createJob)
        val token = kv.get("token").orElse(cfg.apiToken).getOrElse("graft")
        val port = kv.get("port").map(_.toInt).getOrElse(0)
        val srv = new RestServer(driver, token, port,
          repo = Some(repo), repoDir = kv.get("repoDir")).start()
        driver.startScheduler()
        out.println(s"serving: REST on port ${srv.boundPort}, " +
          s"scheduler ticking (${repo.loadJobs().size} jobs), " +
          s"refresh every ${cfg.refreshInterval}s")
        val deadline = kv.get("duration").map(d =>
          System.nanoTime() + d.toLong * 1000000000L)
        var lastRefresh = System.nanoTime()
        while (deadline.forall(System.nanoTime() < _)) {
          Thread.sleep(200)
          if ((System.nanoTime() - lastRefresh) / 1e9 >= cfg.refreshInterval) {
            sched.refreshFrom(repo) // pick up schedule edits (core.py:812-833)
            repo.loadJobs().foreach(driver.createJob)
            lastRefresh = System.nanoTime()
          }
        }
        driver.stopScheduler()
        srv.stop()
        sched.drain(30)
        sched.stop()
        out.println("serve finished")
        0

      case "install" => // install wizard (cli.py:131-147): config skeletons
        // + schema, non-interactively into <dir>
        val dir = rest.headOption.getOrElse(".")
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        GraftConfig.writeSkeleton(s"$dir/graft.ini", dbUrl = Some(url))
        GraftConfig.writeSourcesSkeleton(s"$dir/sources.ini")
        // ledger/repo construction created the 9 pd_* tables already
        out.println(s"installed: $dir/graft.ini, $dir/sources.ini, schema in $url")
        0

      case "status" => // component registry (pd_components)
        Seq("SCHEDULER", "RESTAPI").foreach { id =>
          val line = ledger.componentStatus(id) match {
            case Some((st, pid, urlOpt)) =>
              val liveness = if (st == "Y") "running" else "stopped"
              s"$liveness${pid.map(p => s" pid=$p").getOrElse("")}" +
                urlOpt.map(u => s" url=$u").getOrElse("")
            case None => "unknown"
          }
          out.println(f"$id%-10s $line")
        }
        0

      // git-versioned schedule (reference create_repo/push_repo/pull_repo)
      case "create-repo" =>
        JobsRepo.createRepo(repo, rest(0), kv.get("remote"))
        out.println(s"repo created at ${rest(0)}"); 0
      case "push-repo" =>
        val committed = JobsRepo.pushRepo(repo, rest(0),
          kv.getOrElse("message", "schedule sync"))
        out.println(if (committed) "pushed schedule changes" else "nothing to push")
        0
      case "pull-repo" =>
        val restored = JobsRepo.pullRepo(repo, rest(0))
        out.println(s"restored ${restored.size} job(s)"); 0

      // ---- lakehouse table verbs: the manifest admin surface from
      // the same one-shot CLI the reference's admin drives everything
      // with (cli.py:81-92 — jobs there, tables here) ----
      case "list-tables" =>
        val root = rest.filterNot(_.contains('=')).headOption.getOrElse {
          out.println("usage: list-tables <rootDir>"); return 2 }
        import graft.operators.Layout
        val spark = cliSpark()
        val rootP = new org.apache.hadoop.fs.Path(root)
        val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(rootP)) { out.println(s"no such dir: $root"); return 1 }
        val tables = fs.listStatus(rootP).filter(_.isDirectory)
          .map(_.getPath)
          .filter(p => Layout.manifestVersion(spark, p.toString).isDefined)
          .sortBy(_.getName)
        tables.foreach { p =>
          val v = Layout.manifestVersion(spark, p.toString).get
          val m = Layout.readManifestMeta(spark, p.toString, v)
          out.println(f"${p.getName}%-24s v$v%-4d " +
            f"${if (m.appendOnly) "append-only" else "keyed"}%-12s " +
            s"partitions=${m.allRels.size} " +
            s"pendingDeltaRels=${m.deltas.size} " +
            s"by=(${m.partitionCols.mkString(",")})")
        }
        if (tables.isEmpty) out.println("no manifest tables")
        0

      case "describe-table" =>
        val path = rest.filterNot(_.contains('=')).headOption.getOrElse {
          out.println("usage: describe-table <tableDir>"); return 2 }
        import graft.operators.Layout
        val spark = cliSpark()
        Layout.manifestVersion(spark, path) match {
          case None =>
            out.println(s"$path is not a manifest table"); 1
          case Some(v) =>
            val m = Layout.readManifestMeta(spark, path, v)
            out.println(s"path: $path")
            out.println(s"live version: $v (op=${m.op}" +
              s"${if (m.opDeletes) ", deletes" else ""})")
            out.println("kind: " +
              (if (m.appendOnly) "append-only (no merge spec can exist)"
               else "keyed"))
            if (m.morKeys.nonEmpty)
              out.println(s"merge spec: keys=${m.morKeys.mkString(",")} " +
                s"versionCol=${m.morVersionCol.getOrElse("")}")
            out.println(s"partitioned by: ${m.partitionCols.mkString(", ")}")
            out.println(s"partitions: ${m.allRels.size} " +
              s"(pending-delta: ${m.deltas.size})")
            val retained = Layout.manifestVersions(spark, path)
            out.println(s"retained versions: ${retained.mkString(", ")}")
            if (m.statsCols.nonEmpty)
              out.println(s"stats columns: ${m.statsCols.mkString(", ")}")
            if (m.bloomCols.nonEmpty)
              out.println(s"bloom columns: ${m.bloomCols.mkString(", ")}")
            if (m.colAliases.nonEmpty)
              out.println("rename chains: " + m.colAliases.toSeq.sortBy(_._1)
                .map { case (c, olds) => s"$c<-${olds.mkString("<-")}" }
                .mkString(", "))
            if (m.droppedCols.nonEmpty)
              out.println("dropped (haunted) names: " +
                m.droppedCols.mkString(", "))
            out.println("schema:")
            graft.operators.Layout.manifestSchema(m).fields.foreach(f =>
              out.println(f"  ${f.name}%-24s ${f.dataType.sql.toLowerCase}" +
                (if (m.partitionCols.contains(f.name)) "  (partition)"
                 else "")))
            val consumers = Layout.feedConsumers(spark, path)
            if (consumers.nonEmpty)
              out.println("feed consumers: " + consumers.toSeq.sorted
                .map { case (n, c) => s"$n@v$c" }.mkString(", "))
            0
        }

      case "maintain-table" =>
        val path = rest.filterNot(_.contains('=')).headOption.getOrElse {
          out.println("usage: maintain-table <tableDir> " +
            "[max_pending_deltas=N] [max_files_per_partition=N] " +
            "[keep_versions=N] [sort_cols=a,b] [zorder_cols=a,b] " +
            "[ignore_consumers=a,b] [migrate_partitions=N] " +
            "[clear_aliases=true]"); return 2 }
        def cols(k: String): Seq[String] = kv.get(k).toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        val node = graft.models.MaintainModel(path,
          maxPendingDeltas = kv.getOrElse("max_pending_deltas", "3").toInt,
          maxFilesPerPartition =
            kv.getOrElse("max_files_per_partition", "0").toInt,
          keepVersions = kv.getOrElse("keep_versions", "0").toInt,
          sortCols = cols("sort_cols"),
          zorderCols = cols("zorder_cols"),
          ignoreConsumers = cols("ignore_consumers").toSet,
          keepAgeMs = (kv.getOrElse("keep_age_hours", "0").toDouble *
            3600000L).toLong,
          clearAliases = kv.get("clear_aliases").exists(_.toBoolean),
          migratePartitions =
            kv.getOrElse("migrate_partitions", "0").toInt)
        val r = node.execute(StepContext(cliSpark(), Calendar.today()))
        out.println(s"maintain $path -> " +
          r.resultLong.getOrElse("(no decisions)"))
        0

      case "reap-table" =>
        val path = rest.filterNot(_.contains('=')).headOption.getOrElse {
          out.println("usage: reap-table <tableDir> [keep_versions=N] " +
            "[keep_age_hours=H] [ignore_consumers=a,b]"); return 2 }
        val deleted = graft.operators.Layout.reapManifest(cliSpark(), path,
          keepVersions = kv.getOrElse("keep_versions", "1").toInt,
          ignoreConsumers = kv.get("ignore_consumers").toSeq
            .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet,
          keepAgeMs = (kv.getOrElse("keep_age_hours", "0").toDouble *
            3600000L).toLong)
        out.println(s"reaped ${deleted.size} object(s)" +
          (if (deleted.isEmpty) ""
           else s": ${deleted.take(10).mkString(", ")}" +
             (if (deleted.size > 10) ", …" else "")))
        0

      case "respec-table" =>
        // METADATA-ONLY partition-spec change (zero data rewritten —
        // the Iceberg posture; Layout.changeManifestPartitionSpec's
        // contract): new writes land under the new spec, old
        // generations serve under their own, copy-on-write merges
        // migrate on touch, and `maintain-table` / repartitionManifest
        // finish the migration on the operator's schedule
        val path = rest.filterNot(_.contains('=')).headOption.getOrElse {
          out.println("usage: respec-table <tableDir> " +
            "partition_cols=a,b"); return 2 }
        val newCols = kv.get("partition_cols").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        if (newCols.isEmpty) {
          out.println("respec-table needs partition_cols=a,b"); return 2 }
        graft.operators.Layout.changeManifestPartitionSpec(
          cliSpark(), path, newCols)
        out.println(s"respec $path -> ${newCols.mkString(",")} " +
          "(metadata-only; prior-spec generations serve in place)")
        0

      case "repartition-table" =>
        // FULL-REWRITE layout change (Layout.repartitionManifest's
        // contract): one snapshot publish, deltas folded in, old
        // versions time-travel under the old layout. Also the in-place
        // DATA-bucket adoption path: new_bucket_cols/new_buckets
        // (together; ''/0 un-buckets) change the bucket layout in the
        // same rewrite — partition_cols may restate the current spec.
        val path = rest.filterNot(_.contains('=')).headOption.getOrElse {
          out.println("usage: repartition-table <tableDir> " +
            "partition_cols=a,b [sort_cols=a,b] " +
            "[new_bucket_cols=a,b new_buckets=N]"); return 2 }
        val pCols = kv.get("partition_cols").toSeq
          .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
        if (pCols.isEmpty) {
          out.println("repartition-table needs partition_cols=a,b")
          return 2 }
        val nParts = graft.operators.Layout.repartitionManifest(
          cliSpark(), path, pCols,
          sortCols = kv.get("sort_cols").toSeq.flatMap(_.split(","))
            .map(_.trim).filter(_.nonEmpty),
          newBucketCols = kv.get("new_bucket_cols").map(
            _.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
          newBuckets = kv.get("new_buckets").map(_.toInt))
        out.println(s"repartition $path -> ${pCols.mkString(",")} " +
          s"($nParts partitions)")
        0

      case "table-history" =>
        val path = rest.filterNot(_.contains('=')).headOption.getOrElse {
          out.println("usage: table-history <tableDir>"); return 2 }
        import graft.operators.Layout
        val spark = cliSpark()
        val versions = Layout.manifestVersions(spark, path)
        if (versions.isEmpty) {
          out.println(s"$path is not a manifest table (or fully reaped)")
          return 1
        }
        versions.foreach { ver =>
          val m = Layout.readManifestMeta(spark, path, ver)
          val at =
            if (m.publishedAtMs <= 0L) "-"
            else java.time.Instant.ofEpochMilli(m.publishedAtMs).toString
          out.println(f"v$ver%-4d $at%-26s op=${m.op}%-12s " +
            s"${if (m.opDeletes) "deletes " else ""}" +
            s"partitions=${m.allRels.size} " +
            s"pendingDeltaRels=${m.deltas.size}")
        }
        0

      case "history" =>
        val c = db.connect()
        try {
          val rs = c.createStatement().executeQuery(
            """select id, job_id, run_tag, status, start_date, end_date
              from pd_run_history order by id""")
          while (rs.next())
            out.println(f"${rs.getLong(1)}%4d job=${rs.getLong(2)} " +
              f"tag=${rs.getLong(3)} ${rs.getString(4)} " +
              s"${rs.getTimestamp(5)} .. ${Option(rs.getTimestamp(6)).getOrElse("")}")
        } finally c.close()
        0

      case other =>
        out.println(s"unknown command: $other\n$usage")
        2
    }
  }

  /** Minimal bearer-token form POST against the engine's REST surface. */
  private def restPost(base: String, token: String, path: String,
                       form: Map[String, String]): (Int, String) = {
    val conn = java.net.URI.create(base + path).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    // bounded waits: a hung engine must fail the one-shot CLI, not wedge it
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(30000)
    conn.setRequestProperty("Authorization", s"Bearer $token")
    val body = form.map { case (k, v) =>
      k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }.mkString("&")
    conn.getOutputStream.write(body.getBytes("UTF-8"))
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val text = new String(
      Option(is).map(_.readAllBytes()).getOrElse(Array.empty), "UTF-8")
    conn.disconnect()
    (code, text)
  }

  /** The one-shot verbs' shared local session (table verbs, run-job). */
  private def cliSpark(): SparkSession = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  private def runOne(jobId: Long, kv: Map[String, String], repo: Repository,
                     ledger: JdbcLedger, out: PrintStream): Int = {
    val cal = kv.get("date").map(Calendar.day).getOrElse(Calendar.today())
    val tag = cal.start.toEpochSecond(java.time.ZoneOffset.UTC)
    val spark = cliSpark()
    val runId = ledger.startRun(jobId, tag)
    val status = repo.loadPipeline(jobId, new SourceRegistry, ledger) match {
      case Some(pipeline) => pipeline.run(spark, cal, runId).status
      case None =>
        out.println(s"no pipeline configured for job $jobId")
        Status.Error
    }
    ledger.endRun(runId, status, None)
    out.println(s"run $runId of job $jobId -> $status (tag=$tag)")
    if (status != Status.Done) 1 else 0
  }

  private val helpTexts: Seq[(String, String)] = Seq(
    "help" -> "show this list, or `help <verb>` for one command",
    "create-job" -> "create-job name=<n> [mday|hour|min|sec|wday|yday=<cron>] [parallelism=N|Y|k] [timeout=s]",
    "list-jobs" -> "list all jobs with status and cron schedule",
    "enable-job" -> "enable-job <id>",
    "disable-job" -> "disable-job <id>",
    "delete-job" -> "delete-job <id>",
    "configure-pipeline" -> "configure-pipeline <jobId> <nodesJson|@file>",
    "run-job" -> "run-job <id> [date=yyyy-MM-dd] — execute the job's pipeline now",
    "run-jobs" -> "run every enabled job [date=yyyy-MM-dd]",
    "deactivate-run" -> "deactivate-run <runId> — exclude a W/E/T run from reruns",
    "cancel-run" -> "cancel-run <runId> [url=|token=] — interrupt a RUNNING run via the live engine",
    "cancel-job" -> "cancel-job <id> [url=|token=] — cancel every running run of a job",
    "cancel-jobs" -> "cancel-jobs [url=|token=] — cancel every running run of every job",
    "restart-scheduler" -> "restart-scheduler [url=|token=] — stop then start the live tick loop",
    "create-config" -> "create-config [path] — write the global config skeleton",
    "edit-config" -> "edit-config [path] — open in $EDITOR (headless: print the path)",
    "edit-script" -> "edit-script <jobId> — report the job's registered script body",
    "install" -> "install [dir] — write graft.ini/sources.ini skeletons + create schema",
    "serve" -> "serve [config=ini] [port=] [token=] [duration=sec] — scheduler + REST engine process",
    "status" -> "show SCHEDULER/RESTAPI component liveness (pd_components)",
    "list-tables" -> "list-tables <rootDir> — manifest tables under a directory",
    "describe-table" -> "describe-table <tableDir> — schema, merge spec, partitions, retention, consumers",
    "maintain-table" -> "maintain-table <tableDir> [max_pending_deltas=N] [max_files_per_partition=N] [keep_versions=N] [keep_age_hours=H] [clear_aliases=true] [sort_cols=] [zorder_cols=] [ignore_consumers=]",
    "respec-table" -> "respec-table <tableDir> partition_cols=a,b — metadata-only partition-spec change (zero data rewritten)",
    "reap-table" -> "reap-table <tableDir> [keep_versions=N] [keep_age_hours=H] [ignore_consumers=a,b] — retention vacuum (count + age compose as the union)",
    "table-history" -> "table-history <tableDir> — retained versions with publish provenance",
    "create-repo" -> "create-repo <dir> [remote=<url>] — git-version the schedule",
    "push-repo" -> "push-repo <dir> [message=<m>]",
    "pull-repo" -> "pull-repo <dir> — restore jobs from the git repo",
    "history" -> "list run history",
    "quit" -> "leave the console")

  private val usage: String =
    """usage: graft.Cli <jdbcUrl> [command] [args]   (no command = console)
      |  create-job name=<n> [mday|hour|min|sec|wday|yday=<cron>] [parallelism=N|Y|k] [timeout=s]
      |  list-jobs | enable-job <id> | disable-job <id> | delete-job <id>
      |  configure-pipeline <jobId> <nodesJson>
      |  run-job <id> [date=yyyy-MM-dd] | run-jobs [date=yyyy-MM-dd]
      |  deactivate-run <runId> | status
      |  cancel-run <runId> | cancel-job <id> | cancel-jobs | restart-scheduler   (live engine via REST)
      |  create-config [path] | edit-config [path] | edit-script <jobId>
      |  create-repo <dir> [remote=<url>] | push-repo <dir> [message=<m>] | pull-repo <dir>
      |  list-tables <root> | describe-table <dir> | table-history <dir>
      |  maintain-table <dir> [knobs] | reap-table <dir> [keep_versions=N]
      |  history | help [verb]""".stripMargin
}
