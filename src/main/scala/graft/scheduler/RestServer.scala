package graft.scheduler

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import scala.jdk.CollectionConverters._

/** REST admin surface (pydin/web.py:35-322): the reference's Flask app
  * re-expressed over the JDK's built-in HttpServer (zero dependencies).
  * Bearer-token auth (web.py:146-151); verbs delegate to [[Driver]].
  *
  * Endpoints (web.py:154-322 parity where meaningful in-process):
  *   GET  /api/test          - liveness
  *   GET  /api/help          - endpoint list
  *   GET  /api/jobs          - list job specs
  *   POST /api/create-job    - params: name, hour, min, sec, ...
  *   POST /api/enable-job    - param: id
  *   POST /api/disable-job   - param: id
  *   POST /api/run-job       - params: id, tag (epoch seconds)
  *   POST /api/cancel-run    - param: run_id (interrupt a running run)
  *   POST /api/cancel-job    - param: id (cancel every running run of a
  *                             job — api.py:389-404)
  *   POST /api/cancel-jobs   - cancel every running run of every job
  *   POST /api/deactivate-run - param: run_id (drop a W/E/T run —
  *                             web.py:293-308)
  *   POST /api/start-scheduler - begin the tick loop (web.py:173-183)
  *   POST /api/stop-scheduler  - halt the tick loop (web.py:185-194)
  *   GET  /api/history       - completed runs
  *   POST /api/sync-repo     - pull the git job repo, register restored
  *                             jobs (web.py:310-322; needs repo+repoDir)
  *
  * Lakehouse table verbs (the CLI table surface over HTTP):
  *   GET  /api/tables         - param: root (manifest tables under it)
  *   GET  /api/describe-table - param: path (schema, merge spec,
  *                              retention window, consumers)
  *   POST /api/maintain-table - params: path [, max_pending_deltas,
  *                              max_files_per_partition, keep_versions,
  *                              keep_age_hours, clear_aliases]
  *   POST /api/reap-table     - params: path [, keep_versions, keep_age_hours]
  *   POST /api/respec-table   - params: path, partition_cols (metadata-only
  *                              partition-spec change, zero data rewritten)
  */
final class RestServer(driver: Driver, token: String, port: Int = 0,
                       repo: Option[graft.core.Repository] = None,
                       repoDir: Option[String] = None) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def authed(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .contains(s"Bearer $token")

  private def params(ex: HttpExchange): Map[String, String] = {
    val q = Option(ex.getRequestURI.getQuery).getOrElse("")
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    (q + "&" + body).split('&').toSeq
      .filter(_.contains('='))
      .map { kv => val i = kv.indexOf('='); kv.take(i) ->
        java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8") }
      .toMap
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private val endpoints = Seq("/api/test", "/api/help", "/api/jobs",
    "/api/create-job", "/api/enable-job", "/api/disable-job",
    "/api/run-job", "/api/cancel-run", "/api/cancel-job",
    "/api/cancel-jobs", "/api/deactivate-run",
    "/api/start-scheduler", "/api/stop-scheduler",
    "/api/history", "/api/sync-repo",
    "/api/tables", "/api/describe-table", "/api/maintain-table",
    "/api/reap-table", "/api/respec-table")

  /** The table verbs' local session (lazy: job-only deployments never
    * start Spark for the REST process). */
  private lazy val tableSpark: org.apache.spark.sql.SparkSession = {
    val s = graft.SparkEntry.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
        .config("spark.ui.enabled", "false")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def handle(ex: HttpExchange): Unit = {
    if (!authed(ex)) { respond(ex, 401, """{"error":"unauthorized"}"""); return }
    try {
      ex.getRequestURI.getPath match {
        case "/api/test" => respond(ex, 200, """{"status":"ok"}""")
        case "/api/help" => respond(ex, 200,
          endpoints.map(e => s""""$e"""").mkString("[", ",", "]"))
        case "/api/jobs" =>
          val rows = driver.listJobs().map(j =>
            s"""{"id":${j.id},"name":"${esc(j.name)}","enabled":${j.enabled}}""")
          respond(ex, 200, rows.mkString("[", ",", "]"))
        case "/api/create-job" =>
          val p = params(ex)
          val id = p.get("id").map(_.toLong)
            .getOrElse(driver.listJobs().map(_.id).maxOption.getOrElse(0L) + 1)
          val spec = JobSpec(id, p.getOrElse("name", s"job_$id"),
            enabled = p.get("enabled").forall(_.toBoolean),
            schedule = Cron.Schedule(p.get("mday"), p.get("hour"),
              p.get("min"), p.get("sec"), p.get("wday"), p.get("yday")),
            parallelism = p.getOrElse("parallelism", "N"),
            emailList = p.get("email_list").toSeq.flatMap(_.split(';'))
              .map(_.trim).filter(_.nonEmpty))
          driver.createJob(spec)
          respond(ex, 200, s"""{"created":${spec.id}}""")
        case "/api/enable-job" =>
          val ok = driver.enableJob(params(ex)("id").toLong).isDefined
          respond(ex, if (ok) 200 else 404, s"""{"enabled":$ok}""")
        case "/api/disable-job" =>
          val ok = driver.disableJob(params(ex)("id").toLong).isDefined
          respond(ex, if (ok) 200 else 404, s"""{"disabled":$ok}""")
        case "/api/run-job" =>
          val p = params(ex)
          val run = driver.runJob(p("id").toLong,
            p.get("tag").map(_.toLong).getOrElse(System.currentTimeMillis() / 1000))
          run match {
            case Some(r) => respond(ex, 200,
              s"""{"run_id":${r.runId},"tag":${r.tag}}""")
            case None => respond(ex, 409, """{"error":"busy or unknown job"}""")
          }
        case "/api/cancel-run" =>
          val ok = driver.scheduler.cancel(params(ex)("run_id").toLong)
          respond(ex, if (ok) 200 else 404, s"""{"canceled":$ok}""")
        case "/api/cancel-job" => // api.py:389-404
          val n = driver.cancelJob(params(ex)("id").toLong)
          respond(ex, 200, s"""{"canceled":$n}""")
        case "/api/cancel-jobs" =>
          val n = driver.cancelJobs()
          respond(ex, 200, s"""{"canceled":$n}""")
        case "/api/deactivate-run" => // web.py:293-308
          val ok = driver.deactivateRun(params(ex)("run_id").toLong)
          respond(ex, if (ok) 200 else 404, s"""{"deactivated":$ok}""")
        case "/api/start-scheduler" => // web.py:173-183
          val ok = driver.startScheduler()
          respond(ex, if (ok) 200 else 409, s"""{"started":$ok}""")
        case "/api/stop-scheduler" => // web.py:185-194
          val ok = driver.stopScheduler()
          respond(ex, if (ok) 200 else 409, s"""{"stopped":$ok}""")
        case "/api/sync-repo" =>
          (repo, repoDir) match {
            case (Some(r), Some(d)) =>
              val restored = graft.core.JobsRepo.pullRepo(r, d)
              restored.foreach(driver.createJob)
              respond(ex, 200, s"""{"synced":${restored.size}}""")
            case _ => respond(ex, 501, """{"error":"no job repo configured"}""")
          }
        case "/api/history" =>
          val rows = driver.runHistory().map { case (r, st) =>
            s"""{"run_id":${r.runId},"job_id":${r.job.id},"tag":${r.tag},"status":"$st"}"""
          }
          respond(ex, 200, rows.mkString("[", ",", "]"))
        // ---- lakehouse table verbs (the CLI surface over HTTP) ----
        case "/api/tables" =>
          import graft.operators.Layout
          val root = params(ex)("root")
          val rootP = new org.apache.hadoop.fs.Path(root)
          val fs = rootP.getFileSystem(
            tableSpark.sparkContext.hadoopConfiguration)
          val rows =
            if (!fs.exists(rootP)) Nil
            else fs.listStatus(rootP).toSeq.filter(_.isDirectory)
              .map(_.getPath).sortBy(_.getName).flatMap { p =>
                Layout.manifestVersion(tableSpark, p.toString).map { v =>
                  val m = Layout.readManifestMeta(tableSpark, p.toString, v)
                  s"""{"name":"${esc(p.getName)}","version":$v,""" +
                    s""""appendOnly":${m.appendOnly},""" +
                    s""""partitions":${m.allRels.size},""" +
                    s""""pendingDeltaRels":${m.deltas.size}}"""
                }
              }
          respond(ex, 200, rows.mkString("[", ",", "]"))
        case "/api/describe-table" =>
          import graft.operators.Layout
          val path = params(ex)("path")
          Layout.manifestVersion(tableSpark, path) match {
            case None =>
              respond(ex, 404, """{"error":"not a manifest table"}""")
            case Some(v) =>
              val m = Layout.readManifestMeta(tableSpark, path, v)
              val sch = Layout.manifestSchema(m)
              respond(ex, 200,
                s"""{"path":"${esc(path)}","version":$v,""" +
                s""""op":"${esc(m.op)}","appendOnly":${m.appendOnly},""" +
                s""""keys":[${m.morKeys.map(k => s""""${esc(k)}"""")
                  .mkString(",")}],""" +
                s""""versionCol":${m.morVersionCol
                  .map(c => s""""${esc(c)}"""").getOrElse("null")},""" +
                s""""partitionCols":[${m.partitionCols
                  .map(c => s""""${esc(c)}"""").mkString(",")}],""" +
                s""""partitions":${m.allRels.size},""" +
                s""""pendingDeltaRels":${m.deltas.size},""" +
                s""""retainedVersions":[${Layout
                  .manifestVersions(tableSpark, path).mkString(",")}],""" +
                s""""schema":[${sch.fields.map(f =>
                  s"""{"name":"${esc(f.name)}","type":"${esc(
                    f.dataType.sql.toLowerCase)}"}""").mkString(",")}]}""")
          }
        case "/api/maintain-table" =>
          val p = params(ex)
          val node = graft.models.MaintainModel(p("path"),
            maxPendingDeltas = p.getOrElse("max_pending_deltas", "3").toInt,
            maxFilesPerPartition =
              p.getOrElse("max_files_per_partition", "0").toInt,
            keepVersions = p.getOrElse("keep_versions", "0").toInt,
            keepAgeMs = (p.getOrElse("keep_age_hours", "0").toDouble *
              3600000L).toLong,
            clearAliases = p.get("clear_aliases").exists(_.toBoolean),
            migratePartitions =
              p.getOrElse("migrate_partitions", "0").toInt)
          val r = node.execute(graft.core.StepContext(tableSpark,
            graft.core.Calendar.today()))
          respond(ex, 200,
            s"""{"decisions":"${esc(r.resultLong.getOrElse(""))}"}""")
        case "/api/reap-table" =>
          val p = params(ex)
          val deleted = graft.operators.Layout.reapManifest(tableSpark,
            p("path"), keepVersions = p.getOrElse("keep_versions", "1").toInt,
            keepAgeMs = (p.getOrElse("keep_age_hours", "0").toDouble *
              3600000L).toLong)
          respond(ex, 200, s"""{"reaped":${deleted.size}}""")
        case "/api/respec-table" =>
          // metadata-only partition-spec change (the CLI/SQL verb's
          // REST twin) — zero data rewritten
          val p = params(ex)
          val cols = p("partition_cols").split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
          graft.operators.Layout.changeManifestPartitionSpec(
            tableSpark, p("path"), cols)
          respond(ex, 200,
            s"""{"respec":"${esc(cols.mkString(","))}","version":${
              graft.operators.Layout.manifestVersion(tableSpark,
                p("path")).getOrElse(-1)}}""")
        case "/api/repartition-table" =>
          // full-rewrite layout change (repartitionManifest) — also
          // the in-place bucket adoption path via new_bucket_cols/
          // new_buckets (''/0 un-buckets)
          val p = params(ex)
          val cols = p("partition_cols").split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
          val nParts = graft.operators.Layout.repartitionManifest(
            tableSpark, p("path"), cols,
            sortCols = p.get("sort_cols").toSeq.flatMap(_.split(","))
              .map(_.trim).filter(_.nonEmpty),
            newBucketCols = p.get("new_bucket_cols").map(
              _.split(",").map(_.trim).filter(_.nonEmpty).toSeq),
            newBuckets = p.get("new_buckets").map(_.toInt))
          respond(ex, 200,
            s"""{"repartition":"${esc(cols.mkString(","))}",""" +
              s""""partitions":$nParts}""")
        case _ => respond(ex, 404, """{"error":"not found"}""")
      }
    } catch {
      case e: Exception => respond(ex, 500,
        s"""{"error":"${esc(String.valueOf(e.getMessage))}"}""")
    }
  }

  def start(): RestServer = {
    server.createContext("/", handle _)
    server.setExecutor(null)
    server.start()
    driver.scheduler.ledger.foreach(_.componentStarted("RESTAPI",
      Some(s"http://127.0.0.1:$boundPort"))) // web.py:115-131
    this
  }

  def stop(): Unit = {
    driver.scheduler.ledger.foreach(_.componentStopped("RESTAPI"))
    server.stop(0)
  }
}
