package graft

import java.time.LocalDateTime

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.scheduler._

/** Command-line manager (pydin/cli.py:22-662 verbs, one command per
  * invocation against a durable schedule DB):
  *
  * {{{
  * graft.Cli <dbUrl> create-job name=<n> [hour=<cron>] [min=<cron>] ...
  * graft.Cli <dbUrl> list-jobs
  * graft.Cli <dbUrl> enable-job <id> | disable-job <id> | delete-job <id>
  * graft.Cli <dbUrl> configure-pipeline <jobId> <nodesJson>
  * graft.Cli <dbUrl> run-job <id> [date=<yyyy-MM-dd>]
  * graft.Cli <dbUrl> history
  * }}}
  *
  * `run-job` hydrates the job's config-driven pipeline
  * (pd_pipeline_config/pd_node_config) and executes it in-process with
  * run/task/step ledger rows — the reference's `run job <id> date <d>`
  * (cli.py:286-343) without the subprocess hop (SURVEY.md §7.4.5).
  */
object Cli {

  def main(args: Array[String]): Unit = {
    if (args.length < 2) { println(usage); sys.exit(2) }
    // auto-create embedded Derby DBs (also lets callers avoid the ';'
    // attribute, which tools like sbt's command parser swallow)
    val url = if (args(0).startsWith("jdbc:derby:") && !args(0).contains(";"))
      args(0) + ";create=true" else args(0)
    val db = DatabaseSource("metadb", url)
    val repo = new Repository(db)
    val ledger = Ledger.jdbc(db)
    val rest = args.drop(2)
    val kv: Map[String, String] = rest.filter(_.contains('='))
      .map { a => val i = a.indexOf('='); a.take(i) -> a.drop(i + 1) }.toMap

    args(1) match {
      case "create-job" =>
        val spec = JobSpec(0L, kv.getOrElse("name", "job"),
          enabled = kv.get("enabled").forall(_.toBoolean),
          schedule = Cron.Schedule(kv.get("mday"), kv.get("hour"),
            kv.get("min"), kv.get("sec"), kv.get("wday"), kv.get("yday")),
          parallelism = kv.getOrElse("parallelism", "N"),
          timeoutSeconds = kv.get("timeout").map(_.toInt))
        val id = repo.saveJob(spec)
        println(s"created job $id (${spec.name})")

      case "list-jobs" =>
        repo.loadJobs().foreach { j =>
          val cron = Seq(j.schedule.mday, j.schedule.hour, j.schedule.min,
            j.schedule.sec, j.schedule.wday, j.schedule.yday)
            .map(_.getOrElse("*")).mkString(" ")
          println(f"${j.id}%4d ${if (j.enabled) "Y" else "N"} ${j.name}%-24s [$cron]")
        }

      case "enable-job" => repo.setJobStatus(rest(0).toLong, enabled = true)
        println(s"enabled ${rest(0)}")
      case "disable-job" => repo.setJobStatus(rest(0).toLong, enabled = false)
        println(s"disabled ${rest(0)}")
      case "delete-job" => repo.deleteJob(rest(0).toLong)
        println(s"deleted ${rest(0)}")

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
        println(s"configured pipeline $pid for job $jobId (${nodes.size} nodes)")

      case "run-job" =>
        val jobId = rest.find(!_.contains('=')).map(_.toLong)
          .getOrElse(sys.error("run-job <id>"))
        val cal = kv.get("date").map(Calendar.day).getOrElse(Calendar.today())
        val tag = cal.start.toEpochSecond(java.time.ZoneOffset.UTC)
        val spark = SparkEntry.configure(SparkSession.builder()
          .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
          .config("spark.ui.enabled", "false")).getOrCreate()
        spark.sparkContext.setLogLevel("ERROR")
        val runId = ledger.startRun(jobId, tag)
        val status = repo.loadPipeline(jobId, new SourceRegistry, ledger) match {
          case Some(pipeline) =>
            val task = pipeline.run(spark, cal, runId)
            task.status
          case None =>
            println(s"no pipeline configured for job $jobId")
            Status.Error
        }
        ledger.endRun(runId, status, None)
        println(s"run $runId of job $jobId -> $status (tag=$tag)")
        spark.stop()
        if (status != Status.Done) sys.exit(1)

      // git-versioned schedule (reference create_repo/push_repo/pull_repo)
      case "create-repo" =>
        JobsRepo.createRepo(repo, rest(0), kv.get("remote"))
        println(s"repo created at ${rest(0)}")
      case "push-repo" =>
        val committed = JobsRepo.pushRepo(repo, rest(0),
          kv.getOrElse("message", "schedule sync"))
        println(if (committed) "pushed schedule changes" else "nothing to push")
      case "pull-repo" =>
        val restored = JobsRepo.pullRepo(repo, rest(0))
        println(s"restored ${restored.size} job(s)")

      case "history" =>
        val c = db.connect()
        try {
          val rs = c.createStatement().executeQuery(
            """select id, job_id, run_tag, status, start_date, end_date
              from pd_run_history order by id""")
          while (rs.next())
            println(f"${rs.getLong(1)}%4d job=${rs.getLong(2)} " +
              f"tag=${rs.getLong(3)} ${rs.getString(4)} " +
              s"${rs.getTimestamp(5)} .. ${Option(rs.getTimestamp(6)).getOrElse("")}")
        } finally c.close()

      case other =>
        println(s"unknown command: $other\n$usage"); sys.exit(2)
    }
  }

  private val usage: String =
    """usage: graft.Cli <jdbcUrl> <command> [args]
      |  create-job name=<n> [mday|hour|min|sec|wday|yday=<cron>] [parallelism=N|Y|k] [timeout=s]
      |  list-jobs | enable-job <id> | disable-job <id> | delete-job <id>
      |  configure-pipeline <jobId> <nodesJson>
      |  run-job <id> [date=yyyy-MM-dd]
      |  create-repo <dir> [remote=<url>] | push-repo <dir> [message=<m>] | pull-repo <dir>
      |  history""".stripMargin
}
