package graft.core

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import graft.scheduler.{Cron, JobSpec}

/** Git-versioned job repository — the reference's
  * `create_repo`/`push_repo`/`pull_repo` surface (pydin/api.py:517-591):
  * every schedule row becomes a JSON file in a git working tree, so job
  * definitions are versioned, diffable, and portable across schedulers.
  * Push/pull target any git remote (a local bare repo in tests;
  * transport is git's concern, not ours). Pull restores jobs under their
  * ORIGINAL ids via [[Repository.upsertJob]].
  */
object JobsRepo {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    .registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    .enable(com.fasterxml.jackson.databind.SerializationFeature.INDENT_OUTPUT)

  private def git(dir: Path, args: String*): String = {
    val pb = new ProcessBuilder(("git" +: args).asJava)
    pb.directory(dir.toFile)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val rc = p.waitFor()
    require(rc == 0, s"git ${args.mkString(" ")} failed ($rc): $out")
    out
  }

  private def branch(d: Path): String =
    git(d, "rev-parse", "--abbrev-ref", "HEAD").trim

  private def commitIfChanged(d: Path, message: String): Boolean = {
    git(d, "add", "-A")
    if (git(d, "status", "--porcelain").trim.isEmpty) false
    else { git(d, "commit", "-q", "-m", message); true }
  }

  // ---- JobSpec <-> JSON ----------------------------------------------------

  private[core] def toJson(spec: JobSpec): String = mapper.writeValueAsString(Map(
    "id" -> spec.id,
    "name" -> spec.name,
    "enabled" -> spec.enabled,
    "monthday" -> spec.schedule.mday.orNull,
    "hour" -> spec.schedule.hour.orNull,
    "minute" -> spec.schedule.min.orNull,
    "second" -> spec.schedule.sec.orNull,
    "weekday" -> spec.schedule.wday.orNull,
    "yearday" -> spec.schedule.yday.orNull,
    "parallelism" -> spec.parallelism,
    "timeout" -> spec.timeoutSeconds.map(Int.box).orNull,
    "sleep_period" -> spec.sleepPeriod.orNull,
    "wake_up_period" -> spec.wakeUpPeriod.orNull,
    "rerun_interval" -> spec.rerunIntervalSeconds.map(Int.box).orNull,
    "rerun_limit" -> spec.rerunLimit,
    "rerun_days" -> spec.rerunDays,
    "trigger_list" -> spec.triggerList,
    "email_list" -> spec.emailList,
    "start_date" -> spec.startDate.map(_.toString).orNull,
    "end_date" -> spec.endDate.map(_.toString).orNull))

  private[core] def fromJson(json: String): JobSpec = {
    val m = mapper.readValue(json, classOf[Map[String, Any]])
    def str(k: String): Option[String] =
      m.get(k).filter(_ != null).map(_.toString).filter(_.nonEmpty)
    def int(k: String): Option[Int] = str(k).map(_.toDouble.toInt)
    JobSpec(
      id = m("id").toString.toDouble.toLong,
      name = m.getOrElse("name", "job").toString,
      enabled = m.get("enabled").forall(_.toString.toBoolean),
      schedule = Cron.Schedule(str("monthday"), str("hour"), str("minute"),
        str("second"), str("weekday"), str("yearday")),
      parallelism = str("parallelism").getOrElse("N"),
      timeoutSeconds = int("timeout"),
      sleepPeriod = str("sleep_period"),
      wakeUpPeriod = str("wake_up_period"),
      rerunIntervalSeconds = int("rerun_interval"),
      rerunLimit = int("rerun_limit").getOrElse(0),
      rerunDays = int("rerun_days").getOrElse(1),
      triggerList = m.get("trigger_list").toSeq.flatMap(
        _.asInstanceOf[Seq[Any]].map(_.toString.toDouble.toLong)),
      emailList = m.get("email_list").toSeq.flatMap(
        _.asInstanceOf[Seq[Any]].map(_.toString)).filter(_.nonEmpty),
      startDate = str("start_date").map(java.time.LocalDateTime.parse),
      endDate = str("end_date").map(java.time.LocalDateTime.parse))
  }

  private def export(repo: Repository, d: Path): Unit = {
    val jobsDir = d.resolve("jobs")
    Files.createDirectories(jobsDir)
    // full mirror: files for deleted jobs go away too
    Files.list(jobsDir).iterator().asScala
      .filter(_.toString.endsWith(".json")).foreach(Files.delete)
    repo.loadJobs().foreach { j =>
      Files.write(jobsDir.resolve(s"${j.id}.json"),
        (toJson(j) + "\n").getBytes("UTF-8"))
    }
  }

  // ---- verbs (api.py:517-591) ---------------------------------------------

  /** Initialize a working tree at `dir`, export the schedule into it and
    * commit. `remote` (optional) becomes `origin` for push/pull.
    */
  def createRepo(repo: Repository, dir: String,
                 remote: Option[String] = None): Unit = {
    val d = Paths.get(dir)
    Files.createDirectories(d)
    git(d, "init", "-q")
    git(d, "config", "user.email", "scheduler@localhost")
    git(d, "config", "user.name", "scheduler")
    remote.foreach(r => git(d, "remote", "add", "origin", r))
    export(repo, d)
    commitIfChanged(d, "schedule snapshot")
  }

  /** Re-export the schedule, commit if anything changed, push to origin
    * when configured. Returns true if a commit was created.
    */
  def pushRepo(repo: Repository, dir: String,
               message: String = "schedule sync"): Boolean = {
    val d = Paths.get(dir)
    export(repo, d)
    val committed = commitIfChanged(d, message)
    if (git(d, "remote").linesIterator.contains("origin"))
      git(d, "push", "-q", "-u", "origin", branch(d))
    committed
  }

  /** Pull from origin when configured, then restore every job file into
    * the schedule under its original id. Returns the restored specs.
    */
  def pullRepo(repo: Repository, dir: String): Seq[JobSpec] = {
    val d = Paths.get(dir)
    if (git(d, "remote").linesIterator.contains("origin"))
      git(d, "pull", "-q", "origin", branch(d))
    val jobsDir = d.resolve("jobs")
    if (!Files.isDirectory(jobsDir)) Seq.empty
    else {
      val specs = Files.list(jobsDir).iterator().asScala
        .filter(_.toString.endsWith(".json")).toSeq
        .map(p => fromJson(new String(Files.readAllBytes(p), "UTF-8")))
        .sortBy(_.id)
      specs.foreach(repo.upsertJob)
      specs
    }
  }
}
