package graft.core

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import graft.scheduler.{Cron, JobSpec}

class RepositorySpec extends SparkSpec {

  private val db = DatabaseSource("repodb",
    url = "jdbc:derby:memory:graftrepo;create=true")

  test("JobSpec persists and loads back equal (schedule roundtrip)") {
    val repo = new Repository(db)
    val spec = JobSpec(0L, "roundtrip",
      enabled = true,
      schedule = Cron.Schedule(mday = Some("1-15"), hour = Some("/6"),
        min = Some("0"), sec = Some("0"), wday = Some("1,3,5")),
      parallelism = "3",
      timeoutSeconds = Some(3600),
      sleepPeriod = Some("22-23"),
      wakeUpPeriod = Some("30"),
      rerunIntervalSeconds = Some(300),
      rerunLimit = 2, rerunDays = 3,
      triggerList = Seq(7L, 9L),
      emailList = Seq("ops@example.com", "oncall@example.com"))
    val id = repo.saveJob(spec)
    assert(id > 0)
    val loaded = repo.loadJobs().find(_.id == id).get
    assert(loaded == spec.copy(id = id))
  }

  test("git job repo: create, push to a bare remote, pull restores exact specs") {
    val repo = new Repository(db)
    val spec = JobSpec(0L, "versioned",
      schedule = Cron.Schedule(hour = Some("/2"), min = Some("15"), sec = Some("0")),
      parallelism = "2", timeoutSeconds = Some(60),
      rerunIntervalSeconds = Some(120), rerunLimit = 1,
      triggerList = Seq(3L, 4L),
      emailList = Seq("ops@example.com"),
      startDate = Some(java.time.LocalDateTime.parse("2023-01-01T00:00:00")))
    val id = repo.saveJob(spec)

    // bare remote + working tree
    val remote = java.nio.file.Files.createTempDirectory("jobs_remote").toString
    val tree = java.nio.file.Files.createTempDirectory("jobs_tree").toString
    new ProcessBuilder("git", "init", "-q", "--bare", remote).start().waitFor()
    JobsRepo.createRepo(repo, tree, remote = Some(remote))
    assert(JobsRepo.pushRepo(repo, tree) == false) // nothing new after create
    val changed = repo.loadJobs().find(_.id == id).get.copy(parallelism = "5")
    repo.upsertJob(changed)
    assert(JobsRepo.pushRepo(repo, tree, "bump parallelism"))

    // a FRESH database + clone restores the job under its original id
    val db2 = DatabaseSource("repodb2",
      url = "jdbc:derby:memory:graftrepo2;create=true")
    val repo2 = new Repository(db2)
    val clone = java.nio.file.Files.createTempDirectory("jobs_clone").toString
    new ProcessBuilder("git", "clone", "-q", remote, clone).start().waitFor()
    val restored = JobsRepo.pullRepo(repo2, clone)
    assert(restored.map(_.id).contains(id))
    assert(repo2.loadJobs().find(_.id == id).get == changed)

    // upsert-on-pull is idempotent
    JobsRepo.pullRepo(repo2, clone)
    assert(repo2.loadJobs().count(_.id == id) == 1)

    // REGRESSION: the restore's explicit-id insert must advance Derby's
    // identity sequence — creating new jobs after a restore used to walk
    // the generator through already-restored ids and die on a PK violation
    val afterRestore = repo2.saveJob(JobSpec(0L, "post-restore"))
    assert(afterRestore > id)
    assert(repo2.loadJobs().map(_.id).distinct.size == repo2.loadJobs().size)
  }

  test("config-driven pipeline persists and hydrates from the DB") {
    val repo = new Repository(db)
    val jobId = repo.saveJob(JobSpec(0L, "cfg"))
    val out = java.nio.file.Files.createTempDirectory("repo").toString
    repo.savePipeline(jobId, "p", Seq(
      PipelineConfig.NodeConfig("src", "Parquet", 1,
        Map("path" -> sf("region"))),
      PipelineConfig.NodeConfig("dst", "JSON", 2,
        Map("path" -> s"$out/r"))))
    val p = repo.loadPipeline(jobId, new SourceRegistry).get
    assert(p.steps.map(_.stepType) == Seq(StepType.EL))
    assert(p.run(spark, Calendar.day("2023-01-01")).status == Status.Done)
    assert(spark.read.json(s"$out/r").count() == 5)
    assert(repo.loadPipeline(9999L, new SourceRegistry).isEmpty)
  }

  test("fired job runs its registered script body, then the pipeline (core.py:1640-1649)") {
    import graft.scheduler._
    val repo = new Repository(db)
    val ledger = new JdbcLedger(db)
    val order = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val sched = new Scheduler(
      new PipelineJobRunner(spark, repo, new SourceRegistry, ledger),
      executorThreads = 2, ledger = Some(ledger))
    // script-ONLY job: user code is the reference's primary job format —
    // no configured pipeline needed for the run to be D
    val soId = repo.saveJob(JobSpec(0L, "script-only"))
    JobScripts.register("script-only") { (s, cal) =>
      order.add(s"script-only:${cal.getClass.getSimpleName}:${s eq spark}")
    }
    // script + pipeline job: the script runs FIRST, then the pipeline
    val out = java.nio.file.Files.createTempDirectory("scripted").toString
    val spId = repo.saveJob(JobSpec(0L, "scripted-etl"))
    repo.savePipeline(spId, "p", Seq(
      PipelineConfig.NodeConfig("src", "Parquet", 1,
        Map("path" -> sf("region"))),
      PipelineConfig.NodeConfig("dst", "JSON", 2,
        Map("path" -> s"$out/r"))))
    JobScripts.register("scripted-etl") { (_, _) => order.add("pre-pipeline") }
    try {
      val midnight = 1678838400L // 2023-03-15T00:00:00Z -> Day calendar
      for (id <- Seq(soId, spId))
        sched.charge(repo.loadJobs().find(_.id == id).get, midnight)
      assert(sched.drain())
      assert(sched.history.asScala.forall(_._2 == Status.Done))
      // ledger run rows written under the scheduler-issued run ids
      assert(ledger.lastRun(soId).exists { case (_, tag, st) =>
        tag == midnight && st == Status.Done })
      assert(ledger.lastRun(spId).exists(_._3 == Status.Done))
      assert(order.asScala.toSet ==
        Set("script-only:Day:true", "pre-pipeline"))
      assert(spark.read.json(s"$out/r").count() == 5) // pipeline ran after
      // a throwing script fails the run (status E) before the pipeline
      JobScripts.register("scripted-etl") { (_, _) => sys.error("boom") }
      sched.charge(repo.loadJobs().find(_.id == spId).get, midnight + 86400L)
      assert(sched.drain())
      assert(sched.history.asScala.last._2 == Status.Error)
      // neither script nor pipeline -> E, not a silent vanish
      val bare = repo.saveJob(JobSpec(0L, "bare"))
      sched.charge(repo.loadJobs().find(_.id == bare).get, midnight)
      assert(sched.drain())
      assert(sched.history.asScala.last._2 == Status.Error)
    } finally {
      JobScripts.clear()
      sched.stop()
    }
  }
}
