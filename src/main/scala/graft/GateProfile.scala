package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Within-gate time attribution (optimization-guide §1: measure first).
  *
  * Runs the named gates once (after one unrecorded warmup of the same
  * gate) with a listener that records every Spark job's wall span and
  * call site, then prints a per-gate table: job wall time attributed to
  * the `file:line` that triggered the action, plus the driver-side gap
  * (gate wall − Σ job wall) which covers planning, file listing, commits
  * and renames. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.GateProfile m48_manifest_multiskip m65_..."
  */
object GateProfile {
  private final case class JobSpan(desc: String, start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "region").count()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobSpan]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val props = Option(js.properties)
        def prop(k: String) = props.flatMap(p => Option(p.getProperty(k)))
        // fall back through description → callsite → first graft frame
        // of the first stage's creation site
        val site = prop("callSite.short")
          .orElse(prop("spark.job.description").map(_.take(60)))
          .orElse(js.stageInfos.iterator.flatMap(si =>
            si.details.linesIterator.find(_.contains("graft."))
              .map(_.trim.take(90))).toSeq.headOption)
          .getOrElse("?")
        jobs.put(js.jobId, JobSpan(site, js.time, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach(_.end = je.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // driver-thread sampler: histogram every live thread's deepest
    // graft frame every 20 ms — attributes the "driver gap" (renames,
    // listings, planning) that job wall time cannot see. Sampling ALL
    // threads (r18) instead of only main matters for streaming gates:
    // main blocks in awaitTermination while the real work happens on
    // the micro-batch thread — a main-only histogram showed nothing.
    // Threads with no graft frame attribute to their deepest streaming/
    // execution frame so stream-machinery overhead is visible too.
    val mainThread = Thread.currentThread()
    val hist = new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.atomic.AtomicLong]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
            if (t.getState == Thread.State.RUNNABLE ||
                (t eq mainThread) ||
                t.getName.contains("stream execution")) {
              val frame = st.find(f =>
                  f.getClassName.startsWith("graft.") &&
                    !f.getClassName.contains("GateProfile"))
                .orElse(if (t eq mainThread) st.headOption
                  else st.find(f => f.getClassName.startsWith(
                    "org.apache.spark.sql.execution.streaming")))
                .map { f =>
                  val who =
                    if (t eq mainThread) "main"
                    else if (t.getName.contains("stream execution")) "stream"
                    else "pool"
                  s"[$who] ${f.getClassName.stripPrefix("graft.")
                    .stripPrefix("org.apache.spark.sql.execution.")}." +
                    s"${f.getMethodName}:${f.getLineNumber}"
                }
              frame.foreach { fr =>
                hist.computeIfAbsent(fr,
                  _ => new java.util.concurrent.atomic.AtomicLong())
                  .incrementAndGet()
                ()
              }
            }
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    val names = if (args.nonEmpty) args.toSeq
      else Seq("m48_manifest_multiskip")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // warmup (memoized staging, codegen)
      try { fn(spark, sfDir).count(); () } catch { case e: Throwable =>
        System.err.println(s"[profile] warmup $name failed: ${e.getMessage}") }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      jobs.clear()
      hist.clear()
      sampling = true
      val t0 = System.currentTimeMillis()
      fn(spark, sfDir).count()
      val wall = System.currentTimeMillis() - t0
      sampling = false
      // listener bus is async — give it a beat to drain
      Thread.sleep(300)
      import scala.jdk.CollectionConverters._
      val spans = jobs.values.asScala.toSeq.filter(_.start >= t0)
      val bySite = spans.groupBy(_.desc).map { case (site, ss) =>
        (site, ss.map(s => s.end - s.start).sum, ss.size)
      }.toSeq.sortBy(-_._2)
      println(f"===== $name wall=${wall / 1000.0}%.2fs jobs=${spans.size} " +
        f"jobwall=${spans.map(s => s.end - s.start).sum / 1000.0}%.2fs " +
        f"driver-gap=${(wall - spans.map(s => s.end - s.start).sum) / 1000.0}%.2fs")
      bySite.take(25).foreach { case (site, ms, n) =>
        println(f"  ${ms / 1000.0}%7.2fs  n=$n%-4d $site")
      }
      import scala.jdk.CollectionConverters._
      val samples = hist.asScala.toSeq.map { case (k, v) => (k, v.get) }
        .sortBy(-_._2)
      val tot = math.max(1L, samples.map(_._2).sum)
      println(s"  -- all-thread samples (20ms ticks, " +
        s"$tot total; [main]=driver main, [stream]=micro-batch thread, " +
        s"[pool]=other runnable):")
      samples.take(25).foreach { case (frame, n) =>
        println(f"  ${n * 100.0 / tot}%5.1f%% n=$n%-5d $frame")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
