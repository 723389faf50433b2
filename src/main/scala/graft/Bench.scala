package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  /** One query's outcome across passes: min time (sec) or None if any pass
    * failed, plus the wall-clock span of every sample. */
  final case class Outcome(name: String, minSec: Option[Double],
                           spans: List[(Long, Long)], err: Option[String])

  /** Measure `queries` over `passes` suite-wide passes (min per query).
    * Failures are first-class: a query that throws in any pass reports
    * `minSec = None` with the exception message — the harness must not be
    * able to "succeed" past a crashing query (round-7 verdict #3).
    *
    * Passes are the OUTER loop (whole suite per pass): this host shows
    * intermittent multi-minute I/O stalls, and with back-to-back passes a
    * stall poisons BOTH samples of whichever query it lands on. With
    * suite-per-pass the samples are minutes apart, so a stall window hits
    * a query in at most one pass and min() strips it.
    */
  def run(spark: SparkSession, sfDir: String,
          queries: Seq[(String, (SparkSession, String) => DataFrame)],
          passes: Int): Seq[Outcome] = {
    val times = Array.fill(queries.size)(Double.MaxValue)
    val spans = Array.fill(queries.size)(List.empty[(Long, Long)])
    val errs = Array.fill(queries.size)(Option.empty[String])
    for (_ <- 1 to passes) {
      queries.zipWithIndex.foreach { case ((name, fn), i) =>
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count();
          val sec = (System.nanoTime() - t0) / 1e9
          if (errs(i).isEmpty && sec < times(i)) times(i) = sec
        } catch { case e: Throwable =>
          errs(i) = Some(Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(200))
        }
        spans(i) = spans(i) :+ (w0, System.currentTimeMillis())
        // drop this query's persisted intermediates before the next run:
        // the queries' caches otherwise accumulate in executor storage
        // and the eviction/spill churn bleeds into later queries' times.
        // clearCache() misses RDD-level persists (localCheckpoint
        // lineage cuts in the transitive-dedup family) — sweep those too.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
      }
    }
    queries.zipWithIndex.map { case ((name, _), i) =>
      Outcome(name, if (errs(i).isDefined) None else Some(times(i)),
        spans(i), errs(i))
    }
  }

  /** 1 when any query failed — the process exit code for `main`. */
  def exitCode(outcomes: Seq[Outcome]): Int =
    if (outcomes.exists(_.minSec.isEmpty)) 1 else 0

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkEntry.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session cost (codegen compiler, scan setup) so the
    // first measured query is not charged for JVM warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "region").count()
    // local-iteration aid: SPARK_GRAFT_ONLY=q1,q2 runs a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // min of N passes: single-run times carry ~25% machine noise on this
    // host; the minimum is the standard stable estimator of a query's
    // actual cost (passes recorded in the metric line).
    // 2 by default: suite-per-pass already spreads a query's samples
    // minutes apart; set SPARK_GRAFT_PASSES=3 for local measurement.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val outcomes = run(spark, sfDir, names, passes)
    val failed = outcomes.collect { case o if o.minSec.isEmpty => o.name }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = outcomes.map(o => "\"" + o.name + "\":" + o.minSec.getOrElse(-1.0))
      .mkString("{", ",", "}")
    val sp = outcomes.map { o =>
      "\"" + o.name + "\":" +
        o.spans.map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = outcomes.flatMap(_.minSec).sum
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spans":$sp,"failed":$failedJson,"sf":"$sfDir","passes":$passes}"""
    println(fullLine)
    outcomes.filter(_.err.isDefined).foreach { o =>
      System.err.println(s"[bench] FAILED ${o.name}: ${o.err.get}") }
    // stdout tail capture keeps only the last ~2 KB, which truncates the
    // per-query map before the a-s families — persist the FULL record to
    // a file so post-run analysis can rank every query, not the last 25
    val fullPath = java.nio.file.Paths.get("target/bench_full.json")
    java.nio.file.Files.createDirectories(fullPath.getParent)
    java.nio.file.Files.write(fullPath,
      (fullLine + "\n").getBytes("UTF-8"))
    // The per-query map above runs ~3 KB for 119 queries — longer than the
    // driver's tail capture. Emit a compact total-only line LAST so a
    // parseable metric line always survives tail truncation; it carries
    // the failed list so a crashing run is self-describing even truncated.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","passes":$passes,"nqueries":${outcomes.size},"failed":$failedJson}""")
    spark.stop()
    // a run with any failed query is a FAILED run — exit nonzero so the
    // driver (and any CI wrapper) cannot mistake it for clean
    if (exitCode(outcomes) != 0) sys.exit(1)
  }
}
