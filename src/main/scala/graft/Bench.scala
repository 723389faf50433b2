package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  /** One query's outcome across passes: min time (sec) or None if any pass
    * failed, every per-pass sample (sec), plus the wall-clock span of every
    * sample. min is the cost estimator (strips host-stall noise); the full
    * sample list is kept so a later reader can compute mean / pass-to-pass
    * variance and tell "query got slower" from "one pass hit a stall". */
  final case class Outcome(name: String, minSec: Option[Double],
                           samples: List[Double],
                           spans: List[(Long, Long)], err: Option[String]) {
    def meanSec: Option[Double] =
      if (samples.isEmpty || minSec.isEmpty) None
      else Some(samples.sum / samples.size)

    /** Upper median — the stall-robust central estimate: one poisoned
      * pass moves the mean a lot and the median not at all, so
      * min ≈ median says "stable", median >> min says "noisy run". */
    def medianSec: Option[Double] =
      if (samples.isEmpty || minSec.isEmpty) None
      else Some(samples.sorted.apply(samples.size / 2))
  }

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
          passes: Int, warmupPasses: Int = 0): Seq[Outcome] = {
    // unrecorded warmup: the first execution of a streaming gate pays
    // one-time staging (memoized restage writes, checkpoint dirs) and
    // is the sample most exposed to this host's IO-stall bands — run
    // the suite once unmeasured so every RECORDED sample is steady
    // state. Errors surface in the measured passes, not here.
    for (_ <- 1 to warmupPasses) queries.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count(); () } catch { case _: Throwable => }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val times = Array.fill(queries.size)(Double.MaxValue)
    val samples = Array.fill(queries.size)(List.empty[Double])
    val spans = Array.fill(queries.size)(List.empty[(Long, Long)])
    val errs = Array.fill(queries.size)(Option.empty[String])
    for (_ <- 1 to passes) {
      queries.zipWithIndex.foreach { case ((name, fn), i) =>
        val w0 = System.currentTimeMillis()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count();
          val sec = (System.nanoTime() - t0) / 1e9
          samples(i) = samples(i) :+ sec
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
        samples(i), spans(i), errs(i))
    }
  }

  /** Locale-independent fixed-point rendering — the record is JSON and
    * must not pick up a comma decimal separator from the JVM locale. */
  private[graft] def num(d: Double, prec: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${prec}f", Double.box(d))

  /** Regression comparator: every query whose min-of-N grew >= `threshold`×
    * vs a previous record, annotated with THIS run's pass-to-pass spread so
    * a reader can tell a real regression (tight samples, all slow) from a
    * stall-poisoned pass (wide spread). `prev` maps name -> previous minSec. */
  def movers(outcomes: Seq[Outcome], prev: Map[String, Double],
             threshold: Double = 1.5): Seq[String] =
    outcomes.flatMap { o =>
      for {
        now <- o.minSec
        before <- prev.get(o.name)
        if before > 0 && now / before >= threshold
      } yield {
        val spread =
          if (o.samples.size < 2) "single-sample"
          else s"samples=[${o.samples.map(num(_, 2)).mkString(",")}] " +
            s"spread=${num(o.samples.max / o.samples.min, 2)}x"
        // median/min disagreement is the stall signature: a genuine
        // regression moves every sample, a stall-poisoned run moves
        // the max (and maybe the median) while min stays put
        val stability = o.medianSec.map { med =>
          if (o.minSec.exists(mn => med <= mn * 1.25)) " median-stable"
          else s" median=${num(med, 2)}s (noisy run — re-pin isolated)"
        }.getOrElse("")
        s"[bench] MOVER ${o.name}: ${num(before, 2)} -> ${num(now, 2)} s " +
          s"(${num(now / before, 2)}x) $spread$stability"
      }
    }

  /** Parse the `"queries":{...}` per-query map out of a prior bench record
    * (target/bench_full.json line format). Hand-rolled: the values are flat
    * `"name":1.23` pairs, no JSON lib on the classpath needed. */
  def parsePrevQueries(json: String): Map[String, Double] = {
    val m = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(json)
    m.map(_.group(1).split(",").flatMap { kv =>
      kv.split(":") match {
        case Array(k, v) =>
          try Some(k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble)
          catch { case _: NumberFormatException => None }
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)
  }

  /** Normalized regression diff against the COMMITTED per-gate baseline
    * (`bench_baseline.json`): each gate's ratio now/baseline divides by
    * the MEDIAN ratio across all gates, so uniform machine variance
    * (every gate 1.3× on a slower host / noisier day) cancels and only
    * gates that moved RELATIVE TO THE BOARD surface. Returns
    * (gate, rawRatio, normalizedRatio) for every gate whose normalized
    * ratio >= `threshold` and whose current time clears `floorSec`
    * (sub-floor gates are all jitter at sf0.1). Empty baseline = empty
    * diff — the run records, it never blocks. */
  def regressions(outcomes: Seq[Outcome], baseline: Map[String, Double],
                  threshold: Double = 1.5, floorSec: Double = 0.3):
      Seq[(String, Double, Double)] = {
    val ratios = outcomes.flatMap(o => for {
      now <- o.minSec
      base <- baseline.get(o.name)
      if base > 0
    } yield (o.name, now, now / base))
    if (ratios.isEmpty) Nil
    else {
      val med = ratios.map(_._3).sorted.apply(ratios.size / 2)
      val norm = math.max(med, 1e-9)
      ratios.collect {
        case (n, now, r) if r / norm >= threshold && now >= floorSec =>
          (n, r, r / norm)
      }.sortBy(-_._3)
    }
  }

  /** Baseline-file JSON with `fresh` gates appended — existing entries
    * NEVER move (a full refresh is the explicit WRITE_BASELINE path);
    * `parsePrevQueries` round-trips the queries map. */
  def appendedBaselineJson(baseline: Map[String, Double],
                           fresh: Seq[(String, Double)],
                           passes: Int, sf: String): String = {
    val merged = (baseline ++ fresh.filterNot(f => baseline.contains(f._1)))
      .toSeq.sortBy(_._1)
      .map { case (n, t) => "\"" + n + "\":" + t }
      .mkString("{", ",", "}")
    s"""{"note":"per-gate min-of-$passes baseline; regenerate via SPARK_GRAFT_WRITE_BASELINE=1 on a full clean run","sf":"$sf","queries":$merged}"""
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
    // actual cost (passes recorded in the metric line). 3 by default
    // (round-9 verdict: min-of-N with N>=3 alongside the mean) —
    // suite-per-pass spreads a query's samples minutes apart, so a host
    // stall window poisons at most one of the three.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_PASSES", "3").toInt)
    // one unrecorded suite pass by default (SPARK_GRAFT_WARMUP=0 to
    // skip): first executions pay memoized staging + checkpoint setup
    // and sit in the host's IO-stall band most often — warming keeps
    // recorded samples steady-state and cuts false mover flags
    val warmup = math.max(0,
      sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1").toInt)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // read the PREVIOUS full record before this run overwrites it — the
    // regression comparator below diffs against it (>=1.5x movers).
    val prevPath = sys.env.getOrElse("SPARK_GRAFT_PREV", "target/bench_full.json")
    val prev: Map[String, Double] =
      try parsePrevQueries(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(prevPath)), "UTF-8"))
      catch { case _: Throwable => Map.empty }
    // COMMITTED cross-round baseline (bench_baseline.json at the repo
    // root, min-of-3 at sf0.1 — regenerate with
    // SPARK_GRAFT_WRITE_BASELINE=1 after an intentional perf change):
    // the normalized diff below is the round-over-round regression
    // gate that span archaeology used to approximate by hand
    val basePath = sys.env.getOrElse("SPARK_GRAFT_BASELINE",
      "bench_baseline.json")
    val baseline: Map[String, Double] =
      try parsePrevQueries(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(basePath)), "UTF-8"))
      catch { case _: Throwable => Map.empty }
    val outcomes = run(spark, sfDir, names, passes, warmupPasses = warmup)
    val failed = outcomes.collect { case o if o.minSec.isEmpty => o.name }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val qs = outcomes.map(o => "\"" + o.name + "\":" + o.minSec.getOrElse(-1.0))
      .mkString("{", ",", "}")
    val means = outcomes.map(o => "\"" + o.name + "\":" + o.meanSec.getOrElse(-1.0))
      .mkString("{", ",", "}")
    val medians = outcomes.map(o =>
      "\"" + o.name + "\":" + o.medianSec.getOrElse(-1.0))
      .mkString("{", ",", "}")
    val smp = outcomes.map { o =>
      "\"" + o.name + "\":" +
        o.samples.map(num(_, 4)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val sp = outcomes.map { o =>
      "\"" + o.name + "\":" +
        o.spans.map { case (a, b) => s"[$a,$b]" }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = outcomes.flatMap(_.minSec).sum
    val regs = regressions(outcomes, baseline)
    val regJson = regs.map { case (n, r, nr) =>
      s"""{"q":"$n","ratio":${num(r, 2)},"norm":${num(nr, 2)}}"""
    }.mkString("[", ",", "]")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"mean":$means,"median":$medians,"samples":$smp,"spans":$sp,"failed":$failedJson,"regressions":$regJson,"baselineGates":${baseline.size},"sf":"$sfDir","passes":$passes,"warmup":$warmup}"""
    println(fullLine)
    regs.foreach { case (n, r, nr) =>
      System.err.println(s"[bench] REGRESSION $n: ${num(r, 2)}x raw, " +
        s"${num(nr, 2)}x vs the board median — a genuine per-gate " +
        "slowdown, not machine variance") }
    // regression guard: print every >=1.5x mover vs the previous record with
    // this run's pass-to-pass spread — tight spread + slow = real regression;
    // wide spread = a stall-poisoned pass (min already strips it).
    movers(outcomes, prev).foreach(System.err.println)
    outcomes.filter(_.err.isDefined).foreach { o =>
      System.err.println(s"[bench] FAILED ${o.name}: ${o.err.get}") }
    // stdout tail capture keeps only the last ~2 KB, which truncates the
    // per-query map before the a-s families — persist the FULL record to
    // a file so post-run analysis can rank every query, not the last 25
    val fullPath = java.nio.file.Paths.get("target/bench_full.json")
    java.nio.file.Files.createDirectories(fullPath.getParent)
    java.nio.file.Files.write(fullPath,
      (fullLine + "\n").getBytes("UTF-8"))
    // Per-gate one-line records for the driver's cross-round per-query
    // comparator (r17 verdict item 2: PERF n_common was 0 because the
    // only per-query data lived inside the single huge full-record line,
    // which tail capture truncates). One small self-describing JSON line
    // per gate — a line-oriented parser ingests however many survive its
    // capture window, and a full-stdout parser gets all of them. Purely
    // additive: the timed region, methodology and both existing metric
    // lines are unchanged.
    outcomes.foreach { o =>
      println(s"""{"metric":"gate","gate":"${o.name}","min_sec":${o.minSec.getOrElse(-1.0)},"median_sec":${o.medianSec.getOrElse(-1.0)},"passes":$passes}""")
    }
    // The per-query map above runs ~3 KB for 119 queries — longer than the
    // driver's tail capture. Emit a compact total-only line LAST so a
    // parseable metric line always survives tail truncation; it carries
    // the failed list so a crashing run is self-describing even truncated.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","passes":$passes,"nqueries":${outcomes.size},"failed":$failedJson,"regressions":$regJson}""")
    // refresh the committed baseline on request (after an intentional
    // perf change, from a clean full run on the bench host)
    val writeBaseline =
      sys.env.get("SPARK_GRAFT_WRITE_BASELINE").contains("1")
    if (writeBaseline && failed.isEmpty) {
      java.nio.file.Files.write(java.nio.file.Paths.get(basePath),
        (s"""{"note":"per-gate min-of-$passes baseline; regenerate via SPARK_GRAFT_WRITE_BASELINE=1 on a full clean run","sf":"$sfDir","queries":$qs}""" + "\n")
          .getBytes("UTF-8"))
      System.err.println(s"[bench] baseline written to $basePath " +
        s"(${outcomes.size} gates)")
    }
    // gates the baseline does not know yet (added this round) after a
    // clean run AT THE BASELINE'S OWN SF: the committed regression
    // floor only changes DELIBERATELY, so the default is a PROPOSAL —
    // the merged file lands in target/bench_baseline_proposed.json
    // with a stderr note, and only SPARK_GRAFT_APPEND_BASELINE=1
    // writes the committed file in place (a new gate's first min can
    // be lucky-fast on an idle host; an operator should look at it
    // before it becomes the permanent floor). Existing entries never
    // move either way; a full refresh stays the explicit
    // WRITE_BASELINE path above. Representative runs only: a
    // SPARK_GRAFT_ONLY subset or a single-pass smoke never lands its
    // noisy sample even in the proposal (min-of-3 is the contract).
    if (!writeBaseline && failed.isEmpty && baseline.nonEmpty &&
        only.isEmpty && passes >= 3) {
      val baseSf: Option[String] =
        try {
          val txt = new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(basePath)), "UTF-8")
          """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).map(_.group(1))
        } catch { case _: Throwable => None }
      val fresh = outcomes.filter(o =>
        o.minSec.isDefined && !baseline.contains(o.name))
      if (fresh.nonEmpty && baseSf.contains(sfDir)) {
        val merged = appendedBaselineJson(baseline,
          fresh.map(o => o.name -> o.minSec.get), passes, sfDir) + "\n"
        if (sys.env.get("SPARK_GRAFT_APPEND_BASELINE").contains("1")) {
          java.nio.file.Files.write(java.nio.file.Paths.get(basePath),
            merged.getBytes("UTF-8"))
          System.err.println(s"[bench] baseline appended: " +
            fresh.map(_.name).mkString(", "))
        } else {
          val prop =
            java.nio.file.Paths.get("target/bench_baseline_proposed.json")
          java.nio.file.Files.createDirectories(prop.getParent)
          java.nio.file.Files.write(prop, merged.getBytes("UTF-8"))
          System.err.println(s"[bench] new gate(s) not in the committed " +
            s"baseline: ${fresh.map(_.name).mkString(", ")} — proposal " +
            s"written to $prop; review and re-run with " +
            "SPARK_GRAFT_APPEND_BASELINE=1 (or copy it over " +
            s"$basePath) to adopt")
        }
      }
    }
    spark.stop()
    // a run with any failed query is a FAILED run — exit nonzero so the
    // driver (and any CI wrapper) cannot mistake it for clean
    if (exitCode(outcomes) != 0) sys.exit(1)
  }
}
