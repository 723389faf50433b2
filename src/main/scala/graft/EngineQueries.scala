package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.models._

/** Engine-model queries for the driver's correctness gate: each runs a
  * REAL pipeline through the PdModel machinery (file formats, JDBC via
  * embedded Derby, calendar windows, HWM, key stamping) and returns a
  * DataFrame whose DuckDB oracle reads only the original parquet — so a
  * hash match proves the whole roundtrip preserved the data exactly.
  */
object EngineQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def cal = Calendar.day("1995-06-15")
  private def tmp(prefix: String): String =
    Files.createTempDirectory(s"graft_$prefix").toString

  private val derby = DatabaseSource("verifydb",
    url = "jdbc:derby:memory:graftverify;create=true")

  private def derbyExec(sql: String): Unit = {
    val c = derby.connect()
    try { c.createStatement().executeUpdate(sql); () }
    catch { case _: java.sql.SQLException => } finally c.close()
  }

  /** Shared harness of the m18/m19 streaming-resample gates (the m13
    * pattern): events restage as ONE data file plus two sentinel files
    * (key -1, far-future ts) that advance the watermark across two
    * extra micro-batches (maxFilesPerTrigger=1, strictly increasing
    * mtimes pin the order), so every real per-key grid bucket closes
    * and emits before the finite AvailableNow drain ends — the emitted
    * closed subset is then the ENTIRE batch-operator row set and the
    * memory sink hash-matches the batch oracle. The sentinels' own
    * buckets never close (nothing later advances past them) and their
    * key is filtered out.
    */
  /** The sentinel-drain gates (m18/m19 resample, m27-m29 windowed
    * sketches) share one staged input per source dir: the staged files
    * ARE each gate's input (deterministic restage of events + two
    * sentinels whose far-future timestamps advance the watermark across
    * two extra micro-batches, so every real window/bucket closes and
    * emits before the finite AvailableNow drain ends), so re-staging
    * per gate and per bench pass would only re-pay the coalesce(1)
    * write — memoized per process. Each RUN still gets its own stream
    * (fresh checkpoint, fresh memory sink). Sentinel rows carry
    * user_id -1 / event_type '__sentinel'; their own windows never
    * close and every gate filters them out.
    */
  private val eventsStageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def stagedEventsSource(s: SparkSession, dir: String): DataFrame = {
    import graft.streaming.Streams
    val stage = eventsStageCache.computeIfAbsent(dir, _ => {
      val st = tmp("events_stage")
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
        .select("user_id", "event_type", "ts", "value")
      val t0 = System.currentTimeMillis()
      def stageFile(df: DataFrame, n: String, mtimeOffsetMs: Long): Unit = {
        val d = s"$st/w_$n"
        df.coalesce(1).write.parquet(d)
        val part = new java.io.File(d).listFiles()
          .filter(f => f.getName.endsWith(".parquet")).head
        val dst = java.nio.file.Paths.get(s"$st/in/$n.parquet")
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.move(part.toPath, dst)
        dst.toFile.setLastModified(t0 + mtimeOffsetMs)
        ()
      }
      stageFile(ev, "00_data", 0L)
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      def sentinel(plusDays: Int) = {
        import s.implicits._
        Seq((-1L, "__sentinel", new java.sql.Timestamp(
          maxTs.getTime + plusDays * 86400000L), 0.0))
          .toDF("user_id", "event_type", "ts", "value")
      }
      stageFile(sentinel(2), "01_s1", 60000L)
      stageFile(sentinel(4), "02_s2", 120000L)
      st
    })
    val schema = s.read.parquet(s"$stage/in/00_data.parquet").schema
    Streams.fileMonitor(s, s"$stage/in", "parquet", schema,
      options = Map("maxFilesPerTrigger" -> "1"))
  }

  private def drainAppend(s: SparkSession, df: DataFrame,
                          tag: String): DataFrame =
    graft.streaming.Streams.drainAppendToTable(s, df, tag)

  /** m38's OUT-OF-ORDER drain staging: per user, the SECOND-LATEST
    * event is withheld from the main file and delivered in a later
    * micro-batch (maxFilesPerTrigger=1, mtime-ordered), so the
    * sessionizer must handle watermark-admitted events that PRECEDE its
    * open session — the backward paths the 0-second single-file drain
    * could never reach: within a gap of the open span → extend
    * session_start backward; more than a gap before it → an earlier
    * separate session. Withholding is restricted to users where the
    * removal cannot change a decision already emitted from the main
    * file (dropping e_{n-1} must not alter the e_{n-2}→e_n boundary:
    * kept iff n == 2, or t1 − t3 ≤ gap, or t2 − t3 > gap — t_k = the
    * k-th latest timestamp), so the drained stream must equal the FULL
    * batch gap-split, session boundaries included. The 35-day
    * watermark delay exceeds the fixture's 30-day span (no event is
    * late-dropped mid-drain); sentinels sit at maxTs + delay + {2,4}
    * days so the watermark still closes every real session before the
    * finite drain ends.
    */
  private val oooStageCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def stagedEventsOutOfOrder(s: SparkSession,
                                     dir: String): DataFrame = {
    import graft.streaming.Streams
    import org.apache.spark.sql.expressions.Window
    val stage = oooStageCache.computeIfAbsent(dir, _ => {
      val st = tmp("events_ooo")
      val ev = s.read.parquet(s"$dir/events.parquet")
        .withColumn("ts", col("ts").cast("timestamp"))
        .select("user_id", "event_id", "ts")
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val ranked = ev.withColumn("__rn", row_number().over(w))
      val gap = expr("INTERVAL 30 MINUTE")
      val safe = ranked.groupBy("user_id").agg(
          max(when(col("__rn") === 1, col("ts"))).as("t1"),
          max(when(col("__rn") === 2, col("ts"))).as("t2"),
          max(when(col("__rn") === 3, col("ts"))).as("t3"),
          count(lit(1)).as("n"))
        .filter(col("n") >= 2 && (col("t3").isNull ||
          col("t1") <= col("t3") + gap || col("t2") > col("t3") + gap))
        .select(col("user_id"), lit(true).as("__late"))
      val tagged = ranked.join(safe, Seq("user_id"), "left")
        .withColumn("__hold",
          coalesce(col("__late"), lit(false)) && col("__rn") === 2)
      val t0 = System.currentTimeMillis()
      def stageFile(df: DataFrame, n: String, mtimeOffsetMs: Long): Unit = {
        val d = s"$st/w_$n"
        df.coalesce(1).write.parquet(d)
        val part = new java.io.File(d).listFiles()
          .filter(f => f.getName.endsWith(".parquet")).head
        val dst = java.nio.file.Paths.get(s"$st/in/$n.parquet")
        java.nio.file.Files.createDirectories(dst.getParent)
        java.nio.file.Files.move(part.toPath, dst)
        dst.toFile.setLastModified(t0 + mtimeOffsetMs)
        ()
      }
      stageFile(tagged.filter(!col("__hold")).select("user_id", "ts"),
        "00_data", 0L)
      stageFile(tagged.filter(col("__hold")).select("user_id", "ts"),
        "01_late", 60000L)
      val maxTs = ev.agg(max("ts")).head().getTimestamp(0)
      val delayMs = 35L * 86400000L
      def sentinel(plusDays: Int) = {
        import s.implicits._
        Seq((-1L, new java.sql.Timestamp(
          maxTs.getTime + delayMs + plusDays * 86400000L)))
          .toDF("user_id", "ts")
      }
      stageFile(sentinel(2), "02_s1", 120000L)
      stageFile(sentinel(4), "03_s2", 180000L)
      st
    })
    val schema = s.read.parquet(s"$stage/in/00_data.parquet").schema
    Streams.fileMonitor(s, s"$stage/in", "parquet", schema,
      options = Map("maxFilesPerTrigger" -> "1"))
  }

  private def streamingResampleGate(s: SparkSession, dir: String,
      tag: String, op: DataFrame => DataFrame,
      valueCol: String): DataFrame = {
    val src = stagedEventsSource(s, dir).withWatermark("ts", "0 seconds")
    drainAppend(s, op(src), tag).filter(col("user_id") >= 0)
      .select(col("user_id"), col("bucket_start"), col("n_obs"),
        col(valueCol))
  }

  val defs: Map[String, Q] = Map(
    // CSV sink+source roundtrip through an E->T->L pipeline (dialect:
    // pipe-delimited, headered). Oracle reads the parquet directly.
    "m01_csv_pipeline" -> ((s, dir) => {
      val out = tmp("csv")
      val p = Pipeline(
        ParquetModel(s"$dir/lineitem.parquet"),
        Mapper(df => df.select("l_orderkey", "l_linenumber", "l_quantity",
          "l_returnflag")),
        CsvModel(s"$out/li", delimiter = "|"))
      require(p.run(s, cal).status == Status.Done)
      // explicit schema on read-back: no inferSchema double-scan
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "l_orderkey long, l_linenumber int, l_quantity double, l_returnflag string")
      CsvModel(s"$out/li", delimiter = "|", schema = Some(schema))
        .extract(StepContext(s, cal))
    }),

    // JSON roundtrip (JSON-lines directory layout).
    "m02_json_pipeline" -> ((s, dir) => {
      val out = tmp("json")
      val p = Pipeline(
        ParquetModel(s"$dir/orders.parquet"),
        Mapper(df => df.select("o_orderkey", "o_orderstatus", "o_totalprice")),
        JsonModel(s"$out/o"))
      require(p.run(s, cal).status == Status.Done)
      JsonModel(s"$out/o", multiline = false).extract(StepContext(s, cal))
        .select(col("o_orderkey").cast("long"), col("o_orderstatus"),
          col("o_totalprice").cast("double"))
    }),

    // ORC roundtrip with a PARTITIONED sink layout (the lakehouse
    // exchange format beyond parquet): supplier -> ORC partitioned by
    // nation key -> read back. The partition column comes back from the
    // directory layout; the select restores order and type, and the
    // hash match proves layout+values survived.
    "m10_orc_pipeline" -> ((s, dir) => {
      val out = tmp("orc")
      val p = Pipeline(
        ParquetModel(s"$dir/supplier.parquet"),
        Mapper(df => df.select("s_suppkey", "s_name", "s_nationkey",
          "s_acctbal")),
        OrcModel(s"$out/sup", partitionBy = Seq("s_nationkey")))
      require(p.run(s, cal).status == Status.Done)
      OrcModel(s"$out/sup").extract(StepContext(s, cal))
        .select(col("s_suppkey").cast("long"), col("s_name"),
          col("s_nationkey").cast("long"), col("s_acctbal").cast("double"))
    }),

    // Sharded parquet sink: maxRecordsPerFile caps output file rows —
    // the trainer-sized-files layout of a curation landing zone
    // (file-count/cap invariants asserted in PipelineSpec; the hash
    // match proves sharding lost nothing).
    "m11_sharded_write" -> ((s, dir) => {
      val out = tmp("shard")
      val p = Pipeline(
        ParquetModel(s"$dir/documents.parquet"),
        ParquetModel(s"$out/docs", maxRecordsPerFile = Some(100L)))
      require(p.run(s, cal).status == Status.Done)
      ParquetModel(s"$out/docs").extract(StepContext(s, cal))
        .select("doc_id", "lang", "n_chars")
    }),

    // XML roundtrip via Spark 4's built-in xml format.
    "m03_xml_pipeline" -> ((s, dir) => {
      val out = tmp("xml")
      val p = Pipeline(
        ParquetModel(s"$dir/nation.parquet"),
        XmlModel(s"$out/n"))
      require(p.run(s, cal).status == Status.Done)
      XmlModel(s"$out/n").extract(StepContext(s, cal))
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long"))
    }),

    // JDBC table sink + source through embedded Derby: parquet ->
    // TableModel.write -> TableModel.read. Hash match proves typed
    // JDBC roundtrip fidelity.
    "m04_jdbc_table" -> ((s, dir) => {
      derbyExec("drop table m04_customer")
      derbyExec("""create table m04_customer (
        c_custkey bigint, c_name varchar(60), c_acctbal double)""")
      val t = TableModel(derby, "m04_customer", append = true)
      val p = Pipeline(
        ParquetModel(s"$dir/customer.parquet"),
        Mapper(df => df.select("c_custkey", "c_name", "c_acctbal")),
        t)
      require(p.run(s, cal).status == Status.Done)
      t.extract(StepContext(s, cal))
        .select(col("C_CUSTKEY").as("c_custkey"), col("C_NAME").as("c_name"),
          col("C_ACCTBAL").as("c_acctbal"))
    }),

    // SelectModel with pushed-down date-window knob over Derby.
    "m05_select_window" -> ((s, dir) => {
      derbyExec("drop table m05_orders")
      derbyExec("""create table m05_orders (
        o_orderkey bigint, o_totalprice double, o_orderdate timestamp)""")
      val seed = Pipeline(
        ParquetModel(s"$dir/orders.parquet"),
        Mapper(df => df.select("o_orderkey", "o_totalprice", "o_orderdate")),
        TableModel(derby, "m05_orders"))
      require(seed.run(s, cal).status == Status.Done)
      SelectModel(derby,
        text = Some("select o_orderkey, o_totalprice, o_orderdate from m05_orders"),
        knobs = ModelKnobs(dateField = Some("O_ORDERDATE")))
        .extract(StepContext(s, Calendar.day("1995-06-15").year))
        .select(col("O_ORDERKEY").as("o_orderkey"),
          col("O_TOTALPRICE").as("o_totalprice"),
          col("O_ORDERDATE").as("o_orderdate"))
    }),

    // DB-side INSERT..SELECT with HWM + key stamping (InsertModel), then
    // read the target back. Incremental contract: second execute moves 0.
    "m06_insert_select" -> ((s, dir) => {
      derbyExec("drop table m06_src")
      derbyExec("drop table m06_tgt")
      derbyExec("create table m06_src (o_orderkey bigint, o_totalprice double)")
      derbyExec("""create table m06_tgt (o_orderkey bigint,
        o_totalprice double, pd_process_id bigint)""")
      val seed = Pipeline(
        ParquetModel(s"$dir/orders.parquet"),
        Mapper(df => df.select("o_orderkey", "o_totalprice")),
        TableModel(derby, "m06_src"))
      require(seed.run(s, cal).status == Status.Done)
      val ins = InsertModel(derby, "m06_tgt",
        select = Some("select o_orderkey, o_totalprice from m06_src"),
        knobs = ModelKnobs(keyField = Some(KeyField.ProcessId),
          valueField = Some("o_orderkey")))
      val ctx = StepContext(s, cal, runId = 42L)
      ins.execute(ctx)
      require(ins.execute(ctx).resultValue.contains(0L)) // HWM: no re-copy
      TableModel(derby, "m06_tgt").extract(ctx)
        .select(col("O_ORDERKEY").as("o_orderkey"),
          col("O_TOTALPRICE").as("o_totalprice"),
          col("PD_PROCESS_ID").as("pd_process_id"))
    }),

    // Full engine slice (SURVEY.md §7.2): calendar month window + Mapper
    // + key stamping, parquet->parquet, metrics asserted.
    "m07_etl_window_keystamp" -> ((s, dir) => {
      val out = tmp("etl")
      val p = Pipeline(
        ParquetModel(s"$dir/lineitem.parquet",
          knobs = ModelKnobs(dateField = Some("l_shipdate"))),
        Mapper(df => df.select(col("l_orderkey"), col("l_linenumber"),
          upper(col("l_returnflag")).as("flag"), col("l_quantity"))),
        ParquetModel(s"$out/w",
          knobs = ModelKnobs(keyField = Some(KeyField.ProcessId))))
      val task = p.run(s, cal.month, runId = 11L)
      require(task.status == Status.Done)
      require(task.totals.recordsRead == task.totals.recordsWritten)
      s.read.parquet(s"$out/w")
    }),

    // Scheduler -> user script -> ledger -> data, end to end: a
    // script-backed job (JobScripts registry, the reference's script.py
    // twin) is charged through the REAL scheduler with a logical-date
    // tag; the fired run resolves the script via PipelineJobRunner,
    // the script runs a Pipeline stamping the run's calendar date into
    // the output, the ledger records the run Done, and the hash match
    // proves the whole loop delivered the data exactly (the tag ->
    // calendar handoff included: run_date comes from the firing tag).
    "m12_scripted_job" -> ((s, dir) => {
      import graft.scheduler._
      val out = tmp("scripted")
      JobScripts.register("m12-script") { (spark, cal) =>
        val p = Pipeline(
          ParquetModel(s"$dir/region.parquet"),
          Mapper(df => df.select(col("r_regionkey"), col("r_name"))
            .withColumn("run_date",
              lit(cal.start.toLocalDate.toString))),
          ParquetModel(s"$out/r"))
        require(p.run(spark, cal).status == Status.Done)
      }
      val db = DatabaseSource("m12db", "jdbc:derby:memory:graftm12;create=true")
      val ledger = new JdbcLedger(db)
      val runner = new PipelineJobRunner(s, new Repository(db),
        new SourceRegistry, ledger)
      val sched = new Scheduler(runner, ledger = Some(ledger))
      try {
        val job = JobSpec(12L, "m12-script")
        sched.register(job)
        // 1995-06-15T00:00:00Z — midnight tag hydrates a Day calendar
        val tag = java.time.LocalDateTime.of(1995, 6, 15, 0, 0)
          .toEpochSecond(java.time.ZoneOffset.UTC)
        require(sched.charge(job, tag).isDefined)
        require(sched.drain(), "m12 run did not finish")
        require(sched.history.peek()._2 == Status.Done,
          s"m12 run finished ${sched.history.peek()._2}")
      } finally sched.stop()
      s.read.parquet(s"$out/r")
    }),

    // Scheduler -> scripted job -> CONFIG-DRIVEN pipeline -> MERGE
    // node, end to end (the m12 loop around the maintenance DSL): the
    // update batch stages as parquet, a node-config JSON hydrates a
    // pipeline whose single node is the Merge action
    // (PipelineConfig registry -> MergeModel -> Layout.merge), the REAL
    // scheduler charges and drains the run, the ledger records it Done
    // — and the merged table must hash-match the latest-wins SQL. This
    // is the reference's posture: table maintenance as a SCHEDULED
    // declarative job, not a hand-written library call.
    "m33_dsl_merge_job" -> ((s, dir) => {
      import graft.scheduler._
      val out = tmp("dslmerge")
      val orders = s.read.parquet(s"$dir/orders.parquet")
      orders.select(col("o_orderkey"), col("o_totalprice"), lit(1L).as("ver"))
        .write.parquet(s"$out/t")
      orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 100).as("o_totalprice"), lit(2L).as("ver"))
        .unionByName(orders.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_totalprice"), lit(2L).as("ver")))
        .write.parquet(s"$out/u")
      val cfg =
        s"""[{"node_name":"maint","node_type":"Merge","node_seqno":1,
           |  "config":{"path":"$out/t","updates_path":"$out/u",
           |    "keys":"o_orderkey","version_col":"ver"}}]""".stripMargin
      JobScripts.register("m33-script") { (spark, cal) =>
        val p = PipelineConfig.fromJson("m33-merge", cfg, new SourceRegistry)
        require(p.run(spark, cal).status == Status.Done)
      }
      val db = DatabaseSource("m33db", "jdbc:derby:memory:graftm33;create=true")
      val ledger = new JdbcLedger(db)
      val runner = new PipelineJobRunner(s, new Repository(db),
        new SourceRegistry, ledger)
      val sched = new Scheduler(runner, ledger = Some(ledger))
      try {
        val job = JobSpec(33L, "m33-script")
        sched.register(job)
        val tag = java.time.LocalDateTime.of(1995, 6, 15, 0, 0)
          .toEpochSecond(java.time.ZoneOffset.UTC)
        require(sched.charge(job, tag).isDefined)
        require(sched.drain(), "m33 run did not finish")
        require(sched.history.peek()._2 == Status.Done,
          s"m33 run finished ${sched.history.peek()._2}")
      } finally sched.stop()
      s.read.parquet(s"$out/t")
    }),

    // Z-ORDER RE-CLUSTER AS A SCHEDULED JOB (the m33 pattern for
    // layout maintenance): a config-DSL Zorder node — driven through
    // the real scheduler, Derby ledger and pipeline runner — rewrites
    // the seeded lineitem table clustered on (l_orderkey, l_partkey)
    // via Layout.clusterRewrite (single-writer lease, count-verified
    // rename-aside swap). The gate pins the job's Done status, the
    // requested file layout, and row-identity of the rewritten table
    // against the raw lineitem oracle — OPTIMIZE ZORDER as a nightly
    // declarative job, not a hand-written library call.
    "m49_dsl_zorder_job" -> ((s, dir) => {
      import graft.scheduler._
      val out = tmp("dslz")
      s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
        .write.parquet(s"$out/t")
      val cfg =
        s"""[{"node_name":"recluster","node_type":"Zorder","node_seqno":1,
           |  "config":{"path":"$out/t","z_cols":"l_orderkey,l_partkey",
           |    "num_files":"8"}}]""".stripMargin
      JobScripts.register("m49-script") { (spark, cal) =>
        val p = PipelineConfig.fromJson("m49-zorder", cfg, new SourceRegistry)
        require(p.run(spark, cal).status == Status.Done)
      }
      val db = DatabaseSource("m49db", "jdbc:derby:memory:graftm49;create=true")
      val ledger = new JdbcLedger(db)
      val runner = new PipelineJobRunner(s, new Repository(db),
        new SourceRegistry, ledger)
      val sched = new Scheduler(runner, ledger = Some(ledger))
      try {
        val job = JobSpec(49L, "m49-script")
        sched.register(job)
        val tag = java.time.LocalDateTime.of(1995, 6, 15, 0, 0)
          .toEpochSecond(java.time.ZoneOffset.UTC)
        require(sched.charge(job, tag).isDefined)
        require(sched.drain(), "m49 run did not finish")
        require(sched.history.peek()._2 == Status.Done,
          s"m49 run finished ${sched.history.peek()._2}")
      } finally sched.stop()
      val res = s.read.parquet(s"$out/t")
      require(res.inputFiles.length == 8,
        s"re-cluster must land the requested 8 files, " +
          s"got ${res.inputFiles.length}")
      res.select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    }),

    // File listing as a DataFrame; oracle twin stats the same files via
    // DuckDB read_blob (name/size — mtimes excluded, not reproducible).
    "m08_filenames" -> ((s, dir) => {
      FilenamesModel(dir, mask = Some("\\.parquet$"))
        .extract(StepContext(s, cal))
        .select("file", "is_file", "size")
    }),

    // Bucketed co-located join: both sides bucketed+sorted on the join
    // key, so the sort-merge join needs NO shuffle (PlanSpec asserts the
    // exchange-free plan). The 100 TB pattern for repeated fact joins.
    "m09_bucketed_join" -> ((s, dir) => {
      // the bucketed layout is corpus-generation cost, written ONCE per
      // (session, dir) and amortized across every co-located join on it —
      // that amortization is bucketing's entire point, so re-runs measure
      // the join, not the rewrite
      val built = s.catalog.tableExists("m09_orders") &&
        s.conf.getOption("graft.m09.dir").contains(dir)
      if (!built) {
        val out = tmp("bucket")
        s.sql("DROP TABLE IF EXISTS m09_orders")
        s.sql("DROP TABLE IF EXISTS m09_lineitem")
        Tables.load(s, dir, "orders").select("o_orderkey", "o_totalprice")
          .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", s"$out/orders").saveAsTable("m09_orders")
        Tables.load(s, dir, "lineitem").select("l_orderkey", "l_quantity")
          .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", s"$out/lineitem").saveAsTable("m09_lineitem")
        s.conf.set("graft.m09.dir", dir)
      }
      s.table("m09_orders")
        .join(s.table("m09_lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(max(col("o_totalprice")).as("o_totalprice"),
          graft.functions.decSum(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"))
    }),

    // STREAMING lift gated through the batch oracle: the events parquet
    // streams through the file monitor (AvailableNow), the hourly
    // window aggregate runs as a Structured Streaming query with the
    // SAME decimal-sum contract as batch q22, and the memory sink's
    // content must hash-match q22's DuckDB oracle — batch ≡ stream as a
    // driver-checked gate, not just a spec assertion. Complete output
    // mode emits every window (append mode would withhold windows the
    // final watermark hasn't passed, which a finite drain never does
    // for the last hour of data).
    "m13_streaming_hourly" -> ((s, dir) => {
      import graft.streaming.Streams
      // the file-stream source wants a directory or glob, and the
      // fixture is a single file — the glob form covers both layouts
      val path = s"$dir/events.parquet*"
      // stream with the PHYSICAL schema, then normalize ts exactly as
      // Tables.load does for batch (the events ts dtype has drifted
      // across fixture generations)
      val phys = s.read.parquet(s"$dir/events.parquet").schema
      val src = Streams.fileMonitor(s, path, "parquet", phys)
        .withColumn("ts", col("ts").cast("timestamp"))
      val agg = Streams.windowedStats(src, "ts", "1 hour",
        watermark = "1 hour", valueCol = "value",
        keyCols = Seq("event_type"), sumAgg = graft.functions.decSum)
      val name = s"m13_sink_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).select(col("window_start").as("hour_ts"),
        col("event_type"), col("n"), col("sum_value"))
    }),

    // Ingest-then-compact maintenance roundtrip: five micro-batch
    // appends fragment a partitioned parquet sink (one file per task
    // per touched partition dir — the daily-ingest shape), then
    // Layout.compact rewrites it clustered behind the rename swap. The
    // read-back must hash-match the source table: the oracle proves
    // the maintenance pass is row-exact end to end, not just smaller.
    "m14_compacted_sink" -> ((s, dir) => {
      val out = s"${tmp("compact")}/li"
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
      for (b <- 0 until 5)
        li.filter(pmod(col("l_orderkey"), lit(5)) === b)
          .write.mode("append").partitionBy("l_returnflag").parquet(out)
      val (before, after) =
        graft.operators.Layout.compact(s, out, Seq("l_returnflag"))
      require(after < before, s"compaction did not shrink: $before -> $after")
      s.read.parquet(out).select("l_orderkey", "l_linenumber",
        "l_returnflag", "l_quantity")
    }),

    // Keyed latest-wins upsert (Layout.merge): base table at version 1,
    // one update batch at version 2 that rewrites every 10th key and
    // inserts shifted new keys. The oracle recomputes the merge as a
    // window over base UNION ALL batch — a hash match proves the
    // partition-pruned copy-on-write rewrite is row-exact MERGE INTO.
    "m15_merge_upsert" -> ((s, dir) => {
      val out = s"${tmp("merge")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      orders.select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(1L).as("ver"))
        .write.partitionBy("o_orderstatus").parquet(out)
      val batch = orders
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") + 100).as("o_totalprice"), lit(2L).as("ver"))
        .unionByName(orders
          .filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"), lit(2L).as("ver")))
      graft.operators.Layout.merge(s, out, batch, Seq("o_orderkey"), "ver",
        partitionCols = Seq("o_orderstatus"))
      s.read.parquet(out).select(col("o_orderkey"),
        col("o_orderstatus").cast("string").as("o_orderstatus"),
        col("o_totalprice"), col("ver"))
    }),

    // CDC apply (Layout.merge with deleteCol): one batch carrying
    // updates, inserts AND tombstones against a keyed base table; the
    // oracle recomputes the full change application in SQL. Delete and
    // update key sets are disjoint by construction (same key twice at
    // one version would be tie-ambiguous in any engine).
    "m17_cdc_apply" -> ((s, dir) => {
      val out = s"${tmp("cdc")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      orders.select(col("o_orderkey"), col("o_totalprice"), lit(1L).as("ver"))
        .write.parquet(out)
      val batch = orders
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 100).as("o_totalprice"),
          lit(2L).as("ver"), lit(false).as("del"))
        .unionByName(orders
          .filter(pmod(col("o_orderkey"), lit(13)) === 0 &&
            pmod(col("o_orderkey"), lit(10)) =!= 0)
          .select(col("o_orderkey"), col("o_totalprice"),
            lit(2L).as("ver"), lit(true).as("del")))
        .unionByName(orders
          .filter(pmod(col("o_orderkey"), lit(11)) === 0)
          .select((col("o_orderkey") + 2000000000L).as("o_orderkey"),
            col("o_totalprice"), lit(2L).as("ver"), lit(false).as("del")))
      graft.operators.Layout.merge(s, out, batch, Seq("o_orderkey"), "ver",
        deleteCol = Some("del"))
      s.read.parquet(out)
    }),

    // STREAMING resample+ffill gated through batch q53's oracle (the
    // m13 pattern): events restage as ONE data file plus two sentinel
    // files (key -1, far-future ts) that advance the watermark across
    // two extra micro-batches, so every real per-key grid bucket closes
    // and emits before the finite AvailableNow drain ends — the emitted
    // closed subset is then the ENTIRE q53 row set, and the memory sink
    // must hash-match the same DuckDB oracle as batch. The sentinels'
    // own buckets never close (nothing later advances past them) and
    // their key is filtered out.
    "m18_streaming_resample" -> ((s, dir) =>
      streamingResampleGate(s, dir, "m18",
        src => graft.streaming.Resample.ffill(src, 21600L).toDF(),
        "value_ffill")),

    // The linear-interpolation sibling (q56's streaming lift): same
    // drain, same state machine — gaps lerp toward the bucket that
    // closes them instead of carrying the last value. Shares q56's
    // oracle verbatim.
    "m19_streaming_resample_interp" -> ((s, dir) =>
      streamingResampleGate(s, dir, "m19",
        src => graft.streaming.Resample.interp(src, 21600L),
        "value_interp")),

    // STREAMING windowed KMV sketches gated through batch q50's oracle:
    // events stream through the sentinel drain, each closed (day,
    // event_type) window emits its bounded KMV distinct sketch, and the
    // landed windows MERGE per type into exactly the sketch a direct
    // batch pass builds (merge_lossless) with the estimate inside 10%
    // of the exact count (est_ok) — the continuously-ingested sketch
    // cube returns what the batch cube returns, driver-checked.
    "m27_streaming_sketch_window" -> ((s, dir) => {
      import graft.expressions.Kmv
      import graft.streaming.Streams
      val k = 1024
      val win = Streams.sketchByWindow(stagedEventsSource(s, dir),
        "ts", "1 day", "0 seconds", xxhash64(col("user_id")),
        keyCols = Seq("event_type"), k = k)
      val merged = drainAppend(s, win, "m27")
        .filter(col("event_type") =!= "__sentinel")
        .groupBy("event_type").agg(Kmv.merge(col("sk"), k).as("msk"))
      val direct = s.read.parquet(s"$dir/events.parquet")
        .groupBy("event_type")
        .agg(Kmv.sketch(xxhash64(col("user_id")), k).as("dsk"),
          countDistinct(col("user_id")).as("exact_n"))
      merged.join(direct, "event_type")
        .select(col("event_type"), col("exact_n"),
          (col("msk") === col("dsk")).as("merge_lossless"),
          ((abs(Kmv.estimate(col("msk"), k) - col("exact_n").cast("double")) /
            col("exact_n").cast("double")) <= 0.10).as("est_ok"))
    }),

    // STREAMING windowed heavy hitters gated through batch q51's
    // oracle: per-day SpaceSaving summaries stream out as windows
    // close; capacity 2048 exceeds every window's key cardinality, so
    // each summary is EXACT and the per-key sum across landed windows
    // is the exact global count — the streamed top-10 must hash-match
    // the exact groupBy oracle.
    "m28_streaming_topkeys_window" -> ((s, dir) => {
      import graft.expressions.TopKeys
      import graft.streaming.Streams
      val src = stagedEventsSource(s, dir)
        .withColumn("key", col("user_id").cast("string"))
      val win = Streams.topKeysByWindow(src, "ts", "1 day", "0 seconds",
        col("key"), capacity = 2048)
      drainAppend(s, win, "m28")
        .select(explode(col("top")).as("t"))
        .select(col("t.key").as("key"), col("t.count_lo").as("c"))
        .filter(col("key") =!= "-1")
        .groupBy("key").agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("key").asc).limit(10)
        .select(col("key"), col("cnt").as("count_hi"),
          col("cnt").as("count_lo"))
    }),

    // STREAMING windowed KLL quantile sketches gated through batch
    // q55's oracle: per-(day, event_type) sketches land as windows
    // close and merge per type; n is summed from the STREAM's own
    // window counts (exact pin), and — the q55 scale-invariant
    // contract — the merged sketch's p50/p95 land within O(1/k) of
    // the true rank and agree with the direct batch sketch to the
    // same bound (byte-equality only holds below the compaction
    // threshold; the sf0.1 replay caught that cliff).
    "m29_streaming_quantile_window" -> ((s, dir) => {
      import graft.expressions.Kll
      import graft.streaming.Streams
      val k = 4096
      val win = Streams.quantilesByWindow(stagedEventsSource(s, dir),
        "ts", "1 day", "0 seconds", col("value"),
        keyCols = Seq("event_type"), k = k)
      val merged = drainAppend(s, win, "m29")
        .filter(col("event_type") =!= "__sentinel")
        .groupBy("event_type")
        .agg(Kll.merge(col("sk"), k).as("msk"), sum(col("n")).as("n"))
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_type"), col("value"))
      val direct = ev.groupBy("event_type")
        .agg(Kll.sketch(col("value"), k).as("dsk"))
      val est = merged.join(direct, "event_type")
        .select(col("event_type"), col("n"),
          Kll.quantile(col("msk"), 0.5).as("m50"),
          Kll.quantile(col("msk"), 0.95).as("m95"),
          Kll.quantile(col("dsk"), 0.5).as("d50"),
          Kll.quantile(col("dsk"), 0.95).as("d95"))
      val tol = 16.0 / k
      ev.join(est, "event_type").groupBy("event_type")
        .agg(max("n").as("n"),
          sum(when(col("value") <= col("m50"), 1L).otherwise(0L))
            .as("r50m"),
          sum(when(col("value") <= col("m95"), 1L).otherwise(0L))
            .as("r95m"),
          sum(when(col("value") <= col("d50"), 1L).otherwise(0L))
            .as("r50d"),
          sum(when(col("value") <= col("d95"), 1L).otherwise(0L))
            .as("r95d"))
        .select(col("event_type"), col("n"),
          (abs(col("r50m") - lit(0.5) * col("n")) <= lit(tol) * col("n"))
            .as("p50_rank_ok"),
          (abs(col("r95m") - lit(0.95) * col("n")) <= lit(tol) * col("n"))
            .as("p95_rank_ok"),
          (abs(col("r50m") - col("r50d")) <= lit(tol) * col("n") &&
            abs(col("r95m") - col("r95d")) <= lit(tol) * col("n"))
            .as("merge_rank_ok"))
    }),

    // STREAMING range enrich gated through batch q46's arithmetic:
    // lineitems STREAM through the stream-static binned interval join
    // (Streams.rangeEnrich — stateless; the bin-width probe runs on
    // the static side only) against urgent-order attribution windows,
    // the enriched rows land in a parquet sink (the scale-honest drain:
    // at 100 TB the joined stream is not a driver-side table), and the
    // post-drain aggregation must hash-match the batch BETWEEN-join
    // oracle. The window set is subsampled (every 20th urgent order) to
    // keep the gate's joined volume bounded — semantics, not scale, is
    // what the gate pins.
    "m32_streaming_range_enrich" -> ((s, dir) => {
      import graft.streaming.Streams
      def ep(c: org.apache.spark.sql.Column) =
        c.cast("timestamp_ltz").cast("long")
      val liBatch = s.read.parquet(s"$dir/lineitem.parquet")
      val urgent = s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT" &&
          pmod(col("o_orderkey"), lit(20)) === 0)
        .select(col("o_orderkey"),
          ep(col("o_orderdate")).as("win_start"),
          (ep(col("o_orderdate")) + lit(259200L)).as("win_end"))
      val src = Streams.fileMonitor(s, s"$dir/lineitem.parquet*",
          "parquet", liBatch.schema)
        .select(col("l_extendedprice"), ep(col("l_shipdate")).as("ship_ep"))
      val enriched = Streams.rangeEnrich(src, urgent,
        "ship_ep", "win_start", "win_end")
      val out = tmp("m32_sink")
      val q = enriched.writeStream.format("parquet")
        .option("path", s"$out/p")
        .option("checkpointLocation", s"$out/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$out/p")
        .groupBy("o_orderkey")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_extendedprice").cast("decimal(38,6)"))
            .cast("double").as("sum_price"))
    }),

    // STREAM-STREAM keyed interval join gated through batch q47's
    // oracle: clicks and purchases arrive as TWO independent unbounded
    // streams (two file monitors over the staged events), and
    // Streams.intervalJoin pairs each click with the same user's
    // purchase windows ([p, p+3600], both ends inclusive) — the
    // attribution query run CONTINUOUSLY, state bounded by the
    // time-range condition, inner matches emitting as both sides land.
    // The post-drain per-user count must hash-match the batch
    // BETWEEN-join oracle. Timestamps floor to epoch seconds on both
    // sides first (q47's epoch arithmetic, spelled identically). No
    // sentinel staging: INNER stream-stream matches emit eagerly as
    // both sides land — the watermark only bounds state, so the plain
    // single-file monitors drain in one micro-batch per side.
    "m34_stream_stream_attribution" -> ((s, dir) => {
      import graft.streaming.Streams
      val phys = s.read.parquet(s"$dir/events.parquet").schema
      def side() = Streams
        .fileMonitor(s, s"$dir/events.parquet*", "parquet", phys)
        .withColumn("tsf",
          col("ts").cast("timestamp").cast("long").cast("timestamp"))
      val clicks = side()
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("tsf").as("click_ts"))
      val purchases = side()
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("tsf").as("purchase_ts"))
      val joined = Streams.intervalJoin(clicks, purchases,
        keyCols = Seq("user_id"), pointTsCol = "click_ts",
        intervalTsCol = "purchase_ts", spanSeconds = 3600L,
        pointWatermark = "0 seconds", intervalWatermark = "0 seconds")
      drainAppend(s, joined, "m34")
        .groupBy("user_id").agg(count(lit(1)).as("n_attributed"))
    }),

    // STREAMING line-boilerplate removal gated through t20's oracle:
    // the frequent-line set calibrates on the BATCH staged corpus
    // (bounded collect), the same staged docs stream through the file
    // monitor, and the stateless split/filter/rejoin projection must
    // reproduce the batch rebuild byte for byte (every staged doc
    // keeps its unique trailer, so the batch path's drop-empty-docs
    // difference cannot bite). The m21 stateless-lift pattern — no
    // sentinels needed.
    "m35_streaming_boilerplate" -> ((s, dir) => {
      import graft.streaming.Streams
      def staged(df: DataFrame) = df.select(col("doc_id"),
        concat_ws("\n", col("text"),
          concat(lit("copyright footer "), col("source")),
          concat(lit("unique "), col("doc_id").cast("string"))).as("text"))
      val batchDocs = s.read.parquet(s"$dir/documents.parquet")
      val bp = graft.operators.Boilerplate.frequentLines(
        staged(batchDocs), "doc_id", "text", minDocs = 5)
      val src = staged(Streams.fileMonitor(s, s"$dir/documents.parquet*",
        "parquet", batchDocs.schema))
      drainAppend(s, Streams.boilerplateFilter(src, "text", bp), "m35")
        .select("doc_id", "text")
    }),

    // STREAMING quality-classifier scoring gated through c11's oracle:
    // the model trains once on the BATCH corpus (weak gopher labels),
    // its coefficients ride into the stream as literals, and scoring is
    // one stateless codegen'd projection (no MLlib, no state, no
    // watermark — the m21/m35 pattern). The drained scored stream must
    // reproduce the batch distillation aggregate: same exact counts,
    // same margin booleans.
    "m36_streaming_quality_score" -> ((s, dir) => {
      import graft.streaming.Streams
      import graft.operators.QualityClassifier
      import graft.functions.TextFunctions.gopherRules
      val feats = Seq("n_words", "mean_word_len", "dup_line_frac",
        "bullet_line_frac", "ellipsis_line_frac", "stopword_count",
        "alpha_word_frac")
      def labeled(df: DataFrame) = df
        .select(col("doc_id"), gopherRules(col("text")).as("g"))
        .select(col("doc_id") +: col("g.gopher_pass").as("label") +:
          feats.map(f => col(s"g.$f")): _*)
      val batchDocs = s.read.parquet(s"$dir/documents.parquet")
      val model = QualityClassifier.train(labeled(batchDocs), feats, "label")
      val src = labeled(Streams.fileMonitor(s,
          s"$dir/documents.parquet*", "parquet", batchDocs.schema))
        .select(col("label"), QualityClassifier.scoreColumn(model).as("p"))
      drainAppend(s, src, "m36")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("label"), 1L).otherwise(0L)).as("n_pass"),
          avg(when((col("p") >= 0.5) === col("label"), 1.0)
            .otherwise(0.0)).as("__agree"),
          avg(when(col("label"), col("p"))).as("__p1"),
          avg(when(!col("label"), col("p"))).as("__p0"))
        .select(col("n_docs"), col("n_pass"),
          (col("__agree") >= 0.80).as("agreement_ok"),
          ((col("__p1") - col("__p0")) >= 0.2).as("separation_ok"))
    }),

    // Manifest-table small-file compaction (Layout.compactManifest):
    // the maintenance compact of manifest-disciplined tables. A CDC
    // merge leaves every touched partition's live generation with one
    // file per shuffle task (32 here); compaction rewrites those
    // partitions single-file into next generations and publishes ONE
    // new manifest. The gate pins all four claims: a reader pinned
    // BEFORE the compaction keeps its snapshot bit-for-bit (atomic
    // publish), every compacted live generation is exactly one data
    // file (the small-file cure), re-compaction is a no-op (selection
    // respects maxFiles), and the final read hash-matches the DuckDB
    // merge oracle (row-identical rewrite).
    "m37_manifest_compact" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("mancompact")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, seed, Seq("o_orderstatus"))
      // the CDC batch touches every status partition. Manifest writers
      // now CLUSTER on the partition columns (one file per rewritten
      // dir), so the one remaining source of multi-file generations is
      // maxRecordsPerFile splitting an oversized partition — scope it
      // low for the merge to create exactly the layout compaction
      // exists to cure
      val batch = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") + 100).as("o_totalprice"),
          lit(2L).as("ver"))
      val mrKey = "spark.sql.files.maxRecordsPerFile"
      val mrPrev = s.conf.get(mrKey, "0")
      // scale the split size from the data (~10 files per status
      // partition at ANY scale factor) — a fixed threshold stops
      // splitting at small fixtures and the multi-file precondition
      // silently vanishes
      s.conf.set(mrKey, math.max(1L, orders.count() / 30).toString)
      try Layout.mergeManifest(s, out, batch, Seq("o_orderkey"), "ver")
      finally s.conf.set(mrKey, mrPrev)
      def chk(df: DataFrame): (Long, Long) = {
        val r = df.select(xxhash64(col("o_orderkey"),
            col("o_orderstatus").cast("string"), col("o_totalprice"),
            col("ver")).as("h"))
          .agg(count(lit(1)), expr("bit_xor(h)")).head()
        (r.getLong(0), r.getLong(1))
      }
      val pinned = Layout.readManifest(s, out)
      val pinnedChk = chk(pinned)
      val compacted = Layout.compactManifest(s, out, maxFiles = 1)
      require(compacted.nonEmpty,
        "the merged partitions must have been multi-file")
      require(chk(pinned) == pinnedChk,
        "reader pinned before a concurrent manifest compaction must " +
          "keep its snapshot bit-for-bit")
      val live = Layout.readManifest(s, out)
      val perDir = live.inputFiles.groupBy(f =>
        f.substring(0, f.lastIndexOf('/')))
      compacted.foreach { rel =>
        val n = perDir.collectFirst {
          case (d, fs) if d.contains(s"/$rel/") => fs.length }
        require(n.contains(1),
          s"compacted partition $rel must be exactly one data file, got $n")
      }
      require(Layout.compactManifest(s, out, maxFiles = 1).isEmpty,
        "re-compaction must be a no-op")
      require(chk(live) == chk(pinned),
        "compaction must be row-identical")
      live.select(col("o_orderkey"),
        col("o_orderstatus").cast("string").as("o_orderstatus"),
        col("o_totalprice"), col("ver"))
    }),

    // STREAMING gap-sessionization, gated BOUNDARY-EXACT against the
    // batch gap-split: the custom-state operator
    // (flatMapGroupsWithState + event-time timeout,
    // graft.streaming.Sessionize) runs over an OUT-OF-ORDER
    // multi-micro-batch drain at a nonzero (35-day) watermark delay —
    // each user's second-latest event arrives one micro-batch LATE, so
    // the backward paths (extend session_start within gap; split an
    // earlier session beyond it) are genuinely exercised — and every
    // emitted (user, session_start, session_end, n_events) row must
    // hash-match the batch lag/gap-split oracle over the full events
    // table. A boundary-shifting bug that preserves per-user rollups
    // (the weakness of the old per-user-sum oracle) now flips the gate.
    "m38_streaming_sessionize" -> ((s, dir) => {
      val src = stagedEventsOutOfOrder(s, dir)
        .withWatermark("ts", "35 days")
      val sessions = graft.streaming.Sessionize.sessions(src, gapMinutes = 30)
      drainAppend(s, sessions.toDF(), "m38")
        .filter(col("user_id") >= 0)
        .select("user_id", "session_start", "session_end", "n_events")
    }),

    // STREAMING ingest dedup (dropDuplicatesWithinWatermark) gated
    // through a DISTINCT oracle: the stream projects to its dedup key
    // columns so the survivor row is the key itself (first-wins
    // arbitrariness cannot show), and the watermark horizon (10 days)
    // exceeds the staged data's span, so nothing evicts mid-drain and
    // the streamed output is exactly the batch DISTINCT — the bounded-
    // state contract (keys older than the horizon WOULD evict and
    // readmit) is the operator's documented at-scale semantics, pinned
    // separately in SurfacesSpec.
    "m39_streaming_dedup" -> ((s, dir) => {
      import graft.streaming.Streams
      val src = stagedEventsSource(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val deduped = Streams.streamingDedup(src,
        Seq("user_id", "event_type"), "ts", "10 days")
      drainAppend(s, deduped, "m39")
        .filter(col("user_id") >= 0)
        .select("user_id", "event_type")
    }),

    // Manifest data-skipping stats (Layout.readManifestBetween): the
    // table is partitioned by a COARSE time bucket (order year) but the
    // manifest stores per-partition min/max of the exact timestamp, so
    // a three-month window prunes every other year's generation from
    // the read — file-level stats beating partition values, kept
    // current through the merge (every touched partition's stats
    // recompute from its rewritten generation). The gate pins pruning
    // (every scanned file is under o_year=1996) AND exactness (the
    // in-plan residual filter hash-matches the DuckDB window oracle
    // over the merged table).
    "m40_manifest_dataskip" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("manskip")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        col("o_orderdate"), col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, seed, Seq("o_year"),
        statsCols = Seq("o_orderdate"))
      val batch = seed.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100)
        .withColumn("ver", lit(2L))
      Layout.mergeManifest(s, out, batch, Seq("o_orderkey"), "ver")
      val res = Layout.readManifestBetween(s, out, "o_orderdate",
        "1996-02-01 00:00:00", "1996-04-30 23:59:59")
      val offYear = res.inputFiles.filterNot(_.contains("/o_year=1996/"))
      require(res.inputFiles.nonEmpty && offYear.isEmpty,
        s"stats must prune every non-1996 generation, scanned: " +
          offYear.take(3).mkString(","))
      res.select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
        col("o_orderdate"), col("o_totalprice"), col("ver"))
    }),

    // MULTI-COLUMN manifest data-skipping (Layout.readManifestPruned):
    // real queries AND ranges — here a three-month date window × an
    // order-key band — and a partition generation is read only when
    // its stats intersect EVERY window, so each extra predicate
    // shrinks the scan. The table partitions by (year, key band) and
    // keeps min/max of BOTH the exact timestamp and the key, so the
    // gate can pin pruning on both dimensions structurally (every
    // scanned file under o_year=1996 AND an overlapping band) plus the
    // conjunction's strictness (fewer files than the date-only read),
    // while the in-plan residual keeps the result hash-exact against
    // the merged-table oracle.
    "m48_manifest_multiskip" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("manskip2")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        floor(col("o_orderkey") / 2000.0).cast("long").as("o_band"),
        col("o_orderdate"), col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, seed, Seq("o_year", "o_band"),
        statsCols = Seq("o_orderdate", "o_orderkey"))
      val batch = seed.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100)
        .withColumn("ver", lit(2L))
      Layout.mergeManifest(s, out, batch, Seq("o_orderkey"), "ver")
      val res = Layout.readManifestPruned(s, out, Seq(
        ("o_orderdate", "1996-02-01 00:00:00", "1996-04-30 23:59:59"),
        ("o_orderkey", 1000L, 5000L)))
      // keys 1000..5000 can only live in bands 0..2 (band = key/2000)
      val offDim = res.inputFiles.filterNot(f =>
        f.contains("/o_year=1996/") &&
          (0 to 2).exists(b => f.contains(s"/o_band=$b/")))
      require(res.inputFiles.nonEmpty && offDim.isEmpty,
        "both dimensions must prune, scanned: " +
          offDim.take(3).mkString(","))
      val dateOnly = Layout.readManifestBetween(s, out, "o_orderdate",
        "1996-02-01 00:00:00", "1996-04-30 23:59:59")
      // strict shrink is only guaranteed when the date-only scan even
      // HAS files outside bands 0..2 to prune (at tiny scale factors
      // every key lives in-band and equality is the correct outcome)
      val prunable = dateOnly.inputFiles.exists(f =>
        !(0 to 2).exists(b => f.contains(s"/o_band=$b/")))
      require(!prunable ||
        res.inputFiles.length < dateOnly.inputFiles.length,
        "the key conjunct must prune beyond the date window " +
          s"(${res.inputFiles.length} vs ${dateOnly.inputFiles.length})")
      res.select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
        col("o_band").cast("long").as("o_band"),
        col("o_orderdate"), col("o_totalprice"), col("ver"))
    }),

    // Planner-integrated auto-skipping (Layout.manifestTable +
    // graft.plans.ManifestFileIndex): the manifest table registered as
    // a plain SQL view — Spark's own scan planning hands the pushed
    // filters to the index, partition predicates prune exactly, stats
    // predicates prune generations via the manifest's min/max, and the
    // unrecognized o_totalprice conjunct falls through to the in-plan
    // residual. The two require pins prove BOTH pruning layers fired
    // (scan metrics, since inputFiles lists the pre-pruning index);
    // the oracle pins that pruning never changed a row.
    "m56_manifest_sql_autoskip" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("mansql")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        col("o_orderdate"), col("o_totalprice"), col("o_custkey"))
      Layout.writeManifestTable(s, out, seed, Seq("o_year"),
        statsCols = Seq("o_orderdate"))
      Layout.manifestTable(s, out).createOrReplaceTempView("m56_t")
      def scanned(q: org.apache.spark.sql.DataFrame): Long = {
        q.collect()
        q.queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.metrics("numFiles").value
        }.sum
      }
      val total = Layout.manifestTable(s, out).inputFiles.length.toLong
      // partition pruning: the year predicate narrows the scan
      val p1 = scanned(s.sql(
        "SELECT o_orderkey FROM m56_t WHERE o_year = 1996"))
      require(p1 > 0 && p1 < total,
        s"partition pruning must fire ($p1 of $total files)")
      // stats pruning WITHOUT the partition conjunct: a mid-1996 date
      // window can only intersect o_year=1996's [min, max], so the
      // manifest stats alone must prune every other year
      val p2 = scanned(s.sql("SELECT o_orderkey FROM m56_t WHERE " +
        "o_orderdate >= TIMESTAMP '1996-07-01 00:00:00' AND " +
        "o_orderdate <= TIMESTAMP '1996-09-30 23:59:59'"))
      require(p2 > 0 && p2 <= p1,
        s"stats pruning must match the partition bound ($p2 vs $p1)")
      s.sql("""SELECT o_orderkey, o_year, o_orderdate, o_totalprice,
                      o_custkey
               FROM m56_t
               WHERE o_year = 1996
                 AND o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
                 AND o_totalprice > 1000.0""")
    }),

    // Durable change-feed consumption (Layout.feedSince + the
    // ManifestFeed DSL source): consumer c1 takes the initial snapshot,
    // acks, a merge publishes v2, and the next pull ships EXACTLY the
    // net changes — old rows of rewritten keys as deletes, their new
    // versions as inserts — while a caught-up consumer gets an empty
    // frame. The gate returns snapshot ∪ increment; the oracle spells
    // the same three row sets from the source table, so a cursor bug
    // (skipped or replayed increment) breaks the hash.
    "m57_manifest_feed" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("manfeed")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, seed, Seq("o_year"))
      val (snap, a1) = Layout.feedSince(s, out, "c1")
      require(a1 == 1, s"snapshot must ack the seed version (got $a1)")
      Layout.writeFeedCursor(s, out, "c1", a1)
      val batch = seed.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100)
        .withColumn("ver", lit(2L))
      Layout.mergeManifest(s, out, batch, Seq("o_orderkey"), "ver")
      val (inc, a2) = Layout.feedSince(s, out, "c1")
      require(a2 == 2, s"increment must ack the merge version (got $a2)")
      Layout.writeFeedCursor(s, out, "c1", a2)
      val (drained, _) = Layout.feedSince(s, out, "c1")
      require(drained.isEmpty,
        "a caught-up consumer must get an empty increment")
      snap.unionByName(inc).select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"), col("o_totalprice"),
        col("ver"), col("_change_type"))
    }),

    // Incremental view maintenance (Ivm.applyDelta): the events rollup
    // maintained by folding three row-level delta batches — split by a
    // row hash, so every key's rows scatter ACROSS deltas and the fold
    // is genuinely exercised — into a persisted summary, never
    // re-aggregating the base table. Decimal partials make any split
    // bit-identical to the one-shot GROUP BY (the oracle); the replay
    // of an already-applied batch id must be a loud no-op (delta
    // addition is not idempotent — this is the exactly-once guard).
    "m41_incremental_agg" -> ((s, dir) => {
      import graft.operators.Ivm
      val out = s"${tmp("ivm")}/summary"
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_type"), col("value"),
          pmod(xxhash64(col("user_id"), col("event_type"), col("ts"),
            col("value")), lit(3)).as("__slice"))
      for (b <- 0 until 3)
        require(Ivm.applyDelta(s, out, ev.filter(col("__slice") === b),
          Seq("user_id", "event_type"), Seq("value"), batchId = b),
          s"delta batch $b must apply")
      require(!Ivm.applyDelta(s, out, ev.filter(col("__slice") === 1),
        Seq("user_id", "event_type"), Seq("value"), batchId = 1),
        "replaying an applied batch id must be a no-op")
      require(Ivm.lastAppliedBatch(s, out).contains(2L))
      Ivm.read(s, out).select(col("user_id"), col("event_type"),
        col("n_rows"), col("sum_value").cast("double").as("sum_value"))
    }),

    // STREAMING incremental aggregate (Streams.incrementalAgg): the
    // same rollup maintained from the staged events STREAM — one fold
    // per micro-batch (three here: the data file + two sentinels,
    // maxFilesPerTrigger=1), micro-batch ids riding into the Ivm
    // marker so a checkpoint replay cannot double-count. The summary
    // read after the drain must hash-match the batch GROUP BY oracle.
    "m42_streaming_incremental_agg" -> ((s, dir) => {
      import graft.streaming.Streams
      val out = s"${tmp("ivmstream")}/summary"
      val src = stagedEventsSource(s, dir)
        .select(col("user_id"), col("event_type"), col("value"))
      Streams.runAvailableNow(Streams.incrementalAgg(src, out,
        Seq("user_id", "event_type"), Seq("value"))
        .option("checkpointLocation", tmp("ivmstream_ckpt"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      graft.operators.Ivm.read(s, out)
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("event_type"),
          col("n_rows"), col("sum_value").cast("double").as("sum_value"))
    }),

    // SKETCH-VALUED incremental view maintenance: the persisted summary
    // also carries mergeable KMV (distinct users) and KLL (value
    // quantiles) sketches, folded across three row-level delta batches
    // — fold = sketch MERGE under the same exactly-once batch marker,
    // so the standing summary answers distinct-count and percentile
    // queries incrementally, never rescanning the base. The gate pins
    // the algebraic claim EXACTLY: the folded sketch must equal the
    // sketch built in one shot over the full table (KMV: the k-min set
    // of a union is order/batching-independent; KLL: lossless below
    // the compaction threshold — q50/q55's merge precedents), the KMV
    // estimate must equal the exact distinct count (distinct < k), and
    // the folded KLL's p50/p95 must equal the exact rank quantiles.
    "m47_sketch_ivm" -> ((s, dir) => {
      import graft.operators.Ivm
      import graft.expressions.{Kll, Kmv}
      val k = 4096
      val out = s"${tmp("ivmsk")}/summary"
      val ev = s.read.parquet(s"$dir/events.parquet")
        .select(col("user_id"), col("event_type"), col("value"),
          pmod(xxhash64(col("user_id"), col("event_type"), col("ts"),
            col("value")), lit(3)).as("__slice"))
      for (b <- 0 until 3)
        require(Ivm.applyDelta(s, out, ev.filter(col("__slice") === b),
          Seq("event_type"), Seq("value"), batchId = b,
          kmvCols = Seq("user_id"), kllCols = Seq("value"), sketchK = k),
          s"delta batch $b must apply")
      val folded = Ivm.read(s, out)
      val oneShot = ev.groupBy("event_type").agg(
        count(lit(1)).as("n2"),
        countDistinct(col("user_id")).as("distinct_users"),
        Kmv.sketch(xxhash64(col("user_id")), k).as("dsk"),
        Kll.sketch(col("value").cast("double"), k).as("dkll"))
      // SCALE-INVARIANT sketch pins (the q55/q58 pattern; the sf0.1
      // replay caught the byte-equality cliff): KMV stays byte-lossless
      // at ANY scale (a k-min SET union is order/batching-independent)
      // and its estimate within 3-sigma rsd; KLL pins its rank-error
      // contract — exact in the exact regime, O(1/k) beyond it
      val est = folded.join(oneShot, "event_type")
        .select(col("event_type"), col("n_rows"), col("distinct_users"),
          (col("kmv_user_id") === col("dsk")).as("kmv_lossless"),
          (abs(Kmv.estimate(col("kmv_user_id"), k) -
            col("distinct_users").cast("double")) <=
            lit(0.05) * col("distinct_users")).as("kmv_within"),
          Kll.quantile(col("kll_value"), 0.5).as("m50"),
          Kll.quantile(col("kll_value"), 0.95).as("m95"),
          Kll.quantile(col("dkll"), 0.5).as("d50"),
          Kll.quantile(col("dkll"), 0.95).as("d95"))
      val tol = 16.0 / k
      ev.join(est, "event_type").groupBy("event_type")
        .agg(first("n_rows").as("n_rows"),
          first("distinct_users").as("distinct_users"),
          first("kmv_lossless").as("kmv_lossless"),
          first("kmv_within").as("kmv_within"),
          count(lit(1)).as("nn"),
          sum(when(col("value") <= col("m50"), 1L).otherwise(0L))
            .as("r50m"),
          sum(when(col("value") <= col("m95"), 1L).otherwise(0L))
            .as("r95m"),
          sum(when(col("value") <= col("d50"), 1L).otherwise(0L))
            .as("r50d"),
          sum(when(col("value") <= col("d95"), 1L).otherwise(0L))
            .as("r95d"))
        .select(col("event_type"), col("n_rows"), col("distinct_users"),
          col("kmv_lossless"), col("kmv_within"),
          (abs(col("r50m") - lit(0.5) * col("nn")) <=
            lit(tol) * col("nn")).as("p50_rank_ok"),
          (abs(col("r95m") - lit(0.95) * col("nn")) <=
            lit(tol) * col("nn")).as("p95_rank_ok"),
          (abs(col("r50m") - col("r50d")) <= lit(tol) * col("nn") &&
            abs(col("r95m") - col("r95d")) <= lit(tol) * col("nn"))
            .as("kll_merge_rank_ok"))
    }),

    // SCHEDULED incremental consumer (the m33 pattern for the change
    // feed): a config-DSL ManifestFeed→Parquet pipeline runs TWICE
    // through the real scheduler, Derby ledger and pipeline runner —
    // the first scheduled run lands the snapshot and acks, a merge
    // publishes v2, the second run lands exactly the increment. The
    // sink equals m57's library-path result, so the two gates share
    // the oracle verbatim — that sharing IS the claim: the scheduled
    // consumer job consumes exactly what the cursor API defines.
    "m59_dsl_feed_job" -> ((s, dir) => {
      import graft.operators.Layout
      import graft.scheduler._
      val out = tmp("dslfeed")
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, s"$out/t", seed, Seq("o_year"))
      val cfg =
        s"""[{"node_name":"src","node_type":"ManifestFeed","node_seqno":1,
           |  "config":{"path":"$out/t","consumer":"m59"}},
           | {"node_name":"dst","node_type":"Parquet","node_seqno":2,
           |  "config":{"path":"$out/p","append":"true"}}]""".stripMargin
      JobScripts.register("m59-script") { (spark, cal) =>
        val p = PipelineConfig.fromJson("m59-feed", cfg, new SourceRegistry)
        require(p.run(spark, cal).status == Status.Done)
      }
      val db = DatabaseSource("m59db", "jdbc:derby:memory:graftm59;create=true")
      val ledger = new JdbcLedger(db)
      val runner = new PipelineJobRunner(s, new Repository(db),
        new SourceRegistry, ledger)
      val sched = new Scheduler(runner, ledger = Some(ledger))
      try {
        val job = JobSpec(59L, "m59-script")
        sched.register(job)
        def runOnce(day: Int): Unit = {
          val tag = java.time.LocalDateTime.of(1995, 6, day, 0, 0)
            .toEpochSecond(java.time.ZoneOffset.UTC)
          require(sched.charge(job, tag).isDefined)
          require(sched.drain(), s"m59 run (day $day) did not finish")
          require(sched.history.peek()._2 == Status.Done,
            s"m59 run (day $day) finished ${sched.history.peek()._2}")
        }
        runOnce(15) // snapshot + ack v1
        require(Layout.readFeedCursor(s, s"$out/t", "m59").contains(1),
          "the scheduled run must have acked the snapshot")
        Layout.mergeManifest(s, s"$out/t",
          seed.filter(pmod(col("o_orderkey"), lit(10)) === 0)
            .withColumn("o_totalprice", col("o_totalprice") + 100)
            .withColumn("ver", lit(2L)),
          Seq("o_orderkey"), "ver")
        runOnce(16) // the increment
        require(Layout.readFeedCursor(s, s"$out/t", "m59").contains(2))
      } finally sched.stop()
      s.read.parquet(s"$out/p").select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"), col("o_totalprice"),
        col("ver"), col("_change_type"))
    }),

    // DYNAMIC partition pruning through the manifest planner index:
    // the selective predicate lives on the DIMENSION of a star join —
    // the 100 TB shape where no static filter touches the fact table
    // at all — and Spark's own PartitionPruning rule turns the dim's
    // filter result into a runtime filter on the fact's partition
    // column, evaluated against ManifestFileIndex's partition values
    // before any fact file is read. The gate pins (a) the optimizer
    // inserted the dynamicpruning filter, (b) the fact scan's file
    // metric shows fewer files than the table holds, (c) pruning never
    // changed a row (the oracle's year arithmetic).
    "m60_manifest_dpp" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("mandpp")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        col("o_totalprice"), col("o_custkey"))
      Layout.writeManifestTable(s, out, seed, Seq("o_year"))
      val fact = Layout.manifestTable(s, out)
      // dim: one row per year, tagged; the filter selects a strict
      // subset of years and lives ONLY on the dim side
      val dim = seed.select(col("o_year").as("d_year")).distinct()
        .withColumn("d_tag", pmod(col("d_year"), lit(3)))
      val joined = fact.join(dim.filter(col("d_tag") === 0),
        col("o_year") === col("d_year"))
        .select(col("o_orderkey"), col("o_year"), col("o_totalprice"),
          col("o_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan
      require(plan.toString.toLowerCase.contains("dynamicpruning"),
        "the fact scan must carry a runtime dim-driven pruning filter:\n" +
          plan.toString.take(2000))
      val factFiles = PlanScan.scannedFiles(joined, manifestOnly = true)
      val total = Layout.manifestTable(s, out).inputFiles.length.toLong
      require(factFiles > 0 && factFiles < total,
        s"dynamic pruning must skip fact files ($factFiles of $total)")
      joined
    }),

    // Declarative table-to-table replication: readStream
    // .format("manifest-feed") from the source table straight into
    // writeStream.format("manifest") on the replica — no user code
    // between the format strings. Drained twice around a late append
    // (the restart path); the replica must hash-match the source
    // arithmetic, so a duplicate publish (sinkBatch regression) or a
    // re-emitted feed row breaks the gate.
    "m65_manifest_replication" -> ((s, dir) => {
      import graft.operators.Layout
      val base = tmp("repl")
      val src = s"$base/src"
      val dst = s"$base/dst"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
        (pmod(col("o_orderkey"), lit(3)) + 1).as("ver"))
      def slice(r: Int) =
        rows.filter(pmod(col("o_orderkey"), lit(3)) === r)
      Layout.writeManifestTable(s, src, slice(0), Seq("o_year"))   // v1
      Layout.writeManifestTable(s, dst, slice(0), Seq("o_year"))
      Layout.mergeManifestDelta(s, src, slice(1),
        Seq("o_orderkey"), "ver")                                  // v2
      def drain(): Unit = {
        val q = s.readStream.format("manifest-feed")
          // anchor at the seed version: the replica already holds the
          // seed, the feed ships everything after it
          .option("path", src).option("startingVersion", "1").load()
          .writeStream.format("manifest")
          .option("path", dst)
          .option("keys", "o_orderkey").option("versionCol", "ver")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      drain()
      Layout.mergeManifestDelta(s, src, slice(2),
        Seq("o_orderkey"), "ver")                                  // v3
      drain() // restart: only v3 replicates
      Layout.readManifest(s, dst).select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"), col("o_totalprice"),
        col("ver"))
    }),

    // Full-CDC streaming replication (manifest-feed mode=changes →
    // manifest sink with changeTypeCol): the source table takes
    // UPDATES and DELETES via copy-on-write merges — the shapes the
    // append feed refuses by contract — and the replica follows them
    // as net _change_type rows, with nothing but format strings
    // between the tables. Drained twice around the second merge (the
    // restart path); the replica must hash-match the post-CDC
    // arithmetic with deleted keys gone.
    "m66_manifest_cdc_replication" -> ((s, dir) => {
      import graft.operators.Layout
      val base = tmp("cdcrepl")
      val src = s"$base/src"
      val dst = s"$base/dst"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, src, seed, Seq("o_year"))
      Layout.writeManifestTable(s, dst, seed, Seq("o_year"))
      def drain(): Unit = {
        val q = s.readStream.format("manifest-feed")
          .option("path", src).option("mode", "changes")
          .option("startingVersion", "1").load()
          .writeStream.format("manifest")
          .option("path", dst)
          .option("keys", "o_orderkey").option("versionCol", "ver")
          .option("changeTypeCol", "_change_type")
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // v2: update keys %10 (+100) AND delete keys %13 — one batch
      Layout.mergeManifest(s, src,
        seed.filter(pmod(col("o_orderkey"), lit(10)) === 0 ||
            pmod(col("o_orderkey"), lit(13)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("ver", lit(2L))
          .withColumn("del", pmod(col("o_orderkey"), lit(13)) === 0),
        Seq("o_orderkey"), "ver", deleteCol = Some("del"))
      drain()
      // v3: update the surviving %17 keys (+7), applied on the CURRENT
      // table so deleted keys stay deleted
      Layout.mergeManifest(s, src,
        Layout.readManifest(s, src)
          .filter(pmod(col("o_orderkey"), lit(17)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 7)
          .withColumn("ver", lit(3L)),
        Seq("o_orderkey"), "ver")
      drain() // restart from the checkpoint
      Layout.readManifest(s, dst).select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"), col("o_totalprice"),
        col("ver"))
    }),

    // CHUNKED initial snapshot for CDC replication (m66 anchored at
    // `earliest` into an EMPTY replica): with snapshotChunkPartitions
    // the backfill pages the source snapshot as bounded per-partition
    // chunks — each its own checkpointed batch and replica publish —
    // instead of ONE batch a mid-flight failure would redo wholesale.
    // The gate KILLS the stream after the first chunk (Trigger.Once)
    // and restarts: the replica must hold a strict subset at the kill
    // (in-gate pin), resume at the unfinished chunk, then follow a
    // post-snapshot merge as a net diff — final table hash-exact
    // (m66's oracle arithmetic).
    "m68_manifest_chunked_backfill" -> ((s, dir) => {
      import graft.operators.Layout
      val base = tmp("chunkrepl")
      val src = s"$base/src"
      val dst = s"$base/dst"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, src, seed, Seq("o_year"))
      // the replica starts EMPTY — the chunked backfill populates it
      Layout.writeManifestTable(s, dst, seed.limit(0), Seq("o_year"))
      // v2 BEFORE the stream exists: update %10 (+100), delete %13 —
      // the snapshot the backfill pages is already post-CDC
      Layout.mergeManifest(s, src,
        seed.filter(pmod(col("o_orderkey"), lit(10)) === 0 ||
            pmod(col("o_orderkey"), lit(13)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("ver", lit(2L))
          .withColumn("del", pmod(col("o_orderkey"), lit(13)) === 0),
        Seq("o_orderkey"), "ver", deleteCol = Some("del"))
      def writer = s.readStream.format("manifest-feed")
        .option("path", src).option("mode", "changes")
        .option("startingVersion", "earliest")
        .option("snapshotChunkPartitions", "2").load()
        .writeStream.format("manifest")
        .option("path", dst)
        .option("keys", "o_orderkey").option("versionCol", "ver")
        .option("changeTypeCol", "_change_type")
        .option("checkpointLocation", s"$base/ckpt")
      // ONE micro-batch, then stop: the kill mid-snapshot
      val q1 = writer
        .trigger(org.apache.spark.sql.streaming.Trigger.Once()).start()
      q1.awaitTermination()
      val partial = Layout.readManifest(s, dst).count()
      val full = Layout.readManifest(s, src).count()
      require(partial > 0 && partial < full,
        s"the first batch must be ONE bounded chunk ($partial of $full)")
      // restart: the remaining chunks drain, each its own publish
      val q2 = writer
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q2.awaitTermination()
      require(Layout.manifestVersion(s, dst).exists(_ > 2),
        "the snapshot must land as SEVERAL replica publishes")
      require(Layout.readManifest(s, dst).count() == full,
        "the reassembled backfill must be the exact snapshot")
      // post-snapshot CDC flows as a net diff on the same checkpoint
      Layout.mergeManifest(s, src,
        Layout.readManifest(s, src)
          .filter(pmod(col("o_orderkey"), lit(17)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 7)
          .withColumn("ver", lit(3L)),
        Seq("o_orderkey"), "ver")
      val q3 = writer
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q3.awaitTermination()
      Layout.readManifest(s, dst).select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"), col("o_totalprice"),
        col("ver"))
    }),

    // OPTIMISTIC CONCURRENT COMMITS as a correctness gate: a full-table
    // compaction and a stream of CDC delta merges run from TWO THREADS
    // against one manifest table — under the old single-lease
    // discipline one of them would fail; under optimistic commits the
    // compaction's commit REBASES onto the deltas' publishes (its
    // rewrites never moved — deltas don't touch base entries) and the
    // deltas rebase onto everything (they depend only on table
    // invariants). Both must succeed (pinned in-gate), every publish
    // lands exactly once (version-count pin), and the final snapshot
    // equals the sequential application — the oracle's arithmetic.
    // METADATA-ONLY column drop: one pointer swap retires the column
    // from the stored schema — no byte rewritten, pre-drop generations
    // (base AND pending delta) simply never decode it again. Post-drop
    // merges refuse a batch still carrying the dead name, v1
    // time-travels WITH the column, re-adding the haunted name refuses
    // until a rewrite clears it (all pinned in-gate); the post-drop
    // merge arithmetic over pre-drop generations is the oracle.
    // SQL DDL schema evolution by bare table name — ALTER TABLE
    // ADD COLUMNS / RENAME COLUMN / ALTER COLUMN TYPE / DROP COLUMN
    // over a catalog-registered manifest table (parser-seam rewrites;
    // Spark's own analyzer refuses all four on v1 tables). Every verb
    // is metadata-only on the table AND moves the catalog entry, so
    // the next bare-name scan serves the new shape with no re-CREATE.
    // In-gate pins: the added column fills via UPDATE before being
    // dropped, DESCRIBE tracks each step, v1 time-travels under the
    // original schema, and the haunted re-add refuses. The oracle
    // recomputes the post-lifecycle table.
    "m80_manifest_sql_ddl" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("sqlddl")}/ord"
      // PURE-SQL lifecycle from the first byte: the table is BORN via
      // CTAS with a native PARTITIONED BY clause (the parser seam maps
      // it onto the provider's partitionCols option — Spark's v1
      // CreatableRelationProvider API drops the clause otherwise) and
      // a declared merge spec, all in one statement
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"),
          pmod(col("o_orderkey"), lit(100)).cast("int").as("qty"),
          col("o_totalprice"), lit(1L).as("ver"))
        .createOrReplaceTempView("m80_src")
      s.sql("DROP TABLE IF EXISTS m80_t")
      s.sql(s"CREATE TABLE m80_t USING manifest PARTITIONED BY (o_year) " +
        s"OPTIONS (path '$out', keys 'o_orderkey', versionCol 'ver') " +
        "AS SELECT * FROM m80_src")                               // v1
      require(Layout.readManifestMeta(s, out,
          Layout.manifestVersion(s, out).get).partitionCols ==
          Seq("o_year"),
        "the PARTITIONED BY clause must fix the manifest's layout")
      s.sql("ALTER TABLE m80_t ADD COLUMNS (note STRING)")        // v2
      def descCols() = s.sql("DESCRIBE TABLE m80_t").collect()
        .map(_.getString(0)).toSeq
      require(descCols().contains("note"),
        "DESCRIBE must show the added column immediately")
      // fill the new column through plain bare-name DML
      s.sql("UPDATE m80_t SET note = 'flagged', ver = CAST(2 AS BIGINT) " +
        "WHERE o_orderkey % 10 = 0")                              // v3
      val filled = s.sql(
        "SELECT count(*) FROM m80_t WHERE note = 'flagged'")
        .head().getLong(0)
      require(filled > 0L, "the added column must fill through UPDATE")
      s.sql("ALTER TABLE m80_t RENAME COLUMN qty TO quantity")    // v4
      s.sql("ALTER TABLE m80_t ALTER COLUMN quantity TYPE BIGINT") // v5
      s.sql("ALTER TABLE m80_t DROP COLUMN note")                 // v6
      val cols = descCols()
      require(cols.contains("quantity") && !cols.contains("qty") &&
          !cols.contains("note"),
        s"DESCRIBE must track the full lifecycle (${cols.take(8)})")
      // the haunted re-add refuses: 'note' may still live in files
      val haunted =
        try { s.sql("ALTER TABLE m80_t ADD COLUMNS (note STRING)"); false }
        catch { case e: Exception => val m = e.getMessage
          m != null && m.contains("retired") }
      require(haunted, "re-adding a dropped column must refuse")
      // v1 time-travels under the ORIGINAL schema, by bare name
      val v1cols = s.sql("SELECT * FROM m80_t VERSION AS OF 1").columns
      require(v1cols.contains("qty") && !v1cols.contains("note"),
        s"v1 must keep its own schema (${v1cols.mkString(",")})")
      // a FRESH session reads the final shape live
      s.newSession()
        .sql("SELECT o_orderkey, o_year, quantity, o_totalprice, ver " +
          "FROM m80_t")
        .select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
          col("quantity"), col("o_totalprice"), col("ver"))
    }),

    // BUCKETED MANIFEST TABLES (the co-located-join layout): both
    // sides of a fact-to-fact join are hash-bucketed at seed on the
    // join key under Spark's OWN bucket contract —
    // pmod(murmur3(cols), n) placement + `…_0000N` file naming — so
    // the planner-integrated reads surface a real BucketSpec and the
    // join PLUS its key-grouped aggregation execute with ZERO shuffle
    // exchange (asserted through the AQE wrappers, broadcast disabled
    // so the pin is not vacuous). At 100 TB this removes the dominant
    // exchange of every fact-to-fact join — too big to broadcast on
    // either side — amortized into one bucketized write. A
    // copy-on-write merge lands BETWEEN seed and read, so the pin also
    // proves DML preserves the contract; the oracle recomputes the
    // merge arithmetic + join from the raw parquet.
    "m84_manifest_bucketed_join" -> ((s, dir) => {
      import graft.operators.Layout
      val base = tmp("buckjoin")
      val ordPath = s"$base/ord"; val custPath = s"$base/cust"
      val orders = s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, ordPath, orders, Seq("o_orderstatus"),
        keys = Seq("o_orderkey"), versionCol = Some("ver"),
        bucketCols = Seq("o_custkey"), buckets = 8)
      val cust = s.read.parquet(s"$dir/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          lit(1L).as("ver"))
      Layout.writeManifestTable(s, custPath, cust, Seq("c_mktsegment"),
        keys = Seq("c_custkey"), versionCol = Some("ver"),
        bucketCols = Seq("c_custkey"), buckets = 8)
      // a keyed CoW merge rewrites its partitions through the same
      // bucketized writer — the read below proves the layout survived
      Layout.mergeManifest(s, ordPath,
        orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + lit(10.0))
          .withColumn("ver", lit(2L)),
        Seq("o_orderkey"), "ver")
      val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = Layout.manifestTable(s, custPath)
          .join(Layout.manifestTable(s, ordPath),
            col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_custkey").as("custkey"))
          .agg(count(lit(1)).as("n_orders"),
            // order-independent sum: decimal inside, double out
            sum(col("o_totalprice").cast("decimal(38,6)")).cast("double")
              .as("revenue"),
            max(col("c_acctbal")).as("acctbal"))
        j.collect()
        val ex = PlanScan.shuffles(j.queryExecution.executedPlan)
        require(ex.isEmpty,
          s"co-bucketed manifest join + key-grouped agg must be " +
            s"exchange-free, found ${ex.size}:\n" +
            j.queryExecution.executedPlan.toString.take(2000))
        j
      } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }),

    // SQL-DRIVEN MAINTENANCE (the OPTIMIZE / VACUUM posture): a
    // SQL-only operator observes a table through the m79 TVFs and now
    // ACTS through maintain_table/reap_table — one spark.sql call runs
    // the scheduled-surface Maintain policy (fold deep deltas, compact
    // multi-file partitions, reap retention) through a REAL one-node
    // pipeline against a REAL Derby ledger, so the decision trail in
    // pd_task/pd_step_history is identical to a scheduled run's.
    // In-gate pins: the strand-guard refusal reaches SQL verbatim
    // (a lagging feed cursor blocks the reap until ignored), folds
    // clear the delta debt, compaction shrinks the file count,
    // retention drops versions, and the ledger rows exist with the
    // decisions string. The oracle recomputes the post-maintenance
    // table — maintenance must be row-identical.
    "m82_manifest_sql_maintenance" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("sqlmaint")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
        lit(1L).as("ver"))
      def slice(r: Int) =
        rows.filter(pmod(col("o_orderkey"), lit(4)) === r)
      // multi-file base generations at EVERY SF: split the seed write
      // into ~24 files regardless of scale, so the compact strand has
      // real work (scale-invariant, the m48/m64 lesson)
      val seedRows = slice(0)
      val per = math.max(1L, seedRows.count() / 24)
      val prevSplit = s.conf.getOption("spark.sql.files.maxRecordsPerFile")
      s.conf.set("spark.sql.files.maxRecordsPerFile", per.toString)
      try Layout.writeManifestTable(s, out, seedRows, Seq("o_year"))  // v1
      finally prevSplit match {
        case Some(v) => s.conf.set("spark.sql.files.maxRecordsPerFile", v)
        case None => s.conf.unset("spark.sql.files.maxRecordsPerFile")
      }
      for (r <- 1 to 3)
        Layout.mergeManifestDelta(s, out, slice(r),
          Seq("o_orderkey"), "ver")                           // v2..v4
      val filesBefore = Layout.readManifest(s, out).inputFiles.length
      // a lagging feed consumer: retention consent must reach SQL
      Layout.writeFeedCursor(s, out, "m82lag", 1)
      val refused =
        try { s.sql(s"SELECT * FROM reap_table('$out', " +
          "'keep_versions=1')").collect(); false }
        catch { case e: Exception =>
          e.getMessage != null && e.getMessage.contains("m82lag") }
      require(refused, "the strand-guard refusal must reach SQL")
      // one SQL call: fold (depth>=3), compact (maxFiles=1), reap
      // (keep 2, ignoring the lagging consumer) — against a ledger
      val url = "jdbc:derby:memory:graftm82;create=true"
      val decisions = s.sql(s"SELECT decisions FROM maintain_table(" +
        s"'$out', 'max_pending_deltas=3;max_files_per_partition=1;" +
        s"keep_versions=2;ignore_consumers=m82lag', '$url')")
        .head().getString(0)
      require(decisions.startsWith("fold=") &&
          !decisions.startsWith("fold=;"),
        s"the fold strand must have fired: $decisions")
      val m = Layout.readManifestMeta(s, out,
        Layout.manifestVersion(s, out).get)
      require(m.deltas.isEmpty, "maintenance must clear the delta debt")
      val filesAfter = Layout.readManifest(s, out).inputFiles.length
      require(filesAfter < filesBefore,
        s"fold+compact must shrink files ($filesBefore -> $filesAfter)")
      require(Layout.manifestVersions(s, out).size == 2,
        s"retention must keep 2 (${Layout.manifestVersions(s, out)})")
      // the decision trail is in the LEDGER, same as a scheduled run
      val c = DatabaseSource("m82", url).connect()
      try {
        val rs = c.createStatement().executeQuery(
          "select count(*) from pd_task_history t join pd_step_history " +
            "s on s.task_id = t.id where t.result_long like 'fold=%'")
        rs.next()
        require(rs.getInt(1) >= 1, "ledger must hold the decision trail")
      } finally c.close()
      Layout.readManifest(s, out).select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"), col("o_totalprice"),
        col("ver"))
    }),

    // METADATA-ONLY PARTITION-SPEC EVOLUTION (the Iceberg posture):
    // changeManifestPartitionSpec moves the table from [o_year] to
    // [o_band] in ONE JSON publish — pinned in-gate to have moved ZERO
    // data files. Generations serve under their own era's spec:
    // manifestTable unions one pruned relation per era (scanned-file
    // pins on BOTH an old-spec and a new-spec predicate), old
    // snapshots time-travel under the old layout, the append feed
    // sees the change as metadata-only, copy-on-write merges MIGRATE
    // touched old-era partitions into EXISTING new-era ones without
    // losing their rows (the oracle hashes exactly that), and
    // merge-on-read deltas refuse unmigrated overlaps loudly.
    // repartitionManifest remains the optional migration finisher
    // (m64 pins it, unchanged).
    // FULL SQL DML ON A MIXED-SPEC TABLE + BUDGETED DRAIN: after a
    // metadata-only respec_table, UPDATE / DELETE / MERGE INTO run
    // purely via spark.sql by bare catalog name — each statement is
    // ONE copy-on-write publish whose merge MIGRATES the old-era
    // partitions it touches (era debt shrinks per statement, untouched
    // old-era partitions stay byte-frozen), merge-on-read deltas
    // overlapping unmigrated keys keep their loud refusal, and a
    // budgeted `maintain_table(..., migrate_partitions=N)` loop drains
    // the remainder to a single spec (specHistory clears; the
    // manifest_detail debt columns hit zero). The oracle hashes the
    // final table — any row lost/duplicated/mis-versioned by a DML
    // migration or a drain run breaks it.
    "m83_manifest_sql_dml_mixed" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("sqlmix")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        pmod(col("o_orderkey"), lit(8)).as("o_band"),
        col("o_totalprice"), lit(1L).as("ver"))
      // declared merge spec at seed: SQL DML by bare name needs no
      // per-view OPTIONS
      Layout.writeManifestTable(s, out, rows, Seq("o_year"),
        keys = Seq("o_orderkey"), versionCol = Some("ver"))      // v1
      s.sql("DROP TABLE IF EXISTS m83_t")
      s.sql(s"CREATE TABLE m83_t USING manifest OPTIONS (path '$out')")
      s.sql(s"SELECT * FROM respec_table('$out', 'o_band')")     // v2
      val yr0 = rows.agg(min(col("o_year"))).head().getInt(0)
      def meta() = Layout.readManifestMeta(s, out,
        Layout.manifestVersion(s, out).get)
      val m2 = meta()
      require(m2.version == 2 && m2.oldEraRels.nonEmpty,
        s"respec must leave every partition old-era (${m2.version})")
      // a frozen witness: an old-era partition NO statement touches
      val frozenRel = s"o_year=${yr0 + 3}"
      val frozenGen = m2.entries(frozenRel)
      // --- UPDATE: touches exactly the o_year=yr0 old-era partition
      s.sql(s"UPDATE m83_t SET o_totalprice = o_totalprice + 100, " +
        s"ver = 3 WHERE o_year = $yr0")                          // v3
      val m3 = meta()
      require(m3.version == 3, "UPDATE must be ONE publish")
      require(!m3.entries.contains(s"o_year=$yr0"),
        "UPDATE must migrate the touched old-era partition")
      require(m3.oldEraRels.size < m2.oldEraRels.size,
        "era debt must shrink")
      // --- DELETE: tombstones + migration of o_year=yr0+1
      s.sql(s"DELETE FROM m83_t WHERE o_year = ${yr0 + 1} " +
        "AND o_orderkey % 5 = 0")                                // v4
      val m4 = meta()
      require(m4.version == 4 && !m4.entries.contains(s"o_year=${yr0 + 1}"),
        "DELETE must publish once and migrate its partition")
      // --- MERGE INTO: matched updates on o_year=yr0+2 (old era) +
      // synthetic inserts (brand-new keys)
      rows.filter(col("o_year") === yr0 + 2 &&
          pmod(col("o_orderkey"), lit(3)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .withColumn("ver", lit(4L))
        .unionByName(orders.filter(pmod(col("o_orderkey"), lit(97)) === 0)
          .select((col("o_orderkey") + 20000000L).as("o_orderkey"),
            lit(2100).as("o_year"),
            pmod(col("o_orderkey") + 20000000L, lit(8)).as("o_band"),
            (col("o_totalprice") * 3).as("o_totalprice"),
            lit(4L).as("ver")))
        .createOrReplaceTempView("m83_src")
      s.sql("""MERGE INTO m83_t t USING m83_src s
               ON t.o_orderkey = s.o_orderkey
               WHEN MATCHED THEN
                 UPDATE SET o_totalprice = s.o_totalprice, ver = s.ver
               WHEN NOT MATCHED THEN INSERT *""")               // v5
      val m5 = meta()
      require(m5.version == 5 && !m5.entries.contains(s"o_year=${yr0 + 2}"),
        "MERGE must publish once and migrate its partition")
      // untouched old-era partitions are byte-frozen throughout
      require(m5.entries(frozenRel) == frozenGen,
        s"$frozenRel must stay frozen across the DML statements")
      // MoR deltas still refuse unmigrated old-era overlaps
      val refused =
        try {
          Layout.mergeManifestDelta(s, out,
            rows.filter(col("o_year") === yr0 + 3)
              .withColumn("ver", lit(9L)), Seq("o_orderkey"), "ver")
          false
        } catch { case e: IllegalArgumentException =>
          e.getMessage.contains("prior-spec") }
      require(refused, "MoR deltas must keep the loud refusal")
      // --- budgeted drain to a single spec: 2 partitions per run
      var guard = 0
      while (meta().oldEraRels.nonEmpty && guard < 16) {
        s.sql(s"SELECT decisions FROM maintain_table('$out', " +
          "'migrate_partitions=2')").collect()
        guard += 1
      }
      val mEnd = meta()
      require(mEnd.oldEraRels.isEmpty && mEnd.specHistory.isEmpty,
        s"the drain must converge to a single spec " +
          s"(${mEnd.oldEraRels.size} left after $guard runs)")
      // the debt dashboard reads zero
      val det = s.sql(s"SELECT old_era_partitions, old_era_bytes, " +
        s"prior_specs FROM manifest_detail('$out')").head()
      require(det.getInt(0) == 0 && det.getLong(1) == 0L &&
          det.getSeq[String](2).isEmpty,
        s"manifest_detail must report zero spec debt ($det)")
      s.sql("SELECT o_orderkey, o_year, o_band, o_totalprice, ver " +
          "FROM m83_t")
        .select(col("o_orderkey"),
          col("o_year").cast("int").as("o_year"), col("o_band"),
          col("o_totalprice"), col("ver"))
    }),

    "m81_manifest_spec_evolution" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("specevo")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        pmod(col("o_orderkey"), lit(8)).as("o_band"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out,
        rows.filter(pmod(col("o_orderkey"), lit(7)) =!= 0),
        Seq("o_year"))                                            // v1
      Layout.mergeManifest(s, out,
        rows.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("ver", lit(2L)),
        Seq("o_orderkey"), "ver")                                 // v2
      val filesBefore = Layout.readManifest(s, out).inputFiles.toSet
      Layout.changeManifestPartitionSpec(s, out, Seq("o_band"))   // v3
      require(Layout.readManifest(s, out).inputFiles.toSet == filesBefore,
        "a partition-spec change must move ZERO data files")
      val m3 = Layout.readManifestMeta(s, out, 3)
      require(m3.op == "spec" && m3.partitionCols == Seq("o_band") &&
          m3.specHistory == Seq(Seq("o_year")),
        s"spec publish provenance (${m3.op}, ${m3.partitionCols})")
      // the spec version is metadata-only to the append feed
      require(Layout.appendsBetween(s, out, 2, 3).isEmpty,
        "the spec change must emit nothing on the append feed")
      // NEW-ERA rows (years outside the data range -> no migration):
      // land under o_band= directories
      val synthetic = orders
        .filter(pmod(col("o_orderkey"), lit(97)) === 0)
        .select((col("o_orderkey") + 10000000L).as("o_orderkey"),
          lit(2100).as("o_year"),
          pmod(col("o_orderkey") + 10000000L, lit(8)).as("o_band"),
          (col("o_totalprice") * 2).as("o_totalprice"),
          lit(2L).as("ver"))
      Layout.mergeManifest(s, out, synthetic,
        Seq("o_orderkey"), "ver")                                 // v4
      // MIGRATION ON TOUCH: updating every min-year row folds that
      // old-era o_year partition into the EXISTING new-era o_band
      // dirs — the synthetic rows already there must survive (the
      // oracle hashes the full table, so any loss breaks it). The
      // year derives from the data so the gate is SF-invariant.
      val minYear = rows.agg(min(col("o_year"))).head().getInt(0)
      Layout.mergeManifest(s, out,
        rows.filter(col("o_year") === minYear)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("ver", lit(3L)),
        Seq("o_orderkey"), "ver")                                 // v5
      val mLive = Layout.readManifestMeta(s, out,
        Layout.manifestVersion(s, out).get)
      require(!mLive.entries.contains(s"o_year=$minYear") &&
          mLive.oldEraRels.nonEmpty,
        s"o_year=$minYear must migrate, other years stay " +
          s"(${mLive.entries.keys})")
      // per-era pruning through the union of per-era relations
      val t = Layout.manifestTable(s, out)
      t.collect()
      val total = PlanScan.scannedFiles(t)
      val oldPruned = PlanScan.scannedFiles {
        val f = Layout.manifestTable(s, out)
          .filter(col("o_year") === minYear + 1); f.collect(); f }
      val newPruned = PlanScan.scannedFiles {
        val f = Layout.manifestTable(s, out)
          .filter(col("o_band") === 3L); f.collect(); f }
      require(oldPruned < total && newPruned < total,
        s"per-era pruning must fire (old $oldPruned, new $newPruned " +
          s"of $total)")
      // old snapshots keep the old layout
      require(Layout.readManifestVersion(s, out, 1)
        .inputFiles.forall(_.contains("/o_year=")),
        "v1 must time-travel under the old spec")
      // merge-on-read deltas refuse unmigrated old-era overlaps
      val refused =
        try {
          Layout.mergeManifestDelta(s, out,
            rows.filter(col("o_year") === minYear + 1 &&
              pmod(col("o_orderkey"), lit(13)) === 0)
              .withColumn("ver", lit(4L)),
            Seq("o_orderkey"), "ver")
          false
        } catch { case e: IllegalArgumentException =>
          e.getMessage.contains("prior-spec") }
      require(refused, "MoR deltas must refuse unmigrated overlaps")
      // the SQL surface serves the same per-era union by BARE NAME
      // (the parser-seam rewrite) — the oracle hashes THIS read, so
      // the whole mixed-spec SQL path is the gated artifact
      s.sql("DROP TABLE IF EXISTS m81_t")
      s.sql(s"CREATE TABLE m81_t USING manifest OPTIONS (path '$out')")
      require(s.sql(
        s"SELECT count(*) FROM m81_t WHERE o_year = ${minYear + 1}")
        .head().getLong(0) > 0, "bare-name SQL must serve the old era")
      s.sql("SELECT o_orderkey, o_year, o_band, o_totalprice, ver " +
          "FROM m81_t")
        .select(col("o_orderkey"),
          col("o_year").cast("int").as("o_year"), col("o_band"),
          col("o_totalprice"), col("ver"))
    }),

    // SQL-admin table functions: `manifest_history`, `manifest_appends`
    // and `manifest_changes` as FROM-clause relations (injected via
    // SparkSessionExtensions.injectTableFunction) — the DESCRIBE
    // HISTORY / table_changes posture, so a SQL-only operator inspects
    // and incrementally consumes a table with zero Scala. In-gate
    // pins: history rows carry the exact version/op/stamp sequence,
    // and the change diff agrees with the append feed on a pure-append
    // window; the oracle hashes the append feed itself.
    "m79_manifest_sql_tvf" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("tvf")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
        lit(1L).as("ver"))
      def slice(r: Int) =
        rows.filter(pmod(col("o_orderkey"), lit(3)) === r)
      Layout.writeManifestTable(s, out, slice(0), Seq("o_year"),
        statsCols = Seq("o_orderkey"))                            // v1
      Layout.mergeManifestDelta(s, out, slice(1),
        Seq("o_orderkey"), "ver")                                 // v2
      Layout.mergeManifestDelta(s, out, slice(2),
        Seq("o_orderkey"), "ver")                                 // v3
      val hist = s.sql(s"SELECT * FROM manifest_history('$out')")
        .collect()
      require(hist.map(_.getInt(0)).toSeq == Seq(1, 2, 3),
        s"history must list every retained version " +
          s"(${hist.map(_.getInt(0)).mkString(",")})")
      require(hist.map(_.getString(2)).toSeq ==
          Seq("seed", "delta", "delta"),
        s"history must carry publish provenance " +
          s"(${hist.map(_.getString(2)).mkString(",")})")
      val stamps = hist.map(_.getTimestamp(1).getTime).toSeq
      require(stamps.forall(_ > 0L) && stamps == stamps.sorted,
        s"history stamps must be present and monotone ($stamps)")
      // per-partition admin view: bytes recorded at publish (no
      // filesystem calls), pending-delta counts reflecting the two
      // un-folded appends
      val parts = s.sql(s"SELECT * FROM manifest_partitions('$out')")
        .collect()
      require(parts.nonEmpty && parts.forall(r => !r.isNullAt(3) &&
          r.getLong(3) > 0L),
        "every live partition must carry its publish-recorded bytes")
      require(parts.exists(_.getInt(2) > 0),
        "pending delta counts must reflect the un-folded appends")
      // one-row DESCRIBE DETAIL summary: live version, merge state,
      // total bytes — all from one root parse
      val det = s.sql(s"SELECT * FROM manifest_detail('$out')").head()
      require(det.getInt(1) == 3 && det.getInt(6) >= 2 &&
          !det.isNullAt(7) && det.getLong(7) > 0L,
        s"detail must carry version/pending/bytes ($det)")
      // file-level skipping stats are enumerable for debugging
      require(s.sql(s"SELECT count(*) FROM manifest_files('$out')")
          .head().getLong(0) > 0L,
        "per-file stats must be enumerable")
      // the change diff agrees with the append feed on a pure-append
      // window (every change is an insert)
      val nCh = s.sql(
        s"SELECT count(*) FROM manifest_changes('$out', 1, 3)")
        .head().getLong(0)
      val nAp = s.sql(
        s"SELECT count(*) FROM manifest_appends('$out', 1, 3)")
        .head().getLong(0)
      require(nCh == nAp,
        s"diff vs append feed disagree on a pure-append window " +
          s"($nCh vs $nAp)")
      s.sql("SELECT o_orderkey, o_year, o_totalprice, ver " +
          s"FROM manifest_appends('$out', 1, 3)")
        .select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
          col("o_totalprice"), col("ver"))
    }),

    // TIMESTAMP AS OF — snapshot-by-time travel: every publish stamps
    // its wall clock into the version root, and both the SQL clause
    // (parser seam, bare table name) and the DataFrame option
    // (`timestampAsOf`) binary-search the retained window for the
    // newest version published at or before the instant. In-gate pins:
    // an instant between two publishes serves the EARLIER one, a
    // too-early instant refuses naming the earliest retained stamp,
    // and "as of the last publish" serves the live table (the oracle).
    "m78_manifest_timestamp_travel" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("tstravel")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
        lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, rows, Seq("o_year"),
        keys = Seq("o_orderkey"), versionCol = Some("ver"))      // v1
      val ts1 = Layout.readManifestMeta(s, out, 1).publishedAtMs
      require(ts1 > 0L, "the seed must record its publish stamp")
      Thread.sleep(20) // strictly separate the two stamps
      Layout.mergeManifest(s, out,
        rows.filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("ver", lit(2L)),
        Seq("o_orderkey"), "ver")                                // v2
      val ts2 = Layout.readManifestMeta(s, out, 2).publishedAtMs
      require(ts2 > ts1, "publish stamps must be strictly increasing")
      s.sql("DROP TABLE IF EXISTS m78_t")
      s.sql(s"CREATE TABLE m78_t USING manifest OPTIONS (path '$out')")
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneId.of("UTC"))
      // an instant between the publishes serves the seed (SQL clause)
      val between = fmt.format(java.time.Instant.ofEpochMilli(ts2 - 1))
      val seedMax = s.sql(
        s"SELECT max(ver) AS mv FROM m78_t TIMESTAMP AS OF '$between'")
        .head().getLong(0)
      require(seedMax == 1L,
        s"TIMESTAMP AS OF between publishes must serve the seed " +
          s"(max ver $seedMax)")
      // a too-early instant refuses loudly, naming the earliest stamp
      val early = fmt.format(java.time.Instant.ofEpochMilli(ts1 - 3600000L))
      val refused =
        try { s.sql(s"SELECT * FROM m78_t TIMESTAMP AS OF '$early'")
          .collect(); false }
        catch { case e: Exception => val m = e.getMessage
          m != null && m.contains("predates") }
      require(refused, "a too-early TIMESTAMP AS OF must refuse loudly")
      // the DataFrame option resolves the same instant identically
      val viaOption = s.read.format("manifest").option("path", out)
        .option("timestampAsOf", (ts2 - 1).toString).load()
      require(viaOption.agg(max(col("ver"))).head().getLong(0) == 1L,
        "the timestampAsOf option must resolve like SQL TIMESTAMP AS OF")
      // "as of the last publish" = the live table — the oracle's read
      s.sql("SELECT o_orderkey, o_year, o_totalprice, ver FROM m78_t " +
          s"TIMESTAMP AS OF '${fmt.format(
            java.time.Instant.ofEpochMilli(ts2))}'")
        .select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
          col("o_totalprice"), col("ver"))
    }),

    // MERGE INTO … WHEN NOT MATCHED BY SOURCE — the reconcile-to-
    // snapshot statement ("make the table equal this feed"): upserts
    // every source row, and target rows the feed no longer carries
    // take conditional NMBS clauses (DELETE the pre-1996 ones, flag
    // the rest), all as ONE full-outer-join publish (version pin
    // in-gate). The full-table read is inherent to the clause — what
    // round 13 refused is now implemented with the cost stated, not
    // hidden.
    "m77_manifest_merge_nmbs" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("nmbs")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      Layout.writeManifestTable(s, out,
        orders.filter(pmod(col("o_orderkey"), lit(13)) =!= 0)
          .select(col("o_orderkey"),
            year(col("o_orderdate")).as("o_year"),
            col("o_totalprice"), lit(1L).as("ver")),
        Seq("o_year"), keys = Seq("o_orderkey"),
        versionCol = Some("ver"))
      s.sql("DROP TABLE IF EXISTS m77_t")
      s.sql(s"CREATE TABLE m77_t USING manifest OPTIONS (path '$out')")
      orders.filter(pmod(col("o_orderkey"), lit(2)) === 0)
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"),
          col("o_totalprice"))
        .createOrReplaceTempView("m77_src")
      val vBefore = Layout.manifestVersion(s, out).get
      s.sql("""
        MERGE INTO m77_t t
        USING m77_src c
        ON t.o_orderkey = c.o_orderkey
        WHEN MATCHED THEN
          UPDATE SET o_totalprice = c.o_totalprice + 50,
                     ver = CAST(2 AS BIGINT)
        WHEN NOT MATCHED THEN
          INSERT (o_orderkey, o_year, o_totalprice, ver)
          VALUES (c.o_orderkey, c.o_year, c.o_totalprice + 50,
                  CAST(2 AS BIGINT))
        WHEN NOT MATCHED BY SOURCE AND o_year < 1996 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN
          UPDATE SET ver = CAST(99 AS BIGINT)""")
      require(Layout.manifestVersion(s, out).contains(vBefore + 1),
        "the reconcile must land as exactly ONE publish")
      s.newSession()
        .sql("SELECT o_orderkey, o_year, o_totalprice, ver FROM m77_t")
        .select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
          col("o_totalprice"), col("ver"))
    }),

    "m76_manifest_drop_column" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("dropcol")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        pmod(col("o_orderkey"), lit(100)).cast("int").as("qty"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out,
        rows.filter(pmod(col("o_orderkey"), lit(3)) =!= 0), Seq("o_year"),
        statsCols = Seq("qty"))                                   // v1
      Layout.mergeManifestDelta(s, out,
        rows.filter(pmod(col("o_orderkey"), lit(3)) === 0),
        Seq("o_orderkey"), "ver")                                 // v2
      Layout.dropManifestColumn(s, out, "qty")                    // v3
      // post-drop merges refuse the dead name loudly
      val refused =
        try { Layout.mergeManifest(s, out,
          rows.limit(1).withColumn("ver", lit(9L)),
          Seq("o_orderkey"), "ver"); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("qty") }
      require(refused, "a post-drop merge must refuse the dead column")
      // ...and the new shape merges over PRE-drop generations
      Layout.mergeManifest(s, out,
        Layout.readManifest(s, out)
          .filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("ver", lit(2L)),
        Seq("o_orderkey"), "ver")                                 // v4
      val v1 = Layout.readManifestVersion(s, out, 1)
      require(v1.columns.contains("qty"),
        "time travel must keep the dropped column")
      val live = Layout.readManifest(s, out)
      require(!live.columns.contains("qty"),
        "the live schema must have dropped it")
      val haunted =
        try { Layout.evolveManifest(s, out, "qty INT"); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("retired") }
      require(haunted, "re-adding a dropped name must refuse")
      live.select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
        col("o_totalprice"), col("ver"))
    }),

    // SQL MERGE INTO — the production CDC statement: the m17 change
    // batch (updates + deletes + inserts) expressed as ONE statement
    // against a catalog-registered manifest table, landing as exactly
    // ONE net-outcome force-wins publish (version pin in-gate) — no
    // reader-visible half-state, conditional WHEN clauses in statement
    // order, merge spec from the manifest (zero OPTIONS). The oracle
    // recomputes the applied batch (m17's arithmetic + the year
    // partition column).
    "m75_manifest_sql_merge" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("sqlmerge")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      Layout.writeManifestTable(s, out,
        orders.select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          col("o_totalprice"), lit(1L).as("ver")),
        Seq("o_year"), keys = Seq("o_orderkey"),
        versionCol = Some("ver"))
      s.sql("DROP TABLE IF EXISTS m75_t")
      s.sql(s"CREATE TABLE m75_t USING manifest OPTIONS (path '$out')")
      orders.select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"), col("o_totalprice"))
        .createOrReplaceTempView("m75_src")
      val vBefore = Layout.manifestVersion(s, out).get
      s.sql("""
        MERGE INTO m75_t t
        USING (
          SELECT o_orderkey, o_year,
                 o_totalprice + 100 AS o_totalprice,
                 CAST(2 AS BIGINT) AS ver, 'update' AS op
          FROM m75_src WHERE o_orderkey % 10 = 0
          UNION ALL
          SELECT o_orderkey, o_year, o_totalprice,
                 CAST(2 AS BIGINT) AS ver, 'delete' AS op
          FROM m75_src WHERE o_orderkey % 13 = 0 AND o_orderkey % 10 <> 0
          UNION ALL
          SELECT o_orderkey + 2000000000 AS o_orderkey, o_year,
                 o_totalprice, CAST(2 AS BIGINT) AS ver, 'insert' AS op
          FROM m75_src WHERE o_orderkey % 11 = 0
        ) c
        ON t.o_orderkey = c.o_orderkey
        WHEN MATCHED AND c.op = 'delete' THEN DELETE
        WHEN MATCHED THEN UPDATE SET o_totalprice = c.o_totalprice,
                                     ver = c.ver
        WHEN NOT MATCHED THEN
          INSERT (o_orderkey, o_year, o_totalprice, ver)
          VALUES (c.o_orderkey, c.o_year, c.o_totalprice, c.ver)""")
      require(Layout.manifestVersion(s, out).contains(vBefore + 1),
        "the full CDC batch must land as exactly ONE publish")
      s.newSession()
        .sql("SELECT o_orderkey, o_year, o_totalprice, ver FROM m75_t")
        .select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
          col("o_totalprice"), col("ver"))
    }),

    // PERSISTENT catalog registration: CREATE TABLE <name> USING
    // manifest stores the mount in the session catalog — DESCRIBE
    // shows the real schema, a FRESH session (newSession over the same
    // metastore) runs the full DML lifecycle by BARE NAME with the
    // merge spec resolved from the manifest (declared at seed — zero
    // per-statement OPTIONS), reads are LIVE (each scan serves the
    // current manifest version, no REFRESH choreography), and
    // `VERSION AS OF 1` time-travels to the seed through the parser
    // seam. The oracle pins the post-DML arithmetic (m71's family).
    "m74_manifest_catalog" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("catalog")}/ord"
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"),
          col("o_totalprice"), lit(1L).as("ver"))
        .write.format("manifest").option("path", out)
        .option("partitionCols", "o_year")
        .option("keys", "o_orderkey").option("versionCol", "ver")
        .mode("overwrite").save()
      s.sql("DROP TABLE IF EXISTS m74_cat")
      s.sql(s"CREATE TABLE m74_cat USING manifest OPTIONS (path '$out')")
      val desc = s.sql("DESCRIBE TABLE m74_cat").collect()
        .map(_.getString(0))
      require(desc.contains("o_orderkey") && desc.contains("o_year"),
        s"DESCRIBE must show the real schema (${desc.take(6).mkString(",")})")
      // the FULL DML lifecycle from a FRESH session — bare table name,
      // the stored merge spec, not one OPTION restated
      val s2 = s.newSession()
      s2.sql(s"""INSERT INTO m74_cat
        SELECT o_orderkey, o_totalprice + 100 AS o_totalprice,
               CAST(2 AS BIGINT) AS ver, year(o_orderdate) AS o_year
        FROM parquet.`$dir/orders.parquet` WHERE o_orderkey % 10 = 0""")
      s2.sql("UPDATE m74_cat SET o_totalprice = o_totalprice + 1, " +
        "ver = CAST(3 AS BIGINT) WHERE o_orderkey % 20 = 0")
      s2.sql("DELETE FROM m74_cat WHERE o_orderkey % 13 = 0")
      require(Layout.manifestVersion(s, out).contains(4),
        "seed + INSERT + UPDATE + DELETE must be exactly four publishes")
      // time travel by bare name predates the whole lifecycle
      val seedMax = s.sql(
        "SELECT max(ver) AS mv FROM m74_cat VERSION AS OF 1")
        .head().getLong(0)
      require(seedMax == 1L,
        s"VERSION AS OF 1 must serve the seed (max ver $seedMax)")
      // a THIRD session reads the final state live, bare name
      s.newSession()
        .sql("SELECT o_orderkey, o_year, o_totalprice, ver FROM m74_cat")
        .select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
          col("o_totalprice"), col("ver"))
    }),

    "m73_manifest_concurrent_commits" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("concommit")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
        (pmod(col("o_orderkey"), lit(4)) + 1).as("ver"))
      def slice(r: Int) =
        rows.filter(pmod(col("o_orderkey"), lit(4)) === r)
      Layout.writeManifestTable(s, out, slice(0), Seq("o_year"))   // v1
      val started = new java.util.concurrent.CountDownLatch(1)
      @volatile var compacted: Seq[String] = Nil
      @volatile var failure: Throwable = null
      val tA = new Thread(() =>
        try { started.await(); compacted =
          Layout.compactManifest(s, out, maxFiles = 0) }
        catch { case t: Throwable => failure = t })
      val tB = new Thread(() =>
        try {
          started.countDown()
          (1 to 3).foreach(r =>
            Layout.mergeManifestDelta(s, out, slice(r),
              Seq("o_orderkey"), "ver"))
        } catch { case t: Throwable => failure = t })
      tA.start(); tB.start(); tA.join(120000); tB.join(120000)
      if (failure != null) throw failure
      require(compacted.nonEmpty,
        "the compaction must commit alongside concurrent ingest " +
          "(delta merges never move base entries)")
      require(Layout.manifestVersion(s, out).contains(5),
        "every publish must land exactly once (seed + compact + 3 " +
          s"deltas; live v${Layout.manifestVersion(s, out)})")
      Layout.readManifest(s, out).select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"), col("o_totalprice"),
        col("ver"))
    }),

    // DECLARED append-only manifest table (the event/fact-table shape):
    // no merge spec exists, so updates/deletes are structurally
    // INEXPRESSIBLE — appendManifest lands spec-less delta generations
    // in O(|batch|), the planner index serves the PENDING appends with
    // partition pruning (nothing to resolve — pinned in-gate on the
    // version, the pending-delta state, the keyed-merge refusal, and
    // the scan metric), and the table contents equal the union of
    // every batch (the oracle).
    "m72_manifest_append_only" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("appendonly")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"))
      def slice(r: Int) =
        rows.filter(pmod(col("o_orderkey"), lit(4)) === r)
      Layout.writeManifestTable(s, out, slice(0), Seq("o_year"),
        statsCols = Seq("o_orderkey"), appendOnly = true)        // v1
      (1 to 3).foreach(r =>
        require(Layout.appendManifest(s, out, slice(r))))        // v2-4
      val m = Layout.readManifestMeta(s, out,
        Layout.manifestVersion(s, out).get)
      require(m.version == 4 && m.deltas.nonEmpty,
        "the reads below must serve PENDING spec-less appends")
      // keyed writes are structurally inexpressible
      val refused =
        try { Layout.mergeManifest(s, out,
          rows.limit(1).withColumn("ver", lit(9L)),
          Seq("o_orderkey"), "ver"); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("append-only") }
      require(refused, "keyed merges must refuse on append-only tables")
      val tbl = Layout.manifestTable(s, out)
      val q = tbl.filter(col("o_year") === 1996)
      q.collect()
      val scanned = PlanScan.scannedFiles(q)
      val total = tbl.inputFiles.length.toLong
      require(scanned > 0 && scanned < total,
        s"partition pruning must hold over pending appends " +
          s"($scanned of $total)")
      tbl.select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
        col("o_totalprice"))
    }),

    // The COMPLETE pure-SQL DML lifecycle on one manifest view:
    // UPDATE rewrites to a merge of the re-projected matched rows,
    // DELETE to a tombstone merge — each ONE snapshot publish through
    // the same optimistic machinery as every write path (Spark itself
    // refuses UPDATE/DELETE on v1 relations; the injected rule makes
    // them first-class). Time travel to the seed pinned in-gate; the
    // oracle is the post-DML arithmetic.
    "m71_manifest_sql_mutation" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("sqlmut")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      Layout.writeManifestTable(s, out,
        orders.select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year"),
          col("o_totalprice"), lit(1L).as("ver")),
        Seq("o_year"))
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW m71_t USING manifest " +
        s"OPTIONS (path '$out', keys 'o_orderkey', versionCol 'ver')")
      s.sql("UPDATE m71_t SET o_totalprice = o_totalprice + 100, " +
        "ver = CAST(2 AS BIGINT) WHERE o_orderkey % 10 = 0")
      s.sql("DELETE FROM m71_t WHERE o_orderkey % 13 = 0")
      require(Layout.manifestVersion(s, out).contains(3),
        "UPDATE and DELETE must each land as exactly ONE publish")
      val seedVer = Layout.readManifestVersion(s, out, 1)
        .agg(max(col("ver")), count(lit(1))).head()
      require(seedVer.getLong(0) == 1L,
        "time travel to the seed must predate the mutations")
      Layout.readManifest(s, out).select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"), col("o_totalprice"),
        col("ver"))
    }),

    // FILE-level data skipping: per-file min/max recorded at publish
    // time prune WITHIN a partition — after a sorted compaction split
    // by maxRecordsPerFile each partition holds several contiguous-
    // range files, and a key-window query must scan fewer files than
    // the partition holds (scan-metric pin) while returning exactly
    // the window's rows (the oracle). The granularity below partition
    // stats (m40/m48) and above parquet row groups.
    "m69_manifest_fileskip" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("fileskip")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
        lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, rows, Seq("o_year"),
        statsCols = Seq("o_orderkey"))
      // scale-INVARIANT multi-file split: ~4 contiguous-range files
      // per year partition at ANY sf (an absolute record cap collapses
      // to one file per partition at smoke scale — the m48/m64 lesson)
      val perPartition = rows.count() /
        rows.select("o_year").distinct().count()
      val mrKey = "spark.sql.files.maxRecordsPerFile"
      val mrPrev = s.conf.get(mrKey, "0")
      s.conf.set(mrKey, math.max(1L, perPartition / 4).toString)
      try Layout.compactManifest(s, out, maxFiles = 0,
        sortCols = Seq("o_orderkey"))
      finally s.conf.set(mrKey, mrPrev)
      val tbl = Layout.manifestTable(s, out)
      // a window covering the LOW EIGHTH of the keyspace — derived
      // from the data so it stays selective at every sf (a fixed
      // bound covers the whole dense keyspace at smoke scale)
      val keyMax = rows.agg(max(col("o_orderkey"))).head().getLong(0) / 8
      val q = tbl.filter(col("o_orderkey") <= keyMax)
      q.collect()
      val scanned = PlanScan.scannedFiles(q)
      val total = tbl.inputFiles.length.toLong
      require(total > scanned && scanned > 0,
        s"file-level stats must prune within partitions " +
          s"($scanned of $total files)")
      tbl.filter(col("o_orderkey") <= keyMax)
        .select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
          col("o_totalprice"))
    }),

    // Schema evolution beyond add-nullable: METADATA-ONLY type
    // widening (int->bigint — pre-widen generations up-cast per file,
    // no byte rewritten) and column RENAME via alias chains (old-name
    // files coalesce at read; post-rename merges speak the new name).
    // Old snapshots time-travel under their own schema (in-gate
    // requires); the final table's arithmetic is the oracle's.
    "m70_manifest_evolution" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("evolution")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        pmod(col("o_orderkey"), lit(100)).cast("int").as("qty"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out,
        rows.filter(pmod(col("o_orderkey"), lit(3)) =!= 0), Seq("o_year"),
        statsCols = Seq("qty"))                                   // v1
      Layout.mergeManifestDelta(s, out,
        rows.filter(pmod(col("o_orderkey"), lit(3)) === 0),
        Seq("o_orderkey"), "ver")                                 // v2
      Layout.widenManifestColumn(s, out, "qty", "bigint")         // v3
      Layout.renameManifestColumn(s, out, "o_totalprice", "price") // v4
      // post-evolution CDC speaks the new shape: every 10th key
      // re-arrives with qty beyond... (kept in-range for the oracle)
      // price+100 and ver 2 — merged over pre-evolution generations
      Layout.mergeManifest(s, out,
        Layout.readManifest(s, out)
          .filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .withColumn("price", col("price") + 100)
          .withColumn("ver", lit(2L)),
        Seq("o_orderkey"), "ver")                                 // v5
      // old snapshots keep their own schema: v1 is narrow + old name
      val v1 = Layout.readManifestVersion(s, out, 1)
      require(v1.schema("qty").dataType ==
          org.apache.spark.sql.types.IntegerType &&
          v1.columns.contains("o_totalprice"),
        "time travel must serve the pre-evolution schema")
      val live = Layout.readManifest(s, out)
      require(live.schema("qty").dataType ==
          org.apache.spark.sql.types.LongType &&
          live.columns.contains("price"),
        "the live schema must be widened + renamed")
      live.select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
        col("qty"), col("price"), col("ver"))
    }),

    // Partition-spec change (Layout.repartitionManifest): the orders
    // manifest re-partitions from year to key band behind ONE snapshot
    // publish — a pending merge-on-read delta folds into the rewrite,
    // the planner index prunes on the NEW column afterwards (scan
    // metrics), version 1 still time-travels under the old layout (all
    // pinned in-gate) — and the rows never change (the oracle).
    "m64_manifest_repartition" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("repart")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      // band via modulo, not key ranges: scale-INVARIANT partition
      // count (a range band collapses to one partition at smoke scale
      // factors — the m48/m51 lesson: structural pins must derive from
      // the data's shape, not absolute values)
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        pmod(col("o_orderkey"), lit(8)).as("o_band"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out,
        rows.filter(pmod(col("o_orderkey"), lit(7)) =!= 0), Seq("o_year"))
      Layout.mergeManifestDelta(s, out,
        rows.filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .withColumn("ver", lit(2L)),
        Seq("o_orderkey"), "ver") // pending delta folds into the rewrite
      val nParts = Layout.repartitionManifest(s, out, Seq("o_band"))
      require(nParts > 1, s"banding must produce partitions ($nParts)")
      // the planner index prunes on the NEW partition column
      val t = Layout.manifestTable(s, out)
      val pf = t.filter(col("o_band") === 2L)
      pf.collect()
      val scanned = PlanScan.scannedFiles(pf)
      val total = Layout.manifestTable(s, out).inputFiles.length.toLong
      require(scanned > 0 && scanned < total,
        s"new-scheme pruning must fire ($scanned of $total)")
      // v1 still time-travels under the old (year) layout
      require(Layout.readManifestVersion(s, out, 1)
        .inputFiles.forall(_.contains("/o_year=")),
        "old versions must keep the old layout")
      Layout.readManifest(s, out).select(col("o_orderkey"),
        col("o_year"), col("o_band").cast("long").as("o_band"),
        col("o_totalprice"), col("ver"))
    }),

    // The full lakehouse loop, composed end-to-end: a manifest table
    // grows by delta merges (the CDC write side), the manifest-feed
    // STREAMING source tails its append feed, and the stream folds
    // into a standing incremental summary (Ivm) — each stage
    // exactly-once (sinkBatch marker on the writes, checkpoint offset
    // log on the feed, _IVM_BATCH marker on the folds). Drained TWICE
    // around a late append so the restart path runs; the summary must
    // hash-match the one-shot GROUP BY over the full source table.
    "m63_feed_ivm_loop" -> ((s, dir) => {
      import graft.operators.{Ivm, Layout}
      import graft.streaming.Streams
      val base = tmp("feedloop")
      val tab = s"$base/tab"
      val sum = s"$base/summary"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
        (pmod(col("o_orderkey"), lit(4)) + 1).as("ver"))
      def slice(r: Int) =
        rows.filter(pmod(col("o_orderkey"), lit(4)) === r)
      Layout.writeManifestTable(s, tab, slice(0), Seq("o_year"))   // v1
      Layout.mergeManifestDelta(s, tab, slice(1),
        Seq("o_orderkey"), "ver")                                  // v2
      Layout.mergeManifestDelta(s, tab, slice(2),
        Seq("o_orderkey"), "ver")                                  // v3
      def drain(): Unit = Streams.runAvailableNow(
        Streams.incrementalAgg(
          s.readStream.format("manifest-feed")
            .option("path", tab).option("startingVersion", "earliest")
            .load()
            .select(col("o_year"), col("o_totalprice")),
          sum, Seq("o_year"), Seq("o_totalprice"))
          .option("checkpointLocation", s"$base/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()))
      drain() // seed + v2 + v3
      Layout.mergeManifestDelta(s, tab, slice(3),
        Seq("o_orderkey"), "ver")                                  // v4
      drain() // restart from the checkpoint: only v4's rows fold
      Ivm.read(s, sum).select(col("o_year").cast("int").as("o_year"),
        col("n_rows"),
        col("sum_o_totalprice").cast("double").as("sum_totalprice"))
    }),

    // Pure-SQL DDL over the manifest (CREATE TEMPORARY VIEW ... USING
    // manifest): the registered data source mounts the planner index
    // with no Scala API in sight — a merge publishes v2, the live view
    // reads it with partition pruning (pinned via scan metrics), and a
    // versionAsOf view still reads the seed (in-gate require). The
    // oracle pins the post-merge arithmetic row-for-row.
    "m62_manifest_ddl" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("manddl")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, seed, Seq("o_year"))
      Layout.mergeManifest(s, out,
        seed.filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("ver", lit(2L)),
        Seq("o_orderkey"), "ver")
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW m62_live " +
        s"USING manifest OPTIONS (path '$out')")
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW m62_v1 " +
        s"USING manifest OPTIONS (path '$out', versionAsOf '1')")
      // time travel: the v1 view must still see every pre-merge price
      val drifted = s.sql(
        """SELECT count(*) AS n FROM m62_v1 a JOIN m62_live b
           ON a.o_orderkey = b.o_orderkey
           WHERE a.o_totalprice <> b.o_totalprice""").head().getLong(0)
      val expectDrift = s.sql(
        "SELECT count(*) FROM m62_v1 WHERE o_orderkey % 10 = 0")
        .head().getLong(0)
      require(drifted == expectDrift,
        s"versionAsOf must pin the seed snapshot ($drifted vs " +
          s"$expectDrift rewritten keys)")
      // partition pruning works through the DDL view
      val pruned = s.sql("SELECT o_orderkey FROM m62_live " +
        "WHERE o_year = 1996")
      pruned.collect()
      val scanned = PlanScan.scannedFiles(pruned)
      val total = Layout.manifestTable(s, out).inputFiles.length.toLong
      require(scanned > 0 && scanned < total,
        s"DDL-view partition pruning must fire ($scanned of $total)")
      s.sql("""SELECT o_orderkey, o_year, o_totalprice, ver
               FROM m62_live""")
        .select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
          col("o_totalprice"), col("ver"))
    }),

    // Pure-SQL DML over the manifest: seed through the registered
    // writer (df.write.format("manifest") — no Layout call in sight),
    // then the incremental load is ONE `INSERT INTO <view> SELECT …
    // FROM parquet.<file>` statement. The injected ManifestInsertRule
    // rewrites it to a keyed copy-on-write merge publishing ONE new
    // snapshot — never a raw parquet write into the table root — so
    // time travel still reaches the seed (in-gate require) and the
    // update half of the batch upserts rather than duplicates. The
    // oracle pins the post-merge arithmetic row-for-row (m62's family).
    "m67_manifest_sql_dml" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("mandml")}/ord"
      s.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"),
          col("o_totalprice"), lit(1L).as("ver"))
        .write.format("manifest").option("path", out)
        .option("partitionCols", "o_year").mode("overwrite").save()
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW m67_t USING manifest " +
        s"OPTIONS (path '$out', keys 'o_orderkey', versionCol 'ver')")
      // the incremental load: every 10th key re-arrives with a bumped
      // price — positional INSERT in the VIEW's stored column order
      // (data columns first, partition column last)
      s.sql(s"""INSERT INTO m67_t
        SELECT o_orderkey, o_totalprice + 100 AS o_totalprice,
               CAST(2 AS BIGINT) AS ver,
               year(o_orderdate) AS o_year
        FROM parquet.`$dir/orders.parquet` WHERE o_orderkey % 10 = 0""")
      require(Layout.manifestVersion(s, out).contains(2),
        "the INSERT must land as exactly ONE manifest publish")
      // the INSERT was a snapshot publish: v1 still serves the seed
      val seedMax = Layout.readManifestVersion(s, out, 1)
        .agg(max(col("ver"))).head().getLong(0)
      require(seedMax == 1L,
        s"time travel to the seed must predate the INSERT (ver $seedMax)")
      s.sql(s"CREATE OR REPLACE TEMPORARY VIEW m67_live USING manifest " +
        s"OPTIONS (path '$out')")
      s.sql("SELECT o_orderkey, o_year, o_totalprice, ver FROM m67_live")
        .select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
          col("o_totalprice"), col("ver"))
    }),

    // The manifest table as a STRUCTURED STREAMING source
    // (spark.readStream.format("manifest-feed")): offsets are manifest
    // versions from the checkpoint's offset log, each batch reads ONLY
    // the generation dirs its version window appended
    // (Layout.appendsBetween — O(|new rows|) per batch however large
    // the table), a mid-feed fold is transparent (row-identical
    // re-layout), and the drained sink must hold exactly the table —
    // seed snapshot plus every delta batch, no fold double-counts. The
    // drain also acks the m61 retention cursor via the source's
    // consumer option.
    "m61_streaming_manifest_feed" -> ((s, dir) => {
      import graft.operators.Layout
      val base = tmp("manstream")
      val out = s"$base/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
        (pmod(col("o_orderkey"), lit(4)) + 1).as("ver"))
      def slice(r: Int) =
        rows.filter(pmod(col("o_orderkey"), lit(4)) === r)
      Layout.writeManifestTable(s, out, slice(0), Seq("o_year"))    // v1
      Layout.mergeManifestDelta(s, out, slice(1),
        Seq("o_orderkey"), "ver")                                   // v2
      Layout.mergeManifestDelta(s, out, slice(2),
        Seq("o_orderkey"), "ver")                                   // v3
      Layout.foldManifestDeltas(s, out)                             // v4
      Layout.mergeManifestDelta(s, out, slice(3),
        Seq("o_orderkey"), "ver")                                   // v5
      val q = s.readStream.format("manifest-feed")
        .option("path", out).option("startingVersion", "earliest")
        .option("consumer", "m61").load()
        .writeStream.format("parquet").option("path", s"$base/sink")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$base/sink").select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"), col("o_totalprice"),
        col("ver"))
    }),

    // SELF-DRIVING sketch summary (Ivm.syncFromManifest with
    // kmv/kll columns): an append-only manifest table grows in three
    // merges of NEW keys; each scheduled sync folds only the change
    // feed's inserts into the standing per-status sketches (KMV
    // sketches cannot retract, so sketch sync is an append-only
    // contract — delete-bearing feeds refuse loudly, spec-pinned).
    // The folded sketches must equal the one-shot aggregates over the
    // live table array-exactly, the KMV estimate the exact distinct
    // count, and the KLL quantiles the exact rank statistics (m47's
    // claims, reproduced through the cursor-driven path).
    "m58_sketch_ivm_sync" -> ((s, dir) => {
      import graft.operators.{Ivm, Layout}
      import graft.expressions.{Kll, Kmv}
      // k above the biggest per-status row count at the gate's scale
      // factor keeps KLL in its below-capacity EXACT regime (no
      // compaction -> merge order cannot matter and quantiles are the
      // exact rank statistics); beyond it only the 16/k rank bound is
      // guaranteed (q58's stress regime)
      val k = 16384
      val out = s"${tmp("sksync")}/ord"
      val sumDir = s"${tmp("sksync")}/summary"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val rows = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_custkey"), col("o_totalprice").cast("double").as("price"))
      def slice(r: Int) = rows
        .filter(pmod(col("o_orderkey"), lit(3)) === r)
        .withColumn("ver", lit((r + 1).toLong))
      Layout.writeManifestTable(s, out, slice(0), Seq("o_orderstatus"))
      def sync(): Boolean = Ivm.syncFromManifest(s, sumDir, out,
        Seq("o_orderstatus"), Nil, kmvCols = Seq("o_custkey"),
        kllCols = Seq("price"), sketchK = k)
      require(sync(), "seed sync must apply")
      for (r <- 1 to 2) {
        Layout.mergeManifest(s, out, slice(r), Seq("o_orderkey"), "ver")
        require(sync(), s"sync after append $r must apply")
      }
      require(!sync(), "a caught-up sketch sync must be a no-op")
      val folded = Ivm.read(s, sumDir)
      val oneShot = rows.groupBy("o_orderstatus").agg(
        count(lit(1)).as("n2"),
        countDistinct(col("o_custkey")).as("distinct_cust"),
        Kmv.sketch(xxhash64(col("o_custkey")), k).as("dsk"),
        Kll.sketch(col("price"), k).as("dkll"))
      // SCALE-INVARIANT sketch pins (m47's rewrite — see its comment)
      val est = folded.join(oneShot, "o_orderstatus")
        .select(col("o_orderstatus"), col("n_rows"), col("distinct_cust"),
          (col("kmv_o_custkey") === col("dsk")).as("kmv_lossless"),
          (abs(Kmv.estimate(col("kmv_o_custkey"), k) -
            col("distinct_cust").cast("double")) <=
            lit(0.05) * col("distinct_cust")).as("kmv_within"),
          Kll.quantile(col("kll_price"), 0.5).as("m50"),
          Kll.quantile(col("kll_price"), 0.95).as("m95"),
          Kll.quantile(col("dkll"), 0.5).as("d50"),
          Kll.quantile(col("dkll"), 0.95).as("d95"))
      val tol = 16.0 / k
      rows.join(est, "o_orderstatus").groupBy("o_orderstatus")
        .agg(first("n_rows").as("n_rows"),
          first("distinct_cust").as("distinct_cust"),
          first("kmv_lossless").as("kmv_lossless"),
          first("kmv_within").as("kmv_within"),
          count(lit(1)).as("nn"),
          sum(when(col("price") <= col("m50"), 1L).otherwise(0L))
            .as("r50m"),
          sum(when(col("price") <= col("m95"), 1L).otherwise(0L))
            .as("r95m"),
          sum(when(col("price") <= col("d50"), 1L).otherwise(0L))
            .as("r50d"),
          sum(when(col("price") <= col("d95"), 1L).otherwise(0L))
            .as("r95d"))
        .select(col("o_orderstatus").cast("string").as("o_orderstatus"),
          col("n_rows"), col("distinct_cust"),
          col("kmv_lossless"), col("kmv_within"),
          (abs(col("r50m") - lit(0.5) * col("nn")) <=
            lit(tol) * col("nn")).as("p50_rank_ok"),
          (abs(col("r95m") - lit(0.95) * col("nn")) <=
            lit(tol) * col("nn")).as("p95_rank_ok"),
          (abs(col("r50m") - col("r50d")) <= lit(tol) * col("nn") &&
            abs(col("r95m") - col("r95d")) <= lit(tol) * col("nn"))
            .as("kll_merge_rank_ok"))
    }),

    // STREAMING token-window chunking gated through batch t12's oracle:
    // the chunker is a pure flatMap projection (tokenize -> slice), so
    // batch semantics lift with no state and no watermark — documents
    // stream in, training-ready windows stream out (the m21 stateless
    // pattern: no sentinels needed).
    "m43_streaming_chunk" -> ((s, dir) => {
      import graft.streaming.Streams
      val docsBatch = s.read.parquet(s"$dir/documents.parquet")
      val src = Streams.fileMonitor(s, s"$dir/documents.parquet*",
        "parquet", docsBatch.schema)
      drainAppend(s, Streams.chunk(src, "doc_id", "text",
        chunkSize = 64, stride = 48), "m43")
    }),

    // STREAMING calibrated-quality filter gated through batch t16's
    // oracle: the per-language median-quality thresholds calibrate ONCE
    // on the BATCH corpus (recomputing them per micro-batch would drift
    // with arrival order — the exact failure the calibration exists to
    // prevent), then apply to the document stream as a stream-static
    // broadcast join + filter. Stateless -> batch ≡ stream verbatim.
    "m44_streaming_calibrated" -> ((s, dir) => {
      import graft.functions.TextFunctions.qualityScore
      import graft.streaming.Streams
      val docsBatch = s.read.parquet(s"$dir/documents.parquet")
      val thr = graft.operators.Sampling.quantileThresholds(
        docsBatch, "lang", qualityScore(col("text")),
        bins = 1000, qNum = 1, qDen = 2)
      val src = Streams.fileMonitor(s, s"$dir/documents.parquet*",
        "parquet", docsBatch.schema)
      drainAppend(s, Streams.calibratedFilter(src, thr, "lang",
        qualityScore(col("text")), bins = 1000), "m44")
        .select("doc_id", "lang", "bin", "thr_bin")
    }),

    // STREAMING temperature-mix rebalancing gated through batch p07's
    // oracle: per-source keep rates derived ONCE in batch (sqrt
    // temperature over the reference corpus), applied to the stream as
    // a broadcast join + deterministic hash filter — the same
    // stream-static rationale as m44.
    "m45_streaming_temperature" -> ((s, dir) => {
      import graft.streaming.Streams
      val docsBatch = s.read.parquet(s"$dir/documents.parquet")
      val rates = graft.operators.Sampling.temperatureThresholds(
        docsBatch, "source")
      val src = Streams.fileMonitor(s, s"$dir/documents.parquet*",
        "parquet", docsBatch.schema)
      drainAppend(s, Streams.temperatureMix(src, rates,
        "source", "doc_id"), "m45")
        .select("doc_id", "source")
    }),

    // STREAMING bigram-LM corpus-fit scoring gated through batch t13's
    // oracle: the model counts over the BATCH reference slice, compiled
    // into the plan as a broadcast map literal (the t15 zero-shuffle
    // path), scoring the stream as a pure projection.
    "m46_streaming_lm_fit" -> ((s, dir) => {
      import graft.streaming.Streams
      val docsBatch = s.read.parquet(s"$dir/documents.parquet")
      val model = graft.operators.LmScore.bigramModel(
        docsBatch.filter(col("doc_id") % 7 === 0), "text")
      val src = Streams.fileMonitor(s, s"$dir/documents.parquet*",
        "parquet", docsBatch.schema)
      drainAppend(s, Streams.lmScore(src, model, "doc_id", "text"), "m46")
    }),

    // STREAMING BM25 scoring gated through the batch oracle: the model
    // (per-query term idfs + corpus length stats, rational-idf mode) is
    // calibrated on the BATCH documents table, then the same documents
    // stream through the file monitor and score STATELESSLY (HOF
    // projection, no state, no watermark — batch ≡ stream by
    // construction, so no sentinel drain is needed). The memory sink
    // must hash-match the all-pairs scoring CTE of t18's oracle.
    "m21_streaming_bm25" -> ((s, dir) => {
      import graft.streaming.Streams
      import s.implicits._
      val queries = Seq(
        (1L, "spark join window"),
        (2L, "fast hash merge batch"),
        (3L, "slow scan filter vector")).toDF("query_id", "qtext")
      val docsBatch = s.read.parquet(s"$dir/documents.parquet")
      val model = graft.operators.Retrieval.bm25Model(docsBatch,
        "doc_id", "text", queries, "query_id", "qtext", logIdf = false)
      val src = Streams.fileMonitor(s, s"$dir/documents.parquet*",
        "parquet", docsBatch.schema)
      val name = s"m21_sink_${java.util.UUID.randomUUID.toString.replace("-", "")}"
      val q = Streams.bm25Score(src, model, "doc_id", "text")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name)
    }),

    // Single-FILE JSON: both halves of orders land in ONE top-level
    // array document (the reference's exact layout incl. splice
    // append); read back with the default multiline reader.
    "m22_singlefile_json" -> ((s, dir) => {
      val p = s"${tmp("sjson")}/orders.json"
      val o = s.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val ctx = StepContext(s, cal)
      JsonModel(p, singleFile = true)
        .load(ctx, o.filter(pmod(col("o_orderkey"), lit(2)) === 0))
      JsonModel(p, singleFile = true, append = true)
        .load(ctx, o.filter(pmod(col("o_orderkey"), lit(2)) =!= 0))
      require(new java.io.File(p).isFile, "singleFile sink must be a FILE")
      JsonModel(p).extract(ctx)
        .select(col("o_orderkey").cast("long"), col("o_orderstatus"),
          col("o_totalprice").cast("double"))
    }),

    // Single-FILE XML: one declaration + one root document with splice
    // append (models.py:1441-1454's read-modify-write shape).
    "m23_singlefile_xml" -> ((s, dir) => {
      val p = s"${tmp("sxml")}/nation.xml"
      val n = s.read.parquet(s"$dir/nation.parquet")
      val ctx = StepContext(s, cal)
      XmlModel(p, singleFile = true)
        .load(ctx, n.filter(pmod(col("n_nationkey"), lit(2)) === 0))
      XmlModel(p, singleFile = true, append = true)
        .load(ctx, n.filter(pmod(col("n_nationkey"), lit(2)) =!= 0))
      require(new java.io.File(p).isFile, "singleFile sink must be a FILE")
      XmlModel(p).extract(ctx)
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long"))
    }),

    // PARTITIONED CDC apply: copy-on-write at partition granularity
    // with tombstones — including a partition whose keys are ALL
    // deleted (its directory must go; the write produces no output for
    // it, so the old dir would otherwise silently survive — the
    // round-10 review fix, now driver-checked). Updates keep their
    // partition value (the documented non-global-index contract).
    "m25_cdc_partitioned" -> ((s, dir) => {
      val out = s"${tmp("cdcpart")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      orders.select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(1L).as("ver"))
        .write.partitionBy("o_orderstatus").parquet(out)
      // delete EVERY key of status 'P' (the fixture's smallest status)
      // + update every 10th key elsewhere
      val batch = orders.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(2L).as("ver"), lit(true).as("del"))
        .unionByName(orders
          .filter(col("o_orderstatus") =!= "P" &&
            pmod(col("o_orderkey"), lit(10)) === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + 100).as("o_totalprice"),
            lit(2L).as("ver"), lit(false).as("del")))
      graft.operators.Layout.merge(s, out, batch, Seq("o_orderkey"), "ver",
        partitionCols = Seq("o_orderstatus"), deleteCol = Some("del"))
      require(!new java.io.File(s"$out/o_orderstatus=P").exists(),
        "fully-deleted partition directory must be removed")
      s.read.parquet(out).select(col("o_orderkey"),
        col("o_orderstatus").cast("string").as("o_orderstatus"),
        col("o_totalprice"), col("ver"))
    }),

    // GENERATIONAL merge roundtrip: flat seed migrates via compactGen
    // (gen-1 + _CURRENT), the m15 update batch applies via mergeGen
    // (gen-2 swapped live), and readCurrent must hash-match the same
    // latest-wins SQL as m15 — the pointer-swap path is now driver-
    // checked end to end, not just spec-covered. The gate also pins
    // time-travel: gen-1 (pre-merge) still equals the seed.
    "m24_generational_merge" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("genmerge")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      orders.select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(1L).as("ver"))
        .write.parquet(out)
      Layout.compactGen(s, out)
      require(Layout.currentGeneration(s, out).contains(1))
      val batch = orders
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") + 100).as("o_totalprice"), lit(2L).as("ver"))
        .unionByName(orders
          .filter(pmod(col("o_orderkey"), lit(7)) === 0)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"), lit(2L).as("ver")))
      Layout.mergeGen(s, out, batch, Seq("o_orderkey"), "ver")
      require(Layout.currentGeneration(s, out).contains(2))
      require(Layout.readGeneration(s, out, 1).count() == orders.count(),
        "time-travel: gen-1 must still be the pre-merge seed")
      Layout.readCurrent(s, out)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "ver")
    }),

    // Single-FILE sink fidelity (reference models.py:1366-1374): two
    // halves of lineitem land in ONE CSV file via singleFile append —
    // header exactly once, driver-stitched part bytes — and the read-
    // back must hash-match the whole source table. SingleFileSpec pins
    // the JSON/XML document shapes; this gates the append roundtrip
    // end-to-end against DuckDB.
    "m20_singlefile_append" -> ((s, dir) => {
      val p = s"${tmp("single")}/li.csv"
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "l_orderkey long, l_linenumber int, l_quantity double, " +
          "l_returnflag string")
      val ctx = StepContext(s, cal)
      CsvModel(p, delimiter = "|", singleFile = true)
        .load(ctx, li.filter(pmod(col("l_orderkey"), lit(2)) === 0))
      CsvModel(p, delimiter = "|", singleFile = true, append = true)
        .load(ctx, li.filter(pmod(col("l_orderkey"), lit(2)) =!= 0))
      require(new java.io.File(p).isFile, "singleFile sink must be a FILE")
      CsvModel(p, delimiter = "|", schema = Some(schema)).extract(ctx)
    }),

    // MANIFEST-table CDC apply (the partitioned-merge reader-window
    // cure, driver-checked): the m25 change batch — every key of one
    // partition tombstoned + updates elsewhere — applies through
    // Layout.mergeManifest, which publishes the new partition-granular
    // snapshot with ONE atomic pointer rename. The gate pins the whole
    // concurrency contract in-line: a reader PINNED before the apply
    // still checksums to the seed afterwards (no missing-partition
    // window, no torn listing), time-travel to manifest v1 still
    // equals the seed, reap drops the superseded generation dirs, and
    // the post-apply snapshot must hash-match m25's oracle.
    "m26_manifest_cdc" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("manifest")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(1L).as("ver"))
      def chk(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        // xor-fold of row hashes: order-independent and overflow-free
        // (a SUM of 64-bit hashes would trip ANSI overflow checks)
        val r = df.select(xxhash64(col("o_orderkey"),
            col("o_orderstatus").cast("string"), col("o_totalprice"),
            col("ver")).as("h"))
          .agg(count(lit(1)), expr("bit_xor(h)")).head()
        (r.getLong(0), r.getLong(1))
      }
      val seedChk = chk(seed)
      Layout.writeManifestTable(s, out, seed, Seq("o_orderstatus"))
      // pin a reader BEFORE the concurrent apply
      val pinned = Layout.readManifest(s, out)
      val batch = orders.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(2L).as("ver"), lit(true).as("del"))
        .unionByName(orders
          .filter(col("o_orderstatus") =!= "P" &&
            pmod(col("o_orderkey"), lit(10)) === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + 100).as("o_totalprice"),
            lit(2L).as("ver"), lit(false).as("del")))
      Layout.mergeManifest(s, out, batch, Seq("o_orderkey"), "ver",
        deleteCol = Some("del"))
      require(chk(pinned) == seedChk,
        "reader pinned before a concurrent manifest CDC apply must " +
          "keep its snapshot bit-for-bit")
      require(Layout.manifestVersion(s, out).contains(2))
      require(chk(Layout.readManifestVersion(s, out, 1)) == seedChk,
        "time travel: manifest v1 must still be the seed")
      val reaped = Layout.reapManifest(s, out)
      require(reaped.exists(_.contains("gen=1")) &&
        reaped.exists(_.startsWith("o_orderstatus=P")),
        s"reap must drop superseded gens + the deleted partition: $reaped")
      Layout.readManifest(s, out).select(col("o_orderkey"),
        col("o_orderstatus").cast("string").as("o_orderstatus"),
        col("o_totalprice"), col("ver"))
    }),

    // SELF-DRIVING materialized view (Ivm.syncFromManifest): the
    // summary's exactly-once batch marker doubles as the last manifest
    // version it reflects — one idempotent call seeds from the live
    // snapshot, folds only the change feed when behind, and no-ops
    // when current. Two merges, three syncs (the third must report
    // already-current), then the summary must equal the GROUP BY over
    // the final table — the base is aggregated exactly once, at seed.
    "m55_ivm_sync" -> ((s, dir) => {
      import graft.operators.{Ivm, Layout}
      val out = s"${tmp("ivmsync")}/ord"
      val sum = s"${tmp("ivmsync")}/summary"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, seed, Seq("o_orderstatus"))
      require(Ivm.syncFromManifest(s, sum, out,
        Seq("o_orderstatus"), Seq("o_totalprice")), "first sync seeds")
      // merge 1 (ver 2): +100 on %10==0
      Layout.mergeManifest(s, out,
        seed.filter(pmod(col("o_orderkey"), lit(10)) === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 100)
          .withColumn("ver", lit(2L)),
        Seq("o_orderkey"), "ver")
      require(Ivm.syncFromManifest(s, sum, out,
        Seq("o_orderstatus"), Seq("o_totalprice")), "sync after merge 1")
      // merge 2 (ver 3): delete every status-P order
      Layout.mergeManifest(s, out,
        orders.filter(col("o_orderstatus") === "P")
          .select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice"), lit(3L).as("ver"), lit(true).as("del")),
        Seq("o_orderkey"), "ver", deleteCol = Some("del"))
      require(Ivm.syncFromManifest(s, sum, out,
        Seq("o_orderstatus"), Seq("o_totalprice")), "sync after merge 2")
      require(!Ivm.syncFromManifest(s, sum, out,
        Seq("o_orderstatus"), Seq("o_totalprice")),
        "an already-current sync must be a no-op")
      Ivm.read(s, sum).select(
        col("o_orderstatus").cast("string").as("o_orderstatus"),
        col("n_rows"),
        col("sum_o_totalprice").cast("double").as("sum_o_totalprice"))
    }),

    // HIERARCHICAL manifest (manifestBuckets > 0): per-rel state
    // shards into content-addressed bucket children; the root carries
    // per-bucket stats/bloom rollups so pruned reads never load
    // non-matching children. The gate proves that STRUCTURALLY: after
    // the merge it DELETES the child holding the latest years, and
    // the 1996 window read (which must prune that bucket from the
    // root rollup alone) still hash-matches the merged-table oracle,
    // while an unpruned full read fails loudly on the missing child.
    "m54_manifest_hierarchical" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("hier")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"),
        col("o_orderdate"), col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, seed, Seq("o_year"),
        statsCols = Seq("o_orderdate"), manifestBuckets = 3)
      val batch = seed.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100)
        .withColumn("ver", lit(2L))
      Layout.mergeManifest(s, out, batch, Seq("o_orderkey"), "ver")
      // reap superseded children (the merge rewrote every bucket), then
      // remove the LIVE child holding the latest years (the fixture
      // spans 1995-2001; the rel-sorted thirds put 1996 in the first
      // bucket): the 1996 pruned read below must never ask for it
      require(Layout.reapManifest(s, out).exists(_.startsWith("_MBUCKET")),
        "reap must drop the superseded bucket children")
      val victims = new java.io.File(out).listFiles()
        .filter(f => f.getName.startsWith("_MBUCKET.") &&
          new String(java.nio.file.Files.readAllBytes(f.toPath))
            .contains("o_year=2001"))
      require(victims.length == 1 && victims.head.delete(),
        s"expected one 2001-bearing bucket child, got ${victims.length}")
      var failed = false
      try Layout.readManifest(s, out).count()
      catch { case e: IllegalArgumentException =>
        failed = e.getMessage.contains("bucket file") }
      require(failed, "the FULL read must fail loudly on the missing child")
      val res = Layout.readManifestBetween(s, out, "o_orderdate",
        "1996-02-01 00:00:00", "1996-04-30 23:59:59")
      res.select(col("o_orderkey"), col("o_year").cast("int").as("o_year"),
        col("o_orderdate"), col("o_totalprice"), col("ver"))
    }),

    // EQUALITY data-skipping via per-partition BLOOM filters
    // (Layout.readManifestEq): the table partitions by order YEAR but
    // the lookups are point probes on o_orderkey — a high-cardinality
    // column whose per-partition [min,max] spans ~the whole key space
    // (keys scatter uniformly across years), so RANGE stats can never
    // prune a point lookup; the manifest's per-partition blooms must.
    // Blooms are kept current through a copy-on-write merge, each
    // probed key must scan at most 3 of the year partitions
    // (structural pin; the expected scan is exactly 1, the slack
    // covers deterministic bloom false positives), and the union of
    // the lookups hash-matches the merged-table oracle restricted to
    // the probed keys — pruning never costs a row.
    "m51_manifest_bloomskip" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("bloomskip")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"),
        year(col("o_orderdate")).as("o_year"), col("o_totalprice"),
        lit(1L).as("ver"))
      // size blooms to the per-partition cardinality: a saturated
      // bloom admits everything and prunes NOTHING — the sizing is
      // computed from the data (rows / ~4 ≈ 2x the largest year
      // partition) so the pruning claim below holds at every scale
      // factor, exactly how production would size it
      val bloomItems = math.max(4096L, orders.count() / 4)
      Layout.writeManifestTable(s, out, seed, Seq("o_year"),
        bloomCols = Seq("o_orderkey"), bloomItems = bloomItems)
      val batch = seed.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 100)
        .withColumn("ver", lit(2L))
      Layout.mergeManifest(s, out, batch, Seq("o_orderkey"), "ver")
      def yearsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.inputFiles
          .map(_.replaceAll(".*/(o_year=[^/]+)/gen=\\d+/.*", "$1"))
          .distinct.toSeq
      val total = yearsOf(Layout.readManifest(s, out)).length
      require(total >= 5, s"fixture should span >=5 years, got $total")
      val keys = orders.select("o_orderkey").orderBy("o_orderkey")
        .limit(5).collect().map(_.getLong(0))
      val lookups = keys.map { k =>
        val r = Layout.readManifestEq(s, out, Seq(("o_orderkey", k)))
        val scanned = yearsOf(r)
        require(scanned.nonEmpty && scanned.length <= 3,
          s"bloom lookup of $k must prune to <=3 of $total year " +
            s"partitions, scanned ${scanned.mkString(",")}")
        r
      }
      lookups.reduce(_.unionByName(_)).select(col("o_orderkey"),
        col("o_year").cast("int").as("o_year"),
        col("o_totalprice"), col("ver"))
    }),

    // CHANGE FEED (Layout.manifestChanges): the row-level diff between
    // two manifest versions — updates as delete+insert pairs, deletes
    // as deletes — recomputed as SQL from the batch definition. Work
    // is bounded by the partitions whose generation set changed
    // (pinned structurally in LayoutSpec); this is the downstream-
    // incremental-consumption primitive m53 builds on.
    "m52_manifest_changes" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("chfeed")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, seed, Seq("o_orderstatus"))
      // the m26 batch shape: delete every status-P order, +100 on
      // %10==0 outside P
      val batch = orders.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(2L).as("ver"), lit(true).as("del"))
        .unionByName(orders.filter(col("o_orderstatus") =!= "P" &&
            pmod(col("o_orderkey"), lit(10)) === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + 100).as("o_totalprice"),
            lit(2L).as("ver"), lit(false).as("del")))
      Layout.mergeManifest(s, out, batch, Seq("o_orderkey"), "ver",
        deleteCol = Some("del"))
      Layout.manifestChanges(s, out, 1, 2)
        .select(col("o_orderkey"),
          col("o_orderstatus").cast("string").as("o_orderstatus"),
          col("o_totalprice"), col("ver"), col("_change_type"))
    }),

    // Change feed FEEDING incremental view maintenance — the end-to-
    // end incremental pipeline: a standing per-status rollup seeded
    // from snapshot v1, then kept in step by folding ONLY the v1->v2
    // diff (insert = +1, delete = -1 weight) through Ivm's exactly-
    // once marker. The summary must equal the GROUP BY over the
    // post-merge table — the base is never re-aggregated.
    "m53_changes_ivm" -> ((s, dir) => {
      import graft.operators.{Ivm, Layout}
      val out = s"${tmp("chivm")}/ord"
      val sum = s"${tmp("chivm")}/summary"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(1L).as("ver"))
      Layout.writeManifestTable(s, out, seed, Seq("o_orderstatus"))
      require(Ivm.applyDelta(s, sum, Layout.readManifestVersion(s, out, 1),
        Seq("o_orderstatus"), Seq("o_totalprice"), batchId = 1),
        "seeding from snapshot v1 must apply")
      val batch = orders.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(2L).as("ver"), lit(true).as("del"))
        .unionByName(orders.filter(col("o_orderstatus") =!= "P" &&
            pmod(col("o_orderkey"), lit(10)) === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + 100).as("o_totalprice"),
            lit(2L).as("ver"), lit(false).as("del")))
      Layout.mergeManifest(s, out, batch, Seq("o_orderkey"), "ver",
        deleteCol = Some("del"))
      val feed = Layout.manifestChanges(s, out, 1, 2)
        .withColumn("w", when(col("_change_type") === "insert", 1L)
          .otherwise(-1L))
      require(Ivm.applyDelta(s, sum, feed, Seq("o_orderstatus"),
        Seq("o_totalprice"), batchId = 2, weightCol = Some("w")),
        "folding the change feed must apply")
      Ivm.read(s, sum).select(
        col("o_orderstatus").cast("string").as("o_orderstatus"),
        col("n_rows"),
        col("sum_o_totalprice").cast("double").as("sum_o_totalprice"))
    }),

    // MERGE-ON-READ manifest CDC (Layout.mergeManifestDelta /
    // foldManifestDeltas): two delta batches — updates, inserts, and a
    // partition-wide delete — land as pending delta generations with
    // the base NEVER rewritten (every seed data file must still be on
    // disk and still part of the resolved read: the O(|batch|) merge
    // cost shape copy-on-write can't give), readers resolve
    // latest-wins in-plan, a pinned reader keeps the seed snapshot,
    // and the fold rewrites delta-bearing partitions to single
    // generations WITHOUT changing a row (pre-fold xor-hash == post-
    // fold xor-hash, and the post-fold read is the gate output, so
    // both the resolution and the fold are oracle-exact).
    "m50_manifest_mor" -> ((s, dir) => {
      import graft.operators.Layout
      val out = s"${tmp("mor")}/ord"
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val seed = orders.select(col("o_orderkey"), col("o_orderstatus"),
        col("o_totalprice"), lit(1L).as("ver"))
      def chk(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val r = df.select(xxhash64(col("o_orderkey"),
            col("o_orderstatus").cast("string"), col("o_totalprice"),
            col("ver")).as("h"))
          .agg(count(lit(1)), expr("bit_xor(h)")).head()
        (r.getLong(0), r.getLong(1))
      }
      Layout.writeManifestTable(s, out, seed, Seq("o_orderstatus"))
      val seedChk = chk(Layout.readManifest(s, out))
      val baseFiles = Layout.readManifest(s, out).inputFiles.toSet
      val pinned = Layout.readManifest(s, out)
      // delta 1 (ver 2): +100 on keys %10==0; brand-new keys for %13==0
      val d1 = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          (col("o_totalprice") + 100).as("o_totalprice"),
          lit(2L).as("ver"), lit(false).as("del"))
        .unionByName(orders.filter(pmod(col("o_orderkey"), lit(13)) === 0)
          .select((col("o_orderkey") + 1000000000L).as("o_orderkey"),
            col("o_orderstatus"), col("o_totalprice"),
            lit(2L).as("ver"), lit(false).as("del")))
      Layout.mergeManifestDelta(s, out, d1, Seq("o_orderkey"), "ver",
        deleteCol = Some("del"))
      // delta 2 (ver 3): delete every original status-P order; +7 on
      // %7==0 outside P (no intra-batch key conflicts by construction)
      val d2 = orders.filter(col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"), lit(3L).as("ver"), lit(true).as("del"))
        .unionByName(orders.filter(col("o_orderstatus") =!= "P" &&
            pmod(col("o_orderkey"), lit(7)) === 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            (col("o_totalprice") + 7).as("o_totalprice"),
            lit(3L).as("ver"), lit(false).as("del")))
      Layout.mergeManifestDelta(s, out, d2, Seq("o_orderkey"), "ver",
        deleteCol = Some("del"))
      // the base was never rewritten: every seed file still read
      val resolvedFiles = Layout.readManifest(s, out).inputFiles.toSet
      require(baseFiles.subsetOf(resolvedFiles) &&
        resolvedFiles != baseFiles,
        "delta merges must append generations, never rewrite the base")
      require(chk(pinned) == seedChk,
        "reader pinned before merge-on-read deltas must keep its snapshot")
      val preFold = chk(Layout.readManifest(s, out))
      val folded = Layout.foldManifestDeltas(s, out)
      require(folded.nonEmpty, "fold must rewrite delta-bearing partitions")
      require(chk(Layout.readManifest(s, out)) == preFold,
        "fold must not change a single resolved row")
      require(Layout.foldManifestDeltas(s, out).isEmpty,
        "a second fold must be a no-op")
      Layout.readManifest(s, out).select(col("o_orderkey"),
        col("o_orderstatus").cast("string").as("o_orderstatus"),
        col("o_totalprice"), col("ver"))
    }),

    // Z-order clustered rewrite (Layout.zorderWrite): lineitem written
    // Z-clustered on (l_orderkey, l_partkey); the read-back hash match
    // proves the curve rewrite is row-exact (the skipping behavior is
    // measured in LayoutSpec — the gate's claim is losslessness).
    // Z-order on a STRING dimension (real layout keys are
    // (domain, day)-shaped, not all-numeric): documents written
    // Z-clustered on (lang, doc_id) via the 6-byte-prefix order-
    // preserving string key; the read-back hash match proves the curve
    // rewrite is row-exact (LayoutSpec measures the string-predicate
    // skipping).
    "m30_zorder_string" -> ((s, dir) => {
      val out = s"${tmp("zorderstr")}/docs"
      val d = s.read.parquet(s"$dir/documents.parquet")
        .select("doc_id", "lang", "source", "n_chars")
      graft.operators.Layout.zorderWrite(d, out,
        Seq("lang", "doc_id"), numFiles = 16)
      s.read.parquet(out).select("doc_id", "lang", "source", "n_chars")
    }),

    "m16_zorder_sink" -> ((s, dir) => {
      val out = s"${tmp("zorder")}/li"
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
      graft.operators.Layout.zorderWrite(li, out,
        Seq("l_orderkey", "l_partkey"), numFiles = 16)
      s.read.parquet(out)
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    }))

  // shared by m57 (library-path cursor consumption) and m59 (the same
  // consumption driven as a scheduled DSL job) — the sharing IS m59's
  // claim
  private val feedOracle =
    """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice, CAST(1 AS BIGINT) AS ver,
           'insert' AS _change_type
         FROM orders
         UNION ALL
         SELECT o_orderkey, CAST(year(o_orderdate) AS INT),
           o_totalprice, CAST(1 AS BIGINT), 'delete'
         FROM orders WHERE o_orderkey % 10 = 0
         UNION ALL
         SELECT o_orderkey, CAST(year(o_orderdate) AS INT),
           o_totalprice + 100, CAST(2 AS BIGINT), 'insert'
         FROM orders WHERE o_orderkey % 10 = 0"""

  val oracles: Map[String, String] = Map(
    // the streaming hourly lift shares batch q22's oracle verbatim —
    // that sharing IS the gate's claim (batch ≡ stream)
    "m13_streaming_hourly" -> RelationalQueries.oracles("q22_events_hourly"),
    "m14_compacted_sink" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
        FROM lineitem""",
    // the merge recomputed as SQL: latest version per key over
    // base(ver 1) UNION ALL batch(ver 2), ties impossible by version
    "m15_merge_upsert" ->
      """WITH base AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(1 AS BIGINT) AS ver
           FROM orders),
         batch AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice + 100 AS o_totalprice,
                  CAST(2 AS BIGINT) AS ver
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey + 1000000000 AS o_orderkey, o_orderstatus,
                  o_totalprice, CAST(2 AS BIGINT) AS ver
           FROM orders WHERE o_orderkey % 7 = 0),
         all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM batch)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
             ORDER BY ver DESC) AS rn FROM all_rows)
         WHERE rn = 1""",
    "m16_zorder_sink" ->
      "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM lineitem",
    // the scheduled Zorder node's rewrite must be row-identical — the
    // clustering itself is layout, pinned by the gate's in-plan
    // requires and the spec
    "m49_dsl_zorder_job" ->
      "SELECT l_orderkey, l_partkey, l_suppkey, l_quantity FROM lineitem",
    "m30_zorder_string" ->
      "SELECT doc_id, lang, source, n_chars FROM documents",
    // the manifest CDC apply applies the same change batch as m25, so
    // it shares the oracle — the gate's claim is that the atomic-
    // pointer snapshot path returns exactly what the rename-swap path
    // does, while a concurrently pinned reader keeps the seed
    "m26_manifest_cdc" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM (SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                      ELSE o_totalprice END AS o_totalprice
               FROM orders WHERE o_orderstatus <> 'P')""",
    // after both merges the table is exactly m53's final state, so the
    // synced summary shares its rollup oracle
    "m55_ivm_sync" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CASE WHEN o_orderkey % 10 = 0
                              THEN o_totalprice + 100
                              ELSE o_totalprice END
                    AS DECIMAL(38,6))) AS DOUBLE) AS sum_o_totalprice
         FROM orders WHERE o_orderstatus <> 'P'
         GROUP BY o_orderstatus""",
    // the hierarchical pruned read shares m40's oracle — same window,
    // same merge; the hierarchy is a metadata layout change that must
    // not cost a row
    "m54_manifest_hierarchical" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_orderdate,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders
         WHERE o_orderdate BETWEEN TIMESTAMP '1996-02-01 00:00:00'
           AND TIMESTAMP '1996-04-30 23:59:59'""",
    // the bloom-pruned point lookups must return exactly the merged
    // table's rows for the 5 smallest order keys
    "m51_manifest_bloomskip" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders
         WHERE o_orderkey IN
           (SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 5)""",
    // the change feed recomputed from the batch definition: updated
    // keys contribute a delete(old)+insert(new) pair, deleted keys one
    // delete; a key both status-P and %10==0 was tombstoned, not
    // updated (the update branch excludes P), so it appears once
    "m52_manifest_changes" ->
      """SELECT o_orderkey, o_orderstatus,
           o_totalprice + 100 AS o_totalprice,
           CAST(2 AS BIGINT) AS ver, 'insert' AS _change_type
         FROM orders WHERE o_orderstatus <> 'P' AND o_orderkey % 10 = 0
         UNION ALL
         SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(1 AS BIGINT) AS ver, 'delete' AS _change_type
         FROM orders WHERE o_orderstatus = 'P' OR o_orderkey % 10 = 0""",
    // the incrementally-maintained rollup must equal the GROUP BY over
    // the post-merge table (decimal partials make the fold exact)
    "m53_changes_ivm" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(CASE WHEN o_orderkey % 10 = 0
                              THEN o_totalprice + 100
                              ELSE o_totalprice END
                    AS DECIMAL(38,6))) AS DOUBLE) AS sum_o_totalprice
         FROM orders WHERE o_orderstatus <> 'P'
         GROUP BY o_orderstatus""",
    // merge-on-read resolution recomputed as SQL: ver-3 deletes drop
    // status P, ver-3 +7 wins over ver-2 +100 on keys that are both
    // %7==0 and %10==0, ver-2 inserts ride along untouched
    "m50_manifest_mor" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 7
                  WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 7 = 0 THEN CAST(3 AS BIGINT)
                  WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END AS ver
           FROM orders WHERE o_orderstatus <> 'P'
           UNION ALL
           SELECT o_orderkey + 1000000000 AS o_orderkey, o_orderstatus,
                  o_totalprice, CAST(2 AS BIGINT) AS ver
           FROM orders WHERE o_orderkey % 13 = 0)""",
    // the manifest compaction is row-identical by contract, so the
    // oracle is simply the merged table (seed latest-wins the +100
    // batch) — the gate's in-plan requires pin the compaction-specific
    // claims (pinned snapshot, single-file gens, no-op re-run)
    "m37_manifest_compact" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM (SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                      ELSE o_totalprice END AS o_totalprice
               FROM orders)""",
    // the streaming gap-sessionizer is gated on EXACT session
    // boundaries: every emitted (user, start, end, n) row must equal
    // the batch lag/gap-split's sessions — q23's split rule, rolled up
    // per (user, session id) instead of per user
    "m38_streaming_sessionize" ->
      """SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
         FROM (
           SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM (
             SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
           ) marked
         ) numbered
         GROUP BY user_id, sid""",
    // streamed dropDuplicatesWithinWatermark over the dedup key itself,
    // horizon wider than the data span -> exactly batch DISTINCT
    "m39_streaming_dedup" ->
      "SELECT DISTINCT user_id, event_type FROM events",
    // the pruned read must be EXACT: the merged table restricted to
    // the timestamp window (pruning is an optimization the gate's
    // in-plan require pins separately)
    "m40_manifest_dataskip" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_orderdate,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders
         WHERE o_orderdate BETWEEN TIMESTAMP '1996-02-01 00:00:00'
           AND TIMESTAMP '1996-04-30 23:59:59'""",
    // the conjunction-pruned read must be EXACT: the merged table
    // restricted to the date window AND the key band (pruning is an
    // optimization the gate's in-plan requires pin separately)
    "m48_manifest_multiskip" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(floor(o_orderkey / 2000.0) AS BIGINT) AS o_band,
           o_orderdate,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders
         WHERE o_orderdate BETWEEN TIMESTAMP '1996-02-01 00:00:00'
             AND TIMESTAMP '1996-04-30 23:59:59'
           AND o_orderkey BETWEEN 1000 AND 5000""",
    // auto-skipping is an optimization, never a semantics change: the
    // SQL-view read over the manifest (partition + stats pruning both
    // pinned in-gate) must equal the plain filtered scan
    "m56_manifest_sql_autoskip" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_orderdate, o_totalprice, o_custkey
         FROM orders
         WHERE year(o_orderdate) = 1996
           AND o_orderdate >= TIMESTAMP '1996-03-01 00:00:00'
           AND o_totalprice > 1000.0""",
    // the consumed feed is exactly snapshot + net changes: initial
    // rows as inserts, rewritten keys' old rows as deletes and their
    // new versions as inserts (same +100 arithmetic on both engines)
    "m57_manifest_feed" -> feedOracle,
    // any delta split folds bit-identical to the one-shot GROUP BY:
    // decimal partials are exact integer arithmetic (batch m41 and the
    // streaming lift m42 share the oracle verbatim — that sharing IS
    // the claim)
    "m41_incremental_agg" ->
      """SELECT user_id, event_type, count(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY user_id, event_type""",
    "m42_streaming_incremental_agg" ->
      """SELECT user_id, event_type, count(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY user_id, event_type""",
    // the sketch-IVM booleans are SCALE-INVARIANT guarantees the fold
    // must make TRUE (KMV union byte-lossless + estimate within rsd at
    // any scale; KLL within its rank-error contract — exact below k);
    // the exact columns come straight from the raw table
    "m47_sketch_ivm" ->
      """SELECT event_type, count(*) AS n_rows,
           count(DISTINCT user_id) AS distinct_users,
           TRUE AS kmv_lossless, TRUE AS kmv_within,
           TRUE AS p50_rank_ok, TRUE AS p95_rank_ok,
           TRUE AS kll_merge_rank_ok
         FROM events GROUP BY event_type""",
    // the scheduled consumer job lands exactly what the library-path
    // cursor consumption defines (m57's oracle verbatim — the sharing
    // IS the claim)
    "m59_dsl_feed_job" -> feedOracle,
    // the CDC replica equals the post-merge source: updates applied in
    // order, deleted keys gone (same arithmetic on both engines — a
    // missed delete or a double-applied update breaks the hash)
    "m66_manifest_cdc_replication" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice
             + CASE WHEN o_orderkey % 10 = 0 THEN 100 ELSE 0 END
             + CASE WHEN o_orderkey % 17 = 0 THEN 7 ELSE 0 END
             AS o_totalprice,
           CASE WHEN o_orderkey % 17 = 0 THEN CAST(3 AS BIGINT)
                WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders WHERE o_orderkey % 13 <> 0""",
    // post-drop table: the dropped column gone, every 10th key's
    // post-drop merge applied over pre-drop generations — a read that
    // mis-decodes a pre-drop file (or resurrects the dead column's
    // bytes) breaks the hash; the refusal/time-travel pins live in-gate
    // the post-DDL table: qty renamed to quantity and widened to
    // BIGINT with the SAME values, the dropped note column gone, the
    // UPDATE's ver bump on every 10th key — a mis-aligned old-name or
    // narrow-type file, or a resurrected dropped column, breaks the
    // hash (DESCRIBE/haunted/time-travel pins live in-gate)
    "m80_manifest_sql_ddl" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(o_orderkey % 100 AS BIGINT) AS quantity, o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders""",
    // join + key-grouped agg over the two bucketed tables, with the
    // CoW merge's arithmetic folded in — any row a bucketized write
    // misplaced, dropped or doubled breaks the hash; the
    // exchange-free plan pin lives in-gate
    "m84_manifest_bucketed_join" ->
      """WITH ord AS (
           SELECT o_custkey,
                  CASE WHEN o_orderkey % 10 = 0
                       THEN o_totalprice + 10.0
                       ELSE o_totalprice END AS o_totalprice
           FROM orders)
         SELECT c.c_custkey AS custkey, count(*) AS n_orders,
                CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,6)))
                     AS DOUBLE) AS revenue,
                max(c.c_acctbal) AS acctbal
         FROM customer c JOIN ord o ON c.c_custkey = o.o_custkey
         GROUP BY 1""",
    // post-maintenance table = the plain union of the four slices
    // (disjoint keys, pure-insert deltas): every strand — fold,
    // compact, reap — is row-identical by contract, so ANY row lost,
    // duplicated or altered by the SQL-driven maintenance breaks the
    // hash; the refusal/ledger/file-count pins live in-gate
    "m82_manifest_sql_maintenance" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice, CAST(1 AS BIGINT) AS ver
         FROM orders""",
    // the mixed-spec table read through the per-era union: seed +
    // every-7th-key merge (old era), synthetic 2100-year rows (new
    // era), every 1995 row updated by the MIGRATING merge — a
    // migration that loses the landing partition's existing rows,
    // double-serves a migrated row, or mis-reads either era's
    // partition values from the wrong place breaks the hash; the
    // zero-file-moved / per-era pruning / feed / refusal pins live
    // in-gate
    // the post-DML, post-drain table: UPDATE (+100 on the min year),
    // DELETE (every 5th key of min+1), MERGE (matched doubles every
    // 3rd key of min+2; synthetic inserts), then the budgeted
    // migration drain — which must be row-identical, so the same
    // SELECT covers it
    "m83_manifest_sql_dml_mixed" ->
      """SELECT o_orderkey, o_year, o_band, o_totalprice, ver FROM (
           SELECT b.o_orderkey, b.o_year, b.o_band,
             CASE WHEN b.o_year = y.y0 THEN b.o_totalprice + 100
                  WHEN b.o_year = y.y0 + 2 AND b.o_orderkey % 3 = 0
                    THEN b.o_totalprice * 2
                  ELSE b.o_totalprice END AS o_totalprice,
             CASE WHEN b.o_year = y.y0 THEN CAST(3 AS BIGINT)
                  WHEN b.o_year = y.y0 + 2 AND b.o_orderkey % 3 = 0
                    THEN CAST(4 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END AS ver
           FROM (
             SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS o_year,
               CAST(o_orderkey % 8 AS BIGINT) AS o_band,
               o_totalprice
             FROM orders) b,
             (SELECT min(year(o_orderdate)) AS y0 FROM orders) y
           WHERE NOT (b.o_year = y.y0 + 1 AND b.o_orderkey % 5 = 0)
           UNION ALL
           SELECT o_orderkey + 20000000,
             CAST(2100 AS INT) AS o_year,
             CAST((o_orderkey + 20000000) % 8 AS BIGINT) AS o_band,
             o_totalprice * 3 AS o_totalprice,
             CAST(4 AS BIGINT) AS ver
           FROM orders WHERE o_orderkey % 97 = 0
         )""",
    "m81_manifest_spec_evolution" ->
      """SELECT o_orderkey, o_year, o_band, o_totalprice, ver FROM (
           SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(o_orderkey % 8 AS BIGINT) AS o_band,
             CASE WHEN year(o_orderdate) =
                    (SELECT min(year(o_orderdate)) FROM orders)
                  THEN o_totalprice + 100 ELSE o_totalprice
             END AS o_totalprice,
             CASE WHEN year(o_orderdate) =
                    (SELECT min(year(o_orderdate)) FROM orders)
                  THEN CAST(3 AS BIGINT)
                  WHEN o_orderkey % 7 = 0 THEN CAST(2 AS BIGINT)
                  ELSE CAST(1 AS BIGINT) END AS ver
           FROM orders
           UNION ALL
           SELECT o_orderkey + 10000000,
             CAST(2100 AS INT) AS o_year,
             CAST((o_orderkey + 10000000) % 8 AS BIGINT) AS o_band,
             o_totalprice * 2 AS o_totalprice,
             CAST(2 AS BIGINT) AS ver
           FROM orders WHERE o_orderkey % 97 = 0
         )""",
    // the v1..v3 append window is exactly the two delta slices — a
    // feed that leaked seed rows, dropped a delta, or double-emitted
    // breaks the hash; the history/diff-agreement pins live in-gate
    "m79_manifest_sql_tvf" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice, CAST(1 AS BIGINT) AS ver
         FROM orders WHERE o_orderkey % 3 <> 0""",
    // "as of the last publish" equals the live table: seed + the
    // every-10th-key merge — a mis-resolved instant (off-by-one
    // version either way) breaks the hash; the between-publishes /
    // too-early / option-parity pins live in-gate
    "m78_manifest_timestamp_travel" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders""",
    // the reconciled table: every even key upserted (+50, ver 2 —
    // inserted where the seed lacked it), odd seed rows NOT in the
    // source deleted when pre-1996 else flagged ver 99 — a row that
    // dodged its NMBS clause (or a matched row that took one) breaks
    // the hash; the one-publish pin lives in-gate
    "m77_manifest_merge_nmbs" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice + 50 AS o_totalprice, CAST(2 AS BIGINT) AS ver
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice, CAST(99 AS BIGINT) AS ver
         FROM orders
         WHERE o_orderkey % 2 = 1 AND o_orderkey % 13 <> 0
           AND year(o_orderdate) >= 1996""",
    "m76_manifest_drop_column" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders""",
    // the one-statement CDC application: every 10th key updated,
    // every 13th-not-10th gone, every 11th re-inserted under key+2e9 —
    // a dropped clause, a double-applied half, or a mis-classified
    // matched/not-matched row breaks the hash (the ONE-publish pin
    // lives in-gate)
    "m75_manifest_sql_merge" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders
         WHERE NOT (o_orderkey % 13 = 0 AND o_orderkey % 10 <> 0)
         UNION ALL
         SELECT o_orderkey + 2000000000 AS o_orderkey,
           CAST(year(o_orderdate) AS INT) AS o_year, o_totalprice,
           CAST(2 AS BIGINT) AS ver
         FROM orders WHERE o_orderkey % 11 = 0""",
    // the catalog-registered table after the fresh-session DML
    // lifecycle: INSERT's +100 on every 10th key, UPDATE's further +1
    // and ver 3 on every 20th, DELETE's 13th keys gone — a stale
    // cached snapshot, a dropped publish, or a mis-resolved stored
    // merge spec each break the hash (DESCRIBE/time-travel/publish-
    // count pins live in-gate)
    "m74_manifest_catalog" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice
             + CASE WHEN o_orderkey % 10 = 0 THEN 100 ELSE 0 END
             + CASE WHEN o_orderkey % 20 = 0 THEN 1 ELSE 0 END
             AS o_totalprice,
           CASE WHEN o_orderkey % 20 = 0 THEN CAST(3 AS BIGINT)
                WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders WHERE o_orderkey % 13 <> 0""",
    // the concurrent interleaving equals the sequential application:
    // seed slice + three delta slices partition the key space, the
    // compaction is row-identical (a dropped rebase or a double
    // publish breaks the hash; the version-count pin lives in-gate)
    "m73_manifest_concurrent_commits" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice, CAST(o_orderkey % 4 + 1 AS BIGINT) AS ver
         FROM orders""",
    // the append-only table is exactly the union of its batches (the
    // four slices partition the key space; a lost or double-applied
    // append breaks the hash)
    "m72_manifest_append_only" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice
         FROM orders""",
    // the post-DML table: the UPDATE's arithmetic applied to every
    // 10th key, the DELETE's keys gone — a lost tombstone or a
    // double-applied update breaks the hash
    "m71_manifest_sql_mutation" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders WHERE o_orderkey % 13 <> 0""",
    // post-evolution table: widened qty carries the same values as
    // BIGINT, the renamed price carries the merge arithmetic — a
    // mis-aligned old-name/narrow-type file breaks the hash
    "m70_manifest_evolution" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(o_orderkey % 100 AS BIGINT) AS qty,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS price,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders""",
    // the key window is exact despite file-level pruning (the scan
    // metric pin lives in-gate; a wrongly-pruned file loses rows and
    // breaks this hash)
    "m69_manifest_fileskip" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice
         FROM orders
         WHERE o_orderkey <= (SELECT max(o_orderkey) FROM orders) // 8""",
    // the chunked backfill reassembles exactly the post-CDC snapshot
    // and then follows the diff — same arithmetic as m66 (the chunk
    // boundaries and the mid-snapshot kill are pinned in-gate; any
    // dropped or double-applied chunk breaks this hash)
    "m68_manifest_chunked_backfill" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice
             + CASE WHEN o_orderkey % 10 = 0 THEN 100 ELSE 0 END
             + CASE WHEN o_orderkey % 17 = 0 THEN 7 ELSE 0 END
             AS o_totalprice,
           CASE WHEN o_orderkey % 17 = 0 THEN CAST(3 AS BIGINT)
                WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders WHERE o_orderkey % 13 <> 0""",
    // the replica is exactly the source table (seed slice + two
    // streamed delta slices partition the key space; same arithmetic
    // on both engines)
    "m65_manifest_replication" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice, CAST(o_orderkey % 3 + 1 AS BIGINT) AS ver
         FROM orders""",
    // a partition-spec change is a re-layout, never a semantics
    // change: the re-partitioned table is exactly the source rows
    // (delta fold included); the pruning and time-travel pins live
    // in-gate
    "m64_manifest_repartition" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(o_orderkey % 8 AS BIGINT) AS o_band,
           o_totalprice,
           CASE WHEN o_orderkey % 7 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders""",
    // the standing summary at the end of the loop equals the one-shot
    // GROUP BY over the full source table — every stage's exactly-once
    // marker is load-bearing (a replayed fold or re-emitted feed row
    // breaks the hash)
    "m63_feed_ivm_loop" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           count(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_totalprice
         FROM orders GROUP BY 1""",
    // the SQL INSERT landed as ONE keyed merge: every 10th key carries
    // the re-arrived price/version, everything else the seed's (the
    // single-publish + time-travel pins live in-gate)
    "m67_manifest_sql_dml" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders""",
    // the DDL-mounted live view is exactly the post-merge table (time
    // travel and pruning pins live in-gate)
    "m62_manifest_ddl" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM orders""",
    // runtime join-driven pruning is an optimization, never a
    // semantics change: the star join reduces to the dim filter's
    // year arithmetic (both pruning pins live in-gate)
    "m60_manifest_dpp" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice, o_custkey
         FROM orders WHERE year(o_orderdate) % 3 = 0""",
    // the drained stream is exactly the table: seed slice + three
    // delta slices partition the key space, the mid-feed fold adds
    // nothing (same ver arithmetic on both engines)
    "m61_streaming_manifest_feed" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS o_year,
           o_totalprice, CAST(o_orderkey % 4 + 1 AS BIGINT) AS ver
         FROM orders""",
    // the cursor-driven sketch sync reproduces m47's claims over the
    // append-only table: counts and distincts exact, every boolean a
    // scale-invariant sketch-contract guarantee (see m47)
    "m58_sketch_ivm_sync" ->
      """SELECT o_orderstatus, count(*) AS n_rows,
           count(DISTINCT o_custkey) AS distinct_cust,
           TRUE AS kmv_lossless, TRUE AS kmv_within,
           TRUE AS p50_rank_ok, TRUE AS p95_rank_ok,
           TRUE AS kll_merge_rank_ok
         FROM orders GROUP BY o_orderstatus""",
    // the stateless streaming lifts share their batch twins' oracles
    // verbatim — that sharing IS each gate's claim (pure projections /
    // stream-static broadcast filters: batch ≡ stream by construction)
    "m43_streaming_chunk" -> CurationQueries.oracles("t12_chunking"),
    "m44_streaming_calibrated" ->
      CurationQueries.oracles("t16_calibrated_quality"),
    "m45_streaming_temperature" ->
      CurationQueries.oracles("p07_temperature_mix"),
    "m46_streaming_lm_fit" -> CurationQueries.oracles("t13_lm_fit"),
    "m25_cdc_partitioned" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
           CASE WHEN o_orderkey % 10 = 0 THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS ver
         FROM (SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100
                      ELSE o_totalprice END AS o_totalprice
               FROM orders WHERE o_orderstatus <> 'P')""",
    // the generational merge applies the same latest-wins batch as m15,
    // so it shares the same oracle — the gate's claim is that the
    // pointer-swap read path returns exactly what the rename-swap path
    // does
    "m24_generational_merge" ->
      """WITH base AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(1 AS BIGINT) AS ver
           FROM orders),
         batch AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice + 100 AS o_totalprice,
                  CAST(2 AS BIGINT) AS ver
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey + 1000000000 AS o_orderkey, o_orderstatus,
                  o_totalprice, CAST(2 AS BIGINT) AS ver
           FROM orders WHERE o_orderkey % 7 = 0),
         all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM batch)
         SELECT o_orderkey, o_orderstatus, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
             ORDER BY ver DESC) AS rn FROM all_rows)
         WHERE rn = 1""",
    // the windowed-sketch streaming lifts share their batch twins'
    // oracles verbatim — that sharing IS each gate's claim: the
    // continuously-landed per-window sketches reconstruct exactly what
    // one batch pass over the same rows computes
    // q46's BETWEEN-join arithmetic over the subsampled window set —
    // the stream-static binned join must enrich exactly the rows the
    // batch range predicate selects
    "m32_streaming_range_enrich" ->
      """SELECT o.o_orderkey, count(*) AS n_items,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
           AS sum_price
         FROM orders o JOIN lineitem l
           ON CAST(epoch(l.l_shipdate) AS BIGINT)
                BETWEEN CAST(epoch(o.o_orderdate) AS BIGINT)
                    AND CAST(epoch(o.o_orderdate) AS BIGINT) + 259200
         WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderkey % 20 = 0
         GROUP BY o.o_orderkey""",
    // the streaming classifier lift shares batch c11's oracle verbatim
    // — coefficients-as-literals scoring must distill identically on
    // the stream
    "m36_streaming_quality_score" ->
      CurationQueries.oracles("c11_quality_classifier"),
    // the streaming boilerplate filter shares batch t20's oracle
    // verbatim — the calibrated-set HOF projection must equal the
    // batch explode/count/rebuild
    "m35_streaming_boilerplate" ->
      CorpusQueries.oracles("t20_line_boilerplate"),
    // the stream-stream attribution join shares batch q47's oracle
    // verbatim — the continuous two-stream join must produce exactly
    // the batch BETWEEN-join's multiplicities
    "m34_stream_stream_attribution" ->
      RelationalQueries.oracles("q47_keyed_range_join"),
    "m27_streaming_sketch_window" ->
      RelationalQueries.oracles("q50_sketch_cube"),
    "m28_streaming_topkeys_window" ->
      RelationalQueries.oracles("q51_heavy_hitters"),
    "m29_streaming_quantile_window" ->
      RelationalQueries.oracles("q55_quantile_sketch"),
    // the streaming resample lift shares batch q53's oracle verbatim —
    // that sharing IS the gate's claim (batch ≡ stream on the closed
    // grid, which the sentinel drain makes the WHOLE grid)
    "m18_streaming_resample" -> RelationalQueries.oracles("q53_resample_ffill"),
    "m19_streaming_resample_interp" ->
      RelationalQueries.oracles("q56_resample_interp"),
    "m20_singlefile_append" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
         FROM lineitem""",
    "m22_singlefile_json" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    "m23_singlefile_xml" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""",
    // the all-pairs scoring half of t18's oracle (no top-k: ranking a
    // stream is a bounded aggregation done downstream of the sink) —
    // sharing the arithmetic IS the gate's batch ≡ stream claim
    "m21_streaming_bm25" ->
      """WITH q(query_id, qtext) AS (VALUES
           (CAST(1 AS BIGINT), 'spark join window'),
           (CAST(2 AS BIGINT), 'fast hash merge batch'),
           (CAST(3 AS BIGINT), 'slow scan filter vector')),
         qt AS (SELECT query_id AS qid,
                  unnest(list_distinct(regexp_split_to_array(
                    lower(trim(qtext)), '\s+'))) AS term FROM q),
         dlen AS (SELECT doc_id AS doc,
                    len(regexp_split_to_array(lower(trim(text)), '\s+'))
                      AS len FROM documents),
         stats AS (SELECT count(*) AS n, sum(len) AS s FROM dlen),
         dtok AS (SELECT doc_id AS doc,
                    unnest(regexp_split_to_array(lower(trim(text)), '\s+'))
                      AS term FROM documents),
         tf AS (SELECT doc, term, count(*) AS tf FROM dtok
                WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
         dft AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         w AS (SELECT qt.qid, tf.doc,
                 ((CAST(stats.n AS DOUBLE) - CAST(dft.df AS DOUBLE) + 0.5)
                    / (CAST(dft.df AS DOUBLE) + 0.5))
                 * ((CAST(tf.tf AS DOUBLE) * (1.2 + 1.0))
                    / (CAST(tf.tf AS DOUBLE) + 1.2 * ((1.0 - 0.75) + 0.75
                       * (CAST(dlen.len AS DOUBLE)
                          / (CAST(stats.s AS DOUBLE)
                             / CAST(stats.n AS DOUBLE)))))) AS w
               FROM qt JOIN tf USING (term) JOIN dft USING (term)
                 JOIN dlen ON dlen.doc = tf.doc, stats)
         SELECT qid, doc AS doc_id,
           CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS score,
           count(*) AS n_terms
         FROM w GROUP BY 1, 2""",
    "m17_cdc_apply" ->
      """WITH base AS (
           SELECT o_orderkey, o_totalprice, CAST(1 AS BIGINT) AS ver,
                  FALSE AS del FROM orders),
         batch AS (
           SELECT o_orderkey, o_totalprice + 100 AS o_totalprice,
                  CAST(2 AS BIGINT) AS ver, FALSE AS del
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey, o_totalprice, CAST(2 AS BIGINT), TRUE
           FROM orders WHERE o_orderkey % 13 = 0 AND o_orderkey % 10 <> 0
           UNION ALL
           SELECT o_orderkey + 2000000000, o_totalprice,
                  CAST(2 AS BIGINT), FALSE
           FROM orders WHERE o_orderkey % 11 = 0),
         all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM batch)
         SELECT o_orderkey, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
             ORDER BY ver DESC) AS rn FROM all_rows)
         WHERE rn = 1 AND NOT del""",
    "m01_csv_pipeline" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        FROM lineitem""",
    "m02_json_pipeline" ->
      "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
    "m03_xml_pipeline" ->
      """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        CAST(n_regionkey AS BIGINT) AS n_regionkey FROM nation""",
    "m11_sharded_write" ->
      "SELECT doc_id, lang, n_chars FROM documents",
    "m10_orc_pipeline" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
        CAST(s_nationkey AS BIGINT) AS s_nationkey,
        CAST(s_acctbal AS DOUBLE) AS s_acctbal FROM supplier""",
    "m04_jdbc_table" ->
      "SELECT c_custkey, c_name, c_acctbal FROM customer",
    "m05_select_window" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
          AND TIMESTAMP '1995-12-31 23:59:59'""",
    "m06_insert_select" ->
      """SELECT o_orderkey, o_totalprice, CAST(42 AS BIGINT) AS pd_process_id
        FROM orders""",
    "m07_etl_window_keystamp" ->
      """SELECT l_orderkey, l_linenumber, upper(l_returnflag) AS flag,
        l_quantity, CAST(11 AS BIGINT) AS pd_process_id
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1995-06-01 00:00:00'
          AND TIMESTAMP '1995-06-30 23:59:59'""",
    "m09_bucketed_join" ->
      """SELECT o_orderkey, max(o_totalprice) AS o_totalprice,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        count(*) AS n
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey""",
    // DuckDB can list + stat the very same files via read_blob; the
    // {SF_DIR} template resolves at dump time (SparkEntry.oracleSqlFor),
    // so the oracle follows whatever SF the verify run reads
    "m08_filenames" ->
      """SELECT regexp_extract(filename, '[^/]+$') AS file,
        true AS is_file, size
        FROM read_blob('{SF_DIR}/*.parquet')""",
    "m12_scripted_job" ->
      """SELECT r_regionkey, r_name, '1995-06-15' AS run_date FROM region""",
    // the m15 latest-wins recomputation without the partition column —
    // the DSL node must apply exactly what the library call applies
    "m33_dsl_merge_job" ->
      """WITH base AS (
           SELECT o_orderkey, o_totalprice, CAST(1 AS BIGINT) AS ver
           FROM orders),
         batch AS (
           SELECT o_orderkey, o_totalprice + 100 AS o_totalprice,
                  CAST(2 AS BIGINT) AS ver
           FROM orders WHERE o_orderkey % 10 = 0
           UNION ALL
           SELECT o_orderkey + 1000000000 AS o_orderkey, o_totalprice,
                  CAST(2 AS BIGINT) AS ver
           FROM orders WHERE o_orderkey % 7 = 0),
         all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM batch)
         SELECT o_orderkey, o_totalprice, ver FROM (
           SELECT *, row_number() OVER (PARTITION BY o_orderkey
             ORDER BY ver DESC) AS rn FROM all_rows)
         WHERE rn = 1""")
}
