package graft.models

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core._

/** Table/Select/Insert/Sql models + ledger against embedded Derby —
  * the JDBC surface of SURVEY.md §2.3 plus M1/M2 semantics (HWM,
  * recycle, key stamping) from §2.8/§4.
  */
class JdbcModelsSpec extends SparkSpec {

  private val db = DatabaseSource("testdb",
    url = "jdbc:derby:memory:grafttest;create=true",
    driver = Some("org.apache.derby.iapi.jdbc.AutoloadedDriver"))

  private def ctx(runId: Long = 1L) =
    StepContext(spark, Calendar.day("2023-01-01"), runId)

  private def exec(sql: String): Unit = {
    val c = db.connect()
    try { c.createStatement().executeUpdate(sql); () } finally c.close()
  }
  private def tryExec(sql: String): Unit =
    try exec(sql) catch { case _: java.sql.SQLException => }

  override def beforeAll(): Unit = {
    super.beforeAll()
    tryExec("drop table src_t")
    tryExec("drop table tgt_t")
    exec("create table src_t (id int, name varchar(40), amount double)")
    (1 to 10).foreach(i =>
      exec(s"insert into src_t values ($i, 'name_$i', ${i * 10.5})"))
  }

  test("SqlModel executes DDL/DML scripts and counts affected rows") {
    val r = SqlModel(db, text = Some(
      """create table tgt_t (id int, name varchar(40), amount double,
         pd_process_id bigint);
         insert into tgt_t (id, name, amount) values (0, 'seed', 0.0);
         delete from tgt_t where id = 0""")).execute(ctx())
    assert(r.resultValue.contains(2L)) // 1 insert + 1 delete; DDL counts 0
  }

  test("SqlScript.split is literal- and comment-aware") {
    // plain split
    assert(SqlScript.split("a; b ;c") == Seq("a", "b", "c"))
    // ';' inside string literals and quoted identifiers does not split
    assert(SqlScript.split("insert into t values ('a;b'); delete from t") ==
      Seq("insert into t values ('a;b')", "delete from t"))
    assert(SqlScript.split("""select "x;y" from t; select 1""") ==
      Seq("""select "x;y" from t""", "select 1"))
    // doubled-quote escape stays inside the literal
    assert(SqlScript.split("select 'it''s; fine'; select 2") ==
      Seq("select 'it''s; fine'", "select 2"))
    // comments: line and block (incl. vendor hint passthrough)
    assert(SqlScript.split("select 1 -- trailing; not a split\n; select 2") ==
      Seq("select 1 -- trailing; not a split", "select 2"))
    assert(SqlScript.split("select /* a;b */ 1; select /*+ parallel */ 2") ==
      Seq("select /* a;b */ 1", "select /*+ parallel */ 2"))
    // empty/whitespace statements drop
    assert(SqlScript.split(";;  ;") == Seq.empty)
  }

  test("SqlModel splits on semicolons inside a PL-ish block body correctly") {
    val r = SqlModel(db, text = Some(
      """insert into src_t values (91, 'semi;colon', 1.0);
         delete from src_t where name = 'semi;colon'""")).execute(ctx())
    assert(r.resultValue.contains(2L)) // one insert + one delete, not 3 frags
  }

  test("TableModel reads through Spark JDBC with typed schema") {
    val df = TableModel(db, "src_t").extract(ctx())
    assert(df.count() == 10)
    assert(df.schema("ID").dataType.typeName == "integer")
    assert(df.filter(col("ID") === 3).select("NAME").collect()(0).getString(0) == "name_3")
  }

  test("SelectModel runs a query with {variable} templating") {
    val m = SelectModel(db,
      text = Some("select id, amount from src_t where id > {min_id}"))
    val df = m.extract(StepContext(spark, Calendar.day("2023-01-01"), 1L,
      variables = Map("min_id" -> "7")))
    assert(df.count() == 3)
  }

  test("Table load with key stamping; recycle deletes by key (idempotent rerun)") {
    val tgt = TableModel(db, "tgt_t",
      knobs = ModelKnobs(keyField = Some(KeyField.ProcessId)))
    val src = SelectModel(db, text = Some("select * from src_t"))
    val p = Pipeline(src, Mapper(df => df
      .select(col("ID").as("id"), col("NAME").as("name"), col("AMOUNT").as("amount"))), tgt)

    assert(p.run(spark, Calendar.day("2023-01-01"), runId = 41L).status == Status.Done)
    assert(tgt.rowCount() == 10)
    // run again with a DIFFERENT run id -> appends
    assert(p.run(spark, Calendar.day("2023-01-01"), runId = 42L).status == Status.Done)
    assert(tgt.rowCount() == 20)
    // recycle run 42, then repeat it: no duplicates
    p.recycle(spark, Calendar.day("2023-01-01"), 42L)
    assert(tgt.rowCount() == 10)
    assert(p.run(spark, Calendar.day("2023-01-01"), runId = 42L).status == Status.Done)
    assert(tgt.rowCount() == 20)
  }

  test("InsertModel: DB-side insert-select with key column and HWM probe") {
    exec("delete from tgt_t")
    val ins = InsertModel(db, "tgt_t",
      select = Some("select id, name, amount from src_t"),
      knobs = ModelKnobs(keyField = Some(KeyField.ProcessId),
        valueField = Some("id")))
    // empty target -> max(id) is NULL -> no HWM predicate -> full copy
    val r1 = ins.execute(ctx(runId = 7L))
    assert(r1.resultValue.contains(10L))
    // second run: HWM = max(id) = 10 -> nothing new
    val r2 = ins.execute(ctx(runId = 8L))
    assert(r2.resultValue.contains(0L))
    // add source rows beyond the HWM -> only they flow
    exec("insert into src_t values (11, 'name_11', 115.5)")
    val r3 = ins.execute(ctx(runId = 9L))
    assert(r3.resultValue.contains(1L))
    // key column stamped
    val stamped = TableModel(db, "tgt_t").extract(ctx())
      .filter(col("PD_PROCESS_ID") === 9L).count()
    assert(stamped == 1L)
    exec("delete from src_t where id = 11")
  }

  test("HWM via targetValue on an extract (pushed-down filter)") {
    val m = TableModel(db, "src_t", knobs = ModelKnobs(
      valueField = Some("ID"), targetValue = Some(5)))
    assert(m.extract(ctx()).count() == 5) // ids 6..10
  }

  test("JdbcLedger writes run/task/step/query/file history rows") {
    val ledger = Ledger.jdbc(db)
    val runId = ledger.startRun(jobId = 3L, tag = 1672531200L)
    assert(runId > 0)
    assert(ledger.runStatus(runId).contains(Status.Started))

    val c = ctx(runId)
    val src = ParquetModel(sf("region").stripSuffix(".parquet") + ".parquet")
    val sink = CsvModel(java.nio.file.Files.createTempDirectory("led").toString + "/o")
    val p = Pipeline.withLedger("ledgered", ledger, src, sink)
    val task = new Task(p, ledger)
    assert(task.run(c) == Status.Done)

    ledger.endRun(runId, Status.Done, Some("""{"k":1}"""))
    assert(ledger.runStatus(runId).contains(Status.Done))

    val conn = db.connect()
    try {
      val rs = conn.createStatement().executeQuery(
        s"select count(*) from pd_task_history where run_id = $runId and status = 'D'")
      rs.next(); assert(rs.getLong(1) == 1)
      val rs2 = conn.createStatement().executeQuery(
        s"select records_read, records_written, status from pd_step_history where run_id = $runId")
      assert(rs2.next())
      assert(rs2.getLong(1) == 5 && rs2.getLong(2) == 5 && rs2.getString(3) == "D")
      ledger.logQuery(c, "SelectModel", "select 1", 1, Status.Done, None)
      ledger.logFile(c, "CsvModel", "o.csv", "/tmp/o.csv", 42, "write")
      val rs3 = conn.createStatement().executeQuery(
        "select count(*) from pd_query_log"); rs3.next()
      assert(rs3.getLong(1) >= 1)
    } finally conn.close()
  }

  test("SqlModel and FileManager write query-log/file-log rows via the context") {
    val ledger = Ledger.jdbc(db)
    val c = StepContext(spark, Calendar.day("2023-01-01"), runId = 777L,
      ledger = ledger)
    // successful script -> status D row with affected-row count
    SqlModel(db, text = Some(
      "insert into src_t values (99, 'logged', 1.0); delete from src_t where id = 99"))
      .execute(c)
    // failing script -> status E row, exception still propagates
    intercept[java.sql.SQLException] {
      SqlModel(db, text = Some("select * from table_that_does_not_exist"))
        .execute(c)
    }
    val conn = db.connect()
    try {
      val rs = conn.createStatement().executeQuery(
        "select status, output_rows from pd_query_log where run_id = 777 order by id")
      assert(rs.next()); assert(rs.getString(1) == "D" && rs.getLong(2) == 2)
      assert(rs.next()); assert(rs.getString(1) == "E" && rs.getLong(2) == -1)
    } finally conn.close()

    // FileManager logs one row per transferred file
    val dir = java.nio.file.Files.createTempDirectory("flog").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "f.bin"),
      Array.fill[Byte](10)(1))
    FileManagerModel(dir, action = "copy", mask = Some("\\.bin$"),
      destinations = Seq(dir + "/out")).execute(c)
    val conn2 = db.connect()
    try {
      val rs = conn2.createStatement().executeQuery(
        """select file_name, bytes, file_action from pd_file_log
          where run_id = 777""")
      assert(rs.next())
      assert(rs.getString(1) == "f.bin" && rs.getLong(2) == 10
        && rs.getString(3) == "copy")
    } finally conn2.close()
  }

  test("FileManager copy/move with no destinations fails fast (no silent delete)") {
    val dir = java.nio.file.Files.createTempDirectory("fmguard").toString
    val f = java.nio.file.Paths.get(dir, "keep.bin")
    java.nio.file.Files.write(f, Array.fill[Byte](4)(1))
    // a 'move' with the default empty destinations must NOT delete sources
    intercept[IllegalArgumentException] {
      FileManagerModel(dir, action = "move").execute(ctx())
    }
    intercept[IllegalArgumentException] {
      FileManagerModel(dir, action = "copy").execute(ctx())
    }
    assert(java.nio.file.Files.exists(f)) // source survived
  }

  test("recycleRun: revoke + history C + rerun under the same run id") {
    val ledger = Ledger.jdbc(db)
    exec("delete from tgt_t")
    val tgt = TableModel(db, "tgt_t",
      knobs = ModelKnobs(keyField = Some(KeyField.ProcessId)))
    val src = SelectModel(db, text = Some("select * from src_t"))
    val p = Pipeline.withLedger("recyclable", ledger, src,
      Mapper(df => df.select(col("ID").as("id"), col("NAME").as("name"),
        col("AMOUNT").as("amount"))), tgt)
    val runId = ledger.startRun(jobId = 55L, tag = 1672531200L)
    assert(p.run(spark, Calendar.day("2023-01-01"), runId).status == Status.Done)
    ledger.endRun(runId, Status.Done, Some("""{"hwm": 10}"""))
    val n0 = tgt.rowCount()
    // recycle-rerun: same run id, no duplicates, prior history row -> C
    val task = p.recycleRun(spark, Calendar.day("2023-01-01"), runId)
    assert(task.status == Status.Done)
    assert(tgt.rowCount() == n0)
    assert(ledger.runStatus(runId).contains(Status.Canceled))
    // data dump readback (cross-run state inheritance)
    assert(ledger.runData(runId).contains("""{"hwm": 10}"""))
    assert(ledger.lastRun(55L).exists(_._2 == 1672531200L))
  }

  test("SourceRegistry INI heuristic: database vs filesystem sections") {
    val ini = java.nio.file.Files.createTempFile("sources", ".ini")
    java.nio.file.Files.write(ini,
      """# sources
        [warehouse]
        url = jdbc:derby:memory:x
        username = app
        password = secret
        vendor_name = derby

        [landing]
        protocol = file
        host = localhost
        root = /data/landing
        """.stripMargin.getBytes)
    val reg = new SourceRegistry().loadIni(ini.toFile)
    assert(reg.names == Seq("landing", "warehouse"))
    val wh = reg.database("warehouse")
    assert(wh.url == "jdbc:derby:memory:x" && wh.user.contains("app"))
    assert(reg.get("landing").isInstanceOf[FileSystemSource])
  }

  test("Oracle vendor hints: parallel on SELECT, append on INSERT, inert elsewhere") {
    // keyword scan skips literals and comments (models.py:921-936)
    assert(SqlHints.hintinize(
      "select c from t where x = 'select'", "oracle", parallel = 4) ==
      "select /*+ parallel(4) */ c from t where x = 'select'")
    assert(SqlHints.hintinize(
      "-- select nothing\nselect c from t", "oracle", parallel = 1) ==
      "-- select nothing\nselect /*+ parallel */ c from t")
    // degree 0 and non-oracle vendors pass through untouched
    assert(SqlHints.hintinize("select 1", "oracle") == "select 1")
    assert(SqlHints.hintinize("select 1", "derby", parallel = 8) == "select 1")

    // InsertModel emits both hints in the composed statement
    val ora = DatabaseSource("ora", "jdbc:oracle:thin:@db:1521/x")
    assert(SqlHints.vendorOf(ora) == "oracle")
    val ins = InsertModel(ora, "tgt", select = Some("select c from src"),
      parallel = 8, appendHint = true)
    val stmt = ins.statement(StepContext(spark, Calendar.day("2023-01-01")))
    assert(stmt == "insert /*+ append */ into tgt select /*+ parallel(8) */ c from src")
    // hints stay inert on the embedded-Derby test source
    val derby = InsertModel(db, "tgt", select = Some("select c from src"),
      parallel = 8, appendHint = true)
    assert(derby.statement(StepContext(spark, Calendar.day("2023-01-01")))
      == "insert into tgt select c from src")
  }
}
