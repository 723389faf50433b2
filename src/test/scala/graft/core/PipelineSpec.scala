package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.models._

class PipelineSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_pipe").toString

  test("step compilation: E->T->L, E->L, EX, branching") {
    val e = ParquetModel(sf("orders").stripSuffix(".parquet") + ".parquet")
    val t = Mapper()
    val l = CsvModel(tmp() + "/out")
    val etl = Pipeline(e, t, l)
    assert(etl.steps.map(_.stepType) == Seq(StepType.ETL))
    assert(etl.roots.size == 1)

    val el = Pipeline(e, l)
    assert(el.steps.map(_.stepType) == Seq(StepType.EL))

    val sql = FileManagerModel(tmp(), action = "delete")
    val ex = Pipeline(sql)
    assert(ex.steps.map(_.stepType) == Seq(StepType.EX))

    // branch: e fans out to two sinks -> two EL steps, both roots
    val l2 = JsonModel(tmp() + "/out2")
    val branched = Pipeline(e, Branch(Seq(Seq(One(l)), Seq(One(l2)))))
    assert(branched.steps.map(_.stepType) == Seq(StepType.EL, StepType.EL))
    assert(branched.roots.size == 2)
  }

  test("EX step joins after the preceding step (resume ordering)") {
    val dir = tmp()
    val e = ParquetModel(sf("region").stripSuffix(".parquet") + ".parquet")
    val l = CsvModel(dir + "/csv_out")
    val fm = FileManagerModel(dir + "/csv_out", action = "copy",
      destinations = Seq(dir + "/copied"), mask = Some("\\.csv$"))
    val p = Pipeline(e, l, fm)
    assert(p.steps.size == 2)
    assert(p.roots.size == 1)
    assert(p.roots.head.stepType == StepType.EL)
    assert(p.roots.head.successors.map(_.stepType).toSeq == Seq(StepType.EX))

    val task = p.run(spark, Calendar.day("2023-01-01"), runId = 7L)
    assert(task.status == Status.Done)
    // the copy ran after the write: copied dir contains the csv part file
    val copied = new java.io.File(dir + "/copied").listFiles()
    assert(copied != null && copied.exists(_.getName.endsWith(".csv")))
  }

  test("E->T->L executes with metrics, key stamping and date window") {
    val dir = tmp()
    val e = ParquetModel(sf("lineitem").stripSuffix(".parquet") + ".parquet",
      knobs = ModelKnobs(dateField = Some("l_shipdate")))
    val m = Mapper(df => df.select(col("l_orderkey"), col("l_quantity"),
      col("l_shipdate")))
    val l = ParquetModel(dir + "/out",
      knobs = ModelKnobs(keyField = Some(KeyField.ProcessId)))
    val task = Pipeline(e, m, l).run(spark,
      Calendar.day("1995-06-15").month, runId = 99L)
    assert(task.status == Status.Done)

    val out = spark.read.parquet(dir + "/out")
    assert(out.columns.toSeq ==
      Seq("l_orderkey", "l_quantity", "l_shipdate", "pd_process_id"))
    assert(out.select("pd_process_id").distinct().collect().map(_.getLong(0)).toSeq == Seq(99L))
    // date window: only June 1995 rows
    val expected = spark.read.parquet(sf("lineitem"))
      .filter(col("l_shipdate").between("1995-06-01", "1995-06-30 23:59:59"))
      .count()
    assert(out.count() == expected && expected > 0)
    // observed metrics flowed into the task ledger totals
    assert(task.totals.recordsRead == expected)
    assert(task.totals.recordsWritten == expected)
  }

  test("failing step marks task E and skips successors") {
    val dir = tmp()
    val e = ParquetModel(dir + "/does_not_exist") // read fails
    val l = CsvModel(dir + "/never")
    val fm = FileManagerModel(dir, action = "delete", mask = Some("nope"))
    val p = Pipeline(e, l, fm)
    val task = p.run(spark, Calendar.day("2023-01-01"))
    assert(task.status == Status.Error)
    assert(task.error.isDefined)
  }

  test("CSV dialect roundtrip via pipeline (delimiter, header, quoting)") {
    val dir = tmp()
    val src = ParquetModel(sf("nation").stripSuffix(".parquet") + ".parquet")
    val csv = CsvModel(dir + "/n", delimiter = "|", head = true)
    assert(Pipeline(src, csv).run(spark, Calendar.day("2023-01-01")).status == Status.Done)
    // read back through the same dialect
    val back = CsvModel(dir + "/n", delimiter = "|", head = true)
      .extract(StepContext(spark, Calendar.day("2023-01-01")))
    val orig = spark.read.parquet(sf("nation"))
    assert(back.count() == orig.count())
    assert(back.columns.toSeq == orig.columns.toSeq)
    val a = back.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    val b = orig.orderBy("n_nationkey").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("XML roundtrip") {
    val dir = tmp()
    val ctx = StepContext(spark, Calendar.day("2023-01-01"))
    val src = ParquetModel(sf("region").stripSuffix(".parquet") + ".parquet")
    val xml = XmlModel(dir + "/r")
    assert(Pipeline(src, xml).run(spark, Calendar.day("2023-01-01")).status == Status.Done)
    val back = XmlModel(dir + "/r").extract(ctx)
    assert(back.count() == 5)
    assert(back.columns.sorted.toSeq == Seq("r_name", "r_regionkey"))
  }

  test("JSON roundtrip preserves values") {
    val dir = tmp()
    val ctx = StepContext(spark, Calendar.day("2023-01-01"))
    val src = ParquetModel(sf("region").stripSuffix(".parquet") + ".parquet")
    val js = JsonModel(dir + "/j")
    assert(Pipeline(src, js).run(spark, Calendar.day("2023-01-01")).status == Status.Done)
    val back = JsonModel(dir + "/j", multiline = false).extract(ctx)
    assert(back.count() == 5)
  }

  test("CSV all-strings compat mode (the reference's DictReader typing)") {
    val dir = tmp()
    val src = ParquetModel(sf("region").stripSuffix(".parquet") + ".parquet")
    assert(Pipeline(src, CsvModel(dir + "/r"))
      .run(spark, Calendar.day("2023-01-01")).status == Status.Done)
    val back = CsvModel(dir + "/r", stringType = true)
      .extract(StepContext(spark, Calendar.day("2023-01-01")))
    // every column is a string, exactly like csv.DictReader rows
    assert(back.schema.fields.forall(_.dataType.typeName == "string"))
    assert(back.count() == 5)
  }

  test("JSON top-level-array file reads via multiLine (reference layout)") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.json"),
      """[{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]""".getBytes)
    val back = JsonModel(dir + "/data.json", multiline = true)
      .extract(StepContext(spark, Calendar.day("2023-01-01")))
    assert(back.count() == 2)
    assert(back.orderBy("id").collect().map(_.getAs[String]("name")).toSeq ==
      Seq("a", "b"))
  }

  test("sharded parquet sink: maxRecordsPerFile caps output file size") {
    val out = tmp() + "/sharded"
    val docs = ParquetModel(sf("documents").stripSuffix(".parquet") + ".parquet")
    val p = Pipeline(docs, ParquetModel(out, maxRecordsPerFile = Some(100L)))
    assert(p.run(spark, Calendar.day("1995-06-15")).status == Status.Done)
    val files = new java.io.File(out).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).toSeq
    val total = spark.read.parquet(out).count()
    // every file honors the cap, and the row set is intact
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(spark.read.parquet(f.getPath).count() <= 100L,
        s"${f.getName} exceeds maxRecordsPerFile")
    }
    assert(total == spark.read.parquet(
      sf("documents").stripSuffix(".parquet") + ".parquet").count())
    assert(files.size >= (total / 100L).toInt)
  }

  test("strftime-style file naming from the calendar date") {
    val m = CsvModel("/data/%Y/%m/%d/out")
    val ctx = StepContext(spark, Calendar.day("2023-03-05"))
    assert(m.resolvedPath(ctx) == "/data/2023/03/05/out")
    val h = JsonModel("/data/%Y%m%d_%H.json",
      knobs = ModelKnobs(hoursBack = Some(2)))
    val ctx2 = StepContext(spark, Calendar.hour("2023-03-05 01:30:00"))
    assert(h.resolvedPath(ctx2) == "/data/20230304_23.json")
  }

  test("Filenames model lists files with mask and emits the row shape") {
    val dir = tmp()
    Files.write(java.nio.file.Paths.get(dir, "a.csv"), "x".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "b.txt"), "y".getBytes)
    val ctx = StepContext(spark, Calendar.day("2023-01-01"))
    val df = FilenamesModel(dir, mask = Some("\\.csv$")).extract(ctx)
    assert(df.columns.toSeq == Seq("host", "path", "root", "dir", "file",
      "is_dir", "is_file", "mtime", "size"))
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows(0).getAs[String]("file") == "a.csv")
    assert(rows(0).getAs[Boolean]("is_file"))
    assert(rows(0).getAs[Long]("size") == 1L)
  }

  test("FileManager copy with gzip + move + delete and metrics") {
    val dir = tmp()
    val ctx = StepContext(spark, Calendar.day("2023-01-01"))
    Files.write(java.nio.file.Paths.get(dir, "x.dat"), ("hello" * 100).getBytes)
    // copy with zip
    val r1 = FileManagerModel(dir, action = "copy", mask = Some("\\.dat$"),
      destinations = Seq(dir + "/z"), zip = true).execute(ctx)
    assert(r1.resultValue.contains(1L))
    assert(new java.io.File(dir + "/z/x.dat.gz").exists())
    // unzip back and compare
    FileManagerModel(dir + "/z", action = "copy", mask = Some("\\.gz$"),
      destinations = Seq(dir + "/u"), unzip = true).execute(ctx)
    val unzipped = Files.readAllBytes(java.nio.file.Paths.get(dir, "u", "x.dat"))
    assert(new String(unzipped) == "hello" * 100)
    // move
    FileManagerModel(dir + "/u", action = "move",
      destinations = Seq(dir + "/m")).execute(ctx)
    assert(!new java.io.File(dir + "/u/x.dat").exists())
    assert(new java.io.File(dir + "/m/x.dat").exists())
    // delete
    FileManagerModel(dir + "/m", action = "delete").execute(ctx)
    assert(!new java.io.File(dir + "/m/x.dat").exists())
  }
}
