package graft.models

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core._

/** Single-FILE sink fidelity (reference models.py:1366-1374, 1405-1409,
  * 1441-1454): one file at `path` — not a part-file directory — with
  * format-aware append: CSV header exactly once, JSON one top-level
  * array, XML one declaration + one root element.
  */
class SingleFileSpec extends SparkSpec {

  private def ctx = StepContext(spark, Calendar.day("2023-05-01"))
  private def dir() = Files.createTempDirectory("graft_single").toString

  private def text(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  test("CSV singleFile: one real file, header once across appends") {
    val p = s"${dir()}/out.csv"
    val df1 = spark.range(3).select(col("id"), (col("id") * 2).as("v"))
    val df2 = spark.range(3, 5).select(col("id"), (col("id") * 2).as("v"))
    CsvModel(p, delimiter = ",", singleFile = true).load(ctx, df1)
    assert(Files.isRegularFile(Paths.get(p)), "a FILE, not a directory")
    CsvModel(p, delimiter = ",", singleFile = true, append = true)
      .load(ctx, df2)
    val raw = text(p)
    assert(raw.linesIterator.count(_ == "\"id\",\"v\"") == 1,
      s"header exactly once:\n$raw")
    val back = CsvModel(p, delimiter = ",",
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL(
        "id long, v long"))).extract(ctx)
    assert(back.count() == 5)
    assert(back.agg(sum("v")).head().getLong(0) == (0L until 5L).map(_ * 2).sum)
  }

  test("CSV singleFile overwrite replaces, does not append") {
    val p = s"${dir()}/o.csv"
    val m = CsvModel(p, delimiter = ",", singleFile = true)
    m.load(ctx, spark.range(10).toDF("id"))
    m.load(ctx, spark.range(2).toDF("id"))
    assert(text(p).linesIterator.size == 3) // header + 2 rows
  }

  test("CSV singleFile append onto an empty file still writes the header") {
    val p = s"${dir()}/h.csv"
    val m0 = CsvModel(p, delimiter = ",", singleFile = true)
    m0.load(ctx, spark.range(0).toDF("id")) // empty: header-only or 0-byte
    CsvModel(p, delimiter = ",", singleFile = true, append = true)
      .load(ctx, spark.range(2).toDF("id"))
    val lines = text(p).linesIterator.toSeq
    assert(lines.head == "\"id\"", s"header present after append: $lines")
    assert(lines.count(_ == "\"id\"") == 1, s"header exactly once: $lines")
  }

  test("crash recovery: a stranded .__single_old restores before the write") {
    val p = s"${dir()}/r.csv"
    val m = CsvModel(p, delimiter = ",", singleFile = true)
    m.load(ctx, spark.range(3).toDF("id"))
    // simulate a crash between the two renames: dest gone, aside holds
    // the only complete copy
    Files.move(Paths.get(p), Paths.get(p + ".__single_old"))
    CsvModel(p, delimiter = ",", singleFile = true, append = true)
      .load(ctx, spark.range(3, 5).toDF("id"))
    assert(!Files.exists(Paths.get(p + ".__single_old")), "aside reaped")
    val back = CsvModel(p, delimiter = ",",
      schema = Some(org.apache.spark.sql.types.StructType.fromDDL("id long")))
      .extract(ctx)
    assert(back.count() == 5, "recovered rows + appended rows")
  }

  test("JSON singleFile: one top-level array document, splice append") {
    val p = s"${dir()}/out.json"
    JsonModel(p, singleFile = true)
      .load(ctx, spark.range(3).toDF("id"))
    val raw1 = text(p).trim
    assert(raw1.startsWith("[") && raw1.endsWith("]"), raw1)
    assert(Files.isRegularFile(Paths.get(p)))
    JsonModel(p, singleFile = true, append = true)
      .load(ctx, spark.range(3, 7).toDF("id"))
    val raw2 = text(p).trim
    assert(raw2.startsWith("[") && raw2.endsWith("]"), raw2)
    // default multiline read (the reference's layout) sees all 7 rows
    val back = JsonModel(p).extract(ctx)
    assert(back.count() == 7)
    assert(back.agg(sum("id")).head().getLong(0) == (0L until 7L).sum)
  }

  test("JSON singleFile append onto an empty array stays valid") {
    val p = s"${dir()}/e.json"
    JsonModel(p, singleFile = true)
      .load(ctx, spark.range(0).toDF("id"))
    assert(text(p).trim.replaceAll("\\s", "") == "[]")
    JsonModel(p, singleFile = true, append = true)
      .load(ctx, spark.range(2).toDF("id"))
    assert(JsonModel(p).extract(ctx).count() == 2)
  }

  test("XML singleFile: one declaration, one root, splice append") {
    val p = s"${dir()}/out.xml"
    XmlModel(p, singleFile = true)
      .load(ctx, spark.range(3).toDF("id"))
    XmlModel(p, singleFile = true, append = true)
      .load(ctx, spark.range(3, 5).toDF("id"))
    val raw = text(p)
    assert(raw.split("<\\?xml").length == 2, "one declaration")
    assert(raw.split("<data>").length == 2, "one root open")
    assert(raw.split("</data>").length == 2, "one root close")
    assert(Files.isRegularFile(Paths.get(p)))
    val back = XmlModel(p).extract(ctx)
    assert(back.count() == 5)
    assert(back.agg(sum("id")).head().getLong(0) == (0L until 5L).sum)
  }
}
