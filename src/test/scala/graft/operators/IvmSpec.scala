package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class IvmSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_ivm_$tag").resolve("t").toString

  private def snap(df: DataFrame): Map[String, (Long, BigDecimal)] =
    df.collect().map(r => r.getAs[String]("k") ->
      (r.getAs[Long]("n_rows"),
        BigDecimal(r.getAs[java.math.BigDecimal]("sum_v")))).toMap

  test("applyDelta folds, retracts to zero, guards replays, pins readers") {
    val dir = tmpDir("fold")
    import spark.implicits._
    val d0 = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0)).toDF("k", "v")
    val d1 = Seq(("a", 4.0), ("c", 7.0)).toDF("k", "v")
    assert(Ivm.applyDelta(spark, dir, d0, Seq("k"), Seq("v"), batchId = 0))
    val pinned = Ivm.read(spark, dir)
    assert(Ivm.applyDelta(spark, dir, d1, Seq("k"), Seq("v"), batchId = 1))
    // pinned reader still sees the pre-apply snapshot
    assert(snap(pinned) ==
      Map("a" -> (2L, BigDecimal(3.0)), "b" -> (1L, BigDecimal(10.0))))
    assert(snap(Ivm.read(spark, dir)) == Map(
      "a" -> (3L, BigDecimal(7.0)), "b" -> (1L, BigDecimal(10.0)),
      "c" -> (1L, BigDecimal(7.0))))
    // replay guard: at-or-below ids are loud no-ops
    assert(!Ivm.applyDelta(spark, dir, d1, Seq("k"), Seq("v"), batchId = 1))
    assert(!Ivm.applyDelta(spark, dir, d0, Seq("k"), Seq("v"), batchId = 0))
    assert(Ivm.lastAppliedBatch(spark, dir).contains(1L))
    assert(snap(Ivm.read(spark, dir))("a") == ((3L, BigDecimal(7.0))))
    // retraction: weight -1 removes contributions; b empties and LEAVES
    val retract = Seq(("b", 10.0, -1L), ("a", 4.0, -1L), ("a", 0.5, 1L))
      .toDF("k", "v", "w")
    assert(Ivm.applyDelta(spark, dir, retract, Seq("k"), Seq("v"),
      batchId = 2, weightCol = Some("w")))
    assert(snap(Ivm.read(spark, dir)) == Map(
      "a" -> (3L, BigDecimal(3.5)), "c" -> (1L, BigDecimal(7.0))))
    // unmanaged apply (batchId = -1) applies and carries the marker
    assert(Ivm.applyDelta(spark, dir, Seq(("c", 1.0)).toDF("k", "v"),
      Seq("k"), Seq("v")))
    assert(Ivm.lastAppliedBatch(spark, dir).contains(2L))
    assert(snap(Ivm.read(spark, dir))("c") == ((2L, BigDecimal(8.0))))
    // missing column fails loudly
    intercept[IllegalArgumentException] {
      Ivm.applyDelta(spark, dir, Seq(("x", 1.0)).toDF("k", "other"),
        Seq("k"), Seq("v"))
    }
    // single-writer lease wraps applies too
    val lock = new java.io.File(s"$dir.__maint.lock")
    assert(lock.createNewFile())
    intercept[IllegalStateException] {
      Ivm.applyDelta(spark, dir, d0, Seq("k"), Seq("v"))
    }
    assert(lock.delete())
  }

  test("retraction below zero fails loudly and leaves the table untouched") {
    val dir = tmpDir("neg")
    import spark.implicits._
    assert(Ivm.applyDelta(spark, dir, Seq(("a", 1.0)).toDF("k", "v"),
      Seq("k"), Seq("v"), batchId = 0))
    // a retract for a key with no prior insert must NOT land as a
    // negative-count key — the apply is rejected wholesale
    val bad = Seq(("zz", 5.0, -1L), ("a", 1.0, 1L)).toDF("k", "v", "w")
    val e = intercept[IllegalStateException] {
      Ivm.applyDelta(spark, dir, bad, Seq("k"), Seq("v"),
        batchId = 1, weightCol = Some("w"))
    }
    assert(e.getMessage.contains("negative n_rows"))
    assert(e.getMessage.contains("zz"), s"sample keys named: ${e.getMessage}")
    // live summary and exactly-once marker unchanged — the delta can be
    // fixed and re-applied under the same batch id
    assert(Ivm.lastAppliedBatch(spark, dir).contains(0L))
    assert(snap(Ivm.read(spark, dir)) == Map("a" -> (1L, BigDecimal(1.0))))
    assert(Ivm.applyDelta(spark, dir, Seq(("a", 1.0, 1L)).toDF("k", "v", "w"),
      Seq("k"), Seq("v"), batchId = 1, weightCol = Some("w")))
    assert(snap(Ivm.read(spark, dir)) == Map("a" -> (2L, BigDecimal(2.0))))
  }

  test("crashed apply (orphan gen, no pointer swap) is invisible and " +
      "recovered by the next apply") {
    val dir = tmpDir("crash")
    import spark.implicits._
    Ivm.applyDelta(spark, dir, Seq(("a", 1.0)).toDF("k", "v"),
      Seq("k"), Seq("v"), batchId = 0)
    // simulate a crash AFTER the gen-2 write but BEFORE the swap
    Seq(("a", 99.0)).toDF("k", "v")
      .write.parquet(Layout.generationPath(dir, 2))
    assert(snap(Ivm.read(spark, dir)) == Map("a" -> (1L, BigDecimal(1.0))),
      "unswapped generation must be invisible")
    // the next apply overwrites the orphan and publishes atomically
    assert(Ivm.applyDelta(spark, dir, Seq(("a", 2.0)).toDF("k", "v"),
      Seq("k"), Seq("v"), batchId = 1))
    assert(snap(Ivm.read(spark, dir)) == Map("a" -> (2L, BigDecimal(3.0))))
  }
}
