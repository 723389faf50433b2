package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{PlanScan, SparkSpec}

/** DATA-BUCKETED manifest tables: every partition directory's files
  * are hash-bucketed at seed under Spark's OWN bucket contract —
  * `pmod(murmur3(cols), n)` placement + `…_0000N` file naming — so the
  * planner-integrated reads surface a real `BucketSpec` and joins /
  * key-grouped aggregations on the bucket columns elide their shuffle
  * exchange, and equality filters prune to 1/n of the files. The
  * contract must survive EVERY rewrite path (CoW merge, SQL DML,
  * compaction), agree byte-for-byte with Spark's native `bucketBy`
  * placement (or a shuffle-free join against a native bucketed table
  * would silently drop matches), and refuse the layouts it cannot
  * honor (merge-on-read deltas, spec-less appends, bucket-column
  * widen/drop).
  */
class ManifestBucketSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_bucket_$tag").resolve("t").toString

  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  private def rows(n: Int): DataFrame =
    (1 to n).map(i =>
      (i.toLong, (i % 3).toString, i * 10.0, 1L))
      .toDF("k", "part", "v", "ver")

  private def seedBucketed(dir: String, n: Int = 60,
                           buckets: Int = 4): Unit =
    Layout.writeManifestTable(spark, dir, rows(n), Seq("part"),
      keys = Seq("k"), versionCol = Some("ver"),
      bucketCols = Seq("k"), buckets = buckets)

  private def noBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] = {
    // normalize column ORDER (manifest reads present stored order:
    // data columns first, partition columns appended)
    val d = df.select(df.columns.sorted.toSeq.map(col): _*)
    d.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))
  }

  test("seed round-trips exactly; every landed file carries a " +
      "parseable bucket id; meta records the layout") {
    val dir = tmpDir("seed")
    seedBucketed(dir)
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.dataBuckets == 4 && m.dataBucketCols == Seq("k"))
    assert(sortedRows(Layout.manifestTable(spark, dir)) ==
      sortedRows(rows(60)))
    // the naming contract: FileSourceScanExec parses `…_N(.ext)`;
    // a single unparseable file fails every bucketed scan loudly
    val pat = """.*_(\d+)(?:\..*)?$""".r
    Layout.manifestTable(spark, dir).inputFiles.foreach { f =>
      val name = f.split("/").last
      val id = name match {
        case pat(d) => d.toInt
        case _ => fail(s"file $name lacks the bucket-name suffix")
      }
      assert(id >= 0 && id < 4, s"file $name parses bucket $id")
    }
  }

  test("placement agrees with Spark's native bucketBy: a shuffle-free " +
      "join against a NATIVE bucketed table finds every match") {
    val dir = tmpDir("native")
    seedBucketed(dir)
    // unique name: a managed table's location outlives a killed run
    val tbl = s"mbs_native_${System.nanoTime}"
    rows(60).select(col("k"), col("v").as("nv"))
      .write.bucketBy(4, "k").saveAsTable(tbl)
    noBroadcast {
      val j = Layout.manifestTable(spark, dir)
        .join(spark.table(tbl), "k")
        .select(col("k"), col("v"), col("nv"))
      val got = sortedRows(j)
      assert(got.size == 60, s"join found ${got.size} of 60 matches — " +
        "manifest bucket placement disagrees with Spark's native " +
        "bucketBy placement")
      assert(got == sortedRows(rows(60).select(col("k"), col("v"),
        (col("k") * 10.0).as("nv"))))
      assert(PlanScan.shuffles(j.queryExecution.executedPlan).isEmpty,
        "manifest-vs-native co-bucketed join must be exchange-free")
    }
  }

  test("key-grouped aggregation runs exchange-free and exact (the " +
      "claimed HashPartitioning is the files' real placement)") {
    val dir = tmpDir("agg")
    seedBucketed(dir)
    noBroadcast {
      val g = Layout.manifestTable(spark, dir)
        .groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n"))
      g.collect()
      assert(PlanScan.shuffles(g.queryExecution.executedPlan).isEmpty,
        "groupBy on the bucket column must not exchange")
      // one output row per key with the exact sum: rows of one key
      // split across buckets would surface as duplicate groups here
      assert(sortedRows(g) == sortedRows(
        rows(60).groupBy("k").agg(sum("v").as("sv"),
          count(lit(1)).as("n"))))
    }
  }

  test("equality filter on the bucket column prunes to 1/n of the " +
      "files before any opens") {
    val dir = tmpDir("prune")
    seedBucketed(dir)
    val t = Layout.manifestTable(spark, dir)
    val total = t.inputFiles.length.toLong
    // a pure filter has no distribution requirement, so Spark's
    // DisableUnnecessaryBucketedScan would turn the bucketed scan off
    // (sound, but it drops the bucket set with it) — pin the pruning
    // itself with the auto rule off, the setting a filter-heavy
    // workload runs with
    val prevAuto = spark.conf
      .get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf
      .set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
    val f = Layout.manifestTable(spark, dir).filter(col("k") === 7L)
    assert(f.count() == 1L)
    // the scan plans with a selected-bucket set (1 of 4) — bucket
    // pruning is FileSourceScanExec's own, driven by the BucketSpec
    // the manifest relation surfaces
    val scan = PlanScan.fileScans(f.queryExecution.executedPlan)
    assert(scan.nonEmpty && total > 4)
    val md = scan.map(_.metadata.toSeq.sortBy(_._1).mkString(", "))
      .mkString("; ")
    assert(md.contains("1 out of 4"),
      s"equality on the bucket column must prune buckets (got '$md')")
    } finally spark.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", prevAuto)
  }

  test("copy-on-write merge and SQL DML rewrite THROUGH the bucketized " +
      "writer: the contract survives, the join stays exchange-free, " +
      "values exact") {
    val dir = tmpDir("dml")
    seedBucketed(dir)
    Layout.mergeManifest(spark, dir,
      Seq((61L, "1", 610.0, 2L), (7L, "1", 700.0, 2L))
        .toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    spark.sql("DROP VIEW IF EXISTS mbs_dml")
    spark.sql(s"CREATE TEMPORARY VIEW mbs_dml USING manifest " +
      s"OPTIONS (path '$dir')")
    spark.sql("UPDATE mbs_dml SET v = v + 1000.0, ver = CAST(3 AS " +
      "BIGINT) WHERE k % 20 = 0")
    val expect = rows(60)
      .withColumn("v", when(col("k") === 7L, 700.0).otherwise(col("v")))
      .union(Seq((61L, "1", 610.0, 2L)).toDF("k", "part", "v", "ver"))
      .withColumn("v",
        when(pmod(col("k"), lit(20)) === 0, col("v") + 1000.0)
          .otherwise(col("v")))
      .withColumn("ver",
        when(pmod(col("k"), lit(20)) === 0, 3L)
          .otherwise(when(col("k") === 7L || col("k") === 61L, 2L)
            .otherwise(1L)))
    noBroadcast {
      val self = Layout.manifestTable(spark, dir).select("k", "v")
        .join(Layout.manifestTable(spark, dir)
          .select(col("k"), col("ver")), "k")
      self.collect()
      assert(PlanScan.shuffles(self.queryExecution.executedPlan).isEmpty,
        "post-DML self-join must stay exchange-free")
    }
    assert(sortedRows(Layout.manifestTable(spark, dir)) ==
      sortedRows(expect))
  }

  test("compaction preserves the bucket layout (per-bucket files, " +
      "threshold reads per-bucket) and stays row-identical") {
    val dir = tmpDir("compact")
    seedBucketed(dir)
    // paced ingest shape: several merges leave the table one gen per
    // partition (CoW), so force a rewrite-all compaction
    Layout.mergeManifest(spark, dir,
      Seq((7L, "1", 7.5, 2L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    val rewritten = Layout.compactManifest(spark, dir, maxFiles = 0)
    assert(rewritten.nonEmpty, "maxFiles=0 must rewrite all partitions")
    val pat = """.*_(\d+)(?:\..*)?$""".r
    Layout.manifestTable(spark, dir).inputFiles.foreach { f =>
      assert(pat.findFirstIn(f.split("/").last).isDefined,
        s"compacted file ${f.split("/").last} lost the bucket naming")
    }
    val expect = rows(60)
      .withColumn("v", when(col("k") === 7L, 7.5).otherwise(col("v")))
      .withColumn("ver", when(col("k") === 7L, 2L).otherwise(col("ver")))
    assert(sortedRows(Layout.manifestTable(spark, dir)) ==
      sortedRows(expect))
    noBroadcast {
      val g = Layout.manifestTable(spark, dir).groupBy("k")
        .agg(sum("v").as("sv"))
      g.collect()
      assert(PlanScan.shuffles(g.queryExecution.executedPlan).isEmpty)
    }
  }

  test("streaming CDC sink in copy-on-write mode preserves the bucket " +
      "contract; merge-on-read mode fails the query with the remedy") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmpDir("stream")
    seedBucketed(dir)
    val input = MemoryStream[(Long, String, Double, Long)]
    val q = graft.streaming.Streams.cdcApply(
        input.toDF().toDF("k", "part", "v", "ver"),
        dir, Seq("k"), "ver", manifest = true)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_bucket_ckpt").toString)
      .start()
    try {
      input.addData((7L, "1", 777.0, 2L), (61L, "1", 610.0, 1L))
      q.processAllAvailable()
    } finally q.stop()
    val expect = rows(60)
      .withColumn("v", when(col("k") === 7L, 777.0).otherwise(col("v")))
      .withColumn("ver", when(col("k") === 7L, 2L).otherwise(col("ver")))
      .union(Seq((61L, "1", 610.0, 1L)).toDF("k", "part", "v", "ver"))
    assert(sortedRows(Layout.manifestTable(spark, dir)) ==
      sortedRows(expect))
    val pat = """.*_(\d+)(?:\..*)?$""".r
    Layout.manifestTable(spark, dir).inputFiles.foreach { f =>
      assert(pat.findFirstIn(f.split("/").last).isDefined,
        s"sink-rewritten file ${f.split("/").last} lost the bucket naming")
    }
    noBroadcast {
      val g = Layout.manifestTable(spark, dir).groupBy("k")
        .agg(sum("v").as("sv"))
      g.collect()
      assert(PlanScan.shuffles(g.queryExecution.executedPlan).isEmpty,
        "post-sink groupBy on the bucket column must not exchange")
    }
    // mor = true would land delta files outside the contract: the
    // refusal surfaces as the streaming query's failure, remedy intact
    val q2 = graft.streaming.Streams.cdcApply(
        input.toDF().toDF("k", "part", "v", "ver"),
        dir, Seq("k"), "ver", manifest = true, mor = true)
      .option("checkpointLocation",
        Files.createTempDirectory("graft_bucket_ckpt2").toString)
      .start()
    val eMor = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try {
        input.addData((8L, "2", 80.0, 3L))
        q2.processAllAvailable()
      } finally q2.stop()
    }
    assert(eMor.getMessage.contains("copy-on-write"), eMor.getMessage)
  }

  test("rename of a bucket column rekeys the stored layout (a rename " +
      "never moves bytes, so bucket ids stay valid)") {
    val dir = tmpDir("rename")
    seedBucketed(dir)
    Layout.renameManifestColumn(spark, dir, "k", "kid")
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.dataBucketCols == Seq("kid"),
      s"bucket spec must follow the rename (got ${m.dataBucketCols})")
    assert(m.morKeys == Seq("kid"))
    // values unchanged, read through the alias-coalescing path
    assert(Layout.readManifest(spark, dir)
      .agg(sum("kid")).head().getLong(0) == (1 to 60).map(_.toLong).sum)
  }

  test("repartitionManifest buckets an EXISTING table in place (the " +
      "100 TB adoption path): layout lands, DML keeps it, the change " +
      "feed diffs the rewrite to nothing") {
    val dir = tmpDir("adopt")
    // plain (unbucketed) table with history: seed + one CoW merge
    Layout.writeManifestTable(spark, dir, rows(60), Seq("part"),
      keys = Seq("k"), versionCol = Some("ver"))
    Layout.mergeManifest(spark, dir,
      Seq((7L, "1", 7.7, 2L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    val vBefore = Layout.manifestVersion(spark, dir).get
    // bucket it in place — partition spec unchanged
    val nParts = Layout.repartitionManifest(spark, dir, Seq("part"),
      newBucketCols = Some(Seq("k")), newBuckets = Some(4))
    assert(nParts == 3)
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.dataBuckets == 4 && m.dataBucketCols == Seq("k"))
    val expect = rows(60)
      .withColumn("v", when(col("k") === 7L, 7.7).otherwise(col("v")))
      .withColumn("ver", when(col("k") === 7L, 2L).otherwise(col("ver")))
    assert(sortedRows(Layout.manifestTable(spark, dir)) ==
      sortedRows(expect))
    // the rewrite is row-invisible to CDC consumers
    assert(Layout.manifestChanges(spark, dir, vBefore,
      Layout.manifestVersion(spark, dir).get).isEmpty,
      "an in-place rebucket must diff to nothing in the change feed")
    // the adopted layout is the real contract: exchange-free agg and
    // a post-rebucket merge preserves it
    noBroadcast {
      val g = Layout.manifestTable(spark, dir).groupBy("k")
        .agg(sum("v").as("sv"))
      g.collect()
      assert(PlanScan.shuffles(g.queryExecution.executedPlan).isEmpty,
        "adopted bucket layout must serve exchange-free aggregation")
    }
    Layout.mergeManifest(spark, dir,
      Seq((9L, "0", 99.0, 3L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    val pat = """.*_(\d+)(?:\..*)?$""".r
    Layout.manifestTable(spark, dir).inputFiles.foreach { f =>
      assert(pat.findFirstIn(f.split("/").last).isDefined,
        s"post-adoption merge file ${f.split("/").last} lost the naming")
    }
    // re-size 4 -> 2 in place, then un-bucket; both round-trip exactly
    Layout.repartitionManifest(spark, dir, Seq("part"),
      newBucketCols = Some(Seq("k")), newBuckets = Some(2))
    assert(Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get).dataBuckets == 2)
    val expect2 = expect
      .withColumn("v", when(col("k") === 9L, 99.0).otherwise(col("v")))
      .withColumn("ver", when(col("k") === 9L, 3L).otherwise(col("ver")))
    assert(sortedRows(Layout.manifestTable(spark, dir)) ==
      sortedRows(expect2))
    Layout.repartitionManifest(spark, dir, Seq("part"),
      newBucketCols = Some(Nil), newBuckets = Some(0))
    val m3 = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m3.dataBuckets == 0 && m3.dataBucketCols.isEmpty)
    assert(sortedRows(Layout.manifestTable(spark, dir)) ==
      sortedRows(expect2))
    // un-bucketed again: MoR deltas are legal once more
    Layout.mergeManifestDelta(spark, dir,
      Seq((1L, "1", 1.5, 4L)).toDF("k", "part", "v", "ver"),
      Seq("k"), "ver")
    assert(Layout.readManifest(spark, dir).filter(col("k") === 1L)
      .head().getAs[Double]("v") == 1.5)
    // refusals: half-declared layout; a no-op call; bucketing an
    // append-only table
    val eHalf = intercept[IllegalArgumentException] {
      Layout.repartitionManifest(spark, dir, Seq("part"),
        newBucketCols = Some(Seq("k")))
    }
    assert(eHalf.getMessage.contains("BOTH"))
    val eNoop = intercept[IllegalArgumentException] {
      Layout.repartitionManifest(spark, dir, Seq("part"))
    }
    assert(eNoop.getMessage.contains("already partitioned"))
    val dirAo = tmpDir("adopt_ao")
    Layout.writeManifestTable(spark, dirAo, rows(6), Seq("part"),
      appendOnly = true)
    val eAo = intercept[IllegalArgumentException] {
      Layout.repartitionManifest(spark, dirAo, Seq("part"),
        newBucketCols = Some(Seq("k")), newBuckets = Some(2))
    }
    assert(eAo.getMessage.contains("append-only"))
  }

  test("repartition_table from pure SQL adopts a bucket layout by " +
      "table path; the registered bare name then serves it " +
      "exchange-free") {
    val dir = tmpDir("sqladopt")
    Layout.writeManifestTable(spark, dir, rows(60), Seq("part"),
      keys = Seq("k"), versionCol = Some("ver"))
    spark.sql("DROP TABLE IF EXISTS t_badopt")
    spark.sql(s"CREATE TABLE t_badopt USING manifest OPTIONS (path '$dir')")
    val out = spark.sql(
      s"SELECT * FROM repartition_table('$dir', 'part', 'k', 4)")
      .collect().head
    assert(out.getSeq[String](1) == Seq("part") && out.getInt(2) == 3)
    val m = Layout.readManifestMeta(spark, dir,
      Layout.manifestVersion(spark, dir).get)
    assert(m.dataBuckets == 4 && m.dataBucketCols == Seq("k"))
    noBroadcast {
      val g = spark.sql("SELECT k, sum(v) AS sv FROM t_badopt GROUP BY k")
      assert(g.count() == 60L)
      assert(PlanScan.shuffles(g.queryExecution.executedPlan).isEmpty,
        "bare-name groupBy after SQL adoption must not exchange")
    }
    // the layout is dashboard-visible
    val det = spark.sql(
      s"SELECT bucket_cols, buckets FROM manifest_detail('$dir')").head()
    assert(det.getSeq[String](0) == Seq("k") && det.getInt(1) == 4,
      s"manifest_detail must expose the bucket layout ($det)")
    // 2-arg form still refuses a pure no-op
    val eNoop = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM repartition_table('$dir', 'part')")
        .collect()
    }
    assert(eNoop.getMessage.contains("already partitioned"),
      eNoop.getMessage)
    spark.sql("DROP TABLE IF EXISTS t_badopt")
  }

  test("the layouts the contract cannot honor refuse loudly with " +
      "their remedies") {
    val dir = tmpDir("refuse")
    seedBucketed(dir)
    // merge-on-read deltas would land unnamed, unplaced files
    val e1 = intercept[IllegalArgumentException] {
      Layout.mergeManifestDelta(spark, dir,
        Seq((1L, "1", 1.0, 9L)).toDF("k", "part", "v", "ver"),
        Seq("k"), "ver")
    }
    assert(e1.getMessage.contains("copy-on-write"))
    // appendOnly + bucketed at seed
    val e2 = intercept[IllegalArgumentException] {
      Layout.writeManifestTable(spark, tmpDir("refuse2"), rows(6),
        Seq("part"), appendOnly = true,
        bucketCols = Seq("k"), buckets = 2)
    }
    assert(e2.getMessage.contains("appendOnly"))
    // bucket col in the partition spec
    val e3 = intercept[IllegalArgumentException] {
      Layout.writeManifestTable(spark, tmpDir("refuse3"), rows(6),
        Seq("part"), keys = Seq("k"), versionCol = Some("ver"),
        bucketCols = Seq("part"), buckets = 2)
    }
    assert(e3.getMessage.contains("partition"))
    // a table bucketed on a NON-key column, so each refusal below hits
    // the bucket guard (not the merge-spec guard that covers 'k')
    val dir2 = tmpDir("refuse_v")
    Layout.writeManifestTable(spark, dir2, rows(12), Seq("part"),
      keys = Seq("k"), versionCol = Some("ver"),
      bucketCols = Seq("v"), buckets = 2)
    // widening a bucket column re-types the murmur3 input
    val e4 = intercept[IllegalArgumentException] {
      Layout.widenManifestColumn(spark, dir2, "v", "DECIMAL(38,6)")
    }
    assert(e4.getMessage.contains("bucket"))
    // dropping a bucket column orphans every file's placement
    val e5 = intercept[IllegalArgumentException] {
      Layout.dropManifestColumn(spark, dir2, "v")
    }
    assert(e5.getMessage.contains("bucket"))
    // a spec change onto the bucket column
    val e6 = intercept[IllegalArgumentException] {
      Layout.changeManifestPartitionSpec(spark, dir2, Seq("v"))
    }
    assert(e6.getMessage.contains("bucket"))
    // repartitioning onto the bucket column
    val e7 = intercept[IllegalArgumentException] {
      Layout.repartitionManifest(spark, dir2, Seq("v"))
    }
    assert(e7.getMessage.contains("bucket"))
  }
}
