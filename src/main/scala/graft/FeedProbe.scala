package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measures the incremental-consumption cost shapes on a manifest
  * table under trickle ingest — the claim behind the `manifest-feed`
  * streaming source and `ManifestFeed mode=appends`:
  *
  *  1. [[Layout.appendsBetween]] per increment: opens ONLY the delta
  *     generation dirs the window added — O(|new rows|) however large
  *     the table;
  *  2. [[Layout.manifestChanges]] per increment: resolves BOTH
  *     snapshots of every changed partition and diffs with two
  *     `exceptAll`s — correct for arbitrary rewrites, but a scattered
  *     batch makes "changed partitions" the whole table;
  *  3. a full `manifest-feed` streaming drain of the same increments
  *     (micro-batch harness + sink write included).
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.FeedProbe"
  */
object FeedProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]").appName("feed-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the MorProbe fixture: 20x orders across 200 partitions
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .crossJoin(broadcast(spark.range(20).toDF("rep")))
      .withColumn("o_orderkey", col("o_orderkey") * 32 + col("rep"))
      .drop("rep")
      .withColumn("part", pmod(col("o_orderkey"), lit(200)))
      .select(col("o_orderkey"), col("part"), col("o_totalprice"),
        lit(1L).as("ver"))
    val tdir = Files.createTempDirectory("probe_feed").resolve("t").toString
    Layout.writeManifestTable(spark, tdir, orders, Seq("part"))

    // APPEND-ONLY trickle: each batch is ~0.5% FRESH keys scattered
    // across all 200 partitions (key space above the seed's)
    val maxK = orders.agg(max("o_orderkey")).head().getLong(0)
    def fresh(v: Long) = orders
      .filter(pmod(xxhash64(col("o_orderkey"), lit(v)), lit(200)) === 0)
      .select((col("o_orderkey") + lit((maxK + 1) * v)).as("o_orderkey"),
        col("part"), col("o_totalprice"), lit(v + 1).as("ver"))
    val nBatch = fresh(1).count()
    val versions = (1L to 5L).map { v =>
      Layout.mergeManifestDelta(spark, tdir, fresh(v),
        Seq("o_orderkey"), "ver")
      Layout.manifestVersion(spark, tdir).get
    }

    // per-increment cost, both consumption paths
    val perInc = versions.map { v =>
      val (na, ta) = time(
        Layout.appendsBetween(spark, tdir, v - 1, v).count())
      val (nc, tc) = time(
        Layout.manifestChanges(spark, tdir, v - 1, v).count())
      require(na == nc, s"row drift at v$v: appends=$na changes=$nc")
      (na, ta, tc)
    }

    // one streaming drain of all five increments (anchor at the seed's
    // version), parquet sink + checkpoint included
    val sink = Files.createTempDirectory("probe_feed_sink").toString
    val (_, tStream) = time {
      val q = spark.readStream.format("manifest-feed")
        .option("path", tdir).option("startingVersion", "1").load()
        .writeStream.format("parquet").option("path", s"$sink/p")
        .option("checkpointLocation", s"$sink/c")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val streamed = spark.read.parquet(s"$sink/p").count()
    require(streamed == perInc.map(_._1).sum,
      s"stream drift: $streamed vs ${perInc.map(_._1).sum}")

    println(f"[probe] partitions=200 batchRows=$nBatch%d " +
      f"tableRows=${orders.count() + perInc.map(_._1).sum}%d")
    perInc.zip(versions).foreach { case ((n, ta, tc), v) =>
      println(f"[probe] v$v%d increment ($n%d rows): " +
        f"appendsBetween=$ta%.2f s  manifestChanges=$tc%.2f s")
    }
    println(f"[probe] streaming drain of all 5 increments " +
      f"($streamed%d rows incl. sink+checkpoint)=$tStream%.2f s")
    spark.stop()
  }
}
