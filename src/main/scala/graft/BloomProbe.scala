package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Measures bloom semi-join reduction (q52's operator) at replicated
  * scale with broadcast disabled — the regime it exists for: the dim
  * side is too big to broadcast, so the plain plan shuffles the ENTIRE
  * fact table into the exchange; the bloom probe kills non-matching
  * fact rows in the scan stage first.
  *
  * Run: sbt "runMain graft.BloomProbe" (SPARK_GRAFT_REPLICAS=10).
  */
object BloomProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val replicas = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)

    val li = Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select((col("l_orderkey") * 100 + col("rep")).as("fk"),
        col("l_quantity"))
      .persist()
    val fact = li.count()
    // selective dim: urgent orders only (~20% of keys), replicated
    val dim = Tables.load(spark, "/root/testdata/sf0.1", "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select((col("o_orderkey") * 100 + col("rep")).as("dk"))
      .persist()
    val dimN = dim.count()

    def agg(f: org.apache.spark.sql.DataFrame) =
      f.join(dim, f("fk") === dim("dk"))
        .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(38,6)")))
        .collect()

    val (_, tPlain) = time(agg(li))
    val ((reduced, surviving), tBloomBuildFilter) = time {
      val r = Relational.bloomSemiJoinReduce(li, "fk", dim, "dk",
        expectedItems = dimN).persist()
      (r, r.count())
    }
    val (_, tBloomJoin) = time(agg(reduced))
    println(f"[bloomprobe] ${replicas}x fact=$fact%,d dim=$dimN%,d: " +
      f"plain join $tPlain%.1fs (shuffles $fact%,d fact rows); " +
      f"bloom build+filter $tBloomBuildFilter%.1fs -> $surviving%,d " +
      f"survivors (${surviving * 100.0 / fact}%.1f%%), " +
      f"reduced join $tBloomJoin%.1fs")

    // ---- incremental dedup routing: mostly-new daily batch ----------
    // 2M-doc index, 200k batch of which 5% are dups of index texts
    val idxN = 200000L * replicas
    val index = spark.range(idxN)
      .select(col("id").as("doc_id"),
        concat(lit("indexed document body number "), col("id")).as("text"))
      .persist()
    index.count()
    val batchB = spark.range(idxN, idxN + 19000L * replicas)
      .select(col("id").as("doc_id"),
        concat(lit("new document body number "), col("id")).as("text"))
      .unionByName(spark.range(1000L * replicas)
        .select((col("id") + idxN + 100000000L).as("doc_id"),
          concat(lit("indexed document body number "), col("id")).as("text")))
      .persist()
    val bn2 = batchB.count()
    val (p0, tPlainDedup) = time(graft.operators.Dedup.incrementalDedup(
      batchB, index, "doc_id", "text").count())
    // artifact posture: the index bloom builds ONCE per index
    // generation and persists next to it; per-batch cost excludes it
    val (idxBloom, tIdxBloom) = time(
      graft.operators.Dedup.indexBloom(index, "text", idxN))
    val (p1, tBloomDedup) = time(graft.operators.Dedup.incrementalDedupBloom(
      batchB, index, "doc_id", "text", idxBloom).count())
    require(p0 == p1, s"routing changed the result: $p0 vs $p1")
    // the at-scale predictor (local[32] walls hide it in page cache):
    // rows entering the anti-join exchange, both sides
    def mightContain(bytes: Array[Byte], c: org.apache.spark.sql.Column) =
      graft.expressions.kernels.toCol(graft.expressions.BloomMightContain(
        graft.expressions.kernels.toExpr(c), bytes))
    val sliverN = batchB
      .filter(mightContain(idxBloom, xxhash64(col("text")))).count()
    val sliverBloomBytes = graft.operators.Dedup.indexBloom(
      batchB.filter(mightContain(idxBloom, xxhash64(col("text")))),
      "text", bn2)
    val idxExchanged = index
      .filter(mightContain(sliverBloomBytes, xxhash64(col("text")))).count()
    println(f"[bloomprobe] incremental dedup ${replicas}x: index=$idxN%,d " +
      f"batch=$bn2%,d (5%% dups): plain anti-join $tPlainDedup%.1fs; " +
      f"index bloom (once per generation) $tIdxBloom%.1fs, " +
      f"per-batch bloom-routed $tBloomDedup%.1fs (survivors $p0%,d " +
      f"identical); exchange: plain moves ${idxN + bn2}%,d rows, routed " +
      f"moves ${sliverN + idxExchanged}%,d (sliver $sliverN%,d + pruned " +
      f"index $idxExchanged%,d)")
    spark.stop()
  }
}
