package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Scale probe for the image-components closure (v08) and the
  * connected-components kernel it rides on.
  *
  * Two stressors, measured separately:
  *  1. the REAL v08 pipeline (render -> dHash -> sparsified rep-star
  *     pairs -> closure) at SPARK_GRAFT_REPLICAS x the sf0.1 ids —
  *     decode-bound, the closure subgraph grows linearly;
  *  2. a pure path graph of SPARK_GRAFT_CHAIN hops — the adversarial
  *     re-encode-chain shape where plain hash-min needs O(diameter)
  *     rounds. With pointer jumping the round count must stay
  *     ~log2(chain), and the probe prints it (Dedup.lastRounds) so the
  *     log-round claim is measured, not asserted.
  */
object V08Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    val chainLen = math.max(1, sys.env.getOrElse("SPARK_GRAFT_CHAIN", "100000").toInt)

    // 1. real v08 at replicas x: each replica block re-renders the same
    // near-identical families under fresh ids, so components stay
    // family-sized while the subgraph grows linearly
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id")
    val n0 = base.count()
    val ids = (0 until replicas).map(i =>
      base.select((col("doc_id") + lit(i * n0)).as("doc_id")))
      .reduce(_ union _)
    val t0 = System.nanoTime()
    val fp = Multimodal.dHashFingerprints(
      Multimodal.syntheticCellImages(ids, "doc_id")).persist()
    fp.count()
    val tFp = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val comp = Dedup.connectedComponents(fp.select("media_id"),
      Dedup.fingerprintPairs(fp, "media_id", "fp", maxHamming = 3), "media_id")
    val nComp = comp.select("component").distinct().count()
    val tCc = (System.nanoTime() - t1) / 1e9
    println(f"[v08probe-${replicas}x] fingerprint ${tFp}%.1f s " +
      f"closure ${tCc}%.1f s components $nComp rounds ${Dedup.lastRounds.get()}")
    fp.unpersist(false)

    // 2. pure chain: diameter = chainLen, the worst case for label
    // propagation; rounds must be ~log2(chainLen), not chainLen
    val chainIds = spark.range(0L, chainLen + 1L).toDF("id")
    val chain = spark.range(0L, chainLen.toLong)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    // localEdgeThreshold = 0: the point is stressing the DISTRIBUTED
    // loop (the adaptive default would close 100k edges on the driver)
    val t2 = System.nanoTime()
    val roots = Dedup.connectedComponents(chainIds, chain, "id",
      maxIter = 32, localEdgeThreshold = 0L)
      .select("component").distinct().count()
    val tChain = (System.nanoTime() - t2) / 1e9
    println(f"[v08probe-chain$chainLen] components $roots " +
      f"time ${tChain}%.1f s rounds ${Dedup.lastRounds.get()} (distributed)")
    spark.stop()
  }
}
