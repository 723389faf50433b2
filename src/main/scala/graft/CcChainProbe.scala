package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Worst-case probe for the distributed connected-components loop: an
  * N-hop chain (default 1M) with ids PERMUTED along the chain (so min-id
  * can sit anywhere and nothing converges by luck), distributed path
  * forced via localEdgeThreshold = 0. A chain is the adversarial shape
  * for closure — no contraction shrinks it early, depth is maximal —
  * so this wall bounds what any real dup subgraph of the same edge
  * count can cost. Round-8 record (pre edge-contraction / observe-fold):
  * 1M-hop = 11 rounds, 79.0 s.
  */
object CcChainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val n = sys.env.getOrElse("SPARK_GRAFT_CHAIN", "1000000").toLong
    // deterministic pseudo-shuffle of ids along the chain: position i
    // holds id perm(i); consecutive positions are edges. An affine map
    // with a multiplier coprime to n permutes [0, n) exactly.
    val mult = 982451653L // prime, coprime to any n < mult
    def perm(i: Long): Long = (i * mult + 7L) % n
    val edges = spark.range(0, n - 1)
      .select(
        udfFreeAffine(col("id"), mult, 7L, n).as("id_a"),
        udfFreeAffine(col("id") + 1L, mult, 7L, n).as("id_b"))
      .persist()
    val e = edges.count()
    val t0 = System.nanoTime()
    val labels = Dedup.componentLabels(edges, "node",
      maxIter = 32, localEdgeThreshold = 0L)
    val comps = labels.select("component").distinct().count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[ccchain] n $n edges $e components $comps " +
      f"rounds ${Dedup.lastRounds.get()} time $sec%.1f s " +
      s"residual_cached_rdds ${spark.sparkContext.getPersistentRDDs.size}")
    require(comps == 1L, s"chain must close to one component, got $comps")
    spark.stop()
  }

  /** (i * mult + add) % n as a Column — pure arithmetic, no UDF. */
  private def udfFreeAffine(i: org.apache.spark.sql.Column, mult: Long,
                            add: Long, n: Long) =
    pmod(i * lit(mult) + lit(add), lit(n))
}
