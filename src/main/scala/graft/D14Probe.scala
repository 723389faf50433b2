package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Scale probe for incremental MinHash near-dup dedup (d14): a FIXED
  * daily batch (sf0.1 documents) deduped against an index that grows
  * SPARK_GRAFT_REPLICAS x — the production shape where the corpus index
  * dwarfs the ingest batch.
  *
  * The index honors the operator's density contract: it is INTERNALLY
  * deduped (production guarantees this — the index IS the accumulated
  * survivor set). Block 0 holds near-dups of the EVEN batch ids (the
  * realistic "this doc was already ingested" hits); every other block
  * is word-mangled into mutual dissimilarity. The cost driver to watch
  * is the LSH banding shuffle over index+batch signatures: linear in
  * index size, with bucket sizes bounded by construction. (The naive
  * first version of this probe replicated the SAME text 100x across
  * the index — out of contract, every bucket ~100 wide, quadratic pair
  * expansion, OOM: exactly the failure the contract note in
  * [[Dedup.incrementalMinhashDedup]] documents.)
  */
object D14Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val n0 = base.count()
    // block 0: near-dup witnesses for half the batch (suffix pad,
    // J ~ 0.97); blocks 1..R-1: every word block-suffixed, so all
    // shingles differ across blocks and against the batch (J = 0) —
    // an internally-clean index at scale
    val hits = base.filter(col("doc_id") % 2 === 0)
      .select((col("doc_id") + lit(n0)).as("doc_id"),
        concat(col("text"), lit(" idx")).as("text"))
    val filler = (1 until replicas).map { i =>
      base.select((col("doc_id") + lit((i + 1) * n0)).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(w, lit(s"_$i")))).as("text"))
    }
    val index = (hits +: filler).reduce(_ union _).persist()
    val nIdx = index.count()
    val batch = base.persist()
    batch.count()

    val t0 = System.nanoTime()
    val survivors = Dedup.incrementalMinhashDedup(
      batch, index, "doc_id", "text").count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[d14probe-${replicas}x] index $nIdx batch $n0 " +
      f"survivors $survivors time $sec%.1f s")
    spark.stop()
  }
}
