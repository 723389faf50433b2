package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Scale probe for the image-dedup family: renders
  * `SPARK_GRAFT_REPLICAS` x the sf0.1 doc ids as real PNGs (every 4
  * consecutive ids a near-identical family), then times fingerprinting
  * (decode-bound, embarrassingly parallel) and the pigeonhole dedup
  * (16 bytes/row through the shuffle) separately — the expected shape
  * is decode >> dedup, both linear in image count.
  */
object V04Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    val base = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id")
    val n0 = base.count()
    val ids = (0 until replicas).map(i =>
      base.select((col("doc_id") + lit(i * n0)).as("doc_id")))
      .reduce(_ union _)

    val t0 = System.nanoTime()
    val fp = Multimodal.dHashFingerprints(
      Multimodal.syntheticCellImages(ids, "doc_id"))
      .persist()
    val nFp = fp.count()
    println(f"[v04probe-${replicas}x] fingerprint rows $nFp " +
      f"time ${(System.nanoTime() - t0) / 1e9}%.1f s (render+decode+hash)")

    val t1 = System.nanoTime()
    val nSurv = Dedup.fingerprintDedup(fp, "media_id", "fp", maxHamming = 3).count()
    println(f"[v04probe-${replicas}x] dedup survivors $nSurv " +
      f"time ${(System.nanoTime() - t1) / 1e9}%.1f s")
    spark.stop()
  }
}
