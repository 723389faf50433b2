package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.TextFunctions
import graft.operators.Dedup

object D03Probe {
  private def time[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[d03] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    docs.count()

    val shingled = docs.select(col("doc_id"),
      TextFunctions.wordShingles(col("text"), 3).as("shingles"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    time("shingled")(shingled.count())
    val sigs = shingled.select(col("doc_id"),
      Dedup.minhashSignature(col("shingles"), 64).as("sig"))
    time("signatures")(sigs.count())
    val cands = Dedup.lshCandidates(sigs, "doc_id", "sig", bands = 16, rows = 4)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nc = time("candidates")(cands.count())
    println(s"[d03] n_cands $nc")
    val verified = cands
      .join(shingled.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(shingled.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .filter(size(col("sh_a")) >= ceil(lit(0.8) * size(col("sh_b"))) &&
        size(col("sh_b")) >= ceil(lit(0.8) * size(col("sh_a"))))
      .filter(Dedup.jaccard(col("sh_a"), col("sh_b")) >= 0.8)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nv = time("verify")(verified.count())
    println(s"[d03] n_verified $nv")
    time("anti_join")(docs.select(col("doc_id"))
      .join(verified.select(col("id_b").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti").count())
    time("end_to_end_again")(
      Dedup.minhashDedup(docs, "doc_id", "text").count())
    spark.stop()
  }
}
