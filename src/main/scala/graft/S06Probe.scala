package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity
object S06Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.01", "0.1")) {
      val e = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val exact = Similarity.cosineNearDupPairs(e, 0.45).cache()
      val nEx = exact.count()
      for (np <- Seq(8, 12, 16, 24, 32)) {
        val ivf = Similarity.cosineNearDupPairsIvf(e, 0.45, nlist = 32, nprobe = np)
        val hit = ivf.join(exact, Seq("id_a", "id_b"), "inner").count()
        val nIvf = ivf.count()
        println(s"[s06] sf=$sf nprobe=$np exact=$nEx ivf=$nIvf capture=${hit.toDouble / nEx}")
      }
      exact.unpersist()
    }
    spark.stop()
  }
}
