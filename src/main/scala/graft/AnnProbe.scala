package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** 10x scale probe for the quantized ANN tiers: sf0.1 embeddings
  * replicated 10x (20k vectors), 20 queries, k=5. Measures the brute
  * float scan against the int8 (s07) and PQ/ADC (s08) pipelines —
  * rescore and (for PQ) driver-side codebook training included, so the
  * numbers are end-to-end honest.
  */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    // dim tiling: repeat the 64-dim vector T times (T*64 dims) to probe
    // the high-dimension regime where float dots grow T-fold but the PQ
    // ADC scan stays m array reads per pair
    val tile = math.max(1, sys.env.getOrElse("SPARK_GRAFT_DIM_TILE", "1").toInt)
    val base0 = Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
    val base = if (tile == 1) base0
      else base0.select(col("vec_id"), flatten(array_repeat(col("embedding"), tile)).as("embedding"))
    val n0 = base.count()
    val corpus = (0 until replicas).map { i =>
      base.select((col("vec_id") + lit(i * n0)).as("vec_id"), col("embedding"))
    }.reduce(_ union _).persist()
    val n = corpus.count()
    val queries = corpus.filter(col("vec_id") < 20L).persist()
    queries.count()

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[ann${replicas}x.d${tile * 64}] $name rows $rows time ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    timed("brute_float") {
      Similarity.bruteForceTopK(corpus, queries, k = 5).count()
    }
    timed("int8_rescore") {
      Similarity.quantizedTopK(corpus, queries, k = 5, rescoreFactor = 4).count()
    }
    timed("pq_adc_rescore") {
      Similarity.pqTopK(corpus, queries, k = 5, m = 8 * tile, rescoreFactor = 8).count()
    }
    // amortized shape: codebooks trained once per corpus generation
    val books = Similarity.pqCodebooks(corpus, m = 8 * tile)
    timed("pq_adc_pretrained") {
      Similarity.pqTopK(corpus, queries, k = 5, m = 8 * tile, rescoreFactor = 8,
        trainedCodebooks = Some(books)).count()
    }
    // the PERSISTED artifact: training + encode paid once at build, every
    // query batch after that reads the encoded corpus from disk — the
    // s11/s12 production posture (query cost should sit near
    // pq_adc_pretrained minus the per-call encode, and the nprobe-pruned
    // variant reads only its probed list directories)
    val idxPath = java.nio.file.Files.createTempDirectory("graft_ann_probe").toString
    timed("index_build_once") {
      graft.operators.AnnIndex.build(corpus, idxPath, nlist = 64, m = 8 * tile)
      n
    }
    val idx = graft.operators.AnnIndex.load(spark, idxPath)
    timed("index_query_full") {
      idx.topK(queries, k = 5, nprobe = 0, rescoreFactor = 8).count()
    }
    timed("index_query_nprobe16") {
      idx.topK(queries, k = 5, nprobe = 16, rescoreFactor = 8).count()
    }
    // maintenance posture: 4 ingest appends fragment the list dirs, one
    // compaction generation restores them; queries unchanged either way
    for (r <- 0 until 4)
      graft.operators.AnnIndex.add(spark, idxPath,
        corpus.filter(pmod(col("vec_id"), lit(97)) === r)
          .select((col("vec_id") + lit(replicas * n0 * (r + 1))).as("vec_id"),
            col("embedding")))
    val filesBefore = graft.operators.AnnIndex.vectorFileCount(spark, idxPath)
    timed("index_compact") {
      graft.operators.AnnIndex.compact(spark, idxPath)
      graft.operators.AnnIndex.cleanup(spark, idxPath).size
    }
    val filesAfter = graft.operators.AnnIndex.vectorFileCount(spark, idxPath)
    println(s"[ann${replicas}x] vector_files_before_compact $filesBefore after $filesAfter")
    timed("index_query_post_compact") {
      graft.operators.AnnIndex.load(spark, idxPath)
        .topK(queries, k = 5, nprobe = 16, rescoreFactor = 8).count()
    }
    println(s"[ann${replicas}x] corpus $n")
    spark.stop()
  }
}
