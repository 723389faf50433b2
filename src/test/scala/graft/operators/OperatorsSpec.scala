package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.core._
import graft.models._

/** Dedup/similarity operator semantics that the DuckDB oracle cannot
  * check (approximate paths), plus error-limit behavior.
  */
class OperatorsSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("documents"))
  private lazy val embs = spark.read.parquet(sf("embeddings"))
  // ANN recall is a statistical property — measure it on the same corpus
  // the gate queries run on (1000 vectors), not the 100-vector smoke set
  private lazy val embs01 =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

  test("int8 quantized scan + rescore equals the exact top-k (s07 params)") {
    // the s07 gate contract: int8 ordering only has to keep the true
    // top-5 inside the top-20 candidates; exact rescore then reproduces
    // the brute result bit for bit (cos comes from the same float kernel)
    val queries = embs01.filter(col("vec_id") < 20L)
    val exact = Similarity.bruteForceTopK(embs01, queries, k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val quant = Similarity.quantizedTopK(embs01, queries, k = 5, rescoreFactor = 4)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(quant == exact)
    // and WITHOUT rescore headroom the int8 scan alone is already close —
    // quantization noise on 64-dim vectors is small (recall floor 0.8)
    val bare = Similarity.quantizedTopK(embs01, queries, k = 5, rescoreFactor = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactIds = exact.map(t => (t._1, t._2))
    assert((bare & exactIds).size.toDouble / exactIds.size >= 0.8)
  }

  test("PQ ADC scan + rescore equals the exact top-k (s08 params)") {
    // PQ distortion (8 bytes/vector) is larger than int8's, so the gate
    // contract rides on a wider rescore margin: true top-5 within the
    // ADC top-40, then exact rescore reproduces the brute result
    val queries = embs01.filter(col("vec_id") < 20L)
    val exact = Similarity.bruteForceTopK(embs01, queries, k = 5)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val pq = Similarity.pqTopK(embs01, queries, k = 5, rescoreFactor = 8)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pq == exact)
    // the bare ADC ordering alone (no rescore headroom) keeps most of
    // the true neighbors — the scan is a real ranking, not a sieve
    val bare = Similarity.pqTopK(embs01, queries, k = 5, rescoreFactor = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactIds = exact.map(t => (t._1, t._2))
    assert((bare & exactIds).size.toDouble / exactIds.size >= 0.6)
  }

  test("IVF top-k recall vs brute force is >= 0.8 (s04 params)") {
    // this corpus is UNIFORM random (no cluster structure), the
    // worst case for IVF: k-means-trained balanced lists at
    // nprobe/nlist = 12/32 (37% of lists probed) read 0.82 here, and
    // k-means beats untrained centroids at every (nlist, nprobe) tried.
    // On real clustered embeddings the same operator probes ~10% for
    // higher recall.
    val queries = embs01.filter(col("vec_id") < 20L)
    val exact = Similarity.bruteForceTopK(embs01, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(embs01, queries, k = 5, nlist = 32, nprobe = 12)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall")
  }

  test("LSH near-dup recall with amplification matched to the threshold") {
    // Hyperplane LSH capture = 1-(1-p^bits)^tables with p = 1 - angle/pi.
    // The corpus's strongest pairs sit near cos 0.48 (p~0.66), so dedup
    // at that threshold needs few bits and many tables: 3x16 -> ~0.99.
    val dupPairs = Similarity.cosineNearDupPairs(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dupPairs.nonEmpty)
    val lsh = Similarity.lshTopK(embs, embs, k = 10, dim = 64,
      bits = 3, tables = 16)
      .filter(col("cos") >= 0.45)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val recall = (dupPairs & lsh).size.toDouble / dupPairs.size
    assert(recall >= 0.9, s"LSH near-dup recall $recall")
  }

  test("LSH top-k with query-directed multi-probe: recall >= 0.9 (s02 params)") {
    // single-probe at these settings reads ~0.2 recall; probing the
    // hamming-1 buckets on the query side lifts it above 0.9 without
    // touching the corpus-side bucket layout
    val queries = embs01.filter(col("vec_id") < 20L)
    val exact = Similarity.bruteForceTopK(embs01, queries, k = 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.lshTopK(embs01, queries, k = 5, dim = 64,
      bits = 6, tables = 8, probes = 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"multi-probe LSH recall $recall")
  }

  test("IVF-blocked pair scan: verified subset of brute pairs, high capture") {
    val brute = Similarity.cosineNearDupPairs(embs01, 0.45)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.cosineNearDupPairsIvf(embs01, 0.45)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.subsetOf(brute)) // exact-cosine verify: no false positives
    val capture = (ivf & brute).size.toDouble / brute.size
    assert(capture >= 0.9, s"IVF pair capture $capture")
  }

  test("minhash dedup agrees with exact n-gram jaccard on the gapped corpus") {
    val a = Dedup.minhashDedup(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val b = Dedup.ngramJaccardDedup(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("simhash: identical docs collide, different docs differ") {
    val fp = docs.limit(50).select(col("doc_id"),
      Dedup.simhash(col("text")).as("fp"))
    val n = fp.select("fp").distinct().count()
    assert(n > 1) // not everything collapses
    // doc deduped against itself: union of corpus with itself keeps one copy
    val doubled = docs.union(docs)
    val survivors = Dedup.exactByHash(doubled, "text", "doc_id")
    assert(survivors.count() == Dedup.exactByHash(docs, "text", "doc_id").count())
  }

  test("dedup survivors always form a subset with min-id kept") {
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = Dedup.minhashDedup(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept.subsetOf(all))
    assert(kept.contains(all.min)) // the smallest id can never be dropped
  }

  test("TolerantMapper: under-limit errors drop rows; at-limit aborts the step") {
    val schema = StructType(Seq(StructField("doc_id", LongType)))
    val failOdd: Row => Row = r => {
      val id = r.getLong(0)
      if (id % 2 == 1) sys.error(s"boom $id") else Row(id)
    }
    val ctx = StepContext(spark, Calendar.day("2023-01-01"))
    val ids = docs.select("doc_id").limit(10)

    // generous limit: odd rows dropped, evens survive, no abort
    val tol = TolerantMapper(failOdd, schema, errorLimit = 1000L)
    val out = tol.transform(ctx, ids)
    assert(out.collect().forall(_.getLong(0) % 2 == 0))
    assert(tol.errors == 5)
    tol.release(ctx) // under limit: no throw

    // limit 1: the reference default — first error aborts at release
    val strict = TolerantMapper(failOdd, schema, errorLimit = 1L)
    strict.transform(ctx, ids).count()
    intercept[ErrorLimitExceeded](strict.release(ctx))

    // inside a pipeline: task status E
    val dir = java.nio.file.Files.createTempDirectory("tol").toString
    val p = Pipeline(
      ParquetModel(sf("documents").stripSuffix(".parquet") + ".parquet"),
      Mapper(df => df.select("doc_id")),
      ParquetModel(dir + "/ok"))
    assert(p.run(spark, Calendar.day("2023-01-01")).status == Status.Done)
    val failing = new Pipeline("tolerant", Seq(
      One(ParquetModel(sf("documents").stripSuffix(".parquet") + ".parquet")),
      One(TolerantMapper(r => Row(r.getAs[Long]("doc_id")),
        schema, errorLimit = 0L)), // zero budget: always aborts
      One(ParquetModel(dir + "/never"))))
    assert(failing.run(spark, Calendar.day("2023-01-01")).status == Status.Error)
  }

  test("connected components collapse transitive duplicate chains") {
    import spark.implicits._
    val ids = (1L to 8L).toDF("doc_id")
    // components: {1,2,3} via chain 1-2, 2-3; {5,6}; singletons 4,7,8
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(ids, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L))
    val survivors = Dedup.clusteredSurvivors(ids, pairs, "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 4L, 5L, 7L, 8L))
    // single-pass policy would ALSO drop only 2,3,6 here; a chain where
    // transitivity matters: 10-11, 11-12 with no direct 10-12 edge
    val ids2 = Seq(10L, 11L, 12L).toDF("doc_id")
    val chain = Seq((10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    assert(Dedup.clusteredSurvivors(ids2, chain, "doc_id")
      .collect().map(_.getLong(0)).toSet == Set(10L))
  }

  test("connected components close a 300-hop chain in O(log d) rounds") {
    import spark.implicits._
    // a pure path graph 0-1-2-...-300 — the worst case for plain
    // hash-min propagation (O(diameter) rounds: 300 here, far past the
    // default maxIter) and exactly the re-encode-chain shape the v08
    // image-components gate builds. Pointer jumping must close it
    // within the DEFAULT round budget.
    val n = 300L
    val ids = (0L to n).toDF("id")
    val chain = (0L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // localEdgeThreshold = 0 forces the DISTRIBUTED loop (the default
    // adaptive path would close 300 edges with driver union-find)
    val comp = Dedup.connectedComponents(ids, chain, "id",
      localEdgeThreshold = 0L)
      .select("component").distinct().collect().map(_.getLong(0))
    assert(comp.toSeq == Seq(0L))
    val rounds = Dedup.lastRounds.get()
    assert(rounds > 0 && rounds <= 10,
      s"expected O(log d) distributed rounds for d=300, got $rounds")
    // the driver union-find path must produce IDENTICAL labels — and a
    // shuffled id placement (worst case for the jump heuristic) must
    // not change either answer
    val perm = { // deterministic pseudo-shuffle of ids along the chain
      val xs = (0L to n).toArray
      var s = 12345L
      for (i <- xs.indices.reverse.dropRight(1)) {
        s = s * 6364136223846793005L + 1442695040888963407L
        val j = ((s >>> 33) % (i + 1)).toInt
        val t = xs(i); xs(i) = xs(j); xs(j) = t
      }
      xs
    }
    val chainP = (0 until n.toInt)
      .map(i => (perm(i), perm(i + 1))).toDF("id_a", "id_b")
    val local = Dedup.connectedComponents(ids, chainP, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Dedup.lastRounds.get() == 0, "expected the driver union-find path")
    val dist = Dedup.connectedComponents(ids, chainP, "id",
      localEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist)
    assert(local.values.toSet == Set(0L))
  }

  test("clusteredSurvivorsBy keeps the best-scoring doc per component") {
    import spark.implicits._
    // component {1,2,3}: best score on 2 (NOT the min id); {5,6}: tie on
    // score -> min id 5; singletons 4,7 keep themselves regardless
    val docs = Seq((1L, 0.3), (2L, 0.9), (3L, 0.5), (4L, 0.0),
      (5L, 0.7), (6L, 0.7), (7L, 0.1)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = Dedup.clusteredSurvivorsBy(docs, pairs, "doc_id", col("q"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 4L, 5L, 7L))
  }

  test("bandedSurvivorsBy: dense pre-collapse + exact transitive (d13)") {
    import spark.implicits._
    // {1,2,3}: near-identical replica family (pairwise J >= 0.93) — stage 1
    // collapses it to min id 1 even though 2 has the best quality (the
    // documented semantics: at preThreshold the copies differ by a token,
    // quality differences inside the family are noise). 10: moderately
    // similar to the family (J(1,10) = 26/30 = 0.867 — below 0.9, above
    // 0.8), better quality than 1 — stage 2's argmax must pick it.
    val base = (0 until 30).map(i => s"a$i").mkString(" ")
    val mod = ((0 until 28).map(i => s"a$i") ++ Seq("b0", "b1")).mkString(" ")
    val corpus = Seq(
      (1L, base, 0.5), (2L, base + " x1", 0.99), (3L, base + " x2", 0.4),
      (10L, mod, 0.9),
      (20L, (0 until 30).map(i => s"c$i").mkString(" "), 0.1),
      (21L, (0 until 30).map(i => s"d$i").mkString(" "), 0.2))
      .toDF("doc_id", "text", "q")
    val kept = Dedup.bandedSurvivorsBy(corpus, "doc_id", "text", col("q"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 20L, 21L))
    // contrast with single-stage d12 on the same corpus: there the whole
    // {1,2,3,10} component resolves by quality alone and the family's
    // best copy (2) survives — d13 trades that for pair-linear scaling
    val d12 = Dedup.clusteredSurvivorsBy(corpus,
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text"), "doc_id", col("q"))
      .collect().map(_.getLong(0)).toSet
    assert(d12 == Set(2L, 20L, 21L))
    // stage 1 alone: the replica family collapses to its min id, the
    // moderate pair (1,10) must SURVIVE pre-collapse intact
    val pre = Dedup.bandedPreCollapse(corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(pre == Set(1L, 10L, 20L, 21L))
  }

  test("bandingCoverageGap is 0 at d13 defaults, nonzero when banding starves") {
    import spark.implicits._
    // replica family {1,2,3} + a distinct pair {20,21}: at the d13
    // defaults (16 bands of 4) every >= 0.9-similar pair is captured
    // with probability ~1-4e-8, so the banded closure must equal the
    // exact closure
    val base = (0 until 30).map(i => s"a$i").mkString(" ")
    val corpus = Seq(
      (1L, base), (2L, base + " x1"), (3L, base + " x2"),
      (20L, (0 until 30).map(i => s"c$i").mkString(" ")),
      (21L, (0 until 30).map(i => s"d$i").mkString(" ")))
      .toDF("doc_id", "text")
    assert(Dedup.bandingCoverageGap(corpus, "doc_id", "text") == 0L)
    // starved banding (1 band of 64 rows) on a single pair at J = 55/61
    // ~ 0.902 — just past the threshold, so the one band captures it
    // with probability 0.902^64 ~ 0.1%: the realized (seed-fixed)
    // signatures all but surely miss it, and the diagnostic must SEE
    // that instead of the downstream gate failing mutely. (The replica
    // family above sits at J ~ 0.97 where even one band captures with
    // ~11% per pair — too similar to starve reliably.)
    val longBase = (0 until 60).map(i => s"a$i")
    val marginal = Seq(
      (1L, longBase.mkString(" ")),
      (2L, (longBase.take(57) ++ Seq("b0", "b1", "b2")).mkString(" ")),
      (20L, (0 until 60).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val gap = Dedup.bandingCoverageGap(marginal, "doc_id", "text",
      numHashes = 64, bands = 1)
    assert(gap > 0L,
      "1-band LSH should miss the marginal J~0.902 pair")
    // sanity: the d13 defaults capture that same pair (16 bands of 4:
    // miss probability (1 - 0.902^4)^16 ~ 0.3%)
    assert(Dedup.bandingCoverageGap(marginal, "doc_id", "text") == 0L)
  }

  test("fingerprintDedup equals brute all-pairs hamming on random prints") {
    import spark.implicits._
    // deterministic pseudo-random 64-bit prints with planted near-dups:
    // every 5th id is its predecessor with 2 bits flipped (hamming 2)
    def splitmix(i: Long): Long = {
      var z = i * 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    val prints = (0L until 200L).map { i =>
      val base = splitmix(i - (i % 5))
      (i, if (i % 5 == 0) base else base ^ (1L << (i % 63)) ^ (1L << 7))
    }
    val fp = prints.toDF("id", "fp")
    val got = Dedup.fingerprintDedup(fp, "id", "fp", maxHamming = 3)
      .collect().map(_.getLong(0)).toSet
    val brute = prints.map(_._1).filterNot { b =>
      prints.exists { case (a, fpa) =>
        a < b && java.lang.Long.bitCount(
          fpa ^ prints(b.toInt)._2) <= 3
      }
    }.toSet
    assert(got == brute && got.size < 200)
  }

  test("fingerprintDedup survives dense identical copies past maxBucket") {
    import spark.implicits._
    // 5000 copies of ONE fingerprint with maxBucket = 10: the capped
    // form would silently drop every pair (bucket size 5000 >> 10) and
    // report 5000 survivors; the rep-collapse form must report 1
    val fp = (0L until 5000L).map(i => (i, 0x0F0F0F0F0F0F0F0FL)).toDF("id", "fp")
    val surv = Dedup.fingerprintDedup(fp, "id", "fp",
      maxHamming = 3, maxBucket = 10).collect().map(_.getLong(0))
    assert(surv.toSeq == Seq(0L))
    // and the closure over the star edges is one component rooted at 0
    val comp = Dedup.connectedComponents(fp.select("id"),
      Dedup.fingerprintPairs(fp, "id", "fp", maxBucket = 10), "id")
      .select("component").distinct().collect().map(_.getLong(0))
    assert(comp.toSeq == Seq(0L))
  }

  test("image dHash: identical images collide, variants land within hamming 2") {
    val a0 = Multimodal.syntheticCellPng(0L, 36, 32, 4)
    val a1 = Multimodal.syntheticCellPng(1L, 36, 32, 4) // variant of family 0
    val b0 = Multimodal.syntheticCellPng(40L, 36, 32, 4) // other family
    val h0 = Multimodal.ImageIoCodec.dHash(a0).get
    val h1 = Multimodal.ImageIoCodec.dHash(a1).get
    val hb = Multimodal.ImageIoCodec.dHash(b0).get
    assert(Multimodal.ImageIoCodec.dHash(a0).get == h0) // deterministic
    assert(java.lang.Long.bitCount(h0 ^ h1) <= 2) // one perturbed cell
    assert(java.lang.Long.bitCount(h0 ^ hb) > 3) // families differ
    assert(Multimodal.ImageIoCodec.dHash(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("AudioWavCodec: encode -> decode roundtrip is sample-exact") {
    val samples = Array.tabulate(2048)(t =>
      (((t.toLong * 5 + 3 * 13) % 2001L) - 1000L).toInt)
    val wav = Multimodal.pcm16Wav(samples, 8000)
    assert(Multimodal.AudioWavCodec.samples(wav).get.sameElements(samples))
    val (n, rate, mean) = Multimodal.AudioWavCodec.stats(wav).get
    assert(n == 2048 && rate == 8000)
    assert(mean == samples.map(s => math.abs(s).toLong).sum.toDouble / 2048)
    // resample picks src(floor(i*n/target)) — exact integer mapping
    val res = Multimodal.AudioWavCodec.resize(wav, 32, 16)
    val rs = Multimodal.AudioWavCodec.samples(res).get
    assert(rs.length == 512 && rs.indices.forall(i => rs(i) == samples(4 * i)))
    // non-audio payloads are rejected, not mis-decoded
    assert(Multimodal.AudioWavCodec.samples(Array[Byte](9, 9, 9)).isEmpty)
  }

  test("AviCodec: container roundtrip demuxes the exact frame payloads") {
    val frames = (0 until 3).map(k =>
      Array.tabulate(16 * 12 * 3)(i => ((i + 7 * k) % 251).toByte))
    val avi = Multimodal.bgrAvi(frames, w = 16, h = 12, fps = 10)
    val (w, h, got) = Multimodal.AviCodec.demux(avi).get
    assert(w == 16 && h == 12 && got.length == 3)
    assert(got.zip(frames).forall { case (a, b) => a.sameElements(b) })
    // mean gray reads the blue channel of the bottom-up raster
    val flat = Array.fill(16 * 12 * 3)(100.toByte)
    assert(Multimodal.AviCodec.frameMeanGray(flat, 16, 12) == 100.0)
    // non-AVI payloads are rejected, not mis-parsed
    assert(Multimodal.AviCodec.demux("RIFFxxxx".getBytes).isEmpty)
    assert(Multimodal.AviCodec.demux(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("removeRepeatedSpans: shared tile survives only in the min-id owner") {
    import spark.implicits._
    val d = Seq(
      (1L, "a b c d e f g h unique one text here now ok yes"),
      (2L, "a b c d e f g h other two text goes right here why"),
      (3L, "totally distinct document with its very own words here")
    ).toDF("doc_id", "text")
    val out = Chunker.removeRepeatedSpans(d, "doc_id", "text", tileTokens = 8)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 1 keeps both tiles; doc 2 loses the shared first tile
    assert(out(1L).getAs[Long]("n_tiles_kept") == 2L)
    assert(out(2L).getAs[Long]("n_tiles_kept") == 1L)
    assert(out(2L).getAs[String]("clean_text") ==
      "other two text goes right here why")
    assert(out(3L).getAs[Long]("n_tiles_kept") == out(3L).getAs[Long]("n_tiles"))
  }

  test("BPE trainer learns the hand-computed merges and the applier agrees") {
    import spark.implicits._
    // classic shape: "aaab" x3, "aab" x2 -> pair counts round 1:
    // (a,a) = 2*3 + 1*2 = 8, (a,b) = 3+2 = 5 -> merge (a,a)
    // round 2 over {aa a b x3, aa b x2}: (aa,a)=3, (aa,b)=2, (a,b)=3
    // -> tie 3 between (a,b) and (aa,a); lexicographic: (a,b)
    val d = Seq.fill(3)((1L, "aaab")).zipWithIndex.map { case ((_, t), i) => (i.toLong, t) } ++
      Seq((10L, "aab"), (11L, "aab"))
    val df = d.toDF("doc_id", "text")
    val merges = Tokenizer.trainBpeMerges(df, "text", numMerges = 3)
    // round 3 then merges the merged symbols themselves: (aa, ab) x3
    assert(merges.map(m => (m._2, m._3, m._4)) ==
      Seq(("a", "a", 8L), ("a", "b", 3L), ("aa", "ab", 3L)))
    // with the first two merges: aaab -> [aa, ab]; aab -> [aa, b]
    val merges2 = Tokenizer.trainBpeMerges(df, "text", numMerges = 2)
    val ranks2 = merges2.map { case (r, a, b, _) => ((a, b), r) }.toMap
    assert(Tokenizer.segment("aaab", ranks2).toSeq == Seq("aa", "ab"))
    assert(Tokenizer.segment("aab", ranks2).toSeq == Seq("aa", "b"))
    // all three merges collapse the training word completely
    val ranks3 = merges.map { case (r, a, b, _) => ((a, b), r) }.toMap
    assert(Tokenizer.segment("aaab", ranks3).toSeq == Seq("aaab"))
    // distributed applier agrees with the driver-side segmenter
    val seg = Tokenizer.segmentTokens(df, "doc_id", "text", merges2)
      .filter(col("doc_id") === 0L).select("segments").collect()
    assert(seg(0).getSeq[String](0) == Seq("aa", "ab"))
    // more merges never increase the segment count of any token
    assert(Tokenizer.segment("aaab", ranks3).length <=
      Tokenizer.segment("aaab", ranks2).length)
    // determinism
    assert(Tokenizer.trainBpeMerges(df, "text", numMerges = 3) == merges)
  }

  test("embedding near-dup dedup keeps min-id survivors") {
    val pairs = Similarity.cosineNearDupPairs(embs, 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.map(_._2).toSet
    val kept = Similarity.cosineNearDupDedup(embs, 0.45,
        strategy = Similarity.PairScanStrategy.Brute)
      .collect().map(_.getLong(0)).toSet
    assert(kept.intersect(dropped).isEmpty)
    assert(kept.size == embs.count() - dropped.size)
  }

  test("dedup scale strategies (IVF, LSH, Auto) match the brute survivors") {
    import Similarity.PairScanStrategy._
    def survivors(s: Similarity.PairScanStrategy): Set[Long] =
      Similarity.cosineNearDupDedup(embs01, 0.45, strategy = s)
        .collect().map(_.getLong(0)).toSet
    val brute = survivors(Brute)
    // gate-corpus capture is total for both bucketed scans (s05/s06), so
    // the survivor sets are EQUAL, not merely supersets
    assert(survivors(Ivf(nlist = 32, nprobe = 8)) == brute)
    assert(survivors(Lsh(bits = 2, tables = 24)) == brute)
    // Auto at a moderate threshold routes to a bucketed path, never brute;
    // a missed candidate can only KEEP extra rows, never drop a true
    // survivor, so brute's survivors are always a subset
    assert(brute.subsetOf(survivors(Auto)))
  }
}
