package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k via broadcast crossjoin —
  *    the baseline and the verify oracle. Right answer whenever the QUERY
  *    side fits in a broadcast (the corpus side streams; cost is
  *    |corpus| * |queries| dot products, embarrassingly parallel, zero
  *    shuffle beyond the final per-query top-k).
  *  - [[lshTopK]]: random-hyperplane LSH bucketing — corpus and queries
  *    hash to signature buckets; only same-bucket (under several
  *    independent tables) pairs are scored. Recall is tunable via
  *    (bits, tables); cost drops from |C|*|Q| to sum of bucket products.
  *    This is the 100 TB path: the shuffle key is (table, signature), and
  *    no executor ever sees more than one bucket's pairs.
  */
object Similarity {

  /** Exact top-k neighbors for every row of `queries` against `corpus`.
    * Returns (queryIdCol, neighborId, cos) with rank<=k, cosine desc,
    * neighbor id asc tie-break (fully deterministic).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Query-directed range search: every corpus vector within a cosine
    * radius of each query (the retrieval primitive where the RESULT SIZE
    * is data-dependent — top-k's sibling). Same scale shape as
    * [[bruteForceTopK]]: queries broadcast, corpus streams, zero corpus
    * shuffle and no window at all — the threshold filter runs inside the
    * scan stage, so the only shuffled rows are actual matches.
    */
  def rangeSearch(corpus: DataFrame, queries: DataFrame, threshold: Double,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
    c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Approximate top-k via multi-table random-hyperplane LSH with
    * QUERY-DIRECTED MULTI-PROBE (Lv et al., VLDB'07): besides its exact
    * bucket, each query also probes every bucket within hamming radius
    * `probes` of its signature. Recall rises steeply (a near neighbor
    * differing in one sign bit is still found) while the CORPUS side
    * stays one bucket per (vector, table) — probing cost is query-side
    * only, which is exactly where you can afford it at 100 TB: the
    * corpus shuffle is linear in |C|*tables regardless of probe radius.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              bits: Int = 12, tables: Int = 4, probes: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeSelf: Boolean = true): DataFrame = {
    require(probes >= 0 && probes <= 2, "probe radius 0..2 supported")
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          posexplode(hyperplaneSignatures(col(vecCol), bits, tables, seed = 42L)))
        .toDF(id, vec, "table", "sig")
    val c = bucketed(corpus, "neighbor_id", "__cv")
    val q0 = bucketed(queries, "query_id", "__qv")
    // probe keys: signature plus all single-bit (and for radius 2,
    // two-bit) flips — (bits choose <=probes) keys per (query, table)
    val flips: Seq[Long] =
      (if (probes >= 1) (0 until bits).map(b => 1L << b) else Seq.empty) ++
      (if (probes >= 2)
        for { a <- 0 until bits; b <- a + 1 until bits } yield (1L << a) | (1L << b)
      else Seq.empty)
    val q =
      if (flips.isEmpty) q0
      else q0.select(col("query_id"), col("__qv"), col("table"),
        explode(array((lit(0L) +: flips.map(lit(_))).map(f =>
          col("sig").bitwiseXOR(f)): _*)).as("sig"))
    val scored = c.join(q, Seq("table", "sig"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
      .groupBy("query_id", "neighbor_id").agg(first("cos").as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** IVF (inverted-file) approximate top-k — the scale path for
    * moderate-similarity neighbor search, where sign-bit LSH recall
    * collapses (hyperplane LSH only concentrates for very high cosine).
    *
    * Coarse quantizer: `nlist` spherical-k-means centroids trained on a
    * deterministic sample ([[kmeansCentroids]]). Every corpus vector is
    * assigned to its nearest centroid (1 list); every query probes its
    * `nprobe` nearest lists. The join key is the centroid id, so the
    * shuffle moves each corpus vector ONCE and each query `nprobe`
    * times — sum-of-list-sizes work instead of |C|x|Q|.
    */
  /** Spherical k-means (cosine Lloyd) on a deterministic sample —
    * coarse-quantizer training for [[ivfTopK]]. The sample is the first
    * `sampleSize` rows in xxhash64(id) order (deterministic AND unbiased
    * w.r.t. id locality, unlike lowest-id); init = first `nlist` sample
    * vectors; each round assigns to the most-cosine centroid and
    * recomputes normalized means. At 100 TB the collect is the only
    * driver-side step (sampleSize x dim doubles, a few MB); training is
    * O(sample * nlist * dim * iters) — noise next to one corpus scan.
    */
  def kmeansCentroids(corpus: DataFrame, nlist: Int, iters: Int = 10,
                      sampleSize: Int = 4096,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): Array[Array[Double]] = {
    def normed(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val sample: Array[Array[Double]] = corpus
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
      .limit(sampleSize)
      .select(vecCol).collect()
      .map(r => normed(r.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray))
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    val dim = sample.head.length
    var cents = sample.take(nlist).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val cnt = new Array[Int](nlist)
      sample.foreach { v =>
        var best = 0; var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < nlist) {
          var dot = 0.0; var i = 0
          while (i < dim) { dot += v(i) * cents(c)(i); i += 1 }
          if (dot > bestDot) { best = c; bestDot = dot }
          c += 1
        }
        val s = sums(best); var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        cnt(best) += 1
      }
      cents = Array.tabulate(nlist)(c => if (cnt(c) == 0) cents(c) else normed(sums(c)))
      it += 1
    }
    cents
  }

  /** Per-group embedding diversity: mean pairwise cosine of the unit
    * vectors in each group, computed WITHOUT pair expansion via the
    * moment identity  mean = (‖Σv̂‖² − Σ‖v̂‖²) / (n(n−1))  — one
    * map-side-combined pass of O(n·d) instead of O(n²·d) pairs; the
    * way to put a diversity number on a 100 TB corpus slice. All
    * cross-row sums run through DECIMAL(38,6) ([[graft.functions.decSum]])
    * so the result is independent of partial-aggregation order and
    * bit-equal to the engine-independent oracle. Singleton groups score
    * 0.0 by convention.
    */
  def diversityByGroup(df: DataFrame, groupCol: String,
                       vecCol: String): DataFrame = {
    import graft.functions.decSum
    val vD = transform(col(vecCol), x => x.cast("double"))
    def sumSq(c: Column): Column =
      aggregate(c, lit(0.0), (a, x) => a + x * x)
    val norm = sqrt(sumSq(vD))
    val unit = when(norm === 0.0, vD)
      .otherwise(transform(vD, x => x / norm))
    val rows = df.select(col(groupCol), unit.as("__u"))
      .withColumn("__rn2", sumSq(col("__u")))
    val perDim = rows
      .select(col(groupCol), posexplode(col("__u")).as(Seq("__d", "__x")))
      .groupBy(groupCol, "__d")
      .agg(decSum(col("__x")).as("__s"))
    val sumsqOfSums = perDim
      .select(col(groupCol), (col("__s") * col("__s")).as("__s2"))
      .groupBy(groupCol).agg(decSum(col("__s2")).as("__ss"))
    val perGroup = rows.groupBy(groupCol)
      .agg(count(lit(1)).as("n_vectors"), decSum(col("__rn2")).as("__un"))
    perGroup.join(sumsqOfSums, Seq(groupCol))
      .select(col(groupCol), col("n_vectors"),
        when(col("n_vectors") < 2, lit(0.0))
          .otherwise((col("__ss") - col("__un")) /
            (col("n_vectors") * (col("n_vectors") - 1)).cast("double"))
          .as("mean_pairwise_cos"))
  }

  /** Semantic bucketing by FIXED anchor vectors: every corpus vector is
    * assigned to the anchor with the highest cosine (ties → lower anchor
    * id) — cluster assignment under an externally supplied codebook, the
    * primitive behind concept-bucketed corpus slicing and SemDeDup-style
    * per-cluster work queues. The anchors are collected to the driver
    * (bounded: |anchors| × dim doubles) and embedded in one
    * [[graft.expressions.NearestCentroids]] kernel — a codegen'd
    * O(|anchors|·dim) pass per row with NO row expansion, vs the
    * crossJoin+argmax form's |corpus|×|anchors| blow-up; the reported
    * cosine is recomputed by the s03-gated kernel after a broadcast join
    * on the tiny anchor table. Zero corpus shuffle.
    */
  def assignToAnchors(corpus: DataFrame, anchors: DataFrame,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame = {
    import graft.expressions.{kernels, NearestCentroids}
    val anchorRows: Array[(Long, Array[Double])] = anchors
      .select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Any](1).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray))
      .sortBy(_._1)
    require(anchorRows.nonEmpty, "anchors must be non-empty")
    val centroids = anchorRows.map(_._2)
    val ids: Seq[Long] = anchorRows.map(_._1).toSeq
    val av = anchors.select(col(idCol).as("anchor_id"), col(vecCol).as("__av"))
    corpus
      .withColumn("anchor_id", element_at(typedlit(ids),
        element_at(kernels.toCol(
          NearestCentroids(kernels.toExpr(col(vecCol)), centroids, 1)), 1) + 1))
      .join(broadcast(av), Seq("anchor_id"))
      .select(col(idCol), col("anchor_id"),
        cosine(col(vecCol), col("__av")).as("cos"))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 64, nprobe: Int = 8, trainIters: Int = 10,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeSelf: Boolean = true): DataFrame = {
    import graft.expressions.{kernels, NearestCentroids}
    val centroids: Array[Array[Double]] =
      kmeansCentroids(corpus, nlist, trainIters, idCol = idCol, vecCol = vecCol)
    def assign(df: DataFrame, n: Int): Column =
      kernels.toCol(NearestCentroids(kernels.toExpr(col(vecCol)), centroids, n))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      assign(corpus, 1)(0).as("cid"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      explode(assign(queries, nprobe)).as("cid"))
    val scored = c.join(q, "cid")
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Quantized top-k: int8 scan + exact rescore — the memory-bandwidth
    * scale path. Phase 1 scores every (corpus, query) pair on int8
    * vectors (1 byte/dim: 4x less traffic than float through the scan,
    * and the query broadcast shrinks 4x) keeping `k * rescoreFactor`
    * candidates per query; phase 2 rescores ONLY those candidates with
    * exact float cosine (a candidate-driven second corpus read — narrow,
    * broadcast-joined) and takes the final top-k. With a sufficient
    * rescore margin the result EQUALS the exact brute scan: the true
    * top-k just has to survive into the int8 top-(k*factor), a much
    * weaker condition than int8 preserving the full order (s07 is gated
    * against the exact s01 oracle on this basis; the margin is
    * spec-asserted).
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    rescoreFactor: Int = 4,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    excludeSelf: Boolean = true): DataFrame = {
    // same cache-boundary rationale as pqTopK: without it the int8
    // encode collapses into the join projection and runs per pair
    val qc = corpus.select(col(idCol).as("neighbor_id"),
      quantizeInt8(col(vecCol)).as("__qc"))
      .persist()
    val qq = queries.select(col(idCol).as("query_id"),
      quantizeInt8(col(vecCol)).as("__qq"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    val cands = qc.crossJoin(broadcast(qq))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        int8Cos(col("__qq"), col("__qc")).as("qcos"))
      .withColumn("__qr", row_number().over(wq))
      .filter(col("__qr") <= k * rescoreFactor)
      .select("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
        "neighbor_id")
      .join(broadcast(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Product-quantization codebooks: `m` subspaces x `k` centroids,
    * trained by plain L2 Lloyd per subspace on the SAME deterministic
    * xxhash-ordered sample as [[kmeansCentroids]] (a few MB on the
    * driver; training is noise next to one corpus scan). Returns
    * codebooks(j)(c)(d) for [[pqTopK]]'s encode/LUT kernels.
    */
  def pqCodebooks(corpus: DataFrame, m: Int = 8, k: Int = 256,
                  iters: Int = 10, sampleSize: Int = 4096,
                  idCol: String = "vec_id",
                  vecCol: String = "embedding"): Array[Array[Array[Double]]] = {
    val sample: Array[Array[Double]] = corpus
      .orderBy(xxhash64(col(idCol)).asc, col(idCol).asc)
      .limit(sampleSize)
      .select(vecCol).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray)
    require(sample.nonEmpty, "empty training sample")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val ds = dim / m
    // subspaces train independently — run them on parallel driver threads
    // (bit-identical per subspace; ~m-fold wall-clock cut of the one
    // driver-side stage in the PQ pipeline)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val trained = Array.tabulate(m) { j => Future {
      val subs = sample.map(v => java.util.Arrays.copyOfRange(v, j * ds, (j + 1) * ds))
      val kk = math.min(k, subs.length)
      var cents = subs.take(kk).map(_.clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(kk)(new Array[Double](ds))
        val cnt = new Array[Int](kk)
        subs.foreach { v =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < kk) {
            var d2 = 0.0; var d = 0
            while (d < ds) { val df = v(d) - cents(c)(d); d2 += df * df; d += 1 }
            if (d2 < bestD) { bestD = d2; best = c }
            c += 1
          }
          val s = sums(best); var d = 0
          while (d < ds) { s(d) += v(d); d += 1 }
          cnt(best) += 1
        }
        cents = Array.tabulate(kk)(c =>
          if (cnt(c) == 0) cents(c)
          else sums(c).map(_ / cnt(c)))
        it += 1
      }
      cents
    } }
    trained.map(f => Await.result(f, Duration.Inf))
  }

  /** PQ top-k: asymmetric-distance scan over `m`-byte codes + exact
    * rescore — the deepest compression tier (32x smaller than float32 at
    * 64 dims; [[quantizedTopK]] is the 4x tier). The corpus carries only
    * (id, code, reconstructed norm); each query precomputes its ADC
    * lookup table ONCE (`PqLut`), so scoring a pair is `m` array reads,
    * not a dot product. Candidates (k * rescoreFactor per query, by
    * approximate cosine) are rescored with the exact float kernel — with
    * sufficient margin the result equals the brute top-k, the s08 gate
    * contract on the test corpus (margin spec-asserted; PQ distortion is
    * larger than int8's, hence the bigger default factor).
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, codebookSize: Int = 256, rescoreFactor: Int = 8,
             idCol: String = "vec_id", vecCol: String = "embedding",
             excludeSelf: Boolean = true,
             trainedCodebooks: Option[Array[Array[Array[Double]]]] = None): DataFrame = {
    import graft.expressions.{kernels, PqAdcCos, PqEncode, PqLut}
    // production amortization point: train once per corpus generation,
    // reuse across every query batch (training is driver-side Lloyd on
    // the sample — a fixed cost unrelated to corpus size)
    val books = trainedCodebooks.getOrElse(
      pqCodebooks(corpus, m, codebookSize, idCol = idCol, vecCol = vecCol))
    val kEff = books(0).length
    // persist = the cache boundary that stops CollapseProject from
    // merging the encode into the post-join scoring projection, which
    // would re-encode the vector PER PAIR instead of per row (measured
    // 17 s vs 2 s at 20k x 512 dims). The encoded corpus IS the PQ
    // index — materializing it once is the operator's premise; callers
    // drop it with clearCache / unpersist when the corpus generation
    // rotates.
    val enc = corpus.select(col(idCol).as("neighbor_id"),
      kernels.toCol(PqEncode(kernels.toExpr(col(vecCol)), books)).as("__pq"))
      .persist()
    val luts = queries.select(col(idCol).as("query_id"),
      kernels.toCol(PqLut(kernels.toExpr(col(vecCol)), books)).as("__lut"),
      norm(col(vecCol)).as("__qn"))
    val wq = Window.partitionBy("query_id")
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    val cands = enc.crossJoin(broadcast(luts))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        kernels.toCol(PqAdcCos(kernels.toExpr(col("__lut")),
          kernels.toExpr(col("__qn")), kernels.toExpr(col("__pq")), kEff))
          .as("qcos"))
      .withColumn("__qr", row_number().over(wq))
      .filter(col("__qr") <= k * rescoreFactor)
      .select("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
        "neighbor_id")
      .join(broadcast(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"))),
        "query_id")
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("__qv"), col("__cv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** LSH-bucketed near-dup pair scan: candidates are pairs sharing any
    * (table, signature) bucket; exact cosine verifies. The shuffle key
    * is (table, sig) and each bucket's pair expansion is partition-local.
    * Amplification is the CALLER's tradeoff:
    * capture = 1-(1-p^bits)^tables with p = 1 - acos(threshold)/pi.
    *
    * WHERE THIS WINS (measured, NOTES.md): at HIGH thresholds
    * (cos >= ~0.8, p >= 0.8) — many bits keep buckets tiny while capture
    * stays ~1, so candidate volume collapses versus |C|²/2. At MODERATE
    * thresholds (cos ~0.45) the amplification needed for capture ~1
    * forces few bits => bucket sizes ~|C|/2^bits and candidate volume
    * EXCEEDS the brute crossjoin — use [[cosineNearDupPairs]] (or IVF
    * blocking) there. The s05 gate config (bits=2, tables=24, capture
    * ~1-2e-6 in the independence model) is exact on the gate corpus;
    * structured replicas correlate across tables, so treat measured
    * capture (not the model) as the contract at scale.
    */
  def cosineNearDupPairsLsh(df: DataFrame, threshold: Double,
                            bits: Int = 2, tables: Int = 24,
                            maxBucket: Int = 100000,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val b = df.select(col(idCol), col(vecCol),
        posexplode(hyperplaneSignatures(col(vecCol), bits, tables, seed = 42L)))
      .toDF(idCol, vecCol, "table", "sig")
    val wb = Window.partitionBy("table", "sig")
    val inB = b.withColumn("__bn", count(lit(1)).over(wb))
      .filter(col("__bn").between(2, maxBucket))
      .drop("__bn")
    inB.as("a").join(inB.as("b"),
        col("a.table") === col("b.table") && col("a.sig") === col("b.sig") &&
        col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("id_a", "id_b").agg(first("cos").as("cos")) // dedup cross-table hits
  }

  /** IVF-blocked near-dup pair scan — the scale path for MODERATE
    * thresholds where hyperplane-LSH amplification degenerates (see
    * [[cosineNearDupPairsLsh]]): ASYMMETRIC inverted-file layout — the
    * INDEX side posts each vector to its single nearest k-means list,
    * the PROBE side expands each vector to its `nprobe` nearest lists,
    * and a pair is a candidate when either member's probe set covers
    * the other's index list (both directions scanned, id_a < id_b
    * canonical). Same capture condition as FAISS-style IVF range
    * search; candidate volume ~ n² * nprobe / nlist² — a factor nprobe
    * LESS than the symmetric both-sides-probe join, and tunable via
    * nlist independently of the threshold, which is exactly what
    * sign-bit LSH cannot do. Capture is data-dependent (near vectors
    * rank centroids similarly); assert it against the brute scan on a
    * sample, not from a closed-form model.
    */
  def cosineNearDupPairsIvf(df: DataFrame, threshold: Double,
                            nlist: Int = 32, nprobe: Int = 8,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    import graft.expressions.{kernels, NearestCentroids}
    val centroids = kmeansCentroids(df, nlist, idCol = idCol, vecCol = vecCol)
    def assign(n: Int): Column =
      kernels.toCol(NearestCentroids(kernels.toExpr(col(vecCol)), centroids, n))
    val indexed = df.select(col(idCol), col(vecCol), assign(1)(0).as("cid"))
    val probes = df.select(col(idCol), col(vecCol), explode(assign(nprobe)).as("cid"))
    // probe(a) x index(b) with a<b finds cid1(b) ∈ probes(a); the a>b
    // half of the SAME join finds cid1(a) ∈ probes(b) — one shuffled
    // join, both directions, canonicalized afterwards
    probes.as("a").join(indexed.as("b"),
        col("a.cid") === col("b.cid") &&
        col(s"a.$idCol") =!= col(s"b.$idCol"))
      .select(
        least(col(s"a.$idCol"), col(s"b.$idCol")).as("id_a"),
        greatest(col(s"a.$idCol"), col(s"b.$idCol")).as("id_b"),
        cosine(col(s"a.$vecCol"), col(s"b.$vecCol")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("id_a", "id_b").agg(first("cos").as("cos")) // dedup direction/multi-list hits
  }

  /** All pairs with cosine >= threshold (embedding near-dup detection),
    * id_a < id_b. Brute-force variant; [[cosineNearDupPairsLsh]] (high
    * thresholds) and [[cosineNearDupPairsIvf]] (moderate thresholds)
    * are the scale paths.
    */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("__va"), col("__vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Pair-scan strategy for [[cosineNearDupDedup]]. `Auto` picks by
    * threshold: hyperplane-LSH amplification concentrates only at high
    * cosine (capture model in [[cosineNearDupPairsLsh]]), so high
    * thresholds route to LSH and moderate ones to IVF blocking. `Brute`
    * stays available as the oracle/baseline — it is NOT a scale path
    * (broadcasts the whole corpus, O(n²) pairs).
    */
  sealed trait PairScanStrategy
  object PairScanStrategy {
    case object Brute extends PairScanStrategy
    case class Lsh(bits: Int = 2, tables: Int = 24) extends PairScanStrategy
    case class Ivf(nlist: Int = 32, nprobe: Int = 8) extends PairScanStrategy
    case object Auto extends PairScanStrategy
  }

  /** Embedding-cosine near-dup DEDUP: survivors after dropping any row
    * with a cosine-similar neighbor of smaller id (same keep-min-id
    * policy as the text dedups). Pair generation is pluggable via
    * [[PairScanStrategy]]; the default (`Auto`) picks a bucketed scale
    * path by threshold — LSH for high cosine, IVF blocking for moderate —
    * never the brute crossjoin, which callers must opt into explicitly.
    */
  def cosineNearDupDedup(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding",
                         strategy: PairScanStrategy = PairScanStrategy.Auto): DataFrame = {
    import PairScanStrategy._
    val pairs = strategy match {
      case Brute => cosineNearDupPairs(df, threshold, idCol, vecCol)
      case Lsh(bits, tables) =>
        cosineNearDupPairsLsh(df, threshold, bits, tables, idCol = idCol, vecCol = vecCol)
      case Ivf(nlist, nprobe) =>
        cosineNearDupPairsIvf(df, threshold, nlist, nprobe, idCol, vecCol)
      case Auto =>
        if (threshold >= 0.75)
          cosineNearDupPairsLsh(df, threshold, idCol = idCol, vecCol = vecCol)
        else cosineNearDupPairsIvf(df, threshold, idCol = idCol, vecCol = vecCol)
    }
    val dups = pairs.select(col("id_b").as(idCol)).distinct()
    df.select(col(idCol)).join(dups, Seq(idCol), "left_anti")
  }
}
