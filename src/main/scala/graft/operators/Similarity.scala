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

  /** Approximate top-k via multi-table random-hyperplane LSH.
    * `tables` independent signatures of `bits` bits each; candidates =
    * pairs sharing a (table, signature) bucket; exact cosine re-ranks.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
              bits: Int = 12, tables: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeSelf: Boolean = true): DataFrame = {
    def bucketed(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(vec),
          posexplode(hyperplaneSignatures(col(vecCol), bits, tables, seed = 42L)))
        .toDF(id, vec, "table", "sig")
    val c = bucketed(corpus, "neighbor_id", "__cv")
    val q = bucketed(queries, "query_id", "__qv")
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
    * Coarse quantizer: `nlist` centroids taken deterministically from
    * the corpus (lowest ids; at 100 TB swap in k-means on a sample —
    * the operator shape is identical). Every corpus vector is assigned
    * to its nearest centroid (1 list); every query probes its `nprobe`
    * nearest lists. The join key is the centroid id, so the shuffle
    * moves each corpus vector ONCE and each query `nprobe` times —
    * sum-of-list-sizes work instead of |C|x|Q|.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 64, nprobe: Int = 8,
              idCol: String = "vec_id", vecCol: String = "embedding",
              excludeSelf: Boolean = true): DataFrame = {
    import graft.expressions.{kernels, NearestCentroids}
    val centroids: Array[Array[Double]] = corpus
      .orderBy(col(idCol).asc).limit(nlist)
      .select(vecCol).collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toArray)
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

  /** All pairs with cosine >= threshold (embedding near-dup detection),
    * id_a < id_b. Brute-force variant; LSH-bucketed pruning reuses
    * [[lshTopK]] machinery at scale.
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

  /** Embedding-cosine near-dup DEDUP: survivors after dropping any row
    * with a cosine-similar neighbor of smaller id (same keep-min-id
    * policy as the text dedups). Brute-force pair generation here; at
    * scale swap in LSH-bucketed pair pruning via [[lshTopK]]'s bucketing.
    */
  def cosineNearDupDedup(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val dups = cosineNearDupPairs(df, threshold, idCol, vecCol)
      .select(col("id_b").as(idCol)).distinct()
    df.select(col(idCol)).join(dups, Seq(idCol), "left_anti")
  }
}
