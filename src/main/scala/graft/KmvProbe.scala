package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expressions.Kmv

/** Measures the KMV sketch's actual estimation error against exact
  * counts on the events fixture (the q49 gate pins 10%/25% bounds;
  * this prints the real deterministic errors those bounds cover), and
  * the sketch-vs-exact cost shape at growing scale: the sketch is one
  * pass + an 8 KB partial per group, exact distinct is a full shuffle
  * of the key space.
  *
  * Run: sbt "runMain graft.KmvProbe" (env SPARK_GRAFT_SF_DIR to point
  * elsewhere; default sf0.1).
  */
object KmvProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = 1024

    val ev = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        xxhash64(col("user_id"), date_trunc("day", col("ts"))).as("h"),
        col("user_id"), date_trunc("day", col("ts")).as("d"))
      .persist()
    ev.count()

    val sk = ev.groupBy("event_type")
      .agg(Kmv.sketch(col("h"), k).as("sk"),
        countDistinct(col("user_id"), col("d")).as("exact"))
      .persist()
    sk.select(col("event_type"), col("exact"),
        Kmv.estimate(col("sk"), k).as("est"))
      .collect().foreach { r =>
        val (e, est) = (r.getLong(1), r.getDouble(2))
        println(f"[kmvprobe] $dir ${r.getString(0)}%-10s exact=$e est=$est%.1f " +
          f"err=${math.abs(est - e) / e.toDouble * 100}%.2f%%")
      }
    val two = sk.agg(
      max(when(col("event_type") === "click", col("sk"))).as("a"),
      max(when(col("event_type") === "purchase", col("sk"))).as("b"))
    val flags = ev.groupBy("user_id", "d").agg(
      max(when(col("event_type") === "click", 1).otherwise(0)).as("c"),
      max(when(col("event_type") === "purchase", 1).otherwise(0)).as("p"))
    val exacts = flags.agg(count(lit(1)).as("eu"),
      sum(when(col("c") === 1 && col("p") === 1, 1).otherwise(0)).as("ei"))
    val r = two.crossJoin(exacts).select(
      Kmv.estimate(Kmv.union(col("a"), col("b"), k), k).as("u_est"),
      Kmv.intersectEstimate(col("a"), col("b"), k).as("i_est"),
      col("eu"), col("ei")).head()
    val (uEst, iEst, eu, ei) =
      (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getLong(3))
    println(f"[kmvprobe] union     exact=$eu est=$uEst%.1f " +
      f"err=${math.abs(uEst - eu) / eu.toDouble * 100}%.2f%%")
    println(f"[kmvprobe] intersect exact=$ei est=$iEst%.1f " +
      f"err=${math.abs(iEst - ei) / ei.toDouble * 100}%.2f%%")

    // cost shape: sketch-agg vs exact distinct at replicated scale
    val replicas = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)
    val big = ev.crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select(col("event_type"),
        xxhash64(col("h"), col("rep")).as("h2"))
      .persist()
    big.count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tSk) = time(big.groupBy("event_type")
      .agg(Kmv.sketch(col("h2"), k)).collect())
    val (_, tEx) = time(big.groupBy("event_type")
      .agg(countDistinct(col("h2"))).collect())
    println(f"[kmvprobe] ${replicas}x cost: sketch=$tSk%.1fs exact=$tEx%.1fs " +
      f"(rows=${big.count()})")
    spark.stop()
  }
}
