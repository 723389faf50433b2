package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Scale probe for [[Relational.autoSaltedJoin]]: an events-shaped
  * fixture (sf0.1 events replicated SPARK_GRAFT_REPLICAS x) with a
  * planted 90%-row-share hot key — the well-compressing hot-key shape
  * AQE's compressed-byte skew detector is blind to (the T17Probe
  * finding). Measures the plain join under AQE vs autoSaltedJoin:
  * wall clock AND max single-task duration (the fairness metric
  * salting exists to fix — one reducer owning 90% of the rows).
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEntry.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the at-scale scenario: the dim side is too big to broadcast, so
    // the join shuffles both sides and the hot key funnels one reducer
    // (with broadcast on, ANY local-mode fixture is skew-immune and the
    // probe would measure nothing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    import spark.implicits._
    val replicas = math.max(1, sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt)

    val base = Tables.load(spark, "/root/testdata/sf0.1", "events")
    val n0 = base.count()
    // planted skew: 90% of rows carry key 1, the rest spread uniformly;
    // payload = props (compressible, identical for the hot key's rows
    // after the overwrite — exactly what byte-based detection misses)
    val big = (0 until replicas).map { i =>
      base.select(
        (col("event_id") + lit(i * n0)).as("event_id"),
        when(pmod(col("event_id"), lit(10)) =!= 0, lit(1L))
          .otherwise(pmod(col("event_id"), lit(1000)) + 2L).as("k"),
        col("value"), col("props"))
    }.reduce(_ union _).persist()
    val nBig = big.count()
    val small = (1L to 1001L).map(k => (k, s"dim_$k")).toDF("k", "dim")

    val maxTask = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val d = if (t.taskInfo != null) t.taskInfo.duration else 0L
        var cur = maxTask.get()
        while (d > cur && !maxTask.compareAndSet(cur, d)) cur = maxTask.get()
      }
    })

    def timed(name: String)(f: => Long): Unit = {
      maxTask.set(0L)
      val t0 = System.nanoTime()
      val rows = f
      org.apache.spark.sql.graftbridge.GraftSqlBridge.waitListenerBus(spark)
      println(f"[salt${replicas}x] $name rows $rows wall ${(System.nanoTime() - t0) / 1e9}%.1f s " +
        f"max_task ${maxTask.get() / 1e3}%.1f s")
    }

    // the aggregate forces every joined row (payload included) through
    // the reduce side, so the hot reducer's row count is the bottleneck
    timed("plain_join_aqe") {
      big.join(small, Seq("k"))
        .agg(sum(length(col("props")) + length(col("dim")))).head().getLong(0)
      nBig
    }
    timed("auto_salted_join") {
      Relational.autoSaltedJoin(big, small, Seq("k"))
        .agg(sum(length(col("props")) + length(col("dim")))).head().getLong(0)
      nBig
    }
    println(s"[salt${replicas}x] decided salt ${Relational.lastAutoSalt.get()} corpus $nBig")
    spark.stop()
  }
}
