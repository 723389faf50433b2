package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec {

  test("bloom semi-join reduction: exact result, measured pruning") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dim = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val reduced = Relational.bloomSemiJoinReduce(
      li, "l_orderkey", dim, "o_orderkey", expectedItems = 10000L)
    // 1. the downstream join result is EXACTLY the plain join's
    val viaBloom = reduced.join(dim,
      reduced("l_orderkey") === dim("o_orderkey")).drop("o_orderkey")
    val plain = li.join(dim, li("l_orderkey") === dim("o_orderkey"))
      .drop("o_orderkey")
    assert(viaBloom.exceptAll(plain).isEmpty && plain.exceptAll(viaBloom).isEmpty)
    // 2. the reduction actually prunes: surviving rows ~ matching rows
    // (+ fpp of the rest), far below the full fact table
    val total = li.count()
    val matching = plain.count()
    val surviving = reduced.count()
    assert(surviving < total,
      s"bloom pruned nothing: $surviving of $total")
    assert(surviving < matching + (total * 0.05).toLong,
      s"bloom too leaky: $surviving survivors for $matching matches of $total")
    // 3. null keys never pass the probe
    val withNulls = li.select(
      when(col("l_orderkey") % 2 === 0, col("l_orderkey")).as("l_orderkey"))
    val rn = Relational.bloomSemiJoinReduce(
      withNulls, "l_orderkey", dim, "o_orderkey", 10000L)
    assert(rn.filter(col("l_orderkey").isNull).count() == 0)
  }

  test("resampleFfill: empty buckets carry the last observation forward") {
    import spark.implicits._
    val df = Seq(
      ("a", 0L, 1.0), ("a", 3L, 3.0),   // bucket 0: mean 2.0
      ("a", 25L, 5.0),                  // bucket 20; bucket 10 is a GAP
      ("b", 5L, 7.0)                    // single bucket, no grid gaps
    ).toDF("k", "ep", "v")
    val got = Relational.resampleFfill(df, Seq("k"), "ep", 10L, "v")
      .orderBy("k", "bucket_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("a", 0L, 2L, 2.0),   // observed mean
      ("a", 10L, 0L, 2.0),  // gap: carried forward, n_obs 0
      ("a", 20L, 1L, 5.0),
      ("b", 0L, 1L, 7.0)))
  }

  test("resampleInterp: interior gaps lerp between neighbours") {
    import spark.implicits._
    val df = Seq(
      ("a", 0L, 1.0),                   // bucket 0: 1.0
      ("a", 31L, 7.0), ("a", 35L, 9.0), // bucket 30: mean 8.0; 10,20 GAPS
      ("a", 45L, 2.0),                  // bucket 40 (adjacent, no gap)
      ("b", 5L, 7.0)                    // single bucket
    ).toDF("k", "ep", "v")
    val got = Relational.resampleInterp(df, Seq("k"), "ep", 10L, "v")
      .orderBy("k", "bucket_start")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("a", 0L, 1L, 1.0),
      ("a", 10L, 0L, 1.0 + 7.0 * (10.0 / 30.0)),  // lerp 1 -> 8 over 3 steps
      ("a", 20L, 0L, 1.0 + 7.0 * (20.0 / 30.0)),
      ("a", 30L, 2L, 8.0),
      ("a", 40L, 1L, 2.0),
      ("b", 0L, 1L, 7.0)))
    // the second (following-frame) window pass reuses the first one's
    // partitioning + sort: interp costs ZERO extra exchanges over ffill
    def nShuffles(p: org.apache.spark.sql.DataFrame): Int =
      p.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }.size
    assert(nShuffles(Relational.resampleInterp(df, Seq("k"), "ep", 10L, "v"))
      == nShuffles(Relational.resampleFfill(df, Seq("k"), "ep", 10L, "v")))
  }

  test("resample: a pathological span/step grid fails loudly, not OOM") {
    import spark.implicits._
    // one long-lived key: decade span at 1-second step = ~315M buckets.
    // With the guard the plan must RAISE (naming the key and the cap),
    // not silently attempt a 315M-element sequence().
    val df = Seq(("hot", 0L, 1.0), ("hot", 315360000L, 2.0),
      ("cold", 0L, 3.0)).toDF("k", "ep", "v")
    val e = intercept[Exception] {
      Relational.resampleFfill(df, Seq("k"), "ep", 1L, "v").count()
    }
    val msg = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .take(8).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msg.contains("maxBucketsPerKey"), s"guard message, got: $msg")
    assert(msg.contains("hot"), s"offending key named, got: $msg")
    // interp shares the guard
    intercept[Exception] {
      Relational.resampleInterp(df, Seq("k"), "ep", 1L, "v").count()
    }
    // the cap is a parameter, not a hard limit: an explicit raise unblocks
    // (11-bucket span, cap 5 -> fails; cap 20 -> full grid materializes)
    val small = Seq(("x", 0L, 1.0), ("x", 100L, 2.0)).toDF("k", "ep", "v")
    intercept[Exception] {
      Relational.resampleFfill(small, Seq("k"), "ep", 10L, "v",
        maxBucketsPerKey = 5L).count()
    }
    assert(Relational.resampleFfill(small, Seq("k"), "ep", 10L, "v",
      maxBucketsPerKey = 20L).count() == 11)
  }

  test("intervalUnionLength: overlaps collapse, gaps don't count, containment") {
    import spark.implicits._
    val df = Seq(
      ("a", 0L, 10L), ("a", 5L, 15L),   // overlap -> [0,15) = 15
      ("a", 20L, 30L),                  // gap -> +10
      ("a", 22L, 25L),                  // contained -> +0
      ("b", 0L, 5L), ("b", 0L, 5L)      // identical dup -> 5
    ).toDF("k", "s", "e")
    val got = Relational.intervalUnionLength(df, Seq("k"), "s", "e")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 25L, 4L), ("b", 5L, 2L)))
  }

  test("salted aggregation equals plain aggregation") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val salted = Relational.saltedSumCount(ev, Seq("event_type"), "value")
      .orderBy("event_type").collect()
    val plain = ev.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(38,6)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .orderBy("event_type").collect()
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("saltedJoin preserves multiplicities for inner and left-outer") {
    import spark.implicits._
    // big side: duplicate keys and an unmatched key; small side: one key
    // with TWO rows (each big row must meet both, exactly once each)
    val big = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (3L, "e"))
      .toDF("k", "bv")
    val small = Seq((1L, "x"), (1L, "y"), (2L, "z")).toDF("k", "sv")
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "bv", "sv").collect().map(_.toSeq).toSeq
        .sortBy(_.toString)
      val salted = graft.operators.Relational.saltedJoin(
        big, small, Seq("k"), salt = 4, joinType = jt)
        .select("k", "bv", "sv").collect().map(_.toSeq).toSeq
        .sortBy(_.toString)
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("autoSaltedJoin salts a planted hot key without the caller naming it") {
    import spark.implicits._
    // 90% of the big side lands on key 1 — the compressible-hot-key
    // shape AQE's byte-based detector misses; the row-count probe must
    // catch it and route through salting unprompted
    val big = (0L until 2000L)
      .map(i => (if (i % 10 == 0) i % 5 + 2 else 1L, s"v$i")).toDF("k", "bv")
    val small = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "sv")
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "bv", "sv").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val auto = Relational.autoSaltedJoin(big, small, Seq("k"),
      sampleFraction = 0.5)
      .select("k", "bv", "sv").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(auto == plain)
    assert(Relational.lastAutoSalt.get() > 1,
      s"hot key must trigger salting, got salt ${Relational.lastAutoSalt.get()}")
    // uniform keys: the probe must conclude NO salting (salt stays 1)
    val uniform = (0L until 2000L).map(i => (i % 100, s"v$i")).toDF("k", "bv")
    val smallU = (0L until 100L).map(i => (i, s"s$i")).toDF("k", "sv")
    val plainU = uniform.join(smallU, Seq("k"), "inner")
      .select("k", "bv", "sv").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val autoU = Relational.autoSaltedJoin(uniform, smallU, Seq("k"),
      sampleFraction = 0.5)
      .select("k", "bv", "sv").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(autoU == plainU)
    assert(Relational.lastAutoSalt.get() == 1,
      "uniform keys must not pay the salting overhead")
  }

  test("saltedJoin rejects join types salting would corrupt") {
    import spark.implicits._
    val big = Seq((1L, "a")).toDF("k", "bv")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "sv")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer"))
      intercept[IllegalArgumentException] {
        Relational.saltedJoin(big, small, Seq("k"), salt = 4, joinType = jt)
      }
    // left-preserving types all pass the guard and match the plain join
    for (jt <- Seq("inner", "left", "left_outer", "left_semi", "left_anti")) {
      val plain = big.join(small, Seq("k"), jt)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val salted = Relational.saltedJoin(big, small, Seq("k"), 4, jt)
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(salted == plain, s"joinType=$jt")
    }
  }

  test("autoSaltedJoin falls back to the plain join for outer-preserving-right types") {
    import spark.implicits._
    val big = (0L until 200L).map(i => (1L, s"v$i")).toDF("k", "bv") // all-hot
    val small = Seq((1L, "x"), (2L, "unmatched")).toDF("k", "sv")
    val plain = big.join(small, Seq("k"), "full_outer")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val auto = Relational.autoSaltedJoin(big, small, Seq("k"),
      sampleFraction = 0.5, joinType = "full_outer")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    // identical — including exactly ONE unmatched small-side row
    assert(auto == plain)
    assert(Relational.lastAutoSalt.get() == 1,
      "non-saltable join type must not route through salting")
  }

  test("topKeyShare floors tiny samples to an exact scan") {
    import spark.implicits._
    // 50 rows, half on one key: a 1% sample would see ~0 rows and the
    // estimate would be noise — the minSampleRows floor re-probes
    // unsampled, so the share comes back exact
    val df = (0L until 50L).map(i => (if (i < 25) 1L else i, "v")).toDF("k", "v")
    val share = Relational.topKeyShare(df, Seq("k"), sampleFraction = 0.01)
    assert(math.abs(share - 0.5) < 1e-9, s"expected exact 0.5, got $share")
    // empty input: share 0, no division blow-up
    assert(Relational.topKeyShare(df.filter(lit(false)), Seq("k"), 0.01) == 0.0)
  }

  test("autoSaltedSumCount matches plain aggregation in both regimes") {
    import spark.implicits._
    // hot: 90% of rows on key 1 -> must salt; uniform -> must not
    val hot = (0L until 2000L)
      .map(i => (if (i % 10 == 0) i % 5 + 2 else 1L, (i % 7).toDouble))
      .toDF("k", "v")
    val uniform = (0L until 2000L).map(i => (i % 100, (i % 7).toDouble))
      .toDF("k", "v")
    for ((df, expectSalt) <- Seq(hot -> true, uniform -> false)) {
      val plain = df.groupBy("k")
        .agg(sum(col("v").cast("decimal(38,6)")).cast("double").as("sum_value"),
          count(lit(1)).as("n"))
        .orderBy("k").collect().map(_.toSeq).toSeq
      val auto = Relational.autoSaltedSumCount(df, Seq("k"), "v",
        sampleFraction = 0.5)
        .orderBy("k").collect().map(_.toSeq).toSeq
      assert(auto == plain)
      assert((Relational.lastAutoSalt.get() > 1) == expectSalt,
        s"salt=${Relational.lastAutoSalt.get()} expectSalt=$expectSalt")
    }
  }

  test("range join equals the naive BETWEEN join, exactly once per pair") {
    import spark.implicits._
    // negatives, an empty interval (dropped), nulls, duplicate facts
    // (multiplicity must be preserved), and a long interval that spans
    // many bins at every tested width
    val facts = Seq(
      Some(-5L), Some(-5L), Some(0L), Some(3L), Some(7L), Some(100L), None
    ).zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("fid", "p")
      .select(col("fid"), col("p").as("p"))
    val intervals = Seq(
      (1L, Some(-10L), Some(-1L)),  // negative range
      (2L, Some(0L), Some(0L)),     // single point
      (3L, Some(2L), Some(90L)),    // long span
      (4L, Some(5L), Some(4L)),     // empty: start > end -> drops
      (5L, None, Some(9L))          // null bound -> drops
    ).toDF("iid", "s", "e")
    val expected = facts.join(intervals,
        col("p") >= col("s") && col("p") <= col("e"))
      .select("fid", "iid").orderBy("fid", "iid")
      .collect().map(_.toSeq).toSeq
    assert(expected.nonEmpty)
    for (w <- Seq(0L, 1L, 3L, 1000L)) { // 0 = auto-sized
      val got = Relational.rangeJoin(facts, intervals, "p", "s", "e",
          binWidth = w)
        .select("fid", "iid").orderBy("fid", "iid")
        .collect().map(_.toSeq).toSeq
      assert(got == expected, s"binWidth=$w")
    }
  }

  test("range join left/semi/anti equal their naive forms, nulls kept") {
    import spark.implicits._
    val facts = Seq(
      (1L, Some(-5L)), (2L, Some(0L)), (3L, Some(3L)), (4L, Some(7L)),
      (5L, Some(100L)), (6L, Some(100L)), (7L, None)
    ).toDF("fid", "p")
    val intervals = Seq(
      (1L, -10L, -1L), (2L, 0L, 0L), (3L, 2L, 90L), (4L, 3L, 8L)
    ).toDF("iid", "s", "e")
    val cond = col("p") >= col("s") && col("p") <= col("e")
    for (jt <- Seq("left_outer", "left_semi", "left_anti")) {
      val naive = facts.join(intervals, cond, jt)
        .collect().map(_.mkString("|")).toSeq.sorted
      val got = Relational.rangeJoin(facts, intervals, "p", "s", "e",
          binWidth = 3L, joinType = jt)
        .collect().map(_.mkString("|")).toSeq.sorted
      assert(got == naive, s"joinType=$jt")
    }
    // the null-point fact must be KEPT by outer and anti, dropped by semi
    val outer = Relational.rangeJoin(facts, intervals, "p", "s", "e",
      binWidth = 3L, joinType = "left_outer")
    assert(outer.filter(col("fid") === 7L).count() == 1)
    val anti = Relational.rangeJoin(facts, intervals, "p", "s", "e",
      binWidth = 3L, joinType = "left_anti")
    assert(anti.filter(col("fid") === 7L).count() == 1)
    intercept[IllegalArgumentException] {
      Relational.rangeJoin(facts, intervals, "p", "s", "e",
        joinType = "full_outer")
    }
  }

  test("range join with equi-keys matches only same-key windows") {
    import spark.implicits._
    val facts = Seq(
      (1L, "u1", 5L), (2L, "u2", 5L), (3L, "u1", 50L), (4L, "u3", 5L)
    ).toDF("fid", "user", "p")
    val intervals = Seq(
      (10L, "u1", 0L, 9L), (20L, "u2", 0L, 9L), (30L, "u1", 40L, 60L)
    ).toDF("iid", "user", "s", "e")
    val naive = facts.as("f").join(intervals.as("i"),
        col("f.user") === col("i.user") &&
          col("p") >= col("s") && col("p") <= col("e"))
      .select(col("fid"), col("iid"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    for (w <- Seq(0L, 4L)) {
      val got = Relational.rangeJoin(facts, intervals, "p", "s", "e",
          binWidth = w, keyCols = Seq("user"))
        .select(col("fid"), col("iid"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(got == naive, s"binWidth=$w")
    }
    // left_anti with keys: u3's point has no u3 window -> kept
    val anti = Relational.rangeJoin(facts, intervals, "p", "s", "e",
      joinType = "left_anti", keyCols = Seq("user"))
    assert(anti.select("fid").collect().map(_.getLong(0)).toSeq == Seq(4L))
  }

  test("range join bins exactly past 2^53 (epoch-micros regime)") {
    import spark.implicits._
    // two adjacent points around a bin edge at a magnitude where double
    // division is off by one bin: 2^60 is representable but 2^60 +- 1 is
    // not a double, so a float-division bin would misplace the point
    val base = 1L << 60
    val facts = Seq((1L, base - 1L), (2L, base), (3L, base + 1L))
      .toDF("fid", "p")
    val intervals = Seq((10L, base, base + 10L)).toDF("iid", "s", "e")
    val got = Relational.rangeJoin(facts, intervals, "p", "s", "e",
        binWidth = 7L)
      .select("fid").orderBy("fid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2L, 3L))
  }

  test("asof join picks the latest right row at-or-before, inclusive") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2023-01-01 10:00:00")),
      (2L, 10L, ts("2023-01-01 12:00:00")),
      (3L, 10L, ts("2023-01-01 09:00:00")), // before any right row
      (4L, 20L, ts("2023-01-01 12:00:00"))  // equal ts -> inclusive
    ).toDF("id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2023-01-01 09:30:00"), 1.0),
      (10L, ts("2023-01-01 11:00:00"), 2.0),
      (20L, ts("2023-01-01 12:00:00"), 9.0)
    ).toDF("user_id", "ts", "pvalue")
    val out = Relational.asofJoin(left, right, Seq("user_id"), "ts", "ts",
      Seq("pvalue"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(3)))).toSeq == Seq(
      (1L, Some(1.0)), // 10:00 -> 09:30 row
      (2L, Some(2.0)), // 12:00 -> 11:00 row
      (3L, None),      // nothing at or before 09:00
      (4L, Some(9.0)))) // equal timestamp included
  }

  test("approx_count_distinct within 5% of exact") {
    val li = spark.read.parquet(sf("lineitem"))
    val joined = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    joined.foreach { r =>
      val a = r.getLong(1).toDouble; val e = r.getLong(2).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
    }
  }

  test("bucketed join plan has no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.EngineQueries.defs("m09_bucketed_join")(spark, dir)
      df.collect() // force execution (AQE finalizes the plan)
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      // join + grouping both run on the bucketed layout: the only
      // permissible exchange would be none at all
      assert(shuffles.isEmpty,
        s"expected exchange-free bucketed plan, found ${shuffles.size}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
