package graft

import graft.operators.Relational
import graft.sources.Testdata

/** Plan-shape and sanity contracts for the relational scale patterns: these
  * assert the PHYSICAL plan is the one that survives 100 TB (pushdown,
  * broadcast, partial aggregation), not just that results come back.
  */
class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("pricingSummary: shipdate filter is pushed to the Parquet scan") {
    val plan = planOf(Relational.pricingSummary(Testdata.lineitem(spark, dir), "1998-09-01"))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected pushed shipdate filter, got:\n$plan")
    // partial + final aggregation (map-side combine before the exchange)
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"))
  }

  test("pricingSummary: decimal sums are partition-count invariant") {
    val li = Testdata.lineitem(spark, dir)
    val a = Relational.pricingSummary(li.repartition(1), "1998-09-01")
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toSeq)
    val b = Relational.pricingSummary(li.repartition(13), "1998-09-01")
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("topCustomersPerNation: dimensions join via broadcast, no sort-merge") {
    val df = Relational.topCustomersPerNation(
      Testdata.orders(spark, dir),
      Testdata.table(spark, dir, "customer"),
      Testdata.table(spark, dir, "nation"))
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // at most topN rows per nation, ranks 1..n contiguous
    rows.groupBy(_.getAs[String]("n_name")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("regionRevenueByYear: star join broadcasts dims; revenue positive") {
    val df = Relational.regionRevenueByYear(
      Testdata.lineitem(spark, dir), Testdata.orders(spark, dir),
      Testdata.table(spark, dir, "customer"), Testdata.table(spark, dir, "nation"),
      Testdata.table(spark, dir, "region"))
    assert(planOf(df).contains("BroadcastHashJoin"))
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("skewAwareAgg: salted two-phase equals direct aggregation") {
    import org.apache.spark.sql.functions._
    val ev = Testdata.events(spark, dir)
    val salted = Relational.skewAwareAgg(ev, col("event_type"), col("value").cast("decimal(18,6)"))
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getDecimal(1).doubleValue(), r.getLong(2)))
    val direct = ev.groupBy(col("event_type"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("s"), count(lit(1)).as("c"))
      .orderBy("event_type").collect()
      .map(r => (r.getString(0), r.getDecimal(1).doubleValue(), r.getLong(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("saltedJoin: identical rows to the plain join, salt in the join keys") {
    import org.apache.spark.sql.functions._
    val li = Testdata.lineitem(spark, dir)
    val ord = Testdata.orders(spark, dir)
    val salted = Relational.saltedJoin(li, ord, "l_orderkey", "o_orderkey",
      saltBy = col("l_linenumber"), salts = 4)
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    assert(salted.count() == plain.count())
    val s = salted.groupBy("o_orderpriority").count().orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val p = plain.groupBy("o_orderpriority").count().orderBy("o_orderpriority")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(s == p)
    // the exchange hashes on (key, salt) — the skew-spreading contract
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("_salt_f") && plan.contains("_salt_o"),
      s"salt must be part of the join keys:\n$plan")
  }

  test("saltedJoin: hot-keys-only — forced-hot equals plain join; cold path replicates nothing") {
    import org.apache.spark.sql.functions._
    val li = Testdata.lineitem(spark, dir)
    val ord = Testdata.orders(spark, dir)
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("o_orderpriority").count().orderBy("o_orderpriority")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val plain = agg(li.join(ord, col("l_orderkey") === col("o_orderkey")))
    // every key forced hot (threshold 1, full sample): still the plain result
    val allHot = Relational.saltedJoin(li, ord, "l_orderkey", "o_orderkey",
      saltBy = col("l_linenumber"), salts = 4, hotRowThreshold = 1, sampleFraction = 1.0)
    assert(agg(allHot) == plain)
    // nothing hot (default 1M-row threshold): the other side must NOT be
    // replicated — its exploded salt array is the singleton [0], so the
    // join input row count equals the plain dimension count
    val noneHot = Relational.saltedJoin(li, ord, "l_orderkey", "o_orderkey",
      saltBy = col("l_linenumber"), salts = 4)
    assert(agg(noneHot) == plain)
  }

  test("approx sketches: HLL distinct and quantile land within their bounds") {
    import org.apache.spark.sql.functions._
    val ord = Testdata.orders(spark, dir)
    val exactD = ord.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approxD = ord.select(approx_count_distinct(col("o_custkey"), rsd = 0.02))
      .head().getLong(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.06,
      s"HLL estimate $approxD too far from exact $exactD")
    val exactM = ord.select(median(col("o_totalprice").cast("double")))
      .head().getDouble(0)
    val approxM = ord.stat.approxQuantile("o_totalprice", Array(0.5), 0.01).head
    assert(math.abs(approxM - exactM) / exactM < 0.05,
      s"approx median $approxM too far from exact $exactM")
  }

  test("rolling revenue: hand-computed range frame; one exchange, no self-join") {
    import testImplicits._
    import org.apache.spark.sql.functions._
    // customer 1: days 0, 10, 45 — the 30-day frame at day 45 excludes
    // days 0 and 10 (event-time range, not row adjacency); same-day ties
    // (customer 2) share one frame
    val orders = Seq(
      (1L, 101L, "1970-01-01 00:00:00", 10.0),
      (1L, 102L, "1970-01-11 00:00:00", 20.0),
      (1L, 103L, "1970-02-15 00:00:00", 40.0),
      (2L, 201L, "1970-01-05 00:00:00", 5.0),
      (2L, 202L, "1970-01-05 00:00:00", 7.0))
      .toDF("o_custkey", "o_orderkey", "ts", "o_totalprice")
      .withColumn("o_orderdate", col("ts").cast("timestamp")).drop("ts")
    val got = Relational.rollingRevenue(orders, days = 30)
      .orderBy("o_custkey", "day", "o_orderkey")
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (101L, 10.0, 1L), (102L, 30.0, 2L), (103L, 40.0, 1L),
      (201L, 12.0, 2L), (202L, 12.0, 2L)))
    val plan = Relational.rollingRevenue(orders, days = 30)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window pass:\n$plan")
    assert(!plan.contains("Join"), s"rolling frame must not self-join:\n$plan")
  }

  test("sessionize: every event lands in exactly one session; gaps split") {
    val ev = Testdata.events(spark, dir)
    val sessions = Relational.sessionize(ev, gapMinutes = 30).collect()
    assert(sessions.map(_.getAs[Long]("n_events")).sum == ev.count())
    assert(sessions.forall(_.getAs[Long]("duration_us") >= 0))
    // a huge gap threshold collapses each user to one session
    val one = Relational.sessionize(ev, gapMinutes = Int.MaxValue / 100).collect()
    val users = ev.select("user_id").distinct().count()
    assert(one.length == users)
  }

  test("scd2: change points only, contiguous ranges, current row open") {
    import testImplicits._
    import org.apache.spark.sql.functions.col
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      (1L, ts(1), 10L, "x"), (1L, ts(2), 11L, "x"), (1L, ts(3), 12L, "y"),
      (1L, ts(5), 13L, "x"), (2L, ts(4), 14L, "z")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Relational.scd2(ev, col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime / 1000, Option(r.getTimestamp(3)).map(_.getTime / 1000)))
    assert(out.toSeq == Seq(
      (1L, "x", 1L, Some(3L)), (1L, "y", 3L, Some(5L)), (1L, "x", 5L, None),
      (2L, "z", 4L, None)))
  }

  test("funnel: strictly-after sequence matching, out-of-order stages don't count") {
    import testImplicits._
    import org.apache.spark.sql.functions.col
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val ev = Seq(
      // user 1 completes in order
      (1L, ts(1), "view"), (1L, ts(2), "click"), (1L, ts(3), "purchase"),
      // user 2: click precedes the first view -> stalls at view
      (2L, ts(5), "click"), (2L, ts(6), "view"),
      // user 3: view then click, purchase BEFORE the click -> no stage 3
      (3L, ts(1), "view"), (3L, ts(4), "click"), (3L, ts(2), "purchase"),
      // user 4 never views: counted nowhere
      (4L, ts(1), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val out = Relational.funnel(ev, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("view", 3L, 1.0), ("click", 2L, math.rint(2.0 / 3 * 1e6) / 1e6),
      ("purchase", 1L, 0.5)))
  }

  test("retention: Monday-start cohorts, whole-week offsets, distinct users") {
    import testImplicits._
    import org.apache.spark.sql.functions.col
    val ev = Seq(
      (1L, "2020-01-06 10:00:00"), (1L, "2020-01-09 10:00:00"), // offsets 0, 0
      (1L, "2020-01-14 10:00:00"),                              // day 8 -> offset 1
      (2L, "2020-01-07 09:00:00"), (2L, "2020-01-27 09:00:00"), // offsets 0, 2
      (3L, "2020-01-15 12:00:00")                               // next cohort week
    ).toDF("user_id", "s").withColumn("ts", col("s").cast("timestamp")).drop("s")
    val got = Relational.retention(ev, col("user_id"), col("ts"))
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2020-01-06", 0L, 2L), ("2020-01-06", 1L, 1L), ("2020-01-06", 2L, 1L),
      ("2020-01-13", 0L, 1L)))
  }

  test("type affinity: hand-computed lift over distinct per-user type sets") {
    import testImplicits._
    import org.apache.spark.sql.functions.col
    // users: 1 {a,b}, 2 {a,b}, 3 {a}, 4 {b,c} — n=4
    // lift(a,b) = (2 * 4) / (3 * 3); lift(b,c) = (1 * 4) / (3 * 1)
    val ev = Seq((1L, "a"), (1L, "b"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "a"), (4L, "b"), (4L, "c")).toDF("user_id", "event_type")
    val got = Relational.typeAffinity(ev, col("user_id"), col("event_type"))
      .orderBy("ta", "tb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq(
      ("a", "b", 2L, math.rint(8.0 / 9 * 1e6) / 1e6),
      ("b", "c", 1L, math.rint(4.0 / 3 * 1e6) / 1e6)))
    // duplicate events (user 1's second 'a') must not inflate counts
    assert(got.head._3 == 2L)
  }

  test("resampleGapFill: holes become explicit zeros, trailing mean shrinks at the head") {
    import testImplicits._
    import org.apache.spark.sql.functions._
    // group "x": events in minutes 0, 0, 3 → buckets 0..3 with 1-min buckets,
    // gap buckets 1,2 filled with 0; group "y": single event (span = 1 bucket)
    val ev = Seq(
      ("x", 10L), ("x", 30L), ("x", 185L), ("y", 65L))
      .toDF("g", "sec")
      .select(col("g"), timestamp_seconds(col("sec")).as("ts"))
    val got = Relational.resampleGapFill(ev, col("g"), col("ts"),
        bucketMinutes = 1, rollBuckets = 3)
      .orderBy("g", "bucket_start").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("x", 2L, 2.0),       // head: window of 1 bucket
      ("x", 0L, 1.0),       // gap filled; mean over 2 buckets (2+0)/2
      ("x", 0L, math.rint(2.0 / 3 * 1e6) / 1e6), // (2+0+0)/3
      ("x", 1L, math.rint(1.0 / 3 * 1e6) / 1e6), // (0+0+1)/3
      ("y", 1L, 1.0)))
  }

  test("anomalyScores: planted spike scores high; flat history gives null z; head is null") {
    import testImplicits._
    import org.apache.spark.sql.functions._
    // minute buckets 0..6 alternate 1,2,1,2,1,2,1 events; bucket 7 spikes 10
    val counts = Seq(1, 2, 1, 2, 1, 2, 1, 10)
    val rows = counts.zipWithIndex.flatMap { case (n, minute) =>
      (0 until n).map(i => ("x", minute * 60L + i)) // i<60 stays in-bucket
    } ++ (0 until 8).map(minute => ("y", minute * 60L)) // flat: 1/bucket
    val ev = rows.toDF("g", "sec")
      .select(col("g"), timestamp_seconds(col("sec")).as("ts"))
    val all = Relational.anomalyScores(ev, col("g"), col("ts"),
        bucketMinutes = 1, histBuckets = 24, minHist = 6)
      .orderBy("g", "bucket_start").collect()
      .map(r => (r.getString(0), r.getLong(2),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    // flat group: variance 0 at every bucket → z stays null past minHist
    assert(all.filter(_._1 == "y").forall(_._3.isEmpty))
    val got = all.filter(_._1 == "x").map(t => (t._2, t._3))
    assert(got.length == 8)
    assert(got.take(6).forall(_._2.isEmpty), "fewer than minHist prior buckets → null z")
    // bucket 6 (n=1): hist 1,2,1,2,1,2 → mean 1.5, var (15-81/6)/6=0.25, z=(1-1.5)/0.5=-1
    assert(got(6) == ((1L, Some(-1.0))))
    // spike bucket: hist 1,2,1,2,1,2,1 → s1=10,s2=16,nh=7
    val (s1, s2, nh) = (10.0, 16.0, 7.0)
    val mean = s1 / nh
    val variance = (s2 - s1 * s1 / nh) / nh
    val zExp = math.rint((10.0 - mean) / math.sqrt(variance) * 1e6) / 1e6
    assert(got(7)._1 == 10L && got(7)._2.contains(zExp) && zExp > 3.0)
  }

  test("transitions: exact pair counts and conditional probabilities; ties break on id") {
    import testImplicits._
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    // user 1: x->y->x->z; user 2: x->y  (tie at t=1 broken by event id)
    val ev = Seq(
      (1L, 1L, ts(1), "x"), (2L, 1L, ts(2), "y"), (3L, 1L, ts(3), "x"),
      (4L, 1L, ts(4), "z"), (5L, 2L, ts(1), "x"), (6L, 2L, ts(1), "y")
    ).toDF("event_id", "user_id", "ts", "e")
    import org.apache.spark.sql.functions.col
    val got = Relational.transitions(ev, col("user_id"), col("ts"),
        col("e"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // from x: ->y twice (users 1,2), ->z once; from y: ->x once
    assert(got(("x", "y")) == ((2L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(got(("x", "z")) == ((1L, math.rint(1.0 / 3 * 1e6) / 1e6)))
    assert(got(("y", "x")) == ((1L, 1.0)))
    assert(got.size == 3)
  }

  test("firstEventPerWindow: one survivor per key-bucket, earliest wins, tie on id") {
    import testImplicits._
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.col
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, 1L, "c", ts(5)), (2L, 1L, "c", ts(10)),   // same hour: keep 1
      (3L, 1L, "c", ts(59)),                          // still same hour
      (4L, 1L, "v", ts(5)),                           // other type: kept
      (5L, 2L, "c", ts(5)), (6L, 2L, "c", ts(5))      // exact tie: lower id
    ).toDF("event_id", "user_id", "e", "ts")
    val got = Relational.firstEventPerWindow(ev,
        Seq(col("user_id"), col("e")), col("ts"), col("event_id"), 60)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(got == Set((1L, "c", 1L), (1L, "v", 4L), (2L, "c", 5L)))
    // bounded-heap contract: GroupTopK, no WindowExec
    val plan = Relational.firstEventPerWindow(ev,
        Seq(col("user_id"), col("e")), col("ts"), col("event_id"), 60)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK") && !plan.contains("WindowExec"))
  }
}
