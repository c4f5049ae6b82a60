package graft.operators

import graft.Checkpoint.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational analytics over the warehouse tables — the scale-pattern
  * showcase (beyond-reference: the reference has no joins, aggregations, or
  * windows at all, SURVEY §2.2). Each operator is written for the plan shape
  * that survives 100 TB:
  *
  *  - fact-table filters go FIRST so Parquet gets them as pushed predicates
  *    (and at real scale, partition pruning on the date column);
  *  - aggregations run as partial (map-side) + final — free with groupBy
  *    since all aggs here are sum/count shapes;
  *  - dimension joins broadcast explicitly (`broadcast()`), keeping the fact
  *    table shuffle-free on the join; the only unavoidable shuffles are the
  *    final groupBy exchanges on small post-aggregation keys;
  *  - monetary sums are computed in DECIMAL (exact, order-independent) so
  *    results are reproducible across engines and partitionings — a double
  *    sum would drift with partition count at 100 TB;
  *  - top-n per group uses row_number over a partitioned window (no global
  *    sort), and sessionization uses lag + running sum — both shuffle once
  *    on the partition key.
  */
object Relational {

  private val money = DecimalType(18, 6)

  /** TPC-H Q1-shaped pricing summary: filtered scan → partial agg → final
    * agg on a 2-value grouping key. Averages are derived as exact-decimal
    * sum ÷ count in double at the end (deterministic under any partitioning).
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast(money)).as("sq"),
        sum(col("l_extendedprice").cast(money)).as("sp"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(money)).as("sdp"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        round(col("sq").cast("double"), 6).as("sum_qty"),
        round(col("sp").cast("double"), 6).as("sum_base_price"),
        round(col("sdp").cast("double"), 6).as("sum_disc_price"),
        round(col("sq").cast("double") / col("count_order"), 6).as("avg_qty"),
        round(col("sp").cast("double") / col("count_order"), 6).as("avg_price"),
        col("count_order"))

  /** Top-n customers by total order spend within each nation: shuffle the
    * fact table once (groupBy custkey), broadcast both dimensions, then a
    * per-nation window — no global sort anywhere.
    */
  def topCustomersPerNation(
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      topN: Int = 3): DataFrame = {
    val spend = orders.groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast(money)).as("spend_d"))
    val dims = customer.join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
    val w = Window.partitionBy("n_name").orderBy(desc("spend_d"), asc("o_custkey"))
    spend
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col("n_name"), col("rank"), col("c_name"),
        round(col("spend_d").cast("double"), 6).as("spend"))
  }

  /** Revenue by region and ship-year: the star-join shape — one fact-fact
    * equi-join (lineitem ⋈ orders on orderkey), all dimensions broadcast,
    * aggregation partial-then-final on a tiny (region, year) key.
    */
  def regionRevenueByYear(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame): DataFrame = {
    val dims = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    lineitem
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(money).as("rev"),
        year(col("l_shipdate")).as("ship_year"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("r_name", "ship_year")
      .agg(sum(col("rev")).as("rev_d"))
      .select(col("r_name"), col("ship_year"),
        round(col("rev_d").cast("double"), 6).as("revenue"))
  }

  /** Region/year revenue with ROLLUP subtotals: per (region, year), per
    * region, and grand total in one pass — Spark plans a single aggregation
    * over the expanded grouping sets, so the fact table is read once.
    *
    * Expressed through the SQL surface: the Column-API `rollup` over a
    * multi-join lineage trips Spark's ambiguous-self-join detector (the
    * Expand duplicates join-tagged grouping attributes); the SQL path
    * resolves by name and also exercises `spark.sql` + broadcast hints.
    */
  def regionRevenueRollup(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("graft_rollup_li")
    orders.createOrReplaceTempView("graft_rollup_ord")
    customer.createOrReplaceTempView("graft_rollup_cust")
    nation.createOrReplaceTempView("graft_rollup_nat")
    region.createOrReplaceTempView("graft_rollup_reg")
    lineitem.sparkSession.sql(
      """SELECT /*+ BROADCAST(c), BROADCAST(n), BROADCAST(r) */
        |  r_name, CAST(year(l_shipdate) AS INT) AS ship_year,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue,
        |  count(*) AS n_items
        |FROM graft_rollup_li l
        |JOIN graft_rollup_ord o ON l.l_orderkey = o.o_orderkey
        |JOIN graft_rollup_cust c ON o.o_custkey = c.c_custkey
        |JOIN graft_rollup_nat n ON c.c_nationkey = n.n_nationkey
        |JOIN graft_rollup_reg r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP (r_name, CAST(year(l_shipdate) AS INT))
        |""".stripMargin)
  }

  /** CUBE of region revenue: all four grouping combinations (region×year,
    * region, year, grand total) in ONE aggregation pass — Spark expands the
    * grouping sets map-side, so the fact table is still read and shuffled
    * once. Same SQL surface as [[regionRevenueRollup]] (Column-API
    * cube/rollup over a multi-join lineage trips ambiguous-self-join
    * analysis).
    */
  def regionRevenueCube(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("graft_cube_li")
    orders.createOrReplaceTempView("graft_cube_ord")
    customer.createOrReplaceTempView("graft_cube_cust")
    nation.createOrReplaceTempView("graft_cube_nat")
    region.createOrReplaceTempView("graft_cube_reg")
    lineitem.sparkSession.sql(
      """SELECT /*+ BROADCAST(c), BROADCAST(n), BROADCAST(r) */
        |  r_name, CAST(year(l_shipdate) AS INT) AS ship_year,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue,
        |  count(*) AS n_items
        |FROM graft_cube_li l
        |JOIN graft_cube_ord o ON l.l_orderkey = o.o_orderkey
        |JOIN graft_cube_cust c ON o.o_custkey = c.c_custkey
        |JOIN graft_cube_nat n ON c.c_nationkey = n.n_nationkey
        |JOIN graft_cube_reg r ON n.n_regionkey = r.r_regionkey
        |GROUP BY CUBE (r_name, CAST(year(l_shipdate) AS INT))
        |""".stripMargin)
  }

  /** GROUPING SETS with ASYMMETRIC sets — the case neither ROLLUP nor CUBE
    * expresses: revenue by region, by ship year, and by region×returnflag,
    * all in ONE aggregation pass (Spark's Expand duplicates each input row
    * once per set map-side, so the five-way join output is read and
    * shuffled once instead of three times — at 100 TB that is two whole
    * fact-table passes saved vs three separate GROUP BYs).
    */
  def regionRevenueGroupingSets(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame): DataFrame = {
    lineitem.createOrReplaceTempView("graft_gsets_li")
    orders.createOrReplaceTempView("graft_gsets_ord")
    customer.createOrReplaceTempView("graft_gsets_cust")
    nation.createOrReplaceTempView("graft_gsets_nat")
    region.createOrReplaceTempView("graft_gsets_reg")
    lineitem.sparkSession.sql(
      """SELECT /*+ BROADCAST(c), BROADCAST(n), BROADCAST(r) */
        |  r_name, CAST(year(l_shipdate) AS INT) AS ship_year, l_returnflag,
        |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE), 6) AS revenue,
        |  count(*) AS n_items
        |FROM graft_gsets_li l
        |JOIN graft_gsets_ord o ON l.l_orderkey = o.o_orderkey
        |JOIN graft_gsets_cust c ON o.o_custkey = c.c_custkey
        |JOIN graft_gsets_nat n ON c.c_nationkey = n.n_nationkey
        |JOIN graft_gsets_reg r ON n.n_regionkey = r.r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (CAST(year(l_shipdate) AS INT)),
        |                        (r_name, l_returnflag))
        |""".stripMargin)
  }

  /** Pivot: nation rows × ship-year revenue columns. The pivot value list
    * is EXPLICIT — with it Spark skips the extra values-discovery job and
    * the output schema is deterministic (a correctness requirement here,
    * and the scalable form: value discovery over 100 TB is a full extra
    * scan).
    */
  def revenuePivotByYear(
      lineitem: DataFrame,
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      years: Seq[Int]): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(18, 6)
    val joined = lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"),
        year(col("l_shipdate")).as("ship_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec).as("rev"))
    joined
      .groupBy("n_name")
      .pivot("ship_year", years.map(Integer.valueOf))
      .agg(round(sum(col("rev")).cast("double"), 6))
      .select(col("n_name") +: years.map(y => col(s"`$y`").as(s"y$y")): _*)
  }

  /** Ranking-function sampler: per-customer order sequence with the full
    * rank family (row_number, ntile, percent_rank, cume_dist) plus the
    * inter-order gap — one shuffle on the partition key, everything else
    * is per-partition sorted evaluation.
    */
  def customerOrderRanks(orders: DataFrame, buckets: Int = 4): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders.select(
        col("o_orderkey"), col("o_custkey"),
        col("o_orderdate"),
        row_number().over(w).as("rn"),
        ntile(buckets).over(w).as("nt"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w)).as("gap_days"))
      .drop("o_orderdate")
  }

  /** Rolling `days`-day revenue per customer — the RANGE-frame sliding
    * window (trailing spend, rolling retention, moving averages). The frame
    * is keyed on an integer DAY number, so it is a true event-time range
    * (orders 40 days apart never share a frame even when adjacent in row
    * order), ties on the same day share one well-defined frame, and the
    * day arithmetic replays exactly in the oracle.
    *
    * Scale shape: one hash exchange on the customer key + one
    * partition-local sort — Spark evaluates the sliding frame in a single
    * ordered pass per partition (no self-join expansion of the window,
    * which is the naive spelling's `orders ⋈ orders ON datediff ≤ d`
    * quadratic blowup per customer).
    */
  def rollingRevenue(orders: DataFrame, days: Int = 30): DataFrame = {
    require(days >= 1)
    val day = datediff(col("o_orderdate").cast("date"), to_date(lit("1970-01-01")))
    val w = Window.partitionBy("o_custkey").orderBy("day")
      .rangeBetween(-(days - 1).toLong, 0L)
    orders
      .select(col("o_custkey"), col("o_orderkey"), day.as("day"), col("o_totalprice"))
      .select(col("o_custkey"), col("o_orderkey"), col("day"),
        round(sum(col("o_totalprice")).over(w), 6).as("rolling_rev"),
        count(lit(1)).over(w).as("n_in_window"))
  }

  /** Salted equi-join for skewed keys — HOT KEYS ONLY: a sampled frequency
    * scan finds keys whose estimated fact-side row count exceeds
    * `hotRowThreshold`; only those keys get salted (fact rows take a
    * deterministic salt in [0, salts), the other side is replicated
    * `salts`× for those keys alone), everything else joins plainly with
    * salt 0, all in ONE (key, salt) equi-join. A hot key's rows land on
    * `salts` reducers instead of one, while the replication overhead is
    * `(salts−1)·hotFraction` instead of `salts`× the whole dimension (the
    * round-3 salt-everything defect: 2× the plain join's work by
    * construction). With no hot keys the plan degenerates to the plain
    * join plus two broadcast probes of an empty hot-key set.
    *
    * This is the manual remedy when the skewed side cannot broadcast and
    * AQE skew splitting doesn't reach the join (e.g. required child
    * distributions pin the exchange). Result is identical to the plain
    * join for any salt source and any hot-key detection outcome; `saltBy`
    * just needs rough uniformity within each hot key (a line number, a
    * hash of the payload).
    */
  def saltedJoin(
      fact: DataFrame,
      other: DataFrame,
      factKey: String,
      otherKey: String,
      saltBy: Column,
      salts: Int = 8,
      hotRowThreshold: Long = 1000000L,
      sampleFraction: Double = 0.01): DataFrame = {
    require(salts >= 1)
    require(sampleFraction > 0 && sampleFraction <= 1)
    // estimated-hot keys from a seeded sample: one cheap pass over the key
    // column only (column-pruned scan), never a full-key count shuffle
    val hotKeys = fact.select(col(factKey).as("_hk"))
      .sample(withReplacement = false, sampleFraction, seed = 0x5a17L)
      .groupBy("_hk")
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= math.max(1.0, hotRowThreshold * sampleFraction))
      .select("_hk")
    val saltedFact = fact
      .join(broadcast(hotKeys), fact(factKey) === col("_hk"), "left")
      .withColumn("_salt_f",
        when(col("_hk").isNotNull, pmod(hash(saltBy), lit(salts))).otherwise(lit(0)))
      .drop("_hk")
    val expanded = other
      .join(broadcast(hotKeys), other(otherKey) === col("_hk"), "left")
      .withColumn("_salt_o",
        explode(when(col("_hk").isNotNull,
          array((0 until salts).map(lit(_)): _*)).otherwise(array(lit(0)))))
      .drop("_hk")
    saltedFact
      .join(expanded,
        saltedFact(factKey) === expanded(otherKey) &&
          col("_salt_f") === col("_salt_o"))
      .drop("_salt_f", "_salt_o")
  }

  /** Two-phase (salted) aggregation for skewed keys: pre-aggregate on
    * (key, spark_partition_id) — each task combines its own rows for a hot
    * key before anything shuffles — then final-aggregate on the key alone.
    * Identical result to a direct groupBy for any distributive aggregate;
    * the final stage receives at most P rows per key (P = upstream
    * partitions) no matter how skewed the data. This is the manual salting
    * pattern for when AQE's skew handling can't apply (e.g. a first-shuffle
    * aggregation); Spark's partial aggregation usually covers this, but
    * hash-aggregate fallback under high-cardinality + skew does not.
    */
  def skewAwareAgg(df: DataFrame, key: Column, valueCol: Column): DataFrame =
    df
      .select(key.as("k"), valueCol.as("v"))
      .groupBy(col("k"), spark_partition_id().as("_salt"))
      .agg(sum(col("v")).as("partial_sum"), count(lit(1)).as("partial_cnt"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("sum_v"), sum(col("partial_cnt")).as("cnt"))

  /** Sessionization: split each user's event stream at inactivity gaps >
    * `gapMinutes`, emit per-session stats. One shuffle on user_id; lag +
    * running-sum windows inside each partition. (The batch twin of the
    * Structured Streaming session-window operator.)
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapUs = gapMinutes.toLong * 60 * 1000000
    events
      // cast first: the testdata parquet carries a no-timezone (NTZ)
      // timestamp, which unix_micros rejects; sessions pin UTC, so the cast
      // is wall-clock-preserving and matches the oracle's naive epoch
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
  }

  /** SCD-2 (slowly-changing-dimension) build from an event log: collapse
    * each key's stream to its CHANGE POINTS of `attr`, with
    * `[valid_from, valid_to)` ranges (`valid_to` null = current). The
    * warehouse dimension-table shape derived from raw events in one
    * shuffle: both windows share the (key, ts, tie) partitioning+ordering,
    * and the change-point filter preserves sort order, so Catalyst plans
    * ONE exchange and ONE sort for the whole operator. `tie` must make the
    * order total (duplicate timestamps otherwise make lag/lead
    * nondeterministic).
    */
  def scd2(events: DataFrame, key: Column, ts: Column, tie: Column,
      attr: Column): DataFrame = {
    val w = Window.partitionBy("k").orderBy("ts", "tie")
    events
      .select(key.as("k"), ts.as("ts"), tie.as("tie"), attr.as("attr"))
      .withColumn("prev", lag(col("attr"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("attr"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      // `tie` stays in the output: (k, valid_from) alone is not a total
      // order when two change points share a timestamp
      .select(col("k"), col("attr"), col("ts").as("valid_from"), col("valid_to"),
        col("tie"))
  }

  /** Ordered conversion funnel: per user, the earliest stage-1 event, the
    * earliest stage-2 event STRICTLY AFTER it, and the earliest stage-3
    * event strictly after that — sequence-matched, not mere presence.
    *
    * One exchange total: a single groupBy(user) collects each user's
    * per-stage timestamp lists (sorted on finish, bounded by that user's
    * events), and the chained strictly-after minima are per-row array
    * folds — no self-joins, no second shuffle, no window. The final
    * stage-count rollup is a single-row aggregation of the tiny per-user
    * frame.
    */
  def funnel(events: DataFrame, user: Column, ts: Column, typeCol: Column,
      stages: Seq[String]): DataFrame = {
    require(stages.length == 3, "three-stage funnel")
    val per = events
      .select(user.as("u"), ts.as("ts"), typeCol.as("et"))
      .groupBy("u")
      .agg(
        min(when(col("et") === stages(0), col("ts"))).as("t1"),
        sort_array(collect_list(when(col("et") === stages(1), col("ts")))).as("l2"),
        sort_array(collect_list(when(col("et") === stages(2), col("ts")))).as("l3"))
      .withColumn("t2", array_min(filter(col("l2"), c => c > col("t1"))))
      .withColumn("t3", array_min(filter(col("l3"), c => c > col("t2"))))
    val totals = per.agg(
      count(col("t1")).as("n1"), count(col("t2")).as("n2"), count(col("t3")).as("n3"))
    totals.select(explode(array(
        struct(lit(1).as("stage_idx"), lit(stages(0)).as("stage"),
          col("n1").as("users"), lit(1.0).as("conv_from_prev")),
        struct(lit(2).as("stage_idx"), lit(stages(1)).as("stage"),
          col("n2").as("users"),
          when(col("n1") === 0, lit(0.0))
            .otherwise(round(col("n2").cast("double") / col("n1"), 6)).as("conv_from_prev")),
        struct(lit(3).as("stage_idx"), lit(stages(2)).as("stage"),
          col("n3").as("users"),
          when(col("n2") === 0, lit(0.0))
            .otherwise(round(col("n3").cast("double") / col("n2"), 6)).as("conv_from_prev"))
      )).as("r"))
      .select(col("r.stage_idx"), col("r.stage"), col("r.users"), col("r.conv_from_prev"))
  }

  /** Market-basket affinity over per-user event-type sets: for each
    * unordered type pair, the co-occurrence count and lift
    * `P(a∧b) / (P(a)·P(b))` across users. The self-join is on the USER key
    * (co-partitioned with the distinct aggregation feeding it) and its
    * fanout is bounded by the per-user DISTINCT type count — at k types the
    * pair space is k·(k−1)/2 per user regardless of event volume, so the
    * operator scales with users, never with raw events. Lift is rounded
    * before the final ordering (engine-stable boundary).
    */
  def typeAffinity(events: DataFrame, user: Column, typeCol: Column): DataFrame = {
    val ut = events.select(user.as("u"), typeCol.as("t")).distinct()
    val nUsers = events.select(user.as("u")).distinct()
      .agg(count(lit(1)).cast("double").as("n_users"))
    val singles = ut.groupBy("t").agg(count(lit(1)).as("ct"))
    val pairs = ut.as("a").join(ut.as("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(count(lit(1)).as("cab"))
    pairs
      .join(broadcast(singles.select(col("t").as("ta"), col("ct").as("ca"))), Seq("ta"))
      .join(broadcast(singles.select(col("t").as("tb"), col("ct").as("cb"))), Seq("tb"))
      .crossJoin(broadcast(nUsers))
      .select(col("ta"), col("tb"), col("cab"),
        round((col("cab").cast("double") * col("n_users")) /
          (col("ca").cast("double") * col("cb").cast("double")), 6).as("lift"))
  }

  /** Cohort retention matrix: users grouped by acquisition week (their
    * FIRST event), counted as active per whole-week offset from that first
    * event. Two key-aligned exchanges: the first-event aggregation and the
    * join back both hash on the user key (co-partitioned — one logical
    * shuffle of the fact table), then the (cohort, offset) matrix is a
    * distinct-count aggregation on a tiny key space. No windows, no
    * self-join explosion.
    */
  def retention(events: DataFrame, user: Column, ts: Column): DataFrame = {
    val first = events.groupBy(user.as("u")).agg(min(ts).as("first_ts"))
    events.select(user.as("u"), ts.as("ts"))
      .join(first, Seq("u"))
      .select(col("u"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
        floor(datediff(col("ts"), col("first_ts")) / 7).cast("long").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("u")).as("n_users"))
  }

  /** Time-bucket resample with GAP FILL and a trailing rolling mean — the
    * regularization step before any time-series model or anomaly monitor
    * (raw event streams have holes; models want a dense grid). Per group:
    * counts per `bucketMinutes` bucket, missing buckets between the group's
    * first and last activity materialized as explicit zeros, then a
    * 3-bucket trailing average over the dense series.
    *
    * Scale shape: the RAW table is touched exactly once, by the bucketed
    * pre-aggregation (map-side combined). Gap filling happens on the
    * AGGREGATED grid: the per-group `[min,max]` bucket span is a tiny
    * agg, the dense axis is `sequence()+explode` (distributed generate —
    * never a driver loop or a cross join with a calendar table), and the
    * fill join is bucket-grid vs bucket-grid. The rolling window sorts the
    * dense grid per group — rows = buckets, not events. All-integer until
    * the final mean division.
    */
  /** Per-(group, bucket) event counts — the bucketed pre-agg shared by the
    * batch resample/anomaly operators and the STREAMING volume monitor
    * (which runs it per micro-batch and sum-merges on read).
    */
  def bucketCounts(
      events: DataFrame, grp: Column, ts: Column, bucketMinutes: Int): DataFrame = {
    require(bucketMinutes >= 1)
    val busUs = bucketMinutes * 60L * 1000000L
    def bucketOf(c: Column): Column =
      ((unix_micros(c) - pmod(unix_micros(c), lit(busUs))) / lit(busUs)).cast("long")
    events
      .select(grp.as("g"), bucketOf(ts).as("b"))
      .groupBy("g", "b").agg(count(lit(1)).as("n_events"))
  }

  /** The dense (g, b, n_events) bucket grid behind [[resampleGapFill]] and
    * [[anomalyScores]]: [[bucketCounts]] (the raw table's only pass),
    * per-group span, `sequence()+explode` dense axis, zero-filled join.
    */
  private def gapFillGrid(counts: DataFrame): DataFrame = {
    val spans = counts.groupBy("g").agg(min("b").as("b0"), max("b").as("b1"))
    val grid = spans.select(col("g"), explode(sequence(col("b0"), col("b1"))).as("b"))
    grid.join(counts, Seq("g", "b"), "left")
      .select(col("g"), col("b"), coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  def resampleGapFill(
      events: DataFrame, grp: Column, ts: Column,
      bucketMinutes: Int, rollBuckets: Int = 3): DataFrame = {
    require(bucketMinutes >= 1 && rollBuckets >= 1)
    val busUs = bucketMinutes * 60L * 1000000L
    val w = Window.partitionBy("g").orderBy("b").rowsBetween(-(rollBuckets - 1), 0)
    gapFillGrid(bucketCounts(events, grp, ts, bucketMinutes))
      .withColumn("roll_sum", sum(col("n_events")).over(w))
      .withColumn("roll_n", count(lit(1)).over(w))
      .select(col("g"), timestamp_micros(col("b") * busUs).as("bucket_start"),
        col("n_events"),
        round(col("roll_sum").cast("double") / col("roll_n"), 6).as("roll_avg"))
  }

  /** Trailing z-score anomaly detection over the gap-filled bucket series —
    * the monitoring shape a streaming ingest runs against its own volume:
    * each bucket's count is scored against the mean/std of the PRIOR
    * `histBuckets` buckets (current bucket excluded, so a spike cannot mask
    * itself). Gap filling matters: without explicit zeros, silent outage
    * buckets are absent from the window and the baseline inflates.
    *
    * Determinism: the window sums are over INTEGER counts (exact in any
    * order); mean/variance/z are a handful of double ops in a fixed
    * written order, bit-replicable in SQL. Variance via the one-pass
    * identity (Σx² − (Σx)²/n)/n on exact integer sums — no catastrophic
    * cancellation concern at count magnitudes. z is null until `minHist`
    * prior buckets exist or when the trailing variance is 0.
    *
    * Scale shape: [[denseGrid]]'s single pre-agg pass + one window sort per
    * group over BUCKETS (not events).
    */
  def anomalyScores(
      events: DataFrame, grp: Column, ts: Column,
      bucketMinutes: Int, histBuckets: Int = 24, minHist: Int = 6): DataFrame =
    anomalyScoresFromCounts(bucketCounts(events, grp, ts, bucketMinutes),
      bucketMinutes, histBuckets, minHist)

  /** [[anomalyScores]] over pre-aggregated (g, b, n_events) counts — the
    * entry the streaming volume monitor's merge-on-read path uses (its
    * per-batch state IS bucket counts; re-bucketing raw events would
    * require keeping them).
    */
  def anomalyScoresFromCounts(
      counts: DataFrame,
      bucketMinutes: Int, histBuckets: Int = 24, minHist: Int = 6): DataFrame = {
    require(bucketMinutes >= 1 && histBuckets >= 2 && minHist >= 2)
    val busUs = bucketMinutes * 60L * 1000000L
    val w = Window.partitionBy("g").orderBy("b").rowsBetween(-histBuckets, -1)
    gapFillGrid(counts)
      .withColumn("s1", sum(col("n_events")).over(w))
      .withColumn("s2", sum(col("n_events") * col("n_events")).over(w))
      .withColumn("nh", count(lit(1)).over(w))
      .withColumn("mean", col("s1").cast("double") / col("nh"))
      .withColumn("variance",
        (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("nh")) / col("nh"))
      .withColumn("z",
        when(col("nh") >= minHist && col("variance") > 0,
          (col("n_events").cast("double") - col("mean")) / sqrt(col("variance"))))
      .select(col("g"), timestamp_micros(col("b") * busUs).as("bucket_start"),
        col("n_events"), round(col("mean"), 6).as("mean"),
        round(col("z"), 6).as("z"))
  }

  /** Windowed event dedup: keep the FIRST event per (keys…, time-bucket) —
    * the batch twin of `dropDuplicatesWithinWatermark` (idempotent
    * ingestion of at-least-once event feeds: a retried click within the
    * window is the same click). The per-window representative comes from
    * the GroupTopK bounded heap, not a WindowExec sort — the exchange
    * carries one survivor per (key, bucket) out of each partition; ties on
    * equal timestamps break on `tie`.
    */
  def firstEventPerWindow(events: DataFrame, keys: Seq[Column], ts: Column,
      tie: Column, bucketMinutes: Int): DataFrame = {
    require(keys.nonEmpty && bucketMinutes >= 1)
    val busUs = bucketMinutes * 60000000L
    val rows = events.select(
      keys.zipWithIndex.map { case (k, i) => k.as(s"k$i") } ++
        Seq(ts.as("t"), tie.as("tb")): _*)
      .withColumn("bucket", floor(unix_micros(col("t")) / busUs))
    org.apache.spark.sql.graft.GroupTopK.perGroup(rows,
      keys.indices.map(i => col(s"k$i")) :+ col("bucket"),
      Seq(asc("t"), asc("tb")), 1)
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * `P(next | current)` with exact pair counts — the behavioral model
    * behind next-action prediction, funnel-anomaly alerts ("users suddenly
    * skip checkout"), and session simulation. One exchange on the user key
    * feeds the ordered `lead` window; the pair table after the count
    * aggregation is event-type²-bounded (checkpointed once for its two
    * consumers), so the normalizing join never touches event volume.
    * Ordering ties break on `tie` (event id) for determinism.
    */
  def transitions(events: DataFrame, user: Column, ts: Column,
      typ: Column, tie: Column): DataFrame = {
    val w = Window.partitionBy("u").orderBy(col("t"), col("tb"))
    val pairs = events.select(user.as("u"), ts.as("t"), tie.as("tb"), typ.as("e"))
      .withColumn("next_e", lead(col("e"), 1).over(w))
      .filter(col("next_e").isNotNull)
      .groupBy(col("e").as("from_e"), col("next_e").as("to_e"))
      .agg(count(lit(1)).as("cnt"))
      .cut(eager = false)
    val tot = pairs.groupBy("from_e").agg(sum(col("cnt")).cast("long").as("tot"))
    pairs.join(tot, "from_e")
      .select(col("from_e"), col("to_e"), col("cnt"),
        round(col("cnt") / col("tot"), 6).as("p"))
  }
}
