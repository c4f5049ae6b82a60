package graft.operators

import graft.Checkpoint.CheckpointOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling / data-quality audits — the checks a pipeline runs on an
  * arriving drop before trusting it (beyond-reference: the reference
  * ingests embeddings it assumes well-formed; a 100 TB crawl never is).
  *
  * Both audits are single-aggregation shapes: the cost of profiling is one
  * pass over the columns profiled, never a per-column scan.
  */
object Profile {

  /** Per-column completeness profile: row count, null count, exact
    * distinct count. ONE aggregation job — Spark plans the multi-column
    * `count(DISTINCT ...)` set via a single Expand (each input row is
    * replicated once per profiled column map-side, then one shuffle of the
    * partial aggregates), so the table is READ once regardless of how many
    * columns are profiled. The long-form output comes from a `stack` over
    * the one aggregate row — driver-side cost is one row.
    *
    * Exact distincts keep DuckDB-oracle parity; at 100 TB the Expand
    * multiplies map-side rows by the column count, and the approximate
    * alternative is one [[Sketches.hllCardinality]] pass per column batch
    * (constant state, no Expand) when ±2 % suffices.
    */
  def completeness(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      countDistinct(col(c)).as(s"__dst_$c"))) :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', __cnt_$c, __dst_$c").mkString(", ")
    one.select(col("__n").as("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_non_null, n_distinct)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_nulls"), col("n_distinct"))
  }

  /** Referential-integrity audit: child keys with no parent. The orphan
    * probe is a LEFT ANTI join on the key — at scale a broadcast of the
    * parent key set when it fits, a shuffled semi-join otherwise (left to
    * AQE); the audit result is one row, so this composes into ingest
    * gates ("reject the drop if orphan_rate > 0").
    */
  /** Key-distribution skew audit: the top-N hottest keys with exact count,
    * share, and cumulative share, plus the global key/row counts on every
    * row. This is the measurement that DECIDES the engine's own skew
    * mitigations — `Relational.saltedJoin` salts exactly the keys this
    * audit surfaces, and AQE's skew-join threshold is this distribution's
    * tail in disguise.
    *
    * Shape: one map-side-combined groupBy to per-key counts (the only pass
    * over the data), then `TakeOrderedAndProject` for the top-N cut — the
    * rank/cum-share window runs AFTER the limit, over ≤ N rows, so there is
    * never a single-partition window over the full key set (the classic
    * skew-audit-that-itself-skews mistake). Shares are integer ratios
    * rounded at output; cum_share is an integer cumsum divided once.
    */
  def keySkew(df: DataFrame, key: Column, topN: Int): DataFrame = {
    require(topN >= 1)
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("key").asc).limit(topN)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("key").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    top.crossJoin(totals)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("cnt").desc, col("key").asc)))
      .withColumn("cum_cnt", sum(col("cnt")).over(w))
      .select(col("rnk"), col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        round(col("cum_cnt").cast("double") / col("n_rows"), 6).as("cum_share"),
        col("n_keys"), col("n_rows"))
  }

  def orphanAudit(child: DataFrame, childKey: Column,
                  parent: DataFrame, parentKey: Column): DataFrame = {
    val orphans = child.select(childKey.as("__k"))
      .join(parent.select(parentKey.as("__k")), Seq("__k"), "left_anti")
    val nChild = child.select(childKey.as("__k"))
    nChild.agg(count(lit(1)).as("n_children"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(col("n_children"), col("n_orphans"),
        round(col("n_orphans").cast("double") / col("n_children"), 6)
          .as("orphan_rate"))
  }

  /** Join fan-out histogram: for every parent key, how many child rows
    * reference it — aggregated into (n_children → n_parents) — including
    * the zero-child parents the bare child-side groupBy would miss. The
    * join-risk audit run before trusting a fact/dimension join: a long
    * tail here is exactly where a merge explodes or a broadcast skews
    * ([[keySkew]] names the hot keys; this shows the distribution).
    * Two narrow key-only aggregations + one left join; child payload
    * columns are never read.
    */
  def fanoutHistogram(child: DataFrame, childKey: Column,
      parent: DataFrame, parentKey: Column): DataFrame =
    parent.select(parentKey.as("__k"))
      .join(child.select(childKey.as("__k"))
        .groupBy("__k").agg(count(lit(1)).as("c")), Seq("__k"), "left")
      .select(coalesce(col("c"), lit(0L)).as("n_children"))
      .groupBy("n_children").agg(count(lit(1)).as("n_parents"))

  /** Numeric column profile: per column its non-null count, min/max, mean,
    * and population stddev — the moments half of the audit
    * ([[completeness]] covers null/distinct). ONE aggregation job over all
    * profiled columns; the long-form output is a `stack` over the single
    * aggregate row.
    *
    * Sums accumulate as DECIMAL-cast rows (the pricing-summary pattern,
    * widened so overflow can't NULL rows silently under non-ANSI casts):
    * decimal addition is exact and associative, so the mean and the
    * E[x²]−E[x]² stddev epilogue are partition-order-invariant — a raw
    * double sum over a 100 TB column drifts in the low digits with every
    * re-partition and is unauditable. The FIRST moment uses
    * DECIMAL(30,6); the SECOND splits x² into an integer lane and a
    * fractional lane summed separately — a single-sum scale is a forced
    * trade between granularity and headroom (DECIMAL(38,12) keeps 1e-12
    * granularity for small-magnitude columns like l_discount but caps
    * Σx² at 1e26, which an epoch-seconds column (x² ≈ 3e18) overflows at
    * only ~3e7 rows; the earlier DECIMAL(38,6) had the headroom but only
    * ~2 significant digits per small row). The split takes both ends:
    * the integer lane `x² − (x² mod 1)` sums in DECIMAL(38,0) (1e38
    * capacity — 3e19 epoch-scale rows), the fractional lane in
    * DECIMAL(38,12) where each term < 1 so Σ < n never overflows. Both
    * lanes are exact decimal sums; `mod 1.0` (not `floor`) because
    * Spark's floor(double) returns LONG and silently wraps past 9.2e18.
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val dec = "decimal(30,6)"
    // pre-project the x² lanes once per row — inside the agg each sum()
    // input is evaluated independently (no cross-aggregate subexpression
    // sharing), so the square + fmod + decimal casts would run twice per
    // column per row; the projection fuses into the scan stage
    val pre = df.select(cols.flatMap { c =>
      val x2 = col(c).cast("double") * col(c).cast("double")
      val x2h = x2 - x2 % lit(1.0)
      // the integer lane is an exact whole double: routing it through a
      // LONG cast produces the identical decimal while skipping the
      // double→decimal cast's per-row BigDecimal.valueOf(toString) — the
      // measured hot spot of this one-pass profile (the string format was
      // ~1/3 of the aggregate's CPU). Threshold is 2^53 (round-10, advisor
      // fix): below it every whole double is exactly one integer, so the
      // long cast and the shortest-round-trip string cast provably agree
      // digit for digit; ABOVE 2^53 consecutive doubles skip integers and
      // the two casts can differ in low-order digits (the old 4e18 bound
      // rested on a wrong invariant there). Larger magnitudes (|x| ≳ 9.5e7)
      // keep the original string-based cast, so the operator stays generic.
      val x2hDec = when(abs(x2h) <= lit(9007199254740992.0),
        x2h.cast("long").cast("decimal(38,0)"))
        .otherwise(x2h.cast("decimal(38,0)"))
      Seq(col(c),
        x2hDec.as(s"__x2h_$c"),
        (x2 % lit(1.0)).cast("decimal(38,12)").as(s"__x2l_$c"))
    }: _*)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__n_$c"),
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c"),
      sum(col(c).cast(dec)).as(s"__s_$c"),
      sum(col(s"__x2h_$c")).as(s"__s2h_$c"),
      sum(col(s"__x2l_$c")).as(s"__s2l_$c"))) :+
      count(lit(1)).as("__rows")
    val one = pre.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __n_$c, __mn_$c, __mx_$c, CAST(__s_$c AS DOUBLE), " +
        s"CAST(__s2h_$c AS DOUBLE) + CAST(__s2l_$c AS DOUBLE)")
      .mkString(", ")
    val mean = col("s") / col("n_non_null")
    one.select(col("__rows").as("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_non_null, mn, mx, s, s2)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_nulls"),
        round(col("mn"), 6).as("min_v"), round(col("mx"), 6).as("max_v"),
        round(mean, 6).as("mean"),
        round(sqrt(greatest(lit(0.0),
          col("s2") / col("n_non_null") - mean * mean)), 6).as("stddev"))
  }

  /** Robust per-group outlier detection: a row is flagged when its absolute
    * deviation from the group median exceeds `k · 1.4826 · MAD` (median
    * absolute deviation; 1.4826 makes MAD a consistent σ estimator under
    * normality). The mean/σ z-score alternative ([[graft.operators.EmbedQc]]
    * uses it for embeddings) is itself dragged by the outliers it hunts;
    * MAD has a 50 % breakdown point — the standard data-quality screen for
    * contaminated value columns.
    *
    * Exact medians = two `percentile` aggregation passes over 6-dp-rounded
    * values (rounding before the percentile keeps interpolation arithmetic
    * oracle-parity, the q_curate_quality_filter trick). The deviation table
    * is narrow (group, id, value, med) and checkpointed once so the second
    * pass and the final join don't re-run the scoring lineage. At 100 TB,
    * swap the exact percentiles for [[Sketches.histogramQuantilesByGroup]]
    * (one pass, constant state) when bin-width precision suffices.
    *
    * Flat groups (MAD = 0) yield null `robust_z` and are never flagged —
    * zero spread means no evidence of outliers, not infinite z.
    */
  def madOutliers(df: DataFrame, grp: Column, id: Column, value: Column,
      k: Double = 3.0): DataFrame = {
    // integer micro-unit pipeline: v6 = round(v·1e6) is an exact LONG, the
    // interpolated median of longs is an integer or a half (doubling both
    // sides keeps everything integral), so med/dev/MAD carry NO decimal
    // rounding boundaries between engines — at sf0.1 the float spelling
    // put ~half the deviations exactly on .5e-6 ties, where round()
    // implementations legitimately disagree. One double division at the
    // very end.
    // two consumers (the median pass and the deviation join): cut so the
    // caller's scoring expression (often a full quality-score pass over
    // the text) runs once — the narrow (g, id, v6) table is the cheap
    // thing to materialize (round-9)
    val rows = df.select(grp.as("g"), id.as("id"),
      round(round(value, 6) * 1e6).cast("long").as("v6"))
      .cut(eager = false)
    val med = rows.groupBy("g")
      .agg((expr("percentile(v6, 0.5)") * 2).cast("long").as("m2"))
    val dev = rows.join(med, "g")
      .withColumn("dev2", abs(col("v6") * 2 - col("m2")))
      .cut(eager = false)
    val mad = dev.groupBy("g")
      .agg((expr("percentile(dev2, 0.5)") * 2).cast("long").as("mad4"))
    dev.join(mad, "g")
      .select(col("g"), col("id"),
        round(col("v6") / 1e6, 6).as("value"),
        round(col("m2") / 2e6, 6).as("med"),
        when(col("mad4") > 0,
          round(col("dev2") * 2 / (lit(1.4826) * col("mad4")), 6)).as("robust_z"),
        (col("mad4") > 0 &&
          col("dev2") * 2 > lit(k) * lit(1.4826) * col("mad4")).as("is_outlier"))
  }
}
