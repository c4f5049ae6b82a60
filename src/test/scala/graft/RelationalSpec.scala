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
}
