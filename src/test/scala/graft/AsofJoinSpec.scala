package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.Row

/** Behavioral pins for the as-of join: backward/forward direction, inclusive
  * boundary, left-outer nulls, and deterministic tie-breaks.
  */
class AsofJoinSpec extends SparkSpec {
  import testImplicits._

  private def trades = Seq(
    // (trade_id, sym, t)
    (1L, "A", 100L), (2L, "A", 205L), (3L, "B", 50L), (4L, "C", 10L)
  ).toDF("trade_id", "sym", "t")

  private def quotes = Seq(
    // (quote_id, sym, t, px)
    (10L, "A", 90L, 1.0), (11L, "A", 100L, 2.0), (12L, "A", 210L, 3.0),
    (13L, "B", 60L, 4.0)
  ).toDF("quote_id", "sym", "t", "px")

  test("backward matches latest quote at or before the trade") {
    val out = AsofJoin.backward(trades, quotes, "sym", "t", "t", "quote_id")
      .select("trade_id", "r_quote_id", "r_px").collect().map {
        r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
      }.toMap
    assert(out(1L) == 11L) // equal timestamp is inclusive
    assert(out(2L) == 11L) // 205 -> latest at 100
    assert(out(3L) == -1L) // B trade at 50 precedes the only B quote
    assert(out(4L) == -1L) // no C quotes at all: left-outer null
  }

  test("forward matches earliest quote at or after the trade") {
    val out = AsofJoin.forward(trades, quotes, "sym", "t", "t", "quote_id")
      .select("trade_id", "r_quote_id").collect().map {
        r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))
      }.toMap
    assert(out(1L) == 11L) // inclusive at equal ts
    assert(out(2L) == 12L)
    assert(out(3L) == 13L)
    assert(out(4L) == -1L)
  }

  test("ties on (key, ts) break to max tiebreak backward, min forward") {
    val l = Seq((1L, "A", 100L)).toDF("id", "k", "t")
    val r = Seq((7L, "A", 100L), (9L, "A", 100L), (8L, "A", 100L))
      .toDF("rid", "k", "t")
    val b = AsofJoin.backward(l, r, "k", "t", "t", "rid").select("r_rid").collect()
    assert(b.head.getLong(0) == 9L)
    val f = AsofJoin.forward(l, r, "k", "t", "t", "rid").select("r_rid").collect()
    assert(f.head.getLong(0) == 7L)
  }

  test("plan shuffles each side once on the key (no pair blow-up join)") {
    val out = AsofJoin.backward(trades, quotes, "sym", "t", "t", "quote_id")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"asof should be a union-window merge, not a join:\n$plan")
  }
}
