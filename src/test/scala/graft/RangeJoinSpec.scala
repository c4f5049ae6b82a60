package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Banded range-join pins: inclusive bounds, bin-boundary pairs, key
  * isolation, no duplicate candidates, and the equi-join plan shape.
  */
class RangeJoinSpec extends SparkSpec {
  import testImplicits._

  // timestamps in seconds for readability; gap = 10s
  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("id", "k", "sec")
      .select(col("id"), col("k"), timestamp_seconds(col("sec")).as("ts"))

  test("finds pairs within the gap, inclusive, across bin boundaries") {
    val left = ev((1L, "u", 95L), (2L, "u", 100L), (3L, "u", 200L))
    val right = ev((11L, "u", 95L), (12L, "u", 105L), (13L, "u", 111L))
    val got = RangeJoin.within(left, right, "k", "ts", "ts", maxGapSec = 10)
      .select("l_id", "r_id", "gap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 95→[95,105]: 11 (gap 0, inclusive lower), 12 (gap 10s, inclusive upper,
    // crosses the 90/100 bin boundary); 100→[100,110]: 12; 200→: none
    assert(got == Set((1L, 11L, 0L), (1L, 12L, 10000000L), (2L, 12L, 5000000L)))
  }

  test("keys never mix and each pair appears exactly once") {
    val left = ev((1L, "a", 100L), (2L, "b", 100L))
    val right = ev((11L, "a", 101L), (12L, "b", 109L), (13L, "c", 100L))
    val got = RangeJoin.within(left, right, "k", "ts", "ts", maxGapSec = 10)
      .select("l_id", "r_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length)
    assert(got.toSet == Set((1L, 11L), (2L, 12L)))
  }

  test("plan is a hash equi-join on (key, bin), not a cartesian filter") {
    val left = ev((1L, "u", 95L))
    val right = ev((11L, "u", 95L))
    val plan = RangeJoin.within(left, right, "k", "ts", "ts", maxGapSec = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"banded range join must hash on (key, bin):\n$plan")
  }

  // intervals in seconds: (id, key, start, end)
  private def iv(rows: (Long, String, Long, Long)*) =
    rows.toSeq.toDF("id", "k", "s0", "s1")
      .select(col("id"), col("k"),
        timestamp_seconds(col("s0")).as("ts_s"),
        timestamp_seconds(col("s1")).as("ts_e"))

  test("overlaps: closed-interval semantics, each pair exactly once across bins") {
    // [0,25] spans bins 0,1,2 at binSec=10; [20,40] spans 2,3,4 — they share
    // bins 2 only via overlap [20,25]; touching endpoints ([40,50] vs
    // [50,60]) DO overlap (closed); disjoint pairs don't
    val left = iv((1L, "u", 0L, 25L), (2L, "u", 40L, 50L), (3L, "u", 70L, 71L))
    val right = iv((11L, "u", 20L, 40L), (12L, "u", 50L, 60L), (13L, "u", 90L, 95L))
    val got = RangeJoin.overlaps(left, right, "k", "ts_s", "ts_e", "ts_s", "ts_e",
        binSec = 10)
      .select("l_id", "r_id", "overlap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == got.distinct.length, "dedupe-to-overlap-start-bin failed")
    assert(got.toSet == Set(
      (1L, 11L, 5000000L),  // [0,25] ∩ [20,40] = [20,25]
      (2L, 11L, 0L),        // [40,50] ∩ [20,40] = {40}
      (2L, 12L, 0L)))       // [40,50] ∩ [50,60] = {50}
  }

  test("overlaps: keys isolate and long intervals still dedupe") {
    // both intervals span many bins with a long shared run — still one row
    val left = iv((1L, "a", 0L, 100L), (2L, "b", 0L, 100L))
    val right = iv((11L, "a", 5L, 95L))
    val got = RangeJoin.overlaps(left, right, "k", "ts_s", "ts_e", "ts_s", "ts_e",
        binSec = 10)
      .select("l_id", "r_id", "overlap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 11L, 90000000L)))
  }

  test("overlaps plan is an equi-join on (key, bin), not a cartesian filter") {
    val plan = RangeJoin.overlaps(iv((1L, "u", 0L, 5L)), iv((2L, "u", 3L, 9L)),
        "k", "ts_s", "ts_e", "ts_s", "ts_e", binSec = 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval join must hash on (key, bin):\n$plan")
  }
}
