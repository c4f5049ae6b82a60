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
}
