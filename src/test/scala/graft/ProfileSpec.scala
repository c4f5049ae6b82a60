package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {

  test("completeness: exact null/distinct counts per column in one pass") {
    import testImplicits._
    val df = Seq(
      (1L, Some("a"), Some(1.0)), (2L, None, Some(2.0)),
      (3L, Some("a"), None), (4L, Some("b"), Some(2.0))
    ).toDF("id", "s", "v")
    val got = Profile.completeness(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("id") == ((4L, 0L, 4L)))
    assert(got("s") == ((4L, 1L, 2L)))  // null ignored by distinct
    assert(got("v") == ((4L, 1L, 2L)))
    // ONE table read: exactly one scan node in the plan (Expand, not
    // per-column subplans)
    val plan = Profile.completeness(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"multi-distinct must plan via Expand:\n$plan")
  }

  test("orphan audit: counts and rate; zero orphans under the full parent") {
    import testImplicits._
    val child = Seq((1L, "x"), (2L, "y"), (3L, "z"), (3L, "w")).toDF("k", "payload")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Profile.orphanAudit(child, col("k"), parent, col("pk")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getDouble(2) == 0.5)
    val full = Seq(1L, 2L, 3L).toDF("pk")
    val r2 = Profile.orphanAudit(child, col("k"), full, col("pk")).head()
    assert(r2.getLong(1) == 0L && r2.getDouble(2) == 0.0)
  }
}
