package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GroupTopK

/** Custom whole-operator tier: per-group top-k via logical node + strategy
  * + heap-based physical operator. Pins equivalence with the window
  * formulation, plan shape (no WindowExec, no input sort), and bounded-k
  * edge cases.
  */
class GroupTopKSpec extends SparkSpec {
  import testImplicits._

  private def scores = Seq(
    ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.95), ("a", 4L, 0.1),
    ("b", 5L, 0.5), ("b", 6L, 0.7),
    ("c", 7L, 0.3)
  ).toDF("grp", "id", "score")

  test("matches the window row_number formulation, ties broken by id") {
    val custom = GroupTopK.perGroup(scores, Seq(col("grp")),
        Seq(col("score").desc, col("id").asc), k = 2)
      .select("grp", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy("grp").orderBy(desc("score"), asc("id"))
    val viaWindow = scores.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).select("grp", "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(custom == viaWindow)
    assert(custom == Set(("a", 3L), ("a", 1L), ("b", 6L), ("b", 5L), ("c", 7L)))
  }

  test("rows within a group come back in the requested order") {
    val got = GroupTopK.perGroup(scores, Seq(col("grp")),
        Seq(col("score").desc), k = 3)
      .filter(col("grp") === "a").select("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(3L, 1L, 2L))
  }

  test("k larger than any group returns everything") {
    val got = GroupTopK.perGroup(scores, Seq(col("grp")),
      Seq(col("score").desc), k = 100)
    assert(got.count() == scores.count())
  }

  test("plan uses the heap operator — no WindowExec, no input sort") {
    val plan = GroupTopK.perGroup(scores, Seq(col("grp")),
        Seq(col("score").desc, col("id").asc), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), s"must not fall back to WindowExec:\n$plan")
    assert(!plan.contains("Sort "), s"must not sort the input:\n$plan")
  }

  // AQE wraps the plan (AdaptiveSparkPlanExec / QueryStageExec hide their
  // subtrees from collect) — walk through both wrappers explicitly
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  test("plans as partial-then-final: partial heap below the exchange") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.graft.GroupTopKExec
    val df = GroupTopK.perGroup(scores, Seq(col("grp")),
      Seq(col("score").desc, col("id").asc), k = 2)
    df.collect() // materialize AQE's final plan
    val nodes = allNodes(df.queryExecution.executedPlan)
    val modes = nodes.collect { case g: GroupTopKExec => g.partial }.sorted
    assert(modes == Seq(false, true),
      s"expected one partial and one final GroupTopKExec:\n${df.queryExecution.executedPlan}")
    // the partial node must sit BELOW the shuffle the final node requires —
    // that ordering is the whole point (map-side reduction pre-exchange)
    val underExchange = nodes.collect { case e: ShuffleExchangeLike =>
      allNodes(e).collect { case g: GroupTopKExec if g.partial => g }
    }.flatten
    assert(underExchange.nonEmpty,
      s"partial node not below the exchange:\n${df.queryExecution.executedPlan}")
  }

  test("partial cap: exchange carries <= groups*k*P rows, final emits exact top-k") {
    import org.apache.spark.sql.graft.GroupTopKExec
    // many partitions so the partial cap is actually exercised
    val wide = scores.repartition(8)
    val df = GroupTopK.perGroup(wide, Seq(col("grp")),
      Seq(col("score").desc, col("id").asc), k = 1)
    val rows = df.collect()
    assert(rows.length == 3) // one per group
    val nodes = allNodes(df.queryExecution.executedPlan)
    val partialOut = nodes.collect { case g: GroupTopKExec if g.partial => g }
      .head.metrics("numOutputRows").value
    val finalOut = nodes.collect { case g: GroupTopKExec if !g.partial => g }
      .head.metrics("numOutputRows").value
    // 3 groups * k=1 * 8 partitions = 24 worst case; actual input is 7 rows
    assert(partialOut <= 3 * 1 * 8 && partialOut >= 3,
      s"partial emitted $partialOut rows — map-side cap not applied")
    assert(finalOut == 3, s"final emitted $finalOut rows")
  }

  test("equivalence on real data: top-3 orders per customer by price") {
    val ord = graft.sources.Testdata.orders(spark, "/root/testdata/sf0.001")
    val custom = GroupTopK.perGroup(ord, Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val viaWindow = ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == viaWindow && custom.nonEmpty)
  }
}
