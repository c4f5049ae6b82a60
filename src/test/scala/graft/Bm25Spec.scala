package graft

import graft.operators.Bm25
import org.apache.spark.sql.functions._

/** BM25 behavioral pins: idf discrimination, tf saturation, length
  * normalization, and the broadcast plan shape.
  */
class Bm25Spec extends SparkSpec {
  import testImplicits._

  private def docs = Seq(
    (1L, "spark runs fast queries"),
    (2L, "spark spark spark spark spark spark spark spark"),
    (3L, "a very long document about many things entirely unrelated to the engine " +
         "with lots and lots of additional words spark"),
    (4L, "nothing relevant here at all")
  ).toDF("id", "text")

  test("rarer terms outweigh common ones") {
    // "queries" appears only in doc 1; "spark" in three docs.
    val r = Bm25.rank(docs, col("id"), col("text"), Seq("queries"), k = 4)
      .collect().map(x => (x.getLong(0), x.getDouble(1)))
    assert(r.head._1 == 1L && r.head._2 > 0)
    assert(r.tail.forall(_._2 == 0.0))
  }

  test("term frequency saturates (k1 bounds repetition payoff)") {
    val r = Bm25.rank(docs, col("id"), col("text"), Seq("spark"), k = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // 8x repetition beats 1x, but by less than 8x
    assert(r(2L) > r(1L))
    assert(r(2L) < 8 * r(1L))
    // same single occurrence in a longer doc scores lower
    assert(r(3L) < r(1L))
    assert(r(4L) == 0.0)
  }

  test("multi-term score is the sum of per-term contributions") {
    val single = Seq("spark", "queries").map(t =>
      Bm25.rank(docs, col("id"), col("text"), Seq(t), k = 4)
        .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap)
    val both = Bm25.rank(docs, col("id"), col("text"), Seq("spark", "queries"), k = 4)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    for (id <- 1L to 4L)
      assert(math.abs(both(id) - (single(0)(id) + single(1)(id))) < 1e-12)
  }

  test("corpus stats join is a broadcast, ranking a TakeOrderedAndProject") {
    val plan = Bm25.rank(docs, col("id"), col("text"), Seq("spark"), k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"))
    assert(plan.contains("TakeOrderedAndProject"))
  }
}
