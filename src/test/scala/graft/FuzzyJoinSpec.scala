package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

class FuzzyJoinSpec extends SparkSpec {

  test("deletionVariants: exact neighborhood at d=1 and d=2; empty string safe") {
    import testImplicits._
    val df = Seq("abc", "", "x").toDF("s")
    val d1 = df.select(col("s"), FuzzyJoin.deletionVariants(col("s"), 1).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(d1("abc") == Set("abc", "bc", "ac", "ab"))
    assert(d1("") == Set(""))
    assert(d1("x") == Set("x", ""))
    val d2 = df.select(col("s"), FuzzyJoin.deletionVariants(col("s"), 2).as("v"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(d2("abc") == Set("abc", "bc", "ac", "ab", "a", "b", "c"))
  }

  test("edJoin d=1 equals brute-force levenshtein join (complete blocking)") {
    import testImplicits._
    val left = Seq((1L, "kitten"), (2L, "hello"), (3L, "spark"), (4L, "flink"))
      .toDF("id", "s")
    val right = Seq((10L, "mitten"), (11L, "helo"), (12L, "sparky"),
      (13L, "spark"), (14L, "blink"), (15L, "unrelated")).toDF("id", "s")
    val got = FuzzyJoin.edJoin(left, col("id"), col("s"),
        right, col("id"), col("s"), maxDist = 1)
      .select("l_id", "r_id", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = left.select(col("id").as("a"), col("s").as("sa"))
      .crossJoin(right.select(col("id").as("b"), col("s").as("sb")))
      .withColumn("d", levenshtein(col("sa"), col("sb")))
      .filter(col("d") <= 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4))).toSet
    assert(got == brute && got.nonEmpty)
    // substitution, deletion-side, and exact matches all present
    assert(got.contains((1L, 10L, 1)))   // kitten ~ mitten (sub)
    assert(got.contains((2L, 11L, 1)))   // hello ~ helo (del)
    assert(got.contains((3L, 13L, 0)))   // exact
    assert(got.contains((3L, 12L, 1)))   // spark ~ sparky (ins)
  }

  test("edJoin d=2 equals brute force on random short strings") {
    import testImplicits._
    val rnd = new scala.util.Random(7)
    def word() = (1 to (3 + rnd.nextInt(4))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    val rows = (1L to 60L).map(i => (i, word()))
    val df = rows.toDF("id", "s")
    val got = FuzzyJoin.edSelfJoin(df, col("id"), col("s"), maxDist = 2)
      .select("id_a", "id_b", "dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val brute = df.select(col("id").as("a"), col("s").as("sa"))
      .crossJoin(df.select(col("id").as("b"), col("s").as("sb")))
      .filter(col("a") < col("b"))
      .withColumn("d", levenshtein(col("sa"), col("sb")))
      .filter(col("d") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(4))).toSet
    assert(got == brute && got.nonEmpty)
  }

  test("edJoin plans an equi-join on the variant key, never a cartesian") {
    import testImplicits._
    val df = Seq((1L, "abc"), (2L, "abd")).toDF("id", "s")
    val plan = FuzzyJoin.edSelfJoin(df, col("id"), col("s"), 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"blocking must equi-join:\n$plan")
  }
}
