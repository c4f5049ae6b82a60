package graft

import graft.functions.TextFeatures
import graft.operators.Rerank
import org.apache.spark.sql.functions._

/** Behavioral contracts of the rerank path (SURVEY §2 O14–O17), mirroring
  * tests/test_vector_database.py:272-323,554-570.
  */
class RerankSpec extends SparkSpec {

  test("partial_ratio: substring alignment scores 100 (thefuzz semantics)") {
    assert(TextFeatures.partialRatio("yankees", "new york yankees") == 100)
    assert(TextFeatures.partialRatio("this is a test", "this is a test!") == 100)
    assert(TextFeatures.partialRatio("abc", "abc") == 100)
  }

  test("partial_ratio: empty input scores 0; disjoint strings score low") {
    assert(TextFeatures.partialRatio("", "anything") == 0)
    assert(TextFeatures.partialRatio("anything", "") == 0)
    assert(TextFeatures.partialRatio(null, "x") == 0)
    assert(TextFeatures.partialRatio("qqqq", "zzzz") == 0)
  }

  test("partial_ratio is symmetric in argument order for equal-length inputs") {
    val a = "spark engine"; val b = "spray ennine"
    assert(TextFeatures.partialRatio(a, b) == TextFeatures.partialRatio(b, a))
  }

  test("ratio: known difflib values") {
    // difflib.SequenceMatcher(None, "abcd", "bcde").ratio() == 0.75
    assert(math.abs(TextFeatures.ratio("abcd", "bcde") - 0.75) < 1e-9)
    assert(TextFeatures.ratio("", "") == 1.0)
    assert(TextFeatures.ratio("abc", "abc") == 1.0)
  }

  test("charNgramHash: 64 dims, L2-normalized, deterministic, empty-safe") {
    val v = TextFeatures.charNgramHash("hello world")
    assert(v.length == 64)
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    assert(v.toSeq == TextFeatures.charNgramHash("hello world").toSeq)
    // lowercase folding: sklearn HashingVectorizer lowercases by default
    assert(v.toSeq == TextFeatures.charNgramHash("HELLO World").toSeq)
    assert(TextFeatures.charNgramHash("").forall(_ == 0.0f))
  }

  test("hash cosine: identical text 1.0, related > unrelated") {
    def cos(a: String, b: String) =
      TextFeatures.hashCosine(TextFeatures.charNgramHash(a), TextFeatures.charNgramHash(b))
    assert(math.abs(cos("the quick brown fox", "the quick brown fox") - 1.0) < 1e-5)
    val related = cos("the quick brown fox", "the quick brown cat")
    val unrelated = cos("the quick brown fox", "zzz qqq 123 777")
    assert(related > unrelated)
  }

  test("hybridRerank: fusion arithmetic 0.80/0.15/0.05 and ordering (vector_database.py:424)") {
    import testImplicits._
    val df = Seq(
      ("a perfect match sentence", 0.9),
      ("unrelated words entirely", 0.95),
      ("a perfect match sentence here", 0.5)).toDF("sentence", "search_score")
    val out = Rerank
      .hybridRerank(df, col("sentence"), col("search_score"), "a perfect match sentence", k = 3)
      .collect()
    assert(out.length == 3)
    // verify combined = w0*search + w1*hash + w2*fuzzy row-wise
    out.foreach { r =>
      val expected = 0.80 * r.getAs[Double]("search_score") +
        0.15 * r.getAs[Double]("hash_score") + 0.05 * r.getAs[Double]("fuzzy_score")
      assert(math.abs(expected - r.getAs[Double]("combined_score")) < 1e-9)
    }
    // the exact-match sentence gets fuzzy=100 → 0.05*100 = 5 dominates search deltas
    assert(out.head.getAs[String]("sentence") == "a perfect match sentence")
    // ordering is descending on combined
    val scores = out.map(_.getAs[Double]("combined_score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("hybridRerank: empty input yields empty result (tests/test_vector_database.py:554-570)") {
    import testImplicits._
    val df = Seq.empty[(String, Double)].toDF("sentence", "search_score")
    assert(Rerank.hybridRerank(df, col("sentence"), col("search_score"), "q", k = 5).isEmpty)
  }

  test("hybridRerank: k trims the result") {
    import testImplicits._
    val df = (1 to 10).map(i => (s"sentence number $i", i / 10.0)).toDF("sentence", "search_score")
    assert(Rerank.hybridRerank(df, col("sentence"), col("search_score"), "sentence", k = 4).count() == 4)
  }

  test("NgramPolyHashVecExpr: column kernel equals the driver kernel; normalized; empty-safe") {
    import testImplicits._
    import graft.functions.NgramPolyHashVecExpr
    val texts = Seq("spark joins tables fast", "Spark Joins Tables Fast", "", "ab")
    val df = texts.toDF("t")
    val colVecs = df.select(org.apache.spark.sql.graft.Bridge.column(
        NgramPolyHashVecExpr(org.apache.spark.sql.graft.Bridge.expression(col("t")))))
      .collect().map(_.getSeq[Double](0))
    texts.zip(colVecs).foreach { case (t, v) =>
      assert(v == NgramPolyHashVecExpr.features(t).toSeq, s"kernel mismatch for '$t'")
    }
    // lowercase folding: case variants hash identically
    assert(colVecs(0) == colVecs(1))
    // normalized (or all-zero for empty input)
    assert(math.abs(colVecs(0).map(x => x * x).sum - 1.0) < 1e-12)
    assert(colVecs(2).forall(_ == 0.0))
  }

  test("hybridRerankDeterministic: fusion arithmetic, overlap 0-100 scale, id tiebreak") {
    import testImplicits._
    import graft.functions.NgramPolyHashVecExpr
    val q = "alpha beta gamma"
    val df = Seq(
      ("1", "alpha beta gamma", 0.5),   // exact text: hash cos 1, overlap 100
      ("2", "delta epsilon zeta", 0.9), // disjoint tokens: overlap 0
      ("3", "alpha beta gamma", 0.5)    // tie with id 1 on every signal
    ).toDF("id", "sentence", "search_score")
    val got = Rerank.hybridRerankDeterministic(df, col("id"), col("sentence"),
        col("search_score"), q, k = 3).collect()
    // row 1: 0.80*0.5 + 0.15*1.0 + 0.05*100 = 5.55 — the 0-100 third signal
    // dominating two cosines is the reference's preserved scale quirk
    assert(math.abs(got.head.getAs[Double]("combined_score") - 5.55) < 1e-9)
    assert(got.map(_.getString(0)).toSeq == Seq("1", "3", "2"))
    // hash_score of the exact text is exactly 1 up to normalization rounding
    val v = NgramPolyHashVecExpr.features(q)
    assert(math.abs(v.zip(v).map { case (a, b) => a * b }.sum - 1.0) < 1e-12)
  }

  test("rrfFusion: reciprocal arithmetic, single-list docs score one term, rank tiebreak") {
    import testImplicits._
    val dense = Seq(("d1", 0.9), ("d2", 0.8), ("both", 0.7)).toDF("id", "score")
    val sparse = Seq(("both", 5.0), ("s1", 4.0)).toDF("id", "score")
    val got = Rerank.rrfFusion(Seq("dense" -> dense, "sparse" -> sparse), c = 60, k = 10)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("rrf_score")).toMap
    // 'both' ranks 3rd dense, 1st sparse
    assert(math.abs(got("both") - (1.0 / 63 + 1.0 / 61)) < 1e-12)
    // docs in one list only contribute a single reciprocal term
    assert(math.abs(got("d1") - 1.0 / 61) < 1e-12)
    assert(math.abs(got("s1") - 1.0 / 62) < 1e-12)
    // the doc present in both lists outranks every single-list doc here
    val order = Rerank.rrfFusion(Seq("dense" -> dense, "sparse" -> sparse), k = 10)
      .collect().map(_.getString(0)).toSeq
    assert(order.head == "both")
    // score ties within a list break on id ascending: equal-score rows rank
    // deterministically
    val tied = Seq(("b", 1.0), ("a", 1.0)).toDF("id", "score")
    val r = Rerank.rrfFusion(Seq("only" -> tied), k = 2).collect()
      .map(x => x.getString(0) -> x.getInt(1)).toMap
    assert(r("a") == 1 && r("b") == 2)
  }
}
