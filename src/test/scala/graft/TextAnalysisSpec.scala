package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Behavioral contracts of the text-analysis operators (beyond-reference
  * training-data pipeline capabilities).
  */
class TextAnalysisSpec extends SparkSpec {

  private def one(text: String) = {
    import testImplicits._
    Seq(Tuple1(text)).toDF("text")
  }

  private def profiled(text: String) =
    TextAnalysis.profile(one(text), col("text")).collect().head

  test("token counts: whitespace vs lexer regex") {
    val r = profiled("hello world, 42 times!")
    assert(r.getAs[Int]("ws_tokens") == 4)
    // hello | world | , | 42 | times | !
    assert(r.getAs[Int]("re_tokens") == 6)
  }

  test("punct ratio counts non-alphanumeric non-space chars") {
    val r = profiled("ab, cd!")
    // non-ws chars: a b , c d !  → 2 punct of 6
    assert(math.abs(r.getAs[Double]("punct_ratio") - 2.0 / 6.0) < 1e-9)
  }

  test("stopword ratio and language id") {
    val en = profiled("the cat sat on the mat")
    assert(math.abs(en.getAs[Double]("stop_ratio") - 2.0 / 6.0) < 1e-9)
    assert(en.getAs[String]("lang_pred") == "en")
    val de = profiled("der hund ist nicht zu haus und das ist gut")
    assert(de.getAs[String]("lang_pred") == "de")
    val und = profiled("xyzzy plugh")
    assert(und.getAs[String]("lang_pred") == "und")
  }

  test("language id tie-break follows profile declaration order") {
    // 'est' is french-only, 'ist' german-only: one hit each → de wins (declared first)
    val r = profiled("ist est")
    assert(r.getAs[String]("lang_pred") == "de")
  }

  test("rolling fingerprint matches the reference fold and is content-sensitive") {
    def expected(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % TextAnalysis.FingerprintMod)
    val r = profiled("hello world")
    assert(r.getAs[Long]("fingerprint") == expected("hello world"))
    assert(profiled("hello worle").getAs[Long]("fingerprint") != r.getAs[Long]("fingerprint"))
    assert(profiled("").getAs[Long]("fingerprint") == 0L)
  }

  test("quality: longer natural text scores above short symbol soup") {
    val good = profiled("the quick brown fox jumps over the lazy dog and runs in a field of grass " * 3)
    val bad = profiled("@# $% ^&")
    assert(good.getAs[Double]("quality") > bad.getAs[Double]("quality"))
    assert(good.getAs[Double]("quality") <= 1.0 + 1e-9)
  }

  test("avg token length") {
    val r = profiled("ab cdef")
    assert(math.abs(r.getAs[Double]("avg_tok_len") - 3.0) < 1e-9)
  }
}
