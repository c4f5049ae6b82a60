package graft.operators

import graft.functions.TextFeatures
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hybrid rerank (reference `hybrid_rerank_results`,
  * /root/reference/minivectordb/vector_database.py:413-441): fuse the vector
  * search score with a char-n-gram hash cosine and a fuzzy partial-ratio
  * against the query TEXT, then re-sort and trim to k.
  *
  * Scale contract: the reference feeds this the OUTPUT of `find_most_similar`
  * (sentences + search scores, README.md:96-102) — a ≤ k-row relation. The
  * plan is therefore UDF-over-tiny-input + `TakeOrderedAndProject`; the
  * distributed heavy lifting happened upstream in Search. The deliberate
  * scale quirks are preserved: fuzzy is on a 0–100 scale while the other two
  * are cosines in [−1, 1] (vector_database.py:424), and weights default to
  * (0.80, 0.15, 0.05) (vector_database.py:413).
  */
object Rerank {

  val DefaultWeights: (Double, Double, Double) = (0.80, 0.15, 0.05)

  private val hashFeatures = udf(TextFeatures.charNgramHash _)
  private val partialRatio = udf(TextFeatures.partialRatio _)

  /** Char-n-gram signed-hash feature vector column (O14). */
  def hashFeatureCol(text: Column): Column = hashFeatures(text)

  /** Fuzzy partial-ratio column (O16), 0–100. */
  def partialRatioCol(query: Column, text: Column): Column = partialRatio(query, text)

  /** Rerank `results` — rows carrying a sentence column and a search-score
    * column — against `query`. Returns the input columns plus `hash_score`,
    * `fuzzy_score`, `combined_score`, ordered by `combined_score` descending
    * (tie-broken on the sentence for determinism), limited to k.
    *
    * The reference's catch-all fallback (any exception ⇒ first k inputs
    * untouched, vector_database.py:439-441, pinned by
    * tests/test_vector_database.py:554-570 for the empty case) dissolves
    * here: an empty input plan yields an empty result naturally.
    */
  def hybridRerank(
      results: DataFrame,
      sentence: Column,
      searchScore: Column,
      query: String,
      k: Int = 5,
      weights: (Double, Double, Double) = DefaultWeights): DataFrame = {
    // Hash the (single) query driver-side; ship the 64-d vector as a literal.
    val queryVec = TextFeatures.charNgramHash(query).toSeq
    results
      .withColumn("hash_score", graft.functions.VectorFunctions.dot(hashFeatures(sentence), typedLit(queryVec)))
      .withColumn("fuzzy_score", partialRatio(lit(query), sentence).cast("double"))
      .withColumn(
        "combined_score",
        lit(weights._1) * searchScore + lit(weights._2) * col("hash_score") +
          lit(weights._3) * col("fuzzy_score"))
      .orderBy(desc("combined_score"), sentence.asc)
      .limit(k)
  }
}
