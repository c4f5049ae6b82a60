package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — record linkage / entity resolution over
  * dirty string keys (beyond-reference: the fuzzy machinery the reference
  * applies per-query at rerank time, `vector_database.py:410-411`, turned
  * into a set-at-a-time join a 100 TB ingest can run between a dirty drop
  * and a canonical dimension).
  *
  * Blocking is the symmetric-deletion scheme (FastSS, Bocek et al. 2007;
  * popularized as SymSpell): every string expands to its ≤d-deletion
  * neighborhood, and `ed(a,b) <= d` implies the neighborhoods share a
  * variant (delete the edited positions from either side), so the variant
  * equi-join is a COMPLETE candidate generator — never a cross join. The
  * exact `levenshtein` verify then keeps only true matches, so the result
  * is exact.
  *
  * Scale shape: (|s| choose <=d) narrow (id, variant) rows per input row
  * through ONE equi-join; candidate pairs are deduped on ids before the
  * verify so levenshtein runs once per candidate pair. At d=1 a length-L
  * string emits L+1 variants — linear blowup, shuffle-friendly; d=2 is
  * quadratic in L and documented as the practical ceiling (the same bound
  * SymSpell ships with).
  */
object FuzzyJoin {

  /** All strings obtainable from `s` by deleting exactly one character
    * (empty input yields no variants — guards the descending-`sequence`
    * footgun when `length(s)-1 < 0`).
    */
  private def oneDeletions(s: Column): Column =
    when(length(s) > 0,
      transform(sequence(lit(0), length(s) - 1), i =>
        concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s)))))
      .otherwise(array().cast("array<string>"))

  /** The ≤`d`-deletion neighborhood of `s` (includes `s` itself),
    * duplicates removed. Pure column algebra — codegen'd, no UDF.
    */
  def deletionVariants(s: Column, d: Int): Column = {
    require(d >= 0 && d <= 2, s"deletion depth $d outside the practical 0..2 range")
    var acc = array(s)
    for (_ <- 1 to d)
      acc = array_distinct(concat(acc, flatten(transform(acc, v => oneDeletions(v)))))
    acc
  }

  /** Exact edit-distance-≤`maxDist` join of `left` and `right` on string
    * keys. Output: (l_id, l_str, r_id, r_str, dist), one row per matching
    * pair. Candidates come from the deletion-variant equi-join (complete by
    * the FastSS property), are deduped to one row per (l_id, r_id), and are
    * verified with the built-in codegen `levenshtein`.
    */
  def edJoin(
      left: DataFrame, lId: Column, lStr: Column,
      right: DataFrame, rId: Column, rStr: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, "maxDist must be 1 or 2")
    edJoinProbe(left, lId, lStr,
      variantTable(right, rId, rStr, maxDist), maxDist)
  }

  /** The exploded (r_id, r_str, __v) deletion-variant table of the right
    * side — precompute (and persist/checkpoint) this ONCE when the right
    * side is a frozen dimension probed repeatedly (the streaming ER screen:
    * re-exploding a 150k-row dimension to millions of variant rows per
    * micro-batch is pure waste).
    */
  def variantTable(right: DataFrame, rId: Column, rStr: Column,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2, "maxDist must be 1 or 2")
    right.select(rId.as("r_id"), rStr.as("r_str"))
      .withColumn("__v", explode(deletionVariants(col("r_str"), maxDist)))
  }

  /** [[edJoin]] against a prebuilt [[variantTable]].
    *
    * Round-9 plan shape: the equi-join runs on `xxhash64(__v)` instead of
    * the variant STRING — an 8-byte key where the variant averages ~20
    * bytes, so the candidate exchange shuffles less than half the bytes
    * and the sort comparators are long compares. A 64-bit hash collision
    * can only ADD candidates, and every candidate is verified by the exact
    * `levenshtein` — while any TRUE match already shares a real variant by
    * the FastSS completeness property — so the result set is unchanged.
    * The length screen and the levenshtein verify both run BEFORE the
    * (l_id, r_id) dedup exchange: only true matches are shuffled, where
    * the former plan shuffled every candidate occurrence and verified
    * after. `dist` is a pure function of the pair, so it is identical
    * across a pair's candidate copies and survives the dedup unchanged.
    */
  def edJoinProbe(
      left: DataFrame, lId: Column, lStr: Column,
      rightVariants: DataFrame, maxDist: Int): DataFrame = {
    val lv = left.select(lId.as("l_id"), lStr.as("l_str"))
      .withColumn("__h",
        explode(transform(deletionVariants(col("l_str"), maxDist), v => xxhash64(v))))
      .select("l_id", "l_str", "__h")
    val rv = rightVariants.select(col("r_id"), col("r_str"),
      xxhash64(col("__v")).as("__h"))
    lv.join(rv, "__h")
      .filter(abs(length(col("l_str")) - length(col("r_str"))) <= maxDist)
      .withColumn("dist", levenshtein(col("l_str"), col("r_str")))
      .filter(col("dist") <= maxDist)
      .dropDuplicates("l_id", "r_id")
      .select("l_id", "l_str", "r_id", "r_str", "dist")
  }

  /** Self-join form: all unordered pairs at edit distance ≤ `maxDist`
    * within one table (id_a < id_b). The near-dup-detection spelling of
    * [[edJoin]] for dirty dimension keys.
    */
  def edSelfJoin(df: DataFrame, id: Column, str: Column, maxDist: Int): DataFrame =
    edJoin(df, id, str, df, id, str, maxDist)
      .filter(col("l_id") < col("r_id"))
      .select(col("l_id").as("id_a"), col("l_str").as("str_a"),
        col("r_id").as("id_b"), col("r_str").as("str_b"), col("dist"))
}
