package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 lexical ranking over a document table — the classic sparse
  * counterpart to the engine's dense cosine search (the reference's only
  * text scoring is the char-n-gram hash + fuzzy rerank,
  * /root/reference/minivectordb/vector_database.py:388-441; BM25 adds the
  * standard retrieval baseline a training-data pipeline needs for hybrid
  * search and quality filtering).
  *
  * Plan shape: one corpus scan computes per-doc term frequencies and
  * lengths (codegen'd array ops, no UDFs); one single-row aggregate derives
  * the corpus statistics (N, avgdl, per-term document frequencies); the
  * stats row is broadcast back over the corpus and the score is a fixed
  * arithmetic expression — so the whole ranking is two narrow passes and a
  * top-k, no shuffle wider than the final k·P merge.
  *
  * Determinism: term frequencies and document frequencies are integers, the
  * score combines them in a fixed per-term order, so doubles are
  * bit-reproducible against the SQL oracle.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75
  /** k1 + 1 as a decimal literal, NOT computed: `1.2 + 1.0` rounds to a
    * different double than parsing "2.2", and the oracle parses "2.2".
    */
  val K1Plus1 = 2.2

  /** Per-term Robertson/Lucene idf: ln((N − df + 0.5)/(df + 0.5) + 1). */
  private def idf(n: Column, df: Column): Column =
    log((n - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))

  /** Top-k docs for `queryTerms` by BM25(k1 = 1.2, b = 0.75) over
    * whitespace tokens. Returns (id, score) ordered score DESC, id ASC.
    */
  def rank(docs: DataFrame, id: Column, text: Column, queryTerms: Seq[String], k: Int): DataFrame = {
    require(queryTerms.nonEmpty)
    val toks = split(text, "\\s+")
    val perDoc = docs.select(id.as("id"), toks.as("toks"))
      .withColumn("dl", size(col("toks")))
      .select(
        col("id") +: col("dl") +: queryTerms.zipWithIndex.map { case (t, i) =>
          size(filter(col("toks"), x => x === lit(t))).as(s"tf_$i")
        }: _*)
    val statAggs =
      count(lit(1)).cast("double").as("n") +:
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val score = queryTerms.indices.map { i =>
      val tf = col(s"tf_$i")
      idf(col("n"), col(s"df_$i")) * (tf * lit(K1Plus1)) /
        (tf + lit(K1) * (lit(1.0) - lit(B) + lit(B) * col("dl") / col("avgdl")))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .withColumn("score", score)
      .select(col("id"), col("score"))
      .orderBy(desc("score"), asc("id"))
      .limit(k)
  }
}
