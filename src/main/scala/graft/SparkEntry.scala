package graft

import graft.functions.{VectorFunctions => VF}
import graft.operators._
import graft.sources.VectorStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), each paired with DuckDB-runnable oracle SQL over the same
  * parquet tables.
  *
  * Oracle-parity conventions (BASELINE.md measurement notes):
  *  - float scores are computed in Double on both sides (DuckDB arrays are
  *    CAST to DOUBLE[]) and rounded to 6 decimals;
  *  - every ordered result pins a total order (score DESC, id ASC) and
  *    ORDER/LIMIT happen on the ROUNDED score in both engines;
  *  - aggregate/computed columns are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_knn")(spark, "/root/testdata/sf0.001")

  /** The corpus vector used as a deterministic query point: both engines
    * read it from the same parquet, so no float literals cross the boundary.
    */
  private def queryVec(spark: SparkSession, dir: String, vecId: String = "0"): Seq[Float] =
    VectorStore.fromEmbeddingsTable(spark, dir).getVector(vecId).toSeq

  private def knnQuery(
      spark: SparkSession,
      dir: String,
      k: Int,
      metadataFilter: Seq[FilterDsl.MetaFilter] = Nil,
      excludeFilter: Seq[Map[String, MetaValue]] = Nil,
      orFilters: Seq[FilterDsl.MetaFilter] = Nil): DataFrame = {
    val store = VectorStore.fromEmbeddingsTable(spark, dir)
    val q = queryVec(spark, dir)
    Search.findMostSimilar(store, q, metadataFilter, excludeFilter, orFilters, k = k)
      .withColumn("score", round(col("score"), 6))
      .select("id", "score")
      .orderBy(desc("score"), asc("id"))
  }

  // top-k selection runs on the EXACT double score (like the Spark plan);
  // rounding is applied to the already-selected rows.
  private val knnOracleBase =
    """SELECT id, round(score, 6) AS score FROM (
      |  SELECT CAST(e.vec_id AS VARCHAR) AS id,
      |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) AS score
      |  FROM embeddings e, (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0) q
      |  %s
      |  ORDER BY score DESC, id ASC
      |  LIMIT %d
      |) ORDER BY score DESC, id ASC""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O13: exact cosine top-k over the full corpus
    "q_knn" -> ((s, dir) => knnQuery(s, dir, k = 10)),
    // O13 + O8: top-k under an AND metadata filter
    "q_knn_filtered" -> ((s, dir) =>
      knnQuery(s, dir, k = 10, metadataFilter = Seq(Map("label" -> Eq(MetaValue.MLong(3)))))),
  )

  def oracleSql: Map[String, String] = Map(
    "q_knn" -> knnOracleBase.format("", 10),
    "q_knn_filtered" -> knnOracleBase.format("WHERE e.label = 3", 10),
  )
}
