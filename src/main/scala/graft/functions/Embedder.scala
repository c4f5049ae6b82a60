package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text → dense-vector extraction interface — the engine-side analog of the
  * reference's `EmbeddingModel`
  * (/root/reference/minivectordb/embedding_model.py:84-91, ONNX USE / e5 /
  * bge-m3). Model inference itself is EXTERNAL to a zero-egress build
  * (BASELINE.md: embeddings arrive precomputed); this trait keeps the
  * interface pluggable, and [[HashingEmbedder]] provides a deterministic,
  * dependency-free implementation so the full text → vector → search path
  * is exercisable end to end.
  *
  * Batch contract mirrors how an ONNX session would be driven: one embedder
  * instance per partition, batched calls — wire through
  * [[Embedder.embedColumn]] (UDF, small inputs) or a `mapPartitions` batch
  * loop for bulk ingest.
  */
trait Embedder extends Serializable {
  def dim: Int
  def embed(text: String): Array[Float]
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map(embed)
}

/** Deterministic char-n-gram hashing embedder (signed feature hashing, the
  * same kernel as the rerank path's O14) — a real, if simple, text
  * representation: near-duplicate strings land near in cosine space.
  */
final case class HashingEmbedder(dim: Int = 64) extends Embedder {
  override def embed(text: String): Array[Float] = {
    // charNgramHash is fixed at 64 dims; fold/stretch to the requested dim
    val base = TextFeatures.charNgramHash(text)
    if (dim == base.length) base
    else {
      val out = new Array[Float](dim)
      var i = 0
      while (i < base.length) { out(i % dim) += base(i); i += 1 }
      val n = math.sqrt(out.map(x => x.toDouble * x.toDouble).sum)
      if (n > 0) { var j = 0; while (j < dim) { out(j) = (out(j) / n).toFloat; j += 1 } }
      out
    }
  }
}

object Embedder {

  /** Distributed embedding of a text column. */
  def embedColumn(embedder: Embedder, text: Column): Column = {
    val f = udf((s: String) => embedder.embed(if (s == null) "" else s))
    f(text)
  }

  /** documents-shaped table → store-shaped rows (id, embedding, metadata)
    * with embeddings computed in the cluster.
    */
  def embedDocuments(embedder: Embedder, docs: DataFrame, id: Column, text: Column): DataFrame =
    graft.sources.VectorStore.ingest(
      docs.select(id.as("id"), embedColumn(embedder, text).as("embedding"),
        to_json(struct(text.as("text"))).as("metadata")),
      col("id"), col("embedding"), col("metadata"))
}
