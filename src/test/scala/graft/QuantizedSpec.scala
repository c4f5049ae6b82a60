package graft

import graft.functions.{Embedder, HashingEmbedder}
import graft.operators.{Quantized, Search}
import graft.sources.VectorStore
import org.apache.spark.sql.functions._

/** Int8 quantized search (usearch-variant parity) and the pluggable
  * embedder interface (O22).
  */
class QuantizedSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("quantizeVec: symmetric int8 code, floor(+0.5) rounding, zero-safe") {
    val q = Quantized.quantizeVec(Seq(1.0f, -0.5f, 0.25f))
    assert(q.toSeq == Seq(127, -63, 32)) // -63.5+0.5 → floor(-63)= -63; 31.75+0.5 → 32
    assert(Quantized.quantizeVec(Seq(0.0f, 0.0f)).toSeq == Seq(0, 0))
    assert(Quantized.quantizeVec(Seq(-2.0f)).toSeq == Seq(-127))
  }

  test("quantized store: codes within [-127,127], stored as bytes, 4x narrower") {
    val df = Quantized.quantize(spark.read.parquet(s"$dir/embeddings.parquet"), col("embedding"))
    assert(df.schema("qemb").dataType.simpleString == "array<tinyint>")
    val bad = df.select(explode(col("qemb")).as("q")).filter(abs(col("q")) > 127).count()
    assert(bad == 0)
  }

  test("quantized top-k closely tracks the exact ranking (recall@10 ≥ 0.8)") {
    val store = VectorStore.fromEmbeddingsTable(spark, dir)
    val q = store.getVector("0").toSeq
    val exact = Search.findMostSimilar(store, q, k = 10).collect().map(_.getString(0)).toSet
    val quant = Quantized.search(
      Quantized.quantize(spark.read.parquet(s"$dir/embeddings.parquet"), col("embedding")),
      col("vec_id").cast("string"), q, k = 10).collect().map(_.getString(0)).toSet
    val recall = (exact & quant).size.toDouble / exact.size
    info(s"int8 recall@10 = $recall")
    assert(recall >= 0.8)
    // the query vector itself must rank first in both
    assert(quant.contains("0") && exact.contains("0"))
  }

  test("embedder: deterministic, normalized, near-dup texts land near in cosine") {
    val e = HashingEmbedder()
    val a = e.embed("the quick brown fox jumps")
    assert(a.length == e.dim)
    assert(a.toSeq == e.embed("the quick brown fox jumps").toSeq)
    def cos(x: Array[Float], y: Array[Float]) =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val near = cos(a, e.embed("the quick brown fox jumped"))
    val far = cos(a, e.embed("zzz 123 qqq 777 unrelated"))
    assert(near > far)
    // non-native dim folds and stays L2-normalized
    val b = HashingEmbedder(dim = 32).embed("hello world")
    assert(b.length == 32)
    assert(math.abs(math.sqrt(b.map(x => x.toDouble * x.toDouble).sum) - 1.0) < 1e-5)
  }

  test("text → vector → search end to end on documents") {
    val docs = graft.sources.Testdata.table(spark, dir, "documents").limit(200)
    val embedder = HashingEmbedder()
    val store = VectorStore(Embedder.embedDocuments(embedder, docs, col("doc_id"), col("text")))
    // query with the exact text of doc 7: it must be its own nearest neighbor
    val target = docs.filter(col("doc_id") === 7).select("text").collect()(0).getString(0)
    val top = Search.findMostSimilar(store, embedder.embed(target).toSeq, k = 3).collect()
    assert(top.head.getString(0) == "7")
    assert(math.abs(top.head.getDouble(1) - 1.0) < 1e-6)
  }

  test("binarize packs sign bits little-endian; driver packing matches") {
    import testImplicits._
    val v = Seq(1.0f, -2.0f, 0.0f, -0.5f) // bits 0,2 set (0 counts as +)
    val df = Seq((1L, v)).toDF("id", "emb")
    val code = Quantized.binarize(df, col("emb"), dim = 4)
      .select("bcode").head().getLong(0)
    assert(code == 5L)
    assert(Quantized.binarizeVec(v) == 5L)
  }

  test("binary search with full rerank budget equals exact search") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = embs.count().toInt
    val query = VectorStore.fromEmbeddingsTable(spark, dir).getVector("0").toSeq
    val b = Quantized.binarize(embs, col("embedding"), dim = 64)
    val binary = Quantized.binarySearch(b, col("vec_id").cast("string"),
        col("embedding"), query, k = 5, rerank = n)
      .collect().map(_.getString(0)).toSeq
    val exact = Search.findMostSimilar(
        VectorStore.fromEmbeddingsTable(spark, dir), query, k = 5)
      .collect().map(_.getString(0)).toSeq
    assert(binary == exact)
  }

  test("binary prefilter keeps the query's own vector at hamming 0") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val query = VectorStore.fromEmbeddingsTable(spark, dir).getVector("0").toSeq
    val b = Quantized.binarize(embs, col("embedding"), dim = 64)
      .withColumn("hamming",
        bit_count(col("bcode").bitwiseXOR(lit(Quantized.binarizeVec(query)))))
    assert(b.filter(col("vec_id") === 0L).select("hamming").head().getInt(0) == 0)
  }

  test("binarizeWords: word 0 of a 64-dim code equals the single-word bcode; " +
      "multi-word packing spans word boundaries correctly") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val both = Quantized.binarizeWords(
        Quantized.binarize(embs, col("embedding"), dim = 64), col("embedding"), dim = 64)
      .select(col("bcode"), element_at(col("bcodes"), 1).as("w0"))
    assert(both.filter(col("bcode") =!= col("w0")).count() == 0)
    // 70-dim vector: bit 64 (dim 65) must land in word 1, bit 0
    import testImplicits._
    val v: Seq[Float] = Seq.fill(64)(-1.0f) ++ Seq(1.0f) ++ Seq.fill(5)(-1.0f)
    val df = Seq((1L, v)).toDF("id", "emb")
    val words = Quantized.binarizeWords(df, col("emb"), dim = 70)
      .select("bcodes").head().getSeq[Long](0)
    assert(words == Seq(0L, 1L))
    assert(Quantized.binarizeVecWords(v.map(_.toDouble)).toSeq == Seq(0L, 1L))
  }

  test("multi-word binary search with full rerank budget equals exact search") {
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = embs.count().toInt
    val query = VectorStore.fromEmbeddingsTable(spark, dir).getVector("0").toSeq
    // hamming over the raw 64-dim sign code split into words — same
    // candidate semantics as binarySearch, code path is the words kernel
    val b = Quantized.binarizeWords(embs, col("embedding"), dim = 64)
    val viaWords = Quantized.binarySearchWords(b, col("vec_id").cast("string"),
        query.map(_.toDouble), rerankVec = col("embedding"), rerankQuery = query,
        k = 5, rerank = n)
      .collect().map(_.getString(0)).toSeq
    val exact = Search.findMostSimilar(
        VectorStore.fromEmbeddingsTable(spark, dir), query, k = 5)
      .collect().map(_.getString(0)).toSeq
    assert(viaWords == exact)
  }
}
