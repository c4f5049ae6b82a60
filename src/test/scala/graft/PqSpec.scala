package graft

import graft.operators.{Pq, Search}
import graft.sources.VectorStore
import org.apache.spark.sql.functions._

/** Product quantization: codebook shape, encode range/determinism, ADC
  * kernel parity with a driver-side recomputation, and refined-search
  * equivalence to the exact ranking when the rerank budget covers the
  * corpus.
  */
class PqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def embs = spark.read.parquet(s"$dir/embeddings.parquet")

  private lazy val cb = Pq.codebooksFromIds(embs, col("vec_id"), col("embedding"), m = 8, ks = 16)

  test("codebooks: m x ks x subDim from the lowest-id vectors") {
    assert(cb.m == 8 && cb.ks == 16 && cb.subDim == 8)
    // code c of subspace j is exactly the j-th slice of vector vec_id=c
    val v3 = embs.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    assert(cb.cents(2)(3).toSeq == v3.slice(16, 24))
  }

  test("encode: ARRAY<TINYINT> of length m, codes in [0, ks)") {
    val enc = Pq.encode(embs, col("embedding"), cb)
    assert(enc.schema("pq_codes").dataType.simpleString == "array<tinyint>")
    val bad = enc.select(explode(col("pq_codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= cb.ks).count()
    assert(bad == 0)
    assert(enc.select(size(col("pq_codes"))).distinct().head().getInt(0) == cb.m)
    // a codebook vector encodes to its own code in every subspace
    val self = Pq.encode(embs.filter(col("vec_id") === 5), col("embedding"), cb)
      .select(col("pq_codes")).head().getSeq[Byte](0)
    assert(self.forall(_ == 5.toByte))
  }

  test("ADC kernel == driver-side LUT sum on every row") {
    val q = embs.filter(col("vec_id") === 1)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val l = Pq.lut(q, cb)
    val rows = Pq.encode(embs, col("embedding"), cb)
      .select(col("vec_id"), col("pq_codes"),
        Pq.adcCol(col("pq_codes"), l, cb.ks).as("adist"))
      .collect()
    rows.foreach { r =>
      val codes = r.getSeq[Byte](1)
      val expect = codes.zipWithIndex.foldLeft(0.0) { case (acc, (c, j)) =>
        acc + l(j * cb.ks + c)
      }
      assert(r.getDouble(2) == expect, s"vec ${r.getLong(0)}")
    }
  }

  test("ks=256 codes survive the TINYINT round-trip (unsigned decode)") {
    import testImplicits._
    // 256 1-d centroids at 0,1,...,255: vector v encodes to code round(v),
    // so codes above 127 are exercised (stored as negative bytes)
    val cents = Array.tabulate(1, 256)((_, c) => Array(c.toDouble))
    val wide = Pq.Codebooks(m = 1, ks = 256, subDim = 1, cents = cents)
    val df = Seq(Tuple1(Seq(200.0f)), Tuple1(Seq(35.0f)), Tuple1(Seq(255.0f)))
      .toDF("embedding")
    val enc = Pq.encode(df, col("embedding"), wide)
    assert(enc.schema("pq_codes").dataType.simpleString == "array<tinyint>")
    // lut(c) = c so ADC returns the decoded code itself
    val l = Array.tabulate(256)(_.toDouble)
    val got = enc.select(Pq.adcCol(col("pq_codes"), l, 256)).collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(200.0, 35.0, 255.0), s"signed-byte corruption: $got")
  }

  test("refined search with corpus-wide rerank budget == exact top-k") {
    val store = VectorStore.fromEmbeddingsTable(spark, dir)
    val q = store.getVector("0").toSeq
    val exact = Search.findMostSimilar(store, q, k = 10)
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 1e6)))
    val n = embs.count().toInt
    val refined = Pq.searchRefined(Pq.encode(embs, col("embedding"), cb),
        col("vec_id").cast("string"), col("embedding"), q, cb, k = 10, rerank = n)
      .collect().map(r => (r.getString(0), math.round(r.getDouble(1) * 1e6)))
    assert(refined.toSeq == exact.toSeq)
  }

  test("train: per-subspace Lloyd never increases the quantization error") {
    val vecs = embs.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    def error(b: Pq.Codebooks): Double = vecs.map { v =>
      (0 until b.m).map { j =>
        val sub = v.slice(j * b.subDim, (j + 1) * b.subDim)
        b.cents(j).map(c =>
          c.zip(sub).map { case (x, y) => (x - y) * (x - y) }.sum).min
      }.sum
    }.sum
    val init = cb
    val trained = Pq.train(embs, col("vec_id"), col("embedding"), m = 8, ks = 16, iters = 3)
    val (e0, e1) = (error(init), error(trained))
    info(f"quantization error: init $e0%.3f -> trained $e1%.3f")
    assert(e1 <= e0)
  }

  test("ADC top-k recall against exact cosine (codes-only scan)") {
    val store = VectorStore.fromEmbeddingsTable(spark, dir)
    val q = store.getVector("0").toSeq
    val exact = Search.findMostSimilar(store, q, k = 10)
      .collect().map(_.getString(0)).toSet
    val adc = Pq.search(Pq.encode(embs, col("embedding"), cb),
        col("vec_id").cast("string"), q.map(_.toDouble), cb, k = 10)
      .collect().map(_.getString(0)).toSet
    val recall = (exact & adc).size.toDouble / exact.size
    info(s"PQ-ADC recall@10 = $recall (m=8, ks=16, deterministic codebooks)")
    // the query vector itself reconstructs exactly (it is in the codebook)
    // and must rank first
    assert(adc.contains("0"))
  }
}
