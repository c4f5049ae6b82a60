package graft

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.functions.{Embedder, HashingEmbedder, InferenceSession,
  InferenceSessionProvider, OnnxSessionProvider, SessionEmbedder}

/** Batch-inference plumbing contracts (round-5 verdict #5): the
  * session-per-partition lifecycle, batch shape, close-at-task-end, and
  * store-ingest composition are REAL and tested here against a stub
  * runtime; the ONNX binding itself is reflective and gates on
  * availability (this build is zero-egress, so the runtime jar is absent
  * by construction — that path is pinned to fail loudly, not load).
  */
object StubRuntime {
  val sessionsOpened = new AtomicInteger(0)
  val sessionsClosed = new AtomicInteger(0)
  val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Integer]()
  def reset(): Unit = { sessionsOpened.set(0); sessionsClosed.set(0); batchSizes.clear() }
}

/** Deterministic fake model: v = [Σids mod 97, n_tokens, first, last] —
  * a pure function of the token-id matrix, so the Spark path and a
  * driver-local call must agree exactly.
  */
final case class StubProvider(dim: Int = 4) extends InferenceSessionProvider {
  override def newSession(): InferenceSession = {
    StubRuntime.sessionsOpened.incrementAndGet()
    new InferenceSession {
      override def run(ids: Array[Array[Long]]): Array[Array[Float]] = {
        StubRuntime.batchSizes.add(ids.length)
        ids.map { row =>
          val nz = row.filter(_ != 0L)
          Array[Float]((nz.sum % 97L).toFloat, nz.length.toFloat,
            nz.headOption.getOrElse(0L).toFloat, nz.lastOption.getOrElse(0L).toFloat)
        }
      }
      override def close(): Unit = { StubRuntime.sessionsClosed.incrementAndGet(); () }
    }
  }
}

class EmbedderSpec extends SparkSpec {

  test("embedPartitions: one session per partition, batched calls, closed at task end") {
    import testImplicits._
    StubRuntime.reset()
    val docs = (1 to 10).map(i => (i.toLong, s"tok$i text number $i"))
      .toDF("doc_id", "text").repartition(2)
    val out = Embedder.embedPartitions(
        () => new SessionEmbedder(StubProvider(), dim = 4),
        docs, col("doc_id"), col("text"), batchSize = 3)
      .collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(out.size == 10)
    assert(out.values.forall(_.length == 4))
    // 2 partitions -> 2 sessions, each closed at task completion
    assert(StubRuntime.sessionsOpened.get() == 2, s"opened ${StubRuntime.sessionsOpened}")
    assert(StubRuntime.sessionsClosed.get() == 2, s"closed ${StubRuntime.sessionsClosed}")
    // batches of <= 3: 10 rows over 2 partitions can't need more than 8 calls
    val sizes = StubRuntime.batchSizes.toArray(Array.empty[Integer]).map(_.intValue)
    assert(sizes.forall(s => s >= 1 && s <= 3), sizes.toSeq)
    assert(sizes.sum == 10)
    // exact agreement with a driver-local call through the same embedder
    val local = new SessionEmbedder(StubProvider(), dim = 4)
    val expect = local.embed("tok7 text number 7").toSeq
    assert(out("7") == expect)
  }

  test("embedDocumentsBulk: store-shaped output feeds search end to end") {
    import testImplicits._
    StubRuntime.reset()
    val docs = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "zeta"))
      .toDF("doc_id", "text")
    val store = Embedder.embedDocumentsBulk(
      () => new SessionEmbedder(StubProvider(), dim = 4),
      docs, col("doc_id"), col("text"))
    assert(store.columns.toSeq ==
      Seq("id", "embedding", "metadata", "norm_sq", "metadata_kv"))
    val rows = store.collect().map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    // identical text -> identical embedding; different text differs
    assert(rows("1") == rows("2"))
    assert(rows("1") != rows("3"))
    // the stub vectors search like any other store: self-query ranks self first
    val hit = graft.operators.Search
      .findMostSimilar(graft.sources.VectorStore(store), rows("1"), k = 1)
      .collect().head.getString(0)
    assert(hit == "1" || hit == "2") // 1 and 2 are exact ties
  }

  test("onnx provider: zero-egress build gates loudly, not with a linkage error") {
    assert(!OnnxSessionProvider.available,
      "this container should not have ai.onnxruntime on the classpath")
    val e = intercept[IllegalArgumentException] {
      OnnxSessionProvider("/tmp/model.onnx")
    }
    assert(e.getMessage.contains("zero-egress"))
  }

  test("hashTokenizer: stable ids, empties dropped, padding never collides with real ids") {
    val t = SessionEmbedder.hashTokenizer
    assert(t("a b  c").length == 3)
    assert(t("").isEmpty)
    assert(t("x y").toSeq == t("x y").toSeq)
    // ids are >= 1, so the 0L padding slot is unambiguous
    assert(t("the quick brown fox").forall(_ >= 1L))
  }

  test("hashTokenizer: codepoint-clean — non-BMP tokens hash as one symbol, BMP equals hashCode") {
    val t = SessionEmbedder.hashTokenizer
    // U+1F600 (two UTF-16 units, ONE codepoint): the id is the codepoint
    // polynomial, exactly what the q_embed_bulk_inference oracle computes
    assert(t("😀").toSeq == Seq(128512L + 1L))
    assert(t("a😀").toSeq == Seq((('a'.toLong * 31 + 128512L) & 0x7fffffffL) + 1L))
    // BMP-only text keeps the historical hashCode-derived ids bit-for-bit
    for (w <- Seq("abc", "the", "Zebra9", "ümlaut"))
      assert(t(w).toSeq == Seq((w.hashCode.toLong & 0x7fffffffL) + 1L), w)
  }

  test("SessionEmbedder: close without use never loads a session; empty partitions load none") {
    import testImplicits._
    StubRuntime.reset()
    val e = new SessionEmbedder(StubProvider(), dim = 4)
    e.close()
    assert(StubRuntime.sessionsOpened.get() == 0,
      "close() on an unused embedder must not force the model load")
    // three empty partitions through the bulk path: zero sessions built
    StubRuntime.reset()
    val none = (1 to 10).map(i => (i.toLong, s"t$i")).toDF("doc_id", "text")
      .filter(lit(false)).repartition(3)
    val out = Embedder.embedPartitions(
        () => new SessionEmbedder(StubProvider(), dim = 4),
        none, col("doc_id"), col("text"))
      .collect()
    assert(out.isEmpty)
    assert(StubRuntime.sessionsOpened.get() == 0,
      s"empty partitions opened ${StubRuntime.sessionsOpened.get()} sessions")
  }

  test("embedDocumentsBulk: duplicate ids pass through one row each, never crossed") {
    import testImplicits._
    val docs = Seq((1L, "alpha beta"), (1L, "gamma delta"), (2L, "epsilon"))
      .toDF("doc_id", "text")
    val rows = Embedder.embedDocumentsBulk(
        () => new SessionEmbedder(StubProvider(), dim = 4),
        docs, col("doc_id"), col("text"))
      .collect()
    // a join-back by id would emit 2x2 + 1 = 5 rows with crossed
    // embedding/metadata pairings; the carried-text path keeps 3
    assert(rows.length == 3)
    val metasFor1 = rows.filter(_.getString(0) == "1")
      .map(r => r.getString(2)).sorted.toSeq
    assert(metasFor1 ==
      Seq("""{"text":"alpha beta"}""", """{"text":"gamma delta"}"""))
  }

  test("hashing embedder still rides the same trait (regression)") {
    val h = HashingEmbedder(dim = 8)
    assert(h.embed("hello").length == 8)
    assert(h.embedBatch(Seq("a", "b")).map(_.length) == Seq(8, 8))
  }
}
