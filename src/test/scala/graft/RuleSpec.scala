package graft

import graft.functions.{VectorFunctions => VF}
import graft.sources.VectorStore
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The ReuseMaterializedNorm analyzer rule (mounted via GraftExtensions):
  * self dot products over the store's embedding column transparently reuse
  * the ingest-materialized norm_sq instead of re-folding the array per row
  * — and, once rewritten, the optimizer prunes the embedding column from
  * the scan entirely.
  */
class RuleSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** A session with GraftExtensions mounted (shares the SparkContext);
    * default/active session restored so other suites are unaffected.
    */
  private lazy val extSession: SparkSession = {
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def store() = VectorStore.fromEmbeddingsTable(extSession, dir)

  /** Persisted store: norm_sq is a concrete stored column. (On a purely
    * in-memory store the norm is still an alias over the self product, so
    * the optimizer legitimately inlines the definition back — the rewrite
    * pays off exactly when the materialization is physical.)
    */
  private lazy val persisted: VectorStore = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_rule_store").toString
    store().persist(tmp)
    VectorStore.load(extSession, tmp)
  }

  test("norm recomputation rewrites to the stored norm_sq column") {
    val df = persisted.df.select(col("id"), VF.normSq(col("embedding")).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"),
      s"self dot product should be replaced by the stored norm, got:\n$optimized")
    // rewritten values equal the stored materialization exactly
    val stored = persisted.df.select(col("id"), col("norm_sq"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    df.collect().foreach(r => assert(r.getDouble(1) == stored(r.getString(0))))
  }

  test("after the rewrite, the scan no longer reads the embedding array") {
    // norm-only query over the stored norm must scan 8 bytes/row, not the
    // 64-float array
    val df = persisted.df
      .select(col("id"), VF.normSq(col("embedding")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("norm_sq") && !readSchema.contains("embedding"),
      s"expected an embedding-free scan, got: $readSchema")
  }

  test("rule leaves frames WITHOUT a stored norm untouched and correct") {
    val raw = extSession.read.parquet(s"$dir/embeddings.parquet")
    val df = raw.select(col("vec_id"), VF.normSq(col("embedding")).as("n"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    val stored = store().df.select(col("id"), col("norm_sq"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    df.limit(20).collect().foreach(r =>
      assert(r.getDouble(1) == stored(r.getLong(0).toString)))
  }

  test("metadata predicate over the literal-keyed kv map reaches the Parquet scan") {
    // flagship filtered search (q_knn_filtered shape): the label predicate
    // must appear in PushedFilters, not as a post-scan map evaluation
    val st = store()
    val df = graft.operators.Search.findMostSimilar(
      st, st.getVector("0").toSeq,
      metadataFilter = Seq(Map("label" -> graft.operators.Eq(graft.operators.MetaValue.MLong(3)))),
      k = 10)
    val plan = df.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("EqualTo(label,3)"),
      s"label predicate not pushed to the scan: $pushed\n$plan")
  }

  test("kv-map simplification preserves results (with- vs without-extension parity)") {
    import graft.operators.{Eq, Ops, MetaValue, FilterDsl}
    import MetaValue._
    val filters: Seq[(String, Seq[FilterDsl.MetaFilter])] = Seq(
      "eq"  -> Seq(Map("label" -> Eq(MLong(3)))),
      "gt"  -> Seq(Map("label" -> Ops(Seq("$gt" -> MLong(5))))),
      "ne"  -> Seq(Map("label" -> Ops(Seq("$ne" -> MLong(2))))),
      "absent-key" -> Seq(Map("nope" -> Eq(MLong(1)))))
    filters.foreach { case (name, f) =>
      def ids(s: SparkSession): Seq[String] =
        VectorStore.fromEmbeddingsTable(s, dir).df
          .filter(FilterDsl.compile(col("metadata_kv"), f))
          .select("id").collect().map(_.getString(0)).sorted.toSeq
      assert(ids(extSession) == ids(SparkSpec.session), s"filter '$name' diverged")
    }
  }

  test("jsonKv ingest shapes ($in, string eq, string range) are extension-parity too") {
    // The remaining FilterDsl shapes run over the events-derived metadata
    // (string-valued kv map via jsonKv) — a regression in the rule affecting
    // these would not be caught by the typed-label parity table above.
    import graft.operators.{Eq, Ops, MetaValue, FilterDsl, MetadataTables}
    import MetaValue._
    val filters: Seq[(String, Seq[FilterDsl.MetaFilter])] = Seq(
      "in-list" -> Seq(Map("tags" -> Ops(Seq("$in" -> MStr("view"))))),
      "string-eq" -> Seq(Map("type" -> Eq(MStr("click")))),
      "string-range" -> Seq(Map("date" -> Ops(Seq(
        "$gte" -> MStr("2024-01-10T00:00:00"), "$lt" -> MStr("2024-01-20T00:00:00"))))),
      "numeric-over-json" -> Seq(Map("value" -> Ops(Seq("$gt" -> MDouble(250.0))))))
    filters.foreach { case (name, f) =>
      def ids(s: SparkSession): Seq[String] =
        MetadataTables.eventsMeta(s, dir)
          .filter(FilterDsl.compile(col("metadata_kv"), f))
          .select("id").collect().map(_.getString(0)).sorted.toSeq
      val ext = ids(extSession)
      assert(ext.nonEmpty, s"filter '$name' matched nothing — parity check is vacuous")
      assert(ext == ids(SparkSpec.session), s"filter '$name' diverged")
    }
  }

  test("dot against a query literal is NOT rewritten; search results unchanged") {
    val q = persisted.getVector("0").toSeq
    val df = persisted.df
      .withColumn("score",
        VF.dot(col("embedding"), typedLit(q)) / sqrt(VF.normSq(col("embedding"))))
      .select("id", "score")
    val optimized = df.queryExecution.optimizedPlan.toString
    // exactly one graft_dot remains (query·row); the self product is gone
    assert("graft_dot".r.findAllIn(optimized).size == 1, s"plan:\n$optimized")
    // score here is dot/|v| (no query-norm divisor), so the self score is
    // |q| — matching the driver-side fold exactly (same order, same widening)
    val self = df.filter(col("id") === "0").collect()(0).getDouble(1)
    assert(self == math.sqrt(q.map(x => x.toDouble * x).sum))

    // end-to-end: hand-written scoring equals Search.findMostSimilar
    val viaStore = graft.operators.Search.findMostSimilar(persisted, q, k = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val qn = math.sqrt(q.map(x => x.toDouble * x).sum)
    val hand = persisted.df
      .withColumn("score",
        VF.dot(col("embedding"), typedLit(q)) / (sqrt(VF.normSq(col("embedding"))) * lit(qn)))
      .select("id", "score").orderBy(desc("score"), asc("id")).limit(10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaStore == hand)
  }
}
