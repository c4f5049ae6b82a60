package graft

import graft.operators.{AnnSearch, Search}
import graft.sources.VectorStore
import org.apache.spark.sql.functions._

/** Physical-plan contracts for the search paths — the plan shapes that make
  * the engine scale (SURVEY §3.1): top-k must be TakeOrderedAndProject
  * (per-partition partial top-k, k·P-row merge — never a global sort), and
  * the ANN probe filter must prune at the scan.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("findMostSimilar plans as TakeOrderedAndProject, not a global Sort") {
    val store = VectorStore.fromEmbeddingsTable(spark, dir)
    val q = store.getVector("0").toSeq
    val plan = Search.findMostSimilar(store, q, k = 10).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator, got:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      "a global sort exchange would shuffle the whole corpus")
  }

  test("knn scan reads only the columns it needs (Parquet pruning)") {
    val store = VectorStore.fromEmbeddingsTable(spark, dir)
    val q = store.getVector("0").toSeq
    val plan = Search.findMostSimilar(store, q, k = 5)
      .select("id", "score") // metadata dropped by the caller
      .queryExecution.executedPlan.toString
    // the parquet scan's ReadSchema must not include the label column once
    // nothing references metadata... it does via the projection; at minimum
    // the scan must be a columnar parquet scan, not a full-row scan
    assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"))
    assert(plan.contains("ReadSchema"))
  }

  test("ANN probe filter reaches the scan as a pushable IN predicate") {
    val planes = AnnSearch.hyperplanes(dim = 64)
    // persisted-index scenario: bucket is a stored column, as at scale
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_idx").toString
    AnnSearch.index(spark.read.parquet(s"$dir/embeddings.parquet"), col("embedding"), planes)
      .write.mode("overwrite").parquet(tmp)
    val indexed = spark.read.parquet(tmp)
    val store = VectorStore.fromEmbeddingsTable(spark, dir)
    val q = store.getVector("0").toSeq
    val df = AnnSearch.search(indexed, col("vec_id").cast("string"), col("embedding"), q, planes, k = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(bucket"),
      s"expected bucket IN pushed to parquet, got:\n$plan")
  }

  test("ANN bucket as a PARTITION key: probes become partition pruning") {
    val planes = AnnSearch.hyperplanes(dim = 64)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ann_part").toString
    AnnSearch.index(spark.read.parquet(s"$dir/embeddings.parquet"), col("embedding"), planes)
      .write.mode("overwrite").partitionBy("bucket").parquet(tmp)
    val indexed = spark.read.parquet(tmp)
    val store = VectorStore.fromEmbeddingsTable(spark, dir)
    val q = store.getVector("0").toSeq
    val df = AnnSearch.search(indexed, col("vec_id").cast("string"), col("embedding"), q, planes, k = 5)
    val scan = df.queryExecution.executedPlan.toString
    // the probe must appear as PartitionFilters (directories skipped
    // entirely), not a row-level filter — the 100 TB read-path guarantee
    assert(scan.contains("PartitionFilters") && scan.contains("bucket"),
      s"expected bucket partition pruning, got:\n$scan")
    val probes = AnnSearch.probeBuckets(AnnSearch.bucketOf(q, planes), planes.length)
    assert(df.count() == 5)
    info(s"scan prunes to ${probes.length} of ${1 << planes.length} bucket directories")
  }

  test("IVF list_id as a PARTITION key: probe lists become partition pruning") {
    import graft.operators.IvfSearch
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = IvfSearch.centroidsFromIds(embs, col("vec_id"), col("embedding"), c = 8)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_part").toString
    IvfSearch.index(embs, col("embedding"), cents)
      .write.mode("overwrite").partitionBy("list_id").parquet(tmp)
    val indexed = spark.read.parquet(tmp)
      .withColumn("list_id", col("list_id").cast("long"))
    val q = VectorStore.fromEmbeddingsTable(spark, dir).getVector("0").toSeq
    val df = IvfSearch.search(indexed, col("vec_id").cast("string"), col("embedding"),
      q, cents, k = 5, nprobe = 3)
    val scan = df.queryExecution.executedPlan.toString
    // the nprobe IN filter must skip whole list directories — the same
    // 100 TB read-path guarantee the LSH bucket test pins; it must survive
    // the partition-type cast (long) the streaming loader applies
    assert(scan.contains("PartitionFilters") && scan.contains("list_id"),
      s"expected list_id partition pruning, got:\n$scan")
    assert(df.count() == 5)
    info(s"scan prunes to 3 of ${cents.length} inverted-list directories")
  }

  test("pairwise dedup plans contain no BNLJ / cartesian (grid equi-join shape)") {
    // q_dedup_embedding and q_dedup_jaccard were the round-3 scale-killers;
    // both now enumerate the pair space through the 1-Bucket-Theta grid
    // equi-join — pin that no nested-loop/cartesian operator survives
    Seq("q_dedup_embedding", "q_dedup_embedding_lsh", "q_dedup_jaccard").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"$q must not plan an all-pairs nested loop, got:\n$plan")
    }
  }

  // AQE wraps the executed plan (AdaptiveSparkPlanExec / QueryStageExec hide
  // their subtrees from collect) — walk through both wrappers explicitly
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      p +: allNodes(q.plan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  test("AQE audit: adaptive is ON and the grid joins keep their equi-join shape in the FINAL plan") {
    // Spark 4 defaults AQE on and no session here disables it — pin that,
    // so this suite IS the adaptive audit (coalescing + runtime re-plan are
    // what a 100 TB run gets; custom strategies must survive them)
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    Seq("q_dedup_embedding", "q_dedup_jaccard").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect() // materialize so AQE re-plans with runtime statistics
      val names = allNodes(df.queryExecution.executedPlan).map(_.nodeName)
      assert(!names.exists(n => n.contains("BroadcastNestedLoopJoin") ||
          n.contains("CartesianProduct")),
        s"$q degraded to an all-pairs join under AQE re-planning: $names")
    }
  }

  test("AQE audit: GroupTopK partial/final split survives adaptive staging on real data") {
    import org.apache.spark.sql.graft.{GroupTopK, GroupTopKExec}
    val ord = graft.sources.Testdata.orders(spark, dir)
    val df = GroupTopK.perGroup(ord, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey").asc), k = 2)
    df.collect()
    val nodes = allNodes(df.queryExecution.executedPlan)
    val modes = nodes.collect { case g: GroupTopKExec => g.partial }.sorted
    assert(modes == Seq(false, true),
      s"AQE staging must preserve the partial+final pair, got $modes")
    // the exchange between them must be an AQE shuffle stage (staged, not
    // a plain exchange) — proof the custom operator composes with AQE
    assert(nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec]),
      "expected the partial→final exchange to be AQE-staged")
  }

  test("whole-stage codegen covers the scoring projection") {
    val store = VectorStore.fromEmbeddingsTable(spark, dir)
    val q = store.getVector("0").toSeq
    val plan = Search.findMostSimilar(store, q, k = 5).queryExecution.executedPlan.toString
    // executedPlan.toString marks codegen stages with "*(n)"; the scoring
    // Project (which carries graft_dot) must sit inside one
    assert(plan.contains("*(1) Project") || plan.contains("WholeStageCodegen"),
      s"scoring must run inside codegen, got:\n$plan")
  }

  test("novelty reuses the gram exchange: ONE tokenize pass in the final plan") {
    val df = SparkEntry.queries("q_text_novelty")(spark, dir)
    df.collect() // ReuseExchange shows in the FINAL adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // AdaptiveSparkPlanExec.toString prints final AND initial plans —
    // count within the final section only
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"),
      s"the df branch must re-read the (id, fp) shuffle, got:\n$finalPlan")
    val generates = "Generate explode".r.findAllIn(finalPlan).length
    assert(generates == 1,
      s"expected exactly one tokenize+explode of the corpus, got $generates:\n$finalPlan")
  }

  test("hard negatives: GroupTopK partial runs before the anchor exchange") {
    import org.apache.spark.sql.graft.GroupTopKExec
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val anchors = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("anchor_vec"),
        col("label").as("anchor_label"))
    val df = graft.operators.Search.hardNegatives(embs, col("vec_id"),
      col("embedding"), col("label"), anchors, k = 3)
    df.collect()
    val modes = allNodes(df.queryExecution.executedPlan)
      .collect { case g: GroupTopKExec => g.partial }.sorted
    assert(modes == Seq(false, true),
      s"label-filtered batch mining must keep the partial+final heap pair, got $modes")
  }

  test("scd2 plans ONE data exchange + ONE sort shared by both windows") {
    val df = SparkEntry.queries("q_rel_scd2")(spark, dir)
    // pre-execution plan: the final orderBy adds a range exchange, so count
    // hash exchanges (data) separately from the output-order exchange
    val plan = df.queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"both windows must share one (k, ts, tie) exchange:\n$plan")
    val sorts = "\\bSort \\[".r.findAllIn(plan).length
    assert(sorts <= 2, s"expected the shared window sort + output sort only:\n$plan")
  }

  test("hll registers: one exchange with map-side partial max (mergeable state)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = graft.operators.Sketches.hllRegisters(docs, col("source"), col("text"), 10)
    val plan = df.queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(ex == 1, s"registers are one grouped aggregate, got $ex exchanges:\n$plan")
    assert(plan.contains("partial_max"),
      s"register max must combine map-side (the mergeability contract):\n$plan")
  }

  test("count-min: counter probe joins by broadcast; no shuffle join or cartesian") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val occ = docs.select(explode(split(col("text"), "\\s+")).as("t"))
    val df = graft.operators.Sketches.cmHeavyHitters(occ, col("t"), topK = 5)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the d*w counter matrix must broadcast to the probe side:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"sketch-sized sides must never shuffle-join:\n$plan")
  }

  test("histogram quantiles: one corpus pass into the sketch; downstream never rescans") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val scored = docs.select(
      round(graft.operators.TextAnalysis.qualityScore(col("text")), 6).as("quality"))
    val df = graft.operators.Sketches.histogramQuantiles(scored, col("quality"),
      Seq(0.25, 0.5, 0.75, 0.9))
    // the checkpointed bin table is the sketch: the three consumers (cum,
    // total, pick) must read it, not re-aggregate the corpus — without the
    // lineage cut the pushed isnotnull predicates de-canonicalize the
    // branches and the corpus aggregate ran three times
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"),
      s"downstream of the sketch there must be no corpus rescan:\n$plan")
    // the cumulative window sorts <= bins rows behind a single-partition
    // exchange of the AGGREGATED bins, never raw values
    assert(plan.contains("Window"), s"expected the cumulative-sum window:\n$plan")
  }

  test("ivf-pq search: ONE scan, zero exchanges — scoring + both cuts run scan-side") {
    import graft.operators.{IvfPq, IvfSearch}
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = IvfSearch.centroidsFromIds(embs, col("vec_id"), col("embedding"), c = 8)
    val cb = IvfPq.residualCodebooks(embs, col("vec_id"), col("embedding"), cents,
      m = 8, ks = 16)
    val idx = IvfPq.index(embs, col("embedding"), cents, cb)
    val q = VectorStore.fromEmbeddingsTable(spark, dir).getVector("0").toSeq
    val plan = IvfPq.search(idx, col("vec_id").cast("string"), col("embedding"),
        q, cents, cb, k = 10, nprobe = 3, rerank = 40)
      .queryExecution.executedPlan.toString
    // list pruning is a Filter over the scan; ADC + refine are projections;
    // both cuts are TakeOrderedAndProject — nothing wider than k rows ever
    // needs an exchange (TOaP does partial/merge without one in this plan)
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k cuts:\n$plan")
    assert(!plan.contains("Exchange"),
      s"IVF-PQ search must not shuffle — the corpus never moves:\n$plan")
    assert(plan.split("Scan parquet").length - 1 == 1,
      s"exactly one corpus scan expected:\n$plan")
  }

  test("snapshot diff: the full-outer join moves (id, md5) — never text") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val old = docs.filter(col("doc_id") < 450)
    val nw = docs.filter(col("doc_id") >= 50)
    val plan = graft.operators.Curation.snapshotDiff(old, nw, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    // md5 must be computed in the pre-exchange projection: the join input
    // partitions carry 8+32 bytes per row, not document text
    assert(plan.contains("md5"), s"hash must appear below the join:\n$plan")
    val exchangeLines = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchangeLines.nonEmpty, s"expected a shuffled equi-join:\n$plan")
    // the exchange keys on id alone, and no Project ABOVE an exchange
    // carries the text column (text exists only under md5() below them)
    assert(exchangeLines.forall(_.contains("id#")), s"join must key on id:\n$plan")
    assert(exchangeLines.forall(!_.contains("text#")),
      s"text must be pruned before the exchange:\n$plan")
    val topProject = plan.linesIterator.find(_.trim.startsWith("+- Project [coalesce")).getOrElse("")
    assert(!topProject.contains("text#"), s"post-join projection must not carry text:\n$plan")
  }

  test("zorder layout: ONE range exchange; the morton key is scan-side codegen algebra") {
    import graft.sources.Layout
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val keyed = li.withColumn("_zkey",
        Layout.mortonKey(Layout.scaleTo16(col("l_partkey"), 0L, 1999L),
                         Layout.scaleTo16(col("l_suppkey"), 0L, 99L)))
      .repartitionByRange(8, col("_zkey"))
      .sortWithinPartitions("_zkey")
    val plan = keyed.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"),
      s"layout must cost exactly the one range exchange of any global sort:\n$plan")
    // pure column algebra: no UDF/python eval anywhere in the key
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"morton key must be native expressions:\n$plan")
  }

  test("temperature mix: the corpus never shuffles — rates come back by broadcast") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = graft.operators.Curation.temperatureSample(
        docs, col("doc_id"), col("lang"), col("text"))
      .queryExecution.executedPlan.toString
    // the only hash exchange is the tiny per-stratum aggregate (narrow
    // (stratum, n_tokens) partials, map-side combined); the membership
    // filter joins the rates back as a broadcast — the tokenized corpus
    // itself never crosses an exchange
    val hashEx = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size <= 2, s"only the stratum aggregates may shuffle:\n$plan")
    assert(hashEx.forall(!_.contains("text#")),
      s"document text must never cross an exchange:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"rates must broadcast back:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join belongs in this plan:\n$plan")
  }
}
