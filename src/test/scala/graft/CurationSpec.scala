package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Curation pins: chunk coverage/overlap, split determinism and
  * proportions, packing bin arithmetic.
  */
class CurationSpec extends SparkSpec {
  import testImplicits._

  test("chunking covers every token, overlaps by size-stride, short tail") {
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val chunks = Curation.chunkTokens(docs, col("doc_id"), col("text"), size = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3).toSeq == Seq(
      "t1 t2 t3 t4", "t3 t4 t5 t6", "t5 t6 t7 t8", "t7 t8 t9 t10"))
    assert(d1.map(_._4).toSeq == Seq(4, 4, 4, 4))
    // doc shorter than a window: one short chunk
    assert(chunks.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2)))
    // empty text → split yields one empty token; "" doc still chunks to 1
    // token of the empty string per whitespace-split semantics — accept
    // either zero chunks or one 1-token chunk, but never a crash
    assert(chunks.count(_._1 == 3L) <= 1)
  }

  test("hash split is deterministic, exhaustive, and ~80/10/10") {
    val docs = spark.range(10000).select(col("id").as("doc_id"))
    val split = Curation.hashSplit(docs, col("doc_id"))
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)
    assert(counts("train") > 7500 && counts("train") < 8500)
    assert(counts("val") > 700 && counts("val") < 1300)
    assert(counts("test") > 700 && counts("test") < 1300)
    // same ids, same assignment — split is a pure function of the id
    val again = Curation.hashSplit(docs, col("doc_id"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("packing groups consecutive docs into budget-sized bins per shard") {
    val docs = Seq(
      (0L, 100), (1L, 200), (2L, 300), (3L, 250), // shard 0: cum 100,300,600,850
      (10L, 700), (11L, 100)                      // shard 1 (shardDocs=10)
    ).toDF("doc_id", "nt")
    val packed = Curation.packBins(docs, col("doc_id"), col("nt"),
        budgetTokens = 500, shardDocs = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // exclusive prefix sums: 0,100,300,600 → bins 0,0,0,1
    assert(packed(0L) == ((0L, 0L)) && packed(1L) == ((0L, 0L)))
    assert(packed(2L) == ((0L, 0L)) && packed(3L) == ((0L, 1L)))
    // shard 1 restarts the running sum
    assert(packed(10L) == ((1L, 0L)) && packed(11L) == ((1L, 1L)))
  }

  test("scrub redacts emails and digit runs, normalizes case and spaces") {
    val docs = Seq(
      (1L, "Contact Bob.Smith+x@example.co.uk  NOW,   ref 12345 and 7"),
      (2L, "already clean text")
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Curation.scrub(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "contact <email> now, ref <num> and <num>")
    assert(got(2L) == "already clean text")
  }

  test("scrubPii: specificity order keeps urls/ips/phones atomic before digit runs") {
    val docs = Seq(
      (1L, "See https://Example.com/a?id=99 or www.foo.io/x for info"),
      (2L, "Call +1 (555) 123-4567 or 555-9876 today"),
      (3L, "Server 192.168.0.1 port 8080"),
      (4L, "Mail A.B@c.de ref 42")
    ).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"), Curation.scrubPii(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the URL is ONE <url>, not <url> + stray <num> fragments
    assert(got(1L) == "see <url> or <url> for info")
    // phone groups collapse whole, including separators and the leading +
    assert(got(2L) == "call <phone> or <phone> today")
    // the IP is one <ip>; the bare port remains a digit run
    assert(got(3L) == "server <ip> port <num>")
    assert(got(4L) == "mail <email> ref <num>")
  }

  test("chunking plan has no exchange (embarrassingly parallel)") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val plan = Curation.chunkTokens(docs, col("doc_id"), col("text"), 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }

  test("repetition stats: hand-computed dup fractions; gate applies caps on raw values") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),             // 10 distinct words, no repetition
      (2L, "spam spam spam spam spam spam spam spam spam spam"), // all dup
      (3L, "x y x y x y x y x y"),             // 2 distinct words, alternating
      (4L, "")).toDF("doc_id", "text")
    val stats = Curation.repetitionStats(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(stats(1L) == ((10, 0.0, 0.0, 0.0)))
    // 10 words 1 distinct → 0.9; 9 bigrams 1 distinct → 8/9; 8 trigrams 1 distinct → 7/8
    assert(stats(2L)._2 == 0.9 && math.abs(stats(2L)._3 - 8.0 / 9) < 1e-12 &&
      math.abs(stats(2L)._4 - 7.0 / 8) < 1e-12)
    // alternating: 2 distinct words of 10 → 0.8; bigrams alternate "x y"/"y x"
    // → 9 total 2 distinct → 7/9; trigrams 8 total 2 distinct → 6/8
    assert(stats(3L)._2 == 0.8 && math.abs(stats(3L)._3 - 7.0 / 9) < 1e-12 &&
      math.abs(stats(3L)._4 - 6.0 / 8) < 1e-12)
    val pass = Curation.gopherFilter(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(pass(1L))                           // clean doc passes
    assert(!pass(2L) && !pass(3L))             // repetition rules fire
    assert(!pass(4L))                          // under min length
  }

  test("decontamination flags exactly the docs sharing a 5-gram with the eval set") {
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a sentence with the quick brown fox jumps inside it"),
      (2L, "completely different content nothing shared here at all"),
      (3L, "quick brown fox jumps over or something")).toDF("doc_id", "text")
    val res = Curation.decontaminate(docs, col("doc_id"), col("text"), eval, col("text"), n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(res(1L) == ((1L, true)))   // shares "the quick brown fox jumps"
    assert(res(2L) == ((0L, false)))
    assert(res(3L) == ((1L, true)))   // shares "quick brown fox jumps over"
  }

  test("contaminationReport: named culprits with exact shared-gram counts, top-k per eval doc") {
    val eval = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "nothing in common with anything in training data")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a sentence with the quick brown fox jumps inside it"),
      (2L, "completely different content nothing shared here at all"),
      // doc 3 shares TWO distinct 5-grams of eval 100
      (3L, "quick brown fox jumps over the lazy dog indeed")).toDF("doc_id", "text")
    val res = Curation.contaminationReport(docs, col("doc_id"), col("text"),
        eval, col("doc_id"), col("text"), n = 5, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // eval 100: doc 3 shares {"quick brown fox jumps over", "brown fox
    // jumps over the", "fox jumps over the lazy", "jumps over the lazy
    // dog"} = 4 grams; doc 1 shares {"the quick brown fox jumps"} = 1.
    // eval 101 shares nothing -> absent (evidence-only report).
    assert(res == Seq((100L, 3L, 4L), (100L, 1L, 1L)))
    // k=1 keeps only the worst offender
    val top1 = Curation.contaminationReport(docs, col("doc_id"), col("text"),
        eval, col("doc_id"), col("text"), n = 5, k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(top1 == Seq((100L, 3L, 4L)))
  }

  test("decontamination with an empty eval set flags nothing; short docs have no grams") {
    val docs = Seq((1L, "some ordinary document text here please"), (2L, "tiny")).toDF("doc_id", "text")
    val emptyEval = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val res = Curation.decontaminate(docs, col("doc_id"), col("text"), emptyEval, col("text"), n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(res == Map(1L -> ((0L, false)), 2L -> ((0L, false))))
    // a doc shorter than n words yields no grams even against a matching eval set
    val eval = Seq((9L, "tiny")).toDF("doc_id", "text")
    val res2 = Curation.decontaminate(docs, col("doc_id"), col("text"), eval, col("text"), n = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(!res2(2L))
  }

  test("mix sampling: rates derive from availability, over-budget strata cap at keep-all") {
    // src A: 10 docs x 10 tokens = 100 avail; src B: 2 docs x 10 = 20 avail
    val docs = ((0 until 10).map(i => (i.toLong, "a", Seq.fill(10)("w").mkString(" "))) ++
      Seq((100L, "b", Seq.fill(10)("w").mkString(" ")), (101L, "b", Seq.fill(10)("w").mkString(" "))))
      .toDF("doc_id", "src", "text")
    // equal weights, budget 100 => target 50 tokens each: A rate 500pm, B capped at 1000pm
    val got = Curation.mixSample(docs, col("doc_id"), col("src"), col("text"),
      targets = Seq("a" -> 1.0, "b" -> 1.0), budgetTokens = 100L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.filter(_._2 == "b").map(_._1).sorted == Seq(100L, 101L)) // keep-all cap
    val aIds = got.filter(_._2 == "a").map(_._1).toSet
    val expectedA = (0 until 10).map(_.toLong)
      .filter(i => ((i % 1000003L) * 131 + 7) % 1000 < 500).toSet
    assert(aIds == expectedA) // exact membership from the documented hash
    // a stratum absent from targets is excluded entirely
    val none = Curation.mixSample(docs, col("doc_id"), col("src"), col("text"),
      targets = Seq("b" -> 1.0), budgetTokens = 10L)
      .filter(col("stratum") === "a").count()
    assert(none == 0L)
  }

  test("temperature sampling: smallest stratum kept whole, rates flatten by sqrt") {
    // avail: a=400 tokens, b=100, c=25 -> rates: c=1000, b=floor(1000*sqrt(25/100))=500,
    // a=floor(1000*sqrt(25/400))=250 — each 4x availability gap halves the rate
    def mk(src: String, n: Int, tok: Int, base: Long) =
      (0 until n).map(i => (base + i, src, Seq.fill(tok)("w").mkString(" ")))
    val docs = (mk("a", 40, 10, 0L) ++ mk("b", 10, 10, 1000L) ++ mk("c", 5, 5, 2000L))
      .toDF("doc_id", "src", "text")
    val got = Curation.temperatureSample(docs, col("doc_id"), col("src"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.filter(_._2 == "c").map(_._1).sorted == (2000L until 2005L).toSeq)
    def expect(ids: Seq[Long], rate: Long) =
      ids.filter(i => ((i % 1000003L) * 131 + 7) % 1000 < rate).toSet
    assert(got.filter(_._2 == "b").map(_._1).toSet
      == expect((1000L until 1010L), 500L))
    assert(got.filter(_._2 == "a").map(_._1).toSet
      == expect((0L until 40L), 250L))
    // deterministic across runs
    val again = Curation.temperatureSample(docs, col("doc_id"), col("src"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.sorted == again.sorted)
  }

  test("stratified sample boundary rates: 0 drops the stratum, 1000 keeps it whole") {
    val docs = spark.range(1000).select(col("id").as("doc_id"), lit("en").as("lang"))
    val none = Curation.stratifiedSample(docs, col("doc_id"), col("lang"),
      Seq("en" -> 0), defaultPerMille = 1000).count()
    val all = Curation.stratifiedSample(docs, col("doc_id"), col("lang"),
      Seq("en" -> 1000), defaultPerMille = 0).count()
    assert(none == 0L && all == 1000L)
  }

  test("stratified sample is deterministic, per-stratum rated, and a pure scan filter") {
    val docs = spark.range(10000).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, "en").otherwise("zh").as("lang"))
    def run() = Curation.stratifiedSample(docs, col("doc_id"), col("lang"),
      Seq("en" -> 200), defaultPerMille = 1000)
    val counts = run().groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("zh") == 5000L)                          // default rate 1000 keeps all
    assert(counts("en") > 800 && counts("en") < 1200)      // ~20 % of 5000
    // pure function of (id, stratum): identical membership on rerun
    assert(run().agg(sum("doc_id")).head().getLong(0) ==
      run().agg(sum("doc_id")).head().getLong(0))
    val plan = run().queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("importance resampling: disjoint target vocab dominates the Gumbel noise; deterministic") {
    import testImplicits._
    // 20 target docs with one vocabulary, 20 background docs with another —
    // the per-doc log-ratio gap (≈ ±4 per token over 6 tokens) exceeds the
    // deterministic Gumbel range ([−2.03, 7.6]), so all k survivors must be
    // target docs regardless of the noise draw
    val docs = ((0 until 20).map(i => (i.toLong, "ml training data pipeline tokens corpus", "en")) ++
      (20 until 40).map(i => (i.toLong, "cooking recipes food kitchen salt pepper", "xx")))
      .toDF("doc_id", "text", "lang")
    def run() = Curation.importanceSample(docs, col("doc_id"), col("text"),
      col("lang") === "en", k = 10)
    val sel = run().collect()
    assert(sel.length == 10)
    assert(sel.forall(_.getLong(0) < 20L), s"non-target doc selected: ${sel.mkString(",")}")
    // pure function of the data: identical ids and scores on rerun
    assert(run().collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq ==
      sel.map(r => (r.getLong(0), r.getDouble(2))).toSeq)
    // output is (score desc, id asc)-ordered
    val scores = sel.map(_.getDouble(2)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("bloom decontamination ≡ exact decontamination (both n-gram widths)") {
    val docs = graft.sources.Testdata.table(spark, "/root/testdata/sf0.001", "documents")
    for (n <- Seq(4, 5)) {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      val exact = rows(Curation.decontaminate(docs, col("doc_id"), col("text"),
        docs.filter(col("doc_id") < 10), col("text"), n = n))
      val bloom = rows(Curation.decontaminateBloom(docs, col("doc_id"), col("text"),
        docs.filter(col("doc_id") < 10), col("text"), n = n, fpp = 0.01))
      assert(bloom == exact, s"n=$n")
      assert(exact.exists(_._3), s"n=$n: fixture must contain contaminated docs")
    }
    // empty eval set: nothing flagged, no crash on the zero-item filter
    val none = Curation.decontaminateBloom(docs, col("doc_id"), col("text"),
      docs.filter(col("doc_id") < 0), col("text"), n = 5)
      .filter(col("contaminated")).count()
    assert(none == 0L)
  }

  test("per-group cap ≡ row_number window; runs as GroupTopK, no WindowExec") {
    val docs = spark.range(1000).select(
      col("id").as("doc_id"),
      concat(lit("src"), pmod(col("id"), lit(7))).as("source"),
      pmod(col("id") * 37 + 11, lit(50)).as("n_chars"))
    val capped = Curation.capPerGroup(docs,
      Seq(col("source")), Seq(col("n_chars").desc, col("doc_id").asc), n = 5)
    val got = capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val exp = docs.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id").asc)))
      .filter(col("rn") <= 5).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == exp)
    assert(got.size == 35)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK"), s"expected the GroupTopK operator:\n$plan")
    assert(!plan.contains("Window"), s"cap must not plan a window sort:\n$plan")
  }

  test("shard layout: in-range deterministic shards, stats cover the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val shards = docs.select(Curation.shardOf(col("doc_id"), 16).as("s"))
      .collect().map(_.getLong(0))
    assert(shards.forall(s => s >= 0 && s < 16))
    // pure function of id: re-evaluation is identical
    val again = docs.select(Curation.shardOf(col("doc_id"), 16).as("s"))
      .collect().map(_.getLong(0))
    assert(shards.toSeq == again.toSeq)
    val stats = Curation.shardStats(docs, col("doc_id"), col("text"),
      col("source"), nShards = 16).collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(stats.forall(_.getAs[Long]("n_sources") >= 1))
    // no window/sort in the plan: assignment is scan-stage arithmetic
    val plan = Curation.shardStats(docs, col("doc_id"), col("text"),
      col("source"), nShards = 16).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"shard layout must not plan a window:\n$plan")
  }

  test("epoch order: bijective positions, strided round-robin across shards") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Curation.epochOrder(docs, col("doc_id"), nShards = 16)
      .orderBy("epoch_pos").collect()
    assert(out.length == docs.count())
    // every doc gets a distinct epoch position
    assert(out.map(_.getAs[Long]("epoch_pos")).distinct.length == out.length)
    // within a full rotation, shards repeat only after all non-exhausted
    // shards have been drawn once: the first 16 positions are 16 distinct
    // shards (all shards non-empty at 500 docs, per shardStats)
    val firstRotation = out.take(16).map(_.getAs[Long]("shard_id")).toSet
    assert(firstRotation.size == 16)
    // stride arithmetic: epoch_pos ≡ shard_id (mod nShards)
    assert(out.forall(r =>
      r.getAs[Long]("epoch_pos") % 16 == r.getAs[Long]("shard_id")))
  }

  test("splitLeakage: planted cross-split near-dup surfaces in the right matrix cell") {
    import testImplicits._
    // split bucket for small ids is (97·id + 13) mod 1000:
    //   id 1 → 110 (train), id 2 → 207 (train), id 9 → 886 (val),
    //   id 10 → 983 (test)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),                        // train ─┐ exact dup pair
      (2L, base),                        // train ─┘
      (10L, base + " tail"),             // test: near-dup of 1 and 2 → leak
      (9L, "completely different words with no shingle overlap at all")
    ).toDF("doc_id", "text")
    val m = Curation.splitLeakage(docs, col("doc_id"), col("text"), tau = 0.5)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m(("train", "train")) == 1L)  // the 1–2 dup
    assert(m(("test", "train")) == 2L)   // 10–1 and 10–2 leaks
    assert(!m.contains(("val", "val")) && !m.contains(("train", "val")))
    // raising tau past the near-dup similarity clears the leak cell but
    // keeps the exact dup
    val strict = Curation.splitLeakage(docs, col("doc_id"), col("text"), tau = 0.99)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(strict == Map(("train", "train") -> 1L))
  }

  test("snapshotDiff: added/removed/changed/unchanged off one hash join") {
    import testImplicits._
    val old = Seq(1L -> "alpha", 2L -> "beta", 3L -> "gamma").toDF("id", "text")
    val nw = Seq(2L -> "beta", 3L -> "gamma CHANGED", 4L -> "delta").toDF("id", "text")
    val out = Curation.snapshotDiff(old, nw, col("id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("quantileNormalize: within-group percent ranks, ties share a percentile") {
    import testImplicits._
    val df = Seq(
      (1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 20.0), (4L, "a", 40.0),
      (5L, "b", 99.0), // singleton group: percent_rank = 0
      (6L, "c", 1.0), (7L, "c", 2.0)).toDF("id", "g", "s")
    val got = Curation.quantileNormalize(df, col("id"), col("g"), col("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // group a (n=4): ranks 1,2,2,4 → pct (rank-1)/3
    assert(got(1L) == 0.0)
    assert(got(2L) == math.rint(1.0 / 3 * 1e6) / 1e6 && got(3L) == got(2L))
    assert(got(4L) == 1.0)
    assert(got(5L) == 0.0)
    assert(got(6L) == 0.0 && got(7L) == 1.0)
  }

  test("lengthBuckets: smallest-fit assignment, truncation into the top bucket") {
    import testImplicits._
    val df = Seq((1L, 5), (2L, 16), (3L, 20), (4L, 40), (5L, 200))
      .toDF("id", "n")
    val got = Curation.lengthBuckets(df, col("id"), col("n"), Seq(16, 32, 64))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // 5,16 → 16; 20 → 32; 40,200 → 64 (200 truncated to 64 used tokens)
    assert(got(16L) == ((2L, 21L, 32L, math.rint((1 - 21.0 / 32) * 1e6) / 1e6)))
    assert(got(32L) == ((1L, 20L, 32L, math.rint((1 - 20.0 / 32) * 1e6) / 1e6)))
    assert(got(64L) == ((2L, 104L, 128L, math.rint((1 - 104.0 / 128) * 1e6) / 1e6)))
  }

  test("dropNovelty: hand-computed new-gram shares; all-new and all-seen docs") {
    import testImplicits._
    val ref = Seq((1L, "a b c d")).toDF("id", "text") // 2-grams: "a b","b c","c d"
    val drop = Seq(
      (10L, "a b c"),     // grams "a b","b c" — all seen
      (11L, "x y z"),     // all new
      (12L, "a b x y"),   // "a b" seen, "b x","x y" new
      (13L, "solo")       // no 2-grams → no row
    ).toDF("id", "text")
    val got = Curation.dropNovelty(drop, col("id"), col("text"),
        ref, col("text"), n = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got == Map(
      10L -> ((2L, 0L, 0.0)),
      11L -> ((2L, 2L, 1.0)),
      12L -> ((3L, 2L, math.rint(2.0 / 3 * 1e6) / 1e6))))
  }

  test("stratifiedExact: exactly n per group, deterministic, GroupTopK plan") {
    import testImplicits._
    val df = (1L to 50L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val got = Curation.stratifiedExact(df, col("id"), col("g"), nPerGroup = 4)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.groupBy(_._1).forall(_._2.length == 4))
    // deterministic: re-evaluation returns the same rows
    val again = Curation.stratifiedExact(df, col("id"), col("g"), nPerGroup = 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
    // the selection is the hash-bucket rank, not the id order
    def bkt(i: Long) = ((i % 1000003L) * 131L + 7L) % 1000L
    val expG0 = (1L to 50L).filter(_ % 3 == 0).sortBy(i => (bkt(i), i)).take(4).toSet
    assert(rows.filter(_._1 == "g0").map(_._2).toSet == expG0)
    // bounded-heap contract: GroupTopK in the plan, no Window sort
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("GroupTopK") && !plan.contains("WindowExec"))
  }

  test("weightedSample: Efraimidis-Spirakis keys match hand arithmetic; w<=0 never sampled") {
    import testImplicits._
    val df = Seq((1L, 2.0), (2L, 0.5), (3L, 1.0), (4L, 0.0), (5L, -1.0), (6L, 4.0))
      .toDF("id", "w")
    val got = Curation.weightedSample(df, col("id"), col("w"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // hand replica of the wide-hash u: two poly fingerprints of the id
    // string through their mix chains, packed, +1, / the exact hash
    // space 2^30·(1e9+7) so u spans (0,1]
    def poly(s: String, base: Long, mod: Long): Long =
      s.foldLeft(0L)((a, c) => (a * base + c) % mod)
    // each chain ends with an affine reduction mod its prime, so u < 1
    // exactly and the bottom tail stays uniform (see Sketches.hllMix)
    def mix(h: Long, rounds: Seq[(Long, Long, Int)], mod: Long,
        fa: Long, fb: Long): Long =
      java.lang.Math.floorMod(
        rounds.foldLeft(h) { case (acc, (a, b, sh)) =>
          val t = java.lang.Math.floorMod(acc * a + b, mod); t ^ (t >> sh)
        } * fa + fb, mod)
    def key(id: Long, w: Double): Double = {
      val s = id.toString
      val h1 = mix(poly(s, 31L, 1000000007L),
        graft.operators.Sketches.HllMixRounds, 1000000007L, 1540483477L, 233L)
      val h2 = mix(poly(s, 131L, 1000000009L),
        graft.operators.Sketches.HllMixRounds2, 1000000009L, 1274126177L, 241L)
      val u = (h1 * 1073741824L + h2 + 1L).toDouble /
        graft.operators.Sketches.KmvSpaceWide
      math.log(u) / w
    }
    val exp = Seq((1L, 2.0), (2L, 0.5), (3L, 1.0), (6L, 4.0))
      .map { case (i, w) => (i, key(i, w)) }
      .sortBy { case (i, k0) => (-k0, i) }.take(3)
      .map { case (i, k0) => (i, math.rint(k0 * 1e6) / 1e6) }
    assert(got.toSeq == exp)
    assert(!got.exists(r => r._1 == 4L || r._1 == 5L)) // non-positive weights out
    // determinism: same rows on re-evaluation
    val again = Curation.weightedSample(df, col("id"), col("w"), k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.toSeq == again.toSeq)
  }

  test("luhnValid and scrubCards: checksum gates redaction; decoys survive") {
    import testImplicits._
    val df = Seq(
      (1L, "pay 4532015112830366 now"),          // valid visa test PAN
      (2L, "ref 4532015112830367 attached"),     // checksum-off decoy
      (3L, "a 4532015112830366 b 4111111111111111 c"), // two valid
      (4L, "short 123456789012 run"),            // 12 digits: not a PAN
      (5L, "no digits at all")
    ).toDF("id", "text")
    val got = df.select(col("id"),
        Curation.cardCount(col("text")).as("n"),
        Curation.scrubCards(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    assert(got(1L) == ((1, "pay <card> now")))
    assert(got(2L) == ((0, "ref 4532015112830367 attached")))
    assert(got(3L) == ((2, "a <card> b <card> c")))
    assert(got(4L) == ((0, "short 123456789012 run")))
    assert(got(5L) == ((0, "no digits at all")))
  }

  test("scrubCards: a valid PAN that prefixes a longer valid PAN leaks nothing") {
    import testImplicits._
    // 4532015112830 (13 digits) and 4532015112830002 (16 digits) are BOTH
    // Luhn-valid and the former prefixes the latter. Lexicographic-ascending
    // replacement would redact the 13-digit value first, corrupting the
    // 16-digit run into "<card>002" and leaking its residual digits;
    // length-descending replacement redacts the superstring first.
    val df = Seq(
      (1L, "short 4532015112830 long 4532015112830002 end")
    ).toDF("id", "text")
    val got = df.select(Curation.scrubCards(col("text")).as("s"))
      .head().getString(0)
    assert(got == "short <card> long <card> end", got)
    assert(!got.exists(_.isDigit), s"residual digits leaked: $got")
  }

  test("groupAwareSplit: cluster members share a split; singletons fall back to own id") {
    import testImplicits._
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (4L, 4L)).toDF("id", "cluster_id")
    val got = Curation.groupAwareSplit(ids, col("doc_id"), clusters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L)._2 == got(2L)._2)          // same cluster, same split
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L)
    assert(got(3L)._1 == 3L && got(5L)._1 == 5L) // singleton fallback
    // the split decision is hashSplit arithmetic on the group id
    def bucket(g: Long) = ((g % 1000003L) * 97L + 13L) % 1000L
    got.foreach { case (_, (g, sp)) =>
      val b = bucket(g)
      val exp = if (b < 800) "train" else if (b < 900) "val" else "test"
      assert(sp == exp)
    }
  }

  test("softDedupWeights: cluster mass sums to 1 per group; singleton fallback") {
    import testImplicits._
    val ids = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("id", "cluster_id")
    val got = Curation.softDedupWeights(ids, col("doc_id"), clusters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((1L, 2L, 0.5)) && got(2L) == ((1L, 2L, 0.5)))
    assert(got(3L) == ((3L, 1L, 1.0)))
    assert(got(4L) == ((4L, 1L, 1.0))) // no cluster row -> own group
    // each content group contributes exactly one unit of mass
    val mass = got.values.groupBy(_._1).map { case (_, v) => v.map(_._3).sum }
    assert(mass.forall(m => math.abs(m - 1.0) < 1e-9))
  }
}
