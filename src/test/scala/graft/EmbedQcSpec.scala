package graft

import graft.operators.EmbedQc
import org.apache.spark.sql.functions._

/** Embedding QC: a planted far-from-centroid vector must surface as the
  * top outlier, and scores must be deterministic across re-evaluation.
  */
class EmbedQcSpec extends SparkSpec {

  test("outliers: planted off-cluster vector ranks first; z ordering total") {
    import testImplicits._
    val rows = Seq(
      (0L, Array(1.00f, 0.00f), 0),
      (1L, Array(0.98f, 0.02f), 0),
      (2L, Array(1.02f, -0.02f), 0),
      (3L, Array(0.00f, 1.00f), 0), // planted outlier in label 0
      (10L, Array(0.00f, 1.00f), 1),
      (11L, Array(0.02f, 0.98f), 1),
      (12L, Array(-0.02f, 1.02f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = EmbedQc.outliers(rows, col("vec_id"), col("embedding"),
      col("label"), k = 3).collect()
    assert(out.head.getAs[Long]("id") == 3L)
    val zs = out.map(_.getAs[Double]("z")).toSeq
    assert(zs == zs.sorted.reverse)
    // deterministic: a second evaluation returns the identical frame
    val again = EmbedQc.outliers(rows, col("vec_id"), col("embedding"),
      col("label"), k = 3).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("zScreen: outlier gate complements the ranked view") {
    import testImplicits._
    val rows = Seq(
      (0L, Array(1.00f, 0.00f), 0), (1L, Array(0.98f, 0.02f), 0),
      (2L, Array(1.02f, -0.02f), 0), (3L, Array(0.00f, 1.00f), 0),
      (10L, Array(0.00f, 1.00f), 1), (11L, Array(0.02f, 0.98f), 1),
      (12L, Array(-0.02f, 1.02f), 1)
    ).toDF("vec_id", "embedding", "label")
    val scored = EmbedQc.zScored(rows, col("vec_id"), col("embedding"), col("label"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("z")).toMap
    val keepZ = 1.0
    val kept = EmbedQc.zScreen(rows, col("vec_id"), col("embedding"), col("label"),
      zMax = keepZ).collect().map(_.getAs[Long]("id")).toSet
    assert(kept == scored.filter(_._2 <= keepZ).keySet)
    assert(!kept.contains(3L)) // the planted outlier fails the gate
  }

  test("sigma = 0 labels: singleton and all-identical groups score z = 0, pass the screen") {
    import testImplicits._
    val rows = Seq(
      (0L, Array(1.00f, 0.00f), 0),             // singleton label
      (10L, Array(0.00f, 1.00f), 1),            // identical pair: sigma = 0
      (11L, Array(0.00f, 1.00f), 1),
      (20L, Array(1.00f, 0.00f), 2),            // a normal spread label
      (21L, Array(0.00f, 1.00f), 2)
    ).toDF("vec_id", "embedding", "label")
    val scored = EmbedQc.zScored(rows, col("vec_id"), col("embedding"), col("label"))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.get(r.fieldIndex("z"))).map(_.asInstanceOf[Double])).toMap
    // no NULLs, no NaNs; degenerate labels score exactly 0
    assert(scored.values.forall(z => z.exists(v => !v.isNaN)))
    assert(scored(0L).contains(0.0) && scored(10L).contains(0.0) && scored(11L).contains(0.0))
    // the screen must RETAIN degenerate labels (they'd vanish on NULL z)
    val kept = EmbedQc.zScreen(rows, col("vec_id"), col("embedding"), col("label"),
      zMax = 3.0).collect().map(_.getAs[Long]("id")).toSet
    assert(Set(0L, 10L, 11L).subsetOf(kept))
  }

  test("outliers on the test corpus: k rows, finite scores, plan broadcasts stats") {
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = EmbedQc.outliers(embs, col("vec_id"), col("embedding"),
      col("label"), k = 20)
    val out = df.collect()
    assert(out.length == 20)
    assert(out.forall(r => !r.getAs[Double]("z").isNaN))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"centroid/stats joins must broadcast:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
  }

  private val dir = "/root/testdata/sf0.001"

  test("abtt: unit top component, Pythagorean consistency, deterministic reruns") {
    import graft.operators.EmbedQc
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val (mean, v) = EmbedQc.topComponent(embs, col("embedding"), iters = 8)
    assert(mean.length == v.length)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-4, s"|v| = $norm (6-dp rounding tolerance)")
    val rows = EmbedQc.abtt(embs, col("vec_id"), col("embedding"), iters = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == embs.count())
    // |xc|^2 = proj^2 + resid^2 for a unit v (check a few rows exactly)
    val xcNorm = embs
      .select(col("vec_id"), zip_with(col("embedding").cast("array<double>"),
        typedLit(mean), (a, b) => a - b).as("xc"))
      .select(col("vec_id"),
        sqrt(aggregate(zip_with(col("xc"), col("xc"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.take(20).foreach { case (id, proj, resid) =>
      val expect = xcNorm(id)
      val got = math.sqrt(proj * proj + resid * resid)
      assert(math.abs(got - expect) < 1e-3, s"vec $id: $got vs $expect")
    }
    val rerun = EmbedQc.abtt(embs, col("vec_id"), col("embedding"), iters = 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq == rerun.toSeq)
  }

  test("truncationRecall: full width recalls 1.0; schema pinned") {
    import graft.operators.EmbedQc
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = graft.sources.VectorStore.fromEmbeddingsTable(spark, dir)
      .getVector("0").toSeq
    val out = EmbedQc.truncationRecall(embs, col("vec_id"), col("embedding"),
      q, dims = Seq(16, 64), k = 10).collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(16, 64))
    val full = out.find(_.getInt(0) == 64).get
    assert(full.getLong(1) == 10 && full.getDouble(2) == 1.0)
    val d16 = out.find(_.getInt(0) == 16).get
    assert(d16.getLong(1) >= 0 && d16.getLong(1) <= 10)
  }

  test("pcaTop2: axis-aligned data recovers both components; residual zero in-plane") {
    import testImplicits._
    import org.apache.spark.sql.functions.col
    // variance 9 along e1, 1 along e2, nothing along e3; mean is 0
    val df = Seq(
      (1L, Array(3f, 0f, 0f)), (2L, Array(-3f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f)), (4L, Array(0f, -1f, 0f))
    ).toDF("vid", "emb")
    val got = EmbedQc.pcaTop2(df, col("vid"), col("emb"), iters = 12)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    // top direction = ±e1: |p1| = 3 for the e1 points, 0 for the e2 points
    assert(math.abs(math.abs(got(1L)._1) - 3.0) < 1e-4)
    assert(math.abs(got(3L)._1) < 1e-4)
    // second direction = ±e2 after deflation
    assert(math.abs(math.abs(got(3L)._2) - 1.0) < 1e-4)
    assert(math.abs(got(1L)._2) < 1e-4)
    // all points live in the e1-e2 plane: residual vanishes
    assert(got.values.forall(_._3 < 1e-4))
  }

  test("embeddingDrift: identical halves read zero; a planted offset reads in reference-sigma units; constant dims null") {
    import testImplicits._
    // dim 0 cycles 0..3 (sigma = sqrt(1.25)); dims 1 and 2 are constant
    val ref = (0 until 40)
      .map(i => (i.toLong, Array((i % 4).toFloat, 1f, 7f))).toDF("id", "emb")
    val same = EmbedQc.embeddingDrift(ref, ref, col("emb")).collect()
    assert(same.length == 3)
    same.foreach { r =>
      assert(r.getDouble(3) == r.getDouble(4), "means must match")
      if (r.getInt(0) == 0) assert(r.getDouble(5) == 0.0)
      else assert(r.isNullAt(5), s"constant dim ${r.getInt(0)} must read NULL")
    }
    // current = reference shifted +2.0 along dim 0: z = 2 / sqrt(1.25)
    val cur = (0 until 40)
      .map(i => (i.toLong, Array((i % 4).toFloat + 2f, 1f, 7f))).toDF("id", "emb")
    val drift = EmbedQc.embeddingDrift(ref, cur, col("emb"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toMap
    assert(drift(0) == Some(BigDecimal(2.0 / math.sqrt(1.25))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(drift(1).isEmpty && drift(2).isEmpty)
  }

  test("embeddingDrift: one-buffer moments equal the posexplode twin; precomputed reference stats give identical rows") {
    import org.apache.spark.sql.DataFrame
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ref = embs.filter(col("vec_id") % 2 === 0)
    val cur = embs.filter(col("vec_id") % 2 === 1)
    // the r7 implementation, verbatim: posexplode + groupBy(pos) — the
    // scan-stage n·d row blow-up the aggregator replaces; results must agree
    def oldStats(df: DataFrame, prefix: String): DataFrame =
      df.select(posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "v")))
        .groupBy("pos")
        .agg(avg(col("v")).as(s"m_$prefix"),
          avg(col("v") * col("v")).as(s"m2_$prefix"),
          count(lit(1)).as(s"n_$prefix"))
    val sigma = sqrt(greatest(col("m2_ref") - col("m_ref") * col("m_ref"), lit(0.0)))
    val old = oldStats(ref, "ref").join(broadcast(oldStats(cur, "cur")), Seq("pos"))
      .select(col("pos"), col("n_ref"), col("n_cur"),
        round(col("m_ref"), 6).as("mean_ref"),
        round(col("m_cur"), 6).as("mean_cur"),
        when(sigma > 0, round((col("m_cur") - col("m_ref")) / sigma, 6)).as("shift_z"))
      .orderBy("pos").collect().toSeq
    val now = EmbedQc.embeddingDrift(ref, cur, col("embedding")).collect().toSeq
    assert(now.size == 64 && now == old)
    // the monitor form: reference reduced once, joined per batch — identical
    val stats = EmbedQc.referenceStats(ref, col("embedding"))
    val viaStats = EmbedQc.embeddingDriftFromStats(stats, cur, col("embedding"))
      .collect().toSeq
    assert(viaStats == now)
    // and the plan over the vectors carries NO posexplode-generate of the
    // embedding scan (the moments fold in the aggregation buffer)
    val plan = EmbedQc.embeddingDrift(ref, cur, col("embedding"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("posexplode(cast(embedding"),
      s"drift must not explode n·d rows in the scan:\n$plan")
  }
}
