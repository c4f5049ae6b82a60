package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("hll: registers merge across groups exactly; ALL row equals single-group run") {
    import testImplicits._
    val df = (1 to 3000).map(i => (if (i % 2 == 0) "a" else "b", s"key$i"))
      .toDF("src", "k")
    // merged-ALL estimate == the estimate of the same data relabeled to one group
    val out = Sketches.hllCardinality(df, col("src"), col("k"), p = 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val single = Sketches.hllCardinality(df, lit("one"), col("k"), p = 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("ALL") == single("one"))
    // register-level merge: max over per-group registers == whole-corpus registers
    val perGroup = Sketches.hllRegisters(df, col("src"), col("k"), 7)
      .groupBy("bucket").agg(max("rho").as("rho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val whole = Sketches.hllRegisters(df, lit("x"), col("k"), 7)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    assert(perGroup == whole)
  }

  test("hll: estimate lands within the published error band; deterministic") {
    import testImplicits._
    val n = 50000
    val df = (1 to n).map(i => ("g", s"value-$i")).toDF("src", "k")
    val rows = Sketches.hllCardinality(df, col("src"), col("k"), p = 10).collect()
    val byGrp = rows.map(r => r.getString(0) -> r.getDouble(3)).toMap
    // m=1024 -> sigma ~ 1.04/sqrt(1024) ~ 3.25%; allow 4 sigma
    assert(math.abs(byGrp("g")) < 0.13, s"rel_err ${byGrp("g")} out of band")
    assert(byGrp("g") == byGrp("ALL"))
    val again = Sketches.hllCardinality(df, col("src"), col("k"), p = 10).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("hll wide: matches narrow semantics on small data; deterministic; mergeable") {
    import testImplicits._
    val df = (1 to 3000).map(i => (if (i % 2 == 0) "a" else "b", s"key$i"))
      .toDF("src", "k")
    val out = Sketches.hllCardinality(df, col("src"), col("k"), p = 7, wide = true)
      .collect()
    val byGrp = out.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(byGrp.keySet == Set("a", "b", "ALL"))
    byGrp.values.foreach(e => assert(math.abs(e) < 0.4, s"rel_err $e"))
    val again = Sketches.hllCardinality(df, col("src"), col("k"), p = 7, wide = true)
      .collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
    // merged-ALL == single-group relabel (register-wise max mergeability)
    val single = Sketches.hllCardinality(df, lit("one"), col("k"), p = 7, wide = true)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val all = out.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(all("ALL") == single("one"))
  }

  test("hll wide: 1e8 distinct keys estimate within the published band", SlowTest) {
    // Round-5 verdict #2 gate: the 30-bit tier saturates past ~1e7 distinct
    // keys (hash space ~1.07e9 -> birthday loss n/2M ~ 4.7% at n=1e8 and
    // ~40% at n=1e9); the ~2^60 wide hash keeps the full HLL band. All
    // hashes are deterministic, so these numbers are FIXED run to run.
    val n = 100000000L
    val df = spark.range(n)
      .select(lit("g").as("grp"), concat(lit("user:"), col("id")).as("k"))
    def est(wide: Boolean): Double =
      Sketches.hllEstimate(
        Sketches.hllRegisters(df, col("grp"), col("k"), p = 10, wide = wide),
        p = 10, wide = wide)
        .collect().head.getDouble(1)
    val wideEst = est(wide = true)
    val relWide = (wideEst - n) / n.toDouble
    // m=1024 -> sigma ~ 3.25%; allow 4 sigma
    assert(math.abs(relWide) < 0.13, s"wide rel_err $relWide out of band")
    val narrowEst = est(wide = false)
    // the narrow tier cannot report more than its hash space (~1.07e9) and
    // at n=1e8 already sits below the wide estimate by the birthday loss
    assert(narrowEst < 1.1e9)
    assert(narrowEst < wideEst, s"narrow $narrowEst >= wide $wideEst")
  }

  test("kmv wide: 1e6-key overlap estimates inside the k=64 band; deterministic") {
    // A = [0, 1e6), B = [5e5, 1.5e6): |A| = |B| = 1e6, J = 1/3. The wide
    // space keeps theta quantization negligible at any realistic n (the
    // narrow theta at n = 1e9 would be an integer near k). Deterministic
    // hashes -> fixed values; the bands document the estimator contract.
    val n = 1000000L
    val a = spark.range(n).select(lit("A").as("grp"),
      concat(lit("key:"), col("id")).as("k"))
    val b = spark.range(n / 2, 3 * n / 2).select(lit("B").as("grp"),
      concat(lit("key:"), col("id")).as("k"))
    val out = Sketches.kmvOverlap(a.unionByName(b), col("grp"), col("k"),
        k = 64, wide = true)
      .collect().head
    val (da, db, j) = (out.getDouble(2), out.getDouble(3), out.getDouble(5))
    assert(math.abs(da - n) / n < 0.35, s"d_est_a $da")
    assert(math.abs(db - n) / n < 0.35, s"d_est_b $db")
    assert(math.abs(j - 1.0 / 3) < 0.2, s"jaccard_est $j")
    val again = Sketches.kmvOverlap(a.unionByName(b), col("grp"), col("k"),
      k = 64, wide = true).collect().head
    assert(out.toSeq == again.toSeq)
  }

  test("estimate-only front doors agree with the audited twins' estimates") {
    import testImplicits._
    // audit=false must be the SAME estimator minus the exact twin — pin
    // value-level agreement so the two forms can't drift apart
    val ev = (1 to 400).map(i => (s"d${i % 5}", s"u${i % 37}")).toDF("day", "u")
      .select(to_date(concat(lit("2026-01-0"), substring(col("day"), 2, 1)
        .cast("int") + 1)).as("ts"), col("u"))
    val audited = Sketches.hllRolling(ev, col("ts"), col("u"), windowDays = 3,
        p = 7, wide = true)
      .select("day", "dau_est", "wau_est").collect().toSeq
    val estOnly = Sketches.hllRolling(ev, col("ts"), col("u"), windowDays = 3,
        p = 7, wide = true, audit = false).collect().toSeq
    assert(estOnly.map(_.toSeq) == audited.map(_.toSeq))

    val kv = (1 to 500).map(i => (s"g${i % 3}", s"k${i % 91}")).toDF("g", "k")
    val cardAudited = Sketches.hllCardinality(kv, col("g"), col("k"), p = 7)
      .select("grp", "hll_est").collect().toSeq
    val cardEst = Sketches.hllCardinality(kv, col("g"), col("k"), p = 7,
      audit = false).collect().toSeq
    assert(cardEst.map(_.toSeq) == cardAudited.map(_.toSeq))

    // heavy hitters: estimate-ranking must surface the same items as the
    // exact ranking on a collision-free width, with identical estimates
    val occ = (1 to 300).flatMap(i => Seq.fill(i % 7 + 1)(s"tok${i % 11}"))
      .toDF("t")
    val hhAudited = Sketches.cmHeavyHitters(occ, col("t"), topK = 5)
      .select("item", "n_est").collect().toSeq
    val hhEst = Sketches.cmHeavyHitters(occ, col("t"), topK = 5, audit = false)
      .collect().toSeq
    assert(hhEst.map(_.toSeq).toSet == hhAudited.map(_.toSeq).toSet)
  }

  test("hll: small cardinality routes to linear counting and is near-exact") {
    import testImplicits._
    val df = (1 to 40).map(i => ("g", s"k$i")).toDF("src", "k")
    val r = Sketches.hllCardinality(df, col("src"), col("k"), p = 7)
      .filter(col("grp") === "g").collect().head
    assert(r.getLong(1) == 40L)
    // linear counting with 40 of 128 registers hit is within a few percent
    assert(math.abs(r.getDouble(3)) < 0.1)
  }

  test("count-min: one-sided overestimate, exact on the collision-free side, deterministic") {
    import testImplicits._
    val occ = (Seq.fill(100)("alpha") ++ Seq.fill(50)("beta") ++
      Seq.fill(7)("gamma") ++ Seq("delta")).map(Tuple1(_)).toDF("t")
    val out = Sketches.cmHeavyHitters(occ, col("t"), topK = 10).collect()
    assert(out.map(_.getString(0)).take(2).toSeq == Seq("alpha", "beta"))
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // 4 distinct items in 4x1024 cells: no collisions, estimates exact
    assert(out.forall(r => r.getLong(2) == r.getLong(1)))
    val again = Sketches.cmHeavyHitters(occ, col("t"), topK = 10).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("count-min: counter matrix is bounded at depth x width cells") {
    import testImplicits._
    val occ = (1 to 5000).map(i => Tuple1(s"tok${i % 700}")).toDF("t")
    val est = Sketches.cmHeavyHitters(occ, col("t"), depth = 4, width = 64, topK = 5)
    // 700 distinct items hash into <= 4*64 cells; heavy collisions, but the
    // invariant holds: every estimate >= its exact count
    est.collect().foreach(r => assert(r.getLong(2) >= r.getLong(1)))
  }

  test("histogram quantiles: within one bin width of exact; monotone in q") {
    import testImplicits._
    // uniform grid on [0,1): exact quantile q is ~q
    val df = (0 until 10000).map(i => Tuple1(i / 10000.0)).toDF("v")
    val qs = Seq(0.25, 0.5, 0.75, 0.9)
    val out = Sketches.histogramQuantiles(df, col("v"), qs, bins = 256)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val binW = 1.0 / 256
    qs.foreach(q => assert(math.abs(out(q) - q) <= binW + 1e-9,
      s"q=$q est=${out(q)}"))
    assert(qs.map(out).sliding(2).forall(p => p.head <= p.last))
  }

  test("adaptive histogram quantiles: fitted range resolves a concentrated distribution") {
    import testImplicits._
    // all mass inside [3.39, 3.42], NON-uniform within the span (quadratic
    // crowding toward the low end): a fixed [0,16] guess lands everything
    // in one 0.0625-wide bin whose uniform-interpolation assumption is now
    // wrong, while the fitted range resolves the shape at (max-min)/bins
    val df = (0 until 3000).map { i =>
      val u = i / 3000.0; Tuple1(3.39 + 0.03 * u * u)
    }.toDF("v")
    val qs = Seq(0.25, 0.5, 0.75)
    val fixed = Sketches.histogramQuantiles(df, col("v"), qs, bins = 256, lo = 0.0, hi = 16.0)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val fitted = Sketches.histogramQuantilesAdaptive(df, col("v"), qs, bins = 256)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val binW = 0.03 / 256
    var fixedWorst = 0.0
    qs.foreach { q =>
      val exact = 3.39 + 0.03 * q * q // inverse of the quadratic ramp
      assert(math.abs(fitted(q) - exact) <= binW + 1e-9,
        s"q=$q fitted=${fitted(q)} exact=$exact")
      fixedWorst = math.max(fixedWorst, math.abs(fixed(q) - exact))
    }
    // the single coarse bin interpolates as if uniform — off by far more
    // than the fitted sketch's bin-width bound
    assert(fixedWorst > 5 * binW, s"fixed-range error $fixedWorst unexpectedly small")
    assert(fitted(0.25) < fitted(0.5) && fitted(0.5) < fitted(0.75))
  }

  test("grouped histogram quantiles: per-group estimates independent and within a bin width") {
    import testImplicits._
    // group a uniform on [0, 0.5); group b uniform on [0.5, 1.0)
    val df = ((0 until 4000).map(i => ("a", 0.5 * i / 4000.0)) ++
      (0 until 2000).map(i => ("b", 0.5 + 0.5 * i / 2000.0))).toDF("src", "v")
    val out = Sketches.histogramQuantilesByGroup(df, col("src"), col("v"),
      Seq(0.5), bins = 256).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val binW = 1.0 / 256
    assert(math.abs(out("a") - 0.25) <= binW + 1e-9, s"a median ${out("a")}")
    assert(math.abs(out("b") - 0.75) <= binW + 1e-9, s"b median ${out("b")}")
  }

  test("adaptive histogram quantiles: constant column degenerates to that value") {
    import testImplicits._
    val df = Seq.fill(50)(Tuple1(7.25)).toDF("v")
    val out = Sketches.histogramQuantilesAdaptive(df, col("v"), Seq(0.5))
      .collect().head.getDouble(1)
    assert(out == 7.25)
  }

  test("histogram quantiles: values outside [lo,hi] clamp to edge bins") {
    import testImplicits._
    val df = Seq(-5.0, 0.1, 0.2, 0.3, 99.0).map(Tuple1(_)).toDF("v")
    val out = Sketches.histogramQuantiles(df, col("v"), Seq(0.5), bins = 10)
      .collect().head.getDouble(1)
    // median of 5 values = 3rd ranked = 0.2's bin [0.2, 0.3)
    assert(out >= 0.2 && out < 0.3 + 1e-9)
  }

  test("kmv: sketch bounded at k rows per group; small groups estimate exactly") {
    import testImplicits._
    val df = ((1 to 500).map(i => ("big", s"v$i")) ++
      (1 to 20).map(i => ("small", s"v$i"))).toDF("src", "k")
    val sk = Sketches.kmvSketch(df, col("src"), col("k"), k = 64)
    val cnts = sk.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cnts("big") == 64L && cnts("small") == 20L)
    // a group below k retains everything at theta = M -> estimate is exact
    val est = Sketches.kmvOverlap(df, col("src"), col("k"), k = 64)
      .collect().head
    val (da, db) = (est.getAs[Double]("d_est_a"), est.getAs[Double]("d_est_b"))
    val small = math.min(da, db)
    assert(small == 20.0, s"small-group estimate $small should be exact")
  }

  test("kmv: identical groups fuse to jaccard exactly 1; estimates inside the error band") {
    import testImplicits._
    val twin = ((1 to 2000).map(i => ("a", s"x$i")) ++
      (1 to 2000).map(i => ("b", s"x$i"))).toDF("src", "k")
    val t = Sketches.kmvOverlap(twin, col("src"), col("k"), k = 128).collect().head
    assert(t.getAs[Double]("jaccard_est") == 1.0)
    assert(t.getAs[Double]("inter_est") == t.getAs[Double]("d_est_a"))
    // half-overlapping sets: true inter 1000, union 3000, J = 1/3;
    // k = 256 -> sigma ~ 1/sqrt(256) ~ 6%, allow ~4 sigma
    val ov = ((1 to 2000).map(i => ("a", s"x$i")) ++
      (1001 to 3000).map(i => ("b", s"x$i"))).toDF("src", "k")
    val o = Sketches.kmvOverlap(ov, col("src"), col("k"), k = 256).collect().head
    val j = o.getAs[Double]("jaccard_est")
    assert(j > 0.2 && j < 0.47, s"jaccard_est $j outside band around 1/3")
    val inter = o.getAs[Double]("inter_est")
    assert(inter > 600 && inter < 1400, s"inter_est $inter outside band around 1000")
  }

  test("psiByGroup: hand-run eps-floored PSI vs the reference; identical distribution scores 0") {
    import testImplicits._
    // bins=4: R -> bins [0,0,2,3] rates [.5,eps,.25,.25]; A -> [1,1,1,3]
    // rates [eps,.75,eps,.25]; B duplicates R exactly
    val rows = Seq(("R", 0.1), ("R", 0.1), ("R", 0.6), ("R", 0.85),
      ("A", 0.3), ("A", 0.3), ("A", 0.3), ("A", 0.9),
      ("B", 0.1), ("B", 0.1), ("B", 0.6), ("B", 0.85))
    val df = rows.toDF("src", "v")
    val out = Sketches.psiByGroup(df, col("src"), col("v"), "R",
        bins = 4, eps = 0.01)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set("A", "B"))
    assert(out("B") == ((4L, 0.0)))
    val p = Seq(0.01, 0.75, 0.01, 0.25)
    val q = Seq(0.5, 0.01, 0.25, 0.25)
    val exp = math.rint(p.zip(q).map { case (a, b) => (a - b) * math.log(a / b) }
      .sorted.sum * 1e6) / 1e6
    assert(out("A") == ((4L, exp)))
    // a PSI over 0.25 flags the shifted source — the gate the op exists for
    assert(out("A")._2 > 0.25 && out("B")._2 < 0.1)
  }

  test("hllRolling: window merge equals the sketch of the union; exact twins exact; gaps skipped") {
    import testImplicits._
    val rows = Seq(("2024-01-01", 1L), ("2024-01-01", 2L),
      ("2024-01-02", 2L), ("2024-01-02", 3L), ("2024-01-04", 9L))
    val df = rows.toDF("d", "u").select(to_date(col("d")).as("d"), col("u"))
    val out = Sketches.hllRolling(df, col("d"), col("u").cast("string"),
      windowDays = 2, p = 7).collect()
    // rows only for ACTIVE days (Jan 3 has no events -> no phantom row);
    // trailing-2-day windows: 01 = {1,2}; 02 = {1,2,3}; 04 = {9} (the gap
    // day contributes nothing)
    assert(out.map(_.getString(0)).toSeq ==
      Seq("2024-01-01", "2024-01-02", "2024-01-04"))
    assert(out.map(r => (r.getLong(1), r.getLong(3))).toSeq ==
      Seq((2L, 2L), (2L, 3L), (1L, 1L)))
    // mergeability, the property the operator exists for: the rolling
    // estimate of Jan 2 IS the estimate of the unioned key set — register
    // max-merge is exact, not approximate
    val union = Seq(1L, 2L, 3L).toDF("u").select(lit("g").as("g"), col("u"))
    val uEst = Sketches.hllEstimate(
      Sketches.hllRegisters(union, col("g"), col("u").cast("string"), p = 7),
      p = 7).collect().head.getDouble(1)
    assert(out(1).getDouble(4) == math.rint(uEst * 1e6) / 1e6 ||
      math.abs(out(1).getDouble(4) - uEst) < 1e-6)
    // deterministic
    val again = Sketches.hllRolling(df, col("d"), col("u").cast("string"),
      windowDays = 2, p = 7).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("kmv: sketches merge — union-then-bottom-k equals bottom-k of combined group") {
    import testImplicits._
    val df = ((1 to 300).map(i => ("a", s"p$i")) ++
      (200 to 600).map(i => ("b", s"p$i"))).toDF("src", "k")
    val per = Sketches.kmvSketch(df, col("src"), col("k"), k = 32)
    // merge = union the two sketch hash sets, re-take the 32 smallest
    val merged = per.select("h").distinct().orderBy("h").limit(32)
      .collect().map(_.getLong(0)).toSeq
    val whole = Sketches.kmvSketch(df.select(lit("all").as("src"), col("k")),
        col("src"), col("k"), k = 32)
      .orderBy("h").collect().map(_.getLong(1)).toSeq
    assert(merged == whole)
  }
}
