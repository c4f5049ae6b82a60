package graft

import org.apache.spark.sql.functions._
import graft.operators.Profile

class ProfileSpec extends SparkSpec {

  test("completeness: exact null/distinct counts per column in one pass") {
    import testImplicits._
    val df = Seq(
      (1L, Some("a"), Some(1.0)), (2L, None, Some(2.0)),
      (3L, Some("a"), None), (4L, Some("b"), Some(2.0))
    ).toDF("id", "s", "v")
    val got = Profile.completeness(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("id") == ((4L, 0L, 4L)))
    assert(got("s") == ((4L, 1L, 2L)))  // null ignored by distinct
    assert(got("v") == ((4L, 1L, 2L)))
    // ONE table read: exactly one scan node in the plan (Expand, not
    // per-column subplans)
    val plan = Profile.completeness(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"multi-distinct must plan via Expand:\n$plan")
  }

  test("orphan audit: counts and rate; zero orphans under the full parent") {
    import testImplicits._
    val child = Seq((1L, "x"), (2L, "y"), (3L, "z"), (3L, "w")).toDF("k", "payload")
    val parent = Seq(1L, 2L).toDF("pk")
    val r = Profile.orphanAudit(child, col("k"), parent, col("pk")).head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L && r.getDouble(2) == 0.5)
    val full = Seq(1L, 2L, 3L).toDF("pk")
    val r2 = Profile.orphanAudit(child, col("k"), full, col("pk")).head()
    assert(r2.getLong(1) == 0L && r2.getDouble(2) == 0.0)
  }

  test("keySkew: exact counts/shares, count-desc-key-asc order, topN cut") {
    import testImplicits._
    // key 7 ×4, key 3 ×2, keys 1,9 ×1 each — 8 rows, 4 keys
    val df = Seq(7L, 7L, 7L, 7L, 3L, 3L, 1L, 9L).toDF("k")
    val got = Profile.keySkew(df, col("k"), topN = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(
      (1, 7L, 4L, 0.5, 0.5, 4L, 8L),
      (2, 3L, 2L, 0.25, 0.75, 4L, 8L),
      (3, 1L, 1L, 0.125, 0.875, 4L, 8L))) // ties broken key-asc: 1 before 9
  }

  test("keySkew: topN past the key count returns every key, cum_share ends at 1") {
    import testImplicits._
    val df = Seq("a", "a", "b").toDF("k")
    val got = Profile.keySkew(df, col("k"), topN = 10).orderBy("rnk").collect()
    assert(got.length == 2)
    assert(got.last.getDouble(4) == 1.0)
  }

  test("numericProfile: hand moments with nulls; one aggregation job") {
    import testImplicits._
    val df = Seq((Some(1.0), Some(10.0)), (Some(3.0), None), (None, Some(30.0)))
      .toDF("a", "b")
    val got = Profile.numericProfile(df, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6)))).toMap
    // a: [1,3] → mean 2, var (1+9)/2 − 4 = 1 → stddev 1
    assert(got("a") == ((3L, 1L, 1.0, 3.0, 2.0, 1.0)))
    // b: [10,30] → mean 20, var (100+900)/2 − 400 = 100 → stddev 10
    assert(got("b") == ((3L, 1L, 10.0, 30.0, 20.0, 10.0)))
    // single job: one Expand-backed aggregate, one scan
    val plan = Profile.numericProfile(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"profile must be ONE aggregation:\n$plan")
  }

  test("numericProfile: small-magnitude columns keep stddev precision (x2 at 1e-12)") {
    import testImplicits._
    // discount-scale values: x^2 ~ 1e-4, so a 1e-6-quantized second moment
    // keeps only ~2 significant digits per row and the stddev came out
    // 0.027184 instead of 0.027189 — visible INSIDE the 6-dp presentation.
    // The DECIMAL(38,12) accumulator holds these x^2 exactly.
    val df = Seq(0.0123, 0.0456, 0.0789).map(Tuple1(_)).toDF("d")
    val got = Profile.numericProfile(df, Seq("d")).head()
    val vals = Seq(0.0123, 0.0456, 0.0789)
    val m = vals.sum / 3
    val expStd = math.sqrt(vals.map(v => v * v).sum / 3 - m * m)
    assert(got.getDouble(6) ==
      BigDecimal(expStd).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      s"stddev ${got.getDouble(6)} != $expStd")
  }

  test("numericProfile: epoch-scale magnitudes keep integer headroom (split x2 lanes)") {
    import testImplicits._
    // x ~ 1e12 ⇒ x² = 1e24 per row; 150 rows ⇒ Σx² = 1.5e26, which
    // OVERFLOWS a single DECIMAL(38,12) accumulator (26 integer digits,
    // 1e26 capacity — the pre-split defect: NULL/exception at only
    // ~150 rows of timestamp-scale data). The split integer lane sums in
    // DECIMAL(38,0) and carries it exactly.
    val v = 1.0e12
    val df = (1 to 150).map(_ => Tuple1(v)).toDF("t")
    val got = Profile.numericProfile(df, Seq("t")).head()
    assert(got.getLong(1) == 150L)
    assert(got.getDouble(5) == v) // mean of a constant column
    assert(got.getDouble(6) == 0.0, s"stddev ${got.getDouble(6)}") // Var = 0
    // and a non-constant epoch-scale column matches an EXACT driver
    // replica of the engine arithmetic (the naive double Σx² replica
    // cancels catastrophically at 1e24 scale — the very drift the
    // decimal accumulators exist to avoid)
    val vals = (0 until 150).map(i => 1.0e12 + i * 1000.0)
    val df2 = vals.map(Tuple1(_)).toDF("t")
    val got2 = Profile.numericProfile(df2, Seq("t")).head()
    val n = vals.size
    val s2d = vals.map(x => BigDecimal(x * x)).sum.toDouble // exact decimal sum, then the cast
    val m = vals.map(BigDecimal(_)).sum.toDouble / n
    val expStd = BigDecimal(math.sqrt(math.max(0.0, s2d / n - m * m)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got2.getDouble(6) == expStd,
      s"stddev ${got2.getDouble(6)} vs $expStd")
  }

  test("madOutliers: hand-computed medians/MAD; flat group never flags") {
    import testImplicits._
    val df = Seq(
      (1L, "b", 1.0), (2L, "b", 2.0), (3L, "b", 3.0), (4L, "b", 4.0), (5L, "b", 100.0),
      (6L, "f", 7.0), (7L, "f", 7.0), (8L, "f", 7.0) // flat: MAD = 0
    ).toDF("id", "g", "v")
    val got = Profile.madOutliers(df, col("g"), col("id"), col("v"), k = 3.0)
      .collect().map(r => r.getLong(1) ->
        ((r.getDouble(3), Option(r.get(4)).map(_.asInstanceOf[Double]), r.getBoolean(5))))
      .toMap
    // group b: med = 3, devs = (2,1,0,1,97), MAD = 1
    assert(got(1L)._1 == 3.0)
    assert(got(5L)._2.get == math.rint(97.0 / 1.4826 * 1e6) / 1e6)
    assert(got(5L)._3)                      // 97 > 3·1.4826·1
    assert(!got(1L)._3 && !got(4L)._3)      // 2 < 4.45
    // flat group: MAD = 0 → null z, never an outlier
    assert(got(6L)._2.isEmpty && !got(6L)._3)
  }

  test("fanoutHistogram: zero-child parents counted; exact histogram") {
    import testImplicits._
    val parent = Seq(1L, 2L, 3L, 4L).toDF("pk")
    val child = Seq(1L, 1L, 1L, 2L, 3L).toDF("fk")
    val got = Profile.fanoutHistogram(child, col("fk"), parent, col("pk"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 2L, 3L -> 1L))
  }
}
