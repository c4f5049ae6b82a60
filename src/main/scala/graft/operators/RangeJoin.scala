package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded (binned) range join — the scalable plan for time-window joins.
  * A naive `a.join(b, key && b.ts BETWEEN a.ts AND a.ts + gap)` gives Spark
  * only the equi-key to hash on, so every same-key pair is generated and
  * filtered. Binning timestamps to gap-sized buckets adds `(key, bin)` as a
  * real equi-join key: each left row probes exactly two bins (its own and
  * the next), so candidate volume is bounded by genuine temporal locality,
  * not key cardinality, and the shuffle is a plain hash exchange on
  * `(key, bin)` — the same trick Spark's own storage-partitioned interval
  * joins and DuckDB's IEJoin approximate.
  */
object RangeJoin {

  /** Pairs with equal `key` and `rightTs` in `[leftTs, leftTs + maxGapSec]`
    * (inclusive). Left columns come back as `lPrefix + name`, right as
    * `rPrefix + name`, plus `gap_us`.
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      maxGapSec: Long,
      lPrefix: String = "l_",
      rPrefix: String = "r_"): DataFrame = {
    require(maxGapSec > 0)
    val gapUs = maxGapSec * 1000000L
    // Exact floor-division bin: subtracting pmod makes the numerator an
    // exact multiple of gapUs, so the double division is exact (no
    // boundary misbinning from rounding ~1e15 microsecond values), and
    // pmod's non-negative remainder gives floor semantics pre-epoch too.
    def binOf(us: Column): Column =
      ((us - pmod(us, lit(gapUs))) / lit(gapUs)).cast("long")
    val l = left.select(
      left(key).as("_k"), unix_micros(left(leftTs)).as("_lt"),
      struct(left.columns.map(left(_)): _*).as("_l"))
      .withColumn("_probe", explode(array(binOf(col("_lt")), binOf(col("_lt")) + 1)))
    val r = right.select(
      right(key).as("_k2"), unix_micros(right(rightTs)).as("_rt"),
      struct(right.columns.map(right(_)): _*).as("_r"))
      .withColumn("_bin", binOf(col("_rt")))
    val joined = l.join(r,
      col("_k") === col("_k2") && col("_probe") === col("_bin") &&
        col("_rt") >= col("_lt") && col("_rt") <= col("_lt") + lit(gapUs))
    val lCols = left.columns.map(f => col("_l").getField(f).as(lPrefix + f))
    val rCols = right.columns.map(f => col("_r").getField(f).as(rPrefix + f))
    joined.select(lCols ++ rCols :+ (col("_rt") - col("_lt")).as("gap_us"): _*)
  }

  /** Interval OVERLAP join — pairs with equal `key` whose closed intervals
    * `[leftStart, leftEnd]` and `[rightStart, rightEnd]` intersect. The
    * naive plan is the same equi-key cartesian as [[within]]; here BOTH
    * sides are exploded to the `binSec`-sized bins their interval covers
    * and the join adds `(key, bin)` as a real equi-key. A pair whose
    * intervals overlap shares every bin the overlap touches, so it would
    * be emitted once per shared bin — the dedupe condition keeps only the
    * bin containing the overlap's START (`greatest(lStart, rStart)`), the
    * standard report-in-first-cell trick from partition-based spatial
    * joins. Candidate volume is bounded by interval length / binSec (pick
    * binSec near the typical interval length), and the shuffle is a plain
    * hash exchange on `(key, bin)` — no BNLJ at any scale.
    */
  def overlaps(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftStart: String,
      leftEnd: String,
      rightStart: String,
      rightEnd: String,
      binSec: Long,
      lPrefix: String = "l_",
      rPrefix: String = "r_"): DataFrame = {
    require(binSec > 0)
    val binUs = binSec * 1000000L
    def binOf(us: Column): Column =
      ((us - pmod(us, lit(binUs))) / lit(binUs)).cast("long")
    def side(df: DataFrame, s: String, e: String, kOut: String,
             sOut: String, eOut: String, rowOut: String): DataFrame =
      df.select(df(key).as(kOut),
          unix_micros(df(s)).as(sOut), unix_micros(df(e)).as(eOut),
          struct(df.columns.map(df(_)): _*).as(rowOut))
        .withColumn("_bin" + rowOut,
          explode(sequence(binOf(col(sOut)), binOf(col(eOut)))))
    val l = side(left, leftStart, leftEnd, "_k", "_ls", "_le", "_l")
    val r = side(right, rightStart, rightEnd, "_k2", "_rs", "_re", "_r")
    val joined = l.join(r,
      col("_k") === col("_k2") && col("_bin_l") === col("_bin_r") &&
        col("_ls") <= col("_re") && col("_rs") <= col("_le") &&
        // emit each overlapping pair exactly once: in the bin that
        // contains the overlap's start
        col("_bin_l") === binOf(greatest(col("_ls"), col("_rs"))))
    val lCols = left.columns.map(f => col("_l").getField(f).as(lPrefix + f))
    val rCols = right.columns.map(f => col("_r").getField(f).as(rPrefix + f))
    joined.select(lCols ++ rCols :+
      (least(col("_le"), col("_re")) - greatest(col("_ls"), col("_rs")))
        .as("overlap_us"): _*)
  }
}
