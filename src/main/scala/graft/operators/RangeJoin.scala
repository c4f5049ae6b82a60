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
}
