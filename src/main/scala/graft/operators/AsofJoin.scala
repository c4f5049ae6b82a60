package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-timestamp) join — the time-series operator Spark lacks as a
  * built-in and engines like DuckDB/Pandas expose as `ASOF JOIN` /
  * `merge_asof`. For every left row `(k, t)` it attaches the right row with
  * the same key and the greatest `t' <= t` (backward; least `t' >= t`
  * forward).
  *
  * Implementation is a single-shuffle union-merge, not a join: tag each side,
  * union on an aligned internal schema, then one window per key ordered by
  * `(t, side)` carries the most recent right payload forward with
  * `last(_, ignoreNulls)`. Compared to the naive
  * `join + filter + row_number` shape this never materializes the O(left ×
  * right-per-key) pair blow-up, shuffles each input exactly once (hash on
  * key — the same co-partitioning a merge join would use), and scales to any
  * number of rows per key that fits a partition sort. Skewed keys follow the
  * usual remedy: pre-split hot keys into time-sliced sub-keys.
  *
  * Right rows sort before left rows at an equal timestamp, so an exactly
  * simultaneous right row matches (`<=`, like DuckDB ASOF). Ties among right
  * rows on `(k, t)` break deterministically: the largest `tieBreak` wins
  * backward, the smallest wins forward.
  */
object AsofJoin {

  /** Backward as-of: latest right row with `rightTs <= leftTs`, per key.
    * Unmatched left rows keep null right fields (left-outer semantics).
    * Right columns are exposed as `rightPrefix + name`.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      rightPrefix: String = "r_"): DataFrame =
    merge(left, right, key, leftTs, rightTs, tieBreak, rightPrefix, forward = false)

  /** Forward as-of: earliest right row with `rightTs >= leftTs`, per key. */
  def forward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      rightPrefix: String = "r_"): DataFrame =
    merge(left, right, key, leftTs, rightTs, tieBreak, rightPrefix, forward = true)

  private def merge(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      tieBreak: String,
      rightPrefix: String,
      forward: Boolean): DataFrame = {
    val leftStruct = struct(left.columns.map(left(_)): _*)
    val rightStruct = struct(right.columns.map(right(_)): _*)
    val lPart = left.select(
      left(key).as("_k"), left(leftTs).as("_t"), lit(1).as("_side"),
      lit(null).cast(right.schema(tieBreak).dataType).as("_tb"),
      leftStruct.as("_l"),
      lit(null).cast(org.apache.spark.sql.types.StructType(right.schema.fields)).as("_r"))
    val rPart = right.select(
      right(key).as("_k"), right(rightTs).as("_t"), lit(0).as("_side"),
      right(tieBreak).as("_tb"),
      lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields)).as("_l"),
      rightStruct.as("_r"))
    // Backward scans time ascending (carry the latest right row seen so
    // far); forward scans descending (carry the earliest upcoming right
    // row). Either way right rows at the boundary timestamp order before
    // the left row, making the comparison inclusive.
    val ord: Seq[Column] =
      if (forward) Seq(col("_t").desc, col("_side").asc, col("_tb").desc)
      else Seq(col("_t").asc, col("_side").asc, col("_tb").asc)
    val w = Window.partitionBy("_k").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRight = last(col("_r"), ignoreNulls = true).over(w)
    val out = lPart.unionByName(rPart)
      .withColumn("_m", matchedRight)
      .filter(col("_side") === 1)
    val rightCols = right.columns.map(f => col("_m").getField(f).as(rightPrefix + f))
    out.select(col("_l.*") +: rightCols: _*)
  }
}
