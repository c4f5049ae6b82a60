package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling / data-quality audits — the checks a pipeline runs on an
  * arriving drop before trusting it (beyond-reference: the reference
  * ingests embeddings it assumes well-formed; a 100 TB crawl never is).
  *
  * Both audits are single-aggregation shapes: the cost of profiling is one
  * pass over the columns profiled, never a per-column scan.
  */
object Profile {

  /** Per-column completeness profile: row count, null count, exact
    * distinct count. ONE aggregation job — Spark plans the multi-column
    * `count(DISTINCT ...)` set via a single Expand (each input row is
    * replicated once per profiled column map-side, then one shuffle of the
    * partial aggregates), so the table is READ once regardless of how many
    * columns are profiled. The long-form output comes from a `stack` over
    * the one aggregate row — driver-side cost is one row.
    *
    * Exact distincts keep DuckDB-oracle parity; at 100 TB the Expand
    * multiplies map-side rows by the column count, and the approximate
    * alternative is one [[Sketches.hllCardinality]] pass per column batch
    * (constant state, no Expand) when ±2 % suffices.
    */
  def completeness(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"__cnt_$c"),
      countDistinct(col(c)).as(s"__dst_$c"))) :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', __cnt_$c, __dst_$c").mkString(", ")
    one.select(col("__n").as("n_rows"),
        expr(s"stack(${cols.size}, $stackArgs) AS (col_name, n_non_null, n_distinct)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_nulls"), col("n_distinct"))
  }

  /** Referential-integrity audit: child keys with no parent. The orphan
    * probe is a LEFT ANTI join on the key — at scale a broadcast of the
    * parent key set when it fits, a shuffled semi-join otherwise (left to
    * AQE); the audit result is one row, so this composes into ingest
    * gates ("reject the drop if orphan_rate > 0").
    */
  def orphanAudit(child: DataFrame, childKey: Column,
                  parent: DataFrame, parentKey: Column): DataFrame = {
    val orphans = child.select(childKey.as("__k"))
      .join(parent.select(parentKey.as("__k")), Seq("__k"), "left_anti")
    val nChild = child.select(childKey.as("__k"))
    nChild.agg(count(lit(1)).as("n_children"))
      .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
      .select(col("n_children"), col("n_orphans"),
        round(col("n_orphans").cast("double") / col("n_children"), 6)
          .as("orphan_rate"))
  }
}
