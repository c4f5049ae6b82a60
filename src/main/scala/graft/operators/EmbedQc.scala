package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quality control: distance-to-centroid outlier scoring — the
  * pre-training screen that catches mislabeled/corrupt vectors (an
  * embedding far from its own label's centroid is either noise or a label
  * error, and both poison contrastive training batches).
  *
  * Scale shape: the per-label centroids are ONE map-side-combined
  * aggregation (a (sum-vector, count) buffer per label — labels are few)
  * broadcast back against the corpus; squared distance expands to
  * `|v|² − 2·v·c + |c|²` so the per-row work is two fused dot kernels
  * against the broadcast row, no posexplode. The per-label mean/std of the
  * distance is a second small aggregation over (label, dist) — the corpus
  * shuffles NOTHING wider than an 8-byte double through it — and the final
  * top-k is a TakeOrderedAndProject, not a global sort.
  *
  * Determinism contract: centroids are rounded to 6 dp BEFORE the distance
  * computation, pinning the float boundary on both engine sides (an
  * unrounded mean's last-ulp shuffle-order drift would propagate through
  * dist → z → the selection boundary); z is rounded before the final
  * ordering with an id tie-break.
  */
object EmbedQc {

  /** Per-row (id, label, 6-dp dist, 6-dp z) against the row's own-label
    * centroid — the shared core of [[outliers]] (rank view) and
    * [[zScreen]] (gate view).
    */
  def zScored(embs: DataFrame, id: Column, vec: Column, label: Column): DataFrame = {
    val cents = embs.groupBy(label.as("lbl"))
      .agg(graft.functions.VectorAggs.vectorMean(vec).as("c0"))
      .select(col("lbl"), transform(col("c0"), x => round(x, 6)).as("c"))
    val d2 =
      VF.normSq(col("v")) - lit(2.0) * VF.dot(col("v"), col("c")) + VF.normSq(col("c"))
    val dists = embs.select(id.as("id"), label.as("lbl"), vec.as("v"))
      .join(broadcast(cents), Seq("lbl"))
      .select(col("id"), col("lbl"), sqrt(greatest(d2, lit(0.0))).as("dist"))
    val stats = dists.groupBy("lbl")
      .agg(avg(col("dist")).as("mu"), stddev_pop(col("dist")).as("sigma"))
    // sigma = 0 (singleton or all-identical label) ⇒ every member sits at
    // the mean ⇒ z = 0 by convention. Without the guard Spark's non-ANSI
    // x/0 yields NULL and the whole label silently falls out of zScreen
    // (and NaN sorts differently across engines in the outlier ranking).
    dists.join(broadcast(stats), Seq("lbl"))
      .select(col("id"), col("lbl"), round(col("dist"), 6).as("dist"),
        when(col("sigma") === 0, lit(0.0))
          .otherwise(round((col("dist") - col("mu")) / col("sigma"), 6)).as("z"))
  }

  def outliers(embs: DataFrame, id: Column, vec: Column, label: Column,
      k: Int): DataFrame =
    zScored(embs, id, vec, label)
      .orderBy(col("z").desc, col("id").asc)
      .limit(k)

  /** Keep-gate view: rows whose rounded z is within `zMax` (the screen a
    * pipeline applies before training; the comparison runs on the ROUNDED
    * z so the keep boundary is engine-stable).
    */
  def zScreen(embs: DataFrame, id: Column, vec: Column, label: Column,
      zMax: Double): DataFrame =
    zScored(embs, id, vec, label).filter(col("z") <= zMax)
}
