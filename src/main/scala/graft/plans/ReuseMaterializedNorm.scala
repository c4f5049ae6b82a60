package graft.plans

import graft.functions.DotProductExpr
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Catalyst optimizer rule: rewrite `graft_dot(v, v)` — a self dot product,
  * i.e. a squared L2 norm — into a reference to the store's MATERIALIZED
  * `norm_sq` column whenever that column is available in the same scope.
  *
  * The store schema computes `norm_sq` once at ingest
  * ([[graft.sources.VectorStore.ingest]], the index-build analog, SURVEY
  * §1.2); this rule makes the materialization transparent: any query that
  * recomputes the norm — hand-written SQL (`graft_dot(embedding,
  * embedding)`), a generic scoring helper, a rerank pipeline — silently
  * reuses the stored value instead of folding over the array per row. At
  * 100 TB this is the difference between reading an 8-byte column and
  * re-walking a 256-byte array on every row of every query.
  *
  * Safety: the rewrite fires only when (a) both dot arguments are the SAME
  * attribute (semantic equality — a true self-product), and (b) an
  * attribute literally named `norm_sq` of DoubleType is present on the
  * child's output (the store schema's contract that it was ingest-derived
  * from `embedding`). Plans that alias or drop `norm_sq` are left alone.
  *
  * Mounting: ANALYZER post-hoc resolution (GraftExtensions), not the
  * optimizer — by optimizer time, CollapseProject + column pruning have
  * already erased the unused `norm_sq` from the lineage, so the rewrite
  * must run while the full ingest projection is still visible. Running
  * before pruning also means the optimizer can then drop the embedding
  * column from the scan entirely when only the norm is consumed.
  */
object ReuseMaterializedNorm extends Rule[LogicalPlan] {

  private val NormColumn = "norm_sq"
  private val VectorColumn = "embedding"

  private def normAttr(child: LogicalPlan): Option[Attribute] =
    child.output.find(a => a.name == NormColumn && a.dataType == DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case node: LogicalPlan if node.children.length == 1 =>
      normAttr(node.children.head) match {
        case Some(norm) =>
          node.transformExpressions {
            case DotProductExpr(a: AttributeReference, b: AttributeReference)
                if a.semanticEquals(b) && a.name == VectorColumn =>
              norm
          }
        case None => node
      }
  }
}
