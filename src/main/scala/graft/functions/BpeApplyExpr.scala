package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apply a ranked BPE merge table to a space-joined symbol state in ONE
  * expression — the production batch-encode kernel
  * ([[graft.operators.TextAnalysis.bpeEncode]]). Replaces the chained
  * per-merge column rewrite (N `aggregate` folds with a lineage cut every
  * 8) whose plan depth grew with the merge count: a real tokenizer ships
  * ~32k merges, and 32k chained folds is 4,000 checkpoints before the
  * first row is encoded.
  *
  * Semantics are EXACTLY sequential rank-order application (the pinned
  * reference apply-BPE contract, Sennrich et al. 2016): for each merge in
  * rank order, one greedy non-overlapping left-to-right rewrite. The
  * kernel skips the no-op rounds: it repeatedly finds the LOWEST-rank
  * pair present in the word ABOVE the last applied rank and rewrites it —
  * identical output (the state is unchanged across skipped rounds, so the
  * next non-no-op round is precisely that minimum), but the cost is
  * O(symbols²) per word INDEPENDENT of merge-table depth, because each
  * applied merge shortens the word by at least one symbol. Duplicate pair
  * strings in the table (legal for the fold form) keep per-pair rank
  * LISTS, so each duplicate rank fires at its own turn.
  */
case class BpeApplyExpr(child: Expression, merges: Array[String])
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bpe_apply requires STRING, got $other")
  }

  @transient private lazy val table = BpeApplyExpr.Table(merges)

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      BpeApplyExpr.rewrite(input.asInstanceOf[UTF8String].toString, table))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef =
      ctx.addReferenceObj("bpeTable", table, classOf[BpeApplyExpr.Table].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.BpeApplyExpr.rewrite($c.toString(), $tableRef))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bpe_apply"
}

object BpeApplyExpr {

  /** Precompiled merge table: per-pair ascending rank lists plus the
    * rank-indexed (left, right, merged) symbol arrays. Built once on the
    * driver, shipped as a codegen reference object.
    */
  final case class Table(merges: Array[String]) extends Serializable {
    val xs = new Array[String](merges.length)
    val ys = new Array[String](merges.length)
    val ms = new Array[String](merges.length)
    val ranks = new java.util.HashMap[String, Array[Int]]()
    merges.zipWithIndex.foreach { case (pr, r) =>
      val sp = pr.indexOf(' ')
      require(sp > 0 && sp < pr.length - 1, s"merge pair must be 'x y': '$pr'")
      xs(r) = pr.substring(0, sp)
      ys(r) = pr.substring(sp + 1)
      ms(r) = xs(r) + ys(r)
      val prev = ranks.get(pr)
      ranks.put(pr, if (prev == null) Array(r) else prev :+ r)
    }
  }

  /** Shared kernel (interpreted and generated code): sequential
    * rank-order BPE application with no-op rounds skipped.
    */
  def rewrite(state: String, t: Table): String = {
    if (t.merges.isEmpty) return state
    val toks = state.split(" ")
    var n = toks.length
    if (n < 2) return state
    var floor = -1
    while (true) {
      // the next non-no-op round: min rank > floor among adjacent pairs
      var best = Int.MaxValue
      var i = 0
      while (i < n - 1) {
        val rs = t.ranks.get(toks(i) + " " + toks(i + 1))
        if (rs != null) {
          var j = 0
          while (j < rs.length && rs(j) <= floor) j += 1
          if (j < rs.length && rs(j) < best) best = rs(j)
        }
        i += 1
      }
      if (best == Int.MaxValue) {
        val sb = new java.lang.StringBuilder(toks(0))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(k)); k += 1 }
        return sb.toString
      }
      floor = best
      n = mergePass(toks, n, t.xs(best), t.ys(best), t.ms(best))
      if (n < 2) return toks(0)
    }
    state // unreachable
  }

  /** One greedy non-overlapping left-to-right merge of (x, y) → merged
    * over the first `n` slots of `toks`, in place; returns the new length.
    * The array-walk twin of the `mergeFold` column (the merged symbol is
    * written and the walk continues PAST it, so a fresh `merged` can never
    * be the left side of a same-pass merge — same as the fold, whose
    * last-appended check can't match because x‖y ≠ x).
    */
  def mergePass(toks: Array[String], n: Int, x: String, y: String,
      merged: String): Int = {
    var w = 0
    var i = 0
    while (i < n) {
      if (i < n - 1 && toks(i) == x && toks(i + 1) == y) {
        toks(w) = merged; i += 2
      } else {
        toks(w) = toks(i); i += 1
      }
      w += 1
    }
    w
  }
}
