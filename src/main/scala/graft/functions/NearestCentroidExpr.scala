package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid assignment `argmin_j (|c_j|² − 2·v·c_j)` with ties to
  * the smaller centroid id — the IVF/k-means assignment kernel as ONE
  * codegen node over a literal centroid matrix.
  *
  * Exists because the Column spelling — `array_min(array(C structs))`, each
  * struct holding its own fused dot product — leaves whole-stage codegen
  * once C grows (measured on this corpus: C=32 assigns 30k rows in 1.2 s,
  * C=48 in 8.2 s — the generated method blows the JVM size limit and the
  * plan falls back to interpreted evaluation, a 7× cliff exactly where a
  * production centroid count starts). Arithmetic is identical to the struct
  * form: per-centroid dot accumulated left-to-right in Double
  * ([[DotProductExpr]] order), distance `|c|² − 2·v·c` with the centroid
  * norm precomputed once, lexicographic (distance, cid) minimum.
  */
case class NearestCentroidExpr(
    child: Expression,
    cents: Array[Array[Double]],
    cids: Array[Long]) extends UnaryExpression {

  require(cents.nonEmpty && cents.length == cids.length)

  override def dataType: DataType = LongType

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val normSqs: Array[Double] = NearestCentroidExpr.norms(cents)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"nearest_centroid requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    NearestCentroidExpr.assign(
      input.asInstanceOf[ArrayData], isFloat, cents, normSqs, cids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("centroids", cents, "double[][]")
    val normsRef = ctx.addReferenceObj("centroidNorms", normSqs, "double[]")
    val cidsRef = ctx.addReferenceObj("centroidIds", cids, "long[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.NearestCentroidExpr.assign($v, $isFloat, $centsRef, $normsRef, $cidsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nearest_centroid"
}

object NearestCentroidExpr {

  def norms(cents: Array[Array[Double]]): Array[Double] =
    cents.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    }

  /** Shared kernel (interpreted eval and generated code): lexicographic
    * (distance, cid) minimum, dot accumulated left-to-right in Double.
    * Comparison goes through `java.lang.Double.compare` so a NaN distance
    * sorts LAST (as in the `array_min(struct)` ordering this replaced) —
    * a bare `<`/`==` pair would let a NaN from centroid 0 poison the whole
    * argmin (every later comparison false ⇒ first centroid always wins).
    */
  def assign(
      v: ArrayData,
      isFloat: Boolean,
      cents: Array[Array[Double]],
      normSqs: Array[Double],
      cids: Array[Long]): Long = {
    var bestD = 0.0
    var bestC = 0L
    var first = true
    var j = 0
    while (j < cents.length) {
      val c = cents(j)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        acc += x * c(i)
        i += 1
      }
      val d = normSqs(j) - 2.0 * acc
      val cmp = if (first) -1 else java.lang.Double.compare(d, bestD)
      if (cmp < 0 || (cmp == 0 && cids(j) < bestC)) {
        bestD = d; bestC = cids(j); first = false
      }
      j += 1
    }
    bestC
  }
}
