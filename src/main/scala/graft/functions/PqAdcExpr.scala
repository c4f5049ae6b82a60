package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance computation (ADC) for product-quantized search
  * (Jégou, Douze, Schmid, "Product quantization for nearest neighbor
  * search", TPAMI 2011): the approximate L2² of a row against the query is
  * `Σ_j lut(j·ks + code_j)` — one table lookup per subspace, no float math
  * per row beyond the adds. The per-query lookup table (|c|² − 2·q_j·c per
  * subspace × code, the |q|²-constant dropped as rank-invariant) is built
  * ONCE on the driver ([[graft.operators.Pq.lut]]) and rides the expression
  * as a reference object, exactly like the centroid matrix in
  * [[NearestCentroidExpr]].
  *
  * One codegen node so the scan stays in whole-stage codegen: the scored
  * pass over a 100 TB code table reads `m` bytes per row and does `m` array
  * indexes — the point of PQ is that this, not the float corpus, is the
  * per-query scan.
  */
case class PqAdcExpr(child: Expression, lut: Array[Double], ks: Int)
    extends UnaryExpression {

  require(ks > 0 && lut.length % ks == 0, "lut must be m*ks entries")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ByteType | ShortType | IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"pq_adc requires ARRAY<integral>, got $other")
  }

  @transient private lazy val elemType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(input: Any): Any =
    PqAdcExpr.adc(input.asInstanceOf[ArrayData], elemTag, lut, ks)

  private def elemTag: Int = elemType match {
    case ByteType => 0
    case ShortType => 1
    case _ => 2
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutRef = ctx.addReferenceObj("pqLut", lut, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqAdcExpr.adc($c, $elemTag, $lutRef, $ks)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pq_adc"
}

object PqAdcExpr {

  /** Shared kernel (interpreted and generated paths): left-to-right Double
    * accumulation over the subspaces, so the engine-side sum order is fixed
    * and oracle-replicable. Byte/short codes are decoded UNSIGNED — the
    * storage convention of [[graft.operators.Pq.encode]], which packs
    * ks ≤ 256 codebooks into TINYINT (a ks=256 codebook stores codes
    * 128..255 as negative bytes; a signed read would index out of the LUT
    * or into the previous subspace's entries). An out-of-range code
    * (corrupt input) still indexes out of the LUT — caller guarantees codes
    * come from encode.
    */
  def adc(codes: ArrayData, elemTag: Int, lut: Array[Double], ks: Int): Double = {
    val m = codes.numElements()
    var acc = 0.0
    var j = 0
    while (j < m) {
      val code = elemTag match {
        case 0 => codes.getByte(j) & 0xff
        case 1 => codes.getShort(j) & 0xffff
        case _ => codes.getInt(j)
      }
      acc += lut(j * ks + code)
      j += 1
    }
    acc
  }
}
