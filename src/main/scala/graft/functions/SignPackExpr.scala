package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-bit packing of a numeric vector into ARRAY<BIGINT> words: bit j of
  * word w is set iff `v[64w + j] ≥ 0` — the columnar twin of
  * [[graft.operators.Quantized.binarizeVecWords]] (same word/bit order).
  *
  * Exists because the Column spelling — ⌈dim/64⌉ sums of 64
  * `when(element_at(v, i) ≥ 0, 1L << j)` terms — builds an O(dim)-node
  * Catalyst tree (~4k nodes at 512-d) that costs more to analyze/codegen
  * per query than the scan itself executes; this is one node emitting one
  * tight loop. Accepts ARRAY<FLOAT> or ARRAY<DOUBLE>; -0.0 and NaN compare
  * via `≥ 0` exactly like the `when` form it replaces (IEEE: -0.0 ≥ 0 is
  * true, NaN ≥ 0 is false).
  */
case class SignPackExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"sign_pack requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (x >= 0) out(i >> 6) |= 1L << (i & 63)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val x = ctx.freshName("x")
      val getter = if (isFloat) s"(double) $v.getFloat($i)" else s"$v.getDouble($i)"
      s"""
         |int $n = $v.numElements();
         |long[] $out = new long[($n + 63) / 64];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getter;
         |  if ($x >= 0) $out[$i >> 6] |= 1L << ($i & 63);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_sign_pack"
}
