package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-bit packing of a numeric vector into ARRAY<BIGINT> words: bit j of
  * word w is set iff NOT `v[64w + j] < 0` — the columnar twin of
  * [[graft.operators.Quantized.binarizeVecWords]] (same word/bit order).
  *
  * Exists because the Column spelling — ⌈dim/64⌉ sums of 64
  * `when(element_at(v, i) ≥ 0, 1L << j)` terms — builds an O(dim)-node
  * Catalyst tree (~4k nodes at 512-d) that costs more to analyze/codegen
  * per query than the scan itself executes; this is one node emitting one
  * tight loop. Accepts ARRAY<FLOAT> or ARRAY<DOUBLE>. The bit test is
  * spelled `!(x < 0)` so NaN sets its bit — matching BOTH the Spark SQL
  * comparison semantics of the `when(x ≥ 0)` form it replaced (Spark
  * orders NaN above every value, so NaN ≥ 0 was TRUE there) and the DuckDB
  * oracle replica; a bare Java `x ≥ 0` would silently flip NaN bits.
  * -0.0 sets its bit under either spelling.
  *
  * `minWords` pads the output with zero words up to a fixed width — the
  * old when-chain always emitted ⌈dim/64⌉ words (absent elements packed as
  * 0 bits), and Hamming kernels iterate the MIN length of the two sides,
  * so a short vector must not silently shrink the word count.
  */
case class SignPackExpr(child: Expression, minWords: Int = 0) extends UnaryExpression {

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
    val out = new Array[Long](math.max((n + 63) / 64, minWords))
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      if (!(x < 0)) out(i >> 6) |= 1L << (i & 63)
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
         |long[] $out = new long[java.lang.Math.max(($n + 63) / 64, $minWords)];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $getter;
         |  if (!($x < 0)) $out[$i >> 6] |= 1L << ($i & 63);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_sign_pack"
}
