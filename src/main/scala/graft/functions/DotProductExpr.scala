package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric array columns — the fused
  * kernel replacing `aggregate(zip_with(a, b, _*_), 0.0, _+_)`.
  *
  * Why it exists (SURVEY §4, BLAS row): the HOF form materializes an
  * intermediate array per row and walks it with interpreted lambda calls; on
  * an O(n²) similarity join that's the whole runtime. This expression
  * compiles to a bare `for` loop over the unsafe array data — no
  * allocations, no virtual calls — inside whole-stage codegen, the closest
  * Spark gets to the reference's BLAS kernel
  * (/root/reference/minivectordb/vector_database.py:497).
  *
  * Accumulation is a sequential left-to-right double sum — bit-identical to
  * both the HOF fold it replaces and DuckDB's `list_dot_product` /
  * `list_cosine_similarity` evaluation order, so swapping it in changes no
  * query result (oracle parity holds).
  *
  * Accepts FLOAT or DOUBLE element types directly (no array cast/copy on
  * the float path — elements widen scalar-wise in the loop).
  */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private val supported: Set[DataType] =
    Set(FloatType, DoubleType, ByteType, ShortType, IntegerType, LongType)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if supported(a) && supported(b) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two numeric array arguments, got $other")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  private def getterName(t: DataType): String = t match {
    case FloatType => "getFloat"
    case DoubleType => "getDouble"
    case ByteType => "getByte"
    case ShortType => "getShort"
    case IntegerType => "getInt"
    case LongType => "getLong"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  private def read(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case ByteType => arr.getByte(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (tx, ty) = (elemType(left), elemType(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      s += read(x, i, tx) * read(y, i, ty)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getX = getterName(elemType(left))
    val getY = getterName(elemType(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$getX($i)) * ((double) $b.$getY($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}
