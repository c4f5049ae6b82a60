package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Char n-gram (1–6) SIGNED-hash feature vector with a DETERMINISTIC
  * polynomial hash — the oracle-replicable twin of
  * [[TextFeatures.charNgramHash]] (whose MurmurHash3 kernel has no SQL
  * spelling). Same published construction — signed feature hashing
  * (Weinberger et al., 2009) over lowercase char n-grams, L2-normalized —
  * with bucket = `h mod 64` and sign = parity of `h / 64`, both integer
  * functions of the rolling polynomial hash (base 31 mod 1e9+7,
  * [[PolyHashExpr.hash]]) that replicate verbatim in DuckDB list algebra.
  *
  * Output is ARRAY<DOUBLE> (not FLOAT) so the normalize/divide arithmetic is
  * bit-identical to the SQL replica with no float round-trip.
  */
case class NgramPolyHashVecExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"ngram_polyhash_vec requires STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      NgramPolyHashVecExpr.features(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.NgramPolyHashVecExpr.features($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_ngram_polyhash_vec"
}

object NgramPolyHashVecExpr {
  val Dims = 64
  val MinGram = 1
  val MaxGram = 6
  val Base = 31L
  val Mod = 1000000007L

  /** Shared kernel (column side, generated code, and the driver-side query
    * embedding): lowercase, all char n-grams n ∈ [1, 6], each gram hashed
    * once, ±1 into bucket `h mod 64` with sign `(h / 64) even ⇒ +1`,
    * L2-normalized (zero vector stays zero).
    */
  def features(text: String): Array[Double] = {
    val v = new Array[Double](Dims)
    if (text != null) {
      val t = text.toLowerCase
      var n = MinGram
      while (n <= MaxGram) {
        var i = 0
        val last = t.length - n
        while (i <= last) {
          val h = PolyHashExpr.hash(t.substring(i, i + n), Base, Mod)
          val b = (h % Dims).toInt
          v(b) += (if ((h / Dims) % 2 == 0) 1.0 else -1.0)
          i += 1
        }
        n += 1
      }
    }
    var ss = 0.0
    var i = 0
    while (i < Dims) { ss += v(i) * v(i); i += 1 }
    if (ss > 0) {
      val norm = math.sqrt(ss)
      var j = 0
      while (j < Dims) { v(j) = v(j) / norm; j += 1 }
    }
    v
  }
}
