package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Decode a canonical JSON *string* fragment (`"…"` with standard escapes)
  * to its raw string value — null for any non-string fragment (numbers,
  * bools, arrays, objects), which doubles as the type gate.
  *
  * Why: the filter DSL's string range operators (`$gt`/`$lt` on strings,
  * reference vector_database.py:166-173 — raw Python string comparison)
  * previously compared quoted fragments lexicographically, which is correct
  * only when no escape sequence is present (`\"` sorts as backslash, not as
  * the quote it encodes). Decoding both sides to raw strings restores
  * reference semantics for metadata containing quotes, backslashes,
  * newlines, or non-BMP escapes.
  */
case class JsonStrDecodeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"json_str_decode requires STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    JsonStrDecodeExpr.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // decode() may return null for a non-null input (non-string fragment),
    // so the default defineCodeGen (which assumes null-in ⇒ null-out only)
    // needs the extra isNull propagation
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.JsonStrDecodeExpr.decode($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_json_str_decode"
}

object JsonStrDecodeExpr {
  /** Shared kernel (interpreted + generated code). Hand-rolled decoder over
    * the canonical fragments [[JsonMeta]] emits (Jackson writeValueAsString);
    * property-pinned against Jackson's own reader in PropertySpec.
    */
  def decode(frag: UTF8String): UTF8String = {
    if (frag == null) return null
    val s = frag.toString
    val n = s.length
    if (n < 2 || s.charAt(0) != '"' || s.charAt(n - 1) != '"') return null
    if (s.indexOf('\\') < 0) return UTF8String.fromString(s.substring(1, n - 1))
    val sb = new java.lang.StringBuilder(n - 2)
    var i = 1
    while (i < n - 1) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n - 1) {
        i += 1
        s.charAt(i) match {
          case '"' => sb.append('"')
          case '\\' => sb.append('\\')
          case '/' => sb.append('/')
          case 'b' => sb.append('\b')
          case 'f' => sb.append('\f')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case 't' => sb.append('\t')
          case 'u' if i + 4 < n =>
            sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
            i += 4
          case other => sb.append(other)
        }
      } else sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}
