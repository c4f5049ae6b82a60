package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Bloom filter over 64-bit fingerprints — the compact-broadcast membership
  * structure for screening a corpus against a gram/id blocklist too large to
  * ship as an exact set (at 1 % fpp the filter is ~1.2 bytes per item vs 8+
  * for the raw fingerprints, and OR-mergeable so it builds in one
  * map-side-combined aggregation pass with no shuffle of the items).
  *
  * No false negatives by construction, so a two-phase screen (bloom
  * prefilter at the scan → exact verify join on the survivors only) returns
  * the EXACT answer while the big join touches ~fpp of the clean rows.
  * The bit space is a power of two: probes mask instead of mod, and two
  * filters of equal dims OR together losslessly (union of the sets).
  *
  * Probes use double hashing (Kirsch–Mitzenmacher): index_i = h1 + i·h2
  * over the 64-bit fingerprint, h2 forced odd so successive probes walk the
  * whole power-of-two space. The input is already a fingerprint (uniform
  * bits), so h1 is the value itself and h2 a golden-ratio mix of it.
  */
object Bloom {

  /** (words, numHashes) for `n` expected items at target fpp `p`:
    * m = n·ln(1/p)/ln²2 bits rounded UP to a power-of-two word count,
    * k = round(ln2 · m/n) probes (clamped to [1, 16]).
    */
  def dims(n: Long, p: Double): (Int, Int) = {
    require(p > 0 && p < 1, s"fpp must be in (0,1): $p")
    val items = math.max(1L, n)
    val mBits = math.max(64.0, math.ceil(items * math.log(1 / p) / (math.log(2) * math.log(2))))
    val raw = ((mBits.toLong + 63) / 64).toInt
    val numWords = if (raw <= 1) 1 else Integer.highestOneBit(raw - 1) << 1
    val k = math.round(math.log(2) * numWords * 64.0 / items).toInt
    (numWords, math.max(1, math.min(16, k)))
  }

  /** i-th probe bit index in [0, words·64). Shared by set and test (and by
    * interpreted and generated code), so the contract is one function.
    */
  def probe(fp: Long, i: Int, mask: Long): Int = {
    val h2 = (fp * 0x9E3779B97F4A7C15L ^ (fp >>> 32)) | 1L
    ((fp + i.toLong * h2) & mask).toInt
  }

  def set(words: Array[Long], fp: Long, k: Int): Unit = {
    val mask = words.length.toLong * 64 - 1
    var i = 0
    while (i < k) {
      val idx = probe(fp, i, mask)
      words(idx >>> 6) |= (1L << idx)
      i += 1
    }
  }

  def mightContain(words: Array[Long], fp: Long, k: Int): Boolean = {
    val mask = words.length.toLong * 64 - 1
    var i = 0
    while (i < k) {
      val idx = probe(fp, i, mask)
      if ((words(idx >>> 6) & (1L << idx)) == 0L) return false
      i += 1
    }
    true
  }

  /** `∃ fp ∈ fps: mightContain(words, fp, k)` — the per-ROW filter probe
    * kernel: a sidecar row carries its file's word array, the (small)
    * tombstone fingerprint set rides along as a task reference object, and
    * the whole membership test runs where the sidecar rows live
    * ([[BloomAnyMightContainExpr]]) instead of collecting MB-scale word
    * arrays to the driver.
    */
  def anyMightContain(words: Array[Long], fps: Array[Long], k: Int): Boolean = {
    var i = 0
    while (i < fps.length) {
      if (mightContain(words, fps(i), k)) return true
      i += 1
    }
    false
  }

  /** splitmix64 finalizer: turns a structured 64-bit value (sequential ids,
    * timestamps) into the uniform fingerprint the probe schedule assumes.
    * Defined ONCE with a Column twin ([[mix64Col]]) so the distributed
    * build and a driver-side probe compute identical bits.
    */
  def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Column twin of [[mix64]] via [[Mix64Expr]] — a native codegen node,
    * NOT Column arithmetic: the finalizer's multiplications wrap mod 2^64
    * by design, which ANSI-mode (Spark 4 default) long multiply rejects as
    * overflow; Java long arithmetic inside the expression wraps natively
    * and identically to the driver-side [[mix64]].
    */
  def mix64Col(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.Bridge.column(
      Mix64Expr(org.apache.spark.sql.graft.Bridge.expression(c.cast("long"))))
}

/** splitmix64 finalizer as one codegen node (see [[Bloom.mix64Col]]). */
case class Mix64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"graft_mix64 requires BIGINT, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Bloom.mix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.Bloom.mix64($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_mix64"
}

/** `fp IN bloom` as one codegen node over the filter's word array (a task
  * reference object — shipped once per executor with the task binary, like
  * a broadcast variable, NOT per row). BIGINT → BOOLEAN; false ⇒ definitely
  * absent, true ⇒ verify exactly downstream.
  */
case class BloomMightContainExpr(child: Expression, words: Array[Long], numHashes: Int)
    extends UnaryExpression {

  require(words.nonEmpty && (words.length & (words.length - 1)) == 0,
    s"bloom word count must be a power of two: ${words.length}")
  require(numHashes >= 1)

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(s"bloom_might_contain requires BIGINT, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Bloom.mightContain(words, input.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.Bloom.mightContain($ref, $v, $numHashes)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_bloom_might_contain"
}

/** `any(fp IN bloom for fp in fps)` where the BLOOM is the per-row value
  * (ARRAY<BIGINT> words + INT k from a sidecar row) and `fps` is a small
  * fixed fingerprint set shipped once per task as a reference object — the
  * mirror image of [[BloomMightContainExpr]], built for the sidecar probe:
  * filters file rows distributed, so only matching file NAMES ever reach
  * the driver. False ⇒ no fp can be in the file; true ⇒ rewrite verifies.
  */
case class BloomAnyMightContainExpr(wordsExpr: Expression, kExpr: Expression,
    fps: Array[Long]) extends BinaryExpression {

  override def left: Expression = wordsExpr
  override def right: Expression = kExpr
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (wordsExpr.dataType, kExpr.dataType) match {
      case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_any_might_contain requires (ARRAY<BIGINT>, INT), got $other")
    }

  override def nullSafeEval(words: Any, k: Any): Any =
    Bloom.anyMightContain(
      words.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray(),
      fps, k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFps", fps, "long[]")
    defineCodeGen(ctx, ev, (w, k) =>
      s"graft.functions.Bloom.anyMightContain($w.toLongArray(), $ref, $k)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(wordsExpr = newLeft, kExpr = newRight)

  override def prettyName: String = "graft_bloom_any_might_contain"
}

/** Distributed Bloom build: fold fingerprints into the word array per
  * partition, OR-merge across partitions — one aggregation with map-side
  * partial combine, so the items never shuffle (only ≤P partial filters
  * do). The buffer is the filter itself; OR is associative/commutative/
  * idempotent, so the result is partitioning-invariant.
  */
class BloomBitsAgg(numWords: Int, numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](numWords)

  override def reduce(b: Array[Long], fp: Long): Array[Long] = {
    Bloom.set(b, fp, numHashes); b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
