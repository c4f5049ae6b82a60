package graft

import graft.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native kernels: registers each custom
  * Catalyst expression as a SQL function, so the full engine is reachable
  * from `spark.sql(...)` — e.g.
  *
  * {{{
  *   SELECT id FROM vectors
  *   ORDER BY graft_dot(embedding, array(0.1F, ...)) DESC LIMIT 10
  * }}}
  *
  * Two mounting points:
  *  - config-time: `spark.sql.extensions=graft.GraftExtensions` (the
  *    standard extensions hook — works for sessions the library doesn't
  *    create);
  *  - runtime: `GraftExtensions.register(spark)` on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // analyzer phase: must see the full ingest lineage BEFORE column
    // pruning erases the materialized norm (see ReuseMaterializedNorm docs)
    ext.injectPostHocResolutionRule(_ => graft.plans.ReuseMaterializedNorm)
    // optimizer phase: interleaves with PushDownPredicates +
    // UnwrapCastInBinaryComparison in the fixed-point batch so metadata
    // predicates over literal-keyed kv maps reach the Parquet scan
    ext.injectOptimizerRule(_ => graft.plans.SimplifyLiteralMapLookup)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name expects 1 argument")
    args.head
  }
  private def two(args: Seq[Expression], name: String): (Expression, Expression) = {
    require(args.length == 2, s"$name expects 2 arguments")
    (args(0), args(1))
  }

  /** (name, info, builder) for every native kernel. */
  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - fused dot product of two numeric arrays"),
      args => { val (a, b) = two(args, "graft_dot"); DotProductExpr(a, b) }),
    ("graft_popcount_and",
      info("graft_popcount_and", "graft_popcount_and(a, b) - Σ popcount(a[i] & b[i]) over bitmask arrays"),
      args => { val (a, b) = two(args, "graft_popcount_and"); PopcountAndExpr(a, b) }),
    ("graft_poly_hash",
      info("graft_poly_hash", "graft_poly_hash(s) - rolling polynomial hash (base 31 mod 1e9+7)"),
      args => PolyHashExpr(one(args, "graft_poly_hash"), 31L,
        graft.operators.TextAnalysis.FingerprintMod)),
    ("graft_simhash60",
      info("graft_simhash60", "graft_simhash60(tokens) - 60-bit simhash of a token array"),
      args => SimHash60Expr(one(args, "graft_simhash60"))),
    ("graft_word_ngrams",
      info("graft_word_ngrams", "graft_word_ngrams(tokens) - word bigrams of a token array"),
      args => WordNgramsExpr(one(args, "graft_word_ngrams"), 2)),
    ("graft_popcount_xor",
      info("graft_popcount_xor", "graft_popcount_xor(a, b) - Σ popcount(a[i] ^ b[i]) (multi-word Hamming) over bitmask arrays"),
      args => { val (a, b) = two(args, "graft_popcount_xor"); PopcountXorExpr(a, b) }),
    ("graft_sign_pack",
      info("graft_sign_pack", "graft_sign_pack(v) - pack sign bits of a numeric array into BIGINT words"),
      args => SignPackExpr(one(args, "graft_sign_pack"))),
    ("graft_ngram_polyhash_vec",
      info("graft_ngram_polyhash_vec", "graft_ngram_polyhash_vec(s) - 64-d signed char-n-gram polyhash feature vector"),
      args => NgramPolyHashVecExpr(one(args, "graft_ngram_polyhash_vec"))),
    ("graft_minhash_sig",
      info("graft_minhash_sig", "graft_minhash_sig(fps) - 32-slot minhash signature of fingerprint array"),
      args => {
        val coeffs = graft.operators.Dedup.hashCoeffs(32)
        MinHashSigExpr(one(args, "graft_minhash_sig"),
          coeffs.map(_._1).toArray, coeffs.map(_._2).toArray, graft.operators.Dedup.HashP)
      }))

  /** Mount the SQL functions on an already-running session (idempotent).
    * The ReuseMaterializedNorm rule needs the analyzer hook and therefore
    * config-time mounting (`spark.sql.extensions` / `withExtensions`) — a
    * live session exposes no analyzer injection point.
    */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}
