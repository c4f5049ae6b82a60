package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}

/** Output-shape lint for the correctness gate.
  *
  * The driver's comparator sorts each result frame with pandas before
  * hashing; an ARRAY/STRUCT/MAP cell is unhashable there and crashes the
  * compare (the round-6 `q_embed_bulk_inference` regression — VERDICT r6
  * "What's wrong #1"). The local gate (tools/check_oracle.py) used to
  * JSON-encode nested cells before sorting, so the class slipped through
  * silently. This spec walks EVERY SparkEntry.queries result schema and
  * fails on any nested top-level column, so a new query can't reintroduce
  * the divergence.
  */
class OutputShapeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def nestedFields(schema: StructType): Seq[String] =
    schema.fields.toSeq.collect {
      case f if isNested(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
    }

  private def isNested(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => true
    case _ => false
  }

  test("every SparkEntry query returns only scalar top-level columns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // schema needs analysis only, not execution — construction itself
        // may run bounded setup jobs (persist, centroids) at sf0.001
        nestedFields(fn(spark, dir).schema).map(f => s"$name -> $f")
    }
    assert(offenders.isEmpty,
      s"nested output columns crash the driver comparator; unnest them " +
        s"(posexplode to scalar rows, as q_crud_lookup does):\n" +
        offenders.mkString("\n"))
  }

  test("the lint catches a planted array column") {
    // prove the predicate actually fires: a query-shaped result with an
    // array column must be flagged
    val planted = spark.range(3).select(col("id"), array(lit(1), lit(2)).as("vec"))
    assert(nestedFields(planted.schema) == Seq("vec: array<int>"))
    val struct_ = spark.range(1).select(struct(lit(1).as("a")).as("s"))
    assert(nestedFields(struct_.schema).nonEmpty)
    val scalar = spark.range(1).select(col("id"), lit("x").as("s"))
    assert(nestedFields(scalar.schema).isEmpty)
  }
}
