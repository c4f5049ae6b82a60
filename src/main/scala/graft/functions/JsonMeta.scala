package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import scala.jdk.CollectionConverters._

/** Canonical handling of the schemaless per-record metadata.
  *
  * The reference keeps metadata as an open Python dict per record and serves
  * filters through an inverted index of metadata KEYS
  * (/root/reference/minivectordb/vector_database.py:16,77-79). Our canonical
  * form is two columns:
  *
  *   - `metadata`    STRING — the JSON object, source of truth;
  *   - `metadata_kv` MAP<STRING,STRING> — top-level key → *canonical JSON
  *     fragment* of its value ("2" vs "\"2\"" keeps the type distinction the
  *     reference gets from Python object identity).
  *
  * `metadata_kv` is materialized ONCE at ingest (the only place this UDF
  * runs) and stored columnar, so the filter compiler ([[graft.operators.FilterDsl]])
  * works over codegen'd map lookups + string/double comparisons — the JSON is
  * not re-parsed per predicate per row at query time. Key-presence checks
  * (`element_at(kv, k) IS NOT NULL`) play the role of the reference's
  * inverted index.
  */
object JsonMeta {

  private val mapper = new ObjectMapper()

  private def canonical(n: JsonNode): String = mapper.writeValueAsString(n)

  /** Parse a JSON object into key → canonical fragment. Null-valued keys are
    * kept (present, fragment "null") to mirror dict-key presence semantics.
    */
  def kvOf(json: String): Map[String, String] = {
    if (json == null) return Map.empty
    val node = mapper.readTree(json)
    if (node == null || !node.isObject) Map.empty
    else
      node.properties().asScala.map { e =>
        e.getKey -> canonical(e.getValue)
      }.toMap
  }

  /** Elements of a JSON array fragment, each as a canonical fragment. */
  def arrayElems(fragment: String): Seq[String] = {
    if (fragment == null) return Seq.empty
    val node = mapper.readTree(fragment)
    if (node == null || !node.isArray) Seq.empty
    else node.elements().asScala.map(canonical).toSeq
  }

  private val jsonKvUdf = udf((s: String) => kvOf(s))
  private val jsonArrUdf = udf((s: String) => arrayElems(s))

  /** metadata JSON string column → MAP<STRING,STRING> of canonical fragments.
    * Ingest-time only; not for the per-query hot path.
    */
  def jsonKv(metadataJson: Column): Column = jsonKvUdf(metadataJson)

  /** JSON array fragment → ARRAY<STRING> of canonical element fragments.
    * Used by the `$in` operator (rare; acceptable off the codegen path).
    */
  def jsonArr(fragment: Column): Column = jsonArrUdf(fragment)
}
