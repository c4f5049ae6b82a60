package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Line-oriented interchange formats (JSONL, CSV) — the ingest/egress
  * surface of a training-data pipeline: corpora arrive and ship as
  * newline-delimited JSON (every public LLM dataset release) or CSV, and
  * parquet is the internal format. The reference persists its store as
  * pickled Python objects (/root/reference/minivectordb/vector_database.py,
  * `persist_to_disk`) — a single-process format; these writers/readers are
  * the distributed equivalent.
  *
  * Scale contract:
  *  - both formats are LINE-SPLITTABLE, so a 100 TB directory reads as one
  *    task per `maxPartitionBytes` slice — no single-reader bottleneck;
  *  - readers take an EXPLICIT schema: schema inference is a full extra
  *    pass over the data (and type-unstable across samples) — at scale it
  *    is always a bug, so these APIs do not expose it;
  *  - writers shard into one file per task (standard `df.write`), so
  *    egress parallelism equals the upstream partitioning.
  */
object TextFormats {

  /** Write `df` as newline-delimited JSON (one object per line). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a JSONL directory with an explicit schema. Rows that fail to
    * parse surface in the `_corrupt_record`-free default mode as nulls —
    * callers screening untrusted crawls should add a not-null gate on a
    * required column.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Write `df` as headered CSV. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** Read a headered CSV directory with an explicit schema (the header is
    * only used to NAME columns on read; types come from `schema`).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(path)
}
