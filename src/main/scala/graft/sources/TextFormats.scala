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
  *  - JSONL is LINE-SPLITTABLE (the JSON writer escapes embedded newlines
  *    as \n inside the string), so a 100 TB directory reads as one task
  *    per `maxPartitionBytes` slice — no single-reader bottleneck. It is
  *    the recommended interchange format for exactly this reason;
  *  - CSV quotes embedded newlines LITERALLY, so a correct reader must run
  *    in multiLine mode — which reads one file per task (no intra-file
  *    splitting). Correctness wins here; parallelism then comes from the
  *    file count, which the writer controls (one file per task);
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

  /** Write `df` as headered CSV. CSV has no native null/empty-string
    * distinction, so this writer pins a convention: NULL is the bare
    * token `\N` (the MySQL/Hive sentinel), empty string is a quoted `""`.
    * Without it the default reader folds both to NULL (it compares the
    * parsed datum to nullValue="" AFTER unquoting). Caveat of any
    * sentinel scheme: a data value that is literally `\N` reads back as
    * NULL.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", "\\N")
      .option("emptyValue", "\"\"")
      .csv(path)

  /** Read a headered CSV directory with an explicit schema (with an
    * explicit schema Spark maps columns POSITIONALLY and skips the header
    * row; types come from `schema`). multiLine mode is mandatory for
    * correctness: quoted fields may contain literal newlines, and without
    * it such rows silently shatter into garbage records. The nullValue
    * option mirrors the writer's `\N`/`""` convention so empty strings
    * survive the roundtrip.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("nullValue", "\\N")
      .csv(path)
}
