package graft

import graft.operators.{Eq, MetaValue, Search}
import graft.sources.VectorStore
import java.nio.file.{Files, Paths}

/** Source-format adapters: JSON-lines and CSV ingest produce the same
  * canonical store schema and are immediately searchable/filterable.
  */
class SourcesSpec extends SparkSpec {

  test("fromJsonLines: object metadata, canonical schema, searchable") {
    val dir = Files.createTempDirectory("graft_jsonl")
    Files.writeString(Paths.get(dir.toString, "a.jsonl"),
      """{"id": "a", "embedding": [1.0, 0.0], "metadata": {"label": 1}}
        |{"id": "b", "embedding": [0.0, 1.0], "metadata": {"label": 2}}
        |{"id": "c", "embedding": [0.7, 0.7]}
        |""".stripMargin)
    val st = VectorStore.fromJsonLines(spark, dir.toString)
    assert(st.count() == 3)
    assert(st.df.columns.toSet == Set("id", "embedding", "metadata", "norm_sq", "metadata_kv"))
    // missing metadata coalesces to {}
    assert(st.df.filter(org.apache.spark.sql.functions.col("id") === "c")
      .select("metadata").first().getString(0) == "{}")
    // searchable with a metadata filter on the ingested kv map
    val r = Search.findMostSimilar(st, Seq(1.0f, 0.0f), k = 3,
      metadataFilter = Seq(Map("label" -> Eq(MetaValue.MLong(2))))).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("b"))
  }

  test("fromCsv: delimited embeddings parse to float arrays, searchable") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(Paths.get(dir.toString, "a.csv"),
      """id,embedding,metadata
        |x,1.0;0.0,"{""t"":""p""}"
        |y,0.0;1.0,
        |""".stripMargin)
    val st = VectorStore.fromCsv(spark, dir.toString)
    assert(st.count() == 2)
    assert(st.getVector("x").toSeq == Seq(1.0f, 0.0f))
    assert(st.df.filter(org.apache.spark.sql.functions.col("id") === "y")
      .select("metadata").first().getString(0) == "{}")
    val top = Search.findMostSimilar(st, Seq(0.0f, 1.0f), k = 1).collect()
    assert(top.head.getString(0) == "y")
  }

  test("fromOrc: native columnar alternative, canonical schema, searchable") {
    import testImplicits._
    val dir = Files.createTempDirectory("graft_orc")
    Seq(
      ("o1", Seq(1.0f, 0.0f), """{"label":1}"""),
      ("o2", Seq(0.0f, 1.0f), null.asInstanceOf[String]))
      .toDF("id", "embedding", "metadata")
      .write.mode("overwrite").orc(s"$dir/data")
    val st = VectorStore.fromOrc(spark, s"$dir/data")
    assert(st.count() == 2)
    assert(st.df.columns.toSet == Set("id", "embedding", "metadata", "norm_sq", "metadata_kv"))
    assert(st.df.filter(org.apache.spark.sql.functions.col("id") === "o2")
      .select("metadata").first().getString(0) == "{}")
    val top = Search.findMostSimilar(st, Seq(1.0f, 0.0f), k = 1).collect()
    assert(top.head.getString(0) == "o1")
  }

  test("format round-trip: jsonl → store → parquet → load equals origin") {
    val dir = Files.createTempDirectory("graft_rt")
    Files.writeString(Paths.get(dir.toString, "in.jsonl"),
      """{"id": "r1", "embedding": [0.5, 0.5], "metadata": {"k": "v"}}
        |""".stripMargin)
    val st = VectorStore.fromJsonLines(spark, dir.toString)
    st.persist(s"$dir/out")
    val re = VectorStore.load(spark, s"$dir/out")
    assert(re.getVector("r1").toSeq == Seq(0.5f, 0.5f))
    assert(re.df.select("metadata_kv").first().getMap[String, String](0).get("k").contains("\"v\""))
  }

  test("TextFormats: JSONL and CSV roundtrips preserve rows, types, content") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = docs.select(col("doc_id"), md5(col("text")).as("m"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq

    val jd = Files.createTempDirectory("graft_tf_jsonl").toString
    graft.sources.TextFormats.writeJsonl(docs, jd)
    val jr = graft.sources.TextFormats.readJsonl(spark, jd, docs.schema)
    assert(jr.schema == docs.schema)
    val gotJ = jr.select(col("doc_id"), md5(col("text")).as("m"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(gotJ == want)
    // line-oriented: one task per upstream partition, files individually
    // re-splittable on read
    assert(new java.io.File(jd).listFiles().count(_.getName.endsWith(".json")) >= 1)

    val cd = Files.createTempDirectory("graft_tf_csv").toString
    graft.sources.TextFormats.writeCsv(docs, cd)
    val cr = graft.sources.TextFormats.readCsv(spark, cd, docs.schema)
    assert(cr.schema == docs.schema)
    val gotC = cr.select(col("doc_id"), md5(col("text")).as("m"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(gotC == want)
  }

  test("roundtrips survive adversarial text: embedded newlines, quotes, commas, backslashes") {
    import org.apache.spark.sql.functions._
    import testImplicits._
    val nasty = Seq(
      (1L, "line one\nline two\r\nline three"),   // CSV quotes these LITERALLY
      (2L, "she said \"hi\", twice"),             // quote + delimiter
      (3L, "backslash \\n is not a newline"),     // literal backslash-n
      (4L, ""),                                   // empty string ≠ NULL
      (5L, "plain"),
      (6L, null: String)                          // NULL ≠ empty string
    ).toDF("doc_id", "text")
    val want = nasty.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq

    val jd = Files.createTempDirectory("graft_tf_jnasty").toString
    graft.sources.TextFormats.writeJsonl(nasty, jd)
    val gotJ = graft.sources.TextFormats.readJsonl(spark, jd, nasty.schema)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(gotJ == want)

    val cd = Files.createTempDirectory("graft_tf_cnasty").toString
    graft.sources.TextFormats.writeCsv(nasty, cd)
    val gotC = graft.sources.TextFormats.readCsv(spark, cd, nasty.schema)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(gotC == want)
  }
  test("orc roundtrip: schema and content self-describing, nulls preserved") {
    import testImplicits._
    val df = Seq(
      (1L, "line1\nline2", 3.5), (2L, null: String, -0.0), (3L, "", 7.25)
    ).toDF("id", "s", "v")
    val d = Files.createTempDirectory("graft_orc").toString
    graft.sources.ColumnarFormats.writeOrc(df, d)
    val back = graft.sources.ColumnarFormats.readOrc(spark, d)
    // file sinks store all fields nullable — compare names + types
    assert(back.schema.map(f => (f.name, f.dataType))
      == df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().map(_.toSeq).toSeq
      == df.orderBy("id").collect().map(_.toSeq).toSeq)
  }
}
