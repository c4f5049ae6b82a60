package graft

import graft.operators._
import graft.operators.MetaValue._
import graft.sources.VectorStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-count contracts from the reference filter-language suite
  * (/root/reference/tests/test_mongolike_operators.py): 270-row corpus =
  * 250 rows {num_filter: test_N} + 10 rows {value:10, date:2021-01-01} +
  * 10 rows {value:20, date:2022-01-01} (ibid.:13-39).
  */
class FilterDslSpec extends SparkSpec {

  private lazy val corpus: DataFrame = {
    val sp = spark
    import sp.implicits._
    val base = (0 until 250).map { i =>
      (i.toString, Seq(0.1f * (i % 7), 0.2f), s"""{"num_filter":"test_${i % 4 + 1}"}""")
    }
    val v10 = (250 until 260).map { i =>
      (i.toString, Seq(0.3f, 0.4f), """{"value":10,"date":"2021-01-01T00:00:00"}""")
    }
    val v20 = (260 until 270).map { i =>
      (i.toString, Seq(0.5f, 0.6f), """{"value":20,"date":"2022-01-01T00:00:00"}""")
    }
    VectorStore.ingest(
      (base ++ v10 ++ v20).toDF("id", "embedding", "metadata"),
      col("id"), col("embedding"), col("metadata")).cache()
  }

  private def count(
      andF: Seq[FilterDsl.MetaFilter] = Nil,
      orF: Seq[FilterDsl.MetaFilter] = Nil,
      exF: Seq[Map[String, MetaValue]] = Nil): Long =
    corpus.filter(FilterDsl.compile(col("metadata_kv"), andF, orF, exF)).count()

  test("$gt/$gte/$lt/$lte exact counts (test_mongolike_operators.py:41-80)") {
    assert(count(andF = Seq(Map("value" -> Ops(Seq("$gt" -> MLong(10)))))) == 10)
    assert(count(andF = Seq(Map("value" -> Ops(Seq("$gte" -> MLong(10)))))) == 20)
    assert(count(andF = Seq(Map("value" -> Ops(Seq("$lt" -> MLong(20)))))) == 10)
    assert(count(andF = Seq(Map("value" -> Ops(Seq("$lte" -> MLong(20)))))) == 20)
  }

  test("$ne only matches rows that HAVE the key (test_mongolike_operators.py:83-89)") {
    // 270 rows total, 20 have `value`; $ne 10 matches the 10 value=20 rows,
    // NOT 260.
    assert(count(andF = Seq(Map("value" -> Ops(Seq("$ne" -> MLong(10)))))) == 10)
  }

  test("datetime comparisons on ISO strings (test_mongolike_operators.py:91-106)") {
    assert(count(andF = Seq(Map("date" -> Ops(Seq("$gt" -> MStr("2021-06-01T00:00:00")))))) == 10)
    assert(count(andF = Seq(Map("date" -> Ops(Seq("$lte" -> MStr("2021-06-01T00:00:00")))))) == 10)
  }

  test("operator range dict applies all bounds (SURVEY §2.3.4 resolution)") {
    assert(count(andF = Seq(Map("date" -> Ops(Seq(
      "$gte" -> MStr("2021-01-01T00:00:00"),
      "$lte" -> MStr("2021-12-31T00:00:00")))))) == 10)
    // an impossible range is empty under all-ops semantics
    assert(count(andF = Seq(Map("value" -> Ops(Seq(
      "$gt" -> MLong(10), "$lt" -> MLong(10)))))) == 0)
  }

  test("or_filters union within and across dicts (test_mongolike_operators.py:117-127)") {
    assert(count(orF = Seq(
      Map("value" -> Eq(MLong(10))), Map("value" -> Eq(MLong(20))))) == 20)
    // keys within ONE dict are OR'ed
    assert(count(orF = Seq(Map(
      "value" -> Eq(MLong(10)),
      "date" -> Ops(Seq("$gt" -> MStr("2021-06-01T00:00:00")))))) == 20)
  }

  test("AND ∩ OR composition can be empty (test_mongolike_operators.py:233-248)") {
    assert(count(
      andF = Seq(Map("num_filter" -> Eq(MStr("test_1")))),
      orF = Seq(Map("value" -> Eq(MLong(10))))) == 0)
  }

  test("AND across a list of dicts (test_mongolike_operators.py:140-150)") {
    assert(count(andF = Seq(
      Map("value" -> Ops(Seq("$gte" -> MLong(10)))),
      Map("date" -> Ops(Seq("$lt" -> MStr("2022-01-01T00:00:00")))))) == 10)
  }

  test("exclude applies after AND∩OR, equality only (vector_database.py:379-384)") {
    assert(count(
      andF = Seq(Map("value" -> Ops(Seq("$gte" -> MLong(10))))),
      exF = Seq(Map("value" -> MLong(20)))) == 10)
  }

  test("invalid operator raises (test_mongolike_operators.py:164-180)") {
    val e = intercept[IllegalArgumentException] {
      count(andF = Seq(Map("value" -> Ops(Seq("$bogus" -> MLong(1))))))
    }
    assert(e.getMessage == "Invalid operator: $bogus")
  }

  test("type-strict equality: string '2' does not match number 2 (test_vector_database.py:34-46)") {
    val sp = spark
    import sp.implicits._
    val mixed = VectorStore.ingest(
      Seq(
        ("a", Seq(0.1f, 0.2f), """{"id":1}"""),
        ("b", Seq(0.1f, 0.2f), """{"id":"2"}"""),
        ("c", Seq(0.1f, 0.2f), """{"id":555}""")).toDF("id", "embedding", "metadata"),
      col("id"), col("embedding"), col("metadata"))
    def c(v: MetaValue) =
      mixed.filter(FilterDsl.compile(col("metadata_kv"), Seq(Map("id" -> Eq(v))))).count()
    assert(c(MLong(1)) == 1)
    assert(c(MStr("2")) == 1)
    assert(c(MLong(2)) == 0) // "2" (string) must not match 2 (number)
    assert(c(MStr("1")) == 0) // 1 (number) must not match "1" (string)
    assert(c(MDouble(555.0)) == 1) // ints and floats compare numerically
  }

  test("$in membership on list metadata incl. inside OR (test_mongolike_operators.py:182-231)") {
    val sp = spark
    import sp.implicits._
    val lists = VectorStore.ingest(
      Seq(
        ("u1", Seq(0.1f, 0.2f), """{"custom_list":["a","b","c"]}"""),
        ("u2", Seq(0.1f, 0.2f), """{"custom_list":["d","e","f"]}""")).toDF("id", "embedding", "metadata"),
      col("id"), col("embedding"), col("metadata"))
    def cIn(v: String) = lists.filter(FilterDsl.compile(
      col("metadata_kv"), Seq(Map("custom_list" -> Ops(Seq("$in" -> MStr(v))))))).count()
    assert(cIn("a") == 1 && cIn("f") == 1 && cIn("z") == 0)
    val orC = lists.filter(FilterDsl.compile(col("metadata_kv"), Nil, Seq(
      Map("custom_list" -> Ops(Seq("$in" -> MStr("a")))),
      Map("custom_list" -> Ops(Seq("$in" -> MStr("d")))))))
      .count()
    assert(orC == 2)
  }

  test("string range on escape-bearing values compares RAW strings (verdict r4 #3)") {
    val sp = spark
    import sp.implicits._
    // raw order: a\n0 (0x0A) < a"0 (0x22) < aM < aQ0; fragment order would
    // invert the first two against 'aM' (both encode a backslash 0x5C at
    // the divergence point)
    val rows = VectorStore.ingest(
      Seq(
        ("n1", Seq(0.1f, 0.2f), """{"note":"a\n0"}"""),
        ("q1", Seq(0.1f, 0.2f), """{"note":"a\"0"}"""),
        ("p1", Seq(0.1f, 0.2f), """{"note":"aQ0"}"""),
        ("b1", Seq(0.1f, 0.2f), """{"note":"a\\0"}""")).toDF("id", "embedding", "metadata"),
      col("id"), col("embedding"), col("metadata"))
    def ids(fv: FilterValue): Set[String] =
      rows.filter(FilterDsl.compile(col("metadata_kv"), Seq(Map("note" -> fv))))
        .select("id").collect().map(_.getString(0)).toSet
    // $lt 'aM': matches the newline and quote rows (raw 0x0A/0x22 < 0x4D);
    // excludes aQ0 (0x51) and the raw-backslash row (0x5C)
    assert(ids(Ops(Seq("$lt" -> MStr("aM")))) == Set("n1", "q1"))
    // $gt 'a\t' (0x09): everything is above a tab
    assert(ids(Ops(Seq("$gt" -> MStr("a\t")))) == Set("n1", "q1", "p1", "b1"))
    // range with escape-bearing BOUNDS: between the quote (0x22) inclusive
    // and the raw backslash (0x5C) exclusive
    assert(ids(Ops(Seq("$gte" -> MStr("a\"0"), "$lt" -> MStr("a\\0")))) == Set("q1", "p1"))
    // non-string fragments stay excluded by the type gate (decode → null)
    val mixed = VectorStore.ingest(
      Seq(("x1", Seq(0.1f, 0.2f), """{"note":7}""")).toDF("id", "embedding", "metadata"),
      col("id"), col("embedding"), col("metadata"))
    assert(mixed.filter(FilterDsl.compile(col("metadata_kv"),
      Seq(Map("note" -> Ops(Seq("$gt" -> MStr(""))))))).count() == 0)
  }
}
