package graft

/** The SQL surface of the native kernels: registered functions usable from
  * spark.sql, producing the same values as the Column API.
  */
class ExtensionsSpec extends SparkSpec {

  test("registered SQL functions compute the same values as the Column API") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dot,
        |  graft_popcount_and(array(7L), array(5L)) AS pc,
        |  graft_poly_hash('hello world') AS ph,
        |  graft_simhash60(array('a', 'b', 'a')) AS sh,
        |  graft_word_ngrams(array('x', 'y', 'z')) AS ng
        |""".stripMargin).collect()(0)
    assert(r.getAs[Double]("dot") == 11.0)
    assert(r.getAs[Int]("pc") == 2) // 7 & 5 = 5 → two bits
    val expectedPh = "hello world".foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
    assert(r.getAs[Long]("ph") == expectedPh)
    assert(r.getAs[Long]("sh") == graft.functions.SimHash60Expr.simhash(Array("a", "b", "a")))
    assert(r.getSeq[String](4) == Seq("x y", "y z"))
  }

  test("SQL top-k over graft_dot plans as TakeOrderedAndProject") {
    GraftExtensions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("ext_vectors")
    val df = spark.sql(
      """SELECT vec_id, graft_dot(embedding, embedding) AS ss
        |FROM ext_vectors ORDER BY ss DESC LIMIT 5""".stripMargin)
    assert(df.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    assert(df.count() == 5)
  }

  test("config-time extension mounts on a fresh session") {
    val s2 = SparkSpec.session.newSession()
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions) // construct-only sanity
    // runtime path on the new session
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT graft_poly_hash('x') AS h").collect()(0).getLong(0) ==
      'x'.toInt % 1000000007L)
  }
}
