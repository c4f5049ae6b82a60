package graft

/** Bucketing = the ingest-time co-location contract: two tables bucketed the
  * same way on the join key sort-merge-join with NO exchange on either side.
  * At 100 TB this is the difference between a join that reshuffles both
  * fact tables every query and one that only reads.
  */
class BucketingSpec extends SparkSpec {
  import testImplicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("equal bucketing on the join key eliminates both exchanges") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "x")
    val b = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("graft_bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("graft_bkt_b")
    try {
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val j = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "k")
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        assert(!plan.contains("Exchange"),
          s"bucketed-bucketed join must not shuffle:\n$plan")
        assert(j.count() == 1000)

        // control: the same join from plain (unbucketed) parquet shuffles
        val tmp = System.getProperty("java.io.tmpdir") + "/graft_bkt_plain"
        a.write.mode("overwrite").parquet(tmp)
        val plain = spark.read.parquet(tmp).join(spark.table("graft_bkt_b"), "k")
        assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("bucket pruning: an equality filter reads one bucket's files") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "x")
    a.write.bucketBy(8, "k").mode("overwrite").saveAsTable("graft_bkt_p")
    try {
      // the planner turns bucketed scans off when nothing downstream needs
      // the partitioning; pruning requires the bucketed scan itself
      withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val q = spark.table("graft_bkt_p").filter($"k" === 7L)
        val scan = q.queryExecution.executedPlan.toString
        assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
          s"expected bucket pruning in scan:\n$scan")
        assert(q.count() == 1)
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_bkt_p")
  }
}
