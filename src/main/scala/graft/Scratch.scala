package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary measurement scratchpad — not part of the engine
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.sources.Testdata.lineitem(spark, "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[scratch] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    li.count() // warm
    println("[scratch] partitions: " + li.rdd.getNumPartitions)
    time("plain double agg") {
      li.agg(count(col("l_quantity")), min(col("l_quantity")), max(col("l_quantity")),
        sum(col("l_quantity").cast("double"))).collect()
    }
    time("decimal30 sums x3") {
      li.agg(sum(col("l_quantity").cast("decimal(30,6)")),
        sum(col("l_extendedprice").cast("decimal(30,6)")),
        sum(col("l_discount").cast("decimal(30,6)"))).collect()
    }
    time("x2 split decimal38 sums x3") {
      val pre = li.select(Seq("l_quantity", "l_extendedprice", "l_discount").flatMap { c =>
        val x2 = col(c).cast("double") * col(c).cast("double")
        Seq((x2 - x2 % lit(1.0)).cast("decimal(38,0)").as(s"h_$c"),
          (x2 % lit(1.0)).cast("decimal(38,12)").as(s"l_$c"))
      }: _*)
      pre.agg(sum(col("h_l_quantity")), sum(col("l_l_quantity")),
        sum(col("h_l_extendedprice")), sum(col("l_l_extendedprice")),
        sum(col("h_l_discount")), sum(col("l_l_discount"))).collect()
    }
    time("x2 split, h lane via long cast") {
      val pre = li.select(Seq("l_quantity", "l_extendedprice", "l_discount").flatMap { c =>
        val x2 = col(c).cast("double") * col(c).cast("double")
        Seq((x2 - x2 % lit(1.0)).cast("long").cast("decimal(38,0)").as(s"h_$c"),
          (x2 % lit(1.0)).cast("decimal(38,12)").as(s"l_$c"))
      }: _*)
      pre.agg(sum(col("h_l_quantity")), sum(col("l_l_quantity")),
        sum(col("h_l_extendedprice")), sum(col("l_l_extendedprice")),
        sum(col("h_l_discount")), sum(col("l_l_discount"))).collect()
    }
    // equality of the two h-lane casts on the real data
    val neq = li.select(Seq("l_quantity", "l_extendedprice", "l_discount").map { c =>
      val x2 = col(c).cast("double") * col(c).cast("double")
      val a = (x2 - x2 % lit(1.0)).cast("decimal(38,0)")
      val b = (x2 - x2 % lit(1.0)).cast("long").cast("decimal(38,0)")
      sum(when(a =!= b, 1).otherwise(0)).as(s"neq_$c")
    }: _*).collect()
    println("[scratch] h-lane cast disagreement counts: " + neq.head.toSeq)
    time("full numericProfile") {
      graft.operators.Profile.numericProfile(li,
        Seq("l_quantity", "l_extendedprice", "l_discount")).collect()
    }
    spark.stop()
  }
}
