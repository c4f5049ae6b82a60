package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time one named SparkEntry query N times at a given SF dir.
  * Usage: runMain graft.TimeQuery <query> [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = math.max(4, Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm-up (session/JIT), untimed
    Seq("q_knn", "q_text_stats").foreach(n =>
      SparkEntry.queries.get(n).foreach(fn => fn(spark, sfDir).count()))
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[timequery] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
