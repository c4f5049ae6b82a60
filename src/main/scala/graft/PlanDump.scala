package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` of named queries to
  * <outDir>/<query>_<tag>.txt — the per-round plan-evidence generator
  * (plans/rNN/). Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, list) = args.take(4)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    list.split(",").map(_.trim).filter(_.nonEmpty).foreach { name =>
      val txt =
        try SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"(failed: ${e.getMessage})" }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $name")
    }
    spark.stop()
  }
}
