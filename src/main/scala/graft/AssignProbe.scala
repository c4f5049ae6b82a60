package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: cost of the IVF nearest-centroid assignment expression as the
  * centroid count grows (codegen vs fallback threshold).
  * Usage: runMain graft.AssignProbe [mult] [sfDir]
  */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(60)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = math.max(4, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val reps = spark.range(mult).select(col("id").as("_rep"))
    val emb = emb0.crossJoin(broadcast(reps))
      .withColumn("vid", col("vec_id") * mult + col("_rep"))
      .drop("vec_id", "_rep").withColumnRenamed("vid", "vec_id")
      .localCheckpoint()
    emb.count()
    Seq(8, 16, 32, 48, 64).foreach { c =>
      val cents = graft.operators.IvfSearch.centroidsFromIds(
        emb0, col("vec_id"), col("embedding"), c = c)
      val t0 = System.nanoTime()
      val n = graft.operators.IvfSearch.index(emb, col("embedding"), cents)
        .groupBy("list_id").count().count()
      println(f"[assignprobe] c=$c%-3d assign+groupBy: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n lists)")
    }
    spark.stop()
  }
}
