package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev measurement harness: the four oracle-equal exact-Jaccard strategies
  * (DedupSpec proves same output) timed head-to-head on the real corpus —
  * the data behind the `q_dedup_jaccard` default-wiring choice.
  * Usage: runMain graft.JaccardBench [sfDir] [reps]
  */
object JaccardBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = math.max(4, Runtime.getRuntime.availableProcessors()).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Dedup
    val docs = graft.sources.Testdata.table(spark, sfDir, "documents")
    docs.count() // warm the scan

    val strategies: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "grid-bitset-hashed" -> (() =>
        Dedup.jaccardPairsBitsetHashed(docs, col("doc_id"), col("text"), n = 2, tau = 0.5)),
      "prefix-filter" -> (() =>
        Dedup.jaccardPairs(docs, col("doc_id"), col("text"), n = 2, tau = 0.5,
          prefixFilter = true)),
      "count-join" -> (() =>
        Dedup.jaccardPairs(docs, col("doc_id"), col("text"), n = 2, tau = 0.5,
          prefixFilter = false)),
      "minhash-lsh-verify" -> (() =>
        Dedup.minhashLshPairs(docs, col("doc_id"), col("text"), n = 2, tau = 0.5)))

    strategies.foreach { case (name, mk) =>
      mk().count() // one untimed warm-up per strategy (JIT, codegen)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = mk().count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = times.map(_._1).sorted.apply(times.length / 2)
      println(f"[jaccardbench] $name%-22s median $med%.3f s  reps ${times.map(t => f"${t._1}%.2f").mkString("/")}  rows ${times.head._2}")
    }
    spark.stop()
  }
}
