package graft

import org.apache.spark.sql.DataFrame

/** Central lineage-cut used by every iterative / multi-consumer operator
  * (connected components, TextRank, Lloyd training, BPE state, sketch
  * tables, the pipeline fan-ins).
  *
  * Two modes (round-5 verdict #4):
  *
  *  - default: `localCheckpoint` — blocks pinned to executor storage,
  *    zero I/O beyond memory/disk spill. Right for local mode and for
  *    clusters without preemption: the cost of the cut is one in-memory
  *    materialization.
  *  - `graft.checkpoint.dir` set (via `spark.conf.set` or `--conf`):
  *    RELIABLE `checkpoint` to that directory. `localCheckpoint` blocks
  *    do NOT survive executor loss — on a preemptible/spot cluster a
  *    single lost executor makes every later iteration fail with
  *    missing-block errors instead of recomputing (lineage was
  *    truncated), killing multi-hour CC/TextRank jobs at exactly the
  *    scale they matter. The reliable mode trades one write+read of the
  *    cut dataset per iteration against restart-from-zero; at 100 TB the
  *    cut datasets are edge/state tables orders of magnitude smaller than
  *    the corpus, so the write is the cheap side of that trade.
  *
  * The flag is read per cut, so a session can set it for a long job and
  * unset it for interactive work. The checkpoint dir is registered on the
  * SparkContext on first use (SparkContext scopes actual files per-app
  * under it).
  */
object Checkpoint {
  val DirKey = "graft.checkpoint.dir"

  // setCheckpointDir registers an app-scoped SUBDIRECTORY, so
  // sc.getCheckpointDir can't be compared to the conf value directly;
  // remember what WE registered so a mid-session re-set of the conf
  // (e.g. moving to a different volume) takes effect instead of being
  // silently ignored while checkpoints keep landing on the old storage.
  @volatile private var registeredDir: Option[String] = None

  def cut(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(DirKey).filter(_.nonEmpty) match {
      case Some(d) =>
        val sc = spark.sparkContext
        if (!registeredDir.contains(d) || sc.getCheckpointDir.isEmpty)
          synchronized {
            if (!registeredDir.contains(d) || sc.getCheckpointDir.isEmpty) {
              sc.setCheckpointDir(d)
              registeredDir = Some(d)
            }
          }
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  /** Chaining form: `df.cut(eager = false)` after
    * `import graft.Checkpoint.CheckpointOps`.
    */
  implicit class CheckpointOps(private val df: DataFrame) extends AnyVal {
    def cut(eager: Boolean = true): DataFrame = Checkpoint.cut(df, eager)
  }
}
