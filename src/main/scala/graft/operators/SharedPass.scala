package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization policy for multiply-consumed corpus-sized base frames
  * (the shared tokenize/shingle passes every dedup/quality pipeline pins
  * so the dominant scan cost is paid once, not per consumer).
  *
  * Two modes, chosen per session:
  *
  *  - '''local''' (default): `Dataset.localCheckpoint(eager = true)` —
  *    lineage truncates into executor block storage. Fastest (no FS
  *    round-trip) and exactly right on a single host or a stable cluster,
  *    but the truncated lineage means a LOST executor kills the job
  *    instead of recomputing its blocks.
  *  - '''reliable''' (`graft.checkpoint.reliable = true`): a reliable
  *    `Dataset.checkpoint(eager = true)` to the SparkContext checkpoint
  *    dir (set it directly, or via `graft.checkpoint.dir` and this helper
  *    installs it on first use). Survives executor loss — the right
  *    default on preemptible/spot fleets at 100 TB, at the cost of one
  *    write+read of the materialized frame through the checkpoint FS.
  *    RETENTION: Spark only deletes reliable checkpoint data when
  *    `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
  *    STATIC conf — set it at session build, it cannot be flipped at
  *    runtime; default false), so a long-lived session re-running a
  *    pipeline accumulates one materialized base frame per run until
  *    the GC-driven cleaner — or the operator — reclaims them. Enable
  *    that cleaner, or point `graft.checkpoint.dir` at a scratch/TTL
  *    volume sized for it.
  *
  * Only the big shared-pass bases route here. The ITERATIVE loops
  * (connected components, PageRank, BFS, BPE/WordPiece trainer rounds)
  * intentionally keep plain `localCheckpoint`: their per-round frames are
  * rewritten every iteration, so a failure loses at most one round's
  * convergence work and the job-restart recovery path dominates any
  * per-round reliable-checkpoint cost.
  */
object SharedPass {

  /** Session conf: "true" switches shared-pass bases to reliable
    * checkpoints. Read per call, so a long-lived session can flip it.
    */
  val ReliableConf = "graft.checkpoint.reliable"

  /** Session conf: checkpoint directory installed on the SparkContext the
    * first time a reliable shared-pass checkpoint runs without one.
    */
  val DirConf = "graft.checkpoint.dir"

  /** Materialize a multiply-consumed base frame under the session policy. */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val reliable =
      spark.conf.getOption(ReliableConf).exists(_.trim.equalsIgnoreCase("true"))
    if (!reliable) df.localCheckpoint(true)
    else {
      val sc = spark.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption(DirConf).getOrElse(throw
          new IllegalArgumentException(
            s"$ReliableConf=true needs a checkpoint dir: set $DirConf or " +
              "call sparkContext.setCheckpointDir"))
        sc.setCheckpointDir(dir)
      }
      df.checkpoint(true)
    }
  }
}
