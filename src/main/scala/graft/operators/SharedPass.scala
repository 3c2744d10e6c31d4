package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Retention sweep for the reliable-checkpoint dir: delete checkpointed
    * frames whose data is older than `olderThanMs`, return how many were
    * removed. Spark's layout is `<root>/<context-uuid>/rdd-N/part-*` and
    * Spark itself never deletes this data unless the GC-driven
    * `cleanCheckpoints` cleaner is on (see the retention note above), so
    * a scratch volume needs either a TTL or this sweep. The grain is the
    * `rdd-N` directory — one materialized frame — judged by its
    * modification time, so a live session's FRESH frames survive while
    * last week's accumulate-and-forget runs are reclaimed; an emptied,
    * stale context dir is pruned too. The CALLING session's own context
    * dir (`sparkContext.getCheckpointDir`, a per-context UUID) is always
    * skipped wholesale: mtime alone cannot distinguish "abandoned" from
    * "materialized hours ago and still feeding a live computation", and
    * sweeping a live frame turns the session's next action into a
    * FileNotFound. Other sessions' live dirs are not detectable from
    * here — run the sweep against a volume whose OTHER writers are
    * known-dead (the scratch-TTL discipline the class doc prescribes).
    * `root` resolves from [[DirConf]] first, else the parent of the
    * context's installed checkpoint dir.
    */
  def cleanup(spark: SparkSession, olderThanMs: Long,
              rootOverride: Option[String] = None): Int = {
    require(olderThanMs >= 0, "olderThanMs must be >= 0")
    val root = rootOverride
      .orElse(spark.conf.getOption(DirConf))
      .orElse(spark.sparkContext.getCheckpointDir
        .map(d => new Path(d).getParent.toString))
      .getOrElse(throw new IllegalArgumentException(
        s"no checkpoint dir to sweep: set $DirConf, call " +
          "setCheckpointDir, or pass an explicit root"))
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return 0
    val cutoff = System.currentTimeMillis() - olderThanMs
    // never sweep the calling session's own live context dir — an old
    // mtime there can still be a checkpoint feeding a running computation
    val own = spark.sparkContext.getCheckpointDir
      .map(d => fs.makeQualified(new Path(d)))
    var removed = 0
    for (ctx <- fs.listStatus(rootPath) if ctx.isDirectory
         if !own.contains(fs.makeQualified(ctx.getPath))) {
      for (frame <- fs.listStatus(ctx.getPath)
           if frame.getModificationTime < cutoff) {
        fs.delete(frame.getPath, true)
        removed += 1
      }
      if (fs.listStatus(ctx.getPath).isEmpty &&
          ctx.getModificationTime < cutoff) {
        fs.delete(ctx.getPath, false); ()
      }
    }
    removed
  }
}
