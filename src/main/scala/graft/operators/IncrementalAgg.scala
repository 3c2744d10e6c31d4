package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.VersionedTable

/** Incremental materialized-aggregate maintenance driven by the keyed change
  * feed — the refresh path that never rescans the base table.
  *
  * Maintains `SELECT dims…, count(*) AS n_rows, sum(value) AS sum_value
  * GROUP BY dims…` across base-table commits: each [[maintain]] step consumes
  * the keyed CDF between two base versions ([[VersionedTable.changesByKey]])
  * and folds signed group deltas into the stored aggregate — +1 for
  * `insert`/`update_postimage`, −1 for `delete`/`update_preimage` — so an
  * update that MOVES a row between groups decrements the old group and
  * increments the new one in the same pass, and a group whose count reaches
  * zero is dropped from the view.
  *
  * Scale design (the point): a full refresh re-aggregates O(|base|) rows;
  * this path is O(|changes| + |affected groups|). At 100 TB with a 0.1%-of-
  * keys daily MERGE, the refresh reads the CDF (itself computed from only the
  * dirs the merge rewrote is not guaranteed — but bounded by two snapshot
  * reads) and MERGEs a handful of group rows: the MV lives in its own
  * [[VersionedTable]] keyed on the dims, so dir-grained copy-on-write keeps
  * untouched MV dirs (and their skipping stats) in place.
  *
  * Contrast with [[Gold.incrementalMartUpdate]] (group-level rebuild reading
  * the full silver — the right tool when no change log exists): this path
  * reads only the change feed and the affected MV rows.
  *
  * Honest caveats: `sum_value` treats NULL values as 0 (a group whose every
  * value is NULL reads 0, not SQL's NULL); [[maintain]] requires non-null
  * dims because VersionedTable.merge's key discovery — like SQL equality —
  * never matches null keys ([[applyDeltas]] itself is null-safe via `<=>`).
  * Maintenance steps must be applied in increasing base-version order; the
  * MV's `updated_to` column records the base version each group last saw
  * and doubles as the view's watermark: [[appliedThrough]] reads it back,
  * and [[maintain]]/[[maintainExtremes]] no-op any step the view already
  * folded (replay safety — without the guard a replayed step would apply
  * its deltas twice). Skipping a base version still loses its deltas;
  * derive `from` from [[appliedThrough]] after a crash, as
  * [[graft.streaming.UpsertSink.startWithView]] does.
  */
object IncrementalAgg {

  /** Signed per-group (d_rows, d_value) deltas from a keyed-CDF slice.
    * Pre/post images of updates contribute −/+ so same-group value changes
    * net to (0, value diff) and cross-group moves split into two groups.
    */
  def deltas(cdf: DataFrame, dims: Seq[String], valueCol: String): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(lit(0L)) // unknown tags contribute nothing
    cdf.groupBy(dims.map(col): _*).agg(
      sum(sign).as("d_rows"),
      sum(sign * coalesce(col(valueCol), lit(0))).as("d_value"))
  }

  /** Fold group deltas into a materialized (dims…, n_rows, sum_value) frame.
    * One null-safe full-outer join on the dims (a single shuffle; with the
    * delta side small, AQE broadcasts it). Groups reaching n_rows == 0 drop
    * when `dropEmpty`; [[maintain]] keeps them to drive its delete arm.
    */
  def applyDeltas(mv: DataFrame, delta: DataFrame, dims: Seq[String],
                  dropEmpty: Boolean = true): DataFrame = {
    val m = mv.alias("m")
    val d = delta.alias("d")
    val cond = dims.map(c => col(s"m.$c") <=> col(s"d.$c")).reduce(_ && _)
    val out = m.join(d, cond, "full_outer").select(
      dims.map(c => coalesce(col(s"m.$c"), col(s"d.$c")).as(c)) ++ Seq(
        (coalesce(col("m.n_rows"), lit(0L)) +
          coalesce(col("d.d_rows"), lit(0L))).as("n_rows"),
        (coalesce(col("m.sum_value"), lit(0L)) +
          coalesce(col("d.d_value"), lit(0L))).as("sum_value")): _*)
    if (dropEmpty) out.filter(col("n_rows") > 0) else out
  }

  /** Materialize the view from the base table's latest snapshot — the one
    * O(|base|) pass; every later refresh goes through [[maintain]].
    */
  def bootstrap(mv: VersionedTable, base: VersionedTable,
                dims: Seq[String], valueCol: String): Long = {
    val v = base.latestVersion.getOrElse(
      throw new IllegalStateException("base table has no committed version"))
    val agg0 = base.readVersion(v).groupBy(dims.map(col): _*).agg(
      count(lit(1)).as("n_rows"), sum(col(valueCol)).as("sum_value"))
    mv.overwrite(agg0
      .withColumn("sum_value", coalesce(col("sum_value"),
        lit(0).cast(agg0.schema("sum_value").dataType)))
      .withColumn("updated_to", lit(v)))
  }

  /** The base version the view has already folded (max `updated_to`), or
    * None for an EMPTY view — empty carries no watermark, so callers must
    * re-bootstrap rather than guess (a too-low guess double-applies).
    *
    * Answered from the MV manifest's dir-grain stats when the view tracks
    * `updated_to` as a stats column — zero data files opened, no Spark job
    * (the same metadata path as `SELECT count(*)`); the data read is the
    * fallback for untracked views.
    */
  def appliedThrough(mv: VersionedTable): Option[Long] =
    mv.metadataMinMax("updated_to").map(_._2.toLong).orElse {
      val r = mv.read().agg(max(col("updated_to"))).head()
      if (r.isNullAt(0)) None else Some(r.getLong(0))
    }

  /** Refresh the view from base versions `from` → `to`: CDF → group deltas →
    * MERGE of ONLY the affected groups (keyed on the dims, `updated_to`
    * strictly increasing so the fresh row always wins), zero-count groups
    * removed by the WHEN-MATCHED-DELETE arm. Returns the new MV version.
    *
    * Replay-safe: a step whose `to` the view has already folded (per
    * [[appliedThrough]]) is a NO-OP — without the guard a replayed step
    * would fold its deltas twice, since the MERGE's tie semantics prefer
    * the update row at equal `updated_to`.
    */
  def maintain(mv: VersionedTable, base: VersionedTable, from: Long, to: Long,
               rowKeys: Seq[String], dims: Seq[String],
               valueCol: String): Long = {
    if (appliedThrough(mv).exists(_ >= to)) return mv.latestVersion.get
    val d = deltas(base.changesByKey(from, to, rowKeys), dims, valueCol)
      // updates that never touched the aggregate (same group, same value —
      // e.g. only a non-aggregated column changed) rewrite nothing
      .filter(col("d_rows") =!= 0 || col("d_value") =!= 0)
      .alias("d")
    // fold as ONE join: every upsert group appears in the deltas (a view
    // group the changes never touched folds to itself and must not
    // rewrite), so `full_outer(view ⋉ deltaKeys, deltas)` collapses to a
    // LEFT OUTER from the deltas side — the semi-join pass over the view
    // disappears and the (small, affected-groups-only) view side
    // broadcast-joins instead of shuffling both sides
    val m = mv.read().drop("updated_to").alias("m")
    val cond = dims.map(c => col(s"d.$c") <=> col(s"m.$c")).reduce(_ && _)
    // materialize once: MERGE walks its updates frame several times (key
    // pruning, discovery semi-join, the union) and would otherwise re-run
    // the whole CDF pipeline each time
    val upserts = d.join(m, cond, "left_outer").select(
      dims.map(c => col(s"d.$c").as(c)) ++ Seq(
        (coalesce(col("m.n_rows"), lit(0L)) + col("d.d_rows")).as("n_rows"),
        (coalesce(col("m.sum_value"), lit(0L)) +
          col("d.d_value")).as("sum_value")): _*)
      .withColumn("updated_to", lit(to))
      .localCheckpoint(true)
    mv.merge(upserts, keyCols = dims, orderCol = "updated_to",
      deleteWhen = Some(col("n_rows") <= 0))
  }

  // ------------------------------------------------- min/max (deletable?)

  /** The textbook incremental-view split: count/sum are SELF-MAINTAINABLE
    * under deletes (fold the signed delta), min/max are not — removing the
    * row that holds a group's extreme says nothing about the runner-up.
    * The extremes variants below fold what can be folded and fall back to
    * a GROUP-GRAINED rescan only where they must: a group rescans iff some
    * deleted/pre-image value ties-or-beats its stored extreme (a tie still
    * rescans — multiplicity is unknown). Everything else — inserts, and
    * deletes strictly inside the (min, max) interval — folds with
    * `least`/`greatest` and never touches the base. The rescan reads the
    * base `to` snapshot filtered to the rescan groups; with the dims
    * tracked as stats/partition columns that scan prunes to the groups'
    * dirs, so even the fallback stays far from O(|base|).
    */

  /** Per-group delta with extremes: folded (d_rows, d_value), the incoming
    * extremes over ADDED rows (add_min/add_max) and the extremes over
    * REMOVED rows (del_min/del_max — null when the group saw no removal).
    */
  def deltasExtremes(cdf: DataFrame, dims: Seq[String],
                     valueCol: String): DataFrame = {
    val pos = col("_change_type").isin("insert", "update_postimage")
    val neg = col("_change_type").isin("delete", "update_preimage")
    val sign = when(pos, 1L).when(neg, -1L).otherwise(lit(0L))
    val v = col(valueCol)
    cdf.groupBy(dims.map(col): _*).agg(
      sum(sign).as("d_rows"),
      sum(sign * coalesce(v, lit(0))).as("d_value"),
      min(when(pos, v)).as("add_min"),
      max(when(pos, v)).as("add_max"),
      min(when(neg, v)).as("del_min"),
      max(when(neg, v)).as("del_max"))
  }

  /** Bootstrap the (dims…, n_rows, sum_value, min_value, max_value) view. */
  def bootstrapExtremes(mv: VersionedTable, base: VersionedTable,
                        dims: Seq[String], valueCol: String): Long = {
    val v = base.latestVersion.getOrElse(
      throw new IllegalStateException("base table has no committed version"))
    val agg0 = base.readVersion(v).groupBy(dims.map(col): _*).agg(
      count(lit(1)).as("n_rows"), sum(col(valueCol)).as("sum_value"),
      min(col(valueCol)).as("min_value"), max(col(valueCol)).as("max_value"))
    mv.overwrite(agg0
      .withColumn("sum_value", coalesce(col("sum_value"),
        lit(0).cast(agg0.schema("sum_value").dataType)))
      .withColumn("updated_to", lit(v)))
  }

  /** Refresh the extremes view from base versions `from` → `to`. Fold-only
    * groups update like [[maintain]] plus `least`/`greatest` on the added
    * extremes; groups whose stored extreme was (possibly) removed recompute
    * from the base `to` snapshot — restricted to exactly those groups.
    */
  def maintainExtremes(mv: VersionedTable, base: VersionedTable,
                       from: Long, to: Long, rowKeys: Seq[String],
                       dims: Seq[String], valueCol: String): Long = {
    if (appliedThrough(mv).exists(_ >= to)) return mv.latestVersion.get
    val d = deltasExtremes(base.changesByKey(from, to, rowKeys), dims, valueCol)
      .filter(col("d_rows") =!= 0 || col("d_value") =!= 0 ||
        col("add_min").isNotNull || col("del_min").isNotNull)
      .localCheckpoint(true) // probed twice: affected-group restrict + fold
    // one LEFT OUTER from the deltas side replaces the old semi-join
    // restriction + full outer (every upsert group appears in the deltas,
    // so the two spell the same frame — see [[maintain]]); view groups the
    // changes never touched fold to themselves and must not rewrite, and
    // the view side broadcast-joins instead of shuffling both sides
    val mAll = mv.read().drop("updated_to").alias("m")
    val dd = d.alias("d")
    val cond = dims.map(c => col(s"d.$c") <=> col(s"m.$c")).reduce(_ && _)
    val j = dd.join(mAll, cond, "left_outer")
    val dimCols = dims.map(c => col(s"d.$c").as(c))
    val nRows = (coalesce(col("m.n_rows"), lit(0L)) +
      coalesce(col("d.d_rows"), lit(0L))).as("n_rows")
    val sumV = (coalesce(col("m.sum_value"), lit(0L)) +
      coalesce(col("d.d_value"), lit(0L))).as("sum_value")
    // a removal endangers the stored extreme when it ties-or-beats it; a
    // group absent from the view (pure insert) can never need a rescan
    val rescan = (col("m.n_rows").isNotNull &&
      (col("d.del_min") <= col("m.min_value") ||
        col("d.del_max") >= col("m.max_value"))).as("_rescan")
    // one CDF pass total: fold once, then both the rescan-key probe and the
    // upsert union read the checkpointed result
    val folded = j.select(dimCols ++ Seq(nRows, sumV,
      least(col("m.min_value"), col("d.add_min")).as("min_value"),
      greatest(col("m.max_value"), col("d.add_max")).as("max_value"),
      rescan): _*).localCheckpoint(true)
    // emptied groups skip the rescan (no base rows left — the fold already
    // knows n_rows hit 0 and the delete arm removes them)
    val safe = folded.filter(!coalesce(col("_rescan"), lit(false)) ||
      col("n_rows") <= 0).drop("_rescan")
    val rescanKeys = folded
      .filter(coalesce(col("_rescan"), lit(false)) && col("n_rows") > 0)
      .select(dims.map(col): _*)
    val upserts = (if (rescanKeys.isEmpty) safe else {
      // fallback: recompute exactly the endangered groups from the base
      // `to` snapshot (dims as stats/partition columns prune this scan)
      val rescanned = base.readVersion(to).join(rescanKeys, dims, "left_semi")
        .groupBy(dims.map(col): _*).agg(
          count(lit(1)).as("n_rows"), sum(col(valueCol)).as("sum_value"),
          min(col(valueCol)).as("min_value"), max(col(valueCol)).as("max_value"))
      safe.unionByName(rescanned)
    }).withColumn("updated_to", lit(to))
    mv.merge(upserts, keyCols = dims, orderCol = "updated_to",
      deleteWhen = Some(col("n_rows") <= 0))
  }
}
