package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg
import graft.sources.VersionedTable

/** CDF-driven aggregate maintenance contract: maintained view equals a full
  * recompute after merges and deletes, cross-group moves split the update's
  * pre/post images across groups, zero-count groups leave the view, no-op
  * changes produce no upserts, and applyDeltas is null-safe on dims.
  */
class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("iagg_spec").resolve("t").toString

  private def base(rows: (Long, String, Long, Long)*) =
    rows.toDF("id", "grp", "v", "updated_at")

  private def recompute(df: DataFrame): Set[(String, Long, Long)] =
    df.groupBy("grp").agg(count(lit(1)), sum("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def mvRows(mv: VersionedTable): Set[(String, Long, Long)] =
    mv.read().select("grp", "n_rows", "sum_value").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("maintained view equals full recompute across merge and delete") {
    val bt = VersionedTable(spark, freshRoot())
    val mv = VersionedTable(spark, freshRoot())
    val v0 = bt.overwrite(base(
      (1L, "a", 10L, 1L), (2L, "a", 20L, 1L), (3L, "b", 5L, 1L)))
    IncrementalAgg.bootstrap(mv, bt, Seq("grp"), "v")
    assert(mvRows(mv) == Set(("a", 2L, 30L), ("b", 1L, 5L)))

    // update 2 within-group (+5), move 3 b→c, insert 4 into b
    val v1 = bt.merge(base(
      (2L, "a", 25L, 2L), (3L, "c", 5L, 2L), (4L, "b", 7L, 2L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    IncrementalAgg.maintain(mv, bt, v0, v1, Seq("id"), Seq("grp"), "v")
    assert(mvRows(mv) == recompute(bt.read()))
    assert(mvRows(mv) == Set(("a", 2L, 35L), ("b", 1L, 7L), ("c", 1L, 5L)))

    // delete empties group c entirely → its row must leave the view
    val v2 = bt.delete(col("grp") === "c")
    IncrementalAgg.maintain(mv, bt, v1, v2, Seq("id"), Seq("grp"), "v")
    assert(mvRows(mv) == recompute(bt.read()))
    assert(!mvRows(mv).exists(_._1 == "c"))
  }

  test("no-op change feed produces no upserts (deltas filter)") {
    val bt = VersionedTable(spark, freshRoot())
    val mv = VersionedTable(spark, freshRoot())
    val v0 = bt.overwrite(base((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    IncrementalAgg.bootstrap(mv, bt, Seq("grp"), "v")
    val mvV = mv.latestVersion.get
    // update that changes ONLY the non-aggregated updated_at column: the
    // CDF emits a pre/post pair but the group deltas net to (0, 0)
    val v1 = bt.merge(base((1L, "a", 10L, 9L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    IncrementalAgg.maintain(mv, bt, v0, v1, Seq("id"), Seq("grp"), "v")
    assert(mvRows(mv) == recompute(bt.read()))
    // merge commits a version even with zero upsert rows; the VIEW content
    // must be byte-stable — and group a's row must not have been rewritten
    // (its updated_to still carries the bootstrap version)
    val upd = mv.read().select("grp", "updated_to").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(upd == Map("a" -> v0, "b" -> v0), s"unexpected rewrites: $upd")
    assert(mv.latestVersion.get >= mvV)
  }

  test("only affected groups are rewritten on a narrow merge") {
    val bt = VersionedTable(spark, freshRoot())
    val mv = VersionedTable(spark, freshRoot())
    val v0 = bt.overwrite(base(
      (1L, "a", 10L, 1L), (2L, "b", 20L, 1L), (3L, "c", 30L, 1L)))
    IncrementalAgg.bootstrap(mv, bt, Seq("grp"), "v")
    val v1 = bt.merge(base((1L, "a", 11L, 2L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    IncrementalAgg.maintain(mv, bt, v0, v1, Seq("id"), Seq("grp"), "v")
    val upd = mv.read().select("grp", "updated_to").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a saw the refresh; b and c kept their bootstrap-era rows
    assert(upd == Map("a" -> v1, "b" -> v0, "c" -> v0))
    assert(mvRows(mv) == recompute(bt.read()))
  }

  test("applyDeltas is null-safe on dims and drops empty groups") {
    val mv = Seq((Some("a"), 2L, 30L), (None: Option[String], 1L, 7L))
      .toDF("grp", "n_rows", "sum_value")
    val delta = Seq((None: Option[String], -1L, -7L), (Some("d"), 1L, 4L))
      .toDF("grp", "d_rows", "d_value")
    val out = IncrementalAgg.applyDeltas(mv, delta, Seq("grp"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    // the null-dim group matched via <=> and emptied out; d is new
    assert(out == Set((Some("a"), 2L, 30L), (Some("d"), 1L, 4L)))
  }

  private def mvRowsEx(mv: VersionedTable): Map[String, (Long, Long, Long, Long)] =
    mv.read().select("grp", "n_rows", "sum_value", "min_value", "max_value")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  test("extremes: deleting a group's min finds the runner-up (rescan path)") {
    val bt = VersionedTable(spark, freshRoot())
    val mv = VersionedTable(spark, freshRoot())
    val v0 = bt.overwrite(base(
      (1L, "a", 10L, 1L), (2L, "a", 20L, 1L), (3L, "a", 15L, 1L),
      (4L, "b", 5L, 1L)))
    IncrementalAgg.bootstrapExtremes(mv, bt, Seq("grp"), "v")
    assert(mvRowsEx(mv) == Map(
      "a" -> ((3L, 45L, 10L, 20L)), "b" -> ((1L, 5L, 5L, 5L))))
    val v1 = bt.delete(col("id") === 1L) // removes a's current min
    IncrementalAgg.maintainExtremes(mv, bt, v0, v1, Seq("id"), Seq("grp"), "v")
    // only a rescan of group a can know the runner-up is 15
    assert(mvRowsEx(mv) == Map(
      "a" -> ((2L, 35L, 15L, 20L)), "b" -> ((1L, 5L, 5L, 5L))))
  }

  test("extremes: tie on the min keeps it; inside-interval delete folds") {
    val bt = VersionedTable(spark, freshRoot())
    val mv = VersionedTable(spark, freshRoot())
    val v0 = bt.overwrite(base(
      (1L, "a", 10L, 1L), (2L, "a", 10L, 1L), (3L, "a", 15L, 1L),
      (4L, "a", 20L, 1L)))
    IncrementalAgg.bootstrapExtremes(mv, bt, Seq("grp"), "v")
    // one of two equal minima goes — min must survive (multiplicity is
    // unknown to the fold, so this exercises the conservative rescan)
    val v1 = bt.delete(col("id") === 1L)
    IncrementalAgg.maintainExtremes(mv, bt, v0, v1, Seq("id"), Seq("grp"), "v")
    assert(mvRowsEx(mv) == Map("a" -> ((3L, 45L, 10L, 20L))))
    // a strictly-inside deletion endangers nothing
    val v2 = bt.delete(col("id") === 3L)
    IncrementalAgg.maintainExtremes(mv, bt, v1, v2, Seq("id"), Seq("grp"), "v")
    assert(mvRowsEx(mv) == Map("a" -> ((2L, 30L, 10L, 20L))))
  }

  test("extremes: inserts and cross-group moves fold / rescan correctly") {
    val bt = VersionedTable(spark, freshRoot())
    val mv = VersionedTable(spark, freshRoot())
    val v0 = bt.overwrite(base(
      (1L, "a", 10L, 1L), (2L, "a", 20L, 1L), (3L, "b", 5L, 1L)))
    IncrementalAgg.bootstrapExtremes(mv, bt, Seq("grp"), "v")
    // insert a new global min into a; move id 2 (a's max) to b
    val v1 = bt.merge(base((4L, "a", 1L, 2L), (2L, "b", 20L, 2L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    IncrementalAgg.maintainExtremes(mv, bt, v0, v1, Seq("id"), Seq("grp"), "v")
    val expect = bt.read().groupBy("grp").agg(
      count(lit(1)), sum("v"), min("v"), max("v")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(mvRowsEx(mv) == expect)
    assert(mvRowsEx(mv) == Map(
      "a" -> ((2L, 11L, 1L, 10L)), "b" -> ((2L, 25L, 5L, 20L))))
  }

  test("replayed maintain step is a no-op (watermark guard)") {
    val bt = VersionedTable(spark, freshRoot())
    val mv = VersionedTable(spark, freshRoot())
    val v0 = bt.overwrite(base((1L, "a", 10L, 1L), (2L, "b", 20L, 1L)))
    IncrementalAgg.bootstrap(mv, bt, Seq("grp"), "v")
    val v1 = bt.merge(base((1L, "a", 15L, 2L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    val mvV = IncrementalAgg.maintain(mv, bt, v0, v1, Seq("id"), Seq("grp"), "v")
    assert(IncrementalAgg.appliedThrough(mv).contains(v1))
    // a replay of the SAME step must not fold the deltas twice
    val again = IncrementalAgg.maintain(mv, bt, v0, v1, Seq("id"), Seq("grp"), "v")
    assert(again == mvV && mvRows(mv) == Set(("a", 1L, 15L), ("b", 1L, 20L)))
    val exAgain = IncrementalAgg.maintainExtremes(mv, bt, v0, v1,
      Seq("id"), Seq("grp"), "v")
    assert(exAgain == mvV && mvRows(mv) == Set(("a", 1L, 15L), ("b", 1L, 20L)))
  }

  test("extremes refresh rewrites only the affected groups") {
    val bt = VersionedTable(spark, freshRoot())
    val mv = VersionedTable(spark, freshRoot())
    val v0 = bt.overwrite(base(
      (1L, "a", 10L, 1L), (2L, "b", 20L, 1L), (3L, "c", 30L, 1L)))
    IncrementalAgg.bootstrapExtremes(mv, bt, Seq("grp"), "v")
    val v1 = bt.merge(base((1L, "a", 11L, 2L)),
      keyCols = Seq("id"), orderCol = "updated_at")
    IncrementalAgg.maintainExtremes(mv, bt, v0, v1, Seq("id"), Seq("grp"), "v")
    val upd = mv.read().select("grp", "updated_to").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only a's row was touched; b and c keep their bootstrap-era rows
    assert(upd == Map("a" -> v1, "b" -> v0, "c" -> v0))
  }

  test("deltas signs: insert/postimage +, delete/preimage −") {
    val cdf = Seq(
      ("a", 10L, "insert"), ("a", 3L, "update_postimage"),
      ("a", 2L, "update_preimage"), ("b", 5L, "delete"))
      .toDF("grp", "v", "_change_type")
    val out = IncrementalAgg.deltas(cdf, Seq("grp"), "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 1L, 11L), ("b", -1L, -5L)))
  }
}
