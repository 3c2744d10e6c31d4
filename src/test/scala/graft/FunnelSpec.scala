package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Funnel

/** windowFunnel semantics: greedy earliest-match, strict ordering between
  * steps, whole chain inside the window anchored at step 1, prefix levels,
  * and invariance to input partitioning/order (the fold sorts).
  */
class FunnelSpec extends SparkSpec {

  private val W = 1000L * 1000000L // 1000 s in micros

  private def ev(rows: (Long, Long, String)*) = {
    import spark.implicits._
    rows.toDF("user_id", "sec", "event_type")
      .select(col("user_id"),
        timestamp_micros(col("sec") * 1000000L).as("ts"), col("event_type"))
  }

  private def levelOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Funnel.levels(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), W)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("greedy earliest chain with strict step ordering") {
    val lv = levelOf(ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full
      (2L, 10L, "view"), (2L, 10L, "click"), // same ts: click not AFTER view
      (3L, 10L, "click"), (3L, 20L, "view"), // wrong order: only view counts
      (4L, 10L, "view")))
    assert(lv == Map(1L -> 3L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("the whole chain must fit the window anchored at the FIRST view") {
    val lv = levelOf(ev(
      // click inside, purchase at anchor+1001s — outside
      (1L, 0L, "view"), (1L, 500L, "click"), (1L, 1001L, "purchase"),
      // a LATER view would fit, but greedy anchors at the first view
      (2L, 0L, "view"), (2L, 1500L, "view"), (2L, 1600L, "click")))
    assert(lv == Map(1L -> 2L, 2L -> 1L))
  }

  test("level 0 for entities never hitting step 1; result order-invariant") {
    val base = ev((1L, 10L, "error"), (1L, 20L, "signup"),
      (2L, 10L, "view"), (2L, 15L, "click"))
    assert(levelOf(base) == Map(1L -> 0L, 2L -> 2L))
    assert(levelOf(base.orderBy(desc("ts")).repartition(7)) ==
      Map(1L -> 0L, 2L -> 2L))
  }
}
