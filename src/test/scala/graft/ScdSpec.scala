package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Scd

/** SCD2 interval build: adjacency, the current flag, same-timestamp tie
  * ordering, and null-timestamp drops.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("intervals chain per key and close correctly") {
    val df = Seq(
      (1L, 100L, ts("2024-01-01 00:00:00")),
      (1L, 101L, ts("2024-01-02 00:00:00")),
      (1L, 102L, ts("2024-01-05 00:00:00")),
      (2L, 200L, ts("2024-01-03 00:00:00"))
    ).toDF("k", "id", "ts")
    val got = Scd.scd2(df, Seq("k"), "ts", "id")
      .orderBy("k", "valid_from")
      .select("id", "valid_to", "is_current").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(100L, 101L, 102L, 200L))
    assert(got(0).getTimestamp(1) == ts("2024-01-02 00:00:00")) // abuts next
    assert(got(1).getTimestamp(1) == ts("2024-01-05 00:00:00"))
    assert(got(2).isNullAt(1) && got(2).getBoolean(2)) // open + current
    assert(got(3).isNullAt(1) && got(3).getBoolean(2)) // singleton key
    assert(!got(0).getBoolean(2) && !got(1).getBoolean(2))
  }

  test("same-timestamp changes order by the tiebreaker") {
    val t = ts("2024-06-01 12:00:00")
    val df = Seq((1L, 5L, t), (1L, 3L, t), (1L, 9L, t)).toDF("k", "id", "ts")
    val got = Scd.scd2(df, Seq("k"), "ts", "id")
      .orderBy("id").select("id", "is_current").collect()
    // tie order is id asc → only the max id is current
    assert(got.map(r => r.getLong(0) -> r.getBoolean(1)).toSeq ==
      Seq(3L -> false, 5L -> false, 9L -> true))
  }

  test("undated changes are dropped, not current-forever") {
    val df = Seq(
      (1L, 1L, Some(ts("2024-01-01 00:00:00"))),
      (1L, 2L, None)
    ).toDF("k", "id", "ts")
    val got = Scd.scd2(df, Seq("k"), "ts", "id").collect()
    assert(got.length == 1 && got.head.getAs[Long]("id") == 1L)
  }
}
