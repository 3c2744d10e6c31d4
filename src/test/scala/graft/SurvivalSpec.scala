package graft

import graft.operators.Survival

/** Kaplan-Meier against hand-computed lifelines-style tables, including
  * the censoring accounting and the risk-set-exhausted zero row.
  */
class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600000000L // 1h in micros

  private def ev(u: Long, hour: Long, t: String) =
    (u, java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(hour * 3600)), t)

  test("textbook KM: conversions and censoring shape the curve") {
    // u1 converts at +1h, u2 at +2h, u3 censored at +1h (last seen),
    // u4 never converts and is last seen at +3h
    val events = Seq(
      ev(1, 0, "signup"), ev(1, 1, "purchase"),
      ev(2, 0, "signup"), ev(2, 2, "purchase"),
      ev(3, 0, "signup"), ev(3, 1, "view"),
      ev(4, 0, "signup"), ev(4, 3, "view"))
      .toDF("user_id", "ts", "event_type")
    val r = Survival.kaplanMeier(events, "user_id", "ts", "event_type",
      "signup", "purchase", H)
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    // t=1: risk 4, 1 event, 1 censored → S = 3/4
    assert(r(1L) == ((4L, 1L, 1L, 0.75)))
    // t=2: risk 2 (u3 left), 1 event → S = 3/4 · 1/2 = 3/8
    assert(r(2L) == ((2L, 1L, 0L, 0.375)))
    assert(r.size == 2) // censoring-only rows are not emitted
  }

  test("risk set exhausted by events pins survival to exact zero") {
    val events = Seq(
      ev(1, 0, "signup"), ev(1, 1, "purchase"),
      ev(2, 0, "signup"), ev(2, 1, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = Survival.kaplanMeier(events, "user_id", "ts", "event_type",
      "signup", "purchase", H).collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 2L)
    assert(r(0).getDouble(4) == 0.0) // exact zero, not exp(ln(0))
  }

  test("pre-origin target events are ignored; origin-less subjects drop") {
    // u1's purchase BEFORE signup must not count as conversion; u9 has
    // no signup and must not enter the risk set
    val events = Seq(
      ev(1, 1, "purchase"), ev(1, 2, "signup"), ev(1, 4, "view"),
      ev(9, 0, "purchase"))
      .toDF("user_id", "ts", "event_type")
    val r = Survival.kaplanMeier(events, "user_id", "ts", "event_type",
      "signup", "purchase", H).collect()
    assert(r.isEmpty) // u1 is censored at +2h — no conversion rows at all
  }
}
