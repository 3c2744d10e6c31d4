package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics the oracles can't see at test scale: null payloads
  * on the matched row stay null (struct carry, not per-column carry), and
  * the direction surface (backward / forward / nearest with backward-tie).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // rights: (user, ts, id, value) — the ts-10 row has a NULL payload
  private def rights = Seq(
    (1L, 5.0, 50L, Option(2.0)),
    (1L, 10.0, 100L, Option.empty[Double])
  ).toDF("user_id", "ts", "event_id", "value")

  private def lefts(ts: Double*) = ts.zipWithIndex
    .map { case (t, i) => (1L, t, 1000L + i) }
    .toDF("user_id", "ts", "event_id")

  private def run(left: org.apache.spark.sql.DataFrame, dir: String,
                  tol: Option[Long] = None): Map[Double, Option[Double]] =
    AsOfJoin.asofLeft(left, rights, keyCol = "user_id", tsCol = "ts",
        payloadCols = Seq("value"), tieCol = "event_id",
        toleranceSeconds = tol, direction = dir)
      .select("ts", "right_value").collect()
      .map(r => r.getDouble(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

  test("matched row's null payload stays null — never leaks an older value") {
    val out = run(lefts(12.0), "backward")
    // latest right at ts<=12 is ts=10 whose value IS null; the ts=5 value
    // (2.0) must NOT be substituted
    assert(out(12.0).isEmpty)
  }

  test("forward matches the earliest right at or after left.ts") {
    val out = run(lefts(3.0, 7.0, 11.0), "forward")
    assert(out(3.0).contains(2.0))  // next right is ts=5
    assert(out(7.0).isEmpty)        // next right is ts=10, null payload
    assert(out(11.0).isEmpty)       // no right after 11
  }

  test("nearest picks the closer side; equal distance prefers backward") {
    val out = run(lefts(7.0, 7.5, 9.9), "nearest")
    assert(out(7.0).contains(2.0))  // back Δ2 beats fwd Δ3
    assert(out(7.5).contains(2.0))  // Δ2.5 tie → backward
    assert(out(9.9).isEmpty)        // fwd Δ0.1 wins; its payload is null
  }

  test("nearest honors tolerance on the chosen side") {
    val out = run(lefts(20.0), "nearest", tol = Some(5L))
    assert(out(20.0).isEmpty)       // nearest is ts=10 at Δ10 > 5
  }

  test("inclusive match at equal ts in both directions") {
    assert(run(lefts(5.0), "backward")(5.0).contains(2.0))
    assert(run(lefts(5.0), "forward")(5.0).contains(2.0))
  }
}
