package graft

import org.apache.spark.sql.functions._

import graft.streaming.{EventStreams, StatefulStreams}

/** Custom keyed state: running user totals in update mode must converge to
  * the batch per-user aggregates.
  */
class StatefulStreamSpec extends SparkSpec {

  test("mapGroupsWithState running totals converge to batch totals") {
    val dir = sf("sf0.001")
    val q = StatefulStreams
      .runningUserTotals(EventStreams.readEvents(spark, s"$dir/events.parquet*"))
      .writeStream.outputMode("update")
      .format("memory").queryName("totals_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    // last update per user is the final running total
    val latest = spark.table("totals_out")
      .groupBy("user_id")
      .agg(max(col("n_events")).as("n_events"),
        max(col("total_value")).as("total_value"))

    val batch = Tables.events(spark, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))

    val joined = latest.as("s").join(batch.as("b"), "user_id")
      .filter(col("s.n_events") =!= col("b.n_events") ||
        abs(col("s.total_value") - col("b.total_value")) > 1e-6)
    assert(joined.isEmpty)
    assert(latest.count() == batch.count())
  }
}
