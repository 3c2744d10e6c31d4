package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM (recency / frequency / monetary) customer segmentation — the
  * classic behavioral scoring grid. Each metric is bucketed into quintile
  * scores 1..5.
  *
  * Scale shape: the textbook `ntile(5) OVER (ORDER BY metric)` needs a
  * GLOBAL total order — one partition holding every customer, the exact
  * window-without-partition trap. Here scores come from exact
  * interpolated quintile THRESHOLDS instead: one per-customer aggregate,
  * one single-row percentile aggregate over it (broadcast back), then a
  * per-row `1 + (# thresholds strictly below the metric)` comparison —
  * no sort, no single-partition stage, deterministic under any row order
  * (scores depend only on VALUES, not rank positions, so ties never need
  * a tie-break). Threshold interpolation is Spark `percentile` ≡ DuckDB
  * `quantile_cont`, the equivalence the rel_percentiles gate pins.
  *
  * Monetary sums route through decimal(18,2) so association order can't
  * smear the quintile edges; recency compares exact integer micros.
  *
  * `accuracy` is the scale knob: 0 (default) keeps exact interpolated
  * `percentile` — a TypedImperativeAggregate that buffers every
  * per-customer metric in one buffer, fine up to millions of customers
  * and the oracle-gated mode; a positive value swaps in
  * `percentile_approx` at that accuracy (bounded, mergeable sketch) for
  * customer populations too large to buffer on one executor. Same plan
  * shape, same scoring expression; ThresholdKnobSpec pins the two modes'
  * score agreement on the test corpus.
  */
object Rfm {

  def scores(orders: DataFrame, custCol: String, dateCol: String,
             amountCol: String, accuracy: Int = 0): DataFrame = {
    val base = orders.groupBy(custCol).agg(
      // cast handles TIMESTAMP_NTZ parquet columns; the session is pinned
      // UTC (GraftSession), so the cast is micros-identity either way
      unix_micros(max(col(dateCol)).cast("timestamp")).as("rec_us"),
      count(lit(1)).as("frequency"),
      sum(col(amountCol).cast("decimal(18,2)")).as("monetary_d"))

    val qs = array(Seq(0.2, 0.4, 0.6, 0.8).map(lit): _*)
    def pct(c: Column): Column =
      if (accuracy > 0) percentile_approx(c.cast("double"), qs, lit(accuracy))
      else percentile(c, qs)
    val thresholds = base.agg(
      pct(col("rec_us")).as("qr"),
      pct(col("frequency")).as("qf"),
      pct(col("monetary_d").cast("double")).as("qm"))

    // 1 + number of quintile edges strictly below the metric; ties land
    // in the lower bucket on both engines by construction
    def score(metric: Column, edges: Column): Column =
      (0 until 4).map(i => when(metric > edges.getItem(i), 1).otherwise(0))
        .foldLeft(lit(1))(_ + _)

    val scored = base.crossJoin(broadcast(thresholds)).select(
      col(custCol),
      col("frequency"),
      col("monetary_d").cast("double").as("monetary"),
      score(col("rec_us").cast("double"), col("qr")).as("r_score"),
      score(col("frequency").cast("double"), col("qf")).as("f_score"),
      score(col("monetary_d").cast("double"), col("qm")).as("m_score"))
    scored.withColumn("segment",
      concat(col("r_score").cast("string"), col("f_score").cast("string"),
        col("m_score").cast("string")))
  }
}
