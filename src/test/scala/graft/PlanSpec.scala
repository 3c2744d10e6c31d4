package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.sources.Lakehouse

/** Physical-plan regression guards: the properties that make these queries
  * scale (pushdown, broadcast, partition pruning) must stay visible in the
  * formatted plan.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.all(name).build(spark, sf("sf0.01"))
      .queryExecution.explainString(FormattedMode)

  test("filters and projection push into the parquet scan") {
    val p = plan("rel_filter_project")
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"))
    assert(p.contains("GreaterThan(l_discount,0.05)"))
    // pruned read schema: only the 5 referenced columns reach the scan
    assert(!p.contains("l_comment") && !p.contains("l_tax"))
  }

  test("predicate pushes through the column-mapping projection to the scan") {
    import graft.sources.VersionedTable
    val root = Files.createTempDirectory("plan_map").resolve("t").toString
    val vt = VersionedTable(spark, root, statsCols = Seq("k"))
    import spark.implicits._
    vt.overwrite((1L to 100L).map(i => (i, s"p$i")).toDF("k", "p"))
    vt.renameColumn("k", "key")
    val p = vt.readWhere(col("key") >= 50L).queryExecution
      .explainString(FormattedMode)
    // the alias projection must not strand the filter above the scan
    assert(p.contains("PushedFilters:") &&
      p.contains("GreaterThanOrEqual(k,50)"), p)
  }

  test("group top-k aggregator plans partial aggregation, not a window sort") {
    val p = plan("rel_group_topk_agg")
    // the whole point vs the row_number plan: no per-group global sort,
    // and a partial (map-side) aggregate before the exchange
    assert(!p.contains("Window"), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"), p)
  }

  test("shard packing never plans a single-partition global window") {
    val p = plan("corpus_shards")
    // the distributed prefix sum's windows are per-bucket; a global-order
    // window would surface as a SinglePartition exchange
    assert(!p.contains("SinglePartition"), p)
  }

  test("unigram encode: map-side Viterbi, partial aggregation, no " +
    "single-partition stage, no cartesian product") {
    val p = plan("text_unigram_encode")
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the per-doc tallies combine map-side before the doc-grain exchange
    assert(p.contains("HashAggregate"), p)
  }

  test("dimension joins broadcast; no dimension sort-merge") {
    val p = plan("rel_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"))
    assert(p.contains("EqualTo(r_name,ASIA)")) // filter pushed into region scan
  }

  test("gold fused plan: one aggregate exchange, window over aggregated frame") {
    val p = plan("pipe_gold_component_tier")
    // fused plan has no join before the window
    assert(!p.contains("SortMergeJoin"))
    assert(p.contains("Window"))
  }

  test("salted aggregation plans two exchange phases, first on (key, salt)") {
    val p = plan("ev_skewed_user_tally")
    // phase 1 shuffles on (user_id, _salt) — the hot key is spread — then
    // phase 2 re-combines on user_id alone
    assert(p.contains("_salt"))
    val exchanges = "hashpartitioning\\(".r.findAllIn(p).length
    assert(exchanges == 2, s"expected 2 hash exchanges, got $exchanges:\n$p")
  }

  test("group sketch pairs come from equi-joins, never a nested-loop all-pairs") {
    val p = plan("dedup_source_sketch")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("incremental-view delta fold is a null-safe EQUI join, never nested-loop") {
    import spark.implicits._
    val mv = Seq(("a", 2L, 30L)).toDF("grp", "n_rows", "sum_value")
    val delta = Seq(("a", 1L, 5L)).toDF("grp", "d_rows", "d_value")
    val p = graft.operators.IncrementalAgg.applyDeltas(mv, delta, Seq("grp"))
      .queryExecution.explainString(FormattedMode)
    // <=> on the dims must plan as a hash/sort-merge equi-join (Spark
    // treats null-safe equality as a join key); a BNLJ here would make
    // every refresh O(|view| × |delta|)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("pareto frontier never plans a single-partition global sort") {
    val p = plan("rel_skyline")
    // the sweep windows are per-bucket and the cross-bucket prefix-max is
    // an nBuckets-row frame; the input-sized path must never serialize
    // through one partition. The tiny prefix window DOES plan a
    // SinglePartition exchange — over ≤ nBuckets rows — so assert on the
    // data-sized side instead: the bucket window's partitioning survives.
    assert(p.contains("hashpartitioning(bucket"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("co-occurrence pairs come from equi-joins, never a nested-loop") {
    val p = plan("sim_cooccur")
    // every join (basket self-join, two degree joins) is an equi-join;
    // item cardinality is unbounded at scale, so degree-side broadcast is
    // AQE's runtime call, not a static hint — the static plan just must
    // never degrade to an all-pairs nested loop
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("OLS trend is one hash aggregate, no window, no join") {
    import spark.implicits._
    val pts = (1L to 100L).map(i => ("g", i, i * 3)).toDF("g", "x", "y")
    val p = graft.operators.Trend.olsTrend(pts, Seq("g"), "x", "y")
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("expectations audit is one aggregate scan regardless of rule count") {
    val p = plan("pipe_expectations")
    // one scan of orders: a pass per rule would plan N scans/unions.
    // Count the detail-section headers "(n) Scan parquet" — the tree line
    // and its detail entry both contain the phrase, so a raw substring
    // count double-counts every node.
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).length
    assert(scans == 1, s"expected 1 scan, got $scans:\n$p")
    assert(!p.contains("Union"), p)
  }

  test("cross-correlation folds the lag into an equi-join, never a nested loop") {
    val p = plan("ev_ccf")
    // the x⋈y-expanded pair join must be a HASH join on the shifted
    // bucket; the only nested-loop nodes allowed are the broadcast cross
    // joins against single-row stat frames / the 7-row lag spine
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("rolling distinct actives plans no window function at all") {
    val p = plan("ev_rolling_actives")
    // the set-union semantics run as expand + re-distinct hash aggs; the
    // only SinglePartition exchange allowed is the single-row bounds agg
    assert(!p.contains("Window"), p)
  }

  test("multi-touch attribution pairs come from the banded equi-join") {
    val p = plan("ev_multitouch")
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("seasonality strength is two hash aggregates, no window, no self-join") {
    val p = plan("ev_seasonality")
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("hampel filter plans no sliding window — offset expansion + hash aggs") {
    val p = plan("ev_hampel")
    // the rolling median/MAD run as (key, center)-keyed aggregates over
    // the offset-expanded frame; a window formulation would serialize
    // each series into one partition
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("repeated spans: flags come from an equi-join; merge window is doc-keyed") {
    val p = plan("dedup_repeated_spans")
    // the multiplicity flags must return via a hash equi-join on the
    // shingle hash — an all-pairs formulation would be a cross product —
    // and the only window is the per-doc merge (partitioned, never a
    // SinglePartition global order)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(!p.contains("SinglePartition"), p)
  }

  test("gapped burn rate plans no single-partition global window") {
    val p = plan("ev_burn_rate_gapped")
    // the trailing sum is cum(i) - cum(i-24) via the range-bucketed
    // prefix sum + a shifted equi-join; the windows are per-bucket
    assert(!p.contains("SinglePartition"), p)
  }

  test("semantic dedup joins only within LSH bands — never a cross product") {
    val p = plan("dedup_semantic")
    // candidate generation must be the (band, bucket) equi-join; an
    // all-pairs cosine would surface as a cartesian / nested-loop join
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoop"), p)
  }

  test("BFS frontier rounds plan equi-joins only, no cartesian") {
    val p = plan("rel_bfs_depth")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"), p)
  }

  test("CM/HLL sketch aggregation is one partial-combining aggregate, no Expand") {
    // the sketch path alone (the 100 TB story): state is d·w longs / 64
    // ints, combined map-side — no per-key shuffle, no count-distinct
    // Expand anywhere (the declared queries add an exact twin column for
    // the accuracy readout, so guard the bare sketch plan here)
    val ev = Tables.events(spark, sf("sf0.001"))
    val hll = udf_free_hll(ev)
    assert(!hll.contains("Expand"), hll)
    assert(hll.contains("ObjectHashAggregate"), hll)
  }

  private def udf_free_hll(ev: org.apache.spark.sql.DataFrame): String = {
    val hll = udaf(new graft.functions.Hll)
    ev.groupBy("event_type").agg(hll(col("user_id").cast("string")))
      .queryExecution.explainString(FormattedMode)
  }

  test("BM25 / KN / KL scoring joins are equi-joins; stats sides broadcast-eligible") {
    for (q <- Seq("text_bm25", "text_lm_kneser_ney", "text_novelty_kl")) {
      val p = plan(q)
      // the only cross join allowed is the broadcast single-row stats frame
      assert(!p.contains("CartesianProduct"), s"$q:\n$p")
      // count plan NODES (formatted mode prints each once as "(n) Op"),
      // not tree lines, which would double-count
      val nested = p.linesIterator
        .count(_.matches("""\(\d+\) BroadcastNestedLoopJoin.*"""))
      // KN's totals frame is built from TWO single-row aggregates (bigram
      // types × vocab), so up to two 1-row cross broadcasts are by-design
      assert(nested <= 2,
        s"$q: $nested nested-loop joins (only 1-row stats broadcasts are allowed)")
    }
  }

  test("partitioned write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    val df = Tables.orders(spark, sf("sf0.001"))
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
    Lakehouse.writePartitioned(df, dir, Seq("month"))
    val read = spark.read.parquet(dir).filter(col("month") === "1995-03")
    val p = read.queryExecution.explainString(FormattedMode)
    assert(p.contains("PartitionFilters: [isnotnull(month"))
    assert(read.count() > 0)
    val pruned = read.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numFiles")
    assert(pruned.isDefined)
  }
}
