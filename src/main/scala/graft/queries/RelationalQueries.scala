package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.QueryDef.round6

/** Relational operator coverage over the TPC-H-ish tables: scans with
  * pushdown, broadcast multi-joins, semi/anti joins, exact percentiles,
  * rollup, windows (running totals + top-n), set ops, top-k.
  *
  * Float determinism policy: any sum over non-integral doubles goes through
  * `decimal(18,s)` (exact, order-independent) and is cast back to double at
  * the boundary; averages are computed as exact-decimal-sum / count so both
  * engines perform the identical double division. `l_quantity` sums stay
  * plain doubles — integral values are exact in IEEE754 far past this scale.
  */
object RelationalQueries {

  /** Exact order-independent sum of a fixed-point double column. */
  private def decSum(c: Column, scale: Int): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  private def decAvg(c: Column, scale: Int): Column =
    decSum(c, scale) / count(lit(1))

  val defs: Map[String, QueryDef] = Map(

    // P7/P8/S-class: filtered, projected scan — predicate + column pushdown
    "rel_filter_project" -> QueryDef(
      build = (s, dir) => Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-04-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
      oracle = Some(
        """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          |  AND l_shipdate < TIMESTAMP '1998-04-01' AND l_discount > 0.05""".stripMargin)
    ),

    // A-class: TPC-H Q1 pricing summary
    "rel_pricing_summary" -> QueryDef(
      // fanOut (guide §2.5): the single-row-group scan made the whole
      // scan+partial-agg map side ONE task; hash-spread on the
      // high-cardinality order key parallelizes the 6-measure partial
      // aggregate, and at scale (many row groups) it is a no-op
      build = (s, dir) => round6(graft.operators.ScanParallel.fanOut(
          Tables.lineitem(s, dir)
            .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
            .select(col("l_returnflag"), col("l_linestatus"),
              col("l_quantity"), col("l_extendedprice"), col("l_discount"),
              col("l_orderkey")),
          Seq(col("l_orderkey")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          decSum(col("l_extendedprice"), 2).as("sum_base_price"),
          decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("sum_disc_price"),
          avg(col("l_quantity")).as("avg_qty"),
          (decSum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
          decAvg(col("l_discount"), 2).as("avg_disc"),
          count(lit(1)).as("count_order"))),
      oracle = Some(
        """SELECT l_returnflag, l_linestatus,
          |       round(sum(l_quantity), 6) AS sum_qty,
          |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_base_price,
          |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS sum_disc_price,
          |       round(avg(l_quantity), 6) AS avg_qty,
          |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
          |       round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
          |       count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin),
      headline = true
    ),

    // SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN):
    // the one "UDF" this engine will ever add, because it is NOT a black
    // box — Catalyst inlines the body into the plan (the explain shows a
    // plain codegen'd Project, no UDF call), so the zero-UDF performance
    // story survives. The decimal-sum scale is 6 — the 2dp x 2dp x 2dp
    // product has exactly 6 decimal digits, so the cast never makes a
    // rounding DECISION (Spark rounds the shortest decimal repr HALF_UP,
    // DuckDB rounds the exact binary — they disagree on ~0.6% of rows at
    // scale 4, and agree always when the value is scale-exact); the
    // oracle inlines the identical arithmetic.
    "rel_sql_function" -> QueryDef(
      build = (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("v_li_sqlfn")
        s.sql(
          """CREATE OR REPLACE TEMPORARY FUNCTION graft_net(
            |  p DOUBLE, d DOUBLE, t DOUBLE)
            |RETURNS DOUBLE RETURN p * (1.0 - d) * (1.0 + t)""".stripMargin)
        s.sql(
          """SELECT l_returnflag, count(*) AS n,
            |       round(CAST(sum(CAST(
            |         graft_net(l_extendedprice, l_discount, l_tax)
            |         AS DECIMAL(18,6))) AS DOUBLE), 6) AS net_revenue
            |FROM v_li_sqlfn GROUP BY l_returnflag""".stripMargin)
      },
      oracle = Some(
        """SELECT l_returnflag, count(*) AS n,
          |       round(CAST(sum(CAST(
          |         l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
          |         AS DECIMAL(18,6))) AS DOUBLE), 6) AS net_revenue
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    ),

    // J-class: Q5-style multi-join with broadcast dims; local-supplier cond
    "rel_revenue_by_nation" -> QueryDef(
      build = (s, dir) => {
        val nations = Tables.nation(s, dir)
          .join(Tables.region(s, dir).filter(col("r_name") === "ASIA"),
            col("n_regionkey") === col("r_regionkey"))
        val cust = Tables.customer(s, dir)
          .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        round6(Tables.lineitem(s, dir)
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, dir)),
            col("l_suppkey") === col("s_suppkey") &&
              col("s_nationkey") === col("c_nationkey"))
          .groupBy("n_name")
          .agg(
            decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("revenue"),
            count(lit(1)).as("n_items")))
      },
      oracle = Some(
        """SELECT n_name,
          |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
          |       count(*) AS n_items
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
          |JOIN nation ON c_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1997-01-01'
          |GROUP BY n_name""".stripMargin),
      headline = true
    ),

    // O-class: Q3-style top-k by aggregated revenue, deterministic tiebreak
    "rel_topk_orders" -> QueryDef(
      build = (s, dir) => {
        val cust = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val revenue =
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)"))
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") > lit("1996-01-01").cast("timestamp"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy("o_orderkey", "o_orderpriority")
          .agg(revenue.as("rev_dec"))
          .orderBy(desc("rev_dec"), col("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), col("o_orderpriority"),
            round(col("rev_dec").cast("double"), 6).as("revenue"))
      },
      oracle = Some(
        """SELECT o_orderkey, o_orderpriority,
          |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue
          |FROM lineitem
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-01-01'
          |  AND l_shipdate > TIMESTAMP '1996-01-01'
          |GROUP BY o_orderkey, o_orderpriority
          |ORDER BY sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) DESC, o_orderkey
          |LIMIT 10""".stripMargin)
    ),

    // J-class: left-semi + left-anti joins
    "rel_semi_anti" -> QueryDef(
      build = (s, dir) => {
        val cust = Tables.customer(s, dir)
        val ord = Tables.orders(s, dir).select("o_custkey")
        val withO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n_with_orders"))
        val withoutO = cust.join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(count(lit(1)).as("n_without_orders"))
        withO.join(withoutO, Seq("segment"), "outer")
          .select(col("segment"),
            coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
            coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      },
      oracle = Some(
        """SELECT c_mktsegment AS segment,
          |       CAST(sum(CASE WHEN has_o THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders,
          |       CAST(sum(CASE WHEN has_o THEN 0 ELSE 1 END) AS BIGINT) AS n_without_orders
          |FROM (SELECT c_mktsegment, c_custkey IN (SELECT o_custkey FROM orders) AS has_o
          |      FROM customer) t
          |GROUP BY 1""".stripMargin)
    ),

    // A4/A5-class: exact interpolated percentiles per group
    "rel_percentiles" -> QueryDef(
      build = (s, dir) => round6(Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          min(col("o_totalprice")).as("min_price"),
          max(col("o_totalprice")).as("max_price"),
          percentile(col("o_totalprice"), lit(0.5)).as("median_price"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90_price"),
          percentile(col("o_totalprice"), lit(0.99)).as("p99_price"))),
      oracle = Some(
        """SELECT o_orderpriority, count(*) AS n,
          |       round(min(o_totalprice), 6) AS min_price,
          |       round(max(o_totalprice), 6) AS max_price,
          |       round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
          |       round(quantile_cont(o_totalprice, 0.9), 6) AS p90_price,
          |       round(quantile_cont(o_totalprice, 0.99), 6) AS p99_price
          |FROM orders GROUP BY o_orderpriority""".stripMargin)
    ),

    // A-class: rollup grouping sets (subtotal rows coalesced to 'ALL')
    "rel_rollup" -> QueryDef(
      build = (s, dir) => Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n")),
      oracle = Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
          |       coalesce(l_linestatus, 'ALL') AS linestatus,
          |       sum(l_quantity) AS sum_qty, count(*) AS n
          |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)
    ),

    // pivot: order-status columns per month
    "rel_pivot_status" -> QueryDef(
      build = (s, dir) => Tables.orders(s, dir)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .pivot("o_orderstatus", Seq("O", "F", "P"))
        .agg(count(lit(1)))
        .select(col("month"),
          coalesce(col("O"), lit(0L)).as("n_open"),
          coalesce(col("F"), lit(0L)).as("n_finished"),
          coalesce(col("P"), lit(0L)).as("n_pending")),
      oracle = Some(
        """SELECT strftime(o_orderdate, '%Y-%m') AS month,
          |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
          |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
          |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
          |FROM orders GROUP BY 1""".stripMargin)
    ),

    // HLL-sketch distinct (approx_count_distinct): no oracle — sketch
    // implementations differ per engine — so the driver records a
    // rows-only check; the error bound vs exact is pinned in ApproxSpec
    "rel_approx_distinct" -> QueryDef(
      build = (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders")),
      oracle = None,
      selfGated = true
    ),

    // approx quantiles via the engine's own mergeable KLL-style sketch
    // (QuantileSketch Aggregator). Sketch state is partitioning-dependent,
    // so the driver records a rows-only check — but the build SELF-GATES:
    // each estimate must land between the exact percentiles at p∓0.02
    // (2% rank tolerance, the bound QuantileSketchSpec pins), so a broken
    // sketch fails the query rather than shipping silently.
    "rel_approx_quantiles" -> QueryDef(
      build = (s, dir) => {
        val sk = udaf(new graft.functions.QuantileSketch(256, Seq(0.5, 0.9)))
        val agg = Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_extendedprice").cast("double").as("price"))
          .groupBy("l_returnflag")
          .agg(sk(col("price")).as("q"),
            expr("percentile(price, array(0.48, 0.52, 0.88, 0.92))").as("bounds"),
            count(lit(1)).as("n_rows"))
          .localCheckpoint(true) // the gate collects AND the result reads it
        agg.collect().foreach { r =>
          val q = r.getSeq[Double](1); val b = r.getSeq[Double](2)
          require(q(0) >= b(0) && q(0) <= b(1) && q(1) >= b(2) && q(1) <= b(3),
            s"sketch outside 2% rank tolerance for ${r.get(0)}: est=$q bounds=$b")
        }
        agg.select(col("l_returnflag"), col("n_rows"),
          round(element_at(col("q"), 1), 4).as("p50_est"),
          round(element_at(col("q"), 2), 4).as("p90_est"))
      },
      oracle = None,
      selfGated = true
    ),

    // A-class: exact distinct counts per group
    "rel_distinct_counts" -> QueryDef(
      build = (s, dir) => Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          count(lit(1)).as("n_rows")),
      oracle = Some(
        """SELECT l_returnflag,
          |       count(DISTINCT l_partkey) AS n_parts,
          |       count(DISTINCT l_suppkey) AS n_supps,
          |       count(DISTINCT l_orderkey) AS n_orders,
          |       count(*) AS n_rows
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    ),

    // co-located fact-fact join via bucketed tables: both sides pre-shuffled
    // into 8 buckets on the join key at WRITE time, so the join itself plans
    // with NO exchange on either side (self-gated on the physical plan) —
    // the write-once/join-many layout for repeated joins at 100 TB. The
    // merge hint keeps the demonstration on the sort-merge path (a broadcast
    // would hide the bucketing); the oracle is the plain SQL join.
    "rel_bucketed_join" -> QueryDef(
      build = (s, dir) => {
        // appId-suffixed names: two concurrent harness runs (verify +
        // bench) must not clobber each other's managed tables
        val sfx = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
        graft.sources.Lakehouse.writeBucketed(
          Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
          s"graft_bk_orders_$sfx", nBuckets = 8, bucketCols = Seq("o_orderkey"))
        graft.sources.Lakehouse.writeBucketed(
          Tables.lineitem(s, dir)
            .select("l_orderkey", "l_quantity", "l_extendedprice"),
          s"graft_bk_lineitem_$sfx", nBuckets = 8, bucketCols = Seq("l_orderkey"))
        val joined = s.table(s"graft_bk_lineitem_$sfx").hint("merge")
          .join(s.table(s"graft_bk_orders_$sfx"),
            col("l_orderkey") === col("o_orderkey"))
        val plan = joined.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        require(plan.contains("SortMergeJoin") &&
          !plan.contains("hashpartitioning(l_orderkey") &&
          !plan.contains("hashpartitioning(o_orderkey"),
          "bucketed join must plan without join-side exchanges")
        joined.groupBy("o_orderpriority").agg(
          count(lit(1)).as("n_items"),
          sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
          sum(floor(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"))
      },
      oracle = Some(
        """SELECT o_orderpriority, count(*) AS n_items,
          |       CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
          |       CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents
          |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |GROUP BY o_orderpriority""".stripMargin)
    ),

    // one-pass column profiler (nulls / exact distinct / native-ordered
    // min-max rendered to engine-stable strings) — the data-quality
    // summary a pipeline publishes per run; ONE scan for all columns
    "rel_profile" -> QueryDef(
      build = (s, dir) => graft.operators.Profile.profile(Tables.orders(s, dir)),
      oracle = Some {
        def arm(c: String, mn: String, mx: String) =
          s"""SELECT '$c' AS "column", count(*) AS n_rows,
             |       CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |       count(DISTINCT $c) AS n_distinct,
             |       $mn AS min_value, $mx AS max_value
             |FROM orders""".stripMargin
        Seq(
          arm("o_orderkey", "CAST(min(o_orderkey) AS VARCHAR)",
            "CAST(max(o_orderkey) AS VARCHAR)"),
          arm("o_custkey", "CAST(min(o_custkey) AS VARCHAR)",
            "CAST(max(o_custkey) AS VARCHAR)"),
          arm("o_orderstatus", "min(o_orderstatus)", "max(o_orderstatus)"),
          arm("o_totalprice",
            "CAST(CAST(round(min(o_totalprice), 6) AS DECIMAL(24,6)) AS VARCHAR)",
            "CAST(CAST(round(max(o_totalprice), 6) AS DECIMAL(24,6)) AS VARCHAR)"),
          arm("o_orderdate", "strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S')",
            "strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')"),
          arm("o_orderpriority", "min(o_orderpriority)", "max(o_orderpriority)")
        ).mkString("\nUNION ALL\n")
      }
    ),

    // the profile's SCALE mode: HLL++ distinct counts keep the single
    // aggregate shape with no Expand (exact multi-distinct is a k-way
    // input multiplication — 3-4× slower already at sf0.1). No SQL oracle:
    // DuckDB's approx sketch differs; the exact twin above is the
    // correctness gate, ProfileSpec pins the approx error (< 5%) and the
    // null/min/max columns are sketch-independent.
    "rel_profile_approx" -> QueryDef(
      build = (s, dir) => graft.operators.Profile.profile(
        Tables.orders(s, dir), exactDistinct = false),
      oracle = None,
      headline = true, // the benched profile path
      selfGated = true
    ),

    // W1-class: monthly counts + running cumulative per priority
    "rel_window_running" -> QueryDef(
      build = (s, dir) => {
        val monthly = Tables.orders(s, dir)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_orderpriority"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy("o_orderpriority").orderBy("month")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        monthly.withColumn("running", sum(col("n")).over(w))
      },
      oracle = Some(
        """WITH monthly AS (
          |  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderpriority,
          |         count(*) AS n
          |  FROM orders GROUP BY 1, 2
          |)
          |SELECT month, o_orderpriority, n,
          |       CAST(sum(n) OVER (PARTITION BY o_orderpriority ORDER BY month
          |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running
          |FROM monthly""".stripMargin)
    ),

    // W-class: ranked top-n per group with deterministic tiebreak
    "rel_window_topn" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("o_orderpriority", "rn", "o_orderkey", "o_totalprice")
      },
      oracle = Some(
        """SELECT o_orderpriority, rn, o_orderkey, o_totalprice
          |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
          |             row_number() OVER (PARTITION BY o_orderpriority
          |                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |      FROM orders) t
          |WHERE rn <= 5""".stripMargin)
    ),

    // W-class: ranking/offset/ntile family in one windowed query
    "rel_window_funcs" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy("o_orderpriority")
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("quartile", ntile(4).over(w))
          .filter(col("rn") <= 20)
          .select("o_orderpriority", "rn", "rnk", "drnk", "o_orderkey",
            "o_totalprice", "prev_price", "next_price", "quartile")
      },
      oracle = Some(
        """SELECT o_orderpriority, rn, rnk, drnk, o_orderkey, o_totalprice,
          |       prev_price, next_price, quartile
          |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
          |             row_number() OVER w AS rn,
          |             rank() OVER w AS rnk,
          |             dense_rank() OVER w AS drnk,
          |             lag(o_totalprice, 1) OVER w AS prev_price,
          |             lead(o_totalprice, 1) OVER w AS next_price,
          |             ntile(4) OVER w AS quartile
          |      FROM orders
          |      WINDOW w AS (PARTITION BY o_orderpriority
          |                   ORDER BY o_totalprice DESC, o_orderkey)) t
          |WHERE rn <= 20""".stripMargin)
    ),

    // A-class: CUBE grouping sets
    "rel_cube" -> QueryDef(
      build = (s, dir) => Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n")),
      oracle = Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
          |       coalesce(l_linestatus, 'ALL') AS linestatus,
          |       sum(l_quantity) AS sum_qty, count(*) AS n
          |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)
    ),

    // A-class: explicit GROUPING SETS with grouping_id — the general form
    // cube/rollup specialize; gid disambiguates subtotal rows from genuine
    // NULL group values (both engines assign the first set column the most
    // significant bit, the Postgres convention)
    "rel_grouping_sets" -> QueryDef(
      build = (s, dir) => Tables.lineitem(s, dir)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"),
          grouping_id().as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"), col("gid")),
      oracle = Some(
        """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
          |       coalesce(l_linestatus, 'ALL') AS linestatus,
          |       sum(l_quantity) AS sum_qty, count(*) AS n,
          |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
          |                        (l_returnflag), ())""".stripMargin)
    ),

    // P-class: UNPIVOT — wide per-group metric columns melt into
    // (group, metric, value) rows. The melt is a map-side Expand (rows ×
    // n_metrics, no shuffle); the only exchange is the upstream aggregate.
    "rel_unpivot" -> QueryDef(
      build = (s, dir) => {
        val per = Tables.lineitem(s, dir).groupBy("l_returnflag")
          .agg(
            decSum(col("l_extendedprice"), 2).as("extendedprice"),
            sum(col("l_quantity")).as("quantity"),
            decSum(col("l_discount"), 2).as("discount"),
            decSum(col("l_tax"), 2).as("tax"))
        round6(per.unpivot(
          Array(col("l_returnflag")),
          Array(col("extendedprice"), col("quantity"),
            col("discount"), col("tax")),
          "metric", "total"))
      },
      oracle = Some(
        """WITH per AS (
          |  SELECT l_returnflag,
          |         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS extendedprice,
          |         CAST(sum(l_quantity) AS DOUBLE) AS quantity,
          |         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS discount,
          |         CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS tax
          |  FROM lineitem GROUP BY l_returnflag
          |)
          |SELECT l_returnflag, 'extendedprice' AS metric, round(extendedprice, 6) AS total FROM per
          |UNION ALL SELECT l_returnflag, 'quantity', round(quantity, 6) FROM per
          |UNION ALL SELECT l_returnflag, 'discount', round(discount, 6) FROM per
          |UNION ALL SELECT l_returnflag, 'tax', round(tax, 6) FROM per""".stripMargin)
    ),

    // A-class: ordered array/string aggregation (collect_list + sort)
    "rel_array_agg" -> QueryDef(
      build = (s, dir) => {
        val w = Window.partitionBy(date_format(col("o_orderdate"), "yyyy-MM"))
          .orderBy(desc("o_totalprice"), col("o_orderkey"))
        val top = Tables.orders(s, dir)
          .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
        top.groupBy("month")
          .agg(array_join(
            expr("transform(array_sort(collect_list(struct(rn, CAST(o_orderkey AS STRING) AS k))), s -> s.k)"),
            ",").as("top_orders"))
      },
      oracle = Some(
        """WITH ranked AS (
          |  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderkey,
          |         row_number() OVER (PARTITION BY strftime(o_orderdate, '%Y-%m')
          |             ORDER BY o_totalprice DESC, o_orderkey) AS rn
          |  FROM orders
          |)
          |SELECT month,
          |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY rn) AS top_orders
          |FROM ranked WHERE rn <= 3 GROUP BY month""".stripMargin)
    ),

    // per-group top-k WITHOUT the window sort: a mergeable Aggregator
    // whose shuffled state is k pairs per group (map-side combine), where
    // the row_number plan sorts every row of every group — the plan you
    // want when groups are huge. Output is pinned identical to the window
    // replay (total order: cents desc, orderkey asc).
    "rel_group_topk_agg" -> QueryDef(
      build = (s, dir) => {
        val top3 = udaf(new graft.functions.GroupTopK(3))
        Tables.orders(s, dir)
          .select(col("o_orderpriority"),
            floor(col("o_totalprice") * 100).cast("long").as("cents"),
            col("o_orderkey"))
          .groupBy("o_orderpriority")
          .agg(top3(col("cents"), col("o_orderkey")).as("top"))
          .select(col("o_orderpriority"), posexplode(col("top")))
          .select(col("o_orderpriority"),
            (col("pos") + 1).cast("long").as("rank"),
            col("col.value").as("cents"), col("col.id").as("o_orderkey"))
      },
      oracle = Some(
        """SELECT o_orderpriority, rank, cents, o_orderkey
          |FROM (SELECT o_orderpriority,
          |             CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
          |             o_orderkey,
          |             row_number() OVER (PARTITION BY o_orderpriority
          |               ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT) DESC,
          |                        o_orderkey) AS rank
          |      FROM orders) t
          |WHERE rank <= 3""".stripMargin)
    ),

    // O-class: global top-k scan
    "rel_topk_parts" -> QueryDef(
      build = (s, dir) => Tables.part(s, dir)
        .orderBy(desc("p_retailprice"), col("p_partkey"))
        .limit(10)
        .select("p_partkey", "p_name", "p_retailprice"),
      oracle = Some(
        """SELECT p_partkey, p_name, p_retailprice
          |FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin)
    ),

    // Q6-style: tight filter + single aggregate (the pushdown microbench)
    "rel_forecast_revenue" -> QueryDef(
      build = (s, dir) => round6(Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.04 &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))),
      oracle = Some(
        """SELECT round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE), 6) AS revenue,
          |       count(*) AS n
          |FROM lineitem
          |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          |  AND l_shipdate < TIMESTAMP '1998-01-01'
          |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin)
    ),

    // Q18-style: HAVING over an aggregated subquery, then enrich
    "rel_large_orders" -> QueryDef(
      build = (s, dir) => {
        val big = Tables.lineitem(s, dir)
          .groupBy("l_orderkey")
          .agg(sum(col("l_quantity")).as("total_qty"))
          .filter(col("total_qty") > 250)
        big.join(Tables.orders(s, dir),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, dir)),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_name"), col("o_totalprice"),
            col("total_qty"))
      },
      oracle = Some(
        """SELECT o_orderkey, c_name, o_totalprice, total_qty
          |FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
          |      FROM lineitem GROUP BY l_orderkey
          |      HAVING sum(l_quantity) > 250) big
          |JOIN orders ON l_orderkey = o_orderkey
          |JOIN customer ON o_custkey = c_custkey""".stripMargin)
    ),

    // SQL-text surface: same semantics driven through spark.sql over views
    "rel_sql_surface" -> QueryDef(
      build = (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("v_orders")
        s.sql(
          """WITH monthly AS (
            |  SELECT date_format(o_orderdate, 'yyyy-MM') AS month,
            |         o_orderstatus, count(*) AS n
            |  FROM v_orders GROUP BY 1, 2
            |)
            |SELECT month, sum(n) AS n_orders,
            |       count(DISTINCT o_orderstatus) AS n_statuses
            |FROM monthly GROUP BY month""".stripMargin)
      },
      oracle = Some(
        """WITH monthly AS (
          |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
          |         o_orderstatus, count(*) AS n
          |  FROM orders GROUP BY 1, 2
          |)
          |SELECT month, CAST(sum(n) AS BIGINT) AS n_orders,
          |       count(DISTINCT o_orderstatus) AS n_statuses
          |FROM monthly GROUP BY month""".stripMargin)
    ),

    // bag-semantics set operations: INTERSECT ALL keeps min-multiplicity,
    // EXCEPT ALL subtracts multiplicities — the duplicate-sensitive twins
    // rel_set_ops' distinct variants can't express (a customer with 3 'F'
    // and 1 'O' orders appears once in the intersection, twice in the
    // difference). Spark's intersectAll/exceptAll plan as aggregates with
    // a replication column, never a row-by-row loop.
    "rel_set_ops_all" -> QueryDef(
      build = (s, dir) => {
        val f = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("custkey"))
        f.intersectAll(o).groupBy("custkey")
          .agg(count(lit(1)).as("n_common"))
          .join(f.exceptAll(o).groupBy("custkey")
            .agg(count(lit(1)).as("n_extra")), Seq("custkey"), "full")
          .select(col("custkey"),
            coalesce(col("n_common"), lit(0L)).as("n_common"),
            coalesce(col("n_extra"), lit(0L)).as("n_extra"))
      },
      oracle = Some(
        """WITH f AS (SELECT o_custkey AS custkey FROM orders
          |           WHERE o_orderstatus = 'F'),
          |o AS (SELECT o_custkey AS custkey FROM orders
          |      WHERE o_orderstatus = 'O'),
          |ia AS (SELECT custkey, count(*) AS n_common
          |       FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM o)
          |       GROUP BY 1),
          |ea AS (SELECT custkey, count(*) AS n_extra
          |       FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM o)
          |       GROUP BY 1)
          |SELECT custkey, coalesce(n_common, 0) AS n_common,
          |       coalesce(n_extra, 0) AS n_extra
          |FROM ia FULL JOIN ea USING (custkey)""".stripMargin)
    ),

    // LATERAL correlated subquery in FROM (SPARK-34382 surface): per
    // customer segment's top-2 orders by price via a correlated
    // ORDER-BY-LIMIT subquery — the "top-N per row" SQL idiom that
    // decorrelates into a ranked window join. Both engines run the
    // IDENTICAL SQL text shape.
    "rel_lateral_topn" -> QueryDef(
      build = (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("v_customer")
        Tables.orders(s, dir).createOrReplaceTempView("v_orders")
        s.sql(
          """SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 6) AS price
            |FROM v_customer c
            |JOIN LATERAL (
            |  SELECT o_orderkey, o_totalprice
            |  FROM v_orders o
            |  WHERE o.o_custkey = c.c_custkey
            |  ORDER BY o_totalprice DESC, o_orderkey
            |  LIMIT 2
            |) t
            |WHERE c.c_mktsegment = 'MACHINERY'""".stripMargin)
      },
      oracle = Some(
        """SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 6) AS price
          |FROM customer c
          |JOIN LATERAL (
          |  SELECT o_orderkey, o_totalprice
          |  FROM orders o
          |  WHERE o.o_custkey = c.c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey
          |  LIMIT 2
          |) t ON true
          |WHERE c.c_mktsegment = 'MACHINERY'""".stripMargin)
    ),

    // Q2-style correlated-subquery pattern: row(s) matching a per-group max
    "rel_top_supplier_per_nation" -> QueryDef(
      build = (s, dir) => {
        val sup = Tables.supplier(s, dir)
        val maxBal = sup.groupBy(col("s_nationkey"))
          .agg(max(col("s_acctbal")).as("max_bal"))
        sup.join(broadcast(maxBal), Seq("s_nationkey"))
          .filter(col("s_acctbal") === col("max_bal"))
          .join(broadcast(Tables.nation(s, dir)),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name"), col("s_suppkey"), col("s_name"),
            col("s_acctbal"))
      },
      oracle = Some(
        """SELECT n_name, s_suppkey, s_name, s_acctbal
          |FROM supplier s JOIN nation ON s_nationkey = n_nationkey
          |WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
          |                   WHERE s2.s_nationkey = s.s_nationkey)""".stripMargin)
    ),

    // Q4-style EXISTS: orders with at least one lineitem shipped after the
    // order date, counted per priority
    "rel_exists_late_ship" -> QueryDef(
      build = (s, dir) => {
        val ord = Tables.orders(s, dir)
        val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
        ord.join(li,
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate"),
            "left_semi")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n_orders"))
      },
      oracle = Some(
        """SELECT o_orderpriority, count(*) AS n_orders
          |FROM orders o
          |WHERE EXISTS (SELECT 1 FROM lineitem l
          |              WHERE l.l_orderkey = o.o_orderkey
          |                AND l.l_shipdate > o.o_orderdate)
          |GROUP BY o_orderpriority""".stripMargin)
    ),

    // §2.10 string scalar-function family
    "rel_string_funcs" -> QueryDef(
      build = (s, dir) => Tables.part(s, dir).select(
        col("p_partkey"),
        lower(col("p_name")).as("lname"),
        upper(col("p_name")).as("uname"),
        length(col("p_name")).cast("long").as("len"),
        substring(col("p_name"), 1, 5).as("pre5"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        instr(col("p_name"), " ").cast("long").as("sp_pos"),
        reverse(col("p_name")).as("rname"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        trim(substring_index(col("p_type"), " ", -1)).as("last_word")),
      oracle = Some(
        """SELECT p_partkey,
          |       lower(p_name) AS lname,
          |       upper(p_name) AS uname,
          |       CAST(length(p_name) AS BIGINT) AS len,
          |       substring(p_name, 1, 5) AS pre5,
          |       replace(p_name, ' ', '_') AS snake,
          |       CAST(instr(p_name, ' ') AS BIGINT) AS sp_pos,
          |       reverse(p_name) AS rname,
          |       concat_ws('|', p_brand, p_type) AS brand_type,
          |       trim(split_part(p_type, ' ', -1)) AS last_word
          |FROM part""".stripMargin)
    ),

    // §2.10 date/math scalar-function family
    "rel_date_math_funcs" -> QueryDef(
      build = (s, dir) => round6(Tables.orders(s, dir).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"),
        abs(col("o_totalprice") - 100000.0).as("abs_diff"),
        sqrt(col("o_totalprice")).as("sqrt_price"),
        ln(col("o_totalprice")).as("ln_price"),
        pow(col("o_totalprice"), 0.5).as("pow_half"))),
      oracle = Some(
        """SELECT o_orderkey,
          |       CAST(year(o_orderdate) AS BIGINT) AS yr,
          |       CAST(month(o_orderdate) AS BIGINT) AS mo,
          |       CAST(day(o_orderdate) AS BIGINT) AS dom,
          |       CAST(isodow(o_orderdate) AS BIGINT) AS isodow,
          |       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
          |       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
          |       CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_2002,
          |       round(abs(o_totalprice - 100000.0), 6) AS abs_diff,
          |       round(sqrt(o_totalprice), 6) AS sqrt_price,
          |       round(ln(o_totalprice), 6) AS ln_price,
          |       round(pow(o_totalprice, 0.5), 6) AS pow_half
          |FROM orders""".stripMargin)
    ),

    // set ops: INTERSECT DISTINCT then EXCEPT DISTINCT
    "rel_set_ops" -> QueryDef(
      build = (s, dir) => {
        val building = Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))
        val finalized = Tables.orders(s, dir)
          .filter(col("o_orderstatus") === "F")
          .select(col("o_custkey").as("custkey"))
        val negative = Tables.customer(s, dir)
          .filter(col("c_acctbal") < 0)
          .select(col("c_custkey").as("custkey"))
        building.intersect(finalized).except(negative)
      },
      oracle = Some(
        """(SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
          | INTERSECT
          | SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F')
          |EXCEPT
          |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0""".stripMargin)
    ),

    // weighted PageRank over the symmetrized customer⋈supplier interaction
    // graph — entity-importance scoring ([[graft.operators.PageRank]]):
    // exactly 5 damped iterations from a uniform start, so the result is a
    // deterministic function of the edge list and the oracle can replay it
    // as 5 mechanically-unrolled SQL stages. Float lockstep: the damping
    // constants are embedded as the exact Java double literals (DuckDB
    // would otherwise evaluate 1 - 0.85 in DECIMAL and diverge), every
    // p·rank product and per-dst sum is the same double math in both
    // engines, and 9-dp rounding absorbs the ~1e-15 association-order
    // residue while keeping 6 significant digits of a ~1e-3 rank.
    "rel_pagerank" -> QueryDef(
      build = (s, dir) => {
        val pairs = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(concat(lit("c"), col("o_custkey")).as("cnode"),
            concat(lit("s"), col("l_suppkey")).as("snode"))
          .agg(count(lit(1)).as("w"))
        val edges = pairs.select(col("cnode").as("src"),
            col("snode").as("dst"), col("w"))
          .unionAll(pairs.select(col("snode").as("src"),
            col("cnode").as("dst"), col("w")))
        graft.operators.PageRank
          .pageRank(edges, "src", "dst", "w", iters = 5, damping = 0.85)
          .select(col("node"), round(col("rank"), 9).as("rank"))
      },
      oracle = Some(pageRankSql(iters = 5, damping = 0.85))
    ),

    // full Pearson correlation matrix over lineitem's four numeric
    // measures in ONE aggregate pass (15 moment sums, all map-side
    // combining — the corpus is scanned once and never shuffled on a
    // data-sized key). Moment sums are exact DECIMAL(28,6) per the
    // pricing-summary convention; the r formula runs in doubles on the
    // exact sums, identically ordered in both engines.
    "rel_corr_matrix" -> QueryDef(
      build = (s, dir) => {
        val cols = Seq("q" -> col("l_quantity"), "p" -> col("l_extendedprice"),
          "d" -> col("l_discount"), "t" -> col("l_tax"))
        def ds(c: org.apache.spark.sql.Column) =
          sum(c.cast("decimal(28,6)")).cast("double")
        val moments =
          Seq(count(lit(1)).cast("double").as("n")) ++
            cols.map { case (a, ca) => ds(ca).as(s"s_$a") } ++
            cols.map { case (a, ca) => ds(ca * ca).as(s"s_$a$a") } ++
            cols.combinations(2).toSeq.map { case Seq((a, ca), (b, cb)) =>
              ds(ca * cb).as(s"s_$a$b") }
        val m = Tables.lineitem(s, dir).agg(moments.head, moments.tail: _*)
        val rs = cols.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
          val cov = col("n") * col(s"s_$a$b") - col(s"s_$a") * col(s"s_$b")
          val va = col("n") * col(s"s_$a$a") - col(s"s_$a") * col(s"s_$a")
          val vb = col("n") * col(s"s_$b$b") - col(s"s_$b") * col(s"s_$b")
          round(cov / sqrt(va * vb), 6).as(s"r_${a}_$b")
        }
        m.select(col("n").cast("long").as("n") +: rs: _*)
      },
      oracle = Some {
        val cols = Seq("q" -> "l_quantity", "p" -> "l_extendedprice",
          "d" -> "l_discount", "t" -> "l_tax")
        def ds(e: String) =
          s"CAST(sum(CAST($e AS DECIMAL(28,6))) AS DOUBLE)"
        val moments =
          Seq("CAST(count(*) AS DOUBLE) AS n") ++
            cols.map { case (a, e) => s"${ds(e)} AS s_$a" } ++
            cols.map { case (a, e) => s"${ds(s"$e * $e")} AS s_$a$a" } ++
            cols.combinations(2).toSeq.map { case Seq((a, ea), (b, eb)) =>
              s"${ds(s"$ea * $eb")} AS s_$a$b" }
        val rs = cols.combinations(2).toSeq.map { case Seq((a, _), (b, _)) =>
          s"round((n * s_$a$b - s_$a * s_$b) / sqrt((n * s_$a$a - s_$a * s_$a) * (n * s_$b$b - s_$b * s_$b)), 6) AS r_${a}_$b"
        }
        s"""WITH m AS (SELECT ${moments.mkString(",\n  ")} FROM lineitem)
           |SELECT CAST(n AS BIGINT) AS n, ${rs.mkString(",\n  ")}
           |FROM m""".stripMargin
      }
    ),

    // BFS hop distance over the customer–supplier interaction graph
    // (symmetrized, seeds = suppliers 1–2): the reachability member of
    // the graph family — frontier relaxation, one shuffle join + one
    // min-agg per round ([[graft.operators.Bfs]]); the oracle is the
    // independent recursive-CTE min-path walk. Pure integer depths, no
    // floats anywhere.
    "rel_bfs_depth" -> QueryDef(
      build = (s, dir) => {
        val pairs = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir),
            col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("cnode"),
            concat(lit("s"), col("l_suppkey")).as("snode"))
          .distinct()
        val edges = pairs.select(col("cnode").as("src"),
            col("snode").as("dst"))
          .unionAll(pairs.select(col("snode").as("src"),
            col("cnode").as("dst")))
        val seeds = Tables.supplier(s, dir)
          .filter(col("s_suppkey") <= 2)
          .select(concat(lit("s"), col("s_suppkey")).as("node"))
        graft.operators.Bfs.hopDistance(edges, seeds, maxHops = 4)
      },
      oracle = Some(graft.operators.Bfs.oracleSql(
        edgesCte =
          """p AS (
            |  SELECT DISTINCT 'c' || o_custkey AS cnode,
            |         's' || l_suppkey AS snode
            |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            |e AS (SELECT cnode AS src, snode AS dst FROM p
            |      UNION ALL SELECT snode, cnode FROM p)""".stripMargin,
        seedsCte =
          "seed AS (SELECT 's' || s_suppkey AS node FROM supplier WHERE s_suppkey <= 2)",
        maxHops = 4))
    ),

    // recursive-CTE BFS (Spark 4's WITH RECURSIVE, SPARK-24497): the
    // driver-looped Bfs.hopDistance re-expressed as ONE SQL statement —
    // the planner now owns the iteration. Spark's recursion admits only
    // UNION ALL, so the recursive step carries SELECT DISTINCT: each
    // step's frontier dedups to ≤ |nodes| rows, which on this cyclic
    // bipartite graph is the difference between 4×|nodes| total rows and
    // ~|edges/node|⁴ enumerated paths. Same min-depth answer, and the
    // oracle is rel_bfs_depth's recursive walk verbatim — three BFS
    // expressions (driver loop, SQL recursion, DuckDB walk), one answer.
    "rel_recursive_bfs" -> QueryDef(
      build = (s, dir) => {
        val pairs = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir),
            col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey")).as("cnode"),
            concat(lit("s"), col("l_suppkey")).as("snode"))
          .distinct()
        pairs.select(col("cnode").as("src"), col("snode").as("dst"))
          .unionAll(pairs.select(col("snode").as("src"),
            col("cnode").as("dst")))
          .createOrReplaceTempView("v_bfs_edges")
        Tables.supplier(s, dir)
          .filter(col("s_suppkey") <= 2)
          .select(concat(lit("s"), col("s_suppkey")).as("node"))
          .createOrReplaceTempView("v_bfs_seed")
        s.sql(
          """WITH RECURSIVE walk(node, d) AS (
            |  SELECT node, 0 FROM v_bfs_seed
            |  UNION ALL
            |  SELECT DISTINCT e.dst, w.d + 1
            |  FROM walk w JOIN v_bfs_edges e ON e.src = w.node
            |  WHERE w.d < 4
            |)
            |SELECT node, CAST(min(d) AS BIGINT) AS depth
            |FROM walk GROUP BY node""".stripMargin)
      },
      oracle = Some(graft.operators.Bfs.oracleSql(
        edgesCte =
          """p AS (
            |  SELECT DISTINCT 'c' || o_custkey AS cnode,
            |         's' || l_suppkey AS snode
            |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
            |e AS (SELECT cnode AS src, snode AS dst FROM p
            |      UNION ALL SELECT snode, cnode FROM p)""".stripMargin,
        seedsCte =
          "seed AS (SELECT 's' || s_suppkey AS node FROM supplier WHERE s_suppkey <= 2)",
        maxHops = 4))
    ),

    // 2-D Pareto frontier: orders no other order beats on BOTH price
    // (lower better) and item count (higher better). The operator shards
    // the skyline sweep per x-range bucket + a tiny cross-bucket
    // prefix-max ([[graft.operators.Pareto]] — no global sort, no
    // quadratic anti-join); the oracle is the INDEPENDENT textbook
    // formulation, one global window sweep. Pure comparisons on parquet
    // doubles and exact counts — no float arithmetic to drift.
    "rel_skyline" -> QueryDef(
      build = (s, dir) => {
        val pts = Tables.lineitem(s, dir)
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_totalprice"), col("n_items"))
        graft.operators.Pareto
          .frontier2d(pts, "o_totalprice", "n_items", nBuckets = 32)
      },
      oracle = Some(
        """WITH pts AS (
          |  SELECT DISTINCT CAST(o_totalprice AS DOUBLE) AS x,
          |         CAST(n AS DOUBLE) AS y
          |  FROM (SELECT l_orderkey, count(*) AS n
          |        FROM lineitem GROUP BY 1) li
          |  JOIN orders ON l_orderkey = o_orderkey),
          |s AS (
          |  SELECT x, y,
          |         max(y) OVER (ORDER BY x ASC, y DESC
          |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          |  FROM pts)
          |SELECT x, y FROM s WHERE pmax IS NULL OR y > pmax""".stripMargin)
    ),

    // per-nation monthly revenue trend: closed-form OLS from exact BIGINT
    // sufficient statistics ([[graft.operators.Trend]] — x is the month
    // index, y is order cents, so Σx/Σy/Σxy/Σx² are all integer-exact and
    // partitioning-proof; the only float ops are the two final divisions,
    // identical IEEE754 on both engines). regr_slope would be float-sum
    // order-dependent — this is the replayable formulation.
    "rel_trend" -> QueryDef(
      build = (s, dir) => {
        val monthly = Tables.orders(s, dir)
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"),
            ((year(col("o_orderdate")) - 1992) * 12 +
              month(col("o_orderdate")) - 1).as("mx"))
          .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        graft.operators.Trend
          .olsTrend(monthly, Seq("n_name"), "mx", "cents")
          .select(col("n_name"), col("n"),
            round(col("slope"), 6).as("slope"),
            round(col("intercept"), 6).as("intercept"))
      },
      oracle = Some(
        """WITH m AS (
          |  SELECT n_name,
          |         (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 AS mx,
          |         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |  FROM orders
          |  JOIN customer ON o_custkey = c_custkey
          |  JOIN nation ON c_nationkey = n_nationkey
          |  GROUP BY 1, 2),
          |s AS (
          |  SELECT n_name, count(*) AS n,
          |         CAST(sum(mx) AS BIGINT) AS sx,
          |         CAST(sum(cents) AS BIGINT) AS sy,
          |         CAST(sum(mx * cents) AS BIGINT) AS sxy,
          |         CAST(sum(mx * mx) AS BIGINT) AS sxx
          |  FROM m GROUP BY 1)
          |SELECT n_name, n,
          |       round(CAST(n * sxy - sx * sy AS DOUBLE)
          |             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
          |       round((CAST(sy AS DOUBLE)
          |              - (CAST(n * sxy - sx * sy AS DOUBLE)
          |                 / CAST(n * sxx - sx * sx AS DOUBLE))
          |                * CAST(sx AS DOUBLE))
          |             / CAST(n AS DOUBLE), 6) AS intercept
          |FROM s""".stripMargin)
    ),

    // entity resolution: customers whose names are within edit distance 1
    // inside a name-prefix block, clustered transitively
    // ([[graft.operators.EntityResolution]] — blocking equi-join bounds
    // the quadratic, codegen'd levenshtein verifies inside blocks only,
    // min-label components label every record). The oracle replays
    // blocking + levenshtein + a recursive-CTE reachability walk — the
    // multi-hop transitivity is exactly what the gate exercises.
    "rel_entity_resolution" -> QueryDef(
      build = (s, dir) => {
        val cust = Tables.customer(s, dir)
        graft.operators.EntityResolution.resolve(
          cust, idCol = "c_custkey", nameCol = "c_name",
          blockKey = substring(col("c_name"), 1, 15), maxDist = 1)
      },
      oracle = Some(
        """WITH RECURSIVE k AS (
          |  SELECT c_custkey AS id, c_name AS nm,
          |         substring(c_name, 1, 15) AS bk
          |  FROM customer),
          |pairs AS (
          |  SELECT x.id AS a, y.id AS b
          |  FROM k x JOIN k y ON x.bk = y.bk AND x.id < y.id
          |  WHERE levenshtein(x.nm, y.nm) <= 1),
          |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
          |walk(id, r) AS (
          |  SELECT c_custkey, c_custkey FROM customer
          |  UNION
          |  SELECT w.id, u.b FROM walk w JOIN und u ON u.a = w.r
          |)
          |SELECT id AS c_custkey, min(r) AS cluster_id
          |FROM walk GROUP BY id""".stripMargin)
    ),

    // common-neighbor link prediction over the fuzzy-match graph — the
    // recall-repair step AFTER the edit-distance threshold: record pairs
    // the 1-edit matcher missed (2 edits apart) still share many 1-edit
    // NEIGHBORS, so distance-2 non-edges ranked by neighborhood overlap
    // form the per-record re-verify queue a linkage reviewer works
    // through. Scores are INTEGER common counts + one rounded division
    // (|N∩|/|N∪|) — no float-sum hazard; hub middles are capped BEFORE
    // the path self-join (the hot-shingle honesty contract). Output is
    // the per-anchor top-3 queue over both pair orientations —
    // review-queue-sized, never the O(n·deg²) candidate dump.
    "rel_link_predict" -> QueryDef(
      build = (s, dir) => {
        val cust = Tables.customer(s, dir)
        val pairs = graft.operators.EntityResolution.fuzzyPairs(
          cust, idCol = "c_custkey", nameCol = "c_name",
          blockKey = substring(col("c_name"), 1, 15), maxDist = 1)
          .select("a", "b")
        val pred = graft.operators.Components.linkPredict(pairs)
        val both = pred
          .select(col("a").as("anchor"), col("b").as("other"),
            col("common"), col("nbr_jaccard"))
          .unionAll(pred.select(col("b").as("anchor"), col("a").as("other"),
            col("common"), col("nbr_jaccard")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("anchor")
          .orderBy(col("common").desc, col("other"))
        both.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
          .select("anchor", "other", "common", "nbr_jaccard", "rk")
      },
      oracle = Some(
        """WITH k AS (
          |  SELECT c_custkey AS id, c_name AS nm,
          |         substring(c_name, 1, 15) AS bk
          |  FROM customer),
          |kc AS (
          |  SELECT id, nm, bk FROM (
          |    SELECT id, nm, bk,
          |           row_number() OVER (PARTITION BY bk ORDER BY id) AS rn
          |    FROM k) WHERE rn <= 1000),
          |pairs AS (
          |  SELECT x.id AS a, y.id AS b
          |  FROM kc x JOIN kc y ON x.bk = y.bk AND x.id < y.id
          |  WHERE levenshtein(x.nm, y.nm) <= 1),
          |und AS MATERIALIZED (
          |  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
          |deg AS MATERIALIZED (
          |  SELECT a AS id, count(*) AS deg FROM und GROUP BY 1),
          |mid AS (
          |  SELECT u.a, u.b FROM und u
          |  JOIN deg d ON u.a = d.id WHERE d.deg <= 1000),
          |cand AS (
          |  SELECT x.b AS a, y.b AS b, count(*) AS common
          |  FROM mid x JOIN mid y ON x.a = y.a AND x.b < y.b
          |  GROUP BY 1, 2 HAVING count(*) >= 2),
          |ne AS (
          |  SELECT c.a, c.b, c.common FROM cand c
          |  WHERE NOT EXISTS (
          |    SELECT 1 FROM und u WHERE u.a = c.a AND u.b = c.b)),
          |sc AS (
          |  SELECT ne.a, ne.b, ne.common,
          |         round(ne.common / (da.deg + db.deg - ne.common), 6)
          |           AS nbr_jaccard
          |  FROM ne JOIN deg da ON ne.a = da.id
          |          JOIN deg db ON ne.b = db.id),
          |bo AS (
          |  SELECT a AS anchor, b AS other, common, nbr_jaccard FROM sc
          |  UNION ALL
          |  SELECT b AS anchor, a AS other, common, nbr_jaccard FROM sc)
          |SELECT anchor, other, common, nbr_jaccard, rk FROM (
          |  SELECT anchor, other, common, nbr_jaccard,
          |         row_number() OVER (PARTITION BY anchor
          |                            ORDER BY common DESC, other) AS rk
          |  FROM bo) WHERE rk <= 3""".stripMargin)
    ),

    // winsorized (percentile-clipped) means per priority — the robust
    // mean ([[graft.operators.Winsorize]]): exact interpolated [p05, p95]
    // bounds broadcast back, clipped sum through exact decimal cents.
    // DuckDB's quantile_cont interpolates identically to Spark's
    // percentile (already pinned by rel_percentiles).
    "rel_winsorized" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Winsorize.winsorizedStats(
        Tables.orders(s, dir), Seq("o_orderpriority"), "o_totalprice",
        lo = 0.05, hi = 0.95)),
      oracle = Some(
        """WITH b AS (
          |  SELECT o_orderpriority,
          |         quantile_cont(o_totalprice, 0.05) AS p_lo,
          |         quantile_cont(o_totalprice, 0.95) AS p_hi
          |  FROM orders GROUP BY 1),
          |c AS (
          |  SELECT o.o_orderpriority,
          |         least(greatest(o_totalprice, p_lo), p_hi) AS cv,
          |         p_lo, p_hi
          |  FROM orders o JOIN b USING (o_orderpriority))
          |SELECT o_orderpriority, count(*) AS n,
          |       round(CAST(sum(CAST(cv AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_clipped,
          |       round(CAST(sum(CAST(cv AS DECIMAL(18,2))) AS DOUBLE)
          |             / count(*), 6) AS mean_clipped,
          |       round(min(p_lo), 6) AS p_lo,
          |       round(min(p_hi), 6) AS p_hi
          |FROM c GROUP BY 1""".stripMargin)
    ),

    // equi-width histogram of order totals — the profiling primitive
    // behind drift checks and binned features. Two passes by construction
    // (the bin width IS a global min/max aggregate, single row broadcast
    // back); bucket arithmetic is the exact expression
    // floor((x-lo)/((hi-lo)/n)) capped into the last bucket, replayed
    // op-for-op by the oracle. Sparse output (empty buckets absent) —
    // dense callers left-join a generated spine.
    "rel_histogram" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Histogram.equiWidth(
        Tables.orders(s, dir), "o_totalprice", nBuckets = 20)),
      oracle = Some(
        """WITH b AS (
          |  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
          |  FROM orders WHERE o_totalprice IS NOT NULL),
          |a AS (
          |  SELECT CASE WHEN hi = lo THEN 0
          |              ELSE CAST(least(floor((o_totalprice - lo)
          |                     / ((hi - lo) / 20)), 19) AS BIGINT) END AS bucket,
          |         lo, hi
          |  FROM orders, b WHERE o_totalprice IS NOT NULL)
          |SELECT bucket, count(*) AS cnt,
          |       round(min(lo + bucket * ((hi - lo) / 20)), 6) AS bucket_lo,
          |       round(min(lo + (bucket + 1) * ((hi - lo) / 20)), 6) AS bucket_hi
          |FROM a GROUP BY 1""".stripMargin)
    ),

    // exact global median WITHOUT sorting everything and WITHOUT the
    // whole-column aggregation buffer Spark's exact percentile needs for
    // a global group: two passes — bucket counts located on the driver
    // (≤1024 rows), then TakeOrdered inside the ONE bucket holding rank
    // k. quantile_disc semantics (lower order statistic, a value FROM
    // the data) so both engines return the identical double.
    "rel_exact_median" -> QueryDef(
      build = (s, dir) => round6(graft.operators.SelectK.quantileDisc(
        Tables.lineitem(s, dir), "l_extendedprice", q = 0.5)),
      oracle = Some(
        """SELECT count(*) AS n,
          |       round(quantile_disc(CAST(l_extendedprice AS DOUBLE), 0.5), 6)
          |         AS kth
          |FROM lineitem WHERE l_extendedprice IS NOT NULL""".stripMargin)
    ),

    // Benford first-digit profile — the fraud/synthetic-data screen.
    // Digit extraction is STRING-exact (leading char of the decimal(18,2)
    // rendering — no log10-at-a-power-boundary ulp hazard); expected
    // shares are the Benford log10(1+1/d) constants, identical libm calls
    // under 6-dp rounding.
    "rel_benford" -> QueryDef(
      build = (s, dir) => {
        val o = Tables.orders(s, dir).filter(col("o_totalprice") >= 1)
          .withColumn("digit",
            substring(col("o_totalprice").cast("decimal(18,2)")
              .cast("string"), 1, 1))
        val tot = o.agg(count(lit(1)).as("tot"))
        o.groupBy("digit").agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(tot))
          .select(col("digit"), col("n"),
            round(col("n").cast("double") / col("tot").cast("double"), 6)
              .as("observed"),
            round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
              .as("benford"))
      },
      oracle = Some(
        """WITH o AS (
          |  SELECT substring(CAST(CAST(o_totalprice AS DECIMAL(18,2))
          |           AS VARCHAR), 1, 1) AS digit
          |  FROM orders WHERE o_totalprice >= 1),
          |t AS (SELECT count(*) AS tot FROM o)
          |SELECT digit, count(*) AS n,
          |       round(CAST(count(*) AS DOUBLE) / CAST(tot AS DOUBLE), 6)
          |         AS observed,
          |       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)
          |         AS benford
          |FROM o, t GROUP BY digit, tot""".stripMargin)
    ),

    // per-nation Gini concentration of customer revenue — the inequality
    // metric via the rank-weighted identity 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n.
    // The rank window is PARTITIONED by nation (never a global sort),
    // ties order on custkey, and Σx / Σ(i·xᵢ) stay exact decimal until
    // the one closed-form double evaluation per nation.
    "rel_gini" -> QueryDef(
      build = (s, dir) => {
        val rev = Tables.orders(s, dir)
          .join(Tables.customer(s, dir)
            .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
            "o_custkey")
          .join(broadcast(Tables.nation(s, dir)
            .select(col("n_nationkey").as("c_nationkey"), col("n_name"))),
            "c_nationkey")
        round6(graft.operators.Concentration.gini(
          rev, "n_name", "o_custkey", "o_totalprice"))
      },
      oracle = Some(
        """WITH per AS (
          |  SELECT n.n_name, o.o_custkey,
          |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
          |  FROM orders o
          |  JOIN customer c ON o.o_custkey = c.c_custkey
          |  JOIN nation n ON c.c_nationkey = n.n_nationkey
          |  GROUP BY 1, 2),
          |k AS (
          |  SELECT n_name, x,
          |         row_number() OVER (PARTITION BY n_name
          |           ORDER BY x, o_custkey) AS i
          |  FROM per),
          |a AS (
          |  SELECT n_name, count(*) AS n, sum(x) AS s,
          |         sum(CAST(i AS DECIMAL(18,0)) * x) AS si
          |  FROM k GROUP BY 1)
          |SELECT n_name, n, round(CAST(s AS DOUBLE), 6) AS total,
          |       round(CASE WHEN CAST(s AS DOUBLE) > 0 THEN
          |               2.0 * CAST(si AS DOUBLE)
          |                 / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
          |               - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)
          |             ELSE NULL END, 6) AS gini
          |FROM a""".stripMargin)
    ),

    // RFM segmentation — quintile scores WITHOUT the textbook global
    // ntile sort: exact interpolated quintile thresholds (single-row agg,
    // broadcast back) + a per-row "1 + edges strictly below" comparison.
    // Scores depend only on VALUES, never rank positions, so the result
    // is deterministic under any row order and the plan has no
    // single-partition window stage. Spark percentile ≡ DuckDB
    // quantile_cont interpolation is pinned by the rel_percentiles gate.
    "rel_rfm" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Rfm.scores(
        Tables.orders(s, dir), "o_custkey", "o_orderdate", "o_totalprice")),
      oracle = Some(
        """WITH base AS (
          |  SELECT o_custkey,
          |         epoch_us(max(o_orderdate)) AS rec_us,
          |         count(*) AS frequency,
          |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary_d
          |  FROM orders GROUP BY 1),
          |q AS (
          |  SELECT quantile_cont(rec_us, [0.2, 0.4, 0.6, 0.8]) AS qr,
          |         quantile_cont(frequency, [0.2, 0.4, 0.6, 0.8]) AS qf,
          |         quantile_cont(CAST(monetary_d AS DOUBLE),
          |                       [0.2, 0.4, 0.6, 0.8]) AS qm
          |  FROM base),
          |s AS (
          |  SELECT o_custkey, frequency,
          |         round(CAST(monetary_d AS DOUBLE), 6) AS monetary,
          |         1 + (CASE WHEN CAST(rec_us AS DOUBLE) > qr[1] THEN 1 ELSE 0 END)
          |           + (CASE WHEN CAST(rec_us AS DOUBLE) > qr[2] THEN 1 ELSE 0 END)
          |           + (CASE WHEN CAST(rec_us AS DOUBLE) > qr[3] THEN 1 ELSE 0 END)
          |           + (CASE WHEN CAST(rec_us AS DOUBLE) > qr[4] THEN 1 ELSE 0 END)
          |           AS r_score,
          |         1 + (CASE WHEN CAST(frequency AS DOUBLE) > qf[1] THEN 1 ELSE 0 END)
          |           + (CASE WHEN CAST(frequency AS DOUBLE) > qf[2] THEN 1 ELSE 0 END)
          |           + (CASE WHEN CAST(frequency AS DOUBLE) > qf[3] THEN 1 ELSE 0 END)
          |           + (CASE WHEN CAST(frequency AS DOUBLE) > qf[4] THEN 1 ELSE 0 END)
          |           AS f_score,
          |         1 + (CASE WHEN CAST(monetary_d AS DOUBLE) > qm[1] THEN 1 ELSE 0 END)
          |           + (CASE WHEN CAST(monetary_d AS DOUBLE) > qm[2] THEN 1 ELSE 0 END)
          |           + (CASE WHEN CAST(monetary_d AS DOUBLE) > qm[3] THEN 1 ELSE 0 END)
          |           + (CASE WHEN CAST(monetary_d AS DOUBLE) > qm[4] THEN 1 ELSE 0 END)
          |           AS m_score
          |  FROM base, q)
          |SELECT o_custkey, frequency, monetary, r_score, f_score, m_score,
          |       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
          |         || CAST(m_score AS VARCHAR) AS segment
          |FROM s""".stripMargin)
    ),

    // Pearson chi-squared independence test between order priority and
    // order status, with Cramér's V effect size — the significance
    // companion to text_mutual_info. The dense-grid Σ(o−e)²/e is computed
    // through the observed-cells-only identity chi² = n·Σ o²/(cx·cy) − n
    // (unobserved cells contribute exactly their expected count, and all
    // expected counts sum to n), so the plan never generates empty cells.
    // o²·n and cx·cy are exact integers inside a double's 2^53 range; the
    // one float op per cell is a division of identical operands on both
    // engines.
    "rel_chi2" -> QueryDef(
      build = (s, dir) => round6(graft.operators.ChiSquare.independence(
        Tables.orders(s, dir), "o_orderpriority", "o_orderstatus")),
      oracle = Some(
        """WITH joint AS (
          |  SELECT o_orderpriority AS x, o_orderstatus AS y,
          |         count(*) AS c_xy
          |  FROM orders
          |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
          |  GROUP BY 1, 2),
          |xs AS (SELECT x, sum(c_xy) AS c_x FROM joint GROUP BY 1),
          |ys AS (SELECT y, sum(c_xy) AS c_y FROM joint GROUP BY 1),
          |t AS (SELECT sum(c_xy) AS n FROM joint),
          |dims AS (SELECT (SELECT count(*) FROM xs) AS nx,
          |                (SELECT count(*) FROM ys) AS ny),
          |s AS (
          |  SELECT max(t.n) AS n,
          |         sum(CAST(j.c_xy * j.c_xy * t.n AS DOUBLE)
          |             / CAST(xs.c_x * ys.c_y AS DOUBLE)) AS sum_terms
          |  FROM joint j JOIN xs USING (x) JOIN ys USING (y), t)
          |SELECT CAST(n AS BIGINT) AS n,
          |       CAST(nx AS BIGINT) AS nx, CAST(ny AS BIGINT) AS ny,
          |       CAST((nx - 1) * (ny - 1) AS BIGINT) AS dof,
          |       round(sum_terms - CAST(n AS DOUBLE), 6) AS chi2,
          |       round(CASE WHEN n > 0 AND least(nx, ny) > 1 THEN
          |               sqrt((sum_terms - CAST(n AS DOUBLE))
          |                 / (CAST(n AS DOUBLE)
          |                    * CAST(least(nx, ny) - 1 AS DOUBLE)))
          |             ELSE 0.0 END, 6) AS cramers_v
          |FROM s, dims""".stripMargin)
    ),

    // equi-DEPTH histogram of lineitem extended prices — the skew-proof
    // profiling twin of rel_histogram: buckets hold equal row counts, not
    // equal value ranges. Exact interpolated decile thresholds (one
    // single-row percentile agg, broadcast back) + the Rfm-style "edges
    // strictly below" bucket expression — value-dependent, so no ntile
    // global sort and deterministic under ties on both engines.
    "rel_histogram_depth" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Histogram.equiDepth(
        Tables.lineitem(s, dir), "l_extendedprice", nBuckets = 10)),
      oracle = Some(
        """WITH q AS (
          |  SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE),
          |           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
          |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
          |a AS (
          |  SELECT (CASE WHEN CAST(l_extendedprice AS DOUBLE) > e[1] THEN 1 ELSE 0 END
          |        + CASE WHEN CAST(l_extendedprice AS DOUBLE) > e[2] THEN 1 ELSE 0 END
          |        + CASE WHEN CAST(l_extendedprice AS DOUBLE) > e[3] THEN 1 ELSE 0 END
          |        + CASE WHEN CAST(l_extendedprice AS DOUBLE) > e[4] THEN 1 ELSE 0 END
          |        + CASE WHEN CAST(l_extendedprice AS DOUBLE) > e[5] THEN 1 ELSE 0 END
          |        + CASE WHEN CAST(l_extendedprice AS DOUBLE) > e[6] THEN 1 ELSE 0 END
          |        + CASE WHEN CAST(l_extendedprice AS DOUBLE) > e[7] THEN 1 ELSE 0 END
          |        + CASE WHEN CAST(l_extendedprice AS DOUBLE) > e[8] THEN 1 ELSE 0 END
          |        + CASE WHEN CAST(l_extendedprice AS DOUBLE) > e[9] THEN 1 ELSE 0 END)
          |           AS bucket,
          |         CAST(l_extendedprice AS DOUBLE) AS v
          |  FROM lineitem, q WHERE l_extendedprice IS NOT NULL)
          |SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS cnt,
          |       round(min(v), 6) AS lo_val, round(max(v), 6) AS hi_val
          |FROM a GROUP BY 1""".stripMargin)
    ),

    // referential-integrity audit: orphan counts for each FK edge of the
    // star schema in one result — the DQ check every warehouse runs
    // before trusting a join. Left-anti joins (AQE broadcasts the key
    // side); exact counts; a UNION of three audit rows.
    "rel_referential_audit" -> QueryDef(
      build = (s, dir) => {
        def audit(rel: String, child: org.apache.spark.sql.DataFrame,
                  childKey: String, parent: org.apache.spark.sql.DataFrame,
                  parentKey: String) = {
          // a null FK is a missing key, not an orphan — excluded on both
          // engines (NOT IN is null-hostile in SQL; anti-join keeps nulls)
          val orphans = child.filter(col(childKey).isNotNull).join(parent,
            col(childKey) === col(parentKey), "left_anti")
          child.agg(count(lit(1)).as("n_child"))
            .crossJoin(orphans.agg(count(lit(1)).as("n_orphans")))
            .select(lit(rel).as("relationship"), col("n_child"),
              col("n_orphans"))
        }
        audit("lineitem->orders", Tables.lineitem(s, dir), "l_orderkey",
            Tables.orders(s, dir), "o_orderkey")
          .unionAll(audit("orders->customer", Tables.orders(s, dir),
            "o_custkey", Tables.customer(s, dir), "c_custkey"))
          .unionAll(audit("customer->nation", Tables.customer(s, dir),
            "c_nationkey", Tables.nation(s, dir), "n_nationkey"))
      },
      oracle = Some(
        """SELECT 'lineitem->orders' AS relationship,
          |       (SELECT count(*) FROM lineitem) AS n_child,
          |       (SELECT count(*) FROM lineitem WHERE l_orderkey NOT IN
          |         (SELECT o_orderkey FROM orders WHERE o_orderkey IS NOT NULL)
          |        AND l_orderkey IS NOT NULL) AS n_orphans
          |UNION ALL
          |SELECT 'orders->customer',
          |       (SELECT count(*) FROM orders),
          |       (SELECT count(*) FROM orders WHERE o_custkey NOT IN
          |         (SELECT c_custkey FROM customer WHERE c_custkey IS NOT NULL)
          |        AND o_custkey IS NOT NULL)
          |UNION ALL
          |SELECT 'customer->nation',
          |       (SELECT count(*) FROM customer),
          |       (SELECT count(*) FROM customer WHERE c_nationkey NOT IN
          |         (SELECT n_nationkey FROM nation WHERE n_nationkey IS NOT NULL)
          |        AND c_nationkey IS NOT NULL)""".stripMargin)
    ),

    // month-over-month revenue growth per nation: lag window over the
    // AGGREGATED (nation, month) series — month-cardinality partitions,
    // never a data-sized window; revenue through exact decimal cents, the
    // one growth division on identical operands. Null growth on each
    // nation's first month and on zero-revenue predecessors.
    "rel_mom_growth" -> QueryDef(
      build = (s, dir) => {
        val cust = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
        val monthly = Tables.orders(s, dir)
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("n_name"),
            date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        val w = Window.partitionBy("n_name").orderBy("month")
        round6(monthly
          .withColumn("prev", lag(col("rev"), 1).over(w))
          .select(col("n_name"), col("month"),
            col("rev").cast("double").as("revenue"),
            when(col("prev").isNotNull && col("prev") > 0,
              (col("rev").cast("double") - col("prev").cast("double")) /
                col("prev").cast("double"))
              .as("mom_growth")))
      },
      oracle = Some(
        """WITH m AS (
          |  SELECT n_name, strftime(o_orderdate, '%Y-%m') AS month,
          |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |              JOIN nation ON c_nationkey = n_nationkey
          |  GROUP BY 1, 2),
          |l AS (
          |  SELECT n_name, month, rev,
          |         lag(rev) OVER (PARTITION BY n_name ORDER BY month) AS prev
          |  FROM m)
          |SELECT n_name, month, round(CAST(rev AS DOUBLE), 6) AS revenue,
          |       round(CASE WHEN prev IS NOT NULL AND prev > 0 THEN
          |         (CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE))
          |           / CAST(prev AS DOUBLE) END, 6) AS mom_growth
          |FROM l""".stripMargin)
    ),

    // Theil-Sen robust trend of per-nation monthly order volume — the
    // 29%-breakdown companion to rel_trend's OLS: the median of C(n,2)
    // pairwise slopes barely moves when one month is wild. Pair space is
    // quadratic in the GROUP (bounded monthly series), group-keyed
    // equi-self-join, never cartesian; slopes divide exact integers.
    "rel_theil_sen" -> QueryDef(
      build = (s, dir) => {
        val cust = Tables.customer(s, dir)
          .join(broadcast(Tables.nation(s, dir)),
            col("c_nationkey") === col("n_nationkey"))
        val series = Tables.orders(s, dir)
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("n_name"),
            ((year(col("o_orderdate")) - 1970) * 12 +
              month(col("o_orderdate")) - 1).cast("long").as("t"))
          .agg(count(lit(1)).as("y"))
        round6(graft.operators.TheilSen.medianSlope(
          series, Seq("n_name"), "t", "y"))
      },
      oracle = Some(
        """WITH series AS (
          |  SELECT n_name,
          |         CAST((year(o_orderdate) - 1970) * 12
          |              + month(o_orderdate) - 1 AS BIGINT) AS t,
          |         count(*) AS y
          |  FROM orders JOIN customer ON o_custkey = c_custkey
          |              JOIN nation ON c_nationkey = n_nationkey
          |  GROUP BY 1, 2),
          |s AS (
          |  SELECT a.n_name,
          |         (CAST(b.y AS DOUBLE) - CAST(a.y AS DOUBLE))
          |           / CAST(b.t - a.t AS DOUBLE) AS sl
          |  FROM series a JOIN series b
          |    ON a.n_name = b.n_name AND a.t < b.t),
          |m AS (SELECT n_name, quantile_cont(sl, 0.5) AS slope
          |      FROM s GROUP BY 1)
          |SELECT series.n_name, count(*) AS n_points,
          |       round(min(m.slope), 6) AS slope,
          |       round(quantile_cont(CAST(series.y AS DOUBLE)
          |               - m.slope * CAST(series.t AS DOUBLE), 0.5), 6)
          |         AS intercept
          |FROM series JOIN m ON series.n_name = m.n_name
          |GROUP BY 1""".stripMargin)
    )
  )

  /** The PageRank oracle, mechanically unrolled: r0 = uniform, r{k+1} from
    * r{k} via the same left-join + coalesce the operator uses. Damping
    * constants are embedded as `Double.toString` of the EXACT values the
    * Scala side computes (string→double parse roundtrips exactly), so both
    * engines run identical IEEE754 arithmetic.
    */
  private def pageRankSql(iters: Int, damping: Double): String = {
    val d = java.lang.Double.toString(damping)
    val oneMinusD = java.lang.Double.toString(1.0 - damping)
    val steps = (1 to iters).map { k =>
      s"""r$k AS (
         |  SELECT nodes.node,
         |         CAST('$oneMinusD' AS DOUBLE) / (SELECT n FROM nn)
         |           + CAST('$d' AS DOUBLE) * coalesce(c.sum_in, 0.0) AS rank
         |  FROM nodes LEFT JOIN (
         |    SELECT p.dst, sum(p.p * r${k - 1}.rank) AS sum_in
         |    FROM p JOIN r${k - 1} ON p.src = r${k - 1}.node GROUP BY 1) c
         |  ON nodes.node = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT 'c' || o_custkey AS src, 's' || l_suppkey AS dst,
       |         count(*) AS w
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |edges AS (SELECT src, dst, w FROM e0
       |          UNION ALL SELECT dst, src, w FROM e0),
       |outw AS (SELECT src, sum(w) AS w_out FROM edges GROUP BY 1),
       |p AS (SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.w_out AS p
       |      FROM edges e JOIN outw o ON e.src = o.src),
       |nodes AS (SELECT src AS node FROM edges
       |          UNION SELECT dst AS node FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank
       |       FROM nodes),
       |$steps
       |SELECT node, round(rank, 9) AS rank FROM r$iters""".stripMargin
  }
}
