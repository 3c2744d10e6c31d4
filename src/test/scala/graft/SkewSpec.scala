package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting must never change results — only the shuffle layout. */
class SkewSpec extends SparkSpec {

  test("salted count/sum == plain aggregation") {
    val li = Tables.lineitem(spark, sf())
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_value"))
    val salted = Skew.saltedCountSum(li, Seq("l_returnflag"), "l_quantity", salts = 16)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("skewed rank == naive window rank under one dominant domain") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.SkewedRank
    import spark.implicits._
    // one domain owns 80% of rows — the shape that kills a per-domain
    // window; ids are shuffled across the range so the hot domain spans
    // many buckets
    val rows = (0L until 2000L).map { i =>
      val dom = if (i % 5 != 0) "hot.example.com" else s"cold${i % 7}.org"
      // injective scatter (7919 coprime to the 100003 prime modulus):
      // unique ids spread across the range, so buckets stay populated
      ((i * 7919L + 13L) % 100003L, dom)
    }
    val df = rows.toDF("doc_id", "domain")
    val naive = df.withColumn("rk",
      row_number().over(
        Window.partitionBy(col("domain")).orderBy(col("doc_id")))
        .cast("long"))
    val two = SkewedRank.rowNumber(df, "domain", "doc_id", buckets = 32)
    assert(naive.exceptAll(two).isEmpty && two.exceptAll(naive).isEmpty)

    // two-exchange shape: the rank window partitions by (domain, bucket)
    // — the hot domain is SUBDIVIDED, never a single window partition
    two.collect()
    val plan = two.queryExecution.executedPlan.toString
    assert(plan.contains("__sr_b"),
      "the rank must execute over (group, bucket) sub-partitions:\n" + plan)

    // null groups rank too (null-safe group join), like the naive window
    val withNull = df.union(Seq((424242L, null.asInstanceOf[String]),
      (424243L, null.asInstanceOf[String])).toDF("doc_id", "domain"))
    val nn = SkewedRank.rowNumber(withNull, "domain", "doc_id", buckets = 8)
    assert(nn.count() === withNull.count())
    assert(nn.filter(col("domain").isNull).select("rk")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("skewed rank survives full-range 64-bit keys; contract breaks fail loudly") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.SkewedRank
    import spark.implicits._
    // hash-shaped ids spanning nearly the whole long range: the span
    // hi−lo overflows 64-bit arithmetic, so bucket math must run in
    // double space and still agree with the naive window exactly
    val rows = Seq(
      (Long.MinValue + 1, "a"), (Long.MinValue / 2, "a"), (-7L, "a"),
      (0L, "a"), (13L, "b"), (Long.MaxValue / 2, "a"),
      (Long.MaxValue - 1, "a"), (Long.MaxValue, "b")).toDF("k", "g")
    val naive = rows.withColumn("rk", row_number().over(
      Window.partitionBy("g").orderBy("k")).cast("long"))
    val two = SkewedRank.rowNumber(rows, "g", "k", buckets = 16)
    assert(naive.exceptAll(two).isEmpty && two.exceptAll(naive).isEmpty)

    // a null order key RAISES (a window would rank it; the bucket join
    // would silently drop it — neither is acceptable quietly)
    val withNull = rows.union(
      Seq[(java.lang.Long, String)]((null, "a")).toDF("k", "g"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception] {
      SkewedRank.rowNumber(withNull, "g", "k").collect()
    }
    assert(msgs(e).exists(_.contains("null k order key")), e.toString)

    // STRING keys rank by byte-lexicographic order exactly like the
    // window — digit strings are the trap ("10" < "9" lexicographically,
    // and the fixed-width byte-prefix image must agree), plus keys that
    // collide in their first 7 bytes and multi-byte UTF8
    val sRows = Seq("10", "9", "abcdefgh", "abcdefgz", "abcdefg", "ab",
      "b", "", "ü", "z").map((_, "a")).toDF("k", "g")
    val sNaive = sRows.withColumn("rk", row_number().over(
      Window.partitionBy("g").orderBy("k")).cast("long"))
    val sTwo = SkewedRank.rowNumber(sRows, "g", "k", buckets = 4)
    assert(sNaive.exceptAll(sTwo).isEmpty && sTwo.exceptAll(sNaive).isEmpty)

    // an unorderable-by-bucket type rejects at plan time
    val e2 = intercept[IllegalArgumentException] {
      SkewedRank.rowNumber(Seq((true, "a"), (false, "a")).toDF("k", "g"),
        "g", "k")
    }
    assert(e2.getMessage.contains("numeric order column"))
  }

  test("equi-depth buckets spread a value-CLUSTERED hot group") {
    import org.apache.spark.sql.expressions.Window
    import graft.operators.SkewedRank
    import spark.implicits._
    // the equi-width failure shape: the hot group's keys sit in a sliver
    // (~1e-6) of the global key span — sequential ingest ids from a burst
    // crawl of one domain — while cold keys scatter over the full range.
    // Global-min/max equi-width bounds would land the WHOLE hot group in
    // one bucket; quantile bounds must spread it.
    val rows = (0L until 10000L).map { i =>
      if (i % 5 != 0) (i, "hot.example.com") // 8000 rows, ids < 10000
      else (10000L + (i * 7919L % 99991L) * 80000L, s"cold${i % 7}.org")
    }
    val df = rows.toDF("doc_id", "domain")
    val withB = SkewedRank.bucketed(df, "domain", "doc_id", buckets = 64)
    val hotPerBucket = withB.filter(col("domain") === "hot.example.com")
      .groupBy("__sr_b").count().select("count").as[Long].collect()
    assert(hotPerBucket.sum == 8000L)
    // no bucket (∝ task) holds more than a small multiple of the ideal
    // 1/buckets share of the hot group
    assert(hotPerBucket.max <= 8000L / 8,
      s"hot group not spread: per-bucket counts ${hotPerBucket.sorted.toSeq}")
    // and the ranks still agree with the naive window exactly
    val naive = df.withColumn("rk", row_number().over(
      Window.partitionBy("domain").orderBy("doc_id")).cast("long"))
    val two = SkewedRank.rowNumber(df, "domain", "doc_id", buckets = 64)
    assert(naive.exceptAll(two).isEmpty && two.exceptAll(naive).isEmpty)
  }

  test("salted join == plain join") {
    val orders = Tables.orders(spark, sf()).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(spark, sf())
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = orders.join(cust, Seq("o_custkey"))
    val salted = Skew.saltedJoin(orders, cust, "o_custkey", salts = 8)
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }
}
