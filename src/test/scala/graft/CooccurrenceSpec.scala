package graft

import org.apache.spark.sql.functions._

import graft.operators.Cooccurrence

/** Hand-computable co-occurrence cosines, duplicate-interaction collapse,
  * and the deterministic basket cap.
  */
class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("cosine matches the hand computation") {
    // baskets: 1:{a,b} 2:{a,b} 3:{a,c} → d(a)=3 d(b)=2 d(c)=1
    // c(a,b)=2 → 2/√6; c(a,c)=1 → 1/√3; (b,c) never co-occur → absent
    val df = Seq((1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c"))
      .toDF("basket", "item")
    val got = Cooccurrence.itemCosine(df, "basket", "item")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c")))
    assert(got(("a", "b"))._1 == 2L)
    assert(math.abs(got(("a", "b"))._2 - 2.0 / math.sqrt(6.0)) < 1e-15)
    assert(math.abs(got(("a", "c"))._2 - 1.0 / math.sqrt(3.0)) < 1e-15)
  }

  test("repeat interactions collapse before counting") {
    // the same (basket, item) delivered 3 times must count once
    val df = Seq((1, "a"), (1, "a"), (1, "a"), (1, "b")).toDF("basket", "item")
    val got = Cooccurrence.itemCosine(df, "basket", "item").head()
    assert(got.getLong(2) == 1L && got.getDouble(3) == 1.0)
  }

  test("basket cap keeps the first K items in item order, deterministically") {
    // basket 1 holds a..e; cap 2 keeps {a, b} — pairs only (a, b)
    val df = (Seq("a", "b", "c", "d", "e").map((1, _)) ++
      Seq((2, "a"), (2, "b"))).toDF("basket", "item")
    val got = Cooccurrence.itemCosine(df, "basket", "item", maxBasketSize = 2)
      .collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("a", "b")))
    assert(got.head.getLong(2) == 2L) // both baskets survive the cap
    assert(got.head.getDouble(3) == 1.0) // degrees use CAPPED sets: 2/√(2·2)
  }

  test("null baskets and items are dropped") {
    val df = Seq((Some(1), Some("a")), (Some(1), Some("b")),
      (None, Some("a")), (Some(2), None)).toDF("basket", "item")
    val got = Cooccurrence.itemCosine(df, "basket", "item").collect()
    assert(got.length == 1)
  }
}
