package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.RangeJoin

/** Property: for random timestamp multisets, keys, and deltas, the banded
  * range join emits EXACTLY the brute-force band pairs (each exactly
  * once) — bin boundaries, negative epochs, duplicates, and empty sides
  * included.
  */
object RangeJoinProperties extends Properties("RangeJoin") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = GraftSession.builder("rj-props", cores = 4).getOrCreate()

  private val genRows: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 10000L)
      key <- Gen.choose(0L, 3L)
      // cluster around bin edges to stress the boundary cases
      ts <- Gen.oneOf(Gen.choose(-300.0, 300.0),
        Gen.oneOf(Seq(-60.0, 0.0, 59.999, 60.0, 60.001, 120.0)))
    } yield (id, key, ts))
  } yield rows

  property("banded == brute force, pairs unique") =
    Prop.forAll(genRows, genRows, Gen.oneOf(7L, 60L, 61L)) { (ls, rs, delta) =>
      import spark.implicits._
      val l = ls.toDF("id", "k", "ts")
      val r = rs.toDF("rid", "k", "ts")
      val banded = RangeJoin.byTimestamp(l,
          r.select(col("k"), col("ts"), col("rid")),
          tsCol = "ts", deltaSeconds = delta, keyCols = Seq("k"))
        .select(col("id"), col("r_rid")).collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSeq
      val brute = l.join(r.select(col("k").as("rk"), col("ts").as("rts"),
          col("rid")),
          col("k") === col("rk") &&
            abs(col("ts") - col("rts")) <= delta.toDouble)
        .select(col("id"), col("rid")).collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSeq
      // multiset equality: same pairs with same multiplicities
      banded.groupBy(identity).view.mapValues(_.size).toMap ==
        brute.groupBy(identity).view.mapValues(_.size).toMap
    }
}
