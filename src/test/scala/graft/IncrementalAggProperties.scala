package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.IncrementalAgg
import graft.sources.VersionedTable

/** Property: for random base states and random merge/delete sequences, the
  * CDF-maintained extremes view equals a from-scratch aggregate of the
  * final state — every count/sum fold, least/greatest fold, group
  * emptying, and min/max rescan decision included.
  */
object IncrementalAggProperties extends Properties("IncrementalAgg") {

  // each case costs ~8 table commits; keep the sample count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = GraftSession.builder("iagg-props", cores = 4).getOrCreate()

  private val grps = Seq("a", "b", "c")

  /** Key-unique row set: id → (grp, v). */
  private val genRows: Gen[Map[Long, (String, Long)]] =
    Gen.mapOf(for {
      id <- Gen.choose(0L, 25L)
      g <- Gen.oneOf(grps)
      v <- Gen.choose(-100L, 100L)
    } yield id -> ((g, v)))

  private sealed trait Op
  private case class Merge(rows: Map[Long, (String, Long)]) extends Op
  private case class DeleteGrp(g: String) extends Op
  private case class DeleteBelow(t: Long) extends Op

  private val genOp: Gen[Op] = Gen.frequency(
    3 -> genRows.map(Merge),
    1 -> Gen.oneOf(grps).map(DeleteGrp),
    1 -> Gen.choose(-50L, 50L).map(DeleteBelow))

  property("maintained extremes view == recompute after random op sequences") =
    Prop.forAll(genRows, Gen.listOfN(3, genOp)) { (init, ops) =>
      import spark.implicits._
      def df(rows: Map[Long, (String, Long)], at: Long) =
        rows.toSeq.map { case (id, (g, v)) => (id, g, v, at) }
          .toDF("id", "grp", "v", "updated_at")

      val root = Files.createTempDirectory("iagg_prop")
      val bt = VersionedTable(spark, root.resolve("b").toString)
      val mv = VersionedTable(spark, root.resolve("m").toString)
      var from = bt.overwrite(df(init, 0L))
      IncrementalAgg.bootstrapExtremes(mv, bt, Seq("grp"), "v")
      ops.zipWithIndex.foreach { case (op, i) =>
        val to = op match {
          case Merge(rows)    => bt.merge(df(rows, i + 1L),
            keyCols = Seq("id"), orderCol = "updated_at")
          case DeleteGrp(g)   => bt.delete(col("grp") === g)
          case DeleteBelow(t) => bt.delete(col("v") < t)
        }
        IncrementalAgg.maintainExtremes(mv, bt, from, to,
          Seq("id"), Seq("grp"), "v")
        from = to
      }
      val view = mv.read().select("grp", "n_rows", "sum_value", "min_value", "max_value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val expect = bt.read().groupBy("grp")
        .agg(count(lit(1)), sum("v"), min("v"), max("v"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      Prop(view == expect) :| s"view=$view expect=$expect ops=$ops"
    }
}
