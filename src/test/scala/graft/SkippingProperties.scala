package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.sources.VersionedTable

/** Property-based correctness of transparent data skipping: for RANDOM
  * predicates over RANDOM multi-dir tables (nulls included), `readWhere`
  * must return exactly the rows of a plain `read().filter` — pruning may
  * only skip dirs, never rows. The generator covers every shape the
  * extractor understands (both operand orders, strict and closed
  * comparisons, IN, BETWEEN-ish conjunctions, prefix, IS [NOT] NULL,
  * `<>`, year() on a timestamp, AND/OR/NOT nesting) plus leaves it must
  * fail open on (arithmetic wraps, untracked columns).
  */
object SkippingProperties extends Properties("Skipping") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private lazy val spark =
    GraftSession.builder("skip-props", cores = 4).getOrCreate()

  /** One random table: 3-5 dirs of rows (id, x: long|null, s: string,
    * ts: timestamp), x/s/ts tracked.
    */
  private case class Table(vt: VersionedTable, rows: Long)

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("skipprops").resolve("t").toString

  private val genRow: Gen[(Long, Option[Long], String, Int)] = for {
    x <- Gen.frequency((8, Gen.choose(0L, 100L).map(Some(_))),
      (1, Gen.const(None: Option[Long])))
    s <- Gen.oneOf("apple", "apricot", "banana", "cherry", "citrus", "z")
    y <- Gen.choose(1995, 1999)
  } yield (0L, x, s, y)

  private val genTable: Gen[Seq[Seq[(Long, Option[Long], String, Int)]]] = for {
    nDirs <- Gen.choose(3, 5)
    dirs <- Gen.listOfN(nDirs, Gen.choose(1, 8).flatMap(Gen.listOfN(_, genRow)))
  } yield dirs.map(_.toSeq).toSeq

  private def build(dirs: Seq[Seq[(Long, Option[Long], String, Int)]]): Table = {
    import spark.implicits._
    val vt = VersionedTable(spark, freshRoot(), statsCols = Seq("x", "s", "ts"))
    var id = 0L
    dirs.foreach { d =>
      val df = d.map { case (_, x, s, y) =>
        val r = (id, x, s, s"$y-06-15 12:00:00"); id += 1; r
      }.toDF("id", "x", "s", "tss")
        .select(col("id"), col("x"), col("s"),
          col("tss").cast("timestamp").as("ts"))
      if (vt.latestVersion.isEmpty) vt.overwrite(df) else vt.append(df)
    }
    Table(vt, id)
  }

  private val genLeaf: Gen[Column] = Gen.oneOf(
    Gen.choose(0L, 100L).map(v => col("x") > v),
    Gen.choose(0L, 100L).map(v => col("x") >= v),
    Gen.choose(0L, 100L).map(v => col("x") < v),
    Gen.choose(0L, 100L).map(v => lit(v) > col("x")),
    Gen.choose(0L, 100L).map(v => col("x") === v),
    Gen.choose(0L, 100L).map(v => col("x") =!= v),
    Gen.listOfN(3, Gen.choose(0L, 100L)).map(vs => col("x").isin(vs: _*)),
    Gen.oneOf("a", "ap", "b", "ci", "q").map(p => col("s").startsWith(p)),
    Gen.oneOf("apple", "banana", "nope").map(v => col("s") === v),
    Gen.const(col("x").isNull),
    Gen.const(col("x").isNotNull),
    Gen.choose(1995, 1999).map(y => year(col("ts")) === y),
    Gen.choose(1995, 1999).map(y => year(col("ts")) >= y),
    Gen.choose(1995, 1999).map(y =>
      col("ts").cast("date") < lit(s"$y-07-01").cast("date")),
    Gen.choose(1995, 1999).map(y => date_trunc("month", col("ts")) ===
      lit(s"$y-06-01 00:00:00").cast("timestamp")),
    Gen.choose(1995, 1999).map(y => date_trunc("quarter", col("ts")) <=
      lit(s"$y-05-15 00:00:00").cast("timestamp")),
    // shapes the extractor must FAIL OPEN on
    Gen.choose(0L, 50L).map(v => col("x") % 7 === v % 7),
    Gen.choose(0L, 200L).map(v => col("id") < v))

  private def genPred(depth: Int): Gen[Column] =
    if (depth <= 0) genLeaf
    else Gen.frequency(
      (3, genLeaf),
      (2, Gen.zip(genPred(depth - 1), genPred(depth - 1)).map(t => t._1 && t._2)),
      (2, Gen.zip(genPred(depth - 1), genPred(depth - 1)).map(t => t._1 || t._2)),
      (1, genPred(depth - 1).map(p => !p)))

  property("readWhere == read().filter for arbitrary predicates") =
    Prop.forAll(genTable, genPred(2)) { (dirs, pred) =>
      val t = build(dirs)
      val got = t.vt.readWhere(pred).select("id")
        .collect().map(_.getLong(0)).toSet
      val want = t.vt.read().filter(pred).select("id")
        .collect().map(_.getLong(0)).toSet
      got == want
    }
}
