package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.sources.VersionedTable

/** Property-based correctness of column mapping: RANDOM sequences of
  * rename / drop / re-add / append / update against an in-memory model.
  * After every op the table's read() must equal the model — same logical
  * column order, same rows — including the no-resurrection rule: a
  * column re-added after a drop (even under the SAME name) reads null
  * for rows written before the re-add, which the model encodes by
  * construction.
  */
object MappingProperties extends Properties("ColumnMapping") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark =
    GraftSession.builder("map-props", cores = 4).getOrCreate()

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("mapprops").resolve("t").toString

  /** Logical columns (id first, never touched) + rows keyed by logical. */
  private case class Model(cols: Vector[String],
                           rows: Vector[Map[String, Option[Long]]])

  private sealed trait Op
  private case class Rename(idx: Int, newName: String) extends Op
  private case class Drop(idx: Int) extends Op
  private case class ReAdd(name: String) extends Op
  private case class Append(vals: Seq[Long]) extends Op
  private case class Update(idx: Int, delta: Long) extends Op

  private val genName: Gen[String] = Gen.choose(0, 99).map(i => s"c$i")

  private val genOp: Gen[Op] = Gen.frequency(
    (3, for { i <- Gen.choose(1, 3); n <- genName } yield Rename(i, n)),
    (2, Gen.choose(1, 3).map(Drop(_))),
    (2, genName.map(ReAdd(_))),
    (3, Gen.listOfN(4, Gen.choose(0L, 99L)).map(Append(_))),
    (2, for { i <- Gen.choose(1, 3); d <- Gen.choose(1L, 9L) }
      yield Update(i, d)))

  private val genOps: Gen[List[Op]] =
    Gen.choose(4, 8).flatMap(n => Gen.listOfN(n, genOp))

  private def frameOf(cols: Seq[String],
                      rows: Seq[Map[String, Option[Long]]]): DataFrame = {
    val schema = StructType(cols.map(c => StructField(c, LongType, nullable = true)))
    val data = rows.map(r =>
      Row(cols.map(c => r.getOrElse(c, None).map(Long.box).orNull): _*))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(data).asJava), schema)
  }

  private def check(vt: VersionedTable, m: Model): Prop = {
    val df = vt.read()
    val sameCols = df.columns.toSeq == m.cols
    val got = df.collect().map(r => m.cols.map(c =>
      if (!sameCols) None
      else if (r.isNullAt(r.fieldIndex(c))) None
      else Some(r.getLong(r.fieldIndex(c)))).toVector).toVector
    val want = m.rows.map(r => m.cols.map(c => r.getOrElse(c, None)).toVector)
    Prop(sameCols && got.sortBy(_.toString) == want.sortBy(_.toString)) :|
      s"cols got=${df.columns.toSeq} want=${m.cols}"
  }

  property("read() equals the model after any rename/drop/re-add/append/update sequence") =
    Prop.forAll(genOps) { ops =>
      val vt = VersionedTable(spark, freshRoot())
      var m = Model(Vector("id", "v1", "v2", "v3"),
        Vector(
          Map("id" -> Some(1L), "v1" -> Some(10L), "v2" -> Some(20L), "v3" -> Some(30L)),
          Map("id" -> Some(2L), "v1" -> Some(11L), "v2" -> Some(21L), "v3" -> Some(31L))))
      vt.overwrite(frameOf(m.cols, m.rows))
      var nextId = 3L
      val props = ops.map {
        case Rename(i, n) if i < m.cols.size && !m.cols.contains(n) =>
          val old = m.cols(i)
          vt.renameColumn(old, n)
          m = m.copy(cols = m.cols.updated(i, n),
            rows = m.rows.map(r =>
              r.get(old).map(v => r - old + (n -> v)).getOrElse(r - old)))
          check(vt, m)
        case Drop(i) if i < m.cols.size && m.cols.size > 2 =>
          val c = m.cols(i)
          vt.dropColumn(c)
          m = m.copy(cols = m.cols.filterNot(_ == c), rows = m.rows.map(_ - c))
          check(vt, m)
        case ReAdd(n) if !m.cols.contains(n) && m.cols.size < 5 =>
          // mergeSchema append carrying one row with the new column; every
          // OLDER row must read null in it — even if n was dropped before
          val cols2 = m.cols :+ n
          val row = (cols2.map(c => c -> Some(nextId))).toMap[String, Option[Long]]
          nextId += 1
          vt.append(frameOf(cols2, Seq(row)), mergeSchema = true)
          m = Model(cols2, m.rows :+ row)
          check(vt, m)
        case Append(vals) =>
          val row = (m.cols.tail.zip(vals).map { case (c, v) => c -> Some(v) } :+
            ("id" -> Some(nextId))).toMap[String, Option[Long]]
          nextId += 1
          vt.append(frameOf(m.cols, Seq(row)))
          m = m.copy(rows = m.rows :+ row)
          check(vt, m)
        case Update(i, d) if i < m.cols.size =>
          val c = m.cols(i)
          vt.update(col("id") === 1L, Map(c -> (coalesce(col(c), lit(0L)) + d)))
          m = m.copy(rows = m.rows.map(r =>
            if (r.get("id").flatten.contains(1L))
              r + (c -> Some(r.getOrElse(c, None).getOrElse(0L) + d))
            else r))
          check(vt, m)
        case _ => Prop.passed // precondition unmet: skip the op
      }
      props.foldLeft(Prop.passed)(_ && _)
    }
}
