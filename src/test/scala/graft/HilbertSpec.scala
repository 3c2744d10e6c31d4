package graft

import org.apache.spark.sql.functions._

import graft.functions.HilbertCurve

/** Hilbert curve gates: the unrolled Column expression matches the scalar
  * reference on every grid cell, the curve has the unit-step adjacency
  * property Z-order lacks, and a 2-D box probe spans fewer index runs
  * than under bit interleaving.
  */
class HilbertSpec extends SparkSpec {
  import spark.implicits._

  private val bits = 4
  private val n = 1 << bits

  test("expression tree matches the scalar reference on all 256 cells") {
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x, y)
    val got = cells.toDF("x", "y")
      .withColumn("d", HilbertCurve.hilbertIndex2(col("x"), col("y"), bits))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    cells.foreach { case (x, y) =>
      assert(got((x, y)) == HilbertCurve.reference(x, y, bits),
        s"cell ($x,$y)")
    }
  }

  test("bijection and unit-step adjacency (the property z-order lacks)") {
    val byD = (for (x <- 0 until n; y <- 0 until n)
      yield HilbertCurve.reference(x, y, bits) -> ((x, y))).toMap
    assert(byD.keySet == (0 until n * n).toSet) // bijection
    (1 until n * n).foreach { d =>
      val (x0, y0) = byD(d - 1); val (x1, y1) = byD(d)
      assert(math.abs(x0 - x1) + math.abs(y0 - y1) == 1,
        s"step $d jumps from ($x0,$y0) to ($x1,$y1)")
    }
  }

  test("a 2-D box probe spans fewer index runs than z-order") {
    def zRef(x: Int, y: Int): Int =
      (0 until bits).map(b => (((x >> b) & 1) << (2 * b)) |
        (((y >> b) & 1) << (2 * b + 1))).sum
    def runs(ds: Seq[Int]): Int =
      ds.sorted.foldLeft((0, -2)) { case ((r, prev), d) =>
        (if (d == prev + 1) r else r + 1, d)
      }._1
    // every 4x4 box in the 16x16 grid
    val (hTot, zTot) = (for (bx <- 0 to n - 4; by <- 0 to n - 4) yield {
      val cells = for (x <- bx until bx + 4; y <- by until by + 4) yield (x, y)
      (runs(cells.map { case (x, y) => HilbertCurve.reference(x, y, bits) }),
        runs(cells.map { case (x, y) => zRef(x, y) }))
    }).foldLeft((0, 0)) { case ((h, z), (a, b)) => (h + a, z + b) }
    assert(hTot < zTot, s"hilbert runs $hTot must beat z runs $zTot")
  }

  test("hilbert-clustered table: range read parity + chunk pruning") {
    val root = java.nio.file.Files
      .createTempDirectory("hilbert_vt").toString
    val vt = graft.sources.VersionedTable(spark, root,
      statsCols = Seq("x", "y"))
    // 1200 rows / 4 chunks: parity and pruning are size-free contracts,
    // and the clustered rewrite's cost is per-chunk commit machinery —
    // the old 4000-row/8-chunk shape was ~40 s of suite wall
    val df = Seq.tabulate(1200) { i =>
      (i.toLong, (i * 131 % 997).toLong, (i * 577 % 991).toLong)
    }.toDF("id", "x", "y")
    vt.overwrite(df)
    vt.compactClustered(Seq("x", "y"), nChunks = 4, curve = "hilbert")
    val got = vt.readRange("x", 100L, 200L).select("id")
      .collect().map(_.getLong(0)).toSet
    val want = df.filter(col("x").between(100L, 200L)).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(got == want)
    val m = vt.manifestOf(vt.latestVersion.get)
    val pruned = vt.scanTargetsFor(vt.latestVersion.get,
      col("x").between(100L, 200L))
    assert(pruned.size < m.dataDirs.size,
      s"range probe must prune chunks: ${pruned.size} of ${m.dataDirs.size}")
  }
}
