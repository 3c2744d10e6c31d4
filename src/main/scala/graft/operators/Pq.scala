package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the memory-scale path for ANN beyond
  * [[Similarity.quantizeInt8]]: each d-dim vector compresses to m byte
  * codes (one per subspace, ksub ≤ 256 centroids each), and queries
  * score candidates by ASYMMETRIC DISTANCE (ADC): the query stays
  * full-precision, per-query distance tables of m×ksub partial L2s are
  * precomputed, and a candidate's approximate distance is m table
  * lookups — no decompression, no per-pair float vector math.
  *
  * Scale shape: codebook training explodes vectors into (vec_id, j,
  * subvector) rows ONCE and trains ALL m subspaces simultaneously —
  * every Lloyd iteration is one broadcast-assign + one (j, code, dim)
  * hash aggregate shared by all subspaces, so iteration count, not
  * subspace count, drives job count. Driver state is the m·ksub·(d/m)
  * codebook (= d·ksub doubles — tiny) and the nQueries·m·ksub distance
  * tables (bounded by the query-set contract). Encoding and scoring are
  * pure map-side expressions; the only shuffle in search is the
  * per-query top-k window over candidates.
  *
  * Determinism: init = the subvectors of the ksub lowest vec_ids,
  * argmin ties break toward the lowest code, empty cells keep their old
  * centroid, lane means are exact DECIMAL(28,12) sums (order-free) —
  * the whole train/encode/search chain is a pure function of the input
  * (no RNG), like [[Similarity.kmeansCentroids]]. That makes Lloyd
  * SQL-replayable after all: [[searchOracleSql]] / [[ivfPqOracleSql]]
  * unroll the iterations as MATERIALIZED CTE blocks (the
  * [[LogReg.oracleCtes]] discipline), with every floating reduction —
  * subspace L2s, ADC sums, exact re-rank distances — replayed in the
  * identical left-to-right order so doubles are bit-equal across
  * engines. PqSpec keeps the semantic gates: codebook shape, encode
  * determinism, self-query rank-1, and recall vs the exact L2 top-k.
  */
object Pq {

  /** codebooks(j)(c) = centroid c of subspace j (length d/m each). */
  def trainCodebooks(emb: DataFrame, m: Int, ksub: Int,
                     maxIter: Int = 8): Array[Array[Array[Double]]] = {
    require(m >= 1 && ksub >= 1 && maxIter >= 1)
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val sub = d / m
    val v = transform(col("embedding"), _.cast("double"))
    val sv = emb.select(col("vec_id"), explode(transform(
      sequence(lit(0), lit(m - 1)),
      j => struct(j.as("j"),
        slice(v, j * lit(sub) + 1, lit(sub)).as("sv")))).as("e"))
      .select(col("vec_id"), col("e.j").as("j"), col("e.sv").as("sv"))
      .localCheckpoint(true) // feeds every Lloyd iteration
    // init: per subspace, the subvectors of the ksub lowest vec_ids
    val wInit = Window.partitionBy("j").orderBy("vec_id")
    val init = sv.withColumn("_rn", row_number().over(wInit))
      .filter(col("_rn") <= ksub)
      .select(col("j"), (col("_rn") - 1).as("c"), col("sv"))
      .collect()
    val books = Array.fill(m, ksub)(Array.fill(sub)(0.0))
    init.foreach(r =>
      books(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray)
    var it = 0
    while (it < maxIter) {
      val code = assignExpr(books, col("j"), col("sv"))
      // exact DECIMAL lane sums (the kmeansCentroids discipline): the
      // mean double is order-free, so the unrolled SQL replay
      // (oracleCtes) reproduces it bit-for-bit from any aggregation order
      val means = sv.select(col("j"), code.as("c"),
        posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("j", "c", "dim")
        .agg(sum(col("x").cast("decimal(28,12)")).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      means.foreach { r =>
        books(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDecimal(3).doubleValue() / r.getLong(4) // empty cells keep old centroid
      }
      it += 1
    }
    books
  }

  /** argmin-L2 code per (subspace, subvector): first position of the
    * minimum in the per-centroid d² array — ties toward the lowest code
    * by construction.
    */
  private def assignExpr(books: Array[Array[Array[Double]]],
                         j: Column, sv: Column): Column = {
    val lit3 = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val cents = element_at(lit3, j + 1)
    val d2s = transform(sequence(lit(0), lit(books(0).length - 1)),
      c => aggregate(zip_with(sv, element_at(cents, c + 1),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
    (array_position(d2s, array_min(d2s)) - 1).cast("int")
  }

  /** (vec_id, codes array<int> of length m): the compressed index. */
  def encode(emb: DataFrame, books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val sub = books(0)(0).length
    val v = transform(col("embedding"), _.cast("double"))
    val codes = transform(sequence(lit(0), lit(m - 1)),
      j => assignExpr(books, j, slice(v, j * lit(sub) + 1, lit(sub))))
    emb.select(col("vec_id"), codes.as("codes"))
  }

  /** IVF-PQ (the faiss IndexIVFPQ composition): a coarse quantizer
    * (L2 k-means over FULL vectors, same deterministic discipline)
    * partitions the corpus into cells; PQ codebooks train on RESIDUALS
    * (vector − its cell centroid), which carry far less variance than
    * raw vectors, so the same code budget quantizes finer. Search
    * probes the `nProbe` nearest cells per query and scores ONLY their
    * members by per-(query, cell) residual distance tables. At scale
    * this is the index layout that avoids touching the whole corpus
    * per query: candidate mass is the probed cells' share of n.
    *
    * Returns (query_id, rank, vec_id, adc_d2, d2) like [[search]].
    */
  def ivfPqSearch(emb: DataFrame, nCells: Int, m: Int, ksub: Int,
                  nQueries: Int = 10, k: Int = 5, nProbe: Int = 2,
                  rerank: Int = 64, maxIter: Int = 8): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells)
    val spark = emb.sparkSession
    import spark.implicits._
    // coarse quantizer: deterministic L2 k-means over full vectors
    val coarse = trainCoarse(emb, nCells, maxIter)
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    val v = transform(col("embedding"), _.cast("double"))
    val cellD2s = transform(sequence(lit(0), lit(nCells - 1)),
      c => aggregate(zip_with(v, element_at(coarseLit, c + 1),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
    val cellOf = (array_position(cellD2s, array_min(cellD2s)) - 1).cast("int")
    // residuals against the assigned cell centroid
    val resid = zip_with(v, element_at(coarseLit, cellOf + 1),
      (a, b) => a - b)
    val residDf = emb.select(col("vec_id"), cellOf.as("cell"),
      resid.as("embedding")).localCheckpoint(true)
    // PQ codebooks on residuals (shared across cells — the faiss layout)
    val books = trainCodebooks(
      residDf.select(col("vec_id"), col("embedding")), m, ksub, maxIter)
    val codes = encode(residDf.select(col("vec_id"), col("embedding")), books)
      .join(residDf.select(col("vec_id"), col("cell")), "vec_id")
    val sub = books(0)(0).length
    val ksubL = books(0).length
    // per-query probed cells + per-(query, probed-cell) residual tables
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), v.as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val probes = queries.flatMap { case (qid, qv) =>
      val cellD2 = coarse.map { c =>
        var s = 0.0; var t = 0
        while (t < qv.length) { val d = qv(t) - c(t); s += d * d; t += 1 }
        s
      }
      cellD2.zipWithIndex.sortBy { case (d, i) => (d, i) }.take(nProbe)
        .map { case (_, cell) =>
          val qr = Array.tabulate(qv.length)(t => qv(t) - coarse(cell)(t))
          val flat = Array.ofDim[Double](m * ksubL)
          for (j <- 0 until m; c <- 0 until ksubL) {
            var s = 0.0; var t = 0
            while (t < sub) {
              val d = qr(j * sub + t) - books(j)(c)(t); s += d * d; t += 1
            }
            flat(j * ksubL + c) = s
          }
          (qid, cell, flat.toSeq, qv.toSeq)
        }
    }.toSeq.toDF("query_id", "cell", "tbl", "qv")
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc +
        element_at(col("tbl"), j * ksubL + element_at(col("codes"), j + 1) + 1))
    val exactD2 = aggregate(zip_with(col("v"), col("qv"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc_d2").asc, col("vec_id").asc)
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("d2").asc, col("vec_id").asc)
    codes
      // probed-cell members only: the equi-join IS the inverted index
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_d2", adc)
      .withColumn("_rn", row_number().over(wAdc))
      .filter(col("_rn") <= rerank)
      .join(emb.select(col("vec_id"), v.as("v")), "vec_id")
      .withColumn("d2", round(exactD2, 6))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("adc_d2"), 6).as("adc_d2"), col("d2"))
  }

  /** Deterministic L2 k-means over full vectors (the coarse quantizer):
    * init = the `k` lowest vec_ids' vectors, then `maxIter` Lloyd
    * iterations of broadcast-assign + per-(cell, dim) mean.
    */
  def trainCoarse(emb: DataFrame, k: Int,
                  maxIter: Int = 8): Array[Array[Double]] = {
    val v = transform(col("embedding"), _.cast("double"))
    val e = emb.select(col("vec_id"), v.as("v")).localCheckpoint(true)
    var cents = e.orderBy("vec_id").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < maxIter) {
      val centLit = typedLit(cents.map(_.toSeq).toSeq)
      val d2s = transform(sequence(lit(0), lit(cents.length - 1)),
        c => aggregate(zip_with(col("v"), element_at(centLit, c + 1),
          (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
      val cell = (array_position(d2s, array_min(d2s)) - 1).cast("int")
      // exact DECIMAL lane sums — see trainCodebooks; keeps the coarse
      // quantizer's means order-free for the SQL replay
      val means = e.select(cell.as("cell"),
        posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(sum(col("x").cast("decimal(28,12)")).as("sx"),
          count(lit(1)).as("n"))
        .collect()
      means.foreach { r =>
        cents(r.getInt(0))(r.getInt(1)) =
          r.getDecimal(2).doubleValue() / r.getLong(3)
      }
      it += 1
    }
    cents
  }

  /** Squared-L2 between two DOUBLE lists, replayed in the identical
    * order as the Spark-side `aggregate(zip_with(...), 0.0, acc + x)`
    * fold and the driver-side while-loops: the diff list keeps per-lane
    * subtraction exact, and `list_dot_product` accumulates
    * left-to-right in doubles (the same bit-equality the sim_* cosine
    * oracles already rely on; the 0.0 seed is a no-op since
    * `0.0 + x == x`).
    */
  private def d2Sql(a: String, b: String): String = {
    val d = diffSql(a, b)
    s"list_dot_product($d, $d)"
  }

  /** Lane-wise `a - b` over DOUBLE lists (unnamed-struct zip). */
  private def diffSql(a: String, b: String): String =
    s"list_transform(list_zip($a, $b), p -> p[1] - p[2])"

  /** DuckDB replay of [[trainCodebooks]] + [[encode]] over a CTE
    * `src`(vec_id, `vcol` DOUBLE list): subvector frame, ordered init,
    * `iters` unrolled Lloyd blocks (argmin with the (d2 asc, code asc)
    * total order; exact DECIMAL lane means; empty cells keep the old
    * centroid via LEFT JOIN coalesce), ending in `bookf`(j, c, bv) and
    * `codes`(vec_id, j, c).
    */
  private def codebookCtes(src: String, vcol: String, m: Int, ksub: Int,
                           sub: Int, iters: Int): Seq[String] = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""sv AS MATERIALIZED (
               |  SELECT vec_id, r.j, $vcol[r.j*$sub+1 : r.j*$sub+$sub] AS sv
               |  FROM $src CROSS JOIN (SELECT unnest(range(0, $m)) AS j) r)""".stripMargin
    ctes += "svx AS MATERIALIZED (SELECT vec_id, j, generate_subscripts(sv, 1) AS dim, unnest(sv) AS x FROM sv)"
    ctes += s"""bookx0 AS MATERIALIZED (
               |  SELECT j, CAST(rn - 1 AS INT) AS c,
               |         generate_subscripts(sv, 1) AS dim, unnest(sv) AS bx FROM (
               |    SELECT j, sv, row_number() OVER (PARTITION BY j ORDER BY vec_id) AS rn
               |    FROM sv) WHERE rn <= $ksub)""".stripMargin
    for (t <- 1 to iters) {
      val p = t - 1
      ctes += s"""book$p AS (SELECT j, c, list(bx ORDER BY dim) AS bv FROM bookx$p GROUP BY j, c),
                 |asg$t AS MATERIALIZED (
                 |  SELECT vec_id, j, c FROM (
                 |    SELECT s.vec_id, s.j, b.c,
                 |           row_number() OVER (PARTITION BY s.vec_id, s.j
                 |             ORDER BY ${d2Sql("s.sv", "b.bv")} ASC, b.c ASC) AS rn
                 |    FROM sv s JOIN book$p b USING (j)) WHERE rn = 1),
                 |mean$t AS (
                 |  SELECT a.j, a.c, u.dim,
                 |         CAST(sum(CAST(u.x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
                 |  FROM asg$t a JOIN svx u USING (vec_id, j) GROUP BY 1, 2, 3),
                 |bookx$t AS MATERIALIZED (
                 |  SELECT b.j, b.c, b.dim, coalesce(m.m, b.bx) AS bx
                 |  FROM bookx$p b LEFT JOIN mean$t m ON b.j = m.j AND b.c = m.c AND b.dim = m.dim)""".stripMargin
    }
    ctes += s"bookf AS MATERIALIZED (SELECT j, c, list(bx ORDER BY dim) AS bv FROM bookx$iters GROUP BY j, c)"
    ctes += s"""codes AS MATERIALIZED (
               |  SELECT vec_id, j, c FROM (
               |    SELECT s.vec_id, s.j, b.c,
               |           row_number() OVER (PARTITION BY s.vec_id, s.j
               |             ORDER BY ${d2Sql("s.sv", "b.bv")} ASC, b.c ASC) AS rn
               |    FROM sv s JOIN bookf b USING (j)) WHERE rn = 1)""".stripMargin
    ctes.result()
  }

  /** ADC → exact-re-rank tail shared by [[searchOracleSql]] and
    * [[ivfPqOracleSql]]: per-(query, candidate) ADC as a j-ordered
    * `list_reduce` sum of table lookups (the identical left-to-right
    * fold as the Spark `aggregate` over `sequence(0, m-1)`), rerank-cut
    * on unrounded ADC, exact 6-dp-rounded L2 re-rank with vec_id ties.
    */
  private def searchTail(k: Int, rerank: Int): String =
    s"""cand AS (
       |  SELECT query_id, vec_id, adc_d2 FROM (
       |    SELECT query_id, vec_id, adc_d2,
       |           row_number() OVER (PARTITION BY query_id
       |             ORDER BY adc_d2 ASC, vec_id ASC) AS rn
       |    FROM adc) WHERE rn <= $rerank),
       |rr AS (
       |  SELECT c.query_id, c.vec_id, c.adc_d2, round(${d2Sql("e.v", "q.qv")}, 6) AS d2v
       |  FROM cand c JOIN e ON c.vec_id = e.vec_id JOIN q ON c.query_id = q.query_id)
       |SELECT query_id,
       |       CAST(row_number() OVER (PARTITION BY query_id
       |            ORDER BY d2v ASC, vec_id ASC) AS BIGINT) AS rank,
       |       vec_id, round(adc_d2, 6) AS adc_d2, d2v AS d2
       |FROM rr
       |QUALIFY rank <= $k""".stripMargin

  /** DuckDB replay of [[trainCodebooks]] + [[search]] end-to-end. */
  def searchOracleSql(m: Int, ksub: Int, dim: Int, iters: Int,
                      nQueries: Int, k: Int, rerank: Int): String = {
    val sub = dim / m
    val ctes = Seq.newBuilder[String]
    ctes += "e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
    ctes ++= codebookCtes("e", "v", m, ksub, sub, iters)
    ctes += s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQueries)"
    ctes += s"""qsv AS (
               |  SELECT query_id, r.j, qv[r.j*$sub+1 : r.j*$sub+$sub] AS qsv
               |  FROM q CROSS JOIN (SELECT unnest(range(0, $m)) AS j) r)""".stripMargin
    ctes += s"""tbl AS MATERIALIZED (
               |  SELECT s.query_id, b.j, b.c, ${d2Sql("s.qsv", "b.bv")} AS pd2
               |  FROM qsv s JOIN bookf b USING (j))""".stripMargin
    ctes += """adc AS (
              |  SELECT t.query_id, cd.vec_id,
              |         list_reduce(list(t.pd2 ORDER BY t.j), (a, b) -> a + b) AS adc_d2
              |  FROM codes cd JOIN tbl t ON cd.j = t.j AND cd.c = t.c
              |  WHERE cd.vec_id <> t.query_id GROUP BY 1, 2)""".stripMargin
    s"WITH ${ctes.result().mkString(",\n")},\n${searchTail(k, rerank)}"
  }

  /** DuckDB replay of [[ivfPqSearch]]: coarse L2 k-means (`iters`
    * unrolled blocks, ordered init, exact DECIMAL means), residuals,
    * PQ codebooks trained on the residual frame, per-(query, probed
    * cell) residual distance tables, cell-restricted ADC, exact
    * re-rank against the ORIGINAL vectors.
    */
  def ivfPqOracleSql(nCells: Int, m: Int, ksub: Int, dim: Int, iters: Int,
                     nQueries: Int, k: Int, nProbe: Int,
                     rerank: Int): String = {
    val sub = dim / m
    val ctes = Seq.newBuilder[String]
    ctes += "e AS MATERIALIZED (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"
    ctes += "ex AS MATERIALIZED (SELECT vec_id, generate_subscripts(embedding, 1) AS idx, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings)"
    ctes += s"""cseeds AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell
               |  FROM (SELECT vec_id FROM e ORDER BY vec_id LIMIT $nCells))""".stripMargin
    ctes += "ccx0 AS MATERIALIZED (SELECT s.cell, u.idx, u.x AS c FROM cseeds s JOIN ex u USING (vec_id))"
    for (t <- 1 to iters) {
      val p = t - 1
      ctes += s"""ccl$p AS (SELECT cell, list(c ORDER BY idx) AS cv FROM ccx$p GROUP BY cell),
                 |casg$t AS MATERIALIZED (
                 |  SELECT vec_id, cell FROM (
                 |    SELECT e.vec_id, c.cell,
                 |           row_number() OVER (PARTITION BY e.vec_id
                 |             ORDER BY ${d2Sql("e.v", "c.cv")} ASC, c.cell ASC) AS rn
                 |    FROM e CROSS JOIN ccl$p c) WHERE rn = 1),
                 |cmean$t AS (
                 |  SELECT a.cell, u.idx,
                 |         CAST(sum(CAST(u.x AS DECIMAL(28,12))) AS DOUBLE) / count(*) AS m
                 |  FROM casg$t a JOIN ex u USING (vec_id) GROUP BY 1, 2),
                 |ccx$t AS MATERIALIZED (
                 |  SELECT c.cell, c.idx, coalesce(m.m, c.c) AS c
                 |  FROM ccx$p c LEFT JOIN cmean$t m ON c.cell = m.cell AND c.idx = m.idx)""".stripMargin
    }
    ctes += s"ccent AS MATERIALIZED (SELECT cell, list(c ORDER BY idx) AS cv FROM ccx$iters GROUP BY cell)"
    ctes += s"""rcell AS MATERIALIZED (
               |  SELECT vec_id, cell FROM (
               |    SELECT e.vec_id, c.cell,
               |           row_number() OVER (PARTITION BY e.vec_id
               |             ORDER BY ${d2Sql("e.v", "c.cv")} ASC, c.cell ASC) AS rn
               |    FROM e CROSS JOIN ccent c) WHERE rn = 1)""".stripMargin
    ctes += s"""resid AS MATERIALIZED (
               |  SELECT e.vec_id, ${diffSql("e.v", "c.cv")} AS rv
               |  FROM e JOIN rcell r USING (vec_id) JOIN ccent c ON r.cell = c.cell)""".stripMargin
    ctes ++= codebookCtes("resid", "rv", m, ksub, sub, iters)
    ctes += s"q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $nQueries)"
    ctes += s"""probed AS MATERIALIZED (
               |  SELECT query_id, cell, ${diffSql("qv", "cv")} AS qr FROM (
               |    SELECT q.query_id, q.qv, c.cell, c.cv,
               |           row_number() OVER (PARTITION BY q.query_id
               |             ORDER BY ${d2Sql("q.qv", "c.cv")} ASC, c.cell ASC) AS rn
               |    FROM q CROSS JOIN ccent c) WHERE rn <= $nProbe)""".stripMargin
    ctes += s"""qrsv AS (
               |  SELECT query_id, cell, r.j, qr[r.j*$sub+1 : r.j*$sub+$sub] AS qsv
               |  FROM probed CROSS JOIN (SELECT unnest(range(0, $m)) AS j) r)""".stripMargin
    ctes += s"""tblq AS MATERIALIZED (
               |  SELECT s.query_id, s.cell, b.j, b.c, ${d2Sql("s.qsv", "b.bv")} AS pd2
               |  FROM qrsv s JOIN bookf b USING (j))""".stripMargin
    ctes += """adc AS (
              |  SELECT t.query_id, cd.vec_id,
              |         list_reduce(list(t.pd2 ORDER BY t.j), (a, b) -> a + b) AS adc_d2
              |  FROM codes cd JOIN rcell r USING (vec_id)
              |  JOIN tblq t ON r.cell = t.cell AND cd.j = t.j AND cd.c = t.c
              |  WHERE cd.vec_id <> t.query_id GROUP BY 1, 2)""".stripMargin
    s"WITH ${ctes.result().mkString(",\n")},\n${searchTail(k, rerank)}"
  }

  /** ADC top-k: queries = the `nQueries` lowest vec_ids (the family's
    * query-set contract); per query the m×ksub table of partial L2s to
    * every centroid is computed driver-side and shipped as a literal;
    * candidates score by m lookups; per-query top-k by (distance,
    * vec_id). `rerank` > k re-ranks that many ADC candidates exactly —
    * the standard PQ pipeline shape (rerank = k means pure ADC order).
    */
  def search(emb: DataFrame, books: Array[Array[Array[Double]]],
             nQueries: Int = 10, k: Int = 5, rerank: Int = 25): DataFrame = {
    require(rerank >= k, "rerank depth must be >= k")
    val m = books.length
    val ksub = books(0).length
    val sub = books(0)(0).length
    val spark = emb.sparkSession
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("qv"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val tables = queries.map { case (qid, qv) =>
      val flat = Array.ofDim[Double](m * ksub)
      for (j <- 0 until m; c <- 0 until ksub) {
        var s = 0.0
        var t = 0
        while (t < sub) {
          val diff = qv(j * sub + t) - books(j)(c)(t)
          s += diff * diff
          t += 1
        }
        flat(j * ksub + c) = s
      }
      (qid, flat.toSeq, qv.toSeq)
    }.toSeq.toDF("query_id", "tbl", "qv")
    val codesDf = encode(emb, books)
      .join(emb.select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v")), "vec_id")
    val adc = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0),
      (acc, j) => acc +
        element_at(col("tbl"), j * ksub + element_at(col("codes"), j + 1) + 1))
    val exactD2 = aggregate(zip_with(col("v"), col("qv"),
      (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x)
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc_d2").asc, col("vec_id").asc)
    val cand = codesDf.crossJoin(broadcast(tables))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc_d2", adc)
      .withColumn("_rn", row_number().over(wAdc))
      .filter(col("_rn") <= rerank)
    val wExact = Window.partitionBy("query_id")
      .orderBy(col("d2").asc, col("vec_id").asc)
    cand
      .withColumn("d2", round(exactD2, 6))
      .withColumn("rank", row_number().over(wExact).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id"),
        round(col("adc_d2"), 6).as("adc_d2"), col("d2"))
  }
}
