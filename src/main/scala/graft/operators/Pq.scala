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
  * centroid — the whole train/encode/search chain is a pure function of
  * the input (no RNG), like [[Similarity.kmeansCentroids]]. No SQL
  * oracle (Lloyd iterations); PqSpec gates codebook shape, encode
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
      val means = sv.select(col("j"), code.as("c"),
        posexplode(col("sv")).as(Seq("dim", "x")))
        .groupBy("j", "c", "dim")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      means.foreach { r =>
        books(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
          r.getDouble(3) / r.getLong(4) // empty cells keep old centroid
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
      val means = e.select(cell.as("cell"),
        posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cell", "dim")
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .collect()
      means.foreach { r =>
        cents(r.getInt(0))(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
      }
      it += 1
    }
    cents
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
