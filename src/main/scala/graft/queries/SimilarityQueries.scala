package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Similarity-search queries over `embeddings`, oracled with the identical
  * double-precision cosine formula (dot / (|a|·|b|)) and — for the LSH
  * variant — the same md5-derived hyperplane constants embedded as SQL
  * literals.
  */
object SimilarityQueries {

  private val cosSql =
    "list_dot_product(%s, %s) / nullif(sqrt(list_dot_product(%s, %s)) * sqrt(list_dot_product(%s, %s)), 0.0)"

  private def cos(a: String, b: String): String =
    cosSql.format(a, b, a, a, b, b)

  private val prepCte =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |       FROM embeddings)""".stripMargin

  /** DuckDB replay of the IVF probe chain — shared by sim_ivf_search
    * (train-inline) and sim_index_search (probes from persisted
    * centroid/assignment tables): identical results IS the differential
    * gate for ANN index persistence.
    */
  private lazy val ivfSearchOracleSql: String = ivfSearchOracle()

  /** `centWhere` restricts the TRAINING corpus for the centroid CTEs —
    * the frozen-centroid regime (`sim_index_stream`): centroids from the
    * base subset, assignment/probe over the full corpus.
    */
  private def ivfSearchOracle(centWhere: String = "",
                              searchCond: String = "TRUE"): String =
    s"""WITH ex AS (
       |  SELECT label, generate_subscripts(embedding, 1) AS idx,
       |         unnest(embedding) AS val
       |  FROM embeddings $centWhere),
       |cm AS (
       |  SELECT label, idx,
       |         round(CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
       |               / count(*), 6) AS c
       |  FROM ex GROUP BY 1, 2),
       |cent AS (SELECT label, list(c ORDER BY idx) AS cv FROM cm GROUP BY label),
       |$prepCte,
       |asg0 AS (
       |  SELECT vec_id, label, round(${cos("v", "cv")}, 6) AS acos
       |  FROM e CROSS JOIN cent WHERE $searchCond),
       |assign AS (
       |  SELECT vec_id, label AS cell FROM (
       |    SELECT vec_id, label,
       |           row_number() OVER (PARTITION BY vec_id
       |             ORDER BY acos DESC, label) AS rn
       |    FROM asg0) WHERE rn = 1),
       |q AS (SELECT vec_id AS query_id, v AS qv
       |      FROM e WHERE vec_id < 10 AND $searchCond),
       |probes AS (
       |  SELECT query_id, qv, cell FROM (
       |    SELECT q.query_id, q.qv, cent.label AS cell,
       |           row_number() OVER (PARTITION BY q.query_id
       |             ORDER BY round(${cos("q.qv", "cent.cv")}, 6) DESC,
       |                      cent.label) AS rn
       |    FROM q CROSS JOIN cent) WHERE rn <= 2),
       |scored AS (
       |  SELECT p.query_id, a.vec_id,
       |         round(${cos("p.qv", "e.v")}, 6) AS cos
       |  FROM probes p
       |  JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.query_id
       |  JOIN e ON a.vec_id = e.vec_id)
       |SELECT query_id,
       |       CAST(row_number() OVER (PARTITION BY query_id
       |            ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
       |       vec_id, cos
       |FROM scored
       |QUALIFY rank <= 5""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // dimension reduction in use: every embedding projected onto the
    // dominant component (one broadcast of the 64 loadings, a zip_with
    // dot per row — no shuffle), summarized as exact per-label projection
    // stats. Composes sim_pca_top's component with the corpus.
    "sim_pca_project" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        // rounded loadings on BOTH sides — the projection inputs must be
        // bit-identical or round6(p) could flip at a rounding boundary
        val comp = graft.operators.Pca
          .topComponent(s, Tables.embeddings(s, dir), "embedding", iters = 12)
          .select(col("component_idx"), round(col("loading"), 6).as("l"))
          .orderBy("component_idx").collect().map(_.getDouble(1))
        val loadings = array(comp.map(lit): _*)
        val proj = aggregate(
          zip_with(col("embedding"), loadings,
            (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x)
        graft.QueryDef.round6(Tables.embeddings(s, dir)
          .select(col("label"), round(proj, 6).as("p"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            sum(col("p")).as("sum_proj"),
            min(col("p")).as("min_proj"),
            max(col("p")).as("max_proj")))
      },
      oracle = Some {
        val chain = graft.operators.Pca.oracleSql(
          "embeddings", "embedding", dim = 64, iters = 12)
        // reuse the component chain as a subquery; project with the same
        // rounded loadings the Spark side broadcasts
        s"""WITH comp AS ($chain),
           |ex AS (SELECT vec_id, label, unnest(range(0, 64)) AS i,
           |              unnest(embedding) AS x FROM embeddings),
           |pr AS (SELECT e.vec_id, e.label,
           |              round(sum(CAST(e.x AS DOUBLE) * c.loading), 6) AS p
           |       FROM ex e JOIN comp c ON e.i = c.component_idx
           |       GROUP BY 1, 2)
           |SELECT label, count(*) AS n,
           |       round(sum(p), 6) AS sum_proj,
           |       round(min(p), 6) AS min_proj,
           |       round(max(p), 6) AS max_proj
           |FROM pr GROUP BY label""".stripMargin
      }
    ),

    // dominant principal component by power iteration: the ONLY
    // data-sized pass is the declarative Gram aggregate (n·d² product
    // tuples collapse map-side to ≤ d² partials per partition); the d×d
    // iteration is driver-side metadata scale. Exactly 12 iterations on
    // both engines — the result is a deterministic function of G, so the
    // oracle replays the same unrolled matvec chain and round6 absorbs
    // fp-sum-order noise.
    "sim_pca_top" -> QueryDef(
      build = (s, dir) => graft.QueryDef.round6(graft.operators.Pca
        .topComponent(s, Tables.embeddings(s, dir), "embedding", iters = 12)),
      oracle = Some(graft.operators.Pca.oracleSql(
        "embeddings", "embedding", dim = 64, iters = 12))
    ),

    // top-3 components via deflation on the SAME single Gram pass —
    // λ = vᵀGv, G ← G − λvvᵀ between components; d×d×k·iters stays
    // driver-side metadata scale. Parity needs determinism, not
    // convergence: both engines unroll the identical iterate/λ/deflate
    // chain (oracle CTEs generated from the same (k, iters)).
    "sim_pca_topk" -> QueryDef(
      build = (s, dir) => graft.QueryDef.round6(graft.operators.Pca
        .topKComponents(s, Tables.embeddings(s, dir), "embedding",
          k = 3, iters = 12)),
      oracle = Some(graft.operators.Pca.oracleKSql(
        "embeddings", "embedding", dim = 64, k = 3, iters = 12))
    ),

    "sim_topk" -> QueryDef(
      build = (s, dir) => Similarity.topK(Tables.embeddings(s, dir),
        nQueries = 10, k = 5),
      oracle = Some(
        s"""WITH $prepCte,
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
           |scored AS (
           |  SELECT query_id, vec_id, round(${cos("qv", "v")}, 6) AS cos
           |  FROM e JOIN q ON vec_id <> query_id
           |)
           |SELECT query_id,
           |       CAST(row_number() OVER (PARTITION BY query_id
           |            ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
           |       vec_id, cos
           |FROM scored
           |QUALIFY rank <= 5""".stripMargin),
      headline = true
    ),

    // k-center greedy coreset selection (Sener & Savarese): 8 rounds of
    // "pick the vector farthest from everything selected", min-id seed,
    // 6-dp-rounded cosine distance with id ties — the diversity selector
    // next to dedup (redundancy) and DSIR (distribution match). The
    // oracle unrolls the identical 8 argmax rounds with MATERIALIZED
    // CTEs (each round reads its predecessor's distance frame AND pick).
    // The returned radius sequence is monotone non-increasing — the
    // coverage guarantee — and SimilaritySpec pins it.
    "sim_kcenter_select" -> QueryDef(
      build = (s, dir) => Similarity.kCenterSelect(
        Tables.embeddings(s, dir), k = 8),
      oracle = Some {
        val rounds = (2 to 8).map { i =>
          val (dp, sp) = (s"d${i - 1}", s"s${i - 1}")
          s"""d$i AS MATERIALIZED (
             |  SELECT $dp.vec_id, $dp.v,
             |         least($dp.d, round(1.0 - ${cos(s"$dp.v", s"$sp.v")}, 6)) AS d
             |  FROM $dp CROSS JOIN $sp),
             |s$i AS MATERIALIZED (
             |  SELECT vec_id, v, d FROM d$i ORDER BY d DESC, vec_id LIMIT 1)""".stripMargin
        }.mkString(",\n")
        val out = (1 to 8).map(i =>
          s"SELECT CAST($i AS BIGINT) AS rank, vec_id, d FROM s$i")
          .mkString("\nUNION ALL\n")
        s"""WITH el AS (SELECT vec_id,
           |              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |            FROM embeddings),
           |c0 AS MATERIALIZED (
           |  SELECT v AS cv FROM el
           |  WHERE vec_id = (SELECT min(vec_id) FROM el)),
           |d1 AS MATERIALIZED (
           |  SELECT el.vec_id, el.v, round(1.0 - ${cos("el.v", "c0.cv")}, 6) AS d
           |  FROM el CROSS JOIN c0),
           |s1 AS MATERIALIZED (
           |  SELECT vec_id, v, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1),
           |$rounds
           |$out""".stripMargin
      }
    ),

    // maximal-marginal-relevance selection: the relevance-weighted
    // diversity re-ranker next to k-center's pure coverage — 8 rounds of
    // argmax over λ·rel − (1−λ)·max-sim-to-selected (λ=0.7, rel = 6-dp
    // cosine to the min-id query vector, penalty floor 0, picked rows
    // leave the pool). The oracle unrolls the identical argmax rounds as
    // MATERIALIZED CTEs; the penalty constant is spelled (1.0 - 0.7) so
    // both engines fold the same IEEE double.
    "sim_mmr_select" -> QueryDef(
      build = (s, dir) => Similarity.mmrSelect(
        Tables.embeddings(s, dir), k = 8, lambda = 0.7),
      oracle = Some {
        val score = "round(0.7*rel - (1.0 - 0.7)*ms, 6)"
        val rounds = (2 to 8).map { i =>
          val (dp, sp) = (s"d${i - 1}", s"s${i - 1}")
          s"""d$i AS MATERIALIZED (
             |  SELECT $dp.vec_id, $dp.v, $dp.rel,
             |         greatest($dp.ms, round(${cos(s"$dp.v", s"$sp.v")}, 6))
             |           AS ms
             |  FROM $dp CROSS JOIN $sp WHERE $dp.vec_id <> $sp.vec_id),
             |s$i AS MATERIALIZED (
             |  SELECT vec_id, v, rel, $score AS score
             |  FROM d$i ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
        }.mkString(",\n")
        val out = (1 to 8).map(i =>
          s"SELECT CAST($i AS BIGINT) AS rank, vec_id, rel, score FROM s$i")
          .mkString("\nUNION ALL\n")
        s"""WITH el AS (SELECT vec_id,
           |              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |            FROM embeddings),
           |q0 AS MATERIALIZED (
           |  SELECT v AS qv FROM el
           |  WHERE vec_id = (SELECT min(vec_id) FROM el)),
           |d1 AS MATERIALIZED (
           |  SELECT el.vec_id, el.v,
           |         round(${cos("el.v", "q0.qv")}, 6) AS rel, 0.0 AS ms
           |  FROM el CROSS JOIN q0),
           |s1 AS MATERIALIZED (
           |  SELECT vec_id, v, rel, $score AS score
           |  FROM d1 ORDER BY score DESC, vec_id LIMIT 1),
           |$rounds
           |$out""".stripMargin
      }
    ),

    // hard-negative mining: per query, top-5 most-similar vectors with a
    // DIFFERENT label — the contrastive-training batch builder's
    // "closest impostors". sim_topk's broadcast brute scan with the
    // label guard in the join; the oracle's QUALIFY replay pins that
    // same-label rows never enter the ranking.
    "sim_hard_negatives" -> QueryDef(
      build = (s, dir) => Similarity.hardNegatives(
        Tables.embeddings(s, dir), nQueries = 10, k = 5),
      oracle = Some(
        s"""WITH el AS (SELECT vec_id, label,
           |              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |            FROM embeddings),
           |q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv
           |      FROM el WHERE vec_id < 10),
           |scored AS (
           |  SELECT query_id, vec_id, round(${cos("qv", "v")}, 6) AS cos
           |  FROM el JOIN q ON label <> qlabel
           |)
           |SELECT query_id,
           |       CAST(row_number() OVER (PARTITION BY query_id
           |            ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
           |       vec_id, cos
           |FROM scored
           |QUALIFY rank <= 5""".stripMargin)
    ),

    // near-dup detection on the SCALE path: banded random-hyperplane LSH
    // (48 planes, 12 bands of 4 bits → candidate space ~n²/2^4 per band,
    // never a cross product). Band width sets the recall/cost tradeoff:
    // 4-bit bands give ≥0.8 recall at the minCos boundary (gated against
    // the exact baseline in SimilaritySpec); widen the bands to shrink the
    // candidate space when the corpus grows and lower recall is acceptable.
    // Johnson–Lindenstrauss random projection — the DATA-INDEPENDENT
    // dimension reduction next to PCA (learned) and PQ (quantized):
    // 64→16 dims via the deterministic ±1 sign matrix scaled 1/√16, no
    // training pass at all, distances preserved within JL distortion
    // (SimilaritySpec gates top-5 recall of projected cosine vs exact).
    // The oracled view: exact per-label stats of the first projected
    // coordinate, the same contract as sim_pca_project. Map-side only.
    "sim_jl_project" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val coefs = VectorFunctions.hyperplanes(16, 64).head
        val proj = aggregate(
          zip_with(col("embedding"), typedLit(coefs),
            (x, w) => x.cast("double") * w),
          lit(0.0), (acc, x) => acc + x) / lit(4.0) // 1/sqrt(16)
        graft.QueryDef.round6(Tables.embeddings(s, dir)
          .select(col("label"), round(proj, 6).as("p"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            sum(col("p")).as("sum_proj"),
            min(col("p")).as("min_proj"),
            max(col("p")).as("max_proj")))
      },
      oracle = Some {
        val lst = VectorFunctions.hyperplanes(16, 64).head
          .map(c => if (c > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
        s"""WITH pr AS (
           |  SELECT label,
           |         round(list_dot_product(
           |           list_transform(embedding, x -> CAST(x AS DOUBLE)),
           |           $lst) / 4.0, 6) AS p
           |  FROM embeddings)
           |SELECT label, count(*) AS n,
           |       round(sum(p), 6) AS sum_proj,
           |       round(min(p), 6) AS min_proj,
           |       round(max(p), 6) AS max_proj
           |FROM pr GROUP BY label""".stripMargin
      }
    ),

    "sim_near_dup" -> QueryDef(
      build = (s, dir) => Similarity.lshPairs(Tables.embeddings(s, dir),
        dim = 64, nPlanes = 48, bands = 12, minCos = 0.45),
      oracle = Some(lshOracleSql(nPlanes = 48, bands = 12, minCos = 0.45))
    ),

    "sim_topk_quantized" -> QueryDef(
      build = (s, dir) => Similarity.topKQuantized(Tables.embeddings(s, dir),
        nQueries = 10, k = 5),
      oracle = Some(
        s"""WITH qe AS (
           |  SELECT vec_id,
           |         list_aggregate(list_transform(embedding,
           |           x -> abs(CAST(x AS DOUBLE))), 'max') / 127.0 AS scale
           |  FROM embeddings
           |),
           |e AS (
           |  SELECT em.vec_id,
           |         CASE WHEN qe.scale > 0 THEN list_transform(em.embedding,
           |           x -> round(CAST(x AS DOUBLE) / qe.scale, 0)) END AS v
           |  FROM embeddings em JOIN qe ON em.vec_id = qe.vec_id
           |),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
           |scored AS (
           |  SELECT query_id, vec_id, round(${cos("qv", "v")}, 6) AS cos
           |  FROM e JOIN q ON vec_id <> query_id
           |)
           |SELECT query_id,
           |       CAST(row_number() OVER (PARTITION BY query_id
           |            ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
           |       vec_id, cos
           |FROM scored
           |QUALIFY rank <= 5""".stripMargin)
    ),

    "sim_blocked_ivf" -> QueryDef(
      build = (s, dir) => Similarity.blockedPairs(Tables.embeddings(s, dir),
        blockCol = "label", minCos = 0.4),
      oracle = Some(
        s"""WITH e AS (SELECT vec_id, label,
           |            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           |            FROM embeddings)
           |SELECT x.label AS blk, x.vec_id AS a, y.vec_id AS b,
           |       round(${cos("x.v", "y.v")}, 6) AS cos
           |FROM e x JOIN e y ON x.label = y.label AND x.vec_id < y.vec_id
           |WHERE round(${cos("x.v", "y.v")}, 6) >= 0.4""".stripMargin)
    ),

    // embedding-space drift between groups — the training-data monitor
    // for "did source/label X move?": pairwise cosine and L2 distance
    // between per-label centroids. Centroids freeze at their published
    // 6-dp rounding (the sim_centroids grain), then products/norms sum
    // in EXACT decimal at (18,9) so every reduction is order-free and
    // the single double division + sqrt happen identically last. Scale:
    // centroid frame is labels×dims (broadcast-sized at any corpus
    // size); the pair join is labels², tiny.
    "sim_centroid_drift" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val c = Tables.embeddings(s, dir)
          .select(col("label"), posexplode(col("embedding")))
          .select(col("label"), (col("pos") + 1).as("idx"),
            col("col").cast("double").cast("decimal(18,9)").as("val"))
          .groupBy("label", "idx")
          .agg((round(sum(col("val")).cast("double") / count(lit(1)), 6))
            .cast("decimal(18,9)").as("c"))
        val prod = c.as("a")
          .join(c.as("b"),
            col("a.idx") === col("b.idx") && col("a.label") < col("b.label"))
          .groupBy(col("a.label").as("label_a"), col("b.label").as("label_b"))
          .agg(sum(col("a.c") * col("b.c")).as("dot"),
            sum(col("a.c") * col("a.c")).as("na"),
            sum(col("b.c") * col("b.c")).as("nb"))
        prod.select(col("label_a"), col("label_b"),
          round(col("dot").cast("double") /
            nullif(sqrt(col("na").cast("double")) *
              sqrt(col("nb").cast("double")), lit(0.0)), 6).as("cosine"),
          round(sqrt((col("na") + col("nb") - lit(2) * col("dot"))
            .cast("double")), 6).as("l2_dist"))
      },
      oracle = Some(
        """WITH ex AS (
          |  SELECT label, generate_subscripts(embedding, 1) AS idx,
          |         unnest(embedding) AS val
          |  FROM embeddings),
          |c AS (
          |  SELECT label, idx,
          |         CAST(round(CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
          |                    / count(*), 6) AS DECIMAL(18,9)) AS c
          |  FROM ex GROUP BY 1, 2),
          |p AS (
          |  SELECT a.label AS label_a, b.label AS label_b,
          |         sum(a.c * b.c) AS dot,
          |         sum(a.c * a.c) AS na, sum(b.c * b.c) AS nb
          |  FROM c a JOIN c b ON a.idx = b.idx AND a.label < b.label
          |  GROUP BY 1, 2)
          |SELECT label_a, label_b,
          |       round(CAST(dot AS DOUBLE)
          |             / nullif(sqrt(CAST(na AS DOUBLE))
          |                      * sqrt(CAST(nb AS DOUBLE)), 0.0), 6)
          |         AS cosine,
          |       round(sqrt(CAST(na + nb - 2 * dot AS DOUBLE)), 6) AS l2_dist
          |FROM p""".stripMargin)
    ),

    // IVF training step: per-cell centroids (exact decimal-sum mean per
    // lane — one shuffle at (label, lane) grain, merges map-side). The
    // assignment step these feed is sim_blocked_ivf's block column.
    "sim_centroids" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        Tables.embeddings(s, dir)
          .select(col("label"), posexplode(col("embedding")))
          .select(col("label"), (col("pos") + 1).as("idx"),
            col("col").cast("double").cast("decimal(18,9)").as("val"))
          .groupBy("label", "idx")
          .agg(round(sum(col("val")).cast("double") / count(lit(1)), 6)
            .as("centroid"))
      },
      oracle = Some(
        """WITH ex AS (
          |  SELECT label, generate_subscripts(embedding, 1) AS idx,
          |         unnest(embedding) AS val
          |  FROM embeddings)
          |SELECT label, CAST(idx AS BIGINT) AS idx,
          |       round(CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
          |             / count(*), 6) AS centroid
          |FROM ex GROUP BY 1, 2""".stripMargin)
    ),

    // SemDeDup's OTHER half: distance of every vector to its own label
    // centroid, top-50 farthest — the prune-far-from-centroid quality
    // screen and the standard mislabeled-embedding probe. Products and
    // norms sum in EXACT decimal (v at 18,9 per the sim_centroids cast
    // chain, centroid frozen at its published 6-dp rounding) so the
    // per-vector reductions are order-free and the oracle replays them;
    // the single float division per vector happens identically last.
    // Scale: one posexplode + an equi-join on (label, idx) against a
    // label×dim centroid frame (broadcast-sized), one hash-agg per vec.
    "sim_centroid_outliers" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val ex = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"),
            posexplode(col("embedding")))
          .select(col("vec_id"), col("label"), (col("pos") + 1).as("idx"),
            col("col").cast("double").cast("decimal(18,9)").as("v"))
        val cen = ex.groupBy("label", "idx")
          .agg(round(sum(col("v")).cast("double") / count(lit(1)), 6)
            .cast("decimal(18,6)").as("c"))
        ex.join(cen, Seq("label", "idx"))
          .groupBy("vec_id", "label")
          .agg(sum(col("v") * col("c")).as("dot"),
            sum(col("v") * col("v")).as("nv"),
            sum(col("c") * col("c")).as("nc"))
          .select(col("vec_id"), col("label"),
            round(lit(1.0) - col("dot").cast("double") /
              nullif(sqrt(col("nv").cast("double")) *
                sqrt(col("nc").cast("double")), lit(0.0)), 6).as("cdist"))
          .orderBy(desc("cdist"), col("vec_id"))
          .limit(50)
      },
      oracle = Some(
        """WITH ex AS (
          |  SELECT vec_id, label,
          |         generate_subscripts(embedding, 1) AS idx,
          |         unnest(embedding) AS val
          |  FROM embeddings),
          |exd AS (SELECT vec_id, label, idx,
          |               CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)) AS v
          |        FROM ex),
          |cen AS (SELECT label, idx,
          |               CAST(round(CAST(sum(v) AS DOUBLE) / count(*), 6)
          |                 AS DECIMAL(18,6)) AS c
          |        FROM exd GROUP BY 1, 2),
          |j AS (SELECT e.vec_id, e.label,
          |             sum(e.v * c.c) AS dot, sum(e.v * e.v) AS nv,
          |             sum(c.c * c.c) AS nc
          |      FROM exd e JOIN cen c ON e.label = c.label AND e.idx = c.idx
          |      GROUP BY 1, 2)
          |SELECT vec_id, label,
          |       round(1.0 - CAST(dot AS DOUBLE)
          |             / nullif(sqrt(CAST(nv AS DOUBLE))
          |                      * sqrt(CAST(nc AS DOUBLE)), 0.0), 6)
          |         AS cdist
          |FROM j
          |ORDER BY cdist DESC, vec_id LIMIT 50""".stripMargin)
    ),

    // product quantization: 64-dim float vectors compress to 8 byte
    // codes; queries score by asymmetric distance (m table lookups, no
    // decompression) then exact-re-rank the top 64 candidates — the
    // standard PQ pipeline. Rerank depth is the recall lever on
    // concentrated-distance corpora (this synthetic corpus has no
    // cluster structure — the hard case). Fully oracled: Lloyd unrolls
    // into 8 MATERIALIZED CTE blocks (ordered init, total-order argmin,
    // exact DECIMAL lane means) and every float reduction — subspace
    // L2s, ADC, re-rank distances — replays in the identical
    // left-to-right order (Pq.searchOracleSql). PqSpec keeps the
    // semantic gates (shape, determinism, recall >= 0.7 vs exact top-5).
    "sim_pq_search" -> QueryDef(
      build = (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val books = graft.operators.Pq.trainCodebooks(e, m = 8, ksub = 16)
        graft.operators.Pq.search(e, books, nQueries = 10, k = 5,
          rerank = 64)
      },
      oracle = Some(graft.operators.Pq.searchOracleSql(m = 8, ksub = 16,
        dim = 64, iters = 8, nQueries = 10, k = 5, rerank = 64))
    ),

    // the faiss-IndexIVFPQ composition: coarse L2 k-means cells + PQ on
    // RESIDUALS (less variance than raw vectors → finer quantization at
    // the same code budget); queries probe 2 of 4 cells and score only
    // their members via per-(query, cell) residual tables — at scale,
    // candidate mass is the probed cells' share of n, never the corpus.
    // Fully oracled (Pq.ivfPqOracleSql): both Lloyd loops unroll as
    // MATERIALIZED CTE chains, residuals are exact lane subtractions,
    // and the cell-restricted ADC + re-rank replays the same ordered
    // folds. PqSpec keeps determinism and recall gates (2-probe floor +
    // full-probe dominance).
    "sim_ivfpq_search" -> QueryDef(
      build = (s, dir) => graft.operators.Pq.ivfPqSearch(
        Tables.embeddings(s, dir), nCells = 4, m = 8, ksub = 16,
        nQueries = 10, k = 5, nProbe = 2, rerank = 64),
      oracle = Some(graft.operators.Pq.ivfPqOracleSql(nCells = 4, m = 8,
        ksub = 16, dim = 64, iters = 8, nQueries = 10, k = 5, nProbe = 2,
        rerank = 64))
    ),

    // IVF with a REAL trained coarse quantizer (deterministic Lloyd),
    // now fully oracled: the training loop unrolls into 10 MATERIALIZED
    // CTE blocks (kmeansOracleCtes — ordered init, exact decimal lane
    // means, total-order assignment ties), then the standard IVF
    // assign/probe/re-rank replay runs against the trained `kcent`
    // codebook. tol = 0.0 keeps Spark's early-stop bit-equivalent to the
    // oracle's fixed unrolling (stop fires only at an exact fixpoint,
    // where further iterations are no-ops in both engines).
    "sim_ivf_kmeans" -> QueryDef(
      build = (s, dir) => Similarity.ivfSearchKMeans(Tables.embeddings(s, dir),
        nCells = 8, nQueries = 10, k = 5, nProbe = 2, maxIter = 10,
        tol = 0.0),
      oracle = Some(
        s"""WITH ${Similarity.kmeansOracleCtes(k = 8, maxIter = 10)},
           |asgf AS (
           |  SELECT vec_id, cell FROM (
           |    SELECT e.vec_id, c.cell,
           |           row_number() OVER (PARTITION BY e.vec_id
           |             ORDER BY round(${cos("e.v", "c.cv")}, 6) DESC, c.cell) AS rn
           |    FROM e CROSS JOIN kcent c) WHERE rn = 1),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
           |probes AS (
           |  SELECT query_id, qv, cell FROM (
           |    SELECT q.query_id, q.qv, c.cell,
           |           row_number() OVER (PARTITION BY q.query_id
           |             ORDER BY round(${cos("q.qv", "c.cv")}, 6) DESC, c.cell) AS rn
           |    FROM q CROSS JOIN kcent c) WHERE rn <= 2),
           |scored AS (
           |  SELECT p.query_id, a.vec_id, round(${cos("p.qv", "e.v")}, 6) AS cos
           |  FROM probes p
           |  JOIN asgf a ON p.cell = a.cell AND a.vec_id <> p.query_id
           |  JOIN e ON a.vec_id = e.vec_id)
           |SELECT query_id,
           |       CAST(row_number() OVER (PARTITION BY query_id
           |            ORDER BY cos DESC, vec_id) AS BIGINT) AS rank,
           |       vec_id, cos
           |FROM scored
           |QUALIFY rank <= 5""".stripMargin)
    ),

    // the complete IVF chain: train (exact decimal centroid means) →
    // assign (nearest cell, broadcast centroids) → probe (2 nearest cells
    // per query) → exact re-rank within probed cells only. Every rank
    // orders on 6-dp scores with deterministic tiebreaks, so the whole
    // chain hash-matches its SQL replay; SimilaritySpec gates recall vs
    // the exact brute-force top-k.
    "sim_ivf_search" -> QueryDef(
      build = (s, dir) => Similarity.ivfSearch(Tables.embeddings(s, dir),
        nQueries = 10, k = 5, nProbe = 2),
      oracle = Some(ivfSearchOracleSql)
    ),

    // the probe run FROM A PERSISTED INDEX — the ANN twin of
    // dedup_index_screen: centroids and assignments land in two
    // VersionedTables once (train-time), every later probe reads them
    // back and touches the embedding column only for the exact re-rank.
    // Shares sim_ivf_search's oracle verbatim — persisted-index vs
    // train-inline as a differential gate.
    "sim_index_search" -> QueryDef(
      build = (s, dir) => {
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_sis_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val emb = Tables.embeddings(s, dir)
        val (cent, assign) = Similarity.ivfIndex(emb)
        val vtC = graft.sources.VersionedTable(s, s"$root/cent")
        val vtA = graft.sources.VersionedTable(s, s"$root/assign")
        vtC.overwrite(cent)
        vtA.overwrite(assign)
        Similarity.ivfSearchFromIndex(emb, vtC.read(), vtA.read(),
          nQueries = 10, k = 5, nProbe = 2)
      },
      oracle = Some(ivfSearchOracleSql)
    ),

    // STREAMING ANN-index maintenance — X292 (persisted IVF index)
    // composed with the CDF stream: day-0 trains centroids on the base
    // corpus (vec_id % 4 != 0) and persists both index tables; new
    // embeddings then land as three commits in an `incoming`
    // VersionedTable, whose change feed drives a foreachBatch that
    // assigns each arrival against the FROZEN stored centroids and
    // pure-appends to the assignments table — one index commit per
    // corpus commit, never a rebuild. The final probe reads the
    // maintained index over the merged corpus; because centroids are
    // frozen inputs, batch-by-batch assignment is bit-identical to a
    // one-pass assignment of the whole corpus, whatever the arrival
    // order — which is exactly what the oracle replays (base-trained
    // centroids, full-corpus assignment + probe).
    "sim_index_stream" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_sistream_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val emb = Tables.embeddings(s, dir)
        val base = emb.filter(col("vec_id") % 4 =!= 0)
        val (cent, assignBase) = Similarity.ivfIndex(base)
        val vtC = graft.sources.VersionedTable(s, s"$root/cent")
        val vtA = graft.sources.VersionedTable(s, s"$root/assign")
        vtC.overwrite(cent)
        vtA.overwrite(assignBase)
        val inc = graft.sources.VersionedTable(s, s"$root/incoming")
        val arrivals = emb.filter(col("vec_id") % 4 === 0)
          .select(col("vec_id"), col("embedding"))
        inc.overwrite(arrivals.filter(col("vec_id") % 3 === 0))
        inc.append(arrivals.filter(col("vec_id") % 3 === 1))
        inc.append(arrivals.filter(col("vec_id") % 3 === 2))
        val stream = graft.sources.ChangeFeed.streamChanges(
          s, inc, keyCols = Seq("vec_id"), s"$root/spool")
        val q = stream.writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val ins = batch.filter(col("_change_type") === "insert")
              .select(col("vec_id"), col("embedding"))
            vtA.append(Similarity.assignToCentroids(ins, vtC.read()))
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
        require(vtA.versions.size == inc.versions.size + 1,
          s"expected one assignment append per incoming commit, got " +
            s"assign=${vtA.versions} incoming=${inc.versions}")
        val merged = base.select(col("vec_id"), col("embedding"))
          .unionByName(inc.read())
        Similarity.ivfSearchFromIndex(merged, vtC.read(), vtA.read(),
          nQueries = 10, k = 5, nProbe = 2)
      },
      oracle = Some(ivfSearchOracle("WHERE vec_id % 4 <> 0"))
    ),

    // index maintenance under DELETES (X300 composed with deletion
    // vectors): a DV delete on the incoming table surfaces as `delete`
    // diffs in the change feed, and the maintenance loop merge-deletes
    // those keys out of the persisted assignments — a removed vector can
    // never be probed again. Differentially gated in-build: the
    // maintained assignments must EQUAL a retrain-from-scratch assignment
    // of the survivors, and the oracle replays the probe over survivors.
    "sim_index_delete" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_sidel_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val emb = Tables.embeddings(s, dir)
        val base = emb.filter(col("vec_id") % 4 =!= 0)
        val (cent, assignBase) = Similarity.ivfIndex(base)
        val vtC = graft.sources.VersionedTable(s, s"$root/cent")
        val vtA = graft.sources.VersionedTable(s, s"$root/assign")
        vtC.overwrite(cent)
        vtA.overwrite(assignBase)
        val inc = graft.sources.VersionedTable(s, s"$root/incoming")
        val arrivals = emb.filter(col("vec_id") % 4 === 0)
          .select(col("vec_id"), col("embedding"))
        inc.overwrite(arrivals.filter(col("vec_id") % 8 === 0))
        inc.append(arrivals.filter(col("vec_id") % 8 === 4))
        // merge-on-read DELETE: ids ≡ 4 (mod 8) leave via a deletion
        // vector — no arrival dir is rewritten, the CDF still diffs it
        inc.delete(col("vec_id") % 8 === 4, useDeletionVectors = true)
        require(inc.manifestOf(inc.latestVersion.get).dvs.nonEmpty,
          "the delete must land as a deletion vector")
        val stream = graft.sources.ChangeFeed.streamChanges(
          s, inc, keyCols = Seq("vec_id"), s"$root/spool")
        val q = stream.writeStream
          .option("checkpointLocation", s"$root/ckpt")
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
            val types = batch.select("_change_type").distinct()
              .collect().map(_.getString(0)).toSet
            if (types.contains("insert"))
              vtA.append(Similarity.assignToCentroids(
                batch.filter(col("_change_type") === "insert")
                  .select(col("vec_id"), col("embedding")), vtC.read()))
            if (types.contains("delete"))
              vtA.mergeIntoRetrying(
                batch.filter(col("_change_type") === "delete")
                  .select(col("vec_id").as("del_id")),
                col("vec_id") === col("del_id"),
                matched = Seq(graft.sources.VersionedTable.MergeIntoDelete(None)))
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
        require(vtA.versions.size == inc.versions.size + 1,
          s"expected one index commit per incoming commit, got " +
            s"assign=${vtA.versions} incoming=${inc.versions}")
        val merged = base.select(col("vec_id"), col("embedding"))
          .unionByName(inc.read())
        // probe ≡ retrain-on-survivors: the maintained table must equal a
        // from-scratch assignment of exactly the surviving vectors
        val fresh = Similarity.assignToCentroids(merged, vtC.read())
        require(vtA.read().exceptAll(fresh).isEmpty &&
          fresh.exceptAll(vtA.read()).isEmpty,
          "maintained assignments diverge from retrain-on-survivors")
        Similarity.ivfSearchFromIndex(merged, vtC.read(), vtA.read(),
          nQueries = 10, k = 5, nProbe = 2)
      },
      oracle = Some(ivfSearchOracle("WHERE vec_id % 4 <> 0",
        searchCond = "NOT (vec_id % 8 = 4)"))
    ),

    "sim_ann_lsh" -> QueryDef(
      build = (s, dir) => Similarity.lshPairs(Tables.embeddings(s, dir),
        dim = 64, nPlanes = 16, bands = 4, minCos = 0.4),
      oracle = Some(lshOracleSql(nPlanes = 16, bands = 4, minCos = 0.4))
    ),

    // the eval harness every ANN deployment runs, IN-ENGINE and fully
    // oracled: recall@5 of the IVF probe path against exact brute-force
    // top-k, per query — a pure composition of the two already-oracled
    // chains, so the recall number itself is differentially gated, not
    // just the paths that produce it. Low recall on a probe budget is a
    // MEASUREMENT here, not a failure: nProbe=2 of 10 cells is the
    // documented cost/recall knob.
    "sim_recall_eval" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val emb = Tables.embeddings(s, dir)
        val exact = Similarity.topK(emb, nQueries = 10, k = 5)
          .select(col("query_id"), col("vec_id"))
        val approx = Similarity.ivfSearch(emb, nQueries = 10, k = 5,
          nProbe = 2).select(col("query_id"), col("vec_id"))
        val hits = exact.join(approx, Seq("query_id", "vec_id"))
          .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
        exact.select("query_id").distinct()
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            round(coalesce(col("n_hits"), lit(0L)).cast("double") / 5.0, 6)
              .as("recall"))
          .orderBy("query_id")
      },
      oracle = Some(
        s"""WITH $prepCte,
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
           |xs AS (
           |  SELECT query_id, vec_id, round(${cos("qv", "v")}, 6) AS cos
           |  FROM e JOIN q ON vec_id <> query_id),
           |xk AS (SELECT query_id, vec_id FROM (
           |         SELECT query_id, vec_id,
           |                row_number() OVER (PARTITION BY query_id
           |                  ORDER BY cos DESC, vec_id) AS rk
           |         FROM xs) WHERE rk <= 5),
           |ex2 AS (
           |  SELECT label, generate_subscripts(embedding, 1) AS idx,
           |         unnest(embedding) AS val
           |  FROM embeddings),
           |cm AS (
           |  SELECT label, idx,
           |         round(CAST(sum(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9))) AS DOUBLE)
           |               / count(*), 6) AS c
           |  FROM ex2 GROUP BY 1, 2),
           |cent AS (SELECT label, list(c ORDER BY idx) AS cv FROM cm GROUP BY label),
           |asg0 AS (
           |  SELECT vec_id, label, round(${cos("v", "cv")}, 6) AS acos
           |  FROM e CROSS JOIN cent),
           |assign AS (
           |  SELECT vec_id, label AS cell FROM (
           |    SELECT vec_id, label,
           |           row_number() OVER (PARTITION BY vec_id
           |             ORDER BY acos DESC, label) AS rn
           |    FROM asg0) WHERE rn = 1),
           |probes AS (
           |  SELECT query_id, qv, cell FROM (
           |    SELECT q.query_id, q.qv, cent.label AS cell,
           |           row_number() OVER (PARTITION BY q.query_id
           |             ORDER BY round(${cos("q.qv", "cent.cv")}, 6) DESC,
           |                      cent.label) AS rn
           |    FROM q CROSS JOIN cent) WHERE rn <= 2),
           |ascored AS (
           |  SELECT p.query_id, a.vec_id,
           |         round(${cos("p.qv", "e.v")}, 6) AS cos
           |  FROM probes p
           |  JOIN assign a ON p.cell = a.cell AND a.vec_id <> p.query_id
           |  JOIN e ON a.vec_id = e.vec_id),
           |ak AS (SELECT query_id, vec_id FROM (
           |         SELECT query_id, vec_id,
           |                row_number() OVER (PARTITION BY query_id
           |                  ORDER BY cos DESC, vec_id) AS rk
           |         FROM ascored) WHERE rk <= 5),
           |h AS (SELECT query_id, count(*) AS n
           |      FROM xk JOIN ak USING (query_id, vec_id) GROUP BY 1)
           |SELECT qq.query_id, CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
           |       round(CAST(coalesce(h.n, 0) AS DOUBLE) / 5.0, 6) AS recall
           |FROM (SELECT DISTINCT query_id FROM xk) qq
           |LEFT JOIN h USING (query_id)
           |ORDER BY qq.query_id""".stripMargin)
    ),

    // sparse (lexical) twin of the dense paths above: TF-IDF cosine pairs
    // through an inverted index — candidate space is Σ_token df², not n²,
    // and the df-cap prunes stop-like tokens before the quadratic join on
    // both engines. Weights are 6-dp decimals, so every grouped sum (dot,
    // norms) is exact and order-independent — see SparseSim's scaladoc.
    "sim_tfidf_pairs" -> QueryDef(
      build = (s, dir) => graft.operators.SparseSim.tfidfCosinePairs(
        Tables.documents(s, dir), minCos = 0.3, dfCap = 100),
      oracle = Some(
        s"""WITH tok AS (
           |  SELECT doc_id, unnest(${OracleSnippets.toksSql}) AS token
           |  FROM documents),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
           |dfr AS (SELECT token, count(*) AS df FROM tf
           |        GROUP BY 1 HAVING count(*) <= 100),
           |n AS (SELECT count(*) AS n FROM documents),
           |w AS (
           |  SELECT doc_id, token,
           |         CAST(round(tf * ln(CAST(n AS DOUBLE) / df), 6)
           |              AS DECIMAL(18,6)) AS w
           |  FROM tf JOIN dfr USING (token) CROSS JOIN n),
           |nrm AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY 1),
           |dots AS (
           |  SELECT x.doc_id AS a, y.doc_id AS b,
           |         sum(x.w * y.w) AS dot, count(*) AS shared
           |  FROM w x JOIN w y ON x.token = y.token AND x.doc_id < y.doc_id
           |  GROUP BY 1, 2),
           |scored AS (
           |  SELECT a, b, CAST(shared AS BIGINT) AS shared,
           |         round(CAST(dot AS DOUBLE)
           |               / nullif(sqrt(CAST(na.n2 AS DOUBLE))
           |                        * sqrt(CAST(nb.n2 AS DOUBLE)), 0.0), 6) AS cos
           |  FROM dots
           |  JOIN nrm na ON dots.a = na.doc_id
           |  JOIN nrm nb ON dots.b = nb.doc_id)
           |SELECT a, b, shared, cos FROM scored WHERE cos >= 0.3""".stripMargin),
      headline = true // the sparse-similarity scale path, benched per round
    ),

    // embedding-space twin of corpus_split_leakage: LSH near-dup pairs
    // whose members fall in different train/val/test splits — semantic
    // (not just lexical) leakage. Split assignment is the same
    // deterministic hash draw, map-side on both join sides.
    "sim_split_leakage" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions.col
        val split = Tables.embeddings(s, dir).select(col("vec_id"),
          graft.operators.Sampling.assignSplit(col("vec_id"),
            cuts = Seq(0.8 -> "train", 0.9 -> "val"), last = "test").as("split"))
        Similarity.lshPairs(Tables.embeddings(s, dir),
            dim = 64, nPlanes = 16, bands = 4, minCos = 0.4)
          .join(split.toDF("a", "split_a"), "a")
          .join(split.toDF("b", "split_b"), "b")
          .filter(col("split_a") =!= col("split_b"))
          .select("a", "b", "split_a", "split_b", "cos")
      },
      oracle = Some(
        s"""${lshScoredCtes(nPlanes = 16, bands = 4)},
           |${OracleSnippets.splitCtes("vec_id", "embeddings")}
           |SELECT a, b, sa.split AS split_a, sb.split AS split_b, cos
           |FROM scored
           |JOIN spl sa ON scored.a = sa.vec_id
           |JOIN spl sb ON scored.b = sb.vec_id
           |WHERE cos >= 0.4 AND sa.split <> sb.split""".stripMargin)
    ),

    // item-item collaborative filtering: suppliers related by shared
    // customers, cosine over co-occurrence counts
    // ([[graft.operators.Cooccurrence]]) — similarity from interaction
    // structure alone, no embeddings. The per-basket cap (50, binding for
    // heavy customers) bounds the quadratic pair blowup and is mirrored in
    // the replay; top-50 pairs by (rounded cosine, i, j) is a total order,
    // so the cut is engine-stable.
    "sim_cooccur" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val baskets = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_suppkey"))
        graft.operators.Cooccurrence
          .itemCosine(baskets, "o_custkey", "l_suppkey", maxBasketSize = 50)
          .select(col("i"), col("j"), col("c"),
            round(col("cosine"), 6).as("cosine"))
          .orderBy(desc("cosine"), col("i"), col("j"))
          .limit(50)
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT DISTINCT o_custkey AS basket, l_suppkey AS item
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |capped AS (
          |  SELECT basket, item FROM (
          |    SELECT basket, item,
          |           row_number() OVER (PARTITION BY basket ORDER BY item) AS rn
          |    FROM b) t
          |  WHERE rn <= 50),
          |deg AS (SELECT item, count(*) AS deg FROM capped GROUP BY 1),
          |pairs AS (
          |  SELECT a.item AS i, c2.item AS j, count(*) AS c
          |  FROM capped a JOIN capped c2 USING (basket)
          |  WHERE a.item < c2.item GROUP BY 1, 2)
          |SELECT i, j, c,
          |       round(CAST(c AS DOUBLE)
          |             / sqrt(CAST(di.deg * dj.deg AS DOUBLE)), 6) AS cosine
          |FROM pairs
          |JOIN deg di ON i = di.item
          |JOIN deg dj ON j = dj.item
          |ORDER BY cosine DESC, i, j
          |LIMIT 50""".stripMargin)
    ),

    // association rules over the same capped baskets — market-basket
    // support/confidence/lift in both directions per co-occurring pair,
    // exact integer counts; the basket count rides a broadcast single-row
    // frame. Same hot-basket cap and LOW-bias contract as sim_cooccur.
    "sim_assoc_rules" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val baskets = Tables.orders(s, dir)
          .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey"), col("l_suppkey"))
        val r = graft.operators.Cooccurrence
          .rules(baskets, "o_custkey", "l_suppkey",
            maxBasketSize = 50, minPairCount = 3)
        r.select(col("antecedent"), col("consequent"), col("c"),
          round(col("support"), 6).as("support"),
          round(col("confidence"), 6).as("confidence"),
          round(col("lift"), 6).as("lift"))
      },
      oracle = Some(
        """WITH b AS (
          |  SELECT DISTINCT o_custkey AS basket, l_suppkey AS item
          |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |capped AS (
          |  SELECT basket, item FROM (
          |    SELECT basket, item,
          |           row_number() OVER (PARTITION BY basket ORDER BY item) AS rn
          |    FROM b) t
          |  WHERE rn <= 50),
          |deg AS (SELECT item, count(*) AS deg FROM capped GROUP BY 1),
          |nb AS (SELECT count(DISTINCT basket) AS nb FROM capped),
          |pairs AS (
          |  SELECT a.item AS i, c2.item AS j, count(*) AS c
          |  FROM capped a JOIN capped c2 USING (basket)
          |  WHERE a.item < c2.item GROUP BY 1, 2
          |  HAVING count(*) >= 3),
          |r AS (
          |  SELECT p.i AS antecedent, p.j AS consequent, p.c,
          |         di.deg AS d_ante, dj.deg AS d_cons
          |  FROM pairs p JOIN deg di ON p.i = di.item
          |               JOIN deg dj ON p.j = dj.item
          |  UNION ALL
          |  SELECT p.j, p.i, p.c, dj.deg, di.deg
          |  FROM pairs p JOIN deg di ON p.i = di.item
          |               JOIN deg dj ON p.j = dj.item)
          |SELECT antecedent, consequent, c,
          |       round(CAST(c AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS support,
          |       round(CAST(c AS DOUBLE) / CAST(d_ante AS DOUBLE), 6)
          |         AS confidence,
          |       round((CAST(c AS DOUBLE) * CAST(nb AS DOUBLE))
          |             / (CAST(d_ante AS DOUBLE) * CAST(d_cons AS DOUBLE)), 6)
          |         AS lift
          |FROM r, nb""".stripMargin)
    )
  )

  /** DuckDB replay of [[Similarity.lshPairs]] for any plane/band layout:
    * identical md5-derived hyperplane literals, identical band
    * shift-and-mask (both engines arithmetic-shift BIGINT), exact re-score
    * of candidates only. `nPlanes` must stay < 63 — DuckDB raises on
    * `1 << 63` where the JVM wraps.
    */
  private[queries] def lshScoredCtes(nPlanes: Int, bands: Int,
                                     src: String = "embeddings"): String = {
    require(nPlanes % bands == 0 && nPlanes < 63)
    val width = nPlanes / bands
    val mask = (1L << width) - 1
    val sigTerms = VectorFunctions.hyperplanes(nPlanes, 64).zipWithIndex
      .map { case (coefs, p) =>
        val lst = coefs.map(c => if (c > 0) "1.0" else "-1.0")
          .mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(v, $lst) > 0 THEN (CAST(1 AS BIGINT) << $p) ELSE CAST(0 AS BIGINT) END)"
      }.mkString("\n       + ")
    val vals = (0 until bands).map(c => s"($c)").mkString(", ")
    val srcCte = prepCte.replace("FROM embeddings", s"FROM $src")
    s"""WITH $srcCte,
       |sig AS (SELECT vec_id, v, $sigTerms AS sig FROM e),
       |b AS (
       |  SELECT vec_id, v, c, (sig >> (c * $width)) & $mask AS h
       |  FROM sig CROSS JOIN (VALUES $vals) AS ch(c)
       |),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
       |  FROM b x JOIN b y ON x.c = y.c AND x.h = y.h AND x.vec_id < y.vec_id
       |),
       |scored AS (
       |  SELECT a, b, round(${cos("ea.v", "eb.v")}, 6) AS cos
       |  FROM cand JOIN e ea ON cand.a = ea.vec_id
       |            JOIN e eb ON cand.b = eb.vec_id
       |)""".stripMargin
  }

  private def lshOracleSql(nPlanes: Int, bands: Int, minCos: Double): String =
    s"""${lshScoredCtes(nPlanes, bands)}
       |SELECT a, b, cos FROM scored WHERE cos >= $minCos""".stripMargin
}
