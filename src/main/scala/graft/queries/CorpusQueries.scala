package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.CorpusPipeline
import graft.queries.OracleSnippets._

/** End-to-end corpus-curation query: the composed language → quality →
  * near-dup pipeline, oracled as one SQL chain over the same stages.
  */
object CorpusQueries {

  val defs: Map[String, QueryDef] = Map(

    // corpus-level boilerplate scoring: shingles held by > 30% of all docs
    // are boilerplate (cross-document repetition — headers/footers/license
    // blurbs — that within-doc signals can't see); each doc scores the
    // boilerplate fraction of its distinct shingles. The oracle replays
    // the document-frequency threshold and per-doc ratio in SQL.
    "corpus_boilerplate" -> QueryDef(
      build = (s, dir) => CorpusPipeline.boilerplate(
        Tables.documents(s, dir), n = 3, maxDocFrac = 0.3),
      oracle = Some(
        s"""WITH ${shingleCtes("documents")},
           |ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
           |tot AS (SELECT count(*) AS n_docs FROM documents),
           |hot AS (
           |  SELECT sg FROM ex CROSS JOIN tot
           |  GROUP BY sg, n_docs HAVING count(*) > n_docs * 0.3
           |),
           |pd AS (
           |  SELECT doc_id, count(*) AS n_boiler FROM ex
           |  WHERE sg IN (SELECT sg FROM hot) GROUP BY doc_id
           |)
           |SELECT sh.doc_id, CAST(len(sh.s) AS BIGINT) AS n_shingles,
           |       coalesce(pd.n_boiler, 0) AS n_boiler,
           |       round(coalesce(pd.n_boiler, 0) / CAST(len(sh.s) AS BIGINT), 6)
           |         AS boiler_ratio
           |FROM sh LEFT JOIN pd USING (doc_id)""".stripMargin)
    ),

    // canonical-representative selection: every doc mapped to the BEST
    // copy (highest quality, id-ascending ties) in its near-dup cluster —
    // the old→canonical mapping a dedup run publishes so downstream
    // references can be rewritten. Oracle replays components (recursive
    // CTE), the quality formula, and the same window rank.
    // within-source percentile-rank normalization of document length —
    // "is this doc long FOR ITS SOURCE?", the cross-crawl score
    // calibrator. Planned value-cardinality-sized: (source, value,
    // count) agg, min-rank prefix window over distinct values only,
    // equi-join back — the data is never sorted, where the textbook
    // percent_rank window sorts every row of every group.
    "corpus_rank_norm" -> QueryDef(
      build = (s, dir) => graft.QueryDef.round6(
        graft.operators.QuantileNorm.percentileRank(
          Tables.documents(s, dir), "source", "n_chars")
          .select("doc_id", "source", "n_chars", "pr")),
      oracle = Some(
        """SELECT doc_id, source, n_chars,
          |       round(CASE WHEN count(*) OVER (PARTITION BY source) > 1
          |             THEN percent_rank() OVER (PARTITION BY source
          |                                       ORDER BY n_chars)
          |             ELSE 0.0 END, 6) AS pr
          |FROM documents
          |WHERE n_chars IS NOT NULL AND source IS NOT NULL""".stripMargin)
    ),

    "corpus_canonical" -> QueryDef(
      build = (s, dir) => CorpusPipeline.canonicalize(
        Tables.documents(s, dir), minJaccard = 0.5),
      oracle = Some(
        s"""WITH RECURSIVE ${shingleCtes("documents")},
           |${jaccardPairCtes(0.5, graft.operators.Dedup.defaultShingleCap)},
           |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
           |walk(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT w.id, u.b FROM walk w JOIN und u ON u.a = w.r
           |),
           |clusters AS (SELECT id AS doc_id, min(r) AS cluster_id FROM walk GROUP BY id),
           |$qualityCtes,
           |ranked AS (
           |  SELECT c.doc_id, c.cluster_id, round(q.quality, 6) AS q6,
           |         row_number() OVER (PARTITION BY c.cluster_id
           |           ORDER BY round(q.quality, 6) DESC, c.doc_id) AS rn
           |  FROM clusters c JOIN quality q ON c.doc_id = q.doc_id)
           |SELECT c.doc_id, c.cluster_id, r.doc_id AS canonical_id
           |FROM ranked c JOIN ranked r
           |  ON c.cluster_id = r.cluster_id AND r.rn = 1""".stripMargin)
    ),

    // deterministic per-source reservoir: cap each source at k docs,
    // chosen uniformly by md5-rank — the same winners across runs,
    // engines, and partitionings (the per-source cap every mixing
    // pipeline applies before a dominant crawl swamps the batch)
    "corpus_reservoir" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        graft.operators.Sampling.reservoirPerGroup(
          Tables.documents(s, dir), groupCol = "source", idCol = "doc_id", k = 5)
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"),
            sum(col("n_chars")).as("sum_chars"))
      },
      oracle = Some(
        """SELECT source, count(*) AS n_docs,
          |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
          |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM (SELECT source, doc_id, n_chars,
          |             row_number() OVER (PARTITION BY source
          |               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
          |      FROM documents) t
          |WHERE rn <= 5
          |GROUP BY source""".stripMargin)
    ),

    // deterministic stratified down-sampling to a target language mix:
    // hash-of-id coin (reproducible, shuffle-free, oracle-able — Spark's
    // sample() is seed+partition dependent and is not)
    "corpus_mix" -> QueryDef(
      build = (s, dir) => graft.operators.Sampling.stratifiedSample(
          Tables.documents(s, dir), strataCol = "lang", idCol = "doc_id",
          rates = Map("en" -> 0.5, "zh" -> 0.75))
        .groupBy("lang").agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("doc_id")).as("sum_ids")),
      oracle = Some(
        """SELECT lang, count(*) AS n_docs,
          |       CAST(sum(doc_id) AS BIGINT) AS sum_ids
          |FROM documents
          |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          |      / 4294967296.0
          |      < CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.75 ELSE 1.0 END
          |GROUP BY lang""".stripMargin)
    ),

    // weighted sample without replacement (Efraimidis–Spirakis): 50 docs
    // ∝ n_chars via the deterministic u^(1/w) key — long docs oversample,
    // the exact winner set replays on any engine. Distributed top-k plan.
    "corpus_weighted_sample" -> QueryDef(
      build = (s, dir) => graft.operators.Sampling.weightedSample(
          Tables.documents(s, dir), idCol = "doc_id", weightCol = "n_chars",
          k = 50)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("source"),
          org.apache.spark.sql.functions.col("n_chars")),
      oracle = Some(
        """SELECT doc_id, source, n_chars
          |FROM (
          |  SELECT doc_id, source, n_chars,
          |         round(pow(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          |                   / 4294967296.0,
          |                   1.0 / greatest(CAST(n_chars AS DOUBLE), 1e-9)), 6) AS k
          |  FROM documents)
          |ORDER BY k DESC, doc_id
          |LIMIT 50""".stripMargin)
    ),

    // weight-balanced shard packing: docs → 8 output shards of ~equal
    // char mass by sequential prefix packing over the deterministic
    // (md5, id) order. Spark executes it as a DISTRIBUTED prefix sum
    // (bucket → per-bucket sums → driver prefix → within-bucket window);
    // the oracle replays the same semantics as ONE window cumsum — the
    // gate pins that the scalable plan equals the sequential definition.
    "corpus_shards" -> QueryDef(
      build = (s, dir) => graft.operators.Sampling.packShards(
          Tables.documents(s, dir), idCol = "doc_id", weightCol = "n_chars",
          nShards = 8)
        .groupBy("shard_id").agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("n_chars")).as("sum_chars")),
      oracle = Some(
        """WITH c AS (
          |  SELECT doc_id, n_chars,
          |         sum(n_chars) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
          |                            ROWS UNBOUNDED PRECEDING) AS cum
          |  FROM documents),
          |tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM documents)
          |SELECT least(7, CAST(floor((cum - n_chars) / ((total + 7) // 8)) AS BIGINT)) AS shard_id,
          |       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
          |FROM c CROSS JOIN tot
          |GROUP BY 1""".stripMargin)
    ),

    // α-temperature source rebalancing (keep mass ∝ n_s^0.5): the biggest
    // source downsamples hardest, the smallest keeps everything — the
    // standard multilingual-LM mixing rule, in the deterministic hash-coin
    // form. Oracle replays count → rate → coin in SQL.
    "corpus_temperature" -> QueryDef(
      build = (s, dir) => graft.operators.Sampling.temperatureSample(
          Tables.documents(s, dir), groupCol = "source", idCol = "doc_id",
          alpha = 0.5)
        .groupBy("source").agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_docs"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("doc_id")).as("sum_ids")),
      oracle = Some(
        """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
          |r AS (SELECT source,
          |             round(pow(CAST(n AS DOUBLE) / (SELECT min(n) FROM c),
          |                       0.5 - 1.0), 6) AS rate
          |      FROM c)
          |SELECT d.source, count(*) AS n_docs, CAST(sum(d.doc_id) AS BIGINT) AS sum_ids
          |FROM documents d JOIN r ON d.source = r.source
          |WHERE ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          |      / 4294967296.0 < r.rate
          |GROUP BY d.source""".stripMargin)
    ),

    // deterministic 80/10/10 train/val/test split from the per-doc hash
    // draw — split membership is a pure function of doc_id (stable under
    // reprocessing and corpus growth); per-split counts, id-sum, and
    // token mass are oracled exactly

    // benchmark decontamination: docs with doc_id % 37 == 0 play the eval
    // set, the rest the training corpus; a corpus doc is flagged when it
    // shares >= 2 distinct 3-gram shingles with some eval doc. Inverted-
    // index equi-join with the (tiny) eval side broadcast — the corpus is
    // never shuffled and there is no cross product. Oracle replays the
    // same shingling + overlap count in SQL.
    "corpus_decontaminate" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val c = org.apache.spark.sql.functions.col("doc_id")
        graft.operators.Decontamination.contaminatedPairs(
          docs.filter(c % 37 =!= 0), docs.filter(c % 37 === 0),
          n = 3, minOverlap = 2)
      },
      oracle = Some(
        s"""WITH ${shingleCtes("documents")},
           |cx AS (SELECT doc_id, unnest(s) AS sg FROM sh WHERE doc_id % 37 <> 0),
           |ex AS (SELECT doc_id AS eval_id, unnest(s) AS sg FROM sh
           |       WHERE doc_id % 37 = 0),
           |p AS (SELECT cx.doc_id, ex.eval_id, count(*) AS overlap
           |      FROM cx JOIN ex ON cx.sg = ex.sg GROUP BY 1, 2)
           |SELECT doc_id, eval_id, CAST(overlap AS BIGINT) AS overlap
           |FROM p WHERE overlap >= 2""".stripMargin)
    ),

    // the SAME contamination question through the big-eval path: a Bloom
    // prefilter over the eval shingle hashes drops non-candidate corpus
    // shingles map-side BEFORE the shuffle, the equi-join verifies the
    // survivors exactly — false positives waste a shuffle row, never
    // change the answer, so the ORACLE IS THE EXACT REPLAY, identical to
    // corpus_decontaminate's. Green here means the sketch path is
    // result-indistinguishable from the exact path at any fpp.
    "corpus_decon_bloom" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val c = org.apache.spark.sql.functions.col("doc_id")
        graft.operators.Decontamination.contaminatedPairsBloom(
          docs.filter(c % 37 =!= 0), docs.filter(c % 37 === 0),
          n = 3, minOverlap = 2, fpp = 0.01)
      },
      oracle = Some(
        s"""WITH ${shingleCtes("documents")},
           |cx AS (SELECT doc_id, unnest(s) AS sg FROM sh WHERE doc_id % 37 <> 0),
           |ex AS (SELECT doc_id AS eval_id, unnest(s) AS sg FROM sh
           |       WHERE doc_id % 37 = 0),
           |p AS (SELECT cx.doc_id, ex.eval_id, count(*) AS overlap
           |      FROM cx JOIN ex ON cx.sg = ex.sg GROUP BY 1, 2)
           |SELECT doc_id, eval_id, CAST(overlap AS BIGINT) AS overlap
           |FROM p WHERE overlap >= 2""".stripMargin)
    ),


    // train/test leakage audit: near-dup pairs (the oracled 3-gram Jaccard
    // path) that STRADDLE the deterministic train/val/test split — each
    // such pair is an eval doc whose near-copy leaks into training. Pure
    // composition of two oracled operators, so the whole audit replays in
    // SQL; at scale the split column is a free map-side derivation on both
    // join sides of the existing near-dup machinery.
    "corpus_split_leakage" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions.col
        val docs = Tables.documents(s, dir)
        val split = docs.select(col("doc_id"),
          graft.operators.Sampling.assignSplit(col("doc_id"),
            cuts = Seq(0.8 -> "train", 0.9 -> "val"), last = "test").as("split"))
        graft.operators.Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
          .join(split.toDF("a", "split_a"), "a")
          .join(split.toDF("b", "split_b"), "b")
          .filter(col("split_a") =!= col("split_b"))
          .select("a", "b", "split_a", "split_b", "jaccard")
      },
      oracle = Some(
        s"""WITH ${shingleCtes("documents")},
           |${jaccardPairCtes(0.5, graft.operators.Dedup.defaultShingleCap)},
           |${splitCtes("doc_id", "documents")}
           |SELECT a, b, sa.split AS split_a, sb.split AS split_b,
           |       round(jaccard, 6) AS jaccard
           |FROM pairs
           |JOIN spl sa ON pairs.a = sa.doc_id
           |JOIN spl sb ON pairs.b = sb.doc_id
           |WHERE sa.split <> sb.split""".stripMargin)
    ),

    "corpus_split" -> QueryDef(
      build = (s, dir) => {
        import graft.functions.TextFunctions
        Tables.documents(s, dir)
          .withColumn("split", graft.operators.Sampling.assignSplit(
            org.apache.spark.sql.functions.col("doc_id"),
            cuts = Seq(0.8 -> "train", 0.9 -> "val"), last = "test"))
          .groupBy("split").agg(
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n_docs"),
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.col("doc_id")).as("sum_ids"),
            org.apache.spark.sql.functions.sum(
              TextFunctions.tokenCount(TextFunctions.tokens(
                org.apache.spark.sql.functions.col("text")))
                .cast("long")).as("n_tokens"))
      },
      oracle = Some(
        """WITH s AS (
          |  SELECT doc_id,
          |         len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS toks,
          |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          |           / 4294967296.0 AS draw
          |  FROM documents)
          |SELECT CASE WHEN draw < 0.8 THEN 'train'
          |            WHEN draw < 0.9 THEN 'val' ELSE 'test' END AS split,
          |       count(*) AS n_docs,
          |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
          |       CAST(sum(toks) AS BIGINT) AS n_tokens
          |FROM s GROUP BY 1""".stripMargin)
    ),

    // deterministic k-fold cross-validation assignment — the CV sibling of
    // corpus_split: fold = md5-prefix mod 5, integer modulo so no float
    // boundary exists at all; per-fold doc counts, id-sums, and token mass
    // hash the full assignment. Map-side, one hash agg.
    "corpus_kfold" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        import graft.functions.TextFunctions
        Tables.documents(s, dir)
          .withColumn("fold",
            graft.operators.Sampling.assignFold(col("doc_id"), k = 5))
          .groupBy("fold").agg(
            count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("sum_ids"),
            sum(TextFunctions.tokenCount(TextFunctions.tokens(col("text")))
              .cast("long")).as("n_tokens"))
      },
      oracle = Some(
        """WITH s AS (
          |  SELECT doc_id,
          |         len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS toks,
          |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          |           % 5 AS fold
          |  FROM documents)
          |SELECT fold, count(*) AS n_docs,
          |       CAST(sum(doc_id) AS BIGINT) AS sum_ids,
          |       CAST(sum(toks) AS BIGINT) AS n_tokens
          |FROM s GROUP BY 1""".stripMargin)
    ),

    // THE full training-data pipeline as one oracled composition: language
    // gate + quality gate → near-dup removal (exact-Jaccard path) → eval
    // decontamination (shared-shingle overlap) → α-temperature source
    // rebalance → weight-balanced shard packing. Every stage is an
    // already-oracled operator; the gate pins that the COMPOSITION — the
    // thing a user actually runs — replays end-to-end in SQL. Per-shard
    // doc counts, char mass, and id-sums hash the whole lineage.
    "corpus_pipeline" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.documents(s, dir)
        val cleaned = CorpusPipeline.clean(docs, keepLangs = Seq("en"),
          minQuality = 0.28, minJaccard = 0.5)
        val corpus = cleaned.select("doc_id")
          .join(docs.select(col("doc_id"), col("source"), col("n_chars")), Seq("doc_id"))
          .filter(col("doc_id") % 37 =!= 0)
        val contaminated = graft.operators.Decontamination.contaminatedPairs(
            docs.filter(col("doc_id") % 37 =!= 0),
            docs.filter(col("doc_id") % 37 === 0), n = 3, minOverlap = 2)
          .select("doc_id").distinct()
        val decon = corpus.join(contaminated, Seq("doc_id"), "left_anti")
        val mixed = graft.operators.Sampling.temperatureSample(
          decon, groupCol = "source", idCol = "doc_id", alpha = 0.5)
        graft.operators.Sampling.packShards(
            mixed, idCol = "doc_id", weightCol = "n_chars", nShards = 4)
          .groupBy("shard_id").agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            sum(col("doc_id")).as("sum_ids"))
      },
      oracle = Some(
        s"""WITH $langIdCtes,
           |$qualityCtes,
           |kept AS (
           |  SELECT d.doc_id
           |  FROM documents d
           |  JOIN langid l USING (doc_id)
           |  JOIN quality q USING (doc_id)
           |  WHERE l.predicted IN ('en') AND round(q.quality, 6) >= 0.28
           |),
           |${shingleCtes("documents")},
           |shk AS (SELECT * FROM sh WHERE doc_id IN (SELECT doc_id FROM kept)),
           |${jaccardPairCtes(0.5, graft.operators.Dedup.defaultShingleCap, src = "shk")},
           |cleaned AS (
           |  SELECT doc_id FROM kept
           |  WHERE doc_id NOT IN (SELECT DISTINCT b FROM pairs)
           |),
           |cx AS (SELECT doc_id, unnest(s) AS sg FROM sh WHERE doc_id % 37 <> 0),
           |exv AS (SELECT doc_id AS eval_id, unnest(s) AS sg FROM sh
           |        WHERE doc_id % 37 = 0),
           |cont AS (
           |  SELECT DISTINCT doc_id FROM (
           |    SELECT cx.doc_id, exv.eval_id, count(*) AS ov
           |    FROM cx JOIN exv ON cx.sg = exv.sg GROUP BY 1, 2)
           |  WHERE ov >= 2
           |),
           |corpus AS (
           |  SELECT d.doc_id, d.source, d.n_chars
           |  FROM documents d JOIN cleaned USING (doc_id)
           |  WHERE d.doc_id % 37 <> 0
           |    AND d.doc_id NOT IN (SELECT doc_id FROM cont)
           |),
           |tc AS (SELECT source, count(*) AS n FROM corpus GROUP BY source),
           |tr AS (SELECT source,
           |              round(pow(CAST(n AS DOUBLE) / (SELECT min(n) FROM tc),
           |                        0.5 - 1.0), 6) AS rate
           |       FROM tc),
           |mixed AS (
           |  SELECT c.doc_id, c.n_chars FROM corpus c JOIN tr USING (source)
           |  WHERE ('0x' || substring(md5(CAST(c.doc_id AS VARCHAR)), 1, 8))::BIGINT
           |        / 4294967296.0 < tr.rate
           |),
           |cum AS (
           |  SELECT doc_id, n_chars,
           |         sum(n_chars) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           |                            ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM mixed),
           |tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM mixed)
           |SELECT least(3, CAST(floor((cum - n_chars) / ((total + 3) // 4)) AS BIGINT)) AS shard_id,
           |       count(*) AS n_docs,
           |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           |       CAST(sum(doc_id) AS BIGINT) AS sum_ids
           |FROM cum CROSS JOIN tot
           |GROUP BY 1""".stripMargin),
      headline = true
    ),

    "corpus_clean" -> QueryDef(
      build = (s, dir) => CorpusPipeline.clean(Tables.documents(s, dir),
        keepLangs = Seq("en"), minQuality = 0.28, minJaccard = 0.5),
      oracle = Some(
        s"""WITH $langIdCtes,
           |$qualityCtes,
           |kept AS (
           |  SELECT d.doc_id, d.text, l.predicted, round(q.quality, 6) AS quality
           |  FROM documents d
           |  JOIN langid l USING (doc_id)
           |  JOIN quality q USING (doc_id)
           |  WHERE l.predicted IN ('en') AND round(q.quality, 6) >= 0.28
           |),
           |${shingleCtes("kept")},
           |${jaccardPairCtes(0.5, graft.operators.Dedup.defaultShingleCap)},
           |drops AS (SELECT DISTINCT b AS doc_id FROM pairs)
           |SELECT doc_id, predicted, quality
           |FROM kept
           |WHERE doc_id NOT IN (SELECT doc_id FROM drops)""".stripMargin),
      headline = true
    ),

    // the Gopher repetition rules APPLIED as a filter — per-source pass
    // rates under the published thresholds (top-2/3/4-gram mass < .20/
    // .18/.16, dup-5-gram coverage < .15). Per-doc metrics are the two
    // oracled Repetition frames; the per-source means sum exact
    // DECIMAL(18,6) over the 6-dp-rounded per-doc values (the
    // pricing-summary convention) so both engines average identical
    // numbers in identical arithmetic. Docs too short to own a gram pass
    // by zero-fill on both sides.
    "corpus_gopher_filter" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.documents(s, dir)
        // ONE tokenize pass feeds both Gopher families (top-gram and
        // dup-coverage used to each scan + split the corpus separately)
        val base = graft.operators.Repetition.gopherBase(docs, "text", "doc_id")
        val top = graft.operators.Repetition
          .topFromBase(base, Seq(2, 3, 4))
          .groupBy("doc_id")
          .agg(
            max(when(col("n") === 2, col("top_frac"))).as("top2"),
            max(when(col("n") === 3, col("top_frac"))).as("top3"),
            max(when(col("n") === 4, col("top_frac"))).as("top4"))
        val dup = graft.operators.Repetition
          .dupFromBase(base, n = 5)
          .select(col("doc_id"), col("dup_frac"))
        val per = docs.select(col("doc_id"), col("source"))
          .join(top, Seq("doc_id"), "left")
          .join(dup, Seq("doc_id"), "left")
          .select(col("source"),
            coalesce(col("top2"), lit(0.0)).as("top2"),
            coalesce(col("top3"), lit(0.0)).as("top3"),
            coalesce(col("top4"), lit(0.0)).as("top4"),
            coalesce(col("dup_frac"), lit(0.0)).as("dup5"))
        val pass = col("top2") < 0.20 && col("top3") < 0.18 &&
          col("top4") < 0.16 && col("dup5") < 0.15
        def decAvg(c: String) = round(
          sum(col(c).cast("decimal(18,6)")).cast("double") /
            count(lit(1)).cast("double"), 6)
        per.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(pass, 1L).otherwise(0L)).as("n_pass"),
          decAvg("top2").as("avg_top2"),
          decAvg("top4").as("avg_top4"),
          decAvg("dup5").as("avg_dup5"))
          .withColumn("pass_frac",
            round(col("n_pass").cast("double") /
              col("n_docs").cast("double"), 6))
          .select("source", "n_docs", "n_pass", "pass_frac",
            "avg_top2", "avg_top4", "avg_dup5")
          .orderBy("source")
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
           |base AS (
           |  SELECT doc_id, tk,
           |         CAST(list_sum(list_transform(tk,
           |           x -> CAST(len(x) AS BIGINT))) AS BIGINT) AS tchars
           |  FROM t),
           |gt AS (SELECT doc_id, tchars, n,
           |              unnest(range(1, greatest(len(tk) - n + 1, 0) + 1))
           |                AS pos, tk
           |       FROM base CROSS JOIN (VALUES (2), (3), (4)) AS ns(n)),
           |ext AS (SELECT doc_id, tchars, n,
           |               array_to_string(tk[pos:pos+n-1], ' ') AS g
           |        FROM gt),
           |ct AS (SELECT doc_id, tchars, n, g, count(*) AS c
           |       FROM ext GROUP BY 1, 2, 3, 4),
           |topt AS (SELECT doc_id, tchars, n, g, c,
           |                row_number() OVER (PARTITION BY doc_id, n
           |                                   ORDER BY c DESC, g) AS rk
           |         FROM ct),
           |tf AS (SELECT doc_id,
           |              max(CASE WHEN n = 2 THEN round(CAST(c AS DOUBLE)
           |                * CAST(len(g) - (n - 1) AS DOUBLE)
           |                / CAST(tchars AS DOUBLE), 6) END) AS top2,
           |              max(CASE WHEN n = 3 THEN round(CAST(c AS DOUBLE)
           |                * CAST(len(g) - (n - 1) AS DOUBLE)
           |                / CAST(tchars AS DOUBLE), 6) END) AS top3,
           |              max(CASE WHEN n = 4 THEN round(CAST(c AS DOUBLE)
           |                * CAST(len(g) - (n - 1) AS DOUBLE)
           |                / CAST(tchars AS DOUBLE), 6) END) AS top4
           |       FROM topt WHERE rk = 1 GROUP BY doc_id),
           |g5 AS (SELECT doc_id,
           |              unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS pos,
           |              tk
           |       FROM base),
           |sh5 AS (SELECT doc_id, pos,
           |               md5(array_to_string(tk[pos:pos+4], ' ')) AS h
           |        FROM g5),
           |rep5 AS (SELECT doc_id, h FROM sh5
           |         GROUP BY doc_id, h HAVING count(*) >= 2),
           |f5 AS (SELECT sh5.doc_id, sh5.pos
           |       FROM sh5 JOIN rep5
           |         ON sh5.doc_id = rep5.doc_id AND sh5.h = rep5.h),
           |cov0 AS (SELECT doc_id, tp
           |         FROM (SELECT doc_id, unnest(range(pos, pos + 5)) AS tp
           |               FROM f5)
           |         GROUP BY doc_id, tp),
           |lens AS (SELECT doc_id, unnest(range(1, len(tk) + 1)) AS tp, tk
           |         FROM base),
           |cov AS (SELECT c.doc_id,
           |               CAST(sum(len(l.tk[l.tp])) AS BIGINT) AS covered
           |        FROM cov0 c
           |        JOIN lens l ON c.doc_id = l.doc_id AND c.tp = l.tp
           |        GROUP BY 1),
           |dupf AS (SELECT b.doc_id,
           |                round(CAST(coalesce(cov.covered, 0) AS DOUBLE)
           |                  / nullif(CAST(b.tchars AS DOUBLE), 0.0), 6)
           |                  AS dup5
           |         FROM base b LEFT JOIN cov ON b.doc_id = cov.doc_id),
           |per AS (SELECT d.source,
           |               coalesce(tf.top2, 0.0) AS top2,
           |               coalesce(tf.top3, 0.0) AS top3,
           |               coalesce(tf.top4, 0.0) AS top4,
           |               coalesce(dupf.dup5, 0.0) AS dup5
           |        FROM documents d
           |        LEFT JOIN tf ON d.doc_id = tf.doc_id
           |        LEFT JOIN dupf ON d.doc_id = dupf.doc_id)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(CASE WHEN top2 < 0.20 AND top3 < 0.18
           |                      AND top4 < 0.16 AND dup5 < 0.15
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           |       round(CAST(sum(CASE WHEN top2 < 0.20 AND top3 < 0.18
           |                           AND top4 < 0.16 AND dup5 < 0.15
           |                          THEN 1 ELSE 0 END) AS DOUBLE)
           |             / CAST(count(*) AS DOUBLE), 6) AS pass_frac,
           |       round(CAST(sum(CAST(top2 AS DECIMAL(18,6))) AS DOUBLE)
           |             / CAST(count(*) AS DOUBLE), 6) AS avg_top2,
           |       round(CAST(sum(CAST(top4 AS DECIMAL(18,6))) AS DOUBLE)
           |             / CAST(count(*) AS DOUBLE), 6) AS avg_top4,
           |       round(CAST(sum(CAST(dup5 AS DECIMAL(18,6))) AS DOUBLE)
           |             / CAST(count(*) AS DOUBLE), 6) AS avg_dup5
           |FROM per GROUP BY source
           |ORDER BY source""".stripMargin),
      headline = true
    ),

    // deterministic EPOCH SHUFFLE: the reproducible global training order
    // — never a single-partition global window; 4096 prefix-ordered md5
    // buckets + driver-prefixed offsets give the identical permutation
    // the oracle's one row_number() spells
    "corpus_epoch_order" -> QueryDef(
      build = (s, dir) => graft.operators.Sampling.epochOrder(
        Tables.documents(s, dir).select("doc_id"), "doc_id", seed = "epoch0")
        .select("doc_id", "epoch_pos").orderBy("epoch_pos"),
      oracle = Some(
        """SELECT doc_id,
          |       CAST(row_number() OVER (
          |         ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)),
          |                  doc_id) - 1 AS BIGINT) AS epoch_pos
          |FROM documents ORDER BY epoch_pos""".stripMargin)
    ),

    // GPT-style concat-and-chunk packing layout: the corpus's tokens
    // concatenated in the seeded epoch order and cut into fixed 512-token
    // training blocks, doc boundaries ignored — per-doc (start_block,
    // offset, span) is everything a block-writer seeks by. Never a global
    // window: 4096 prefix-ordered md5 buckets + driver-prefixed token
    // masses (the epochOrder discipline, sum-flavored); all block
    // arithmetic integer div/mod, so the oracle's one-window spelling
    // replays it bit-for-bit.
    // STREAMING PII audit — the continuous-crawl form of text_pii_stats:
    // documents staged as 4 file micro-batches, the same validated-PII
    // aggregate maintained incrementally in complete mode; the final
    // state must hash-match the BATCH oracle exactly, pinning "the audit
    // is incrementally maintainable" (run it forever on a landing
    // directory, read current totals at any time). All map-side work +
    // one streaming hash aggregate — state is one row per source.
    "corpus_stream_audit" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_csa_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val docs = Tables.documents(s, dir)
        // stage 4 disjoint phases, mtime-pinned so the file source
        // admits them oldest-first (the ev_stream_* discipline)
        var seen = Set.empty[String]
        val base = System.currentTimeMillis()
        (0 until 4).foreach { i =>
          docs.filter(pmod(col("doc_id"), lit(4)) === i)
            .coalesce(1).write.mode("append").parquet(s"$root/src")
          val parts = fs.listStatus(
              new org.apache.hadoop.fs.Path(s"$root/src"))
            .filter(_.getPath.getName.startsWith("part-"))
          parts.filterNot(st => seen(st.getPath.getName))
            .foreach(st => fs.setTimes(st.getPath, base + i * 1000L, -1L))
          seen ++= parts.map(_.getPath.getName)
        }
        val stream = s.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
          .withColumn("text",
            graft.operators.Pii.fixtureAug(col("text"), col("doc_id")))
        val qn = s"csa_${java.util.UUID.randomUUID().toString.take(8)}"
        val q = graft.operators.Pii.piiStats(stream, "text", "source")
          .writeStream.outputMode("complete")
          .option("checkpointLocation", s"$root/ckpt")
          .format("memory").queryName(qn).start()
        try q.processAllAvailable() finally q.stop()
        require(q.recentProgress.count(_.numInputRows > 0) >= 2,
          s"expected multiple micro-batches, got ${q.recentProgress.length}")
        s.table(qn)
      },
      oracle = Some(graft.operators.Pii.statsOracleSql("source",
        graft.operators.Pii.fixtureAugSql))
    ),

    // C4-style blocklist screen: exact-token word hits + substring
    // phrase hits (the length-delta identity) over lowercased text, ANY
    // hit drops (maxHits=0, C4 semantics). Map-side probes over literal
    // lists + one source-grain hash aggregate; for catalog-sized lists
    // beyond literals the lever is the exploded-token broadcast join
    // (the Decontamination shape).
    "corpus_blocklist" -> QueryDef(
      build = (s, dir) => graft.operators.Blocklist.screen(
        Tables.documents(s, dir), "text", "source",
        words = Seq("dup"), phrases = Seq("data slow", "window join"),
        maxHits = 0L),
      oracle = Some(graft.operators.Blocklist.screenOracleSql(
        "source", words = Seq("dup"),
        phrases = Seq("data slow", "window join"), maxHits = 0L,
        toksSql = toksSql))
    ),

    // NO-SPLIT packing — the other packing family: SFT-style examples
    // stay intact, next-fit-decreasing within 16 seeded md5 shards
    // (packing is embarrassingly parallel ACROSS shards, a two-long
    // running fold WITHIN one — the honest mapPartitions case). Over-
    // capacity docs take their own over-full bin, never truncated. The
    // oracle replays the identical walk as a linear recursion per shard.
    "corpus_pack_nosplit" -> QueryDef(
      build = (s, dir) => graft.operators.BinPack.nfdPack(
        Tables.documents(s, dir), capacity = 192, seed = "nf0",
        nShards = 16),
      oracle = Some(graft.operators.BinPack.packOracleSql(
        capacity = 192, seed = "nf0", nShards = 16, toksSql = toksSql,
        binsOnly = false)),
      headline = true // the benched packing path (PrefixSum two-phase bins)
    ),

    // bin-grain fill report over the no-split layout: docs per bin,
    // token fill, utilization (above 1.0 exactly for own-bin over-long
    // docs — the padding-waste number an SFT data loader budgets by).
    "corpus_pack_nosplit_bins" -> QueryDef(
      build = (s, dir) => graft.operators.BinPack.binReport(
        graft.operators.BinPack.nfdPack(
          Tables.documents(s, dir), capacity = 192, seed = "nf0",
          nShards = 16), capacity = 192),
      oracle = Some(graft.operators.BinPack.packOracleSql(
        capacity = 192, seed = "nf0", nShards = 16, toksSql = toksSql,
        binsOnly = true))
    ),

    "corpus_pack_layout" -> QueryDef(
      build = (s, dir) => graft.operators.SequencePrep.concatLayout(
        Tables.documents(s, dir), capacity = 512, seed = "pack0")
        .select("doc_id", "n_tokens", "start_block", "offset_in_block",
          "end_block", "blocks_spanned"),
      oracle = Some(
        s"""WITH t AS (
           |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n
           |  FROM documents),
           |nz AS (SELECT doc_id, n FROM t WHERE n > 0),
           |c AS (
           |  SELECT doc_id, n,
           |         CAST(sum(n) OVER (
           |           ORDER BY md5('pack0:' || CAST(doc_id AS VARCHAR)), doc_id
           |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM nz)
           |SELECT doc_id, n AS n_tokens,
           |       (cum - n) // 512 AS start_block,
           |       (cum - n) % 512 AS offset_in_block,
           |       (cum - 1) // 512 AS end_block,
           |       (cum - 1) // 512 - (cum - n) // 512 + 1 AS blocks_spanned
           |FROM c""".stripMargin)
    ),

    // per-block fill report over the same layout: docs touching / starting
    // in each block, token fill (capacity everywhere but the tail block).
    // Explode mass is tokens/capacity + docs — linear, map-side; one
    // block-grain hash aggregate is the only shuffle.
    "corpus_pack_blocks" -> QueryDef(
      build = (s, dir) => graft.operators.SequencePrep.blockReport(
        graft.operators.SequencePrep.concatLayout(
          Tables.documents(s, dir), capacity = 512, seed = "pack0"),
        capacity = 512),
      oracle = Some(
        s"""WITH t AS (
           |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n
           |  FROM documents),
           |nz AS (SELECT doc_id, n FROM t WHERE n > 0),
           |c AS (
           |  SELECT doc_id, n,
           |         CAST(sum(n) OVER (
           |           ORDER BY md5('pack0:' || CAST(doc_id AS VARCHAR)), doc_id
           |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           |  FROM nz),
           |e AS (
           |  SELECT n, cum, (cum - n) // 512 AS start_block,
           |         unnest(range((cum - n) // 512, (cum - 1) // 512 + 1))
           |           AS block
           |  FROM c)
           |SELECT block, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(CASE WHEN start_block = block THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_starts,
           |       CAST(sum(least(cum, (block + 1) * 512)
           |                - greatest(cum - n, block * 512)) AS BIGINT)
           |         AS n_tokens,
           |       round(CAST(sum(least(cum, (block + 1) * 512)
           |                      - greatest(cum - n, block * 512)) AS DOUBLE)
           |             / 512, 6) AS fill_frac
           |FROM e GROUP BY block""".stripMargin)
    ),

    // round-robin source interleaving with a CLOSED-FORM global position
    // (driver-held per-source counts folded per row) — the oracle computes
    // the same order with a global row_number, differentially gating the
    // formula
    "corpus_interleave" -> QueryDef(
      build = (s, dir) => graft.operators.Sampling.interleaveBySource(
        Tables.documents(s, dir).select("doc_id", "source"),
        "doc_id", "source", seed = "epoch0")
        .select("doc_id", "source", "rank_in_source", "interleave_pos")
        .orderBy("interleave_pos"),
      oracle = Some(
        """WITH r AS (
          |  SELECT doc_id, source,
          |         CAST(row_number() OVER (PARTITION BY source
          |           ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)),
          |                    doc_id) AS BIGINT) AS rank_in_source
          |  FROM documents)
          |SELECT doc_id, source, rank_in_source,
          |       CAST(row_number() OVER (
          |         ORDER BY rank_in_source, source) - 1 AS BIGINT)
          |         AS interleave_pos
          |FROM r ORDER BY interleave_pos""".stripMargin)
    ),

    // token-budget water-filling: spend 60% of the corpus's tokens across
    // sources at temperature-0.7 weights; small sources saturate, the
    // rest split the remainder by weight at one closed-form water level
    // (capped set is a prefix in a/w order — no iteration). The
    // water-level arithmetic replays identically in SQL because prefix
    // sums run in the same (ratio, source) order and frame totals are
    // order-insensitive max-of-prefix.
    "corpus_budget_alloc" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val per = Tables.documents(s, dir)
          .select(col("source"),
            size(graft.functions.TextFunctions.tokens(col("text")))
              .cast("long").as("ntok"))
          .groupBy("source").agg(sum("ntok").as("avail"))
        val total = per.agg(sum("avail")).head.getLong(0)
        val weighted = per.withColumn("w",
          pow(col("avail").cast("double"), 0.7))
        graft.operators.Mixture.waterfill(weighted, "source", "avail", "w",
          budget = (0.6 * total).toLong).orderBy("source")
      },
      oracle = Some(
        s"""WITH t AS (SELECT source, $toksSql AS tk FROM documents),
           |ps AS (SELECT source, CAST(sum(len(tk)) AS BIGINT) AS a
           |       FROM t GROUP BY source),
           |tot AS (SELECT CAST(floor(0.6 * sum(a)) AS BIGINT) AS budget
           |        FROM ps),
           |b AS (SELECT source, a, pow(CAST(a AS DOUBLE), 0.7) AS w,
           |             CAST(a AS DOUBLE) / pow(CAST(a AS DOUBLE), 0.7)
           |               AS ratio
           |      FROM ps),
           |c AS (SELECT source, a, w, ratio,
           |             sum(a) OVER o AS cum_a, sum(w) OVER o AS cum_w
           |      FROM b
           |      WINDOW o AS (ORDER BY ratio, source
           |                   ROWS BETWEEN UNBOUNDED PRECEDING
           |                   AND CURRENT ROW)),
           |d AS (SELECT c.*, max(cum_w) OVER () AS tot_w,
           |             (SELECT budget FROM tot) AS budget
           |      FROM c),
           |e AS (SELECT d.*,
           |             CASE WHEN CAST(a AS DOUBLE) * (tot_w - (cum_w - w))
           |                       <= (CAST(budget AS DOUBLE)
           |                           - CAST(cum_a - a AS DOUBLE)) * w
           |                  THEN 1 ELSE 0 END AS cap
           |      FROM d),
           |f AS (SELECT e.*,
           |             min(cap) OVER (ORDER BY ratio, source
           |                            ROWS BETWEEN UNBOUNDED PRECEDING
           |                            AND CURRENT ROW) AS in_cap
           |      FROM e),
           |g AS (SELECT f.*,
           |             max(CASE WHEN in_cap = 1 THEN cum_a ELSE 0 END)
           |               OVER () AS cap_a,
           |             max(CASE WHEN in_cap = 1 THEN cum_w ELSE 0.0 END)
           |               OVER () AS cap_w
           |      FROM f)
           |SELECT source, a AS avail_tokens, round(w, 6) AS weight,
           |       CASE WHEN in_cap = 1 THEN CAST(a AS DOUBLE)
           |            ELSE round(w * ((CAST(budget AS DOUBLE)
           |                             - CAST(cap_a AS DOUBLE))
           |                            / (tot_w - cap_w)), 6) END AS allocated,
           |       in_cap AS capped
           |FROM g ORDER BY source""".stripMargin)
    ),

    // distribution-matching resample: flatten the length distribution
    // (de-bias a short-page-heavy corpus) — per 256-char bucket,
    // keep_ratio = (uniform target / actual mass) normalized so the
    // rarest bucket keeps all; docs keep via the shared md5 coin. The
    // output is the before/after bucket table: frac_after flattens
    // toward 1/K while frac_before is skewed.
    "corpus_length_match" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val sampled = graft.operators.Sampling.lengthMatchedSample(
          Tables.documents(s, dir).select("doc_id", "n_chars"),
          "n_chars", "doc_id", bucketWidth = 256L)
        val agg = sampled.groupBy("bucket", "keep_ratio")
          .agg(count(lit(1)).as("n_before"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        val tot = agg.agg(sum("n_before").as("_tb"), sum("n_kept").as("_tk"))
        agg.crossJoin(broadcast(tot))
          .select(col("bucket"), col("n_before"),
            round(col("keep_ratio"), 6).as("keep_ratio"), col("n_kept"),
            round(col("n_before").cast("double") /
              col("_tb").cast("double"), 6).as("frac_before"),
            round(col("n_kept").cast("double") /
              col("_tk").cast("double"), 6).as("frac_after"))
          .orderBy("bucket")
      },
      oracle = Some(
        """WITH b AS (SELECT doc_id,
          |                  CAST(n_chars // 256 AS BIGINT) * 256 AS bucket
          |           FROM documents),
          |s AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
          |t AS (SELECT sum(n) AS tot, count(*) AS k FROM s),
          |r AS (SELECT bucket, n,
          |             CAST(tot AS DOUBLE)
          |               / (CAST(k AS DOUBLE) * CAST(n AS DOUBLE)) AS ratio
          |      FROM s, t),
          |m AS (SELECT max(ratio) AS rmax FROM r),
          |kr AS (SELECT bucket, n, ratio / rmax AS keep_ratio FROM r, m),
          |kept AS (SELECT b.bucket, count(*) AS n_kept
          |         FROM b JOIN kr ON b.bucket = kr.bucket
          |         WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          |               / 4294967296.0 < keep_ratio
          |         GROUP BY 1),
          |tk AS (SELECT sum(n_kept) AS tkk FROM kept)
          |SELECT kr.bucket, CAST(kr.n AS BIGINT) AS n_before,
          |       round(keep_ratio, 6) AS keep_ratio,
          |       CAST(coalesce(kept.n_kept, 0) AS BIGINT) AS n_kept,
          |       round(CAST(kr.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
          |         AS frac_before,
          |       round(CAST(coalesce(kept.n_kept, 0) AS DOUBLE)
          |             / CAST(tk.tkk AS DOUBLE), 6) AS frac_after
          |FROM kr LEFT JOIN kept ON kr.bucket = kept.bucket, t, tk
          |ORDER BY kr.bucket""".stripMargin)
    ),

    // the TRAINING MANIFEST — the handoff artifact a trainer actually
    // consumes, closing the curation arc (split → pack → order): every
    // train-split doc with its shard assignment and position within the
    // shard, all three decisions the deterministic md5 machinery already
    // oracled piecewise (assignSplit, packShards' prefix-sum layout, the
    // in-shard order). One row per training doc; a resumable loader
    // seeks (shard_id, pos_in_shard) without any side state.
    "corpus_train_manifest" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
          .withColumn("split", graft.operators.Sampling.assignSplit(
            col("doc_id"), Seq(0.8 -> "train", 0.9 -> "val"), last = "test"))
        val packed = graft.operators.Sampling.packShards(
          docs.filter(col("split") === "train"), idCol = "doc_id",
          weightCol = "n_chars", nShards = 8)
        val w = Window.partitionBy("shard_id")
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        packed.select(col("shard_id"),
          row_number().over(w).cast("long").as("pos_in_shard"),
          col("doc_id"), col("n_chars"))
          .orderBy("shard_id", "pos_in_shard")
      },
      oracle = Some(
        s"""WITH ${OracleSnippets.splitCtes("doc_id", "documents")},
           |tr AS (SELECT d.doc_id, d.n_chars
           |       FROM documents d JOIN spl ON d.doc_id = spl.doc_id
           |       WHERE spl.split = 'train'),
           |c AS (
           |  SELECT doc_id, n_chars,
           |         sum(n_chars) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
           |                                     doc_id
           |                            ROWS UNBOUNDED PRECEDING) AS cum
           |  FROM tr),
           |tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM tr),
           |sh AS (
           |  SELECT doc_id, n_chars,
           |         least(7, CAST(floor((cum - n_chars)
           |                             / ((total + 7) // 8)) AS BIGINT))
           |           AS shard_id
           |  FROM c CROSS JOIN tot)
           |SELECT shard_id,
           |       CAST(row_number() OVER (PARTITION BY shard_id
           |         ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
           |         AS pos_in_shard,
           |       doc_id, CAST(n_chars AS BIGINT) AS n_chars
           |FROM sh ORDER BY shard_id, pos_in_shard""".stripMargin)
    ),

    // DSIR importance selection (Xie et al. 2023): steer the raw corpus
    // toward a target subset (here lang = 'en' as the stand-in target
    // distribution) by hashed-unigram importance log-weights — two B-row
    // smoothed distributions from ONE token pass, score = doc-bucket
    // counts × log-ratio dictionary join, top-50 head on the rounded
    // weight with doc_id ties. The whole chain is exact-integer counts +
    // round6'd log sums, so the ranking hash-matches the SQL replay.
    "corpus_dsir_select" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val w = graft.operators.Dsir.importanceWeights(
          Tables.documents(s, dir), textCol = "text", idCol = "doc_id",
          targetPred = col("lang") === "en", b = 256)
        // distributed top-k, then rank only the 50 survivors
        val top = w.orderBy(col("log_weight").desc, col("doc_id").asc)
          .limit(50)
        val rnk = org.apache.spark.sql.expressions.Window
          .orderBy(col("log_weight").desc, col("doc_id").asc)
        top.withColumn("rank", row_number().over(rnk).cast("long"))
          .select("doc_id", "n_tokens", "log_weight", "rank")
      },
      oracle = Some(graft.operators.Dsir.selectOracleSql(
        targetPredSql = "lang = 'en'", b = 256, k = 50, toksSql = toksSql))
    ),

    // DSIR's sampled selection (the paper's actual resampling step, vs
    // corpus_dsir_select's deterministic head): Gumbel-top-k — rank on
    // log_weight − ln(−ln u) with u the seeded md5 coin, take the top
    // 50. Equivalent to k draws WITHOUT replacement ∝ softmax(weight)
    // (the Gumbel-max trick) yet a pure function of (seed, id, counts),
    // so the sample replays bit-for-bit; no u^(1/w) overflow when
    // exp(log_weight) leaves double range. Distributed top-k, never a
    // corpus-sized window.
    "corpus_dsir_sample" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val w = graft.operators.Dsir.importanceWeights(
          Tables.documents(s, dir), textCol = "text", idCol = "doc_id",
          targetPred = col("lang") === "en", b = 256)
        graft.operators.Dsir.gumbelTopK(w, seed = "ds7", k = 50)
          .select("doc_id", "n_tokens", "log_weight", "rank")
      },
      oracle = Some(graft.operators.Dsir.sampleOracleSql(
        targetPredSql = "lang = 'en'", b = 256, k = 50, seed = "ds7",
        toksSql = toksSql))
    ),

    // curation funnel: the attrition report every real pipeline logs —
    // docs and tokens surviving each successive corpus_clean stage
    // (raw → lang → quality → near-dup). Per-doc "stage reached" comes
    // from the SAME operators the clean query oracles; the 4 funnel rows
    // then form in ONE aggregation via the literal-stage explode (the
    // Expectations pivot idiom — a 4× map-side amplification, no window,
    // no second scan). Near-dup drops are computed among quality
    // survivors only (filter-before-dedup, exactly as clean executes).
    "corpus_filter_funnel" -> QueryDef(
      build = (s, dir) =>
        CorpusPipeline.filterFunnel(Tables.documents(s, dir)),
      oracle = Some(
        s"""WITH $langIdCtes,
           |$qualityCtes,
           |base AS (
           |  SELECT d.doc_id, l.predicted, round(q.quality, 6) AS quality,
           |         len($toksSql) AS n_toks
           |  FROM documents d
           |  JOIN langid l USING (doc_id)
           |  JOIN quality q USING (doc_id)
           |),
           |kept AS (
           |  SELECT b.doc_id, d.text FROM base b JOIN documents d USING (doc_id)
           |  WHERE b.predicted IN ('en') AND b.quality >= 0.28
           |),
           |${shingleCtes("kept")},
           |${jaccardPairCtes(0.5, graft.operators.Dedup.defaultShingleCap)},
           |drops AS (SELECT DISTINCT b AS doc_id FROM pairs),
           |staged AS (
           |  SELECT doc_id, n_toks,
           |         CASE WHEN predicted <> 'en' THEN 0
           |              WHEN quality < 0.28 THEN 1
           |              WHEN doc_id IN (SELECT doc_id FROM drops) THEN 2
           |              ELSE 3 END AS sr
           |  FROM base),
           |s AS (SELECT unnest([0, 1, 2, 3]) AS stage)
           |SELECT CAST(s.stage AS BIGINT) AS stage,
           |       CASE s.stage WHEN 0 THEN 'raw' WHEN 1 THEN 'lang'
           |            WHEN 2 THEN 'quality' ELSE 'near_dup' END AS stage_name,
           |       count(*) AS n_docs,
           |       CAST(sum(st.n_toks) AS BIGINT) AS n_tokens
           |FROM s JOIN staged st ON st.sr >= s.stage
           |GROUP BY 1, 2""".stripMargin)
    ),

    // CCNet head/middle/tail split (Wenzek et al. 2020): every candidate
    // doc scored under the reference bigram LM (same doc_id%5 train slice
    // and shared oracle CTE as text_lm_score), then bucketed WITHIN its
    // language at the language's score terciles — the published recipe
    // for "keep the most Wikipedia-like third per language" without one
    // language's volume drowning another's thresholds. Thresholds are two
    // exact interpolated percentiles per language (a lang-count-sized
    // model frame, broadcast back), so assignment is map-side — no
    // per-language sort or ntile window. Scores and thresholds both carry
    // 6-dp rounding, so the boundary CASE replays engine-identically.
    "corpus_ccnet_buckets" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val docs = Tables.documents(s, dir)
        val c = col("doc_id")
        val scored = graft.operators.LmScore.bigramLogLikelihood(
            docs.filter(c % 5 =!= 0), docs.filter(c % 5 === 0))
          .select(col("doc_id"), round(col("score"), 6).as("score"))
          .join(docs.select("doc_id", "lang"), "doc_id")
        graft.operators.LmScore.tercileBuckets(scored)
          .select("doc_id", "lang", "score", "bucket")
      },
      oracle = Some(
        s"""WITH ${OracleSnippets.lmScoreCtes},
           |sl AS (SELECT sc.doc_id, d.lang, sc.score
           |       FROM sc JOIN documents d USING (doc_id)),
           |th AS (SELECT lang,
           |              round(quantile_cont(score, ${1.0 / 3}), 6) AS t1,
           |              round(quantile_cont(score, ${2.0 / 3}), 6) AS t2
           |       FROM sl GROUP BY lang)
           |SELECT sl.doc_id, sl.lang, sl.score,
           |       CASE WHEN sl.score >= th.t2 THEN 'head'
           |            WHEN sl.score >= th.t1 THEN 'middle'
           |            ELSE 'tail' END AS bucket
           |FROM sl JOIN th USING (lang)""".stripMargin)
    ),

    // Exact-proportion stratified split (scikit-learn's stratify=
    // contract): within every language, rank docs on the seeded md5 draw
    // and cut at ceil(f·n) — each (lang, split) cell holds exactly its
    // share, where corpus_split's per-doc coin wobbles ±sqrt(n) and can
    // starve a small language's val/test cells entirely. The Spark side
    // ranks via 4096 prefix-ordered md5 buckets + driver offsets (the
    // PrefixSum discipline — no per-language sort window), which the
    // oracle's direct per-language row_number() differentially gates:
    // bucket-concatenation order must equal the global (draw, id) order.
    "corpus_stratified_split" -> QueryDef(
      build = (s, dir) => graft.operators.Sampling.stratifiedExactSplit(
          Tables.documents(s, dir), strataCol = "lang", idCol = "doc_id",
          seed = "sx7", cuts = Seq(0.8 -> "train", 0.9 -> "val"),
          last = "test")
        .select("doc_id", "lang", "split"),
      oracle = Some(
        """WITH k AS (SELECT doc_id, lang,
          |                  md5('sx7:' || CAST(doc_id AS VARCHAR)) AS k
          |           FROM documents),
          |r AS (SELECT doc_id, lang,
          |             row_number() OVER (PARTITION BY lang
          |                                ORDER BY k, doc_id) - 1 AS pos,
          |             count(*) OVER (PARTITION BY lang) AS n
          |      FROM k)
          |SELECT doc_id, lang,
          |       CASE WHEN pos < ceil(0.8 * n) THEN 'train'
          |            WHEN pos < ceil(0.9 * n) THEN 'val'
          |            ELSE 'test' END AS split
          |FROM r""".stripMargin)
    )
  )
}
