package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.operators.Dedup

/** Dedup queries over `documents`, each with a DuckDB oracle generated from
  * the same parameters (hash seeds, band layout, thresholds) as the Spark
  * operators in [[Dedup]].
  */
object DedupQueries {

  private val toksSql =
    """list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"""

  /** Shingle CTEs (3-gram, distinct, non-empty) mirroring
    * [[Dedup.shingleSets]].
    */
  private val shingleCtes =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
       |  FROM t
       |  WHERE len(toks) >= 3
       |)""".stripMargin

  /** Mirrors [[Dedup.baseHash32]] + [[Dedup.universalHash]]. */
  private def universalHashSql(i: Int): String =
    s"((('0x' || substring(md5(x), 1, 8))::BIGINT * ${Dedup.uhA(i)} + ${Dedup.uhB(i)}) % 2147483647)"

  /** MinHash-LSH chain over `sh` ([[Dedup.minhashLshPairs]]): signatures →
    * banded buckets → candidate pairs → exact verify (`ver` with
    * inter/la/lb). Shared by the lsh query and the recall harness so the
    * two replays cannot drift.
    */
  private def minhashChainCtes(k: Int, bands: Int): String = {
    val rows = k / bands
    val hashCols = (0 until k).map(i =>
      s"  list_aggregate(list_transform(s, x -> ${universalHashSql(i)}), 'min') AS h$i")
      .mkString(",\n")
    val bandSelects = (0 until bands).map { bi =>
      val hs = (0 until rows).map(r => s"h${bi * rows + r}").mkString(", ")
      s"SELECT doc_id, $bi AS band, md5(concat_ws(',', $hs)) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""sig AS (SELECT doc_id, s,
       |$hashCols
       |FROM sh),
       |bands AS (
       |  $bandSelects
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
       |),
       |ver AS (
       |  SELECT a, b,
       |         len(list_filter(sa.s, t -> list_contains(sb.s, t))) AS inter,
       |         len(sa.s) AS la, len(sb.s) AS lb
       |  FROM cand JOIN sh sa ON cand.a = sa.doc_id
       |            JOIN sh sb ON cand.b = sb.doc_id
       |)""".stripMargin
  }

  /** DuckDB replay of the new×base Jaccard screen — shared by
    * dedup_incremental (recompute path) and dedup_index_screen (the
    * persisted-postings path): identical results IS the differential
    * gate for index maintenance.
    */
  private lazy val crossJaccardOracleSql: String =
    s"""$shingleCtes,
       |ex0 AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM sh),
       |hot AS (SELECT sg FROM ex0 GROUP BY sg
       |        HAVING count(*) > ${Dedup.defaultShingleCap.get}),
       |ex AS (SELECT * FROM ex0 WHERE sg NOT IN (SELECT sg FROM hot)),
       |p AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, x.sz AS sa, y.sz AS sb,
       |         count(*) AS inter
       |  FROM ex x JOIN ex y ON x.sg = y.sg AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2, 3, 4
       |),
       |j AS (SELECT a, b, round(inter / (sa + sb - inter), 6) AS jaccard
       |      FROM p WHERE inter / (sa + sb - inter) >= 0.5)
       |SELECT CASE WHEN a % 10 = 7 THEN a ELSE b END AS new_id,
       |       CASE WHEN a % 10 = 7 THEN b ELSE a END AS base_id,
       |       jaccard
       |FROM j WHERE (a % 10 = 7) <> (b % 10 = 7)""".stripMargin

  /** The synchronous LPA vote/argmax rounds (self-vote, min-label ties)
    * over `und(a, b)` starting from `l0(id, lab)` — ONE builder shared
    * by dedup_communities and dedup_modularity so the two oracles can
    * never gate different LPA semantics.
    */
  private def lpaRoundsCtes(rounds: Int): String =
    (1 to rounds).map { i =>
      val prev = s"l${i - 1}"
      s"""v$i AS MATERIALIZED (
         |  SELECT u.a AS id, l.lab FROM und u JOIN $prev l ON u.b = l.id
         |  UNION ALL SELECT id, lab FROM $prev),
         |c$i AS MATERIALIZED (
         |  SELECT id, lab, count(*) AS c FROM v$i GROUP BY 1, 2),
         |l$i AS MATERIALIZED (
         |  SELECT id, lab FROM (
         |    SELECT id, lab,
         |           row_number() OVER (PARTITION BY id
         |                              ORDER BY c DESC, lab) AS rn
         |    FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  val defs: Map[String, QueryDef] = Map(

    // URL-level dedup — the FIRST dedup a web-crawl pipeline runs,
    // before any content hashing: the same page recrawled under
    // tracking-param / casing / default-port / fragment / trailing-slash
    // variants collapses under a deterministic canonicalizer (lowercase
    // scheme+host, strip www./default port/fragment/trailing slash,
    // drop utm_*/gclid/fbclid, sort surviving params). Per-source
    // rollup: URLs seen, distinct raw spellings, distinct canonical
    // forms, and the collapse ratio the canonicalizer buys. Fixture
    // appends a clean URL and a messy twin per doc that MUST meet at
    // one canonical form.
    "dedup_url_canonical" -> QueryDef(
      build = (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.UrlOps.urlDedupStats(
          d.withColumn("text",
            graft.operators.UrlOps.fixtureAug(col("text"), col("doc_id"))),
          "text", "source")
      },
      oracle = Some(graft.operators.UrlOps.urlDedupOracleSql(
        "source", graft.operators.UrlOps.fixtureAugSql))
    ),

    // C4-style per-domain document cap: each doc's origin (registered
    // domain of its first URL — last two host labels, three for co.uk-
    // class suffixes), its deterministic rank within the domain, and
    // whether it survives keep-at-most-8. The window partitions BY
    // DOMAIN (hash-partitioned, never global) — skew is bounded by the
    // hottest domain, exactly the column the cap polices.
    "dedup_domain_cap" -> QueryDef(
      build = (s, dir) => {
        val d = Tables.documents(s, dir)
        graft.operators.UrlOps.domainCap(
          d.withColumn("text",
            graft.operators.UrlOps.fixtureAug(col("text"), col("doc_id"))),
          "text", "doc_id", cap = 8)
      },
      oracle = Some(graft.operators.UrlOps.domainCapOracleSql(
        "doc_id", 8, graft.operators.UrlOps.fixtureAugSql))
    ),

    "dedup_exact_groups" -> QueryDef(
      build = (s, dir) => Dedup.exactGroups(Tables.documents(s, dir)),
      oracle = Some(
        """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
          |       count(*) AS n, min(doc_id) AS keep_id
          |FROM documents GROUP BY 1""".stripMargin)
    ),

    // span-level repeated-substring detection (Lee et al.: the memorized
    // boilerplate paragraph whole-doc near-dup misses): 5-token spans
    // occurring >= 3x corpus-wide, merged per doc, token coverage
    // reported. Positioned shingles explode map-side; ONE md5-hash
    // aggregate; flagged positions return via equi-join; merge window is
    // per-doc, never data-sized.
    "dedup_repeated_spans" -> QueryDef(
      build = (s, dir) => graft.operators.RepeatedSpans.spanStats(
        Tables.documents(s, dir), textCol = "text", idCol = "doc_id",
        n = 5, minCount = 3),
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
           |base AS (SELECT doc_id, len(tk) AS n_tokens, tk FROM t),
           |g AS (
           |  SELECT doc_id,
           |         unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS pos, tk
           |  FROM base),
           |sh AS (SELECT doc_id, pos,
           |              md5(array_to_string(tk[pos:pos+4], ' ')) AS h
           |       FROM g),
           |rep AS (SELECT h FROM sh GROUP BY h HAVING count(*) >= 3),
           |f AS (SELECT sh.doc_id, sh.pos FROM sh JOIN rep USING (h)),
           |cov AS (
           |  SELECT doc_id, CAST(count(DISTINCT tp) AS BIGINT) AS covered
           |  FROM (SELECT doc_id, unnest(range(pos, pos + 5)) AS tp FROM f)
           |  GROUP BY 1),
           |sp AS (
           |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_flagged,
           |         CAST(sum(CASE WHEN prev IS NULL OR pos > prev + 5
           |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_spans
           |  FROM (SELECT doc_id, pos,
           |               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
           |                 AS prev
           |        FROM f)
           |  GROUP BY 1)
           |SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
           |       coalesce(sp.n_flagged, 0) AS n_flagged,
           |       coalesce(sp.n_spans, 0) AS n_spans,
           |       coalesce(cov.covered, 0) AS covered_tokens,
           |       round(CAST(coalesce(cov.covered, 0) AS DOUBLE)
           |             / nullif(CAST(b.n_tokens AS DOUBLE), 0.0), 6)
           |         AS repeated_frac
           |FROM base b
           |LEFT JOIN sp ON b.doc_id = sp.doc_id
           |LEFT JOIN cov ON b.doc_id = cov.doc_id""".stripMargin)
    ),

    // hot-shingle cap ON (the production scale lever) and mirrored in the
    // oracle: both engines drop shingles with df > cap before the join
    "dedup_ngram_jaccard" -> QueryDef(
      build = (s, dir) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, dir), n = 3, minJaccard = 0.5),
      oracle = Some(
        s"""$shingleCtes,
           |ex0 AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM sh),
           |hot AS (SELECT sg FROM ex0 GROUP BY sg
           |        HAVING count(*) > ${Dedup.defaultShingleCap.get}),
           |ex AS (SELECT * FROM ex0 WHERE sg NOT IN (SELECT sg FROM hot)),
           |p AS (
           |  SELECT x.doc_id AS a, y.doc_id AS b, x.sz AS sa, y.sz AS sb,
           |         count(*) AS inter
           |  FROM ex x JOIN ex y ON x.sg = y.sg AND x.doc_id < y.doc_id
           |  GROUP BY 1, 2, 3, 4
           |)
           |SELECT a, b, round(inter / (sa + sb - inter), 6) AS jaccard
           |FROM p WHERE inter / (sa + sb - inter) >= 0.5""".stripMargin),
      headline = true
    ),

    // incremental dedup: a NEW batch (doc_id%10==7 — the daily crawl)
    // screened against the accumulated BASE corpus. The Spark side never
    // forms a base×base candidate (the quadratic bulk the production
    // shape exists to avoid); the oracle replays the full self-join and
    // keeps only cross pairs, so any base×base pair leaking into the
    // build — or any cross pair the asymmetric index misses — breaks the
    // hash. Cap df is counted over the union on both sides.
    "dedup_incremental" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val isNew = org.apache.spark.sql.functions.col("doc_id") % 10 === 7
        Dedup.crossJaccardPairs(docs.filter(isNew), docs.filter(!isNew),
          n = 3, minJaccard = 0.5)
      },
      oracle = Some(crossJaccardOracleSql),
      // the production daily-crawl shape (new-batch × base, never
      // base×base) — promoted to the timed headline set; sf1-measured
      // 4.0× at 10× data
      headline = true
    ),

    // the screen run FROM A PERSISTED INDEX — the shape that makes daily
    // dedup affordable at 100 TB: the base corpus is shingled ONCE into
    // a postings table (a VersionedTable — versioned, vacuumable,
    // time-travelable like any governed table); each day's batch joins
    // the stored postings and must produce the BIT-IDENTICAL screen as
    // reshingling the base from scratch (same oracle as
    // dedup_incremental — the differential gate for index maintenance).
    // After the screen, the batch's own postings append as a pure-append
    // commit, so tomorrow's index is one commit ahead, never a rebuild.
    "dedup_index_screen" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_dis_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val docs = Tables.documents(s, dir)
        val isNew = col("doc_id") % 10 === 7
        val vt = graft.sources.VersionedTable(s, root)
        vt.overwrite(Dedup.postings(docs.filter(!isNew), n = 3)) // v0: nightly build
        val newPosts = Dedup.postings(docs.filter(isNew), n = 3)
          .localCheckpoint(true)
        val screened = Dedup.crossJaccardFromPostings(
          newPosts, vt.read(), minJaccard = 0.5).localCheckpoint(true)
        vt.append(newPosts) // v1: the batch joins the index for tomorrow
        require(vt.latestVersion.contains(1L), "index append must be v1")
        screened
      },
      oracle = Some(crossJaccardOracleSql)
    ),

    // triangle count over the near-dup pair graph — the graph-density
    // diagnostic (triangles ⇒ transitively-consistent duplicate groups;
    // a pair-heavy but triangle-free graph means chained borderline
    // matches, the thing cluster-collapse dedup gets wrong). Pairs carry
    // a < b, so each triangle a<b<c is counted exactly once by the
    // two-hop equi-join e1(a,b)⋈e2(b,c)⋈e3(a,c) — three joins of the
    // (small, post-threshold) pair set, never a cartesian.
    "dedup_triangles" -> QueryDef(
      build = (s, dir) => {
        val pairs = Dedup.ngramJaccardPairs(
          Tables.documents(s, dir), n = 3, minJaccard = 0.5).select("a", "b")
        pairs.as("e1")
          .join(pairs.as("e2"), col("e1.b") === col("e2.a"))
          .join(pairs.as("e3"),
            col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
          .agg(count(lit(1)).as("n_triangles"))
      },
      oracle = Some(
        s"""$shingleCtes,
           |${OracleSnippets.jaccardPairCtes(0.5, Dedup.defaultShingleCap)}
           |SELECT count(*) AS n_triangles
           |FROM pairs e1
           |JOIN pairs e2 ON e1.b = e2.a
           |JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin)
    ),

    // min-normalized n-gram containment — catches subset duplication
    // (a doc pasted whole into a larger one) that Jaccard scores
    // arbitrarily low; same inverted-index + hot-shingle-cap plan and
    // LOW-bias cap semantics as the Jaccard query
    "dedup_containment" -> QueryDef(
      build = (s, dir) => Dedup.ngramContainmentPairs(
        Tables.documents(s, dir), n = 3, minContainment = 0.6),
      oracle = Some(
        s"""$shingleCtes,
           |ex0 AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM sh),
           |hot AS (SELECT sg FROM ex0 GROUP BY sg
           |        HAVING count(*) > ${Dedup.defaultShingleCap.get}),
           |ex AS (SELECT * FROM ex0 WHERE sg NOT IN (SELECT sg FROM hot)),
           |p AS (
           |  SELECT x.doc_id AS a, y.doc_id AS b, x.sz AS sa, y.sz AS sb,
           |         count(*) AS inter
           |  FROM ex x JOIN ex y ON x.sg = y.sg AND x.doc_id < y.doc_id
           |  GROUP BY 1, 2, 3, 4
           |)
           |SELECT a, b, round(inter / least(sa, sb), 6) AS containment
           |FROM p WHERE inter / least(sa, sb) >= 0.6""".stripMargin)
    ),

    // pair → cluster: connected components over the capped near-dup pairs,
    // every doc assigned a cluster (its own id when un-paired); oracled via
    // a DuckDB recursive-CTE reachability walk
    "dedup_components" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Components.clusters(docs,
          Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5).select("a", "b"))
      },
      oracle = Some(
        s"""WITH RECURSIVE ${OracleSnippets.shingleCtes("documents")},
           |${OracleSnippets.jaccardPairCtes(0.5, Dedup.defaultShingleCap)},
           |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
           |walk(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT w.id, u.b FROM walk w JOIN und u ON u.a = w.r
           |)
           |SELECT id AS doc_id, min(r) AS cluster_id FROM walk GROUP BY id""".stripMargin)
    ),

    // incremental containment: the quote-chain case of the daily-batch
    // screen — a new doc pasted whole from a base doc scores Jaccard
    // |new|/|base| (arbitrarily low) but containment 1.0. Same
    // asymmetric new×base index and union-df cap as dedup_incremental;
    // the oracle replays the full self-join, min-normalizes, and keeps
    // cross pairs.
    "dedup_incremental_containment" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val isNew = org.apache.spark.sql.functions.col("doc_id") % 10 === 7
        Dedup.crossContainmentPairs(docs.filter(isNew),
          docs.filter(!isNew), n = 3, minContainment = 0.6)
      },
      oracle = Some(
        s"""$shingleCtes,
           |ex0 AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM sh),
           |hot AS (SELECT sg FROM ex0 GROUP BY sg
           |        HAVING count(*) > ${Dedup.defaultShingleCap.get}),
           |ex AS (SELECT * FROM ex0 WHERE sg NOT IN (SELECT sg FROM hot)),
           |p AS (
           |  SELECT x.doc_id AS a, y.doc_id AS b, x.sz AS sa, y.sz AS sb,
           |         count(*) AS inter
           |  FROM ex x JOIN ex y ON x.sg = y.sg AND x.doc_id < y.doc_id
           |  GROUP BY 1, 2, 3, 4
           |),
           |j AS (SELECT a, b,
           |             round(inter / least(sa, sb), 6) AS containment
           |      FROM p WHERE inter / least(sa, sb) >= 0.6)
           |SELECT CASE WHEN a % 10 = 7 THEN a ELSE b END AS new_id,
           |       CASE WHEN a % 10 = 7 THEN b ELSE a END AS base_id,
           |       containment
           |FROM j WHERE (a % 10 = 7) <> (b % 10 = 7)""".stripMargin)
    ),

    // 2-core of the near-dup pair graph — the actionable refinement of
    // dedup_triangles' density diagnostic: per node, did it survive 8
    // synchronized degree-<2 peels? A CHAIN of borderline matches
    // (a~b~c~d with no a~c) peels away entirely — collapsing it is a
    // transitive guess — while a transitively-dense blob keeps a cycle
    // and survives, where collapse is safe. Fixed rounds keep the result
    // a pure function of the edge list; the oracle unrolls the identical
    // 8 peels. ComponentsSpec pins that 8 rounds reaches the fixed point
    // on this corpus.
    "dedup_chain_core" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Components.twoCore(
          Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
            .select("a", "b"))
      },
      oracle = Some {
        // every nᵢ is referenced TWICE by round i+1 — without MATERIALIZED
        // the optimizer inlines the whole chain 2^rounds times (the X215
        // unroll discipline)
        val rounds = (1 to 8).map { i =>
          val prev = s"n${i - 1}"
          s"""d$i AS MATERIALIZED (
             |  SELECT u.a AS id, count(*) AS c FROM und u
             |  JOIN $prev x ON u.a = x.id JOIN $prev y ON u.b = y.id
             |  GROUP BY 1),
             |n$i AS MATERIALIZED (SELECT id FROM d$i WHERE c >= 2)""".stripMargin
        }.mkString(",\n")
        s"""$shingleCtes,
           |${OracleSnippets.jaccardPairCtes(0.5, Dedup.defaultShingleCap)},
           |und AS MATERIALIZED (
           |  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
           |n0 AS MATERIALIZED (SELECT DISTINCT a AS id FROM und),
           |$rounds
           |SELECT n0.id AS doc_id, n0.id IN (SELECT id FROM n8) AS in_core
           |FROM n0""".stripMargin
      }
    ),

    // soft-dedup loss weights: every doc weighted 1/|near-dup cluster| —
    // the alternative to hard removal that keeps one "vote" per content
    // cluster in expectation (duplicate-heavy sources stop dominating
    // the loss without discarding data). Pure composition of two oracled
    // operators: components over the capped Jaccard pair graph × a
    // cluster-size count joined back (cluster-keyed, cluster-sized).
    "dedup_soft_weights" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val clusters = graft.operators.Components.clusters(docs,
          Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
            .select("a", "b"))
        val sizes = clusters.groupBy("cluster_id")
          .agg(count(lit(1)).as("_sz"))
        graft.QueryDef.round6(clusters.join(sizes, "cluster_id")
          .select(col("doc_id"),
            (lit(1.0) / col("_sz").cast("double")).as("weight")))
      },
      oracle = Some(
        s"""WITH RECURSIVE ${OracleSnippets.shingleCtes("documents")},
           |${OracleSnippets.jaccardPairCtes(0.5, Dedup.defaultShingleCap)},
           |und AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
           |walk(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT w.id, u.b FROM walk w JOIN und u ON u.a = w.r
           |),
           |cl AS (SELECT id AS doc_id, min(r) AS cluster_id
           |       FROM walk GROUP BY id),
           |sz AS (SELECT cluster_id, count(*) AS sz FROM cl GROUP BY 1)
           |SELECT cl.doc_id,
           |       round(CAST(1.0 AS DOUBLE) / CAST(sz.sz AS DOUBLE), 6)
           |         AS weight
           |FROM cl JOIN sz USING (cluster_id)""".stripMargin)
    ),

    "dedup_minhash_lsh" -> QueryDef(
      build = (s, dir) => Dedup.minhashLshPairs(Tables.documents(s, dir),
        n = 3, k = 16, bands = 8, minJaccard = 0.5),
      oracle = Some(
        s"""$shingleCtes,
           |${minhashChainCtes(k = 16, bands = 8)}
           |SELECT a, b, round(inter / (la + lb - inter), 6) AS jaccard
           |FROM ver WHERE inter / (la + lb - inter) >= 0.5""".stripMargin),
      headline = true
    ),

    // the dedup-side recall harness (the sibling of sim_recall_eval for
    // ANN): MinHash-LSH pair recall against the exact capped-Jaccard
    // baseline, IN-ENGINE and fully oracled — both chains are already
    // hash-gated queries, so the recall NUMBER itself is differentially
    // gated, not just the paths that produce it. Sub-1 recall on 8 bands
    // of 2 rows is a documented measurement (the banding cost/recall
    // knob), not a failure.
    "dedup_recall_eval" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val exact = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
          .select("a", "b")
        val lsh = Dedup.minhashLshPairs(docs, n = 3, k = 16, bands = 8,
          minJaccard = 0.5).select("a", "b")
        val ne = exact.agg(count(lit(1)).as("n_exact"))
        val nl = lsh.agg(count(lit(1)).as("n_lsh"))
        val nh = exact.join(lsh, Seq("a", "b"))
          .agg(count(lit(1)).as("n_hits"))
        ne.crossJoin(nl).crossJoin(nh)
          .select(col("n_exact"), col("n_lsh"), col("n_hits"),
            round(col("n_hits").cast("double") /
              col("n_exact").cast("double"), 6).as("recall"))
      },
      oracle = Some(
        s"""$shingleCtes,
           |${OracleSnippets.jaccardPairCtes(0.5, Dedup.defaultShingleCap)},
           |${minhashChainCtes(k = 16, bands = 8)},
           |lshp AS (
           |  SELECT a, b FROM ver
           |  WHERE inter / (la + lb - inter) >= 0.5),
           |ex_n AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM pairs),
           |lsh_n AS (SELECT CAST(count(*) AS BIGINT) AS n_lsh FROM lshp),
           |hit_n AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
           |          FROM pairs JOIN lshp USING (a, b))
           |SELECT n_exact, n_lsh, n_hits,
           |       round(CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
           |         AS recall
           |FROM ex_n CROSS JOIN lsh_n CROSS JOIN hit_n""".stripMargin)
    ),

    "dedup_source_sketch" -> QueryDef(
      build = (s, dir) => graft.operators.Dedup.groupMinhashSimilarity(
        Tables.documents(s, dir), groupCol = "source", n = 3, k = 16),
      oracle = Some {
        val k = 16
        val minCols = (0 until k).map(i =>
          s"  min(${universalHashSql(i).replace("md5(x)", "md5(h)")}) AS h$i")
          .mkString(",\n")
        val estTerms = (0 until k).map(i =>
          s"(CASE WHEN a.h$i = b.h$i THEN 1.0 ELSE 0.0 END)")
          .mkString("\n       + ")
        s"""$shingleCtes,
           |wg AS (SELECT d.source AS grp, sh.s
           |       FROM sh JOIN documents d USING (doc_id)),
           |ex AS (SELECT grp, unnest(s) AS h FROM wg),
           |sigs AS (
           |  SELECT grp,
           |$minCols
           |  FROM ex GROUP BY grp
           |),
           |est AS (
           |  SELECT a.grp AS g1, b.grp AS g2,
           |         round(($estTerms) / 16.0, 6) AS est_jaccard
           |  FROM sigs a JOIN sigs b ON a.grp < b.grp
           |  WHERE ($estTerms) > 0
           |),
           |ds AS (SELECT DISTINCT grp, sg
           |       FROM (SELECT grp, unnest(s) AS sg FROM wg) t),
           |sz AS (SELECT grp, count(*) AS sz FROM ds GROUP BY grp),
           |inter AS (
           |  SELECT x.grp AS g1, y.grp AS g2, count(*) AS inter
           |  FROM ds x JOIN ds y ON x.sg = y.sg AND x.grp < y.grp
           |  GROUP BY 1, 2
           |),
           |exact AS (
           |  SELECT g1, g2,
           |         round(inter / (s1.sz + s2.sz - inter), 6) AS exact_jaccard
           |  FROM inter
           |  JOIN sz s1 ON inter.g1 = s1.grp
           |  JOIN sz s2 ON inter.g2 = s2.grp
           |)
           |SELECT coalesce(e.g1, x.g1) AS g1, coalesce(e.g2, x.g2) AS g2,
           |       coalesce(e.est_jaccard, 0.0) AS est_jaccard,
           |       coalesce(x.exact_jaccard, 0.0) AS exact_jaccard
           |FROM est e FULL JOIN exact x ON e.g1 = x.g1 AND e.g2 = x.g2""".stripMargin
      }
    ),

    // TF-weighted SimHash: each distinct token votes ±tf instead of ±1,
    // so documents sharing a small vocabulary but differing in term
    // frequency separate — the fix for set-SimHash's pair blow-up on this
    // corpus (dedup_simhash emits 21k pairs at sf0.01; the weighted
    // signature cuts that by an order of magnitude at the same Hamming
    // radius). Same banding, same oracle skeleton — only the vote rule
    // changes, and the DuckDB replay weights its votes identically.
    "dedup_simhash_weighted" -> QueryDef(
      build = (s, dir) =>
        Dedup.simhashPairs(Tables.documents(s, dir), bits = 32,
          maxHamming = 3, weighted = true),
      oracle = Some {
        val bits = 32
        val terms = (0 until bits).map(j =>
          s"(CASE WHEN sum(CASE WHEN ((hv >> $j) & 1) = 1 THEN w ELSE -w END) > 0 " +
            s"THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END)")
          .mkString("\n         + ")
        s"""WITH tok AS (
           |  SELECT doc_id, unnest($toksSql) AS t FROM documents
           |),
           |tf AS (SELECT doc_id, t, count(*) AS w FROM tok GROUP BY 1, 2),
           |h AS (
           |  SELECT doc_id, ('0x' || substring(md5(t), 1, 15))::BIGINT AS hv, w
           |  FROM tf
           |),
           |sv AS (
           |  SELECT doc_id, $terms AS simhash FROM h GROUP BY doc_id
           |),
           |s AS (  -- zero-token docs keep signature 0, as in the engine
           |  SELECT d.doc_id, coalesce(sv.simhash, 0) AS simhash
           |  FROM documents d LEFT JOIN sv USING (doc_id)
           |),
           |b AS (
           |  SELECT doc_id, simhash, c, (simhash >> (c * 8)) & 255 AS v
           |  FROM s CROSS JOIN (VALUES (0), (1), (2), (3)) AS ch(c)
           |),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
           |         x.simhash AS sx, y.simhash AS sy
           |  FROM b x JOIN b y ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id
           |)
           |SELECT a, b, CAST(bit_count(xor(sx, sy)) AS BIGINT) AS hamming
           |FROM cand WHERE bit_count(xor(sx, sy)) <= 3""".stripMargin
      }
    ),

    "dedup_simhash" -> QueryDef(
      build = (s, dir) =>
        Dedup.simhashPairs(Tables.documents(s, dir), bits = 32, maxHamming = 3),
      oracle = Some {
        val bits = 32
        val terms = (0 until bits).map(j =>
          s"(CASE WHEN 2 * len(list_filter(hs, x -> ((x >> $j) & 1) = 1)) > len(hs) " +
            s"THEN (CAST(1 AS BIGINT) << $j) ELSE CAST(0 AS BIGINT) END)")
          .mkString("\n         + ")
        s"""WITH t AS (
           |  SELECT doc_id,
           |         list_transform(list_distinct($toksSql),
           |           x -> ('0x' || substring(md5(x), 1, 15))::BIGINT) AS hs
           |  FROM documents
           |),
           |s AS (SELECT doc_id, $terms AS simhash FROM t),
           |b AS (
           |  SELECT doc_id, simhash, c, (simhash >> (c * 8)) & 255 AS v
           |  FROM s CROSS JOIN (VALUES (0), (1), (2), (3)) AS ch(c)
           |),
           |cand AS (
           |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
           |         x.simhash AS sx, y.simhash AS sy
           |  FROM b x JOIN b y ON x.c = y.c AND x.v = y.v AND x.doc_id < y.doc_id
           |)
           |SELECT a, b, CAST(bit_count(xor(sx, sy)) AS BIGINT) AS hamming
           |FROM cand WHERE bit_count(xor(sx, sy)) <= 3""".stripMargin
      }
    ),

    // SEMANTIC dedup (SemDeDup discipline): near-duplicates by embedding
    // cosine, not surface n-grams — catches paraphrases and re-encodings
    // that shingle Jaccard misses. Pipeline: RH-LSH banded candidate pairs
    // (band equi-join, no cross product) → exact cosine ≥ τ verify →
    // connected components → keep-min canonical per semantic cluster. The
    // oracle replays the identical hyperplanes + cosine and walks the same
    // pair graph with a recursive CTE. Scale shape: the only quadratic is
    // within LSH buckets; components run the oracled O(log n) min-label
    // rounds of [[graft.operators.Components]].
    // NOT a headline: τ=0.35 with 4-bit bands on this near-orthogonal
    // corpus is the documented LSH WORST CASE (~53% of all pairs collide
    // — measured, SURVEY X209), kept as a correctness stress query; the
    // bench slot belongs to the production regime below
    // (dedup_semantic_twins), whose candidate mass is ~n·bands.
    "dedup_semantic" -> QueryDef(
      build = (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val pairs = graft.operators.Similarity
          .lshPairs(emb, dim = 64, nPlanes = 48, bands = 12, minCos = 0.35)
          .select(col("a"), col("b"))
        graft.operators.Components.clusters(emb, pairs, idCol = "vec_id")
          .select(col("vec_id"), col("cluster_id"),
            (col("vec_id") === col("cluster_id")).as("is_canonical"))
      },
      oracle = Some {
        val scored = SimilarityQueries.lshScoredCtes(nPlanes = 48, bands = 12)
          .replaceFirst("WITH ", "WITH RECURSIVE ")
        s"""$scored,
           |prs AS (SELECT a, b FROM scored WHERE cos >= 0.35),
           |und AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
           |walk(id, r) AS (
           |  SELECT vec_id, vec_id FROM embeddings
           |  UNION
           |  SELECT w.id, u.b FROM walk w JOIN und u ON u.a = w.r
           |)
           |SELECT id AS vec_id, min(r) AS cluster_id,
           |       (id = min(r)) AS is_canonical
           |FROM walk GROUP BY id""".stripMargin
      }
    ),

    // the PRODUCTION SemDeDup regime that dedup_semantic's low-τ corpus
    // can't show: re-encoded duplicates (50 injected twins, same vector
    // values under a new id) at τ=0.99 with WIDE 12-bit bands — exact
    // twins collide in every band, near-orthogonal non-dups almost never
    // (4096 buckets/band), so candidate mass is ~n·bands instead of the
    // low-τ query's half-of-all-pairs. Same operators, same oracle chain
    // over the augmented source; every twin must cluster with its source
    // and nothing else may pair at this threshold.
    // HEADLINE (took the slot from low-τ dedup_semantic in round 7): this
    // parameterization is the scale-true SemDeDup path — candidate mass
    // ~n·bands (SimilaritySpec asserts it), data-proportional at 100×.
    "dedup_semantic_twins" -> QueryDef(
      build = (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val aug = emb.select(col("vec_id"), col("embedding")).unionAll(
          emb.filter(col("vec_id") < 50)
            .select((col("vec_id") + 10000L).as("vec_id"), col("embedding")))
        val pairs = graft.operators.Similarity
          .lshPairs(aug, dim = 64, nPlanes = 48, bands = 4, minCos = 0.99)
          .select(col("a"), col("b"))
        graft.operators.Components.clusters(aug, pairs, idCol = "vec_id")
          .select(col("vec_id"), col("cluster_id"),
            (col("vec_id") === col("cluster_id")).as("is_canonical"))
      },
      oracle = Some {
        val scored = SimilarityQueries
          .lshScoredCtes(nPlanes = 48, bands = 4, src = "aug")
          .replaceFirst("WITH ", "")
        s"""WITH RECURSIVE aug AS (
           |  SELECT vec_id, embedding FROM embeddings
           |  UNION ALL
           |  SELECT vec_id + 10000, embedding FROM embeddings
           |  WHERE vec_id < 50),
           |$scored,
           |prs AS (SELECT a, b FROM scored WHERE cos >= 0.99),
           |und AS (SELECT a, b FROM prs UNION SELECT b, a FROM prs),
           |walk(id, r) AS (
           |  SELECT vec_id, vec_id FROM aug
           |  UNION
           |  SELECT w.id, u.b FROM walk w JOIN und u ON u.a = w.r
           |)
           |SELECT id AS vec_id, min(r) AS cluster_id,
           |       (id = min(r)) AS is_canonical
           |FROM walk GROUP BY id""".stripMargin
      },
      headline = true
    ),

    // label-propagation communities over the capped near-dup pair graph —
    // the bridge-robust sibling of dedup_components: components merge
    // everything REACHABLE, so one borderline 0.5-Jaccard edge between two
    // unrelated duplicate blobs welds them into one cluster; LPA's closed-
    // neighborhood majority vote outvotes the bridge, keeping the blobs
    // separate while each still collapses. Exactly 4 synchronous rounds,
    // self-vote, min-label ties — a pure integer function of the edge
    // list; the oracle unrolls the identical 4 vote/argmax rounds
    // (row_number ORDER BY c DESC, lab == min(struct(-c, lab))).
    "dedup_communities" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Components.communities(docs,
          Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
            .select("a", "b"))
      },
      oracle = Some(
        s"""$shingleCtes,
           |${OracleSnippets.jaccardPairCtes(0.5, Dedup.defaultShingleCap)},
           |und AS MATERIALIZED (
           |  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
           |l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lab FROM und),
           |${lpaRoundsCtes(4)}
           |SELECT d.doc_id, coalesce(l4.lab, d.doc_id) AS community_id
           |FROM documents d LEFT JOIN l4 ON l4.id = d.doc_id""".stripMargin)
    ),

    // partition-quality referee for the two clusterings above: Newman
    // modularity of the connected-components partition vs the LPA
    // partition on the SAME capped pair graph. Q = Σ_c[m_c/m − (d_c/2m)²],
    // computed as one exact integer numerator Σ(4·m·m_c − d_c²) and ONE
    // final division — no float-summation-order hazard, both engines
    // divide the identical integers. n_clusters counts every cluster
    // (singleton docs included).
    "dedup_modularity" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5)
          .select("a", "b").localCheckpoint(true) // 4 consumers, 1 shingle pass
        val comp = graft.operators.Components.clusters(docs, pairs)
        val lpa = graft.operators.Components.communities(docs, pairs)
        val qc = graft.operators.Components.modularity(pairs, comp,
          idCol = "doc_id", labCol = "cluster_id")
          .select(lit("components").as("part"), col("n_clusters"),
            col("modularity"))
        val ql = graft.operators.Components.modularity(pairs, lpa,
          idCol = "doc_id", labCol = "community_id")
          .select(lit("lpa").as("part"), col("n_clusters"), col("modularity"))
        qc.unionAll(ql)
      },
      oracle = Some {
        val lpaRounds = lpaRoundsCtes(4)
        def qCtes(tag: String, asg: String, idC: String, labC: String) =
          s"""labs_$tag AS (SELECT DISTINCT $labC AS lab FROM $asg),
             |e_$tag AS (
             |  SELECT x.$labC AS la, y.$labC AS lb
             |  FROM pairs p JOIN $asg x ON x.$idC = p.a
             |              JOIN $asg y ON y.$idC = p.b),
             |intra_$tag AS (SELECT la AS lab, count(*) AS mc
             |               FROM e_$tag WHERE la = lb GROUP BY 1),
             |deg_$tag AS (SELECT lab, count(*) AS dc FROM (
             |    SELECT la AS lab FROM e_$tag
             |    UNION ALL SELECT lb AS lab FROM e_$tag) GROUP BY 1),
             |q_$tag AS (
             |  SELECT '$tag' AS part, count(*) AS n_clusters,
             |         round(sum(4 * (SELECT m FROM m_n) * coalesce(mc, 0)
             |                   - coalesce(dc, 0) * coalesce(dc, 0))
             |               / (4.0 * (SELECT m FROM m_n)
             |                      * (SELECT m FROM m_n)), 6) AS modularity
             |  FROM labs_$tag
             |  LEFT JOIN intra_$tag USING (lab)
             |  LEFT JOIN deg_$tag USING (lab))""".stripMargin
        s"""WITH RECURSIVE ${OracleSnippets.shingleCtes("documents")},
           |${OracleSnippets.jaccardPairCtes(0.5, Dedup.defaultShingleCap)},
           |m_n AS (SELECT count(*) AS m FROM pairs),
           |und AS MATERIALIZED (
           |  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
           |walk(id, r) AS (
           |  SELECT doc_id, doc_id FROM documents
           |  UNION
           |  SELECT w.id, u.b FROM walk w JOIN und u ON u.a = w.r
           |),
           |cl AS MATERIALIZED (
           |  SELECT id AS doc_id, min(r) AS cluster_id FROM walk GROUP BY id),
           |l0 AS MATERIALIZED (SELECT DISTINCT a AS id, a AS lab FROM und),
           |$lpaRounds,
           |lp AS MATERIALIZED (
           |  SELECT d.doc_id, coalesce(l4.lab, d.doc_id) AS community_id
           |  FROM documents d LEFT JOIN l4 ON l4.id = d.doc_id),
           |${qCtes("components", "cl", "doc_id", "cluster_id")},
           |${qCtes("lpa", "lp", "doc_id", "community_id")}
           |SELECT * FROM q_components UNION ALL SELECT * FROM q_lpa""".stripMargin
      }
    ),

    // Cross-document EXACT-SUBSTRING spans (Lee et al. 2022 ExactSubstr,
    // X354): maximal per-doc token intervals covered by a 15-token window
    // occurring more than once in the corpus ((doc, pos) occurrences —
    // within-doc repeats count). One count aggregate over window hashes +
    // one semi-join + a per-doc gaps-and-islands window — never a pair
    // join, so a boilerplate window in a million docs costs one count
    // cell. The oracle replays the identical md5-window chain.
    "dedup_substr_spans" -> QueryDef(
      // sf-scale corpora are exactly the SubstrMaterializeConf regime
      // (one shared explode pass; the 100-TB default recomputes instead
      // of persisting a w×-corpus frame — see Dedup.SubstrMaterializeConf)
      build = (s, dir) => withSubstrMaterialize(s)(Dedup.exactSubstrSpans(
        Tables.documents(s, dir), windowTokens = 15)),
      oracle = Some(exactSubstrOracle(15) + spanSelect(15)),
      headline = true // the signature span-dedup operator: guards the
                      // shared-pass, 16-byte-key plan shape at bench
                      // grain (more expensive than half the headliners)
    ),

    // Per-doc ExactSubstr rollup: the corpus-audit number ("how much of
    // my corpus is verbatim duplicated text") — every doc, spanless ones
    // included, with its duplicated-token total and ratio.
    "dedup_substr_stats" -> QueryDef(
      build = (s, dir) => withSubstrMaterialize(s)(Dedup.exactSubstrStats(
        Tables.documents(s, dir), windowTokens = 15)),
      oracle = Some(exactSubstrOracle(15) +
        """,
          |spans AS (
          |  SELECT doc_id, min(pos) AS s0, max(pos) + 15 AS s1
          |  FROM grp GROUP BY doc_id, island),
          |per AS (
          |  SELECT doc_id, count(*) AS n_spans,
          |         CAST(sum(s1 - s0) AS BIGINT) AS dup_tokens
          |  FROM spans GROUP BY doc_id)
          |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
          |       coalesce(p.n_spans, 0) AS n_spans,
          |       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
          |       round(coalesce(p.dup_tokens, 0)
          |             / greatest(len(t.toks), 1), 6) AS dup_ratio
          |FROM t LEFT JOIN per p USING (doc_id)""".stripMargin)
    ),

    // SPAN-GRAIN benchmark contamination (X355): the ExactSubstr chain
    // pointed across the corpus/eval split — every maximal span of a
    // training doc whose 10-token windows appear verbatim in the eval
    // set (doc_id % 7 = 0, the held-out shard). Doc-grain
    // decontamination says WHICH docs leak; this says WHERE — the
    // redaction-grade answer. Ref side collapses to distinct window
    // hashes (benchmarks are tiny next to training corpora); one
    // semi-join, per-doc islands.
    "corpus_decon_spans" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val c = org.apache.spark.sql.functions.col("doc_id")
        Dedup.contaminationSpans(
          docs.filter(c % 7 =!= 0), docs.filter(c % 7 === 0),
          windowTokens = 10)
      },
      oracle = Some(spanChainOracle(10,
        """ref AS (SELECT DISTINCT win FROM wins WHERE doc_id % 7 = 0),
          |dp AS (SELECT doc_id, pos FROM wins
          |       WHERE doc_id % 7 <> 0
          |         AND win IN (SELECT win FROM ref))""".stripMargin) +
        spanSelect(10))
    ),

    // INCREMENTAL ExactSubstr: the daily-crawl shape for the span
    // family. The base corpus's window-count frame persists as a
    // governed VersionedTable (v0: nightly build); the day's batch
    // screens against it — spans of NEW docs whose windows are
    // duplicated across base+batch — WITHOUT re-tokenizing a byte of
    // base text (count additivity makes the differential exact: the
    // screen must produce the BIT-IDENTICAL spans as running the full
    // corpus chain and keeping the new docs, which is what the oracle
    // computes); then the batch's own counts APPEND (v1) — the index is
    // additive (screens sum cnt per key), so maintenance is a pure
    // append, never a rebuild.
    "dedup_substr_index" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_ssi_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val docs = Tables.documents(s, dir)
        val isNew = col("doc_id") % 10 === 7
        val vt = graft.sources.VersionedTable(s, root)
        // v0: nightly build in the BUCKETED layout, on the exact screen
        // join keys — at 100 TB the index is corpus-scale, and this write
        // is what makes every later daily screen plan with no exchange
        // above the index side (write once, join forever; X370)
        vt.overwriteBucketed(Dedup.exactSubstrIndex(
          docs.filter(!isNew), windowTokens = 15),
          nBuckets = 16, bucketCols = Seq("h1", "h2"),
          sortCols = Seq("h1", "h2"))
        val spans = withSubstrMaterialize(s)(Dedup.exactSubstrSpansIncremental(
          docs.filter(isNew), vt.readBucketed(), windowTokens = 15))
        // self-gate the layout's point before executing: the index side
        // must contribute NO shuffle — its scan already carries the hash
        // partitioning the count-sum agg and the probe join need (the
        // only exchanges left belong to the day's batch)
        val plan = spans.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        require(!plan.contains("hashpartitioning(h1#"),
          "bucketed index side must plan exchange-free")
        val out = spans.localCheckpoint(true)
        vt.append(Dedup.exactSubstrIndex(
          docs.filter(isNew), windowTokens = 15)) // v1: tomorrow's index
        require(vt.latestVersion.contains(1L), "index append must be v1")
        out
      },
      headline = true, // the family's production shape (nightly bucketed
                       // build + daily screen + append): as a headline it
                       // is the regression guard for the bucketed layout
      oracle = Some(spanChainOracle(15,
        """dup AS (SELECT win FROM wins GROUP BY win HAVING count(*) > 1),
          |dp AS (SELECT doc_id, pos FROM wins
          |       WHERE doc_id % 10 = 7
          |         AND win IN (SELECT win FROM dup))""".stripMargin) +
        spanSelect(15))
    ),

    // Span-grain decontamination against a PERSISTED benchmark index —
    // the production shape (benchmark suites are static: hash the eval
    // set once into a governed window-count table, screen every crawl
    // batch against it forever, never re-reading benchmark text). Same
    // oracle chain as corpus_decon_spans: the persisted-index screen
    // must be indistinguishable from re-hashing the refs.
    "corpus_decon_index" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.functions._
        val root = s"${System.getProperty("java.io.tmpdir")}/graft_dci_${s.sparkContext.applicationId}"
        val p = new org.apache.hadoop.fs.Path(root)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        val docs = Tables.documents(s, dir)
        val c = col("doc_id")
        val vt = graft.sources.VersionedTable(s, root)
        vt.overwrite(Dedup.exactSubstrIndex( // once, at suite release
          docs.filter(c % 7 === 0), windowTokens = 10))
        Dedup.contaminationSpansFromIndex(
          docs.filter(c % 7 =!= 0), vt.read(), windowTokens = 10)
      },
      oracle = Some(spanChainOracle(10,
        """ref AS (SELECT DISTINCT win FROM wins WHERE doc_id % 7 = 0),
          |dp AS (SELECT doc_id, pos FROM wins
          |       WHERE doc_id % 7 <> 0
          |         AND win IN (SELECT win FROM ref))""".stripMargin) +
        spanSelect(10))
    ),

    // ExactSubstr REDACTION (the end of the Lee et al. pipeline): cut
    // every flagged span, re-join the surviving tokens — every doc,
    // spanless ones included, with its redacted text and the kept/removed
    // token conservation numbers (kept + removed = n_tokens; removed ==
    // dedup_substr_stats.dup_tokens by construction). The oracle replays
    // the span chain, anti-joins token positions against the spans'
    // intervals, and string_aggs the survivors in position order.
    "corpus_substr_redact" -> QueryDef(
      build = (s, dir) => withSubstrMaterialize(s)(Dedup.exactSubstrRedact(
        Tables.documents(s, dir), windowTokens = 15)),
      oracle = Some(exactSubstrOracle(15) +
        """,
          |spans AS (
          |  SELECT doc_id, min(pos) AS s0, max(pos) + 15 AS s1
          |  FROM grp GROUP BY doc_id, island),
          |tok AS (
          |  SELECT doc_id, i - 1 AS p, toks[i] AS tk
          |  FROM (SELECT doc_id, toks,
          |               unnest(range(1, len(toks) + 1)) AS i FROM t)),
          |kept AS (
          |  SELECT k.doc_id, k.p, k.tk FROM tok k
          |  WHERE NOT EXISTS (SELECT 1 FROM spans s
          |                    WHERE s.doc_id = k.doc_id
          |                      AND k.p >= s.s0 AND k.p < s.s1)),
          |ka AS (
          |  SELECT doc_id, string_agg(tk, ' ' ORDER BY p) AS txt,
          |         count(*) AS kc
          |  FROM kept GROUP BY doc_id)
          |SELECT t.doc_id, coalesce(ka.txt, '') AS text_redacted,
          |       CAST(len(t.toks) AS BIGINT) AS n_tokens,
          |       CAST(coalesce(ka.kc, 0) AS BIGINT) AS kept_tokens,
          |       CAST(len(t.toks) - coalesce(ka.kc, 0) AS BIGINT)
          |         AS removed_tokens
          |FROM t LEFT JOIN ka USING (doc_id)""".stripMargin)
    )
  )

  /** Span-family materialization policy of the declared queries: the
    * 100-TB-safe DEFAULT (recompute-per-consumer, zero block storage).
    * Until round 15 these builds opted INTO the occurrence-frame
    * materialization because the shared tokenize pass won ~1.7× at
    * sf0.1; the round-15 rework (ScanParallel fan-out + the native
    * rolling-hash SubstrWindowsExpr) made the recompute pass so cheap
    * that the checkpoint's store+copy now LOSES at every measured SF
    * (sf0.1 steady state: 1.1 s recompute vs 2.0 s materialized), so the
    * benched plan and the 100-TB plan are finally the same shape.
    * `SPARK_GRAFT_SUBSTR_MATERIALIZE=1` re-enables the opt-in — the
    * measurement hook that lets Bench A/B the materialized plan on the
    * same declared queries (outputs are identical either way; only the
    * physical plan changes).
    */
  private def withSubstrMaterialize[T](
      s: org.apache.spark.sql.SparkSession)(f: => T): T =
    if (!sys.env.get("SPARK_GRAFT_SUBSTR_MATERIALIZE").contains("1")) f
    else {
      s.conf.set(Dedup.SubstrMaterializeConf, "true")
      try f finally s.conf.unset(Dedup.SubstrMaterializeConf)
    }

  /** Shared span-chain oracle: tokens → md5 window hashes at positions →
    * `dupCtes` (the ONLY part that varies: whatever produces a
    * `dp(doc_id, pos)` frame of flagged positions) → per-doc islands
    * (break when the gap exceeds the window). EVERY span spelling —
    * corpus-duplicate and cross-corpus contamination — builds on this one
    * parameterized chain so the replays cannot drift.
    */
  private def spanChainOracle(w: Int, dupCtes: String): String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |wins AS (
       |  SELECT doc_id, i - 1 AS pos,
       |         md5(array_to_string(toks[i:i+${w - 1}], ' ')) AS win
       |  FROM (SELECT doc_id, toks,
       |               unnest(range(1, len(toks) - ${w - 2})) AS i
       |        FROM t WHERE len(toks) >= $w)),
       |$dupCtes,
       |isl AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |                   IS NULL
       |              OR pos - lag(pos) OVER (PARTITION BY doc_id
       |                                      ORDER BY pos) > $w
       |              THEN 1 ELSE 0 END AS brk
       |  FROM dp),
       |grp AS (
       |  SELECT doc_id, pos,
       |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
       |                        ROWS UNBOUNDED PRECEDING) AS island
       |  FROM isl)""".stripMargin

  /** [[spanChainOracle]] with the corpus-duplicate flag rule (window
    * multiplicity > 1 over ALL (doc, pos) occurrences).
    */
  private def exactSubstrOracle(w: Int): String = spanChainOracle(w,
    """dup AS (SELECT win FROM wins GROUP BY win HAVING count(*) > 1),
      |dp AS (SELECT doc_id, pos FROM wins
      |       WHERE win IN (SELECT win FROM dup))""".stripMargin)

  /** Maximal-span projection over the chain's `grp` frame. */
  private def spanSelect(w: Int): String =
    s"""
       |SELECT doc_id, min(pos) AS span_start,
       |       max(pos) + $w AS span_end,
       |       max(pos) + $w - min(pos) AS span_tokens
       |FROM grp GROUP BY doc_id, island""".stripMargin
}
