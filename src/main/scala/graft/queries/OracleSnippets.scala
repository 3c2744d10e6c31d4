package graft.queries

import graft.functions.TextFunctions

/** DuckDB SQL fragments shared across oracles — single source of truth for
  * the pieces that must stay in lockstep with the Spark-side expressions.
  */
object OracleSnippets {

  /** Whitespace tokens, empties dropped ([[TextFunctions.tokens]]). */
  val toksSql: String =
    """list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"""

  /** SQL string literal with `''` escaping — pieces/words/phrases are learned
    * from arbitrary corpus text, so an apostrophe (e.g. "don't") must not
    * break the generated oracle.
    */
  def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  def sqlList(xs: Seq[String]): String =
    xs.map(sqlStr).mkString("[", ", ", "]")

  /** 3-gram distinct shingle CTEs over `src`
    * ([[graft.operators.Dedup.shingleSets]]).
    */
  def shingleCtes(src: String = "documents"): String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM $src),
       |sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(range(1, greatest(len(toks) - 1, 1)),
       |           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS s
       |  FROM t
       |  WHERE len(toks) >= 3
       |)""".stripMargin

  /** Exact-Jaccard pair CTEs over `sh` (threshold inlined by caller).
    *
    * `maxShingleFreq` mirrors [[graft.operators.Dedup.ngramJaccardPairs]]'s
    * hot-shingle cap: shingles held by more than `cap` docs are dropped
    * BEFORE the self-join on both engines; set sizes (`sz`) stay pre-cap so
    * only the candidate space shrinks, exactly like the Spark side.
    */
  def jaccardPairCtes(minJaccard: Double,
                      maxShingleFreq: Option[Int] = None,
                      src: String = "sh"): String = {
    val exCte = maxShingleFreq match {
      case Some(cap) =>
        s"""ex0 AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM $src),
           |hot AS (SELECT sg FROM ex0 GROUP BY sg HAVING count(*) > $cap),
           |ex AS (SELECT * FROM ex0 WHERE sg NOT IN (SELECT sg FROM hot))""".stripMargin
      case None =>
        s"ex AS (SELECT doc_id, len(s) AS sz, unnest(s) AS sg FROM $src)"
    }
    s"""$exCte,
       |p AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, x.sz AS sa, y.sz AS sb,
       |         count(*) AS inter
       |  FROM ex x JOIN ex y ON x.sg = y.sg AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2, 3, 4
       |),
       |pairs AS (
       |  SELECT a, b, inter / (sa + sb - inter) AS jaccard
       |  FROM p WHERE inter / (sa + sb - inter) >= $minJaccard
       |)""".stripMargin
  }

  /** Deterministic split-assignment CTE ([[graft.operators.Sampling
    * .assignSplit]] with cuts 0.8/0.9): emits `spl(<idCol>, split)`. The
    * md5-prefix draw must stay in lockstep with `Sampling.uniformDraw`.
    */
  def splitCtes(idCol: String, src: String): String =
    s"""spl AS (
       |  SELECT $idCol,
       |         CASE WHEN d < 0.8 THEN 'train'
       |              WHEN d < 0.9 THEN 'val' ELSE 'test' END AS split
       |  FROM (SELECT $idCol,
       |          ('0x' || substring(md5(CAST($idCol AS VARCHAR)), 1, 8))::BIGINT
       |            / 4294967296.0 AS d
       |        FROM $src))""".stripMargin

  /** Per-doc quality-score CTEs ([[TextFunctions.qualityScore]]); emits
    * `quality(doc_id, quality)` (unrounded).
    */
  val qualityCtes: String = {
    val allStop = sqlList(TextFunctions.stopwords.flatMap(_._2))
    s"""qt AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |qm AS (SELECT doc_id,
       |              CAST(len(toks) AS DOUBLE) AS n,
       |              CAST(len(list_filter(toks, t -> list_contains($allStop, t))) AS DOUBLE) AS sw,
       |              CAST(len(list_distinct(toks)) AS DOUBLE) AS dn
       |       FROM qt),
       |quality AS (
       |  SELECT doc_id,
       |         0.5 * coalesce(sw / nullif(n, 0.0), 0.0)
       |       + 0.3 * coalesce(dn / nullif(n, 0.0), 0.0)
       |       + 0.2 * least(1.0, n / 100.0) AS quality
       |  FROM qm
       |)""".stripMargin
  }

  /** Bigram-LM scoring CTEs ([[graft.operators.LmScore.bigramLogLikelihood]]
    * trained on the doc_id%5==0 reference slice, every other doc scored);
    * emits `sc(doc_id, n_bigrams, score)` with score rounded 6 dp. Shared
    * by `text_lm_score` and `corpus_ccnet_buckets` so the two replays
    * cannot drift.
    */
  val lmScoreCtes: String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |i AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t),
       |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg,
       |              toks[i] AS head
       |       FROM i),
       |refbg AS (SELECT bg, count(*) AS c_bg FROM bg
       |          WHERE doc_id % 5 = 0 GROUP BY 1),
       |refhead AS (SELECT head, count(*) AS c_head FROM bg
       |            WHERE doc_id % 5 = 0 GROUP BY 1),
       |v AS (SELECT count(DISTINCT tok) AS v FROM
       |        (SELECT unnest(toks) AS tok FROM t WHERE doc_id % 5 = 0)),
       |lp AS (
       |  SELECT b.doc_id,
       |         log2(coalesce(c_bg, 0) + 1)
       |           - log2(coalesce(c_head, 0) + v.v) AS lp
       |  FROM bg b
       |  LEFT JOIN refbg USING (bg)
       |  LEFT JOIN refhead USING (head)
       |  CROSS JOIN v
       |  WHERE b.doc_id % 5 <> 0),
       |sc AS (SELECT doc_id, count(*) AS n_bigrams,
       |              round(sum(lp) / count(*), 6) AS score
       |       FROM lp GROUP BY doc_id)""".stripMargin

  /** Per-doc predicted-language CTEs ([[TextFunctions.predictedLang]]);
    * emits `langid(doc_id, predicted)`.
    */
  val langIdCtes: String = {
    val names = TextFunctions.stopwords.map(_._1)
    val scores = TextFunctions.stopwords.map { case (lang, list) =>
      s"len(list_filter(toks, t -> list_contains(${sqlList(list)}, t))) AS s_$lang"
    }.mkString(", ")
    val conds = names.zipWithIndex.map { case (lang, i) =>
      val later = names.drop(i + 1)
      val beats = (s"s_$lang > 0" +: later.map(o => s"s_$lang >= s_$o"))
        .mkString(" AND ")
      s"WHEN $beats THEN '$lang'"
    }.mkString(" ")
    s"""lt AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |ls AS (SELECT doc_id, $scores FROM lt),
       |langid AS (SELECT doc_id, CASE $conds ELSE 'und' END AS predicted FROM ls)""".stripMargin
  }
}
