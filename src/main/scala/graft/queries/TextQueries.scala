package graft.queries

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.QueryDef.round6
import graft.functions.TextFunctions._

/** Text-analysis queries over `documents`: token/char stats, language ID,
  * quality scoring, fingerprints. Oracle SQL is generated from the same
  * stopword config so the two sides can never drift.
  */
object TextQueries {

  /** Fixed encode merge list (rank order) — ten common English bigram
    * merges, incl. the recursive th→the chain; shared by the Spark build
    * and the generated oracle so they cannot drift.
    */
  /** Frozen unigram-LM vocabulary (piece, quantized log-prob score) — a
    * `Unigram.train` artifact (maxPieceLen=4, maxWordLen=12, seedMulti=40,
    * vocabMulti=20, rounds=2 on the sf0.001 corpus), shipped fixed the
    * way production tokenizers ship: encode/fertility stay pure
    * inference and SQL-oracle-able.
    */
  private val unigramVocab: Seq[(String, Long)] = Seq(
    ("a", -2961016L), ("b", -3495162L), ("c", -3485227L),
    ("d", -3847514L), ("e", -2619632L), ("f", -3885032L),
    ("g", -2949592L), ("h", -3190521L), ("i", -3897673L),
    ("j", -4554967L), ("k", -3871471L), ("l", -2966886L),
    ("m", -3892158L), ("n", -11397650L), ("o", -3887767L),
    ("p", -4526558L), ("q", -4557103L), ("r", -3489263L),
    ("s", -3180481L), ("t", -2943183L), ("u", -3873089L),
    ("v", -3857559L), ("w", -3820528L), ("y", -3858623L),
    ("al", -3875250L), ("as", -4568938L), ("at", -3898226L),
    ("co", -4511118L), ("er", -3851732L), ("in", -3857028L),
    ("or", -3431757L), ("ow", -3908797L), ("ro", -4557103L),
    ("st", -3488528L), ("ta", -4590820L), ("ue", -3855967L),
    ("mer", -3888315L), ("par", -3861819L), ("indo", -4513163L),
    ("lumn", -4511118L), ("scan", -4505008L))

  /** The 10 pieces [[graft.operators.Wordpiece.trainOnCorpus]] learns at
    * sf0.001 (k=10), frozen the way production tokenizers ship; single
    * chars are the implicit coverage floor.
    */
  private val wordpiecePieces = Seq(
    "li", "wi", "qu", "lin", "win", "wind", "th", "##sh", "##ch", "fi")

  /** The ONE quality-classifier scaffold every text_train_classifier /
    * text_classifier_* query replays — three deterministic features, the
    * en-vs-rest label, LogReg at (iters=8, eta=0.5), and the prediction
    * column. Single-sourced (Spark side here, oracle side in
    * [[clfFeatCte]]/[[clfZfin]]) so the "same trained weights,
    * differentially consistent" claim can never silently fork across the
    * five queries that make it.
    */
  private def clfScaffold(docs: org.apache.spark.sql.DataFrame)
      : (Array[Double], org.apache.spark.sql.Column,
         org.apache.spark.sql.Column) = {
    val f0 = col("n_chars").cast("double") / lit(1000.0)
    val f1 = size(tokens(col("text"))).cast("double") / lit(100.0)
    val f2 = (length(col("text")) -
      length(expr("replace(text, ' the ', '')"))).cast("double") /
      lit(5.0) / lit(10.0)
    val y = (col("lang") === "en").cast("double")
    val w = graft.operators.LogReg.train(
      docs, Seq(f0, f1, f2), y, iters = 8, eta = 0.5)
    (w, graft.operators.LogReg.predict(w, Seq(f0, f1, f2)), y)
  }

  /** Oracle twin of [[clfScaffold]]'s features: the feat CTE over
    * `documents` carrying `extraCols` (e.g. "doc_id,") plus f0/f1/f2/y.
    */
  private def clfFeatCte(extraCols: String = ""): String =
    s"""feat AS MATERIALIZED (
       |  SELECT $extraCols
       |         n_chars / 1000.0 AS f0,
       |         len($toksSql) / 100.0 AS f1,
       |         (length(text) - length(replace(text, ' the ', '')))
       |           / 5.0 / 10.0 AS f2,
       |         CAST(lang = 'en' AS DOUBLE) AS y
       |  FROM documents)""".stripMargin

  private lazy val clfChain: String =
    graft.operators.LogReg.oracleCtes(d = 3, iters = 8, eta = 0.5)

  private val clfZfin: String =
    "(SELECT w0 FROM wfin) + (SELECT w1 FROM wfin) * f0" +
      " + (SELECT w2 FROM wfin) * f1 + (SELECT w3 FROM wfin) * f2"

  private val bpeMerges = Seq(
    "t" -> "h", "th" -> "e", "e" -> "r", "i" -> "n", "o" -> "n",
    "a" -> "n", "a" -> "t", "s" -> "t", "e" -> "n", "o" -> "r")

  /** DuckDB token list: whitespace split, empties dropped. */
  private val toksSql =
    """list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')"""

  private def sqlList(xs: Seq[String]): String = OracleSnippets.sqlList(xs)

  private def hitsSql(list: Seq[String]): String =
    s"len(list_filter(toks, t -> list_contains(${sqlList(list)}, t)))"

  /** CASE expression mirroring [[TextFunctions.predictedLang]]. */
  private val predictedSql: String = {
    val names = stopwords.map(_._1)
    val conds = names.zipWithIndex.map { case (lang, i) =>
      val later = names.drop(i + 1)
      val beats = (s"s_$lang > 0" +: later.map(o => s"s_$lang >= s_$o"))
        .mkString(" AND ")
      s"WHEN $beats THEN '$lang'"
    }
    s"CASE ${conds.mkString(" ")} ELSE 'und' END"
  }

  private val scoresSql: String = stopwords.map { case (lang, list) =>
    s"${hitsSql(list)} AS s_$lang"
  }.mkString(", ")

  val defs: Map[String, QueryDef] = Map(

    // exact corpus top terms: full hash-agg + tiny total-order on the
    // aggregated counts (ties broken on the token so the cut is
    // deterministic). The bounded-memory alternative when the vocabulary
    // itself is too big is the MisraGries sketch (HeavyHittersSpec).
    "text_top_terms" -> QueryDef(
      build = (s, dir) => Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("token"))
        .limit(20),
      oracle = Some(
        s"""SELECT token, count(*) AS n
           |FROM (SELECT unnest($toksSql) AS token FROM documents) t
           |GROUP BY token
           |ORDER BY n DESC, token
           |LIMIT 20""".stripMargin)
    ),

    // trainable linear classifier INSIDE the engine (fasttext-style
    // language filter): logistic regression by full-batch GD on three
    // exact-rational surface features (chars, tokens, " the " density),
    // label = lang english. 8 rounds of ONE map-side-combining gradient
    // aggregate each; model state is 4 doubles on the driver; weights
    // round to 9 dp per step so the TRAJECTORY replays in DuckDB's
    // unrolled-CTE twin, not just the loss ([[graft.operators.LogReg]]).
    // NB the synthetic corpus draws `lang` independently of the text (all
    // langs share one vocabulary — verified), so the honest optimum here
    // is the majority-class bias the trajectory converges to; the oracle
    // gates the training DYNAMICS, LogRegSpec proves learning on
    // separable data.
    "text_train_classifier" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val (w, p, y) = clfScaffold(docs)
        docs.agg(
          count(lit(1)).as("n_docs"),
          sum(when((p >= 0.5) === (y === 1.0), 1L).otherwise(0L))
            .as("n_correct"))
          .select(
            w.indices.map(j => lit(BigDecimal(w(j)).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble).as(s"w$j")) ++
              Seq(col("n_correct"), col("n_docs")): _*)
      },
      oracle = Some {
        val (chain, zfin) = (clfChain, clfZfin)
        s"""WITH ${clfFeatCte()},
           |$chain
           |SELECT round((SELECT w0 FROM wfin), 6) AS w0,
           |       round((SELECT w1 FROM wfin), 6) AS w1,
           |       round((SELECT w2 FROM wfin), 6) AS w2,
           |       round((SELECT w3 FROM wfin), 6) AS w3,
           |       CAST(sum(CASE WHEN (1.0/(1.0 + exp(-($zfin))) >= 0.5)
           |                          = (y = 1.0)
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           |       CAST(count(*) AS BIGINT) AS n_docs
           |FROM feat""".stripMargin
      }
    ),

    // classifier INFERENCE at corpus scale — the FineWeb-Edu-style stage
    // text_train_classifier stops short of: apply the trained model to
    // EVERY document and publish per-doc scores + the keep decision (the
    // artifact a quality-filtered pipeline actually consumes). Training
    // replays bit-exactly (the X215 unrolled chain, 9-dp per-step weight
    // rounding); scoring is one map-side sigmoid over broadcast-literal
    // weights — no shuffle at all, the production shape for scoring
    // 100 TB. The keep flag compares the ROUNDED score against the
    // threshold so the boundary replays engine-identically.
    "text_classifier_score" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val (w, p0, y) = clfScaffold(docs)
        val p = round(p0, 6)
        docs.select(col("doc_id"), p.as("score"),
          (p >= 0.5).as("kept"))
      },
      oracle = Some {
        val (chain, zfin) = (clfChain, clfZfin)
        s"""WITH ${clfFeatCte("doc_id,")},
           |$chain,
           |scored AS (
           |  SELECT doc_id, round(1.0/(1.0 + exp(-($zfin))), 6) AS score
           |  FROM feat)
           |SELECT doc_id, score, score >= 0.5 AS kept FROM scored""".stripMargin
      }
    ),

    // classifier EVALUATION — the missing third of the train→score→eval
    // arc: confusion counts at the 0.5 threshold, precision/recall/F1/
    // accuracy, and ROC-AUC. Every ratio is ONE division of exact integer
    // counts (F1 as 2tp/(2tp+fp+fn), never a mean of ratios), and AUC
    // uses the tie-averaged-rank (Mann–Whitney) identity on 6-dp-rounded
    // scores with DOUBLED ranks so the rank sum stays integer:
    // 2R₊ = Σ_groups pos·(2·below + c + 1),
    // AUC = (2R₊ − n₊(n₊+1)) / (2·n₊·n₋) — one integer division, both
    // engines replay it bit-for-bit. Scale shape: two hash aggregates +
    // one window over SCORE GROUPS (≤10⁶ rows at 6-dp rounding — bounded
    // model-sized state, never the corpus).
    "text_classifier_eval" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val (w, p0, y) = clfScaffold(docs)
        val p = round(p0, 6)
        val scored = docs.select((y === 1.0).as("pos"), p.as("score"),
          (p >= 0.5).as("pred")).localCheckpoint(true)
        val cm = scored.agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
          sum(when(col("pred") && col("pos"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("pred") && !col("pos"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("pred") && !col("pos"), 1L).otherwise(0L)).as("tn"),
          sum(when(!col("pred") && col("pos"), 1L).otherwise(0L)).as("fn"))
        val grp = scored.groupBy("score").agg(count(lit(1)).as("c"),
          sum(when(col("pos"), 1L).otherwise(0L)).as("pc"))
        val below = coalesce(sum(col("c")).over(Window.orderBy("score")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        val r2 = grp.withColumn("below", below)
          .agg(sum(col("pc") * (lit(2L) * col("below") + col("c") + lit(1L)))
            .as("r2"), lit(1).as("k"))
        cm.withColumn("k", lit(1)).join(r2, "k").select(
          col("n_docs"), col("n_pos"), col("tp"), col("fp"), col("tn"),
          col("fn"),
          round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
            .as("prec"),
          round(col("tp").cast("double") / (col("tp") + col("fn")), 6)
            .as("recall"),
          round((lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")), 6).as("f1"),
          round((col("tp") + col("tn")).cast("double") / col("n_docs"), 6)
            .as("accuracy"),
          round((col("r2") - col("n_pos") * (col("n_pos") + lit(1L)))
            .cast("double") /
            (lit(2L) * col("n_pos") * (col("n_docs") - col("n_pos")))
              .cast("double"), 6).as("auc"))
      },
      oracle = Some {
        val (chain, zfin) = (clfChain, clfZfin)
        s"""WITH ${clfFeatCte("doc_id,")},
           |$chain,
           |scored AS MATERIALIZED (
           |  SELECT (y = 1.0) AS pos,
           |         round(1.0/(1.0 + exp(-($zfin))), 6) AS score
           |  FROM feat),
           |cm AS (
           |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
           |         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
           |           AS n_pos,
           |         CAST(sum(CASE WHEN score >= 0.5 AND pos
           |                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           |         CAST(sum(CASE WHEN score >= 0.5 AND NOT pos
           |                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           |         CAST(sum(CASE WHEN score < 0.5 AND NOT pos
           |                       THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           |         CAST(sum(CASE WHEN score < 0.5 AND pos
           |                       THEN 1 ELSE 0 END) AS BIGINT) AS fn
           |  FROM scored),
           |grp AS (
           |  SELECT score, count(*) AS c,
           |         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pc
           |  FROM scored GROUP BY 1),
           |cum AS (
           |  SELECT c, pc,
           |         coalesce(sum(c) OVER (ORDER BY score
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |           AS below
           |  FROM grp),
           |r AS (SELECT sum(pc * (2 * below + c + 1)) AS r2 FROM cum)
           |SELECT n_docs, n_pos, tp, fp, tn, fn,
           |       round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS prec,
           |       round(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
           |       round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 6)
           |         AS f1,
           |       round(CAST(tp + tn AS DOUBLE) / n_docs, 6) AS accuracy,
           |       round(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE)
           |             / CAST(2 * n_pos * (n_docs - n_pos) AS DOUBLE), 6)
           |         AS auc
           |FROM cm CROSS JOIN r""".stripMargin
      }
    ),

    // classifier CALIBRATION (reliability diagram data): does "score 0.7"
    // mean 70% of such docs are really positive? Scores floor-quantized
    // into tenth-wide bins (floor, never round — the one quantizer both
    // engines compute identically at bin boundaries), per bin the mean
    // predicted score vs the empirical positive rate. The empirical rate
    // is one integer division; the mean prediction is a float sum under
    // round6's sub-ulp policy. One hash aggregate over the scored frame.
    "text_classifier_calibration" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val (w, p0, y) = clfScaffold(docs)
        val p = round(p0, 6)
        docs.select(p.as("score"), (y === 1.0).as("pos"))
          .groupBy(floor(col("score") * 10).cast("long").as("bin"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("score")) / count(lit(1)), 6).as("mean_score"),
            round(sum(when(col("pos"), 1L).otherwise(0L)).cast("double") /
              count(lit(1)), 6).as("pos_rate"))
      },
      oracle = Some {
        val (chain, zfin) = (clfChain, clfZfin)
        s"""WITH ${clfFeatCte()},
           |$chain,
           |scored AS (
           |  SELECT round(1.0/(1.0 + exp(-($zfin))), 6) AS score,
           |         (y = 1.0) AS pos
           |  FROM feat)
           |SELECT CAST(floor(score * 10) AS BIGINT) AS bin,
           |       CAST(count(*) AS BIGINT) AS n,
           |       round(sum(score) / count(*), 6) AS mean_score,
           |       round(CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE)
           |             / count(*), 6) AS pos_rate
           |FROM scored GROUP BY 1""".stripMargin
      }
    ),

    // precision–recall curve (threshold sweep): at every DISTINCT rounded
    // score s, the operating point of the rule "keep iff score ≥ s" —
    // tp/fp as cumulative integer sums over score groups ordered
    // descending, precision/recall as single divisions of those integers.
    // The artifact threshold tuning actually reads; row count is bounded
    // by distinct 6-dp scores (≤10⁶), never the corpus. Same trained
    // weights as the eval row, so the curve and the point metrics are
    // differentially consistent.
    "text_classifier_pr_curve" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val (w, p0, y) = clfScaffold(docs)
        val p = round(p0, 6)
        val grp = docs.select(p.as("score"), (y === 1.0).as("pos"))
          .groupBy("score").agg(count(lit(1)).as("c"),
            sum(when(col("pos"), 1L).otherwise(0L)).as("pc"))
        val wd = Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val np = grp.agg(sum("pc")).head.getLong(0) // one long of driver state
        grp.select(col("score").as("threshold"),
          sum(col("pc")).over(wd).as("tp"),
          (sum(col("c")).over(wd) - sum(col("pc")).over(wd)).as("fp"))
          .select(col("threshold"), col("tp"), col("fp"),
            round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
              .as("prec"),
            round(col("tp").cast("double") / lit(np), 6).as("recall"))
      },
      oracle = Some {
        val (chain, zfin) = (clfChain, clfZfin)
        s"""WITH ${clfFeatCte()},
           |$chain,
           |scored AS (
           |  SELECT round(1.0/(1.0 + exp(-($zfin))), 6) AS score,
           |         (y = 1.0) AS pos
           |  FROM feat),
           |grp AS (
           |  SELECT score, count(*) AS c,
           |         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS pc
           |  FROM scored GROUP BY 1),
           |np AS (SELECT sum(pc) AS np FROM grp),
           |cum AS (
           |  SELECT score AS threshold,
           |         sum(pc) OVER (ORDER BY score DESC
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |           AS tp,
           |         sum(c) OVER (ORDER BY score DESC
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |           AS cm
           |  FROM grp)
           |SELECT threshold, CAST(tp AS BIGINT) AS tp,
           |       CAST(cm - tp AS BIGINT) AS fp,
           |       round(CAST(tp AS DOUBLE) / cm, 6) AS prec,
           |       round(CAST(tp AS DOUBLE) / (SELECT np FROM np), 6)
           |         AS recall
           |FROM cum""".stripMargin
      }
    ),

    // Zipf's-law fit over the rank–frequency curve: OLS of log10(freq) on
    // log10(rank) for the top-100 terms (total order: count desc, token) —
    // slope ≈ −1 is the healthy-corpus signature; a flat slope or low r²
    // flags template/boilerplate-dominated text. Scale shape: one hash agg
    // to term counts, a TakeOrdered top-100 (never a global sort), then
    // the window + OLS run on the bounded 100-row frame. Float sums obey
    // round6's sub-ulp policy (same as text_entropy).
    "text_zipf_fit" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val tf = Tables.documents(s, dir)
          .select(explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(count(lit(1)).as("n"))
        // bounded frame: the window ranks the 100 surviving rows only
        val top = tf.orderBy(desc("n"), col("token")).limit(100)
          .withColumn("r",
            row_number().over(Window.orderBy(desc("n"), col("token"))))
        val pt = top.select(log10(col("r").cast("double")).as("x"),
          log10(col("n").cast("double")).as("y"))
        val st = pt.agg(count(lit(1)).cast("double").as("k"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        val slope = (col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx"))
        val icept = (col("sy") - slope * col("sx")) / col("k")
        val r2num = (col("k") * col("sxy") - col("sx") * col("sy")) *
          (col("k") * col("sxy") - col("sx") * col("sy"))
        val r2den = (col("k") * col("sxx") - col("sx") * col("sx")) *
          (col("k") * col("syy") - col("sy") * col("sy"))
        st.select(col("k").cast("long").as("n_terms"),
          round(slope, 6).as("slope"), round(icept, 6).as("intercept"),
          round(r2num / r2den, 6).as("r2"))
      },
      oracle = Some(
        s"""WITH tf AS (
           |  SELECT token, count(*) AS n
           |  FROM (SELECT unnest($toksSql) AS token FROM documents) t
           |  GROUP BY 1),
           |top AS (
           |  SELECT n, row_number() OVER (ORDER BY n DESC, token) AS r
           |  FROM tf ORDER BY n DESC, token LIMIT 100),
           |pt AS (SELECT log10(CAST(r AS DOUBLE)) AS x,
           |              log10(CAST(n AS DOUBLE)) AS y FROM top),
           |s AS (SELECT CAST(count(*) AS DOUBLE) AS k,
           |             sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
           |             sum(y*y) AS syy, sum(x*y) AS sxy FROM pt)
           |SELECT CAST(k AS BIGINT) AS n_terms,
           |       round((k*sxy - sx*sy) / (k*sxx - sx*sx), 6) AS slope,
           |       round((sy - (k*sxy - sx*sy) / (k*sxx - sx*sx) * sx) / k, 6)
           |         AS intercept,
           |       round((k*sxy - sx*sy) * (k*sxy - sx*sy)
           |             / ((k*sxx - sx*sx) * (k*syy - sy*sy)), 6) AS r2
           |FROM s""".stripMargin)
    ),

    // overlapping context-window chunking (128-token windows, 32 overlap):
    // map-side only, no shuffle — the long-doc half of sequence prep
    "text_chunks" -> QueryDef(
      build = (s, dir) => graft.operators.SequencePrep.chunkTokens(
        Tables.documents(s, dir), chunkTokens = 128, overlap = 32),
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |c AS (
           |  SELECT doc_id, toks,
           |         unnest(range(0, CAST(ceil(greatest(len(toks) - 32, 1) / 96.0) AS BIGINT))) AS chunk_idx
           |  FROM t WHERE len(toks) > 0)
           |SELECT doc_id, chunk_idx,
           |       len(toks[chunk_idx * 96 + 1 : chunk_idx * 96 + 128]) AS n_tokens,
           |       toks[chunk_idx * 96 + 1] AS first_token
           |FROM c""".stripMargin)
    ),

    // TF-IDF top terms per document (corpus-wide df, ln(N/df) idf; rank on
    // the 6-dp-rounded score so the cut is engine-stable). One shuffle for
    // tf, one broadcast-sized df dimension, window over per-doc groups.
    "text_tfidf_top" -> QueryDef(
      build = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, dir)
        val tok = docs.select(col("doc_id"),
          explode(tokens(col("text"))).as("token"))
        val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n"))
        val scored = tf.join(df, "token").crossJoin(broadcast(n))
          .withColumn("tfidf",
            round(col("tf") * log(col("n").cast("double") / col("df")), 6))
        val w = Window.partitionBy("doc_id")
          .orderBy(desc("tfidf"), col("token"))
        scored.filter(col("doc_id") < 50)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
          .select(col("doc_id"), col("rank").cast("long").as("rank"),
            col("token"), col("tfidf"))
      },
      oracle = Some(
        s"""WITH tok AS (
           |  SELECT doc_id, unnest($toksSql) AS token FROM documents),
           |tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
           |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
           |n AS (SELECT count(*) AS n FROM documents),
           |scored AS (
           |  SELECT doc_id, token,
           |         round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS tfidf
           |  FROM tf JOIN df USING (token) CROSS JOIN n)
           |SELECT doc_id,
           |       CAST(row_number() OVER (PARTITION BY doc_id
           |            ORDER BY tfidf DESC, token) AS BIGINT) AS rank,
           |       token, tfidf
           |FROM scored
           |WHERE doc_id < 50
           |QUALIFY rank <= 3""".stripMargin)
    ),

    "text_stats" -> QueryDef(
      build = (s, dir) => {
        val toks = tokens(col("text"))
        round6(Tables.documents(s, dir).select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars"),
          tokenCount(toks).cast("long").as("n_tokens"),
          distinctTokenCount(toks).cast("long").as("n_distinct"),
          (tokenLenSum(toks).cast("double") /
            nullif(tokenCount(toks).cast("double"), lit(0.0))).as("avg_token_len"),
          (distinctTokenCount(toks).cast("double") /
            nullif(tokenCount(toks).cast("double"), lit(0.0))).as("type_token_ratio")))
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
           |SELECT doc_id,
           |       CAST(length(text) AS BIGINT) AS n_chars,
           |       CAST(len(toks) AS BIGINT) AS n_tokens,
           |       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           |       round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           |             / nullif(CAST(len(toks) AS DOUBLE), 0.0), 6) AS avg_token_len,
           |       round(CAST(len(list_distinct(toks)) AS DOUBLE)
           |             / nullif(CAST(len(toks) AS DOUBLE), 0.0), 6) AS type_token_ratio
           |FROM t""".stripMargin),
      headline = true
    ),

    "text_lang_id" -> QueryDef(
      build = (s, dir) => Tables.documents(s, dir)
        .select(col("lang"), predictedLang(tokens(col("text"))).as("predicted"))
        .groupBy("lang", "predicted").agg(count(lit(1)).as("n")),
      oracle = Some(
        s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
           |scored AS (SELECT lang, $scoresSql FROM t)
           |SELECT lang, $predictedSql AS predicted, count(*) AS n
           |FROM scored GROUP BY 1, 2""".stripMargin)
    ),

    "text_quality" -> QueryDef(
      build = (s, dir) => {
        val toks = tokens(col("text"))
        round6(Tables.documents(s, dir).select(
          col("doc_id"),
          qualityScore(toks).as("quality")))
      },
      oracle = Some {
        val allStop = sqlList(stopwords.flatMap(_._2))
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |m AS (SELECT doc_id,
           |             CAST(len(toks) AS DOUBLE) AS n,
           |             CAST(len(list_filter(toks, t -> list_contains($allStop, t))) AS DOUBLE) AS sw,
           |             CAST(len(list_distinct(toks)) AS DOUBLE) AS dn
           |      FROM t)
           |SELECT doc_id,
           |       round(0.5 * coalesce(sw / nullif(n, 0.0), 0.0)
           |           + 0.3 * coalesce(dn / nullif(n, 0.0), 0.0)
           |           + 0.2 * least(1.0, n / 100.0), 6) AS quality
           |FROM m""".stripMargin
      }
    ),

    // character-entropy compressibility signal (the oracle-able proxy
    // for the deflate-ratio junk filter: repetitive boilerplate has low
    // entropy, natural text sits near 4 bits/char): H = log2(n) −
    // (Σ c·log2 c)/n from exact integer char counts — one char explode
    // + two hash aggregates; the only floats are the per-group log2
    // terms, summed under round6's sub-ulp policy.
    "text_entropy" -> QueryDef(
      build = (s, dir) => {
        val chars = org.apache.spark.sql.functions.filter(
          split(col("text"), "(?!^)"), s => s =!= "")
        val perChar = Tables.documents(s, dir)
          .select(col("doc_id"), explode(chars).as("ch"))
          .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
        round6(perChar.groupBy("doc_id")
          .agg(sum(col("c")).as("n_chars"),
            count(lit(1)).as("distinct_chars"),
            sum(col("c").cast("double") * log2(col("c").cast("double")))
              .as("_s"))
          .select(col("doc_id"), col("n_chars"), col("distinct_chars"),
            (log2(col("n_chars").cast("double")) -
              col("_s") / col("n_chars").cast("double"))
              .as("entropy_bits")))
      },
      oracle = Some(
        """WITH ch AS (
          |  SELECT doc_id, unnest(string_split(text, '')) AS c
          |  FROM documents WHERE length(text) > 0),
          |pc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY 1, 2)
          |SELECT doc_id,
          |       CAST(sum(n) AS BIGINT) AS n_chars,
          |       CAST(count(*) AS BIGINT) AS distinct_chars,
          |       round(log2(CAST(sum(n) AS DOUBLE))
          |             - sum(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE)))
          |               / CAST(sum(n) AS DOUBLE), 6) AS entropy_bits
          |FROM pc GROUP BY doc_id""".stripMargin)
    ),

    // BPE merge training (the tokenizer-construction step): ONE corpus
    // pass builds the word-frequency frame, then 12 merge iterations run
    // on that vocabulary-sized frame — the industrial trainer structure,
    // distributed. Oracled by 12 unrolled MATERIALIZED-CTE blocks (the
    // X215 LogReg replay discipline applied to a discrete recurrence):
    // the total-order argmax tie-break makes the merge sequence a pure
    // function of the corpus, and exact integer pair counts make the
    // replay bit-stable with no rounding needed. BpeSpec additionally
    // gates the hand-computed fixture, greedy overlap handling, and the
    // non-increasing-count invariant.
    "text_bpe_train" -> QueryDef(
      build = (s, dir) => graft.operators.Bpe.trainOnCorpus(
        Tables.documents(s, dir), "text", k = 12),
      oracle = Some(graft.operators.Bpe.trainOracleSql(12, toksSql))
    ),

    // WordPiece merge training (BERT's tokenizer — the third family next
    // to BPE's raw pair frequency and unigram's EM pruning): same greedy
    // loop, but the argmax is the likelihood ratio c/(f_l·f_r) — pairs
    // that PREDICT each other beat pairs that are merely common — and
    // symbols carry the ## continuation prefix. The score is exact
    // integers pushed through identically-spelled IEEE double casts, so
    // the chained argmaxes replay as unrolled MATERIALIZED CTEs like
    // BPE's, plus one symbol-frequency CTE per round.
    "text_wordpiece_train" -> QueryDef(
      build = (s, dir) => graft.operators.Wordpiece.trainOnCorpus(
        Tables.documents(s, dir), "text", k = 10),
      oracle = Some(graft.operators.Wordpiece.trainOracleSql(10, toksSql))
    ),

    // WordPiece ENCODE under the frozen piece list (the 10 pieces the
    // trainer learns at sf0.001, shipped fixed like the BPE merges and
    // unigram vocab): longest-match-first per position, single chars the
    // implicit coverage floor, over-long tokens per-char fallback. Pure
    // map-side fold + one hash aggregate — zero shuffle before the
    // doc-grain agg; the oracle replays max-munch over DISTINCT tokens
    // as maxWordLen chained one-position CTEs.
    "text_wordpiece_encode" -> QueryDef(
      build = (s, dir) => graft.operators.Wordpiece.encodeStats(
        Tables.documents(s, dir), "text", "doc_id", wordpiecePieces,
        maxWordLen = 12),
      oracle = Some(graft.operators.Wordpiece.encodeOracleSql(
        wordpiecePieces, maxWordLen = 12, toksSql = toksSql))
    ),

    // WordPiece fertility by language — the third leg of the per-lang
    // chars-per-piece eval next to text_bpe_fertility and
    // text_unigram_fertility, making the tokenizer bake-off three-way.
    "text_wordpiece_fertility" -> QueryDef(
      build = (s, dir) => graft.operators.Wordpiece.fertilityByGroup(
        Tables.documents(s, dir), "text", "lang", wordpiecePieces,
        maxWordLen = 12),
      oracle = Some(graft.operators.Wordpiece.fertilityOracleSql(
        wordpiecePieces, "lang", maxWordLen = 12, toksSql = toksSql))
    ),

    // BPE ENCODE with a fixed merge list (the inference half — merges
    // ship with a production tokenizer, which also keeps this
    // SQL-oracle-able where training's chained argmaxes are not): pure
    // map-side greedy fold per token + one hash aggregate. The oracle
    // replays the SAME ordered merges as chained non-overlapping
    // replaces over delimiter-wrapped chars — generated from one list,
    // so the engines cannot drift.
    "text_bpe_encode" -> QueryDef(
      build = (s, dir) => graft.operators.Bpe.encodeStats(
        Tables.documents(s, dir), "text", "doc_id", bpeMerges),
      oracle = Some(
        graft.operators.Bpe.encodeOracleSql(bpeMerges, toksSql))
    ),

    // tokenizer fertility by language (the multilingual-fairness eval):
    // chars-per-symbol under the same fixed merge list, per lang — a
    // tokenizer trained on one language's statistics fragments the
    // others into more symbols. Same greedy fold as text_bpe_encode at
    // lang grain; exact integer tallies, one division per group.
    "text_bpe_fertility" -> QueryDef(
      build = (s, dir) => graft.operators.Bpe.fertilityByGroup(
        Tables.documents(s, dir), "text", "lang", bpeMerges),
      oracle = Some(graft.operators.Bpe.fertilityOracleSql(
        bpeMerges, "lang", toksSql))
    ),

    // Unigram-LM tokenizer training (SentencePiece's other half, next to
    // text_bpe_train): substring-seeded vocabulary, then 2 hard-EM
    // (Viterbi-EM) rounds on the distinct-word frame — integer-quantized
    // log-prob scores make every DP sum exact, so the whole recurrence
    // replays as unrolled MATERIALIZED-CTE blocks (per-position DP +
    // back-trace instead of BPE's per-merge argmax). UnigramSpec gates
    // the quantization, DP tie-breaks, fallback, closure, and
    // partition-invariance.
    "text_unigram_train" -> QueryDef(
      build = (s, dir) => graft.operators.Unigram.train(
        Tables.documents(s, dir), "text", maxPieceLen = 4,
        maxWordLen = 12, seedMulti = 40, vocabMulti = 20, rounds = 2),
      oracle = Some(graft.operators.Unigram.trainOracleSql(
        maxPieceLen = 4, maxWordLen = 12, seedMulti = 40,
        vocabMulti = 20, rounds = 2, toksSql = toksSql))
    ),

    // unigram ENCODE with the frozen vocabulary (the inference half):
    // pure map-side Viterbi expression per token + one hash aggregate;
    // uncoverable or over-long tokens fall back to per-char pieces. The
    // oracle replays the DP over DISTINCT tokens (piece COUNT carried in
    // the DP state — no back-trace needed) and joins back per doc.
    "text_unigram_encode" -> QueryDef(
      build = (s, dir) => graft.operators.Unigram.encodeStats(
        Tables.documents(s, dir), "text", "doc_id", unigramVocab,
        maxPieceLen = 4, maxWordLen = 12),
      oracle = Some(graft.operators.Unigram.encodeOracleSql(
        unigramVocab, maxPieceLen = 4, maxWordLen = 12, toksSql = toksSql))
    ),

    // unigram fertility by language — the BPE fertility eval's twin
    // under the unigram vocabulary, enabling the chars-per-piece
    // comparison between the two trained tokenizers at lang grain.
    "text_unigram_fertility" -> QueryDef(
      build = (s, dir) => graft.operators.Unigram.fertilityByGroup(
        Tables.documents(s, dir), "text", "lang", unigramVocab,
        maxPieceLen = 4, maxWordLen = 12),
      oracle = Some(graft.operators.Unigram.fertilityOracleSql(
        unigramVocab, "lang", maxPieceLen = 4, maxWordLen = 12,
        toksSql = toksSql))
    ),

    // the tokenizer bake-off: BPE-vs-unigram fertility per language in
    // ONE corpus pass — both per-token symbol counts are map-side
    // expressions over the same exploded token, so the comparison costs
    // one scan + one aggregate (not two single-tokenizer scans).
    "text_tokenizer_compare" -> QueryDef(
      build = (s, dir) => graft.operators.Unigram.compareFertility(
        Tables.documents(s, dir), "text", "lang", bpeMerges, unigramVocab,
        maxPieceLen = 4, maxWordLen = 12),
      oracle = Some(graft.operators.Unigram.compareFertilityOracleSql(
        bpeMerges, unigramVocab, "lang", maxPieceLen = 4,
        maxWordLen = 12, toksSql = toksSql))
    ),

    // vocabulary coverage / OOV rate per source — the tokenizer-fit
    // signal corpus mixing reads: build the top-100 corpus vocabulary
    // (occurrence count desc, term asc — fully deterministic at the
    // boundary), then one token-mass pass with the vocab BROADCAST.
    // Exact integer token tallies, ONE division per source — never an
    // average of per-doc fractions, whose summation order would differ
    // between engines.
    "text_oov_rate" -> QueryDef(
      build = (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
        val vocab = toks.groupBy("tok").agg(count(lit(1)).as("_c"))
          .orderBy(col("_c").desc, col("tok").asc).limit(100)
          .select(col("tok"), lit(1).as("_inv"))
        round6(toks
          .join(broadcast(vocab), Seq("tok"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("total_tokens"),
            sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("oov_tokens"))
          .select(col("source"), col("total_tokens"), col("oov_tokens"),
            (col("oov_tokens").cast("double") /
              col("total_tokens").cast("double")).as("oov_rate")))
      },
      oracle = Some(
        s"""WITH tok AS (SELECT source, unnest($toksSql) AS tok
           |             FROM documents),
           |vocab AS (SELECT tok FROM tok GROUP BY tok
           |          ORDER BY count(*) DESC, tok ASC LIMIT 100)
           |SELECT source,
           |       CAST(count(*) AS BIGINT) AS total_tokens,
           |       CAST(sum(CASE WHEN tok NOT IN (SELECT tok FROM vocab)
           |                     THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
           |       round(CAST(sum(CASE WHEN tok NOT IN (SELECT tok FROM vocab)
           |                          THEN 1 ELSE 0 END) AS DOUBLE)
           |             / count(*), 6) AS oov_rate
           |FROM tok GROUP BY source""".stripMargin)
    ),

    // quality-threshold tuning curve: survivor docs and retained tokens
    // at each candidate cutoff, in ONE scan — a wide aggregate of
    // per-threshold conditional sums restacked to rows (the data is
    // never expanded threshold-fold; the oracle's cross join is the
    // oracle's own business). The boundary compare is safe because
    // text_quality's hash match proves q is bit-identical on both
    // engines.
    "text_quality_sweep" -> QueryDef(
      build = (s, dir) => {
        val th = Seq(0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8)
        val toks = tokens(col("text"))
        val base = Tables.documents(s, dir).select(
          qualityScore(toks).as("q"), tokenCount(toks).cast("long").as("nt"))
        val aggs = th.zipWithIndex.flatMap { case (t, i) => Seq(
          sum(when(col("q") >= t, 1L).otherwise(0L)).as(s"_n$i"),
          sum(when(col("q") >= t, col("nt")).otherwise(0L)).as(s"_t$i")) }
        val wide = base.agg(aggs.head, aggs.tail: _*)
        val rows = th.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("threshold"), col(s"_n$i").as("n_docs"),
            col(s"_t$i").as("n_tokens")) }
        round6(wide.select(explode(array(rows: _*)).as("r")).select("r.*"))
      },
      oracle = Some {
        val allStop = sqlList(stopwords.flatMap(_._2))
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |m AS (SELECT CAST(len(toks) AS DOUBLE) AS n,
           |             CAST(len(toks) AS BIGINT) AS nt,
           |             CAST(len(list_filter(toks,
           |               t -> list_contains($allStop, t))) AS DOUBLE) AS sw,
           |             CAST(len(list_distinct(toks)) AS DOUBLE) AS dn
           |      FROM t),
           |q AS (SELECT 0.5 * coalesce(sw / nullif(n, 0.0), 0.0)
           |           + 0.3 * coalesce(dn / nullif(n, 0.0), 0.0)
           |           + 0.2 * least(1.0, n / 100.0) AS q, nt
           |      FROM m),
           |th AS (SELECT unnest([0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8])
           |         AS threshold)
           |SELECT threshold,
           |       CAST(count(*) FILTER (q.q >= threshold) AS BIGINT)
           |         AS n_docs,
           |       CAST(coalesce(sum(nt) FILTER (q.q >= threshold), 0)
           |            AS BIGINT) AS n_tokens
           |FROM th CROSS JOIN q GROUP BY threshold""".stripMargin
      }
    ),

    // token-count estimators: whitespace tokens, BPE-ish regex pieces
    // (runs of letters / digits / single other symbol), chars/4 heuristic
    "text_token_estimate" -> QueryDef(
      build = (s, dir) => round6(Tables.documents(s, dir).select(
        col("doc_id"),
        tokenCount(tokens(col("text"))).cast("long").as("ws_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
          .cast("long").as("re_pieces"),
        ceil(length(col("text")) / 4.0).cast("long").as("est_chars4"))),
      oracle = Some(
        s"""SELECT doc_id,
           |       CAST(len($toksSql) AS BIGINT) AS ws_tokens,
           |       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS re_pieces,
           |       CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_chars4
           |FROM documents""".stripMargin)
    ),

    "text_fingerprint" -> QueryDef(
      build = (s, dir) => Tables.documents(s, dir).select(
        col("doc_id"),
        fingerprint(col("text")).as("fp"),
        rollingFingerprint(tokens(col("text"))).as("rolling_fp")),
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents)
           |SELECT doc_id,
           |       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
           |       list_reduce(
           |         list_prepend(CAST(0 AS BIGINT),
           |           list_transform(toks,
           |             x -> ('0x' || substring(md5(x), 1, 15))::BIGINT)),
           |         (a, b) -> (a * 131 + b) % 1000000007) AS rolling_fp
           |FROM t""".stripMargin)
    ),

    // CCNet-style LM quality score: word-bigram model with add-one
    // smoothing trained on the doc_id%5==0 reference slice, every other
    // doc scored by mean log₂ likelihood ([[graft.operators.LmScore]]).
    // Counts and vocab are exact integers on both engines; the only float
    // work is the per-bigram log/divide and the per-doc mean, rounded
    // 6 dp (log2 differs ≤1 ulp per term across libm implementations —
    // ~1e-13 on a ~10-magnitude score, far under the rounding).
    "text_lm_score" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val c = col("doc_id")
        graft.operators.LmScore.bigramLogLikelihood(
            docs.filter(c % 5 =!= 0), docs.filter(c % 5 === 0))
          .select(col("doc_id"), col("n_bigrams"),
            round(col("score"), 6).as("score"))
      },
      oracle = Some(
        s"""WITH ${OracleSnippets.lmScoreCtes}
           |SELECT doc_id, n_bigrams, score FROM sc""".stripMargin)
    ),

    // BM25 ranked retrieval (Lucene-flavored idf, k1=1.2 b=0.75) for a
    // fixed query-term set — the classic retrieval scorer a curation
    // pipeline uses to probe eval-set leakage and topical quality. Model
    // = two vocabulary/corpus-sized aggregates (df per term, avg doc
    // length); scoring touches only postings of the query terms (an
    // IN-filter before the join — the inverted-index access path); top-50
    // cut on the (rounded score, doc_id) total order in both engines.
    "text_bm25" -> QueryDef(
      build = (s, dir) => {
        val terms = Seq("spark", "join", "stream")
        val k1 = 1.2; val b = 0.75
        val docs = Tables.documents(s, dir)
        val tok = explode(tokens(col("text"))).as("t")
        val lens = docs.select(col("doc_id"), tok)
          .groupBy("doc_id").agg(count(lit(1)).as("len"))
        val stats = lens.agg(count(lit(1)).cast("double").as("nd"),
          sum(col("len")).cast("double").as("total_len"))
        val tf = docs.select(col("doc_id"), tok)
          .filter(col("t").isin(terms: _*))
          .groupBy("doc_id", "t").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
        val idf = log((col("nd") - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)) + lit(1.0))
        val avgLen = col("total_len") / col("nd")
        val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) +
              lit(b) * col("len").cast("double") / avgLen))
        tf.join(dfreq, "t").join(lens, "doc_id")
          .crossJoin(broadcast(stats))
          .select(col("doc_id"), (idf * tfNorm).as("ts"))
          .groupBy("doc_id")
          .agg(round(sum(col("ts")), 6).as("score"))
          .orderBy(desc("score"), col("doc_id"))
          .limit(50)
      },
      oracle = Some(
        s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
           |lens AS (SELECT doc_id, count(*) AS len FROM tk GROUP BY 1),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
           |              CAST(sum(len) AS DOUBLE) AS total_len FROM lens),
           |tf AS (SELECT doc_id, t, count(*) AS tf FROM tk
           |       WHERE t IN ('spark', 'join', 'stream') GROUP BY 1, 2),
           |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
           |term AS (
           |  SELECT tf.doc_id,
           |         ln((st.nd - df + 0.5) / (df + 0.5) + 1.0)
           |           * ((tf * CAST(2.2 AS DOUBLE))
           |              / (tf + 1.2 * ((1.0 - 0.75)
           |                 + 0.75 * lens.len / (st.total_len / st.nd))))
           |           AS ts
           |  FROM tf JOIN dfreq ON tf.t = dfreq.t
           |          JOIN lens ON tf.doc_id = lens.doc_id
           |          CROSS JOIN st)
           |SELECT doc_id, round(sum(ts), 6) AS score
           |FROM term GROUP BY doc_id
           |ORDER BY score DESC, doc_id LIMIT 50""".stripMargin)
    ),

    // per-document novelty: KL(doc unigram ‖ corpus unigram), add-one
    // smoothed on both sides — the distribution-level outlier screen
    // (template spam scores ~0, off-topic/wrong-register docs score
    // high) that complements the bigram LM's fluency view. Model = ONE
    // vocabulary-sized corpus aggregate; scoring = explode + equi-join +
    // per-doc agg; counts exact, floats only in per-term p·log2(p/q)
    // under round6's sub-ulp policy.
    "text_novelty_kl" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val tok = explode(tokens(col("text"))).as("t")
        val docTf = docs.select(col("doc_id"), tok)
          .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
        val docLen = docTf.groupBy("doc_id").agg(sum(col("c")).as("n"))
        val corpTf = docs.select(tok)
          .groupBy("t").agg(count(lit(1)).as("cc"))
        val totals = corpTf.agg(sum(col("cc")).as("nn"),
          count(lit(1)).as("v"))
        val p = (col("c").cast("double") + lit(1.0)) /
          (col("n").cast("double") + col("v").cast("double"))
        val q = (col("cc").cast("double") + lit(1.0)) /
          (col("nn").cast("double") + col("v").cast("double"))
        graft.QueryDef.round6(docTf
          .join(docLen, "doc_id")
          .join(corpTf, "t") // every doc term is in the corpus by definition
          .crossJoin(broadcast(totals))
          .select(col("doc_id"), (p * log2(p / q)).as("term_kl"))
          .groupBy("doc_id")
          .agg(sum(col("term_kl")).as("kl")))
      },
      oracle = Some(
        s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS t FROM documents),
           |dtf AS (SELECT doc_id, t, count(*) AS c FROM tk GROUP BY 1, 2),
           |dl AS (SELECT doc_id, sum(c) AS n FROM dtf GROUP BY 1),
           |ctf AS (SELECT t, count(*) AS cc FROM tk GROUP BY 1),
           |tot AS (SELECT sum(cc) AS nn, count(*) AS v FROM ctf),
           |term AS (
           |  SELECT dtf.doc_id,
           |         ((dtf.c + 1.0) / (dl.n + tot.v))
           |           * log2(((dtf.c + 1.0) / (dl.n + tot.v))
           |                  / ((ctf.cc + 1.0) / (tot.nn + tot.v))) AS term_kl
           |  FROM dtf
           |  JOIN dl ON dtf.doc_id = dl.doc_id
           |  JOIN ctf ON dtf.t = ctf.t
           |  CROSS JOIN tot)
           |SELECT doc_id, round(sum(term_kl), 6) AS kl
           |FROM term GROUP BY doc_id""".stripMargin)
    ),

    // Kneser–Ney interpolated bigram scoring — the standard upgrade over
    // text_lm_score's add-one model: absolute discount, freed mass backing
    // off to the CONTINUATION distribution (distinct-predecessor counts,
    // not raw unigram frequency). All model quantities are exact integer
    // counts; same train/test split as text_lm_score.
    "text_lm_kneser_ney" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val c = col("doc_id")
        graft.operators.LmScore.kneserNeyLogLikelihood(
            docs.filter(c % 5 =!= 0), docs.filter(c % 5 === 0))
          .select(col("doc_id"), col("n_bigrams"),
            round(col("score"), 6).as("score"))
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |i AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t),
           |bg AS (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg,
           |              toks[i] AS head, toks[i + 1] AS w2
           |       FROM i),
           |refbg AS (SELECT bg, head, w2, count(*) AS c_bg FROM bg
           |          WHERE doc_id % 5 = 0 GROUP BY 1, 2, 3),
           |hs AS (SELECT head, sum(c_bg) AS c_head, count(*) AS n1p
           |       FROM refbg GROUP BY 1),
           |cs AS (SELECT w2, count(*) AS cont FROM refbg GROUP BY 1),
           |tot AS (SELECT (SELECT count(*) FROM refbg) AS n_types,
           |               (SELECT count(DISTINCT tok) FROM
           |                  (SELECT unnest(toks) AS tok FROM t
           |                   WHERE doc_id % 5 = 0)) AS v),
           |lp AS (
           |  SELECT b.doc_id,
           |         log2(CASE WHEN coalesce(hs.c_head, 0) > 0 THEN
           |           greatest(coalesce(rb.c_bg, 0) - 0.75, 0.0) / hs.c_head
           |           + 0.75 * coalesce(hs.n1p, 0) / hs.c_head
           |             * ((coalesce(cs.cont, 0) + 1.0)
           |                / (tot.n_types + tot.v + 1.0))
           |         ELSE (coalesce(cs.cont, 0) + 1.0)
           |              / (tot.n_types + tot.v + 1.0) END) AS lp
           |  FROM bg b
           |  LEFT JOIN refbg rb ON b.bg = rb.bg
           |  LEFT JOIN hs ON b.head = hs.head
           |  LEFT JOIN cs ON b.w2 = cs.w2
           |  CROSS JOIN tot
           |  WHERE b.doc_id % 5 <> 0)
           |SELECT doc_id, count(*) AS n_bigrams,
           |       round(sum(lp) / count(*), 6) AS score
           |FROM lp GROUP BY doc_id""".stripMargin)
    ),

    // Unicode NFC canonicalization — the pass BEFORE any fingerprint/
    // shingle/dedup step: decomposed sequences ("e"+U+0301) and their
    // precomposed forms ("é") are byte-distinct to md5/MinHash but the
    // same text. The corpus is synthetic ASCII (already NFC), so the
    // signal is injected deterministically: every 'e' becomes the
    // DECOMPOSED "e"+combining-acute in both engines, then both NFC-
    // normalize (codegen'd NormalizeExpr vs DuckDB nfc_normalize) — char
    // counts shrink per-'e' and the md5 pins the recomposition
    // byte-for-byte. Already-normalized input short-circuits inside the
    // expression (no UTF-16 re-encode), which is the 100 TB fast path.
    "text_normalize" -> QueryDef(
      build = (s, dir) => {
        graft.plans.GraftFunctions.register(s)
        val combiningAcute = "\u0301" // U+0301, kept as an escape so no editor can silently recompose it
        val raw = regexp_replace(col("text"), "e", "e" + combiningAcute)
        val nfc = call_function("graft_normalize", raw, lit("NFC"))
        Tables.documents(s, dir).select(
          col("doc_id"),
          length(raw).as("chars_raw"),
          length(nfc).as("chars_nfc"),
          md5(nfc).as("nfc_md5"))
      },
      oracle = Some(
        """WITH t AS (
          |  SELECT doc_id,
          |         regexp_replace(text, 'e', 'e' || chr(769), 'g') AS raw
          |  FROM documents)
          |SELECT doc_id,
          |       length(raw) AS chars_raw,
          |       length(nfc_normalize(raw)) AS chars_nfc,
          |       md5(nfc_normalize(raw)) AS nfc_md5
          |FROM t""".stripMargin)
    ),

    // PII/URL scrubbing — the pre-training redaction pass. Deterministic
    // per-doc email+URL suffixes are appended so the signal exists in any
    // corpus; both engines then scrub with the SAME patterns (Java regex /
    // RE2 common subset) and the md5 of the scrubbed text pins the result
    // byte-for-byte
    "text_scrub" -> QueryDef(
      build = (s, dir) => {
        val aug = concat(col("text"), lit(" user"),
          col("doc_id").cast("string"),
          lit("@mail.example.com see https://ex.org/p/"),
          col("doc_id").cast("string"), lit("?q=1"))
        val noUrl = regexp_replace(aug, urlPattern, "<URL>")
        val clean = regexp_replace(noUrl, emailPattern, "<EMAIL>")
        Tables.documents(s, dir).select(
          col("doc_id"),
          size(regexp_extract_all(aug, lit(urlPattern), lit(0))).as("n_urls"),
          size(regexp_extract_all(noUrl, lit(emailPattern), lit(0))).as("n_emails"),
          length(clean).as("clean_len"),
          md5(clean).as("clean_md5"))
      },
      oracle = Some(
        s"""WITH a AS (
           |  SELECT doc_id,
           |         text || ' user' || CAST(doc_id AS VARCHAR)
           |           || '@mail.example.com see https://ex.org/p/'
           |           || CAST(doc_id AS VARCHAR) || '?q=1' AS aug
           |  FROM documents),
           |u AS (SELECT doc_id, aug,
           |             regexp_replace(aug, 'https?://\\S+', '<URL>', 'g') AS no_url
           |      FROM a),
           |c AS (SELECT doc_id, aug, no_url,
           |             regexp_replace(no_url,
           |               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
           |               '<EMAIL>', 'g') AS clean
           |      FROM u)
           |SELECT doc_id,
           |       CAST(len(regexp_extract_all(aug, 'https?://\\S+')) AS INT) AS n_urls,
           |       CAST(len(regexp_extract_all(no_url,
           |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
           |       CAST(length(clean) AS INT) AS clean_len,
           |       md5(clean) AS clean_md5
           |FROM c""".stripMargin)
    ),

    // PII detection AUDIT — the measurement half next to text_scrub's
    // rewrite half: per-source counts of emails, shape-vs-RANGE-VALID
    // IPv4s, shape-vs-LUHN-VALID 16-digit cards, and SSN-shaped strings,
    // plus docs-with-validated-PII and findings-per-doc. Deterministic
    // per-doc PII suffixes are appended (ip always, with octet 1 running
    // 0–299 so ~15% are shape-matches-but-invalid; card always, Luhn
    // holding for ~10%; ssn on doc_id%3=0; email on doc_id%2=0) so every
    // class and both validation branches carry signal at any SF. All
    // validation is integer arithmetic — identical in both engines.
    "text_pii_stats" -> QueryDef(
      build = (s, dir) => graft.operators.Pii.piiStats(
        Tables.documents(s, dir).withColumn("text",
          graft.operators.Pii.fixtureAug(col("text"), col("doc_id"))),
        "text", "source"),
      oracle = Some(graft.operators.Pii.statsOracleSql("source",
        graft.operators.Pii.fixtureAugSql)),
      headline = true // the benched PII-audit path (scan-bound, 5.6x at sf1)
    ),

    // Unicode-script composition per language — the routing signal cut
    // BEFORE model-based language ID, and the cheapest mojibake detector
    // (an "other"-share spike is usually encoding damage). The ASCII
    // synthetic corpus gains deterministic per-doc CJK + Cyrillic +
    // digit suffixes so every class carries signal; class counts via the
    // exact length-delta identity, ranges in the Java/RE2-common \x{...}
    // form.
    "text_script_mix" -> QueryDef(
      build = (s, dir) => {
        val id = col("doc_id")
        val aug = concat(col("text"), lit(" "),
          repeat(lit("中文数据处理质量分析")
            .substr((id % 10 + 1).cast("int"), lit(1)), 3),
          lit("данные").substr((id % 5 + 1).cast("int"), lit(1)),
          id.cast("string"))
        graft.operators.ScriptMix.mix(
          Tables.documents(s, dir).withColumn("text", aug), "text", "lang")
      },
      oracle = Some(graft.operators.ScriptMix.mixOracleSql("lang",
        "text || ' ' || repeat(substr('中文数据处理质量分析', CAST(doc_id % 10 + 1 AS INT), 1), 3)" +
          " || substr('данные', CAST(doc_id % 5 + 1 AS INT), 1)" +
          " || CAST(doc_id AS VARCHAR)"))
    ),

    // Gopher-style repetition signals: top-token share and distinct-bigram
    // ratio — the quality features that catch boilerplate/spam before
    // pre-training. Integer counts + round6 ratios on both engines
    "text_repetition" -> QueryDef(
      build = (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
        val bi = ngrams(col("toks"), 2)
        round6(t.select(
          col("doc_id"),
          size(col("toks")).as("n_tokens"),
          maxTokenFreq(col("toks")).as("max_token_freq"),
          coalesce(maxTokenFreq(col("toks")).cast("double") /
            nullif(size(col("toks")).cast("double"), lit(0.0)), lit(0.0))
            .as("top_token_share"),
          coalesce(size(array_distinct(bi)).cast("double") /
            nullif(size(bi).cast("double"), lit(0.0)), lit(1.0))
            .as("distinct_bigram_ratio")))
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |b AS (SELECT doc_id, toks,
           |        CASE WHEN len(toks) >= 2
           |          THEN list_transform(range(1, len(toks)),
           |                 i -> toks[i] || ' ' || toks[i+1])
           |          ELSE CAST([] AS VARCHAR[]) END AS bi
           |      FROM t),
           |m AS (SELECT doc_id,
           |        len(toks) AS n_tokens,
           |        coalesce(list_max(list_transform(list_distinct(toks),
           |          d -> len(list_filter(toks, x -> x = d)))), 0) AS max_token_freq,
           |        bi
           |      FROM b)
           |SELECT doc_id,
           |       CAST(n_tokens AS INT) AS n_tokens,
           |       CAST(max_token_freq AS INT) AS max_token_freq,
           |       round(coalesce(CAST(max_token_freq AS DOUBLE)
           |         / nullif(CAST(n_tokens AS DOUBLE), 0.0), 0.0), 6) AS top_token_share,
           |       round(coalesce(CAST(len(list_distinct(bi)) AS DOUBLE)
           |         / nullif(CAST(len(bi) AS DOUBLE), 0.0), 1.0), 6) AS distinct_bigram_ratio
           |FROM m""".stripMargin)
    ),

    // binned two-sample KS drift between every source pair — the corpus
    // monitor for "did this source's length distribution move?". One
    // scan bins n_chars on a shared 40-bucket grid (Histogram
    // arithmetic); everything after lives on sources×buckets rows,
    // dense-spined so empty bins carry the running CDF; the score is a
    // MAX of per-bin |ΔCDF|, immune to partition-order float smear.
    "text_source_drift" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Drift.ksByGroup(
        Tables.documents(s, dir), "source", "n_chars", buckets = 40)),
      oracle = Some(
        """WITH d AS (SELECT source, CAST(n_chars AS DOUBLE) AS v
          |           FROM documents
          |           WHERE n_chars IS NOT NULL AND source IS NOT NULL),
          |b AS (SELECT min(v) AS lo, max(v) AS hi FROM d),
          |w AS (SELECT source,
          |             CASE WHEN hi = lo THEN 0
          |                  ELSE CAST(least(floor((v - lo) / ((hi - lo) / 40)),
          |                                  39) AS BIGINT) END AS bucket
          |      FROM d, b),
          |c AS (SELECT source, bucket, count(*) AS c FROM w GROUP BY 1, 2),
          |tot AS (SELECT source, sum(c) AS tot FROM c GROUP BY 1),
          |spine AS (SELECT source, k AS bucket
          |          FROM (SELECT DISTINCT source FROM c),
          |               (SELECT unnest(range(0, 40)) AS k)),
          |dense AS (SELECT s.source, s.bucket, coalesce(c.c, 0) AS c
          |          FROM spine s LEFT JOIN c
          |            ON s.source = c.source AND s.bucket = c.bucket),
          |cdf AS (SELECT d.source, d.bucket,
          |               CAST(sum(c) OVER (PARTITION BY d.source
          |                 ORDER BY d.bucket) AS DOUBLE)
          |                 / CAST(tot AS DOUBLE) AS cdf
          |        FROM dense d JOIN tot USING (source))
          |SELECT x.source AS g1, y.source AS g2,
          |       round(max(abs(x.cdf - y.cdf)), 6) AS ks
          |FROM cdf x JOIN cdf y
          |  ON x.bucket = y.bucket AND x.source < y.source
          |GROUP BY 1, 2""".stripMargin)
    ),

    // Population Stability Index of every source's length distribution
    // against src0 — KS's companion: KS says whether distributions
    // differ, PSI says how much mass MOVED (the model-monitoring
    // threshold metric). Same shared-grid binning as text_source_drift;
    // Jeffreys +0.5 smoothing keeps empty bins out of the log without an
    // arbitrary epsilon; the ref⋈group join is bucket-keyed on a
    // groups×buckets frame, never data-sized.
    "text_psi" -> QueryDef(
      build = (s, dir) => round6(graft.operators.Drift.psiByGroup(
        Tables.documents(s, dir), "source", "n_chars",
        buckets = 40, refGroup = "src0")),
      oracle = Some(
        """WITH d AS (SELECT source, CAST(n_chars AS DOUBLE) AS v
          |           FROM documents
          |           WHERE n_chars IS NOT NULL AND source IS NOT NULL),
          |b AS (SELECT min(v) AS lo, max(v) AS hi FROM d),
          |w AS (SELECT source,
          |             CASE WHEN hi = lo THEN 0
          |                  ELSE CAST(least(floor((v - lo) / ((hi - lo) / 40)),
          |                                  39) AS BIGINT) END AS bucket
          |      FROM d, b),
          |c AS (SELECT source, bucket, count(*) AS c FROM w GROUP BY 1, 2),
          |tot AS (SELECT source, sum(c) AS tot FROM c GROUP BY 1),
          |spine AS (SELECT source, k AS bucket
          |          FROM (SELECT DISTINCT source FROM c),
          |               (SELECT unnest(range(0, 40)) AS k)),
          |dense AS (SELECT s.source, s.bucket,
          |                 (CAST(coalesce(c.c, 0) AS DOUBLE) + 0.5)
          |                   / (CAST(tot.tot AS DOUBLE) + 20.0) AS p
          |          FROM spine s
          |          LEFT JOIN c ON s.source = c.source AND s.bucket = c.bucket
          |          JOIN tot ON s.source = tot.source),
          |ref AS (SELECT bucket, p AS p_ref FROM dense WHERE source = 'src0')
          |SELECT d.source AS g,
          |       round(sum((d.p - r.p_ref) * ln(d.p / r.p_ref)), 6) AS psi
          |FROM dense d JOIN ref r USING (bucket)
          |WHERE d.source <> 'src0'
          |GROUP BY 1""".stripMargin)
    ),

    // PMI collocation extraction — the classic word-association score
    // behind phrase detection (word2vec-style phrase merging): bigram PMI
    // from exact unigram/bigram counts, min-support 5, ranked on the
    // ROUNDED score so cross-engine ulp noise can't reorder the top-50
    // (ties break on the bigram string). Counts are two hash aggs; the
    // join of frequent bigrams against the unigram dictionary is
    // vocabulary-sized; top-k is TakeOrdered, never a global sort.
    "text_collocations" -> QueryDef(
      build = (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(tokens(col("text")).as("toks"))
        val uni = toks.select(explode(col("toks")).as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
        val nt = uni.agg(sum("c").as("n_tokens"))
        val bgc = toks.select(explode(ngrams(col("toks"), 2)).as("bg"))
          .groupBy("bg").agg(count(lit(1)).as("c_xy"))
        val nb = bgc.agg(sum("c_xy").as("n_bigrams"))
        val f = bgc.filter(col("c_xy") >= 5)
          .withColumn("x", split(col("bg"), " ").getItem(0))
          .withColumn("y", split(col("bg"), " ").getItem(1))
          .join(uni.select(col("t").as("x"), col("c").as("c_x")), "x")
          .join(uni.select(col("t").as("y"), col("c").as("c_y")), "y")
          .crossJoin(broadcast(nt)).crossJoin(broadcast(nb))
        val pxy = col("c_xy").cast("double") / col("n_bigrams").cast("double")
        val px = col("c_x").cast("double") / col("n_tokens").cast("double")
        val py = col("c_y").cast("double") / col("n_tokens").cast("double")
        f.withColumn("pmi", round(log(pxy / (px * py)), 6))
          .select(col("bg").as("bigram"), col("c_xy"), col("pmi"))
          .orderBy(desc("pmi"), col("bigram"))
          .limit(50)
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |uc AS (SELECT tok, count(*) AS c
           |       FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
           |nt AS (SELECT sum(c) AS n_tokens FROM uc),
           |i AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM t),
           |bgc AS (SELECT toks[i] || ' ' || toks[i+1] AS bg, count(*) AS c_xy
           |        FROM i GROUP BY 1),
           |nb AS (SELECT sum(c_xy) AS n_bigrams FROM bgc),
           |f AS (SELECT bg, c_xy,
           |             string_split(bg, ' ')[1] AS x,
           |             string_split(bg, ' ')[2] AS y
           |      FROM bgc WHERE c_xy >= 5)
           |SELECT bg AS bigram, c_xy,
           |       round(ln((CAST(c_xy AS DOUBLE) / CAST(n_bigrams AS DOUBLE))
           |          / ((CAST(cx.c AS DOUBLE) / CAST(n_tokens AS DOUBLE))
           |             * (CAST(cy.c AS DOUBLE) / CAST(n_tokens AS DOUBLE)))), 6)
           |         AS pmi
           |FROM f JOIN uc cx ON f.x = cx.tok
           |       JOIN uc cy ON f.y = cy.tok, nt, nb
           |ORDER BY pmi DESC, bigram LIMIT 50""".stripMargin)
    ),

    // mutual information between lang and source — the corpus diagnostic
    // ("how much does the source predict the language?") and the
    // feature-selection score, from EXACT integer contingency counts. One
    // scan feeds the joint-count agg (shuffle sized |lang|·|source|);
    // marginals and the grand total are re-aggregations OF THE JOINT
    // TABLE; assembly is broadcast joins of tiny frames. The only float
    // work is the per-cell p·ln(...) terms — association-order noise far
    // below the 6-decimal rounding.
    "text_mutual_info" -> QueryDef(
      build = (s, dir) => round6(graft.operators.MutualInfo.categorical(
        Tables.documents(s, dir), "lang", "source")),
      oracle = Some(
        """WITH j AS (
          |  SELECT lang, source, count(*) AS c_xy FROM documents
          |  WHERE lang IS NOT NULL AND source IS NOT NULL GROUP BY 1, 2),
          |x AS (SELECT lang, sum(c_xy) AS c_x FROM j GROUP BY 1),
          |y AS (SELECT source, sum(c_xy) AS c_y FROM j GROUP BY 1),
          |t AS (SELECT sum(c_xy) AS n FROM j),
          |hx AS (SELECT sum(-(CAST(c_x AS DOUBLE) / CAST(n AS DOUBLE))
          |         * ln(CAST(c_x AS DOUBLE) / CAST(n AS DOUBLE))) AS h_x
          |       FROM x, t),
          |hy AS (SELECT sum(-(CAST(c_y AS DOUBLE) / CAST(n AS DOUBLE))
          |         * ln(CAST(c_y AS DOUBLE) / CAST(n AS DOUBLE))) AS h_y
          |       FROM y, t),
          |m AS (
          |  SELECT max(n) AS n, count(*) AS cells,
          |         sum((CAST(c_xy AS DOUBLE) / CAST(n AS DOUBLE))
          |           * ln((CAST(c_xy AS DOUBLE) / CAST(n AS DOUBLE))
          |               / ((CAST(c_x AS DOUBLE) / CAST(n AS DOUBLE))
          |                  * (CAST(c_y AS DOUBLE) / CAST(n AS DOUBLE)))))
          |           AS mi_nats
          |  FROM j JOIN x USING (lang) JOIN y USING (source), t)
          |SELECT CAST(m.n AS BIGINT) AS n, cells,
          |       round(h_x, 6) AS h_x, round(h_y, 6) AS h_y,
          |       round(mi_nats, 6) AS mi_nats,
          |       round(CASE WHEN h_x * h_y > 0
          |                  THEN mi_nats / sqrt(h_x * h_y)
          |                  ELSE 0.0 END, 6) AS nmi
          |FROM m, hx, hy""".stripMargin)
    ),

    // Gopher/MassiveText WITHIN-doc repetition rule, family 1: characters
    // claimed by the most frequent word n-gram (n = 2, 3, 4), overlapping
    // occurrences counted per the published rule. One corpus scan covers
    // all three orders; every aggregate keys on (doc, …) so partials
    // combine map-side.
    "text_rep_top_ngrams" -> QueryDef(
      build = (s, dir) => graft.operators.Repetition.topNgramFractions(
        Tables.documents(s, dir), textCol = "text", idCol = "doc_id",
        ns = Seq(2, 3, 4)).orderBy("doc_id", "n"),
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
           |base AS (
           |  SELECT doc_id, tk,
           |         CAST(list_sum(list_transform(tk,
           |           x -> CAST(len(x) AS BIGINT))) AS BIGINT) AS tchars
           |  FROM t),
           |g AS (
           |  SELECT doc_id, tchars, n,
           |         unnest(range(1, greatest(len(tk) - n + 1, 0) + 1)) AS pos,
           |         tk
           |  FROM base CROSS JOIN (VALUES (2), (3), (4)) AS ns(n)),
           |ex AS (SELECT doc_id, tchars, n,
           |              array_to_string(tk[pos:pos+n-1], ' ') AS g
           |       FROM g),
           |c AS (SELECT doc_id, tchars, n, g, count(*) AS c
           |      FROM ex GROUP BY 1, 2, 3, 4),
           |top AS (SELECT doc_id, tchars, n, g, c,
           |               row_number() OVER (PARTITION BY doc_id, n
           |                                  ORDER BY c DESC, g) AS rk
           |        FROM c)
           |SELECT doc_id, n, g AS top_gram, CAST(c AS BIGINT) AS top_count,
           |       CAST(len(g) - (n - 1) AS BIGINT) AS gram_chars,
           |       round(CAST(c AS DOUBLE) * CAST(len(g) - (n - 1) AS DOUBLE)
           |             / CAST(tchars AS DOUBLE), 6) AS top_frac
           |FROM top WHERE rk = 1
           |ORDER BY doc_id, n""".stripMargin)
    ),

    // family 2: duplicated-5-gram character COVERAGE (position-set union,
    // so overlapping duplicated grams never double-count) — the
    // interval-coverage semantics of Gopher's dup-n-gram rules
    "text_rep_dup_ngrams" -> QueryDef(
      build = (s, dir) => graft.operators.Repetition.dupNgramCoverage(
        Tables.documents(s, dir), textCol = "text", idCol = "doc_id",
        n = 5).orderBy("doc_id"),
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
           |base AS (
           |  SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tokens,
           |         CAST(list_sum(list_transform(tk,
           |           x -> CAST(len(x) AS BIGINT))) AS BIGINT) AS total_chars
           |  FROM t),
           |g AS (SELECT doc_id,
           |             unnest(range(1, greatest(len(tk) - 4, 0) + 1)) AS pos,
           |             tk
           |      FROM base),
           |sh AS (SELECT doc_id, pos,
           |              md5(array_to_string(tk[pos:pos+4], ' ')) AS h
           |       FROM g),
           |rep AS (SELECT doc_id, h FROM sh
           |        GROUP BY doc_id, h HAVING count(*) >= 2),
           |f AS (SELECT sh.doc_id, sh.pos
           |      FROM sh JOIN rep ON sh.doc_id = rep.doc_id AND sh.h = rep.h),
           |cov0 AS (SELECT doc_id, tp
           |         FROM (SELECT doc_id, unnest(range(pos, pos + 5)) AS tp
           |               FROM f)
           |         GROUP BY doc_id, tp),
           |lens AS (SELECT doc_id, unnest(range(1, len(tk) + 1)) AS tp, tk
           |         FROM base),
           |cov AS (SELECT c.doc_id,
           |               CAST(sum(len(l.tk[l.tp])) AS BIGINT) AS covered
           |        FROM cov0 c
           |        JOIN lens l ON c.doc_id = l.doc_id AND c.tp = l.tp
           |        GROUP BY 1)
           |SELECT b.doc_id, b.n_tokens, b.total_chars,
           |       CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_chars,
           |       round(CAST(coalesce(cov.covered, 0) AS DOUBLE)
           |             / nullif(CAST(b.total_chars AS DOUBLE), 0.0), 6)
           |         AS dup_frac
           |FROM base b LEFT JOIN cov ON b.doc_id = cov.doc_id
           |ORDER BY b.doc_id""".stripMargin)
    ),

    // Heaps'-law vocabulary growth: V(n) ~ K n^beta fitted by OLS of
    // ln(cum vocab) on ln(cum tokens) in deterministic doc order — the
    // growth-side companion to text_zipf_fit's rank-frequency slope
    // (sub-linear beta ~ 0.4-0.8 is the healthy signature; beta near 1
    // flags unbounded noise vocab, near 0 a closed template vocabulary).
    // New-type counts come from one min(doc_id)-per-token aggregate; the
    // two running sums use PrefixSum's two-phase range-bucket discipline
    // (never a single-partition global window); the OLS moments sum
    // EXACT DECIMAL(18,12) over the log points so the doc-count-sized
    // reduction is order-free on both engines.
    "text_heaps_fit" -> QueryDef(
      build = (s, dir) => {
        val docs = Tables.documents(s, dir)
        val base = docs.select(col("doc_id"),
          size(tokens(col("text"))).cast("long").as("_m"))
        val firsts = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
          .groupBy("token").agg(min("doc_id").as("_fd"))
          .groupBy("_fd").agg(count(lit(1)).as("_new"))
        val joined = base.join(firsts, base("doc_id") === firsts("_fd"), "left")
          .select(col("doc_id"), col("_m"),
            coalesce(col("_new"), lit(0L)).as("_new"))
        val cumTok = graft.operators.PrefixSum
          .overOrdered(joined, "doc_id", "_m")
          .withColumnRenamed("cum", "_ct")
        val cum = graft.operators.PrefixSum
          .overOrdered(cumTok, "doc_id", "_new")
          .withColumnRenamed("cum", "_cv")
        val pt = cum.filter(col("_ct") > 0 && col("_cv") > 0)
          .select(log(col("_ct").cast("double")).cast("decimal(18,12)").as("x"),
            log(col("_cv").cast("double")).cast("decimal(18,12)").as("y"),
            col("_ct"), col("_cv"))
        val st = pt.agg(count(lit(1)).cast("double").as("k"),
          sum("x").cast("double").as("sx"), sum("y").cast("double").as("sy"),
          sum(col("x") * col("x")).cast("double").as("sxx"),
          sum(col("y") * col("y")).cast("double").as("syy"),
          sum(col("x") * col("y")).cast("double").as("sxy"),
          max("_ct").as("total_tokens"), max("_cv").as("vocab"))
        val slope = (col("k") * col("sxy") - col("sx") * col("sy")) /
          (col("k") * col("sxx") - col("sx") * col("sx"))
        val icept = (col("sy") - slope * col("sx")) / col("k")
        val r2num = (col("k") * col("sxy") - col("sx") * col("sy")) *
          (col("k") * col("sxy") - col("sx") * col("sy"))
        val r2den = (col("k") * col("sxx") - col("sx") * col("sx")) *
          (col("k") * col("syy") - col("sy") * col("sy"))
        st.select(col("k").cast("long").as("n_docs"),
          col("total_tokens"), col("vocab"),
          round(slope, 6).as("beta"), round(icept, 6).as("ln_k"),
          round(r2num / r2den, 6).as("r2"))
      },
      oracle = Some(
        s"""WITH t AS (SELECT doc_id, $toksSql AS tk FROM documents),
           |base AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS m FROM t),
           |fd AS (SELECT token, min(doc_id) AS fd
           |       FROM (SELECT doc_id, unnest(tk) AS token FROM t)
           |       GROUP BY token),
           |nw AS (SELECT fd AS doc_id, CAST(count(*) AS BIGINT) AS nv
           |       FROM fd GROUP BY 1),
           |j AS (SELECT b.doc_id, b.m, coalesce(nw.nv, 0) AS nv
           |      FROM base b LEFT JOIN nw ON b.doc_id = nw.doc_id),
           |c AS (SELECT doc_id,
           |             sum(m) OVER w AS ct, sum(nv) OVER w AS cv
           |      FROM j
           |      WINDOW w AS (ORDER BY doc_id
           |                   ROWS BETWEEN UNBOUNDED PRECEDING
           |                   AND CURRENT ROW)),
           |pt AS (SELECT CAST(ln(CAST(ct AS DOUBLE)) AS DECIMAL(18,12)) AS x,
           |              CAST(ln(CAST(cv AS DOUBLE)) AS DECIMAL(18,12)) AS y,
           |              ct, cv
           |       FROM c WHERE ct > 0 AND cv > 0),
           |s AS (SELECT CAST(count(*) AS DOUBLE) AS k,
           |             CAST(sum(x) AS DOUBLE) AS sx,
           |             CAST(sum(y) AS DOUBLE) AS sy,
           |             CAST(sum(x*x) AS DOUBLE) AS sxx,
           |             CAST(sum(y*y) AS DOUBLE) AS syy,
           |             CAST(sum(x*y) AS DOUBLE) AS sxy,
           |             CAST(max(ct) AS BIGINT) AS total_tokens,
           |             CAST(max(cv) AS BIGINT) AS vocab
           |      FROM pt)
           |SELECT CAST(k AS BIGINT) AS n_docs, total_tokens, vocab,
           |       round((k*sxy - sx*sy) / (k*sxx - sx*sx), 6) AS beta,
           |       round((sy - (k*sxy - sx*sy) / (k*sxx - sx*sx) * sx) / k, 6)
           |         AS ln_k,
           |       round((k*sxy - sx*sy) * (k*sxy - sx*sy)
           |             / ((k*sxx - sx*sx) * (k*syy - sy*sy)), 6) AS r2
           |FROM s""".stripMargin)
    )
  )
}
