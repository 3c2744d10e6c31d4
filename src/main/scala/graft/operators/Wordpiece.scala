package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** WordPiece merge training (Schuster & Nakajima '12; BERT's tokenizer) —
  * the third tokenizer family next to [[Bpe]] (raw pair frequency) and
  * [[Unigram]] (EM-pruned LM): same greedy agglomerative loop as BPE, but
  * the merge criterion is the LIKELIHOOD RATIO
  * `score = freq(lr) / (freq(l) · freq(r))` — the pair whose fusion most
  * increases a unigram LM's corpus likelihood, which prefers pairs that
  * predict each other over pairs that are merely common. Symbols carry
  * the `##` continuation prefix (word-initial pieces bare, internal
  * pieces `##`-prefixed), so a merge of `a` + `##b` emits piece `ab`
  * while `##a` + `##b` emits `##ab` — the trained table IS a BERT-style
  * vocab seed.
  *
  * Scale shape — identical to [[Bpe.train]]: the corpus is touched once
  * (word-frequency aggregate); each round runs on the distinct-word
  * frame and adds ONE symbol-frequency aggregate (vocab-sized) feeding
  * the pair argmax via two broadcast-able joins. Per-round driver state
  * is one merge row; frames checkpoint per round to keep lineage flat.
  *
  * Determinism: the score is `CAST(c AS DOUBLE) / (CAST(fl AS DOUBLE) *
  * CAST(fr AS DOUBLE))` — every operand an exact integer, every IEEE
  * step (two casts, one multiply, one divide) spelled identically in the
  * oracle, so both engines compute the bit-identical double; ties break
  * (l, r). The k data-dependent argmaxes unroll into k MATERIALIZED CTE
  * blocks exactly like [[Bpe.trainOracleSql]], with one extra
  * symbol-count CTE per round ([[trainOracleSql]]).
  */
object Wordpiece {

  /** (word, freq) → (freq, syms) with WordPiece continuation prefixes:
    * first char bare, every later char `##`-prefixed.
    */
  private[operators] def prep(words: DataFrame): DataFrame = {
    val chars = org.apache.spark.sql.functions.filter(
      split(col("w"), "(?!^)"), s => s =!= "")
    words.select(col("freq"),
      zip_with(chars, sequence(lit(1), size(chars)),
        (c, i) => when(i === 1, c).otherwise(concat(lit("##"), c)))
        .as("syms"))
  }

  /** Greedy left-to-right application of one merge (l, r) → `merged`
    * over a symbol array — [[Bpe.applyMerge]] generalized to a merged
    * spelling that differs from plain concatenation (the `##` strip).
    */
  private[operators] def applyMerge(syms: org.apache.spark.sql.Column,
                                    l: String, r: String,
                                    merged: String): org.apache.spark.sql.Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(size(acc) > 0 &&
        element_at(acc, -1) === l && s === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(merged))))
        .otherwise(concat(acc, array(s))))

  /** Train up to `k` likelihood-ratio merges over a (word, freq) frame;
    * stops early when no pair repeats. Returns
    * (rank, left, right, merged, pair_count, score).
    */
  def train(words: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = words.sparkSession
    import spark.implicits._
    var cur = prep(words).localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long, Double)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val symFreq = cur
        .select(col("freq"), explode(col("syms")).as("sym"))
        .groupBy("sym").agg(sum(col("freq")).as("f"))
      val adj = transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
          element_at(col("syms"), i + 1).as("r")))
      val pairs = cur
        .select(col("freq"), explode(when(size(col("syms")) >= 2, adj)
          .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .filter(col("c") >= 2) // a pair seen once is not worth a merge
      val best = pairs
        .join(broadcast(symFreq.select(col("sym").as("l"), col("f").as("fl"))),
          Seq("l"))
        .join(broadcast(symFreq.select(col("sym").as("r"), col("f").as("fr"))),
          Seq("r"))
        .withColumn("score", col("c").cast("double") /
          (col("fl").cast("double") * col("fr").cast("double")))
        .orderBy(col("score").desc, col("l").asc, col("r").asc)
        .select("l", "r", "c", "score")
        .limit(1).collect()
      best.headOption match {
        case Some(Row(l: String, r: String, c: Long, s: Double)) =>
          val merged = l + r.stripPrefix("##")
          merges += ((rank, l, r, merged, c, s))
          cur = cur.withColumn("syms", applyMerge(col("syms"), l, r, merged))
            .localCheckpoint(true)
          rank += 1
        case _ => done = true // no pair seen twice — training converged
      }
    }
    merges.result()
      .toDF("rank", "left", "right", "merged", "pair_count", "score")
      .withColumn("score", round(col("score"), 6))
  }

  /** End-to-end: corpus → word counts → k likelihood-ratio merges. */
  def trainOnCorpus(docs: DataFrame, textCol: String, k: Int): DataFrame =
    train(Bpe.wordCounts(docs, textCol), k)

  /** Longest-match-first (max-munch) piece count for one token under a
    * FIXED piece list — WordPiece's inference rule (greedy longest prefix
    * at each position; single characters are the implicit coverage floor,
    * mirroring training's char seed, so no token is uncoverable). Over-
    * long tokens (> maxWordLen, the oracle's unroll bound) fall back to
    * per-char pieces like the unigram encoder. Pure expression — an
    * `aggregate` fold over positions carrying (next_start, count); each
    * step is a when-chain of `array_contains` probes against the
    * by-length piece arrays (longest wins), so the whole encoder is
    * map-side, codegen-friendly, zero shuffle.
    */
  private[operators] def munchNp(tok: org.apache.spark.sql.Column,
                                 pieces: Seq[String],
                                 maxWordLen: Int): org.apache.spark.sql.Column = {
    val initByLen = pieces.filterNot(_.startsWith("##"))
      .filter(_.length >= 2).distinct.groupBy(_.length)
    val contByLen = pieces.filter(_.startsWith("##"))
      .map(_.stripPrefix("##")).filter(_.length >= 2).distinct.groupBy(_.length)
    def bestLen(pos: org.apache.spark.sql.Column,
                byLen: Map[Int, Seq[String]]): org.apache.spark.sql.Column =
      byLen.keys.toSeq.sorted.foldLeft(lit(1)) { (acc, len) =>
        when(array_contains(typedLit(byLen(len)), tok.substr(pos, lit(len))),
          lit(len)).otherwise(acc)
      }
    val st0 = struct(lit(1).as("nxt"), lit(0L).as("np"))
    val folded = aggregate(sequence(lit(1), length(tok)), st0, (st, pos) => {
      val bl = when(pos === 1, bestLen(pos, initByLen))
        .otherwise(bestLen(pos, contByLen))
      when(pos < st.getField("nxt"), st)
        .otherwise(struct((pos + bl).as("nxt"),
          (st.getField("np") + 1L).as("np")))
    })
    when(length(tok) > maxWordLen, length(tok).cast("long"))
      .otherwise(folded.getField("np"))
  }

  /** Per-token (keyCol, _nc, _np) with the max-munch fold run at
    * DISTINCT-TOKEN grain, not per occurrence — the [[Unigram]]
    * discipline: the distinct combines map-side, the fold touches the
    * vocabulary-sized frame once, the result joins back broadcast-sized
    * (Zipf makes per-occurrence folding strictly wasteful at any scale).
    */
  private def tokenPieces(docs: DataFrame, textCol: String,
                          pieces: Seq[String], maxWordLen: Int,
                          keyCol: org.apache.spark.sql.Column,
                          keyName: String): DataFrame = {
    import graft.functions.TextFunctions
    val toks = docs.select(keyCol.as(keyName),
      explode(TextFunctions.tokens(col(textCol))).as("_tok"))
    val dt = toks.select(col("_tok")).distinct()
      .select(col("_tok"), munchNp(col("_tok"), pieces, maxWordLen).as("_np"))
    toks.join(dt, Seq("_tok"))
      .select(col(keyName), length(col("_tok")).cast("long").as("_nc"),
        col("_np"))
  }

  /** ENCODE with a fixed piece list (the inference half; pieces ship
    * with a production tokenizer): per-doc token / char / piece counts
    * and chars-per-piece compression — the [[Unigram.encodeStats]]
    * contract under the max-munch rule, at the same distinct-token
    * grain its oracle DPs over.
    */
  def encodeStats(docs: DataFrame, textCol: String, idCol: String,
                  pieces: Seq[String], maxWordLen: Int = 12): DataFrame = {
    val per = tokenPieces(docs, textCol, pieces, maxWordLen,
      col(idCol), "doc_id")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("_nc")).as("n_chars"),
        sum(col("_np")).as("n_pieces"))
    docs.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        round(col("n_chars").cast("double") /
          nullif(col("n_pieces").cast("double"), lit(0.0)), 6)
          .as("compression"))
  }

  /** Tokenizer fertility by group under a fixed piece list — the
    * WordPiece leg of the per-language chars-per-piece eval, directly
    * comparable to [[Bpe.fertilityByGroup]] and
    * [[Unigram.fertilityByGroup]] at the same grain.
    */
  def fertilityByGroup(docs: DataFrame, textCol: String, groupCol: String,
                       pieces: Seq[String], maxWordLen: Int = 12): DataFrame =
    tokenPieces(docs, textCol, pieces, maxWordLen, col(groupCol), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("_nc")).as("n_chars"),
        sum(col("_np")).as("n_pieces"))
      .select(col(groupCol), col("n_tokens"), col("n_chars"),
        col("n_pieces"),
        round(col("n_chars").cast("double") /
          nullif(col("n_pieces").cast("double"), lit(0.0)), 6)
          .as("fertility"))

  /** Max-munch replay over DISTINCT eligible tokens: `maxWordLen`
    * chained CTEs each advancing the (next_start, count) state at one
    * literal position — the [[Unigram]] encode-oracle discipline with a
    * greedy step instead of a DP row. Emits `tokstats(k, nc, np)`.
    */
  private def munchCtes(pieces: Seq[String], maxWordLen: Int,
                        keySql: String, toksSql: String): String = {
    val initByLen = pieces.filterNot(_.startsWith("##"))
      .filter(_.length >= 2).distinct.groupBy(_.length)
    val contByLen = pieces.filter(_.startsWith("##"))
      .map(_.stripPrefix("##")).filter(_.length >= 2).distinct.groupBy(_.length)
    def bestLenSql(i: Int): String = {
      val byLen = if (i == 1) initByLen else contByLen
      val whens = byLen.keys.toSeq.sorted(Ordering[Int].reverse).map { len =>
        val lst = byLen(len).sorted
          .map(graft.queries.OracleSnippets.sqlStr).mkString(", ")
        s"WHEN substr(w, $i, $len) IN ($lst) THEN $len"
      }
      if (whens.isEmpty) "1" else s"CASE ${whens.mkString(" ")} ELSE 1 END"
    }
    val chain = (1 to maxWordLen).map { i =>
      s"""mm$i AS (
         |  SELECT w,
         |         CASE WHEN $i > length(w) OR $i < nxt THEN nxt
         |              ELSE $i + ${bestLenSql(i)} END AS nxt,
         |         CASE WHEN $i > length(w) OR $i < nxt THEN np
         |              ELSE np + 1 END AS np
         |  FROM mm${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""tok AS MATERIALIZED (
       |  SELECT $keySql AS k, unnest($toksSql) AS tok FROM documents),
       |dt AS MATERIALIZED (
       |  SELECT DISTINCT tok AS w FROM tok WHERE length(tok) <= $maxWordLen),
       |mm0 AS (SELECT w, 1 AS nxt, CAST(0 AS BIGINT) AS np FROM dt),
       |$chain,
       |tokstats AS (
       |  SELECT t.k, CAST(length(t.tok) AS BIGINT) AS nc,
       |         CAST(CASE WHEN length(t.tok) > $maxWordLen THEN length(t.tok)
       |                   ELSE coalesce(m.np, length(t.tok)) END
       |              AS BIGINT) AS np
       |  FROM tok t LEFT JOIN mm$maxWordLen m ON m.w = t.tok)""".stripMargin
  }

  /** DuckDB replay of [[encodeStats]]. */
  def encodeOracleSql(pieces: Seq[String], maxWordLen: Int,
                      toksSql: String): String =
    s"""WITH ${munchCtes(pieces, maxWordLen, "doc_id", toksSql)},
       |agg AS (
       |  SELECT k AS doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |         CAST(sum(nc) AS BIGINT) AS n_chars,
       |         CAST(sum(np) AS BIGINT) AS n_pieces
       |  FROM tokstats GROUP BY 1)
       |SELECT d.doc_id,
       |       coalesce(agg.n_tokens, 0) AS n_tokens,
       |       coalesce(agg.n_chars, 0) AS n_chars,
       |       coalesce(agg.n_pieces, 0) AS n_pieces,
       |       round(CAST(agg.n_chars AS DOUBLE)
       |             / nullif(CAST(agg.n_pieces AS DOUBLE), 0.0), 6)
       |         AS compression
       |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id""".stripMargin

  /** DuckDB replay of [[fertilityByGroup]]. */
  def fertilityOracleSql(pieces: Seq[String], groupCol: String,
                         maxWordLen: Int, toksSql: String): String =
    s"""WITH ${munchCtes(pieces, maxWordLen, groupCol, toksSql)}
       |SELECT k AS $groupCol, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(nc) AS BIGINT) AS n_chars,
       |       CAST(sum(np) AS BIGINT) AS n_pieces,
       |       round(CAST(sum(nc) AS DOUBLE)
       |             / nullif(CAST(sum(np) AS DOUBLE), 0.0), 6) AS fertility
       |FROM tokstats GROUP BY k""".stripMargin

  /** DuckDB replay of [[trainOnCorpus]]: the [[Bpe.trainOracleSql]]
    * unrolled-argmax discipline plus, per round, a symbol-frequency CTE
    * and the two frequency joins; `##` prefixes enter via one
    * `replace('||', '||##')` over the delimiter-wrapped chars (symbol
    * text never contains `|`), and each merge's replacement target strips
    * the right side's `^##` exactly as the engine does.
    */
  def trainOracleSql(k: Int, toksSql: String): String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""wc AS MATERIALIZED (
               |  SELECT w, CAST(count(*) AS BIGINT) AS freq
               |  FROM (SELECT unnest($toksSql) AS w FROM documents)
               |  GROUP BY w)""".stripMargin
    // |a||b||c| → |a||##b||##c|: every inter-symbol boundary gains ##
    ctes += """cur0 AS MATERIALIZED (
              |  SELECT freq,
              |         replace(regexp_replace(w, '(.)', '|\1|', 'g'),
              |                 '||', '||##') AS s
              |  FROM wc)""".stripMargin
    for (t <- 1 to k) {
      val p = t - 1
      ctes += s"""syms$t AS (
                 |  SELECT freq, regexp_extract_all(s, '\\|([^|]+)\\|', 1) AS y
                 |  FROM cur$p),
                 |sf$t AS (
                 |  SELECT sym, CAST(sum(freq) AS BIGINT) AS f
                 |  FROM (SELECT freq, unnest(y) AS sym FROM syms$t)
                 |  GROUP BY 1),
                 |pairs$t AS (
                 |  SELECT p.l AS l, p.r AS r, CAST(sum(freq) AS BIGINT) AS c
                 |  FROM (SELECT freq,
                 |          unnest(list_transform(range(1, len(y)),
                 |                 i -> struct_pack(l := y[i], r := y[i+1]))) AS p
                 |        FROM syms$t WHERE len(y) >= 2)
                 |  GROUP BY 1, 2 HAVING sum(freq) >= 2),
                 |best$t AS MATERIALIZED (
                 |  SELECT $t AS rank, l, r, c,
                 |         CAST(c AS DOUBLE)
                 |           / (CAST(fl.f AS DOUBLE) * CAST(fr.f AS DOUBLE))
                 |           AS score
                 |  FROM pairs$t
                 |  JOIN sf$t fl ON fl.sym = l
                 |  JOIN sf$t fr ON fr.sym = r
                 |  ORDER BY score DESC, l ASC, r ASC LIMIT 1),
                 |cur$t AS MATERIALIZED (
                 |  SELECT freq,
                 |    replace(s,
                 |      '|' || (SELECT l FROM best$t) || '||' ||
                 |        (SELECT r FROM best$t) || '|',
                 |      '|' || (SELECT l FROM best$t) ||
                 |        (SELECT regexp_replace(r, '^##', '') FROM best$t) ||
                 |        '|') AS s
                 |  FROM cur$p)""".stripMargin
    // NOTE: continuation lines above must not START with the `||` concat
    // operator — the assembled text passes through the caller's outer
    // .stripMargin, which would eat the first `|` of the line.
    }
    val union = (1 to k).map(t => s"SELECT * FROM best$t").mkString(" UNION ALL ")
    s"""WITH ${ctes.result().mkString(",\n")}
       |SELECT CAST(rank AS INT) AS rank, l AS "left", r AS "right",
       |       l || regexp_replace(r, '^##', '') AS merged,
       |       c AS pair_count, round(score, 6) AS score
       |FROM ($union) WHERE l IS NOT NULL ORDER BY rank""".stripMargin
  }
}
