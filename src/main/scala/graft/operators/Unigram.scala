package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Unigram-LM tokenizer TRAINING (SentencePiece's other half, next to
  * [[Bpe]]): seed a substring vocabulary from corpus statistics, then run
  * hard-EM (Viterbi-EM) rounds — segment every word with the current
  * piece log-probabilities via dynamic programming, re-estimate counts
  * from the chosen segmentations, prune to the target vocabulary — and
  * emit (piece, count, score), which IS the trained tokenizer artifact.
  * Kudo's trainer uses soft EM over the full lattice plus loss-ranked
  * pruning; the hard-EM + count-ranked-prune variant here keeps every
  * intermediate an exact integer (Viterbi counts, not fractional
  * expectations), which is what makes the whole recurrence
  * SQL-replayable bit-for-bit.
  *
  * Scale shape — the same industrial-trainer structure as [[Bpe.train]]:
  * the corpus is touched ONCE (word-frequency aggregate); every EM round
  * runs on the DISTINCT-WORD frame (vocabulary-sized, not corpus-sized).
  * Per round: one pure-expression Viterbi pass per word (the DP is a
  * `functions.aggregate` fold over word positions — no UDF, no lattice
  * shuffle), one piece-grain hash aggregate, and a vocabulary-sized
  * collect (bounded model state, the k-means/LogReg/BPE discipline).
  *
  * Determinism: piece scores are integer-quantized log-probs
  * (`floor(ln((c+1)/(T+V)) * 1e6)` — floor, not round: round() ties
  * break differently across engines), so ALL DP arithmetic is exact
  * integer addition; DP ties break toward the smaller back-pointer
  * (longer last piece), and pruning orders by (count desc, piece asc) —
  * total orders everywhere, so the trained vocabulary is a pure function
  * of the corpus and [[trainOracleSql]] can replay training as unrolled
  * MATERIALIZED CTE blocks (the [[Bpe.trainOracleSql]] technique applied
  * to a per-position DP instead of a per-merge argmax).
  *
  * Caps (documented, never silent): pieces are at most `maxPieceLen`
  * chars (SentencePiece ships the same knob); words longer than
  * `maxWordLen` are excluded from TRAINING statistics and fall back to
  * per-char pieces at ENCODE time — the unrolled oracle DP must fix its
  * step count in SQL text, and UnigramSpec pins the fallback.
  */
object Unigram {

  /** Quantized piece scores for a vocabulary with counts: Laplace-smoothed
    * unigram log-prob, floored to integer millionths. Exact-integer DP
    * currency; identical formula in the SQL replays.
    */
  def scoreMap(vocab: Seq[(String, Long)]): Map[String, Long] = {
    val t = vocab.map(_._2).sum
    val v = vocab.size
    vocab.map { case (p, c) =>
      p -> math.floor(math.log((c + 1.0) / (t + v).toDouble) * 1e6).toLong
    }.toMap
  }

  /** Viterbi table for word `w` under `scores` (map piece→quantized
    * log-prob): array over positions 0..len(w) of struct(s, b) — best
    * path score reaching the position and its back-pointer — built by a
    * single left-to-right expression fold. Unreachable positions are
    * null entries. Ties prefer the smaller back-pointer (longer last
    * piece): max over struct(s, -b).
    */
  private def viterbiTable(w: Column, scores: Column,
                           maxPieceLen: Int): Column =
    aggregate(
      sequence(lit(1), length(w)),
      array(struct(lit(0L).as("s"), lit(0).as("b"))),
      (acc, i) => {
        val cands = filter(
          transform(sequence(greatest(i - maxPieceLen, lit(0)), i - 1), j => {
            val prev = element_at(acc, j + 1)
            val sc = element_at(scores, substr(w, j + 1, i - j))
            when(prev.isNotNull && sc.isNotNull,
              struct((prev.getField("s") + sc).as("s"),
                (-j).cast("int").as("nb")))
          }),
          c => c.isNotNull)
        val best = array_max(cands)
        concat(acc, array(when(best.isNotNull,
          struct(best.getField("s").as("s"),
            (-best.getField("nb")).cast("int").as("b")))))
      })

  /** Walk the table back from the final position, collecting pieces.
    * Returns null when the final position is unreachable.
    */
  private def tracePieces(w: Column, table: Column): Column =
    aggregate(
      sequence(lit(1), length(w)),
      struct(length(w).cast("int").as("pos"),
        array().cast("array<string>").as("ps")),
      (acc, _) => {
        val pos = acc.getField("pos")
        val cur = element_at(table, pos + 1)
        when(pos > lit(0),
          struct(cur.getField("b").as("pos"),
            concat(array(substr(w, cur.getField("b") + 1,
              pos - cur.getField("b"))), acc.getField("ps")).as("ps")))
          .otherwise(acc)
      },
      acc => when(acc.getField("pos") === 0, acc.getField("ps")))

  /** Viterbi segmentation of `w` under a fixed vocabulary: the array of
    * chosen pieces, or null when `w` exceeds `maxWordLen` or no piece
    * path covers it (a char outside the vocabulary) — callers supply the
    * per-char fallback.
    */
  def segment(w: Column, vocab: Map[String, Long], maxPieceLen: Int,
              maxWordLen: Int): Column =
    when(length(w) <= maxWordLen,
      tracePieces(w, viterbiTable(w, typedLit(vocab), maxPieceLen)))

  /** Train a unigram-LM vocabulary over a corpus: seed = every substring
    * up to `maxPieceLen` chars weighted by word frequency (ALL single
    * chars kept — the coverage floor — plus the top `seedMulti`
    * multi-char pieces), then `rounds` hard-EM rounds, each keeping the
    * single chars plus the top `vocabMulti` multi-char pieces by Viterbi
    * count. Returns (piece, n, score): the final counts and quantized
    * log-prob scores.
    */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
            maxWordLen: Int = 12, seedMulti: Int = 40,
            vocabMulti: Int = 20, rounds: Int = 2): DataFrame = {
    require(maxPieceLen >= 2 && maxWordLen >= maxPieceLen && rounds >= 1)
    val spark = docs.sparkSession
    import spark.implicits._
    val words = Bpe.wordCounts(docs, textCol)
      .filter(length(col("w")) <= maxWordLen)
      .localCheckpoint(true) // reused every round; keep lineage flat
    // ONE vocabulary-frame pass counts every substring
    val subs = words.select(col("freq"), explode(flatten(
      transform(sequence(lit(1), length(col("w"))), j =>
        transform(sequence(lit(1),
          least(lit(maxPieceLen), length(col("w")) - j + 1)), l =>
          substr(col("w"), j, l))))).as("piece"))
    val counts0 = subs.groupBy("piece").agg(sum("freq").as("c"))
    def rows(df: DataFrame): Seq[(String, Long)] =
      df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val chars = rows(counts0.filter(length(col("piece")) === 1))
      .sortBy(_._1) // the coverage floor: every corpus char, always kept
    val multi0 = rows(counts0.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece").asc).limit(seedMulti))
    var vocab: Seq[(String, Long)] = chars ++ multi0
    for (_ <- 1 to rounds) {
      val segd = words.select(col("freq"),
        explode(segment(col("w"), scoreMap(vocab), maxPieceLen, maxWordLen))
          .as("piece"))
      val nc = segd.groupBy("piece").agg(sum("freq").as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      vocab = chars.map { case (p, _) => (p, nc.getOrElse(p, 0L)) } ++
        nc.toSeq.filter(_._1.length > 1)
          .sortBy { case (p, c) => (-c, p) }.take(vocabMulti)
    }
    val sm = scoreMap(vocab)
    vocab.map { case (p, c) => (p, c, sm(p)) }.toDF("piece", "n", "score")
  }

  /** ENCODE with a FIXED vocabulary (the inference half — the vocab ships
    * with the tokenizer, which also keeps this SQL-oracle-able): per-doc
    * token / char / piece counts and the chars-per-piece compression.
    * Pure map-side Viterbi expression + one hash aggregate; tokens the
    * vocabulary cannot cover (or longer than `maxWordLen`) fall back to
    * per-char pieces; zero-token docs report zeros.
    */
  def encodeStats(docs: DataFrame, textCol: String, idCol: String,
                  vocab: Seq[(String, Long)], maxPieceLen: Int = 4,
                  maxWordLen: Int = 12): DataFrame = {
    val per = tokenPieces(docs, textCol, vocab, maxPieceLen, maxWordLen,
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

  /** Tokenizer fertility by group (the per-language fairness eval, the
    * unigram twin of [[Bpe.fertilityByGroup]]): chars-per-piece under a
    * fixed vocabulary at `groupCol` grain.
    */
  def fertilityByGroup(docs: DataFrame, textCol: String, groupCol: String,
                       vocab: Seq[(String, Long)], maxPieceLen: Int = 4,
                       maxWordLen: Int = 12): DataFrame =
    tokenPieces(docs, textCol, vocab, maxPieceLen, maxWordLen,
      col(groupCol), groupCol)
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("_nc")).as("n_chars"),
        sum(col("_np")).as("n_pieces"))
      .select(col(groupCol), col("n_tokens"), col("n_chars"),
        col("n_pieces"),
        round(col("n_chars").cast("double") /
          nullif(col("n_pieces").cast("double"), lit(0.0)), 6)
          .as("fertility"))

  /** BPE-vs-unigram fertility bake-off in ONE corpus pass: both
    * per-token symbol counts are map-side expressions over the SAME
    * exploded token (the BPE merge fold and the unigram Viterbi), so the
    * comparison costs one scan + one aggregate — not the two corpus
    * scans that composing the single-tokenizer fertility queries would.
    * Emits per `groupCol`: exact char/symbol/piece tallies and both
    * chars-per-unit fertilities.
    */
  def compareFertility(docs: DataFrame, textCol: String, groupCol: String,
                       merges: Seq[(String, String)],
                       vocab: Seq[(String, Long)], maxPieceLen: Int = 4,
                       maxWordLen: Int = 12): DataFrame = {
    val charsOf = filter(split(col("_tok"), "(?!^)"), s => s =!= "")
    val bpeFolded = merges.foldLeft(charsOf) { case (acc, (l, r)) =>
      Bpe.applyMerge(acc, l, r)
    }
    val toks = docs.select(col(groupCol),
      explode(TextFunctions.tokens(col(textCol))).as("_tok"))
    toks
      .join(distinctTokenPieces(toks, vocab, maxPieceLen, maxWordLen),
        Seq("_tok"))
      .select(col(groupCol), length(col("_tok")).cast("long").as("_nc"),
        size(bpeFolded).cast("long").as("_nb"), col("_np").as("_nu"))
      .groupBy(groupCol)
      .agg(sum(col("_nc")).as("n_chars"),
        sum(col("_nb")).as("n_bpe_symbols"),
        sum(col("_nu")).as("n_unigram_pieces"))
      .select(col(groupCol), col("n_chars"), col("n_bpe_symbols"),
        col("n_unigram_pieces"),
        round(col("n_chars").cast("double") /
          nullif(col("n_bpe_symbols").cast("double"), lit(0.0)), 6)
          .as("bpe_fertility"),
        round(col("n_chars").cast("double") /
          nullif(col("n_unigram_pieces").cast("double"), lit(0.0)), 6)
          .as("unigram_fertility"))
  }

  /** Per-token (keyCol, _nc = chars, _np = pieces-after-fallback).
    * The Viterbi DP runs at DISTINCT-TOKEN grain, not per occurrence:
    * the distinct combines map-side (partial hash aggregate) so the
    * exchange carries per-partition distinct tokens, the DP touches the
    * vocabulary-sized frame once, and the result joins back as a
    * broadcast-sized side — Zipf makes per-occurrence DP strictly
    * wasteful at any scale.
    */
  private def tokenPieces(docs: DataFrame, textCol: String,
                          vocab: Seq[(String, Long)], maxPieceLen: Int,
                          maxWordLen: Int, keyCol: Column,
                          keyName: String): DataFrame = {
    val toks = docs.select(keyCol.as(keyName),
      explode(TextFunctions.tokens(col(textCol))).as("_tok"))
    toks.join(distinctTokenPieces(toks, vocab, maxPieceLen, maxWordLen),
        Seq("_tok"))
      .select(col(keyName), length(col("_tok")).cast("long").as("_nc"),
        col("_np"))
  }

  /** (_tok, _np) at distinct-token grain under the fixed vocabulary. */
  private def distinctTokenPieces(toks: DataFrame,
                                  vocab: Seq[(String, Long)],
                                  maxPieceLen: Int,
                                  maxWordLen: Int): DataFrame = {
    val charsOf = filter(split(col("_tok"), "(?!^)"), s => s =!= "")
    val pieces = coalesce(
      segment(col("_tok"), vocab.toMap, maxPieceLen, maxWordLen), charsOf)
    toks.select(col("_tok")).distinct()
      .select(col("_tok"), size(pieces).cast("long").as("_np"))
  }

  // ------------------------------------------------------------------
  // DuckDB replays
  // ------------------------------------------------------------------

  /** The seed-vocabulary CTE chain shared by the replays: `wc(w, freq)`
    * over `documents`, substring counts, `vocab0(piece, c)`.
    */
  private def seedCtes(maxPieceLen: Int, maxWordLen: Int, seedMulti: Int,
                       toksSql: String): String =
    s"""wc AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($toksSql) AS w FROM documents)
       |  WHERE length(w) <= $maxWordLen
       |  GROUP BY w),
       |sub AS MATERIALIZED (
       |  SELECT substr(w, j.j, l.l) AS piece, CAST(sum(freq) AS BIGINT) AS c
       |  FROM wc, range(1, ${maxWordLen + 1}) j(j),
       |       range(1, ${maxPieceLen + 1}) l(l)
       |  WHERE j.j + l.l - 1 <= length(w)
       |  GROUP BY 1),
       |chars0 AS MATERIALIZED (
       |  SELECT piece, c FROM sub WHERE length(piece) = 1),
       |vocab0 AS MATERIALIZED (
       |  SELECT piece, c FROM chars0
       |  UNION ALL
       |  SELECT piece, c FROM (
       |    SELECT piece, c FROM sub WHERE length(piece) > 1
       |    ORDER BY c DESC, piece ASC LIMIT $seedMulti))""".stripMargin

  /** score CTE over a vocab CTE: the same floored millionth-quantized
    * Laplace log-prob as [[scoreMap]].
    */
  private def scoreCte(name: String, vocabCte: String): String =
    s"""$name AS MATERIALIZED (
       |  SELECT piece, CAST(floor(ln((c + 1.0) /
       |           CAST((SELECT sum(c) + count(*) FROM $vocabCte) AS DOUBLE))
       |         * 1000000.0) AS BIGINT) AS s
       |  FROM $vocabCte)""".stripMargin

  /** Unrolled Viterbi DP over `wordsCte(w, ...)` under `scoreCteName`:
    * emits `ball_${tag}_$maxWordLen(w, i, s, np, back)` — best score,
    * piece count, and back-pointer per reachable position. One CTE per
    * position step; every frame referenced twice is MATERIALIZED (a
    * twice-referenced plain CTE inlines exponentially per step).
    */
  private def dpCtes(tag: String, wordsCte: String, scoreCteName: String,
                     maxPieceLen: Int, maxWordLen: Int): Seq[String] = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""edges_$tag AS MATERIALIZED (
               |  SELECT t.w, t.j, t.i, sc.s
               |  FROM (SELECT w, j.j AS j, j.j + l.l AS i,
               |               substr(w, j.j + 1, l.l) AS piece
               |        FROM $wordsCte, range(0, $maxWordLen) j(j),
               |             range(1, ${maxPieceLen + 1}) l(l)
               |        WHERE j.j + l.l <= length(w)) t
               |  JOIN $scoreCteName sc ON sc.piece = t.piece)""".stripMargin
    ctes += s"""ball_${tag}_0 AS MATERIALIZED (
               |  SELECT w, 0 AS i, CAST(0 AS BIGINT) AS s,
               |         CAST(0 AS BIGINT) AS np, 0 AS back
               |  FROM $wordsCte)""".stripMargin
    for (i <- 1 to maxWordLen) {
      ctes += s"""b_${tag}_$i AS (
                 |  SELECT w, i, s, np, back FROM (
                 |    SELECT e.w, $i AS i, p.s + e.s AS s, p.np + 1 AS np,
                 |           e.j AS back,
                 |           row_number() OVER (PARTITION BY e.w
                 |             ORDER BY p.s + e.s DESC, e.j ASC) AS rn
                 |    FROM edges_$tag e
                 |    JOIN ball_${tag}_${i - 1} p ON p.w = e.w AND p.i = e.j
                 |    WHERE e.i = $i)
                 |  WHERE rn = 1)""".stripMargin
      ctes += s"""ball_${tag}_$i AS MATERIALIZED (
                 |  SELECT * FROM ball_${tag}_${i - 1}
                 |  UNION ALL SELECT * FROM b_${tag}_$i)""".stripMargin
    }
    ctes.result()
  }

  /** DuckDB replay of [[train]]: the seed chain, then per EM round the
    * unrolled DP, an unrolled back-trace emitting each chosen piece, the
    * count aggregate, and the prune — every argmax under the same total
    * order and every score the same floored integer, so the replay is
    * bit-stable. ~(2·maxWordLen+6) CTEs per round, generated.
    */
  def trainOracleSql(maxPieceLen: Int, maxWordLen: Int, seedMulti: Int,
                     vocabMulti: Int, rounds: Int, toksSql: String): String = {
    val ctes = Seq.newBuilder[String]
    ctes += seedCtes(maxPieceLen, maxWordLen, seedMulti, toksSql)
    ctes += scoreCte("score0", "vocab0")
    for (r <- 1 to rounds) {
      ctes ++= dpCtes(s"r$r", "wc", s"score${r - 1}", maxPieceLen, maxWordLen)
      // back-trace: walk pos -> back up to maxWordLen times, emitting the
      // piece covering (back, pos] at each step
      ctes += s"""tr_r${r}_0 AS MATERIALIZED (
                 |  SELECT w, freq, length(w) AS pos FROM wc)""".stripMargin
      for (k <- 1 to maxWordLen) {
        ctes += s"""tp_r${r}_$k AS MATERIALIZED (
                   |  SELECT t.w, t.freq, b.back,
                   |         substr(t.w, b.back + 1, t.pos - b.back) AS piece
                   |  FROM tr_r${r}_${k - 1} t
                   |  JOIN ball_r${r}_$maxWordLen b
                   |    ON b.w = t.w AND b.i = t.pos
                   |  WHERE t.pos > 0)""".stripMargin
        ctes += s"""tr_r${r}_$k AS MATERIALIZED (
                   |  SELECT w, freq, back AS pos FROM tp_r${r}_$k)""".stripMargin
      }
      val union = (1 to maxWordLen)
        .map(k => s"SELECT piece, freq FROM tp_r${r}_$k")
        .mkString("\n    UNION ALL ")
      ctes += s"""counts$r AS MATERIALIZED (
                 |  SELECT piece, CAST(sum(freq) AS BIGINT) AS c
                 |  FROM ($union)
                 |  GROUP BY 1)""".stripMargin
      ctes += s"""vocab$r AS MATERIALIZED (
                 |  SELECT v.piece, coalesce(c.c, CAST(0 AS BIGINT)) AS c
                 |  FROM chars0 v LEFT JOIN counts$r c ON c.piece = v.piece
                 |  UNION ALL
                 |  SELECT piece, c FROM (
                 |    SELECT piece, c FROM counts$r WHERE length(piece) > 1
                 |    ORDER BY c DESC, piece ASC LIMIT $vocabMulti))""".stripMargin
      ctes += scoreCte(s"score$r", s"vocab$r")
    }
    s"""WITH ${ctes.result().mkString(",\n")}
       |SELECT v.piece, v.c AS n, s.s AS score
       |FROM vocab$rounds v JOIN score$rounds s ON s.piece = v.piece""".stripMargin
  }

  /** VALUES list for a fixed (piece, score) vocabulary. */
  private def vocabValues(vocab: Seq[(String, Long)]): String =
    vocab.map { case (p, s) => s"('$p', CAST($s AS BIGINT))" }.mkString(", ")

  /** Replay of the fixed-vocab per-token piece count: unrolled DP over
    * the DISTINCT eligible tokens (np carried in the DP state — encode
    * needs counts, not the pieces, so no back-trace), then the fallback
    * CASE per occurrence. Emits `tokstats(<key>, nc, np)`.
    */
  private def encodeCtes(vocab: Seq[(String, Long)], maxPieceLen: Int,
                         maxWordLen: Int, keySql: String,
                         toksSql: String): String = {
    val dp = dpCtes("e", "dt", "vs", maxPieceLen, maxWordLen)
    s"""vs(piece, s) AS (SELECT * FROM (VALUES ${vocabValues(vocab)})),
       |tok AS MATERIALIZED (
       |  SELECT $keySql AS k, unnest($toksSql) AS tok FROM documents),
       |dt AS MATERIALIZED (
       |  SELECT DISTINCT tok AS w FROM tok WHERE length(tok) <= $maxWordLen),
       |${dp.mkString(",\n")},
       |dnp AS MATERIALIZED (
       |  SELECT d.w, b.np
       |  FROM dt d LEFT JOIN ball_e_$maxWordLen b
       |    ON b.w = d.w AND b.i = length(d.w)),
       |tokstats AS (
       |  SELECT t.k, CAST(length(t.tok) AS BIGINT) AS nc,
       |         CAST(CASE WHEN length(t.tok) > $maxWordLen THEN length(t.tok)
       |                   ELSE coalesce(d.np, length(t.tok)) END
       |              AS BIGINT) AS np
       |  FROM tok t LEFT JOIN dnp d ON d.w = t.tok)""".stripMargin
  }

  /** DuckDB replay of [[encodeStats]]. */
  def encodeOracleSql(vocab: Seq[(String, Long)], maxPieceLen: Int,
                      maxWordLen: Int, toksSql: String): String =
    s"""WITH ${encodeCtes(vocab, maxPieceLen, maxWordLen, "doc_id", toksSql)},
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

  /** DuckDB replay of [[compareFertility]]: the unigram DP chain plus
    * the BPE delimiter-wrapped replace chain over the same token CTE,
    * aggregated at group grain and joined.
    */
  def compareFertilityOracleSql(merges: Seq[(String, String)],
                                vocab: Seq[(String, Long)],
                                groupCol: String, maxPieceLen: Int,
                                maxWordLen: Int, toksSql: String): String = {
    val chain = merges.foldLeft("regexp_replace(tok, '(.)', '|\\1|', 'g')") {
      case (acc, (l, r)) => s"replace($acc, '|$l||$r|', '|${l + r}|')"
    }
    s"""WITH ${encodeCtes(vocab, maxPieceLen, maxWordLen, groupCol, toksSql)},
       |uniagg AS (
       |  SELECT k, CAST(sum(nc) AS BIGINT) AS n_chars,
       |         CAST(sum(np) AS BIGINT) AS n_unigram_pieces
       |  FROM tokstats GROUP BY k),
       |bpeagg AS (
       |  SELECT k,
       |         CAST(sum(len(regexp_extract_all($chain, '\\|[^|]+\\|')))
       |              AS BIGINT) AS n_bpe_symbols
       |  FROM tok GROUP BY k)
       |SELECT u.k AS $groupCol, u.n_chars, b.n_bpe_symbols,
       |       u.n_unigram_pieces,
       |       round(CAST(u.n_chars AS DOUBLE)
       |             / nullif(CAST(b.n_bpe_symbols AS DOUBLE), 0.0), 6)
       |         AS bpe_fertility,
       |       round(CAST(u.n_chars AS DOUBLE)
       |             / nullif(CAST(u.n_unigram_pieces AS DOUBLE), 0.0), 6)
       |         AS unigram_fertility
       |FROM uniagg u JOIN bpeagg b ON b.k = u.k""".stripMargin
  }

  /** DuckDB replay of [[fertilityByGroup]]. */
  def fertilityOracleSql(vocab: Seq[(String, Long)], groupCol: String,
                         maxPieceLen: Int, maxWordLen: Int,
                         toksSql: String): String =
    s"""WITH ${encodeCtes(vocab, maxPieceLen, maxWordLen, groupCol, toksSql)}
       |SELECT k AS $groupCol, CAST(count(*) AS BIGINT) AS n_tokens,
       |       CAST(sum(nc) AS BIGINT) AS n_chars,
       |       CAST(sum(np) AS BIGINT) AS n_pieces,
       |       round(CAST(sum(nc) AS DOUBLE)
       |             / nullif(CAST(sum(np) AS DOUBLE), 0.0), 6) AS fertility
       |FROM tokstats GROUP BY k""".stripMargin
}
