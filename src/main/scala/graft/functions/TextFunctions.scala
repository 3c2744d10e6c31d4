package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Text-analysis primitives for a training-data pipeline, all as pure
  * Catalyst Column expressions (codegen-friendly, no UDFs): tokenization,
  * token/char statistics, stopword-based language ID, quality scoring, and
  * document fingerprinting (md5 + polynomial rolling hash).
  *
  * Every function has an exact DuckDB-SQL twin (emitted by the companion
  * snippets in [[graft.queries.TextQueries]]) so the driver's oracle gate
  * pins the semantics.
  */
object TextFunctions {

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Precedence order of the Seq is the tie-break order.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "you", "that"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "que", "pour", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "es" -> Seq("el", "los", "las", "y", "como", "en", "un", "una", "por", "para"))

  /** Whitespace tokenization, empty tokens dropped. */
  def tokens(text: Column): Column =
    F.filter(split(text, "\\s+"), t => t =!= "")

  def tokenCount(toks: Column): Column = size(toks)

  def distinctTokenCount(toks: Column): Column = size(array_distinct(toks))

  /** Sum of token lengths (integer; exact). */
  def tokenLenSum(toks: Column): Column =
    aggregate(toks, lit(0), (acc, t) => acc + length(t))

  /** Count of tokens present in `list`. */
  def hitCount(toks: Column, list: Seq[String]): Column =
    size(F.filter(toks, t => array_contains(typedLit(list), t)))

  /** Stopword-score language ID: argmax of per-language stopword hits with
    * fixed precedence on ties; "und" when no list scores > 0.
    */
  def predictedLang(toks: Column): Column = {
    val scores = stopwords.map { case (lang, list) => lang -> hitCount(toks, list) }
    val cases = scores.zipWithIndex.map { case ((lang, s), i) =>
      val laterScores = scores.drop(i + 1).map(_._2)
      val beats = laterScores.foldLeft(s > 0)((acc, o) => acc && s >= o)
      (beats, lang)
    }
    cases.foldRight(lit("und"): Column) { case ((cond, lang), acc) =>
      when(cond, lang).otherwise(acc)
    }
  }

  /** Composite quality score in [0,1]: stopword density + lexical diversity
    * + length saturation. Deterministic, oracle-mirrored.
    */
  def qualityScore(toks: Column): Column = {
    val n = tokenCount(toks).cast("double")
    val sw = hitCount(toks, stopwords.flatMap(_._2)).cast("double") / nullif(n, lit(0.0))
    val ttr = distinctTokenCount(toks).cast("double") / nullif(n, lit(0.0))
    lit(0.5) * coalesce(sw, lit(0.0)) +
      lit(0.3) * coalesce(ttr, lit(0.0)) +
      lit(0.2) * least(lit(1.0), n / 100.0)
  }

  /** Exact-duplicate fingerprint: md5 of lowercased, whitespace-collapsed,
    * trimmed text.
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** 60-bit token hash shared with the oracle: first 15 hex chars of md5,
    * base-16 → base-10.
    */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Polynomial rolling hash over the token stream (order-sensitive document
    * fingerprint): fold (acc * 131 + h(tok)) mod 1e9+7.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => (acc * 131L + tokenHash(t)) % 1000000007L)

  /** Word n-gram shingles (space-joined), distinct. Sliding over token
    * array via sequence + slice.
    */
  def shingles(toks: Column, n: Int): Column = {
    val cnt = size(toks) - (n - 1)
    // guard: sequence(1, 0) would produce a DESCENDING range, not empty
    when(cnt >= 1,
      array_distinct(F.transform(sequence(lit(1), cnt),
        i => array_join(slice(toks, i, lit(n)), " "))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** Word n-grams (space-joined), NON-distinct — repetition signals need
    * multiplicity, unlike the dedup shingle SETS above.
    */
  def ngrams(toks: Column, n: Int): Column = {
    val cnt = size(toks) - (n - 1)
    when(cnt >= 1,
      F.transform(sequence(lit(1), cnt),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** Highest single-token multiplicity (0 for an empty doc) — the
    * numerator of the Gopher-style top-token-share repetition signal.
    */
  def maxTokenFreq(toks: Column): Column =
    coalesce(array_max(F.transform(array_distinct(toks),
      d => size(F.filter(toks, t => t === d)))), lit(0))

  /** PII/URL scrub patterns — restricted to constructs with IDENTICAL
    * semantics in Java regex (Spark) and RE2 (DuckDB): character classes
    * and greedy quantifiers only, no lookaround/backrefs. URLs scrub
    * FIRST (they may embed '@', which would otherwise double-count as an
    * email).
    */
  val urlPattern = "https?://\\S+"
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Replace every URL with `<URL>`, then every email with `<EMAIL>`. */
  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, urlPattern, "<URL>"),
      emailPattern, "<EMAIL>")
}
