package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Blocklist screening — the C4-style banned-word filter (C4 drops any
  * page containing a word from its blocklist; every production corpus
  * runs some form of this screen before training). Two match grains:
  *
  *   - WORD hits: exact token membership in the word list — an
  *     `array_contains` probe per token over the literal list (for the
  *     catalog sizes real filters ship, low thousands, the probe is a
  *     broadcast-sized in-memory scan inside codegen; past that the
  *     lever is the exploded-token broadcast join, the
  *     [[Decontamination]] shape)
  *   - PHRASE hits: substring occurrence counts via the length-delta
  *     identity `(len(t) - len(replace(t, p))) / len(p)` — exact,
  *     non-overlapping, identical in both engines
  *
  * Everything is map-side expression work over the lowercased text plus
  * one group-grain hash aggregate — at 100 TB this rides the scan the
  * corpus already pays, like every other quality signal here.
  */
object Blocklist {

  /** Per-doc hit columns: (word_hits, phrase_hits). */
  private def hits(textCol: Column, words: Seq[String],
                   phrases: Seq[String]): (Column, Column) = {
    val lt = lower(textCol)
    val toks = TextFunctions.tokens(lt)
    val wordHits =
      size(filter(toks, t => array_contains(typedLit(words), t)))
        .cast("long")
    val phraseHits = phrases
      .map(p => ((length(lt) - length(replace(lt, lit(p), lit("")))) /
        lit(p.length)).cast("long"))
      .reduceOption(_ + _).getOrElse(lit(0L))
    (wordHits, phraseHits)
  }

  /** Screen rollup at `groupCol` grain: docs seen, docs flagged (more
    * than `maxHits` total hits — C4 semantics at the default 0: ANY hit
    * drops), docs kept, hit totals per grain, kept ratio.
    */
  def screen(docs: DataFrame, textCol: String, groupCol: String,
             words: Seq[String], phrases: Seq[String],
             maxHits: Long = 0L): DataFrame = {
    val (w, p) = hits(col(textCol), words, phrases)
    docs
      .select(col(groupCol), w.as("_w"), p.as("_p"),
        (w + p > maxHits).cast("long").as("_flag"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_flag")).as("n_flagged"),
        (count(lit(1)) - sum(col("_flag"))).as("n_kept"),
        sum(col("_w")).as("word_hits"),
        sum(col("_p")).as("phrase_hits"),
        round((count(lit(1)) - sum(col("_flag"))).cast("double") /
          count(lit(1)).cast("double"), 6).as("kept_ratio"))
  }

  /** DuckDB replay of [[screen]] — same token membership (list_filter
    * over the whitespace split), same length-delta phrase count.
    */
  def screenOracleSql(groupCol: String, words: Seq[String],
                      phrases: Seq[String], maxHits: Long,
                      toksSql: String): String = {
    val wl = words.map(graft.queries.OracleSnippets.sqlStr).mkString(", ")
    val wordHits =
      s"CAST(len(list_filter($toksSql, t -> t IN ($wl))) AS BIGINT)"
    val phraseHits =
      if (phrases.isEmpty) "CAST(0 AS BIGINT)"
      else phrases.map { p =>
        val pl = graft.queries.OracleSnippets.sqlStr(p)
        s"CAST((length(lt) - length(replace(lt, $pl, ''))) // ${p.length} AS BIGINT)"
      }.mkString(" + ")
    s"""WITH l AS (
       |  SELECT $groupCol AS grp, lower(text) AS lt FROM documents),
       |per AS (
       |  SELECT grp, $wordHits AS w, $phraseHits AS p
       |  FROM (SELECT grp, lt, lt AS text FROM l))
       |SELECT grp AS $groupCol,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN w + p > $maxHits THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_flagged,
       |  CAST(count(*) - sum(CASE WHEN w + p > $maxHits THEN 1 ELSE 0 END)
       |       AS BIGINT) AS n_kept,
       |  CAST(sum(w) AS BIGINT) AS word_hits,
       |  CAST(sum(p) AS BIGINT) AS phrase_hits,
       |  round(CAST(count(*) - sum(CASE WHEN w + p > $maxHits THEN 1 ELSE 0 END)
       |             AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS kept_ratio
       |FROM per GROUP BY grp""".stripMargin
  }
}
