package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode-script composition — the routing signal multilingual
  * pipelines cut on BEFORE any model-based language ID (a page that is
  * 40% CJK and 40% Latin goes to neither monolingual pile; script
  * ratios are also the cheapest mojibake/garbage detector: text whose
  * "other" share spikes is usually encoding damage). Five char classes
  * per doc — Latin letters, digits, CJK unified ideographs, Cyrillic,
  * whitespace — plus the remainder, counted via the exact length-delta
  * identity `len(t) - len(regexp_replace(t, class, ''))` with class
  * ranges spelled in the Java-regex/RE2 common `\x{...}` form.
  *
  * Scale shape: five regexp_replace passes per row (all inside one
  * whole-stage-codegen projection) + one group-grain hash aggregate —
  * rides the corpus scan.
  */
object ScriptMix {

  // whitespace is spelled as an explicit char class, NOT \s: Java's \s
  // includes vertical tab (\x0B) while RE2's does not — the one place
  // the two dialects' shorthands disagree for these classes
  private val classes: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z]",
    "digit" -> "[0-9]",
    "cjk" -> "[\\x{4E00}-\\x{9FFF}]",
    "cyrillic" -> "[\\x{0400}-\\x{04FF}]",
    "space" -> "[\\t\\n\\x{0B}\\f\\r ]")

  private val shareOf = classes.map(_._1).filterNot(_ == "space") :+ "other"

  private def classCount(t: Column, re: String): Column =
    (length(t) - length(regexp_replace(t, re, ""))).cast("long")

  /** Per-`groupCol` script mix: char totals per class, the unclassified
    * remainder, and round-6 shares of non-space characters.
    */
  def mix(docs: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val t = col(textCol)
    val perDoc = docs.select(
      col(groupCol) +:
        classes.map { case (n, re) => classCount(t, re).as(s"n_$n") } :+
        length(t).cast("long").as("len"): _*)
    val aggs =
      classes.map { case (n, _) => sum(col(s"n_$n")).as(s"n_$n") } ++ Seq(
        (sum(col("len")) -
          classes.map { case (n, _) => sum(col(s"n_$n")) }.reduce(_ + _))
          .as("n_other"),
        (sum(col("len")) - sum(col("n_space"))).as("nonspace"))
    val shares = shareOf.map(n =>
      round(col(s"n_$n").cast("double") /
        nullif(col("nonspace").cast("double"), lit(0.0)), 6)
        .as(s"${n}_share"))
    perDoc.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .select(Seq(col(groupCol), col("n_docs")) ++
        classes.map(c => col(s"n_${c._1}")) ++ Seq(col("n_other")) ++
        shares: _*)
  }

  /** DuckDB replay of [[mix]] over `$augSql AS text`. */
  def mixOracleSql(groupCol: String, augSql: String): String = {
    val cnt = classes.map { case (n, re) =>
      s"CAST(length(text) - length(regexp_replace(text, '$re', '', 'g')) AS BIGINT) AS n_$n"
    }.mkString(",\n    ")
    val sums = classes.map { case (n, _) => s"CAST(sum(n_$n) AS BIGINT) AS n_$n" }
      .mkString(", ")
    val otherSum = classes.map { case (n, _) => s"sum(n_$n)" }.mkString(" - ")
    val shares = shareOf.map(n =>
      s"round(CAST(n_$n AS DOUBLE) / nullif(CAST(nonspace AS DOUBLE), 0.0), 6) AS ${n}_share")
      .mkString(",\n  ")
    s"""WITH a AS (
       |  SELECT $groupCol AS grp, $augSql AS text FROM documents),
       |per AS (
       |  SELECT grp,
       |    $cnt,
       |    CAST(length(text) AS BIGINT) AS len
       |  FROM a),
       |g AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_docs, $sums,
       |    CAST(sum(len) - $otherSum AS BIGINT) AS n_other,
       |    CAST(sum(len) - sum(n_space) AS BIGINT) AS nonspace
       |  FROM per GROUP BY grp)
       |SELECT grp AS $groupCol, n_docs, n_latin, n_digit, n_cjk,
       |  n_cyrillic, n_space, n_other,
       |  $shares
       |FROM g""".stripMargin
  }
}
