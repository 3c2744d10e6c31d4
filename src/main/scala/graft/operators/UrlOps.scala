package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-grain curation — the first dedup a
  * web-crawl pipeline runs (URL-level, BEFORE any content hashing: the
  * same page is re-crawled under tracking-param/casing/port/fragment
  * variants, and collapsing those is free compared to shingling) plus
  * the C4-style per-domain document cap (no single domain may dominate
  * the mixture).
  *
  * Canonicalization is a fixed, deterministic rewrite — every step a
  * string/array function with identical spelling in Spark and DuckDB:
  *
  *   1. scheme and host lowercased; fragment dropped
  *   2. default ports stripped (`:80` for http, `:443` for https);
  *      other explicit ports kept
  *   3. leading `www.` stripped from the host
  *   4. trailing slashes stripped from the path
  *   5. tracking query params removed (`utm_*`, `gclid`, `fbclid`),
  *      the survivors SORTED and rejoined — param order never splits a
  *      cluster
  *
  * Registered-domain extraction is the standard last-two-labels
  * heuristic with a small embedded multi-label-suffix list (`co.uk`
  * etc. take three labels) — a public-suffix-list subset, documented as
  * such rather than pretending to be the full PSL.
  *
  * Scale shape: canonicalize/domain are pure map-side expressions; the
  * URL-dedup rollup is one hash aggregate at source grain; the domain
  * cap is one window partitioned BY DOMAIN (hash-partitioned, never a
  * global window) ordered by doc_id, so skew is bounded by the hottest
  * domain — exactly the column the cap exists to police.
  */
object UrlOps {

  /** Case-insensitive extraction pattern (Java/RE2 common subset) —
    * crawls emit `HTTPS://` as happily as `https://`.
    */
  val urlRe = "(?i)\\bhttps?://[^\\s]+"

  private val trackRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid)="
  /** Multi-label public suffixes taking three labels (PSL subset). */
  private val threeLabel = Seq("co.uk", "org.uk", "com.au", "co.jp",
    "com.br")

  private def hostPort(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)", 2))

  /** Canonical form of one URL per the five steps above. */
  def canonicalize(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hp = hostPort(url)
    val port = regexp_extract(hp, ":(\\d+)$", 1)
    val host = regexp_replace(regexp_replace(hp, ":\\d+$", ""),
      "^www\\.", "")
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)", 1),
      "/+$", "")
    val params = array_sort(filter(
      split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.rlike(trackRe)))
    val qs = array_join(params, "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(qs =!= "", concat(lit("?"), qs)).otherwise(lit("")))
  }

  /** Registered domain of a (already port-less, lowercased) host:
    * last two labels, or three when the last two are a known
    * multi-label suffix.
    */
  def registeredDomain(host: Column): Column = {
    val lbl = split(host, "\\.")
    val n = size(lbl)
    val lastTwo = concat(element_at(lbl, -2), lit("."), element_at(lbl, -1))
    when(n >= 3 && lastTwo.isin(threeLabel: _*),
      concat(element_at(lbl, -3), lit("."), lastTwo))
      .otherwise(lastTwo)
  }

  /** Host (no port) of the FIRST URL in a text — the doc's origin. */
  def originHost(text: Column): Column = {
    val first = element_at(regexp_extract_all(text, lit(urlRe), lit(0)), 1)
    regexp_replace(regexp_replace(hostPort(first), ":\\d+$", ""),
      "^www\\.", "")
  }

  /** URL-dedup rollup at `groupCol` grain: URLs extracted, distinct raw
    * spellings, distinct canonical forms, and the collapse ratio the
    * canonicalizer buys. One explode + one hash aggregate.
    */
  def urlDedupStats(docs: DataFrame, textCol: String,
                    groupCol: String): DataFrame =
    docs
      .select(col(groupCol),
        explode(regexp_extract_all(col(textCol), lit(urlRe), lit(0)))
          .as("url"))
      .select(col(groupCol), col("url"), canonicalize(col("url")).as("canon"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_urls"),
        countDistinct(col("url")).as("n_raw"),
        countDistinct(col("canon")).as("n_canon"),
        round((countDistinct(col("url")) - countDistinct(col("canon")))
          .cast("double") / countDistinct(col("url")).cast("double"), 6)
          .as("collapse_ratio"))

  /** C4-style per-domain cap: each doc's origin domain, its rank within
    * the domain (by doc_id — deterministic), and whether it survives a
    * keep-at-most-`cap` policy. The rank executes as [[SkewedRank]]'s
    * two-phase bucketed row_number, NOT a naive per-domain window: at web
    * scale one domain can be 10% of the corpus, and a window partitioned
    * by domain alone would funnel that domain through a single task. Same
    * rows out — the oracle replays the naive one-window spelling.
    */
  def domainCap(docs: DataFrame, textCol: String, idCol: String,
                cap: Int): DataFrame = {
    val keyed = docs.select(col(idCol),
      registeredDomain(originHost(col(textCol))).as("domain"))
    // id types without a monotone bucket image (dates, booleans, …) keep
    // the classic per-domain window — same supports() routing as
    // EntityResolution/Cooccurrence, so a previously valid call never
    // starts throwing just because the skew-safe path landed
    val ranked =
      if (SkewedRank.supports(keyed.schema(idCol).dataType))
        SkewedRank.rowNumber(keyed, partCol = "domain", orderCol = idCol)
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("domain").orderBy(col(idCol))
        keyed.withColumn("rk", row_number().over(w).cast("long"))
      }
    ranked
      .withColumn("kept", (col("rk") <= cap).cast("long"))
      .select(col(idCol), col("domain"), col("rk"), col("kept"))
  }

  /** Deterministic messy-URL fixture: every doc gains a CLEAN url and a
    * MESSY twin (uppercased scheme/host, `www.`, explicit default port,
    * trailing slash, shuffled + tracking params, fragment) that must
    * canonicalize to the same string; hosts rotate over 50×7 site
    * domains with every 11th doc on a `co.uk` host to exercise the
    * multi-label-suffix branch. Spark and SQL spell the identical
    * expression.
    */
  def fixtureAug(text: Column, id: Column): Column = {
    val host = when(id % 11 === 0,
      concat(lit("shop"), (id % 5).cast("string"), lit(".co.uk")))
      .otherwise(concat(lit("site"), (id % 50).cast("string"),
        lit(".example"), (id % 7).cast("string"), lit(".com")))
    val pid = (id % 20).cast("string")
    concat(text,
      lit(" https://"), host, lit("/p/"), pid, lit("?a=1&b=2"),
      lit(" HTTPS://WWW."), upper(host), lit(":443/p/"), pid,
      lit("/?b=2&utm_source=news&a=1#s"), id.cast("string"))
  }

  /** DuckDB spelling of [[fixtureAug]] over `documents` columns. */
  val fixtureAugSql: String = {
    val host = ("CASE WHEN doc_id % 11 = 0 THEN 'shop' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk' " +
      "ELSE 'site' || CAST(doc_id % 50 AS VARCHAR) || '.example' || CAST(doc_id % 7 AS VARCHAR) || '.com' END")
    s"text || ' https://' || $host || '/p/' || CAST(doc_id % 20 AS VARCHAR) || '?a=1&b=2'" +
      s" || ' HTTPS://WWW.' || upper($host) || ':443/p/' || CAST(doc_id % 20 AS VARCHAR)" +
      " || '/?b=2&utm_source=news&a=1#s' || CAST(doc_id AS VARCHAR)"
  }

  // ---- DuckDB replays -----------------------------------------------

  /** The canonicalize chain over a column named `url` (SQL fragment). */
  private val canonSql: String = {
    val scheme = "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val hp = "lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)', 2))"
    val port = s"regexp_extract($hp, ':(\\d+)$$', 1)"
    val host = s"regexp_replace(regexp_replace($hp, ':\\d+$$', ''), '^www\\.', '')"
    val path = "regexp_replace(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1), '/+$', '')"
    val qs = ("array_to_string(list_sort(list_filter(" +
      "string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'), " +
      "p -> p <> '' AND NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|gclid|fbclid)='))), '&')")
    s"""$scheme || '://' || $host ||
       |CASE WHEN $port <> ''
       |      AND NOT ($scheme = 'http' AND $port = '80')
       |      AND NOT ($scheme = 'https' AND $port = '443')
       |     THEN ':' || $port ELSE '' END ||
       |$path ||
       |CASE WHEN $qs <> '' THEN '?' || $qs ELSE '' END"""
      .stripMargin.replace("\n", " ")
  }

  /** Registered domain over a column named `h` (SQL fragment). */
  private val domainSql: String = {
    val sufs = threeLabel.map(s => s"'$s'").mkString(", ")
    """CASE WHEN len(string_split(h, '.')) >= 3
      |      AND (string_split(h, '.')[-2] || '.' || string_split(h, '.')[-1]) IN (SUFS)
      |     THEN string_split(h, '.')[-3] || '.' ||
      |          string_split(h, '.')[-2] || '.' || string_split(h, '.')[-1]
      |     ELSE string_split(h, '.')[-2] || '.' || string_split(h, '.')[-1]
      |END""".stripMargin.replace("\n", " ").replace("SUFS", sufs)
  }

  /** DuckDB replay of [[urlDedupStats]] over `$augSql AS text`. */
  def urlDedupOracleSql(groupCol: String, augSql: String): String =
    s"""WITH a AS (
       |  SELECT $groupCol AS grp, $augSql AS text FROM documents),
       |u AS (
       |  SELECT grp, unnest(regexp_extract_all(text,
       |    '(?i)\\bhttps?://[^\\s]+')) AS url
       |  FROM a),
       |c AS (SELECT grp, url, $canonSql AS canon FROM u)
       |SELECT grp AS $groupCol,
       |  CAST(count(*) AS BIGINT) AS n_urls,
       |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw,
       |  CAST(count(DISTINCT canon) AS BIGINT) AS n_canon,
       |  round(CAST(count(DISTINCT url) - count(DISTINCT canon) AS DOUBLE)
       |        / CAST(count(DISTINCT url) AS DOUBLE), 6) AS collapse_ratio
       |FROM c GROUP BY grp""".stripMargin

  /** DuckDB replay of [[domainCap]] over `$augSql AS text`. */
  def domainCapOracleSql(idCol: String, cap: Int, augSql: String): String =
    s"""WITH a AS (
       |  SELECT $idCol, $augSql AS text FROM documents),
       |f AS (
       |  SELECT $idCol,
       |         regexp_extract_all(text, '(?i)\\bhttps?://[^\\s]+')[1] AS url
       |  FROM a),
       |h0 AS (
       |  SELECT $idCol,
       |    regexp_replace(regexp_replace(
       |      lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)', 2)),
       |      ':\\d+$$', ''), '^www\\.', '') AS h
       |  FROM f),
       |d AS (SELECT $idCol, $domainSql AS domain FROM h0),
       |r AS (
       |  SELECT $idCol, domain,
       |         CAST(row_number() OVER (PARTITION BY domain ORDER BY $idCol)
       |              AS BIGINT) AS rk
       |  FROM d)
       |SELECT $idCol, domain, rk,
       |       CAST(CASE WHEN rk <= $cap THEN 1 ELSE 0 END AS BIGINT) AS kept
       |FROM r""".stripMargin
}
