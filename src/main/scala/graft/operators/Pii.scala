package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection audit — the measurement half of the redaction pass
  * ([[graft.functions.TextFunctions.scrub]] is the rewrite half; a
  * production pipeline runs BOTH: scrub rewrites, this reports what was
  * found so the release note can say "N emails, M card numbers" with
  * validation, not just regex shape). Four classes, each restricted to
  * the Java-regex / RE2 common subset so the DuckDB oracle replays the
  * same matches:
  *
  *   - email (the [[graft.functions.TextFunctions.emailPattern]] shape)
  *   - IPv4, shape-matched then RANGE-VALIDATED (every octet ≤ 255 as an
  *     integer — `999.1.2.3` is a shape match but not a finding)
  *   - 16-digit card numbers, shape-matched then LUHN-VALIDATED (the
  *     mod-10 double-every-second-from-the-right checksum, integer-exact
  *     in both engines — a random 16-digit string is a 10% false
  *     positive without it)
  *   - SSN-shaped `ddd-dd-dddd`
  *
  * Scale shape: every class is `regexp_extract_all` + an `aggregate`/
  * `filter` fold over the matches — pure map-side, codegen-friendly,
  * zero shuffle before the single group-grain hash aggregate. At 100 TB
  * this is one scan of the corpus; the validation folds run on match
  * lists (a handful of elements), never on the text.
  */
object Pii {

  /** Same shape as TextFunctions.emailPattern (kept verbatim). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted quad; range validity checked separately ([[ipv4Valid]]). */
  val ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** 16 consecutive digits; checksum validity via [[luhnValid]]. */
  val cardRe = "\\b\\d{16}\\b"
  val ssnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** Every dot-separated octet ≤ 255 (each is 1–3 digits by the regex,
    * so the int cast cannot overflow).
    */
  private[graft] def ipv4Valid(ip: Column): Column =
    forall(split(ip, "\\."), o => o.cast("int") <= 255)

  /** Luhn mod-10 over a 16-digit string: double every second digit from
    * the RIGHT (positions 2, 4, … of the reversed string), subtract 9
    * when the double exceeds 9, sum ≡ 0 (mod 10). All-integer — both
    * engines compute the identical sum.
    */
  private[graft] def luhnValid(c: Column): Column = {
    val s = aggregate(sequence(lit(1), lit(16)), lit(0), (acc, i) => {
      val d = reverse(c).substr(i, lit(1)).cast("int")
      acc + when(i % 2 === 0,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    s % 10 === 0
  }

  /** Redaction-audit aggregate at `groupCol` grain: shape-match counts
    * per class, validated counts where validation exists, the number of
    * docs carrying at least one VALIDATED finding, and validated
    * findings per doc. One scan, one hash aggregate.
    */
  def piiStats(docs: DataFrame, textCol: String,
               groupCol: String): DataFrame = {
    val t = col(textCol)
    val emails = size(regexp_extract_all(t, lit(emailRe), lit(0)))
    val ips = regexp_extract_all(t, lit(ipv4Re), lit(0))
    val ipsOk = size(filter(ips, ipv4Valid _))
    val cards = regexp_extract_all(t, lit(cardRe), lit(0))
    val cardsOk = size(filter(cards, luhnValid _))
    val ssns = size(regexp_extract_all(t, lit(ssnRe), lit(0)))
    val validated = emails + ipsOk + cardsOk + ssns
    docs
      .select(col(groupCol),
        emails.cast("long").as("_em"),
        size(ips).cast("long").as("_ip"), ipsOk.cast("long").as("_ipok"),
        size(cards).cast("long").as("_cd"), cardsOk.cast("long").as("_cdok"),
        ssns.cast("long").as("_ssn"),
        (validated > 0).cast("long").as("_hit"),
        validated.cast("long").as("_val"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_hit")).as("docs_with_pii"),
        sum(col("_em")).as("n_emails"),
        sum(col("_ip")).as("n_ipv4"),
        sum(col("_ipok")).as("n_ipv4_valid"),
        sum(col("_cd")).as("n_cards"),
        sum(col("_cdok")).as("n_cards_luhn"),
        sum(col("_ssn")).as("n_ssn"),
        round(sum(col("_val")).cast("double") /
          count(lit(1)).cast("double"), 6).as("pii_per_doc"))
  }

  /** Deterministic PII fixture: every doc gains an IPv4 whose first
    * octet runs 0–299 (~15% shape-match-but-invalid), a 16-digit card
    * (Luhn holds for ~10%), an SSN on doc_id%3=0 and an email on
    * doc_id%2=0 — every class and both validation branches carry signal
    * at any SF. Spark and SQL spell the identical expression.
    */
  def fixtureAug(text: Column, id: Column): Column =
    concat(text,
      lit(" ip "), (id % 300).cast("string"),
      lit("."), ((id * 7) % 256).cast("string"),
      lit("."), ((id * 13) % 256).cast("string"),
      lit("."), (id % 250).cast("string"),
      lit(" card "),
      lpad((((id % 1000000000L) * 2654435761L) % 10000000000000000L)
        .cast("string"), 16, "0"),
      when(id % 3 === 0, concat(lit(" ssn "),
        lpad((id % 1000).cast("string"), 3, "0"), lit("-"),
        lpad((id % 100).cast("string"), 2, "0"), lit("-"),
        lpad((id % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(id % 2 === 0, concat(lit(" mail user"),
        id.cast("string"), lit("@mail.example.com")))
        .otherwise(lit("")))

  /** DuckDB spelling of [[fixtureAug]] over `documents` columns. */
  val fixtureAugSql: String =
    """text || ' ip ' || CAST(doc_id % 300 AS VARCHAR)
      |  || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
      |  || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)
      |  || '.' || CAST(doc_id % 250 AS VARCHAR)
      |  || ' card ' || lpad(CAST(((doc_id % 1000000000) * 2654435761) % 10000000000000000 AS VARCHAR), 16, '0')
      |  || CASE WHEN doc_id % 3 = 0 THEN ' ssn '
      |       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
      |       || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-'
      |       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      |     ELSE '' END
      |  || CASE WHEN doc_id % 2 = 0 THEN ' mail user'
      |       || CAST(doc_id AS VARCHAR) || '@mail.example.com'
      |     ELSE '' END""".stripMargin.replace("\n", " ")

  /** DuckDB replay of [[piiStats]] over `FROM (SELECT grp, aug AS text)`:
    * the same four regexes (RE2/Java common subset), the octet fold as
    * `list_filter` + `CAST ≤ 255`, the Luhn fold as a `list_sum` over
    * `range(1, 17)` spelling the identical double/subtract-9 arithmetic.
    */
  def statsOracleSql(groupCol: String, augSql: String): String = {
    val lu = """list_sum(list_transform(range(1, 17), i ->
               |  CASE WHEN i % 2 = 0
               |       THEN CASE WHEN 2 * CAST(substr(reverse(c), CAST(i AS INT), 1) AS INT) > 9
               |                 THEN 2 * CAST(substr(reverse(c), CAST(i AS INT), 1) AS INT) - 9
               |                 ELSE 2 * CAST(substr(reverse(c), CAST(i AS INT), 1) AS INT) END
               |       ELSE CAST(substr(reverse(c), CAST(i AS INT), 1) AS INT) END)) % 10 = 0"""
      .stripMargin.replace("\n", " ").replaceAll(" +", " ")
    s"""WITH a AS (
       |  SELECT $groupCol AS grp, $augSql AS text FROM documents),
       |per AS (
       |  SELECT grp,
       |    CAST(len(regexp_extract_all(text, '$emailRe')) AS BIGINT) AS em,
       |    CAST(len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT) AS ip,
       |    CAST(len(list_filter(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b'),
       |      m -> len(list_filter(string_split(m, '.'), o -> CAST(o AS INT) > 255)) = 0)) AS BIGINT) AS ipok,
       |    CAST(len(regexp_extract_all(text, '\\b\\d{16}\\b')) AS BIGINT) AS cd,
       |    CAST(len(list_filter(regexp_extract_all(text, '\\b\\d{16}\\b'),
       |      c -> $lu)) AS BIGINT) AS cdok,
       |    CAST(len(regexp_extract_all(text, '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS ssn
       |  FROM a)
       |SELECT grp AS $groupCol,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN em + ipok + cdok + ssn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       |  CAST(sum(em) AS BIGINT) AS n_emails,
       |  CAST(sum(ip) AS BIGINT) AS n_ipv4,
       |  CAST(sum(ipok) AS BIGINT) AS n_ipv4_valid,
       |  CAST(sum(cd) AS BIGINT) AS n_cards,
       |  CAST(sum(cdok) AS BIGINT) AS n_cards_luhn,
       |  CAST(sum(ssn) AS BIGINT) AS n_ssn,
       |  round(CAST(sum(em + ipok + cdok + ssn) AS DOUBLE)
       |        / CAST(count(*) AS DOUBLE), 6) AS pii_per_doc
       |FROM per GROUP BY grp""".stripMargin
  }
}
