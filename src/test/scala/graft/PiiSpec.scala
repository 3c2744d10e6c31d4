package graft

import graft.operators.Pii
import org.apache.spark.sql.functions._

/** PII audit invariants: each class matches exactly its hand-built
  * fixtures, validation separates shape matches from findings (octet
  * range for IPv4, Luhn mod-10 for cards), and the group aggregate sums
  * the per-doc truth.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    // one of everything, all valid: 4111111111111111 is the classic
    // Luhn-valid test PAN; 10.0.0.1 in range; ssn-shaped; one email
    ("a", "reach me at bob@corp.example.org host 10.0.0.1 " +
      "pan 4111111111111111 ssn 123-45-6789"),
    // shape matches that must NOT validate: octet 999 out of range,
    // final card digit bumped so the checksum breaks
    ("a", "bad host 999.0.0.1 bad pan 4111111111111112"),
    // nothing PII-shaped at all
    ("b", "perfectly clean prose with numbers 123 and 42"),
    // two emails, one valid ip — multiple matches inside one doc count
    ("b", "x@y.io and z@w.co at 255.255.255.255")
  ).toDF("source", "text")

  test("per-class counts, validation splits, and group rollup") {
    val got = Pii.piiStats(docs, "text", "source")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = got("a")
    assert(a.getLong(1) == 2 && a.getLong(2) == 1) // n_docs, docs_with_pii
    assert(a.getLong(3) == 1)                      // n_emails
    assert(a.getLong(4) == 2 && a.getLong(5) == 1) // ipv4 shape vs valid
    assert(a.getLong(6) == 2 && a.getLong(7) == 1) // cards shape vs luhn
    assert(a.getLong(8) == 1)                      // n_ssn
    assert(a.getDouble(9) == 2.0)                  // (1+1+1+1)/2 docs
    val b = got("b")
    assert(b.getLong(1) == 2 && b.getLong(2) == 1)
    assert(b.getLong(3) == 2 && b.getLong(5) == 1)
    assert(b.getLong(6) == 0 && b.getLong(8) == 0)
    assert(b.getDouble(9) == 1.5)
  }

  test("luhn: classic test PANs validate, off-by-one fails") {
    val pans = Seq("4111111111111111", "5500005555555559",
      "4111111111111112", "1234567812345678").toDF("c")
    val got = pans.select(col("c"), Pii.luhnValid(col("c")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("4111111111111111") && got("5500005555555559"))
    assert(!got("4111111111111112") && !got("1234567812345678"))
  }

  test("ipv4 range check: boundary octets") {
    val ips = Seq("255.255.255.255", "0.0.0.0", "256.1.1.1", "1.1.1.999")
      .toDF("ip")
    val got = ips.select(col("ip"), Pii.ipv4Valid(col("ip")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(got("255.255.255.255") && got("0.0.0.0"))
    assert(!got("256.1.1.1") && !got("1.1.1.999"))
  }

  test("plan: no shuffle before the group aggregate") {
    val plan = Pii.piiStats(docs, "text", "source")
      .queryExecution.optimizedPlan.toString
    // exactly one Aggregate pair (partial+final collapse to one logical
    // Aggregate); no Window, no Join anywhere in the audit
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
  }
}
