package graft

import graft.operators.UrlOps
import org.apache.spark.sql.functions._

/** URL canonicalizer invariants: each rewrite step individually, the
  * messy-twin fixture meeting its clean form, registered-domain suffix
  * handling, and the per-domain cap policy.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalize(col("u")))
      .collect().map(_.getString(0)).toSeq

  test("canonicalize: case, www, default port, slash, fragment, params") {
    assert(canon("HTTPS://WWW.Ex.COM:443/a/b/?z=2&utm_source=x&a=1#frag")
      == Seq("https://ex.com/a/b?a=1&z=2"))
    // non-default port survives; http's default 80 does not
    assert(canon("http://ex.com:8080/x", "HTTP://ex.com:80/x")
      == Seq("http://ex.com:8080/x", "http://ex.com/x"))
    // root path: trailing slash strips to bare authority
    assert(canon("https://ex.com/") == Seq("https://ex.com"))
    // no params survive -> no '?'; gclid/fbclid are tracking too
    assert(canon("https://ex.com/p?gclid=1&fbclid=2") == Seq("https://ex.com/p"))
    // params sort; empty params dropped
    assert(canon("https://ex.com/p?b=2&&a=1") == Seq("https://ex.com/p?a=1&b=2"))
  }

  test("registered domain: two labels default, three for co.uk-class") {
    val got = Seq("a.b.site.example.com", "shop.co.uk", "x.shop.co.uk",
      "plain.org", "co.uk")
      .toDF("h").select(UrlOps.registeredDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("example.com", "shop.co.uk", "shop.co.uk",
      "plain.org", "co.uk"))
  }

  test("fixture: messy twin canonicalizes to exactly the clean URL") {
    val docs = Seq((7L, "body"), (22L, "body"), (0L, "body"))
      .toDF("doc_id", "text")
      .select(UrlOps.fixtureAug(col("text"), col("doc_id")).as("text"))
    val urls = docs.select(explode(
        regexp_extract_all(col("text"), lit(UrlOps.urlRe), lit(0))).as("u"))
      .select(col("u"), UrlOps.canonicalize(col("u")).as("c")).collect()
    assert(urls.length == 6)
    // per doc: 2 raw spellings, 1 canonical form
    assert(urls.map(_.getString(0)).distinct.length == 6)
    assert(urls.map(_.getString(1)).distinct.length == 3)
  }

  test("domain cap keeps the lowest doc_ids and exactly cap per domain") {
    val docs = (1L to 30L).map(i => (i, s"see https://d${i % 2}.com/x"))
      .toDF("doc_id", "text")
    val got = UrlOps.domainCap(docs, "text", "doc_id", cap = 3).collect()
    assert(got.length == 30)
    val kept = got.filter(_.getLong(3) == 1L)
    assert(kept.length == 6) // 3 per each of d0.com / d1.com
    // within a domain the kept ids are the 3 smallest
    val d1kept = kept.filter(_.getString(1) == "d1.com").map(_.getLong(0))
    assert(d1kept.sorted.toSeq == Seq(1L, 3L, 5L))
  }

  test("domain cap falls back to the classic window for date ids") {
    // DateType has no monotone bucket image — the supports() guard must
    // route to the per-domain window, not throw
    val docs = (1 to 10).map { i =>
      (java.sql.Date.valueOf(f"2024-01-${i}%02d"), s"see https://d${i % 2}.com/x")
    }.toDF("doc_id", "text")
    val got = UrlOps.domainCap(docs, "text", "doc_id", cap = 2).collect()
    assert(got.length == 10)
    assert(got.count(_.getLong(3) == 1L) == 4) // 2 per domain
  }
}
