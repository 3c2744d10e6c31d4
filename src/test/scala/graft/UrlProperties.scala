package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}

import graft.operators.{Pii, UrlOps}

/** Random-input invariants for the round-9 audit operators: the URL
  * canonicalizer must be IDEMPOTENT (canonicalizing a canonical form
  * changes nothing — the property that makes re-running a dedup pass
  * safe), and the Luhn validator must accept exactly the strings whose
  * standard check digit is in the last position.
  */
object UrlProperties extends Properties("UrlAudit") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark =
    GraftSession.builder("url-props", cores = 4).getOrCreate()
  import spark.implicits._

  private val genHostLabel: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "https", "HTTP", "HTTPS")
    www <- Gen.oneOf("", "www.", "WWW.")
    labels <- Gen.listOfN(2, genHostLabel)
    upcase <- Gen.oneOf(false, true)
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    segs <- Gen.chooseNum(0, 3)
    path <- Gen.listOfN(segs, genHostLabel).map(
      s => if (s.isEmpty) "" else s.mkString("/", "/", ""))
    slash <- Gen.oneOf("", "/", "//")
    params <- Gen.someOf(Seq("a=1", "b=2", "utm_source=x", "gclid=9", "z="))
    frag <- Gen.oneOf("", "#frag", "#s/2")
  } yield {
    val host0 = labels.mkString(".")
    val host = if (upcase) host0.toUpperCase else host0
    val q = if (params.isEmpty) "" else params.mkString("?", "&", "")
    s"$scheme://$www$host$port$path$slash$q$frag"
  }

  private def canonAll(urls: Seq[String]): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalize(col("u")))
      .collect().map(_.getString(0)).toSeq

  property("canonicalize is idempotent") =
    org.scalacheck.Prop.forAllNoShrink(Gen.listOfN(24, genUrl)) { urls =>
      val once = canonAll(urls)
      canonAll(once) == once
    }

  property("canonical form never carries tracking params, www, or its scheme's default port") =
    org.scalacheck.Prop.forAllNoShrink(Gen.listOfN(24, genUrl)) { urls =>
      canonAll(urls).forall { c =>
        val noDefaultPort =
          (!c.startsWith("http://") ||
            (!c.contains(":80/") && !c.endsWith(":80"))) &&
          (!c.startsWith("https://") ||
            (!c.contains(":443/") && !c.endsWith(":443")))
        !c.contains("utm_") && !c.contains("gclid") &&
          !c.contains("#") && !c.contains("://www.") && noDefaultPort
      }
    }

  /** Standard Luhn check digit for a 15-digit payload. */
  private def luhnDigit(p: String): Int = {
    val s = p.reverse.zipWithIndex.map { case (ch, i) =>
      val d = ch - '0'
      if (i % 2 == 0) { val t = d * 2; if (t > 9) t - 9 else t } else d
    }.sum
    (10 - s % 10) % 10
  }

  private val genPayload: Gen[String] =
    Gen.listOfN(15, Gen.chooseNum(0, 9)).map(_.mkString)

  property("luhnValid accepts exactly payload+checkDigit") =
    org.scalacheck.Prop.forAll(Gen.listOfN(16, genPayload)) { ps =>
      ps.isEmpty || {
        val rows = ps.flatMap { p =>
          val ok = luhnDigit(p)
          (0 to 9).map(d => (s"$p$d", d == ok))
        }
        val got = rows.map(_._1).toDF("c")
          .select(col("c"), Pii.luhnValid(col("c")).as("ok"))
          .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
        rows.forall { case (c, expected) => got(c) == expected }
      }
    }
}
