package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** The codegen'd NormalizeExpr must implement java.text.Normalizer exactly
  * for all four forms, short-circuit already-normalized input, and handle
  * nulls/bad forms. The NFC cross-engine agreement is oracled separately
  * (`text_normalize` vs DuckDB nfc_normalize).
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  // explicit escapes: an editor/terminal could silently recompose raw
  // combining sequences and make the fixtures identical
  private val decomposed = "cafe\u0301 u\u0308ber"
  private val precomposed = "caf\u00e9 \u00fcber"
  private val compat = "\ufb01ne \u2460"

  private def norm(c: org.apache.spark.sql.Column, form: String) =
    call_function("graft_normalize", c, lit(form))

  test("all four forms match java.text.Normalizer") {
    GraftFunctions.register(spark)
    val df = Seq(decomposed, precomposed, compat, "plain ascii").toDF("s")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val f = java.text.Normalizer.Form.valueOf(form)
      val got = df.select(col("s"), norm(col("s"), form).as("n")).collect()
      got.foreach { r =>
        assert(r.getString(1) == java.text.Normalizer.normalize(r.getString(0), f),
          s"form=$form input=${r.getString(0)}")
      }
    }
  }

  test("NFC recomposes; NFD decomposes; NFKC folds compatibility chars") {
    GraftFunctions.register(spark)
    val r = Seq((decomposed, precomposed, compat)).toDF("d", "p", "c").select(
      norm(col("d"), "NFC").as("c1"),
      norm(col("p"), "NFD").as("d1"),
      norm(col("c"), "NFKC").as("k1"),
      length(col("d")).as("dl"), length(norm(col("d"), "NFC")).as("cl"))
      .head()
    assert(r.getString(0) == precomposed)
    assert(r.getString(1) == decomposed)
    assert(r.getString(2) == "fine 1") // ligature + circled digit fold
    assert(r.getInt(3) == r.getInt(4) + 2) // two combining marks absorbed
  }

  test("idempotent, null-safe, form case-insensitive; bad form rejects") {
    GraftFunctions.register(spark)
    val df = Seq(Some(decomposed), None).toDF("s")
    val twice = df.select(
      norm(norm(col("s"), "NFC"), "NFC").as("a"), norm(col("s"), "nfc").as("b"))
      .collect()
    assert(twice(0).getString(0) == precomposed)
    assert(twice(0).getString(1) == precomposed)
    assert(twice(1).isNullAt(0) && twice(1).isNullAt(1))
    val err = intercept[Exception] {
      df.select(norm(col("s"), "NFX")).collect()
    }
    assert(err.getMessage.contains("NFX"))
  }

  test("usable from SQL; interpreted path agrees with codegen") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_normalize('plain ascii', 'NFC') AS n")
      .head.getString(0) == "plain ascii")
    // interpreted (no-codegen) evaluation: same expression, eval() path
    val e = graft.plans.NormalizeExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)), "NFC")
    assert(e.eval(null).toString == precomposed)
  }
}
