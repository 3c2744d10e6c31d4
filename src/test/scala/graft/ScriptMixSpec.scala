package graft

import graft.operators.ScriptMix

/** Script-mix invariants: hand-counted class totals on a mixed-script
  * fixture, the other-remainder arithmetic, and share normalization
  * over non-space chars.
  */
class ScriptMixSpec extends SparkSpec {
  import spark.implicits._

  test("hand-counted class totals, remainder, and shares") {
    // latin 3 (Abc), cyrillic 3 (где), cjk 2, digits 2, spaces 4, other 1 (!)
    val docs = Seq(("g1", "Abc где 中中 12 !")).toDF("src", "text")
    val r = ScriptMix.mix(docs, "text", "src").collect()(0)
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    def g(n: String): Long = r.getLong(byName(n))
    assert(g("n_latin") == 3 && g("n_cyrillic") == 3 && g("n_cjk") == 2)
    assert(g("n_digit") == 2 && g("n_space") == 4 && g("n_other") == 1)
    // shares normalize over the 11 non-space chars
    assert(r.getDouble(byName("latin_share")) == math.round(3.0 / 11 * 1e6) / 1e6)
    assert(r.getDouble(byName("other_share")) == math.round(1.0 / 11 * 1e6) / 1e6)
  }

  test("pure-ASCII text: zero cjk/cyrillic, zero other on clean prose") {
    val docs = Seq(("g1", "plain ascii words only")).toDF("src", "text")
    val r = ScriptMix.mix(docs, "text", "src").collect()(0)
    val byName = r.schema.fieldNames.zipWithIndex.toMap
    assert(r.getLong(byName("n_cjk")) == 0 &&
      r.getLong(byName("n_cyrillic")) == 0 &&
      r.getLong(byName("n_other")) == 0)
    assert(r.getDouble(byName("latin_share")) == 1.0)
  }
}
