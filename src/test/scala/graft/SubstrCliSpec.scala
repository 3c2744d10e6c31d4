package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{MultiTableTxn, VersionedTable}

/** The `substr-index` CLI verb family driven end-to-end — build (bucketed
  * nightly index) → screen --append (raw daily load) → compact
  * (key-merging bucketed rewrite) → screen --append --redact (cut the
  * flagged spans, load the redacted batch) — with the invariant the
  * redact-and-load loop exists for: the persisted index must always equal
  * the index OF THE CORPUS THE TRANSACTION PINS. Counts computed on
  * pre-redaction text would break that equality the moment a span is cut,
  * so this is the directly observable witness that the appended counts
  * describe the redacted text.
  */
class SubstrCliSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String = {
    val r = s"${System.getProperty("java.io.tmpdir")}/graft_sscli_${name}_" +
      spark.sparkContext.applicationId
    val p = new org.apache.hadoop.fs.Path(r)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    r
  }

  /** Summed persisted index == freshly-hashed index of the pinned corpus. */
  private def indexMatchesCorpus(root: String, w: Int): Unit = {
    val txn = MultiTableTxn(spark, root)
    val t = txn.latest.get
    val persisted = txn.readAt(t, "index")
      .groupBy("h1", "h2").agg(sum("cnt").as("cnt"))
    val fresh = Dedup.exactSubstrIndex(txn.readAt(t, "corpus"), windowTokens = w)
    assert(persisted.exceptAll(fresh).isEmpty &&
      fresh.exceptAll(persisted).isEmpty,
      s"txn $t: persisted index must equal the pinned corpus's own index")
  }

  test("build -> screen --append -> compact -> screen --append --redact " +
    "keeps index ≡ index(pinned corpus) at every stamp") {
    val w = 3
    val root = freshDir("loop")
    val fixtures = freshDir("fix")
    // base shares a 4-token run across two docs; day1 re-ships one of
    // them; day2 re-ships it again (so day2's screen flags a span and the
    // redacted load actually cuts tokens)
    Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta unrelated tail here"),
      (3L, "totally different words with no overlap at all"))
      .toDF("doc_id", "text").write.parquet(s"$fixtures/base.parquet")
    Seq((11L, "alpha beta gamma delta fresh suffix"),
      (12L, "novel content nothing shared anywhere"))
      .toDF("doc_id", "text").write.parquet(s"$fixtures/day1.parquet")
    Seq((21L, "alpha beta gamma delta epsilon closing words"),
      (22L, "still  novel\ttext with\n\nzero base overlap"))
      .toDF("doc_id", "text").write.parquet(s"$fixtures/day2.parquet")

    Cli.run(spark, Array("substr-index", "build", s"$fixtures/base.parquet", root,
      "--window", w.toString, "--buckets", "4"))
    indexMatchesCorpus(root, w)

    Cli.run(spark, Array("substr-index", "screen", s"$fixtures/day1.parquet", root,
      "--append"))
    indexMatchesCorpus(root, w)

    Cli.run(spark, Array("substr-index", "compact", root, "--buckets", "4"))
    val index = VersionedTable(spark, s"$root/index")
    val txn = MultiTableTxn(spark, root)
    val pin = txn.vector(txn.latest.get)("index")._2
    assert(index.manifestOf(pin).dataDirs.size == 1,
      "compact must collapse the appended frames into one dir")
    assert(index.bucketSpecOf(pin).exists(_._1 == 4),
      "compacted dir must carry the bucket layout")
    indexMatchesCorpus(root, w)

    Cli.run(spark, Array("substr-index", "screen", s"$fixtures/day2.parquet", root,
      "--append", "--redact"))
    val t3 = txn.latest.get
    assert(txn.detail(t3)._1 == "substr_daily_load_redacted")
    // doc 21's leading run matched the base: its loaded text is REDACTED,
    // shorter than shipped; doc 22 is untouched
    val corpus = txn.readAt(t3, "corpus")
    val d21 = corpus.filter(col("doc_id") === 21L).head().getAs[String]("text")
    assert(!d21.contains("alpha beta gamma"),
      s"flagged span must be cut from the loaded text, got '$d21'")
    // ... BYTE-identical, including whitespace the tokenizer normalizes:
    // an unflagged doc must keep its ORIGINAL text, not a single-space
    // token re-join (removed_tokens == 0 ⇒ no rewrite)
    val d22 = corpus.filter(col("doc_id") === 22L).head().getAs[String]("text")
    assert(d22 == "still  novel\ttext with\n\nzero base overlap",
      s"unflagged doc's whitespace was mangled by the redacted load: '$d22'")
    // THE invariant: the appended counts describe the redacted text —
    // pre-redaction counts would break this equality
    indexMatchesCorpus(root, w)
  }
}
