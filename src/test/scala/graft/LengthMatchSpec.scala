package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Distribution-matching resample: rarest bucket keeps everything,
  * over-represented buckets thin toward the uniform target, decisions are
  * deterministic and partition-invariant.
  */
class LengthMatchSpec extends SparkSpec {
  import spark.implicits._

  // 800 docs in bucket 0, 100 in bucket 256, 100 in bucket 512
  private val docs = Seq.tabulate(1000) { i =>
    val len = if (i < 800) 100L else if (i < 900) 300L else 600L
    (i.toLong, len)
  }.toDF("doc_id", "n_chars")

  test("rarest buckets keep everything; the heavy bucket thins") {
    val out = Sampling.lengthMatchedSample(docs, "n_chars", "doc_id", 256L)
    val per = out.groupBy("bucket")
      .agg(first("keep_ratio").as("kr"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("nk"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(per(256L)._1 == 1.0 && per(256L)._2 == 100L)
    assert(per(512L)._1 == 1.0 && per(512L)._2 == 100L)
    // heavy bucket: ratio (1000/3)/800 over itself-normalized max -> 1/8
    assert(math.abs(per(0L)._1 - 0.125) < 1e-9)
    // ~100 expected kept of 800; the md5 coin is fixed, just sanity-band it
    assert(per(0L)._2 > 60L && per(0L)._2 < 140L, s"kept ${per(0L)._2}")
  }

  test("decisions are partition-invariant") {
    val a = Sampling.lengthMatchedSample(docs.repartition(1), "n_chars",
      "doc_id", 256L).filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.lengthMatchedSample(docs.repartition(13), "n_chars",
      "doc_id", 256L).filter(col("kept")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
