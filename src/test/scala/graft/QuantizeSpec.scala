package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Int8 quantization must keep near-neighbor structure: top-5 recall vs the
  * exact float ranking stays high, and quantized lanes are integral within
  * [-127, 127].
  */
class QuantizeSpec extends SparkSpec {

  test("quantized lanes integral and bounded; scale positive") {
    val q = Similarity.quantizeInt8(Tables.embeddings(spark, sf()))
    val bad = q.select(explode(col("qvec")).as("x"))
      .filter(col("x") =!= round(col("x"), 0) ||
        abs(col("x")) > 127.0)
    assert(bad.isEmpty)
    assert(q.filter(col("scale") <= 0).isEmpty)
  }

  test("top-5 recall of quantized ranking >= 0.8 vs exact") {
    val e = Tables.embeddings(spark, sf())
    val exact = Similarity.topK(e, 10, 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.topKQuantized(e, 10, 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect quant).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }
}
