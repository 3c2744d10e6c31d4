package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Sequence preparation for LLM training: overlapping token chunking
  * (long doc → context-window slices) and greedy sequence packing
  * (short docs → filled context windows). Both are the map-side final
  * stage of a curation pipeline — after dedup/filter/mix, before
  * tokenizer-side serialization.
  */
object SequencePrep {

  /** Overlapping chunks: windows of `chunkTokens` tokens advancing by
    * `chunkTokens - overlap` (stride). Pure expressions — a sequence
    * generator + slice per chunk, no shuffle at all; every doc yields
    * ceil(max(n - overlap, 1) / stride) chunks. Output grain:
    * (doc_id, chunk_idx, n_tokens, first_token).
    */
  def chunkTokens(docs: DataFrame, chunkTokens: Int, overlap: Int,
                  textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens)
    val stride = chunkTokens - overlap
    val toks = TextFunctions.tokens(col(textCol))
    val nChunks = ceil(greatest(size(col("toks")) - overlap, lit(1))
      .cast("double") / stride).cast("long")
    docs.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), col("toks"),
        posexplode(sequence(lit(0L), nChunks - 1)).as(Seq("p", "chunk_idx")))
      .select(col(idCol), col("chunk_idx"),
        size(slice(col("toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(chunkTokens)))
          .cast("long").as("n_tokens"),
        element_at(col("toks"), (col("chunk_idx") * stride + 1).cast("int"))
          .as("first_token"))
  }

  /** GPT-style concat-and-chunk context layout — the packing most
    * pretraining pipelines actually run: every doc's tokens are
    * conceptually concatenated in the seeded epoch order and the stream is
    * cut into fixed `capacity`-token training blocks, doc boundaries
    * ignored (zero padding anywhere except the final block). Returns the
    * per-doc layout a block-writer seeks by — (doc_id, n_tokens,
    * start_block, offset_in_block, end_block, blocks_spanned) — so block b
    * is materialized from exactly the docs whose [start_block, end_block]
    * interval covers b, with no global re-scan.
    *
    * Scale shape: the stream position is a GLOBAL running token sum, and
    * the naive `sum() OVER (ORDER BY key)` is the single-partition cumsum
    * scale-killer — so this uses the [[Sampling.epochOrder]] discipline:
    * the seeded md5 key's first 3 hex chars form 4096 PREFIX-ORDERED
    * buckets, per-bucket token masses prefix on the driver (4096 longs),
    * and the window cumsum runs WITHIN each bucket plus its offset. All
    * block arithmetic is integer div/mod on longs — engine-exact, so the
    * layout replays bit-for-bit in any SQL engine's one-window spelling.
    */
  def concatLayout(docs: DataFrame, capacity: Long, seed: String,
                   textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    val base = docs.select(col(idCol),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val withK = base.withColumn("_cl_k", key)
      .withColumn("_cl_b",
        conv(substring(col("_cl_k"), 1, 3), 16, 10).cast("int"))
    // tiny: 4096 rows of (bucket, token mass) → driver prefix offsets
    val per = withK.groupBy("_cl_b").agg(sum("n_tokens").as("_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until 4096)
      .scanLeft(0L)((acc, b) => acc + per.getOrElse(b, 0L))
    val spark = docs.sparkSession
    import spark.implicits._
    val offDf = (0 until 4096).map(i => (i, offsets(i)))
      .toDF("_cl_b", "_cl_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_cl_b").orderBy(col("_cl_k"), col(idCol))
    withK.join(broadcast(offDf), Seq("_cl_b"))
      .withColumn("_cl_cum", sum(col("n_tokens")).over(w) + col("_cl_off"))
      .withColumn("start_block",
        expr(s"(_cl_cum - n_tokens) div ${capacity}L"))
      .withColumn("offset_in_block",
        expr(s"(_cl_cum - n_tokens) % ${capacity}L"))
      .withColumn("end_block", expr(s"(_cl_cum - 1) div ${capacity}L"))
      .withColumn("blocks_spanned",
        col("end_block") - col("start_block") + lit(1L))
      .drop("_cl_k", "_cl_b", "_cl_off", "_cl_cum")
  }

  /** Per-block fill report over a [[concatLayout]] frame: for each
    * training block, how many docs touch it, how many START in it, the
    * token fill (== capacity everywhere but the final block), and the
    * fill fraction. Explode mass is one row per (doc, spanned block) —
    * total ≈ corpus tokens / capacity + doc count, linear and map-side;
    * the only shuffle is the block-grain hash aggregate.
    */
  def blockReport(layout: DataFrame, capacity: Long): DataFrame = {
    val lo = col("start_block") * capacity + col("offset_in_block")
    val hi = lo + col("n_tokens")
    layout
      .select(col("n_tokens"), col("start_block"), col("end_block"),
        lo.as("_br_lo"), hi.as("_br_hi"),
        explode(sequence(col("start_block"), col("end_block"))).as("block"))
      .groupBy("block")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("start_block") === col("block"), 1L).otherwise(0L))
          .as("n_starts"),
        sum(least(col("_br_hi"), (col("block") + 1L) * capacity) -
            greatest(col("_br_lo"), col("block") * capacity)).as("n_tokens"))
      .withColumn("fill_frac",
        round(col("n_tokens").cast("double") / capacity, 6))
  }

  /** Greedy first-fit sequence packing: assign docs to context-window bins
    * of `budgetTokens`, packing each partition independently in ascending
    * id order (distributed packing IS per-worker packing — a global
    * optimal assignment would serialize on one node for zero training
    * benefit). A doc longer than the budget gets its own bin (chunk first
    * if that matters). Output: (id, tokens, bin) with bins unique across
    * partitions. Deterministic for a fixed partitioning of the input.
    */
  def packGreedy(docs: DataFrame, budgetTokens: Long,
                 tokenCol: String = "n_tokens",
                 idCol: String = "doc_id"): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long"), col(tokenCol).cast("long"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        // first-fit over id-sorted docs; bins namespaced by partition
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        val sorted = it.toArray.sortBy(_._1)
        val binFill = scala.collection.mutable.ArrayBuffer.empty[Long]
        sorted.iterator.map { case (id, n) =>
          val fit = binFill.indexWhere(_ + n <= budgetTokens)
          val bin =
            if (n >= budgetTokens) { binFill += budgetTokens; binFill.length - 1 }
            else if (fit >= 0) { binFill(fit) += n; fit }
            else { binFill += n; binFill.length - 1 }
          (id, n, (pid << 32) | bin.toLong)
        }
      }
      .toDF(idCol, tokenCol, "bin")
  }
}
