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
