package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** No-split greedy sequence packing — the OTHER packing family next to
  * [[SequencePrep.concatLayout]]'s concat-and-chunk: when examples must
  * stay intact (SFT conversations, eval prompts, any doc whose loss mask
  * depends on its boundaries), docs are packed whole into
  * `capacity`-token bins with padding absorbing the slack.
  *
  * Algorithm: NEXT-FIT DECREASING within seeded md5 shards. Each doc
  * hashes to one of `nShards` shards (first 2 hex chars of
  * `md5(seed:doc_id)`, mod `nShards`); within a shard, docs walk in
  * (n_tokens DESC, doc_id ASC) order and a doc that no longer fits the
  * current bin opens a new one. Decreasing order is what makes next-fit
  * respectable (big rocks first, tail docs fill the gaps); a doc longer
  * than `capacity` occupies its own over-full bin — reported, never
  * silently truncated. This is deliberately NOT first-fit: next-fit's
  * walk state is two longs, so the layout replays exactly in a SQL
  * recursion (the oracle) and in any re-run, while first-fit's
  * open-bin list would make both replay and skew analysis murky for a
  * ~4% utilization win at realistic doc/capacity ratios.
  *
  * Scale shape: packing is embarrassingly parallel ACROSS shards and
  * sequential only WITHIN one (bin state is inherently a running fold
  * — this is [[SequencePrep]]'s per-partition imperative case, the one
  * place `mapPartitions` is the honest tool). Rows hash-partition by
  * shard and sort (shard, n_tokens DESC, doc_id) within partitions, so
  * the walk resets cleanly at shard boundaries whatever the partition
  * count; skew is bounded by the largest shard, which the seeded md5
  * keeps uniform. At 100 TB the lever is `nShards` ∝ corpus size (each
  * shard is one training-shard file anyway — the packer's output grain
  * IS the loader's input grain).
  */
object BinPack {

  /** Doc-grain layout: (doc_id, shard, bin, pos_in_bin, offset_in_bin,
    * n_tokens) — bin ids are shard-local and dense, offsets in tokens.
    */
  def nfdPack(docs: DataFrame, capacity: Long, seed: String,
              nShards: Int, textCol: String = "text",
              idCol: String = "doc_id"): DataFrame = {
    require(capacity >= 1 && nShards >= 1 && nShards <= 256)
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs
      .select(col(idCol).cast("long").as("doc_id"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("shard",
        (conv(substring(md5(concat_ws(":", lit(seed),
          col("doc_id").cast("string"))), 1, 2), 16, 10)
          .cast("int") % nShards))
    base.select(col("shard"), col("n_tokens"), col("doc_id"))
      .as[(Int, Long, Long)]
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tokens").desc, col("doc_id"))
      .mapPartitions { it =>
        // running fold: (current shard, bin index, bin fill, pos in bin)
        var shard = Int.MinValue
        var bin = -1L; var fill = 0L; var pos = -1L
        it.map { case (s, n, id) =>
          if (s != shard) { shard = s; bin = -1L; fill = 0L }
          if (bin < 0L || fill + n > capacity) { bin += 1; fill = 0L; pos = -1L }
          val off = fill
          fill += n; pos += 1
          (id, s, bin, pos, off, n)
        }
      }
      .toDF("doc_id", "shard", "bin", "pos_in_bin", "offset_in_bin",
        "n_tokens")
  }

  /** Bin-grain fill report over [[nfdPack]]'s layout: docs per bin,
    * token fill, and utilization (fill/capacity — above 1.0 exactly for
    * the own-bin over-long docs). One hash aggregate.
    */
  def binReport(layout: DataFrame, capacity: Long): DataFrame =
    layout.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("fill"),
        round(sum(col("n_tokens")).cast("double") /
          lit(capacity).cast("double"), 6).as("utilization"))

  /** DuckDB replay: the same shard hash and decreasing order, then the
    * next-fit walk as a linear recursion per shard — state is exactly
    * the operator's two longs (bin fill, bin index) plus the position.
    */
  def packOracleSql(capacity: Long, seed: String, nShards: Int,
                    toksSql: String, binsOnly: Boolean): String = {
    val layout =
      s"""t AS (
         |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n
         |  FROM documents),
         |q AS MATERIALIZED (
         |  SELECT doc_id, n,
         |    CAST(('0x' || substring(md5('$seed' || ':' || CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
         |         % $nShards AS INT) AS shard,
         |    row_number() OVER (
         |      PARTITION BY CAST(('0x' || substring(md5('$seed' || ':' || CAST(doc_id AS VARCHAR)), 1, 2))::BIGINT
         |                        % $nShards AS INT)
         |      ORDER BY n DESC, doc_id) AS rn
         |  FROM t WHERE n > 0),
         |rec AS (
         |  SELECT shard, rn, doc_id, n,
         |         CAST(0 AS BIGINT) AS bin, CAST(0 AS BIGINT) AS pos,
         |         CAST(0 AS BIGINT) AS off, n AS fill
         |  FROM q WHERE rn = 1
         |  UNION ALL
         |  SELECT q.shard, q.rn, q.doc_id, q.n,
         |    CASE WHEN r.fill + q.n > $capacity THEN r.bin + 1 ELSE r.bin END,
         |    CASE WHEN r.fill + q.n > $capacity THEN 0 ELSE r.pos + 1 END,
         |    CASE WHEN r.fill + q.n > $capacity THEN 0 ELSE r.fill END,
         |    CASE WHEN r.fill + q.n > $capacity THEN q.n ELSE r.fill + q.n END
         |  FROM rec r JOIN q ON q.shard = r.shard AND q.rn = r.rn + 1)""".stripMargin
    if (binsOnly)
      s"""WITH RECURSIVE $layout
         |SELECT shard, bin, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS fill,
         |       round(CAST(sum(n) AS DOUBLE) / CAST($capacity AS DOUBLE), 6)
         |         AS utilization
         |FROM rec GROUP BY shard, bin""".stripMargin
    else
      s"""WITH RECURSIVE $layout
         |SELECT doc_id, shard, bin, pos AS pos_in_bin,
         |       off AS offset_in_bin, n AS n_tokens
         |FROM rec""".stripMargin
  }
}
