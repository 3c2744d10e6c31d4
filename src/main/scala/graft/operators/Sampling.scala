package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation — reproducible across runs,
  * engines, and partitionings because the coin is a hash of the row's own
  * id, not an RNG stream (Spark's `sample()` is seed+partition dependent
  * and cannot be oracled).
  *
  * The uniform draw is the first 8 md5 hex chars of the id as an unsigned
  * 32-bit integer over 2^32 — identical in DuckDB as
  * `('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0`.
  *
  * At 100 TB this is the ONLY sane sampling: a pure map-side filter, no
  * shuffle, no driver state, stable under retries/speculation, and the
  * same doc keeps/drops across reprocessing (critical for dataset
  * versioning and dedup-then-sample pipelines).
  */
object Sampling {

  /** Uniform [0, 1) draw derived from the id column. */
  def uniformDraw(idCol: Column): Column =
    (conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10).cast("long") /
      lit(4294967296.0))

  /** Ceiling on the driver-collected (stratum/source × prefix-bucket)
    * count cells of the two-phase rank plans ([[stratifiedExactSplit]],
    * [[interleaveBySource]]). Those collects are BOUNDED MODEL STATE by
    * design — strata are languages/sources, a mixture vocabulary — but a
    * caller passing a data-sized column (domain, URL host) would turn
    * them into a silent driver OOM; the cap converts that into a loud,
    * actionable reject instead.
    */
  val MaxCellsConf = "spark.graft.sampling.maxDriverCells"
  private val DefaultMaxCells = 1000000

  /** Collect `per` (a per-(stratum, bucket) count frame) with the
    * [[MaxCellsConf]] ceiling enforced: the collect is LIMIT-bounded so
    * the driver never materializes more than cap+1 rows even on the
    * failing path.
    */
  private def collectCellsBounded(per: DataFrame,
                                  what: String): Array[org.apache.spark.sql.Row] = {
    val cap = per.sparkSession.conf.getOption(MaxCellsConf)
      .map(_.trim.toInt).getOrElse(DefaultMaxCells)
    require(cap >= 1, s"$MaxCellsConf must be >= 1")
    val rows = per.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: more than $cap (stratum, bucket) count cells would collect " +
        s"to the driver — the stratum/source column has too many distinct " +
        s"values (> ~${math.max(1L, cap / 4096L)}) for the bounded-model-" +
        s"state design; stratify by a vocabulary-sized column (language, " +
        s"source) or raise $MaxCellsConf")
    rows
  }

  /** Keep each row with probability `rate`, deterministically per id. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(uniformDraw(col(idCol)) < rate)

  /** Deterministic k-fold assignment: fold = 32-bit md5 prefix mod k —
    * the cross-validation sibling of [[assignSplit]], with the same
    * guarantees (a doc's fold never changes across runs, engines,
    * partitionings, or corpus growth; map-side, no shuffle). Integer
    * modulo, so fold populations are exact-count comparable and the
    * boundary can never sit on a float rounding edge.
    */
  def assignFold(idCol: Column, k: Int): Column = {
    require(k >= 2 && k <= 1000, "k must be in [2, 1000]")
    conv(substring(md5(idCol.cast("string")), 1, 8), 16, 10)
      .cast("long") % k
  }

  /** Deterministic train/val/test assignment from the same hash draw:
    * cut points in [0,1) ascending; a doc's split never changes across
    * runs, engines, or partitionings — and stays stable as the corpus
    * grows (new docs land in splits without moving old ones), which
    * RNG-based splitters cannot guarantee. Map-side, no shuffle.
    */
  def assignSplit(idCol: Column, cuts: Seq[(Double, String)],
                  last: String): Column = {
    require(cuts.map(_._1) == cuts.map(_._1).sorted, "cuts must ascend")
    val draw = uniformDraw(idCol)
    cuts.foldRight(lit(last): Column) { case ((cut, name), acc) =>
      when(draw < cut, name).otherwise(acc)
    }
  }

  /** Stratified down-sampling to a target mix: per-stratum keep rates
    * (absent strata keep everything — rate 1.0). The training-data "source
    * mixing" op: down-weight over-represented languages/sources while
    * leaving the rest intact.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Double]): DataFrame = {
    val rate = rates.foldLeft(lit(1.0)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(uniformDraw(col(idCol)) < rate)
  }

  /** Deterministic reservoir: at most `k` rows per group, chosen
    * UNIFORMLY among the group's rows by ranking on the md5 draw — the
    * same winners regardless of partitioning, arrival order, or corpus
    * growth pace (a classic streamed reservoir resamples whenever the
    * stream reorders; hashing the id makes the choice a pure function of
    * the data). The per-source document cap every mixing pipeline needs
    * before a dominant crawl swamps the batch. One window sort per group;
    * id tiebreak keeps it total even under (astronomically unlikely) md5
    * ties.
    */
  /** Temperature-based source rebalancing — the multilingual-LM α-sampling
    * rule (keep mass ∝ n_s^α, α<1 flattens the source distribution toward
    * uniform). Deterministic form: every doc of the SMALLEST source is
    * kept, and source s keeps with probability (n_s/n_min)^(α−1), decided
    * by the md5 uniform draw — a pure function of the data, like every
    * sampler here. Rates are rounded to 6 dp so any engine replaying the
    * formula lands on the identical accept/reject boundary. One tiny
    * per-source count aggregate + a broadcast join back; the corpus
    * itself is never shuffled.
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
                        alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
      .withColumn("__rate", round(
        pow(col("__n").cast("double") / col("__nmin"), alpha - 1.0), 6))
      .drop("__n", "__nmin")
    df.join(broadcast(rates), Seq(groupCol))
      .filter(uniformDraw(col(idCol)) < col("__rate"))
      .drop("__rate")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES),
    * deterministic: each row draws u = md5-uniform(id) and ranks by
    * key = u^(1/w); the top-k keys are a weight-proportional sample, and
    * because u is a pure function of the id the winners are identical on
    * every engine/run/partitioning. Keys are rounded to 6 dp with an id
    * tiebreak so replays land the identical cut. Executes as a
    * distributed top-k (TakeOrderedAndProject — per-partition heaps, no
    * global sort materialization).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val key = round(pow(uniformDraw(col(idCol)),
      lit(1.0) / greatest(col(weightCol).cast("double"), lit(1e-9))), 6)
    df.withColumn("__ws_key", key)
      .orderBy(desc("__ws_key"), col(idCol))
      .limit(k)
      .drop("__ws_key")
  }

  /** Deterministic weight-balanced shard assignment (the write-side of a
    * training pipeline: N output shards of ~equal token mass). Semantics
    * are SEQUENTIAL prefix packing — order docs by (md5 draw, id), walk
    * the running weight sum, start shard ⌈total/N⌉ apart — but the
    * execution is a DISTRIBUTED prefix sum: hash-bucket the draw space,
    * aggregate per-bucket weight sums (tiny), prefix the bucket offsets on
    * the driver (bounded by `buckets`), then window-cumsum WITHIN each
    * bucket and add the bucket's offset. No global single-partition
    * window — the classic scalable cumsum, same rows out as the one-window
    * plan any SQL engine replays.
    *
    * A doc's shard is decided by its START offset (cum − w), so every
    * shard's mass is < target + max single weight — the bin-packing bound
    * sequential packing gives.
    */
  def packShards(df: DataFrame, idCol: String, weightCol: String,
                 nShards: Int, buckets: Int = 256): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    require(buckets >= nShards, "buckets must be >= nShards")
    val draw = uniformDraw(col(idCol))
    val b = floor(draw * buckets).cast("int").as("__pk_b")
    val withB = df.withColumn("__pk_b", b)
    // tiny: `buckets` rows of (bucket, weight sum) → driver prefix
    val perBucket = withB.groupBy(col("__pk_b"))
      .agg(sum(col(weightCol).cast("long")).as("__pk_w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = perBucket.values.sum
    val target = (total + nShards - 1) / nShards
    val offsets = (0 until buckets).scanLeft(0L) { (acc, i) =>
      acc + perBucket.getOrElse(i, 0L)
    } // offsets(i) = mass of all buckets before i
    val spark = df.sparkSession
    import spark.implicits._
    val offsetsDf = (0 until buckets).map(i => (i, offsets(i)))
      .toDF("__pk_b", "__pk_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pk_b"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = sum(col(weightCol).cast("long")).over(w) + col("__pk_off")
    withB.join(broadcast(offsetsDf), Seq("__pk_b"))
      .withColumn("shard_id", least(lit(nShards - 1L),
        floor((cum - col(weightCol).cast("long")) / target).cast("long")))
      .drop("__pk_b", "__pk_off")
  }

  def reservoirPerGroup(df: DataFrame, groupCol: String, idCol: String,
                        k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // two-phase bottom-k: rank within (group, hash-salt) sub-groups
    // first and keep each sub-group's k smallest — lossless for ANY
    // sub-grouping (the group's true bottom-k is a subset of the union
    // of per-sub-group bottom-k's) — then rank the ≤ 64·k survivors
    // exactly. A giant group (one source holding most of the corpus)
    // never forms a single sort partition; same rows as the one-window
    // spelling the oracle replays.
    val key = md5(col(idCol).cast("string"))
    val wLoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), pmod(hash(col(idCol)), lit(64)))
      .orderBy(key, col(idCol))
    val pruned = df.withColumn("_rsv_lr", row_number().over(wLoc))
      .filter(col("_rsv_lr") <= k).drop("_rsv_lr")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(key, col(idCol))
    pruned.withColumn("_rsv_rn", row_number().over(w))
      .filter(col("_rsv_rn") <= k).drop("_rsv_rn")
  }

  /** Deterministic EPOCH SHUFFLE: the reproducible global training order
    * every pretraining run needs — position = rank of
    * (md5(seed:id), id) over the whole corpus. Seeded, so epoch 2 is a
    * different-but-reproducible permutation; engine/partitioning/rerun
    * stable because the key is pure data.
    *
    * Scale shape: the naive `row_number() OVER (ORDER BY key)` is a
    * single-partition window — the global-sort scale-killer. Here the
    * first 3 key hex chars form 4096 PREFIX-ORDERED buckets (every key in
    * bucket b sorts before every key in b+1), so global position =
    * driver-prefixed bucket offset (4096 longs) + rank WITHIN the bucket
    * — the [[PrefixSum]] two-phase discipline, rank flavored. Ties on the
    * 128-bit key are broken by id, so collisions cannot wobble the order.
    */
  def epochOrder(df: DataFrame, idCol: String, seed: String): DataFrame = {
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val withK = df.withColumn("_eo_k", key)
      .withColumn("_eo_b", conv(substring(col("_eo_k"), 1, 3), 16, 10)
        .cast("int"))
    val per = withK.groupBy("_eo_b").agg(count(lit(1)).as("_c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until 4096)
      .scanLeft(0L)((acc, b) => acc + per.getOrElse(b, 0L))
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = (0 until 4096).map(i => (i, offsets(i))).toDF("_eo_b", "_eo_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_eo_b").orderBy(col("_eo_k"), col(idCol))
    withK.join(broadcast(offDf), Seq("_eo_b"))
      .withColumn("epoch_pos",
        row_number().over(w).cast("long") + col("_eo_off") - 1L)
      .drop("_eo_b", "_eo_k", "_eo_off")
  }

  /** Distribution-matching (importance) resampling over a bucketed
    * covariate — here used to FLATTEN a length distribution, the standard
    * de-biasing step when a scraped corpus over-represents short pages:
    * per bucket b, ratio_b = target/actual = N/(K·n_b); keep probability
    * = ratio_b / max_b ratio_b (the largest-ratio bucket keeps
    * everything, so no bucket needs upsampling); each doc then keeps
    * deterministically via its id-hash draw. Expected post-sample bucket
    * masses are equal — the uniform target.
    *
    * Scale: one bucket-grain aggregate (K rows, broadcast back), then a
    * map-side filter — the corpus is never shuffled. max-of-ratios is
    * order-insensitive, the per-bucket double arithmetic is a fixed
    * two-operation chain, and the draw is the shared md5 coin, so the
    * whole decision replays in SQL.
    */
  def lengthMatchedSample(df: DataFrame, lenCol: String, idCol: String,
                          bucketWidth: Long): DataFrame = {
    require(bucketWidth >= 1, "bucket width must be >= 1")
    val withB = df.withColumn("_lm_b",
      (col(lenCol).cast("long") / bucketWidth).cast("long") * bucketWidth)
    val stats = withB.groupBy("_lm_b").agg(count(lit(1)).as("_lm_n"))
    val tot = stats.agg(sum("_lm_n").as("_lm_tot"),
      count(lit(1)).as("_lm_k"))
    val ratios = stats.crossJoin(broadcast(tot))
      .withColumn("_lm_r", col("_lm_tot").cast("double") /
        (col("_lm_k").cast("double") * col("_lm_n").cast("double")))
    val maxR = ratios.agg(max("_lm_r").as("_lm_rmax"))
    val keep = ratios.crossJoin(broadcast(maxR))
      .select(col("_lm_b"),
        (col("_lm_r") / col("_lm_rmax")).as("keep_ratio"))
    withB.join(broadcast(keep), Seq("_lm_b"))
      .withColumn("kept", uniformDraw(col(idCol)) < col("keep_ratio"))
      .withColumnRenamed("_lm_b", "bucket")
  }

  /** Round-robin SOURCE INTERLEAVING: global order by (rank-within-source,
    * source) — pass 1 of every source before pass 2 of any, the standard
    * heterogeneous-mixture schedule (no source ever starves, however
    * small). Within a source the order is the seeded epoch shuffle.
    *
    * The global position is CLOSED-FORM, never a global window: for row
    * (source s, rank r), pos = Σ_i min(c_i, r−1) + |{s_i < s : c_i ≥ r}|
    * over the per-source counts c_i — a driver-collected array of
    * (source, count) pairs (one per source, the tiny-model-state pattern)
    * folded per row with `aggregate` HOFs. The per-source rank itself is
    * the [[epochOrder]]/[[stratifiedExactSplit]] two-phase: md5-prefix
    * buckets within each source (an 80%-of-corpus source never forms one
    * sort partition), offsets from a (sources × 4096)-row driver fold —
    * bounded model state, sources are a mixture vocabulary.
    */
  def interleaveBySource(df: DataFrame, idCol: String, sourceCol: String,
                         seed: String): DataFrame = {
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val withK = df.withColumn("_il_k", key)
      .withColumn("_il_b",
        conv(substring(col("_il_k"), 1, 3), 16, 10).cast("int"))
    // ONE corpus pass: the per-(source, bucket) cells also carry the
    // per-source totals (their sums) the closed-form position needs.
    // A NULL source is a first-class group ranked NULLS-FIRST (exactly
    // the window spelling's asc default) — the offset join below is
    // null-safe, so null-source rows rank instead of vanishing through
    // a plain equi-join.
    val per = collectCellsBounded(
      withK.groupBy(sourceCol, "_il_b").agg(count(lit(1)).as("_c")),
      "interleaveBySource")
      .map(r => (Option(r.getString(0)), r.getInt(1), r.getLong(2)))
    val counts = per.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toSeq
      .sortBy { case (s, _) => (s.isDefined, s.getOrElse("")) }
    val arr = array(counts.map { case (s, c) =>
      struct(lit(s.isEmpty).as("n"), lit(s.getOrElse("")).as("s"),
        lit(c).as("c"))
    }: _*)
    val spark = df.sparkSession
    import spark.implicits._
    // offsets for OCCUPIED cells only — the bucket is a function of the
    // row, so the join can never probe an absent (source, bucket) cell,
    // and a dense sources×4096 frame is pure broadcast waste
    val offDf = per.groupBy(_._1).toSeq.flatMap { case (s, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.map(_._2).zip(
        sorted.map(_._3).scanLeft(0L)(_ + _)).map {
        case (b, off) => (s.orNull, b, off)
      }
    }.toDF("_il_s", "_il_b2", "_il_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol, "_il_b").orderBy(col("_il_k"), col(idCol))
    val r = col("rank_in_source")
    withK.join(broadcast(offDf),
        col(sourceCol) <=> col("_il_s") && col("_il_b") === col("_il_b2"))
      .withColumn("rank_in_source",
        row_number().over(w).cast("long") + col("_il_off"))
      .drop("_il_k", "_il_b", "_il_s", "_il_b2", "_il_off")
      .withColumn("interleave_pos",
        aggregate(arr, lit(0L), (acc, e) =>
          acc + least(e.getField("c"), r - 1L)) +
          aggregate(arr, lit(0L), (acc, e) =>
            // predecessor sources: null (least) beats any non-null row
            // source; among non-nulls, plain string order — a null ROW
            // source has no predecessors (both branches null out → 0)
            acc + when(((e.getField("n") && col(sourceCol).isNotNull) ||
                (!e.getField("n") && e.getField("s") < col(sourceCol))) &&
              e.getField("c") >= r, 1L).otherwise(0L)))
  }

  /** EXACT-proportion stratified split: within every stratum, rank docs
    * by the seeded md5 draw and cut at ⌈fᵢ·n_stratum⌉ — so each
    * (stratum, split) cell holds exactly its share (±0 docs, vs the
    * ±√n binomial wobble of [[assignSplit]]'s per-doc coin). This is
    * scikit-learn's `stratify=` contract: a 10-doc language still gets
    * its val/test docs instead of losing them to coin variance.
    *
    * Scale shape: the in-stratum rank uses the PrefixSum two-phase
    * discipline, NOT a per-stratum global sort window — the md5 key's
    * first 3 hex digits split each stratum into 4096 prefix-ordered
    * buckets, a (strata × 4096)-row count aggregate collects to the
    * driver (bounded model state: strata are languages/sources, never
    * data-sized), per-bucket offsets broadcast back, and the only window
    * sorts single (stratum, bucket) cells of ~n_s/4096 rows. A dominant
    * 80%-of-corpus language therefore never forms one giant sort
    * partition. The rank, cuts, and draw are pure functions of
    * (seed, id, stratum counts) — partition-invariant and replayable.
    */
  def stratifiedExactSplit(df: DataFrame, strataCol: String, idCol: String,
                           seed: String, cuts: Seq[(Double, String)],
                           last: String): DataFrame = {
    require(cuts.map(_._1) == cuts.map(_._1).sorted, "cuts must ascend")
    val key = md5(concat_ws(":", lit(seed), col(idCol).cast("string")))
    val withK = df.withColumn("_sx_k", key)
      .withColumn("_sx_b",
        conv(substring(col("_sx_k"), 1, 3), 16, 10).cast("int"))
    // a NULL stratum is a first-class group (the null-safe join below —
    // a plain equi-join would silently drop those rows from every split)
    val per = collectCellsBounded(
      withK.groupBy(strataCol, "_sx_b").agg(count(lit(1)).as("_c")),
      "stratifiedExactSplit")
      .map(r => (Option(r.getString(0)), r.getInt(1), r.getLong(2)))
    val spark = df.sparkSession
    import spark.implicits._
    // offsets + stratum total for OCCUPIED cells only — the bucket is a
    // function of the row, so the join never probes an absent cell, and
    // a dense strata×4096 frame is pure broadcast waste
    val offDf = per.groupBy(_._1).toSeq.flatMap { case (s, rows) =>
      val sorted = rows.sortBy(_._2)
      val total = sorted.map(_._3).sum
      sorted.map(_._2).zip(
        sorted.map(_._3).scanLeft(0L)(_ + _)).map {
        case (b, off) => (s.orNull, b, off, total)
      }
    }.toDF("_sx_s", "_sx_b2", "_sx_off", "_sx_n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol, "_sx_b").orderBy(col("_sx_k"), col(idCol))
    val pos = row_number().over(w).cast("long") + col("_sx_off") - 1L
    val label = cuts.foldRight(lit(last): Column) { case ((cut, name), acc) =>
      when(col("_sx_pos") < ceil(lit(cut) * col("_sx_n")), name)
        .otherwise(acc)
    }
    withK.join(broadcast(offDf),
        col(strataCol) <=> col("_sx_s") && col("_sx_b") === col("_sx_b2"))
      .withColumn("_sx_pos", pos)
      .withColumn("split", label)
      .drop("_sx_k", "_sx_b", "_sx_s", "_sx_b2", "_sx_off", "_sx_n",
        "_sx_pos")
  }
}
