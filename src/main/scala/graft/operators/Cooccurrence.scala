package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Item-item co-occurrence similarity ("customers who bought X also
  * bought Y"): cosine over shared-basket counts,
  * cos(i,j) = c(i,j) / √(d(i)·d(j)) with c = baskets containing both and
  * d = baskets containing the item. The collaborative-filtering member of
  * the similarity family — [[Similarity]] relates EMBEDDINGS, this relates
  * items by pure interaction structure, no vectors needed.
  *
  * Scale shape: the pair generation is the inverted-index self-join every
  * co-occurrence engine uses — and its cost is Σ |basket|², which ONE hot
  * basket (a crawler account touching every item) can blow up
  * quadratically. The guard is a deterministic per-basket cap: first
  * `maxBasketSize` items in item order (row_number, not a sample — replays
  * land the identical set). The cap biases counts LOW for over-capacity
  * baskets, exactly like the hot-shingle cap in [[Dedup]], and must be
  * mirrored by any replay — degrees are computed on the CAPPED sets so
  * cosine stays ≤ 1 and consistent. After the cap: one self-join keyed on
  * basket, one hash agg on (i, j), two broadcast-sized degree joins.
  */
object Cooccurrence {

  def itemCosine(baskets: DataFrame, basketCol: String, itemCol: String,
                 maxBasketSize: Int = 256): DataFrame = {
    val (_, deg, pairs) = cappedPairCounts(baskets, basketCol, itemCol,
      maxBasketSize)
    pairs
      .join(deg.select(col("item").as("i"), col("deg").as("di")), Seq("i"))
      .join(deg.select(col("item").as("j"), col("deg").as("dj")), Seq("j"))
      .select(col("i"), col("j"), col("c"),
        (col("c").cast("double") /
          sqrt((col("di") * col("dj")).cast("double"))).as("cosine"))
  }

  /** Association rules over the same capped machinery — both directions
    * of every co-occurring pair with exact integer counts:
    * support = c/N, confidence = c/d(antecedent),
    * lift = c·N/(d(ante)·d(cons)) (symmetric). The market-basket view of
    * the interaction structure [[itemCosine]] scores as cosine; the same
    * hot-basket cap (and LOW-bias honesty contract) applies.
    */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
            maxBasketSize: Int = 256, minPairCount: Long = 2): DataFrame = {
    val (capped, deg, pairs) = cappedPairCounts(baskets, basketCol, itemCol,
      maxBasketSize)
    val nb = capped.agg(countDistinct(col("basket")).as("nb"))
    val both = pairs.filter(col("c") >= minPairCount)
      .join(deg.select(col("item").as("i"), col("deg").as("di")), Seq("i"))
      .join(deg.select(col("item").as("j"), col("deg").as("dj")), Seq("j"))
      .crossJoin(broadcast(nb))
    val fwd = both.select(col("i").as("antecedent"), col("j").as("consequent"),
      col("c"), col("di").as("d_ante"), col("dj").as("d_cons"), col("nb"))
    val rev = both.select(col("j").as("antecedent"), col("i").as("consequent"),
      col("c"), col("dj").as("d_ante"), col("di").as("d_cons"), col("nb"))
    fwd.unionAll(rev).select(
      col("antecedent"), col("consequent"), col("c"),
      (col("c").cast("double") / col("nb").cast("double")).as("support"),
      (col("c").cast("double") / col("d_ante").cast("double"))
        .as("confidence"),
      ((col("c").cast("double") * col("nb").cast("double"))
        / (col("d_ante").cast("double") * col("d_cons").cast("double")))
        .as("lift"))
  }

  /** Shared cap + degree + pair-count stage: (capped, deg, pairs). */
  private def cappedPairCounts(baskets: DataFrame, basketCol: String,
                               itemCol: String, maxBasketSize: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(maxBasketSize >= 2, "maxBasketSize must be >= 2")
    val b = baskets
      .select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    // the cap exists BECAUSE baskets skew (the crawler account touching
    // every item) — so the rank computing it must not itself funnel the
    // hot basket through one window task; SkewedRank's string-key image
    // ranks items in the same byte-lexicographic order the window would.
    // Item types without a monotone bucket image (dates, booleans) keep
    // the classic window — the public API stays type-agnostic.
    val capped0 =
      if (SkewedRank.supports(b.schema("item").dataType))
        SkewedRank.rowNumber(b, "basket", "item", rankCol = "rn")
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("basket").orderBy("item")
        b.withColumn("rn", row_number().over(w))
      }
    val capped = capped0
      .filter(col("rn") <= maxBasketSize).drop("rn")
      .localCheckpoint() // one shuffle feeds degrees AND both join sides
    val deg = capped.groupBy("item").agg(count(lit(1)).as("deg"))
    val pairs = capped
      .join(capped.select(col("basket"), col("item").as("item_j")), Seq("basket"))
      .filter(col("item") < col("item_j"))
      .groupBy(col("item").as("i"), col("item_j").as("j"))
      .agg(count(lit(1)).as("c"))
    (capped, deg, pairs)
  }
}
