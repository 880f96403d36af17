package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantity-tier / band resolution (SURVEY §2.4 J5/J6): "price for
  * quantity Q" is a range lookup into `[min, max)` (or open-ended)
  * tiers — the pattern behind MidOcean price scales, Laltex
  * Min/MaxQuantity rows and Keramikos qty×colours grids.
  *
  * Scale design: tier tables are tiny dimensions → broadcast the tier
  * side so the "range join" is a broadcast nested-loop probe that never
  * shuffles the fact table. For big×big range joins, pre-bucket both
  * sides on coarse range buckets to recover an equi-join (see
  * [[bucketedRangeJoin]]).
  */
object RangeJoin {

  /** Inclusive-min / inclusive-max (null max = open-ended) tier lookup.
    * `facts ⟕ broadcast(tiers)` on minCol <= v AND (maxCol is null OR
    * v <= maxCol). Tiers must be non-overlapping for a 1:1 result. */
  def resolveTier(facts: DataFrame, tiers: DataFrame, value: Column,
                  minCol: Column, maxCol: Column): DataFrame =
    facts.join(broadcast(tiers), value >= minCol && (maxCol.isNull || value <= maxCol), "left_outer")

  /** Two-dimensional band resolution (J6): e.g. print-price grids keyed
    * by area band × minimum quantity. */
  def resolveBands2D(facts: DataFrame, bands: DataFrame,
                     v1: Column, min1: Column, max1: Column,
                     v2: Column, min2: Column, max2: Column): DataFrame =
    facts.join(broadcast(bands),
      v1 >= min1 && (max1.isNull || v1 <= max1) &&
      v2 >= min2 && (max2.isNull || v2 <= max2), "left_outer")

  /** As-of style resolution: when tiers carry only ascending `minCol`,
    * the match is the greatest min ≤ value (open-ended last tier).
    * Broadcast inequality probe, then keep the best tier per fact row
    * via a window on the fact key — ALL fact columns are carried
    * through (the key must uniquely identify fact rows). */
  def resolveAsOf(facts: DataFrame, factKey: Seq[String], tiers: DataFrame,
                  value: Column, minCol: Column): DataFrame = {
    val joined = facts.join(broadcast(tiers), value >= minCol, "left_outer")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(factKey.map(col): _*).orderBy(minCol.desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Temporal as-of join for BIG×BIG sides: each fact row picks up the
    * payload of the latest dim row (by timestamp) at or before its own
    * timestamp within the same key — the slowly-changing-dimension
    * lookup. Implemented as union + ONE window pass: tag both sides,
    * sort within key by (ts, dim-first, payload), and carry the last
    * non-null payload forward. Cost is one shuffle on the key — never
    * the |facts|×|dims| blowup of an inequality join, and no broadcast
    * requirement on either side (contrast [[resolveAsOf]], which wants
    * a broadcastable tier table).
    *
    * Tie rules: a dim AT a fact's exact timestamp is visible to it;
    * multiple dims tied on (key, ts) resolve to the GREATEST payload
    * (payload columns ascending in the sort, last wins) so results are
    * deterministic. Facts before any dim get null payloads.
    *
    * Skew note: a hot key serializes into one task (window semantics);
    * at 100 TB pre-split hot keys by a coarse time bucket and stitch
    * the bucket boundaries with a per-(key, bucket) last-dim broadcast.
    */
  def asofJoin(facts: DataFrame, dims: DataFrame, key: String,
               factTs: String, dimTs: String,
               payloads: Seq[String]): DataFrame = {
    require(payloads.forall(p => !facts.columns.contains(p)),
      s"payload columns ${payloads.mkString(",")} must not collide with fact columns")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col("__ts").asc +: col("__dim").desc +:
        payloads.map(p => col(s"__p_$p").asc): _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val dimSide = dims.select(
      col(key) +: col(dimTs).as("__ts") +: lit(1).as("__dim") +:
        payloads.map(p => dims(p).as(s"__p_$p")): _*)
    val factSide = facts
      .withColumn("__ts", col(factTs)).withColumn("__dim", lit(0))
    val union = factSide.unionByName(dimSide, allowMissingColumns = true)
    val filled = payloads.foldLeft(union) { (df, p) =>
      df.withColumn(p, last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__dim") === 0)
      .select(facts.columns.map(col) ++ payloads.map(col): _*)
  }

  /** Big×big range join without a nested loop: overlay a fixed-width
    * bucket grid, explode each tier onto the buckets it spans, equi-join
    * on bucket, then re-check the exact predicate. Shuffle is linear in
    * rows × average buckets-per-tier instead of |facts|×|tiers|. */
  def bucketedRangeJoin(facts: DataFrame, tiers: DataFrame, value: Column,
                        minCol: Column, maxCol: Column, bucketWidth: Long,
                        maxValue: Long): DataFrame = {
    val factB = facts.withColumn("__bucket", floor(value / bucketWidth))
    val tierB = tiers.withColumn("__bucket",
      explode(sequence(floor(minCol / bucketWidth),
        floor(coalesce(maxCol, lit(maxValue)) / bucketWidth))))
    factB.join(tierB, Seq("__bucket"))
      .filter(value >= minCol && (maxCol.isNull || value <= maxCol))
      .drop("__bucket")
  }
}
