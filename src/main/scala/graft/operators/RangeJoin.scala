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
  /** Both as-of variants stage their state in `__ts`/`__dim`/`__pri`/
    * `__bk`/`__p_*` columns; an input already carrying one of those
    * names would be silently overwritten mid-plan — reject it. */
  private def checkAsofReserved(facts: DataFrame, dims: DataFrame,
                                payloads: Seq[String]): Unit = {
    require(payloads.forall(p => !facts.columns.contains(p)),
      s"payload columns ${payloads.mkString(",")} must not collide with fact columns")
    val reserved = Set("__ts", "__dim", "__pri", "__bk")
    val bad = (facts.columns ++ dims.columns)
      .filter(c => reserved(c) || c.startsWith("__p_")).distinct
    require(bad.isEmpty,
      s"columns ${bad.mkString(",")} collide with as-of join internal names " +
        "(__ts, __dim, __pri, __bk, __p_*) — rename them first")
  }

  def asofJoin(facts: DataFrame, dims: DataFrame, key: String,
               factTs: String, dimTs: String,
               payloads: Seq[String]): DataFrame = {
    checkAsofReserved(facts, dims, payloads)
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
      .select(facts.columns.toSeq.map(col) ++ payloads.map(col): _*)
  }

  /** [[asofJoin]] with hot-key mitigation: the window partitions on
    * (key, time bucket) instead of the bare key, so a key with
    * billions of rows splits across `bucketWidth`-sized slices instead
    * of serializing into one task. Buckets are stitched by
    * carry-forward: each (key, bucket) first reduces to its LAST dim
    * payload (a hash aggregate), a small per-key window over those
    * aggregated rows computes what was in force when each bucket
    * OPENED, and that state is injected as one synthetic dim row at
    * the bucket start. Three shuffles total — (key,bucket) window,
    * per-key window over |keys × buckets| aggregated rows (tiny), and
    * the union — all hash-partitioned, none key-serialized.
    *
    * Timestamps must be castable to long micros via
    * `unix_micros`-style arithmetic; `bucketWidthMicros` picks the
    * slice (e.g. 86_400_000_000L for daily). Same tie rules and
    * results as [[asofJoin]] (spec-pinned equivalence).
    *
    * Measured crossover (SCALE.md): at ~100k rows on the hot key the
    * plain join wins (bucketing's extra shuffles are pure overhead);
    * at ~13M rows on one key this variant is 5× faster (30.7 s →
    * 6.2 s on local[32]) — pick it when a single key's rows outgrow
    * one task's sort. */
  def asofJoinBucketed(facts: DataFrame, dims: DataFrame, key: String,
                       factTs: String, dimTs: String, payloads: Seq[String],
                       bucketWidthMicros: Long): DataFrame = {
    checkAsofReserved(facts, dims, payloads)
    val exprs = org.apache.spark.sql.expressions.Window
    def bucketOf(ts: Column) = floor(unix_micros(ts) / bucketWidthMicros)

    // __pri orders rows tied on __ts: injected seeds (0) lose to real
    // dims (1), which are visible to facts (2) at the same instant —
    // matching asofJoin's tie rules exactly.
    val dimSide = dims.select(
      col(key) +: col(dimTs).as("__ts") +: lit(1).as("__dim") +:
        payloads.map(p => dims(p).as(s"__p_$p")): _*)
      .withColumn("__pri", lit(1))
      .withColumn("__bk", bucketOf(col("__ts")))
    // Last dim state per (key, bucket): what a LATER bucket inherits.
    val perBucket = dimSide
      .groupBy(col(key), col("__bk"))
      .agg(max_by(struct(payloads.map(p => col(s"__p_$p")): _*),
        struct(col("__ts") +: payloads.map(p => col(s"__p_$p")): _*)).as("__last"))
    // Synthetic boundary dims: every bucket that appears on EITHER
    // side inherits the state of the largest dim bucket STRICTLY
    // before it (gap buckets included). Computed as a per-key as-of
    // over the tiny aggregated frame: state rows sort after bucket
    // rows at the same bucket id, so a bucket only sees earlier
    // buckets' state.
    val factSide = facts
      .withColumn("__ts", col(factTs)).withColumn("__dim", lit(0))
      .withColumn("__pri", lit(2))
      .withColumn("__bk", bucketOf(col("__ts")))
    val allBuckets = factSide.select(col(key), col("__bk"))
      .union(dimSide.select(col(key), col("__bk"))).distinct()
    val lastType = perBucket.schema("__last").dataType
    val tiny = perBucket.select(col(key), col("__bk"), lit(1).as("__s"), col("__last"))
      .unionByName(allBuckets.select(col(key), col("__bk"), lit(0).as("__s"),
        lit(null).cast(lastType).as("__last")))
    val wSeed = exprs.partitionBy(col(key))
      .orderBy(col("__bk").asc, col("__s").asc)
      .rowsBetween(exprs.unboundedPreceding, exprs.currentRow)
    val seeds = tiny
      .withColumn("__seed", last(col("__last"), ignoreNulls = true).over(wSeed))
      .filter(col("__s") === 0 && col("__seed").isNotNull)
      .select(Seq(col(key), col("__bk")) ++
        payloads.map(p => col(s"__seed.__p_$p").as(s"__p_$p")): _*)
      .withColumn("__ts", timestamp_micros(col("__bk") * bucketWidthMicros))
      .withColumn("__dim", lit(1))
      .withColumn("__pri", lit(0))
    val union = factSide
      .unionByName(dimSide, allowMissingColumns = true)
      .unionByName(seeds, allowMissingColumns = true)
    val w = exprs.partitionBy(col(key), col("__bk"))
      .orderBy(col("__ts").asc +: col("__pri").asc +:
        payloads.map(p => col(s"__p_$p").asc): _*)
      .rowsBetween(exprs.unboundedPreceding, exprs.currentRow)
    val filled = payloads.foldLeft(union) { (df, p) =>
      df.withColumn(p, last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    filled.filter(col("__dim") === 0)
      .select(facts.columns.toSeq.map(col) ++ payloads.map(col): _*)
  }

  /** [[asofJoin]] with AUTOMATIC variant selection — the scale-safe
    * default when the caller doesn't know their key skew. The plain
    * join serializes each key through one window task, which is
    * optimal until a single key outgrows a task's sort; the bucketed
    * variant adds two metadata-sized shuffles that are pure overhead
    * on uniform keys. SCALE.md measures the crossover at roughly 100k
    * rows on the hottest key (plain wins below; 5× bucketed win at a
    * 12.8M-row key), so that is the default threshold.
    *
    * Selection costs one map-combined count-per-key aggregate over the
    * fact side (shuffles |keys| rows, not |facts|) plus, only when
    * bucketing is chosen, a min/max timestamp probe to derive the
    * bucket width: the hot key's rows are spread over the observed
    * time span, so `span / (maxKeyRows / targetRowsPerBucket)` sizes
    * buckets to ~`targetRowsPerBucket` rows each under a uniform-ish
    * event rate (the regime where bucketing matters; heavy temporal
    * clumping within one key degrades toward plain behavior for the
    * clumped buckets but never changes results). */
  def asofJoinAuto(facts: DataFrame, dims: DataFrame, key: String,
                   factTs: String, dimTs: String, payloads: Seq[String],
                   hotKeyThreshold: Long = 100000L,
                   targetRowsPerBucket: Long = 50000L): DataFrame = {
    require(hotKeyThreshold > 0 && targetRowsPerBucket > 0,
      "thresholds must be positive")
    val hottest = facts.groupBy(col(key)).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).collect()(0)
    val maxPerKey = if (hottest.isNullAt(0)) 0L else hottest.getLong(0)
    if (maxPerKey <= hotKeyThreshold)
      asofJoin(facts, dims, key, factTs, dimTs, payloads)
    else {
      val r = facts.agg(unix_micros(min(col(factTs))),
        unix_micros(max(col(factTs)))).collect()(0)
      // min/max are null when every fact timestamp is null (a hot key
      // can exist with no usable span) — no grid to bucket on, and the
      // plain variant already handles null-ts rows, so degrade to it.
      if (r.isNullAt(0) || r.isNullAt(1))
        asofJoin(facts, dims, key, factTs, dimTs, payloads)
      else {
        val span = math.max(1L, r.getLong(1) - r.getLong(0))
        val nBuckets = math.max(2L, maxPerKey / targetRowsPerBucket)
        asofJoinBucketed(facts, dims, key, factTs, dimTs, payloads,
          bucketWidthMicros = math.max(1L, span / nBuckets))
      }
    }
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
