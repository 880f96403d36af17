package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT frequency tables / heavy hitters at delta price — a
  * count-only [[Rollup]] keyed by the value column itself.
  *
  * Counts per (group, value) are additive AND invertible, so the
  * frequency table maintains exactly under inserts, updates (the
  * pre-image subtracts the OLD value's count — a value edit is a move
  * between frequency rows), and deletes — never a rebuild, never a
  * rescan. Unlike a CountMinSketch this is exact; the price is one
  * stored row per live (group, value) pair, which is the right trade
  * whenever the value domain is bounded (languages, sources, status
  * codes, tokens after bucketing) — the common shape of a corpus
  * composition dashboard. */
object Frequencies {

  /** Maintain the frequency table at `freqRoot` for `srcRoot`:
    * one row per (groupCols…, valueCol) with its exact `row_count`.
    * Values must be non-null (the rollup's loud group contract) —
    * pre-map nulls to a sentinel in the source if they matter.
    *
    * High-cardinality guard: one stored row per live (group, value)
    * means an id-like value column silently turns the "summary" table
    * corpus-sized. Each sync probes the WINDOW's distinct-value count
    * per group (the first build probes the whole source — the largest
    * window) and refuses loudly above `maxDistinctPerGroup`; pass 0
    * to opt out for a domain known to be wide on purpose. The probe
    * is one count-shaped aggregation of the window, never an extra
    * source scan.
    *
    * The guard is a RECORDED derive ([[Rollup.FreqGuard]]) — content-
    * identity, so the table stays MV-rewrite-eligible AND the
    * post-commit auto-sync ([[Rollup.enableAutoSync]]) can replay it:
    * a registered frequency dashboard maintains itself with zero
    * manual sync orchestration. */
  def sync(spark: SparkSession, srcRoot: String, freqRoot: String,
           srcKeys: Seq[String], groupCols: Seq[String],
           valueCol: String, maxDistinctPerGroup: Int = 100000): Long =
    Rollup.sync(spark, srcRoot, freqRoot, srcKeys,
      groupCols :+ valueCol, Nil,
      deriveSpec = if (maxDistinctPerGroup <= 0) None
        else Some(Rollup.FreqGuard(groupCols, valueCol, maxDistinctPerGroup)))

  /** Top-k heaviest values per group from a maintained frequency
    * table (ties break value-ascending). With empty `groupCols` this
    * is a single global ranking — fine when the value domain is
    * bounded (the table has one row per distinct value, not per
    * source row). */
  def topK(freq: DataFrame, groupCols: Seq[String], valueCol: String,
           k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("row_count").desc, col(valueCol).asc)
    freq.select((groupCols ++ Seq(valueCol, "row_count")).map(col): _*)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Global heavy hitters from a GROUPED frequency table: counts per
    * value are additive across groups, so the global ranking is a
    * re-aggregation of the maintained rows, never a source rescan.
    * (Plain [[topK]] with empty groupCols would rank the raw
    * (group, value) rows, which is a different question.) */
  def topKGlobal(freq: DataFrame, valueCol: String, k: Int): DataFrame =
    topK(freq.groupBy(col(valueCol))
      .agg(sum(col("row_count")).as("row_count")), Nil, valueCol, k)
}
