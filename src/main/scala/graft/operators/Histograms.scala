package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantile dashboards at delta price: a fixed-range equi-width
  * histogram maintained as a count-only [[Rollup]] over a COMPUTED
  * bin column (the `derive` hook). Bin counts are additive and
  * invertible, so the histogram stays exact under arbitrary DML —
  * updates whose value crosses a bin boundary subtract from the old
  * bin (pre-image) and add to the new one. Quantiles then read from
  * the maintained bins by interpolation, with error bounded by ONE
  * bin width — the explicit approximation trade, chosen at table
  * creation, vs re-scanning 100 TB per refresh for exactness.
  *
  * NULL values land in a sentinel bin (kept maintained so COUNT
  * accounting stays exact) and are excluded from quantiles, matching
  * SQL percentile semantics. */
object Histograms {

  /** Sentinel bin for NULL values. */
  val NullBin = -1

  private val BinCol = "__bin"

  /** The bin expression both the sync and an external replayer use:
    * equi-width over [lo, hi), clamped into [0, bins-1] so outliers
    * land in the edge bins; NULL and NaN → [[NullBin]] (a NaN would
    * otherwise fall into bin 0 through the non-ANSI cast and corrupt
    * the low tail invisibly). */
  def binOf(value: Column, lo: Double, hi: Double, bins: Int): Column = {
    require(bins > 0 && hi > lo, s"need hi > lo and bins > 0")
    val width = (hi - lo) / bins
    when(value.isNull || isnan(value.cast("double")), lit(NullBin))
      .otherwise(
        least(greatest(floor((value - lit(lo)) / lit(width)).cast("int"),
          lit(0)), lit(bins - 1)))
  }

  /** Maintain the histogram at `histRoot` for `srcRoot`: one row per
    * (groupCols…, bin) with its exact `row_count`. The bin derive is
    * RECORDED ([[Rollup.HistBin]] — (col, lo, hi, bins) as table
    * properties), so [[Rollup.enableAutoSync]] replays it: a
    * registered quantile dashboard maintains itself on every source
    * commit with zero manual syncs. */
  def sync(spark: SparkSession, srcRoot: String, histRoot: String,
           srcKeys: Seq[String], groupCols: Seq[String], valueCol: String,
           lo: Double, hi: Double, bins: Int): Long =
    Rollup.sync(spark, srcRoot, histRoot, srcKeys,
      groupCols :+ BinCol, Nil,
      deriveSpec = Some(Rollup.HistBin(valueCol, BinCol, lo, hi, bins)))

  /** Re-bin the histogram to a new range/resolution — the maintenance
    * answer to DATA DRIFT: a [lo, hi) fixed at creation piles drifted
    * values into the clamped edge bins, and quantiles near the edges
    * lose their one-bin-width bound. Raw values are not recoverable
    * from bins, so this is ONE bounded rewrite of the bin table from
    * a source scan pinned at the current source version (every group
    * changes bins, so the scan is the whole table — by design, and
    * exactly once); the cursor rides the same commit, so subsequent
    * [[sync]] calls (which must use the NEW lo/hi/bins) continue
    * incrementally from here. Equivalent to dropping and rebuilding
    * the table, minus losing its history and properties. */
  def rebin(spark: SparkSession, srcRoot: String, histRoot: String,
            groupCols: Seq[String], valueCol: String,
            lo: Double, hi: Double, bins: Int): Long =
    // The NEW (lo, hi, bins) ride the rebuild as the recorded derive,
    // so subsequent syncs — including auto-syncs — bin with the new
    // parameters, not the creation-time ones.
    Rollup.rebuild(spark, srcRoot, histRoot, groupCols :+ BinCol, Nil,
      deriveSpec = Some(Rollup.HistBin(valueCol, BinCol, lo, hi, bins)))

  /** The maintained bins of a histogram table, reader-shaped:
    * (groupCols…, bin, row_count). */
  def bins(hist: DataFrame, groupCols: Seq[String]): DataFrame =
    hist.select((groupCols ++ Seq(BinCol, "row_count")).map(col): _*)
      .withColumnRenamed(BinCol, "bin")

  /** Per-group quantile estimates from the maintained bins: for each
    * requested q, locate its bin by cumulative count and interpolate
    * linearly inside it.
    *
    * Error contract, stated precisely: the selected bin CONTAINS the
    * nearest-rank order statistic (the ⌈q·n⌉-th smallest non-null
    * value), so |estimate − percentile_disc(q)| ≤ one bin width —
    * provided that value lies inside [lo, hi) (a clamped outlier's
    * true magnitude is not recoverable from any histogram). The
    * INTERPOLATED percentile (percentile_cont) can sit farther away
    * when the two order statistics bracketing q straddle empty bins;
    * bound against the disc form, not the cont form. NULL-bin rows
    * are excluded (SQL percentile semantics). Result:
    * (groupCols…, q, value). */
  def quantiles(hist: DataFrame, groupCols: Seq[String], qs: Seq[Double],
                lo: Double, hi: Double, bins: Int): DataFrame =
    quantileWalk(this.bins(hist, groupCols), groupCols, qs, lo, hi, bins)

  /** ONE quantile set over every group merged — bin counts are
    * additive across groups, so the global distribution is a
    * re-aggregation of the maintained bins, never a rescan. Result:
    * (q, value). */
  def globalQuantiles(hist: DataFrame, qs: Seq[Double],
                      lo: Double, hi: Double, bins: Int): DataFrame =
    quantileWalk(
      this.bins(hist, Nil).groupBy(col("bin"))
        .agg(sum(col("row_count")).as("row_count")),
      Nil, qs, lo, hi, bins)

  private def quantileWalk(binRows: DataFrame, groupCols: Seq[String],
                           qs: Seq[Double], lo: Double, hi: Double,
                           bins: Int): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must lie in [0, 1]: $qs")
    val width = (hi - lo) / bins
    // A constant partition key for the global walk: ≤ `bins` rows, so
    // the single-partition window is bounded by construction.
    val parts = if (groupCols.isEmpty) Seq(lit(1)) else groupCols.map(col)
    val wCum = Window.partitionBy(parts: _*).orderBy(col("bin"))
    val wAll = Window.partitionBy(parts: _*)
    val ranked = binRows
      .filter(col("bin") =!= NullBin)
      .withColumn("__cum", sum(col("row_count")).over(wCum))
      .withColumn("__total", sum(col("row_count")).over(wAll))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      // q = 0 must land at the first occupied bin's start: a literal
      // 0 target satisfies no bin (cum − count < 0 never holds), so
      // clamp to an epsilon inside the first row.
      .withColumn("__target",
        greatest(col("q") * col("__total"), lit(1e-9)))
    ranked
      .filter(col("__cum") >= col("__target") &&
        (col("__cum") - col("row_count")) < col("__target"))
      .select(groupCols.map(col) :+ col("q") :+
        (lit(lo) + lit(width) * (col("bin") +
          (col("__target") - (col("__cum") - col("row_count"))) /
            col("row_count"))).as("value"): _*)
  }
}
