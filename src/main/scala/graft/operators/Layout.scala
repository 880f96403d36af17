package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: how rows are ORDERED across files decides
  * how much a 100 TB scan can skip. Parquet keeps per-file/row-group
  * min-max stats; a table range-sorted by one key prunes scans on that
  * key only. Z-ordering interleaves the bits of two keys so file
  * ranges stay narrow in BOTH dimensions — two-column predicates then
  * prune files the way single-column predicates do on a sorted table.
  */
object Layout {

  /** Morton (Z-order) value of two non-negative int keys: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. Pure shift/and/or
    * arithmetic — whole-stage codegen, no UDF — and simple enough for
    * an external SQL engine to replay. Keys wider than `bits` bits
    * must be range-rank-compressed first (at 100 TB: zvalue over
    * `ntile` ranks, not raw keys, so skew can't crowd one prefix). */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      val fromA = shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
      val fromB = shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      fromA.bitwiseOR(fromB)
    }.reduce(_ bitwiseOR _)

  /** Rewrite `df` into `numFiles` output chunks z-ordered on (a, b):
    * range-partition then sort by the interleaved value, so each file
    * covers a small rectangle of the (a, b) plane and min-max stats
    * prune two-dimensional predicates. One range shuffle — the same
    * cost as a plain global sort — plus one tiny min/max stats job.
    *
    * Both keys are first scaled to `bits`-bit ranks from their actual
    * min/max: raw interleaving of unequal-width keys (say an 11-bit
    * and a 7-bit one) degenerates to a plain sort on the wide key,
    * because its high bits occupy the z-value's top positions with no
    * partner bits between them. */
  def zorderBy(df: DataFrame, a: Column, b: Column, numFiles: Int,
               bits: Int = 8): DataFrame = {
    val stats = df.agg(
      min(a.cast("double")), max(a.cast("double")),
      min(b.cast("double")), max(b.cast("double"))).collect()(0)
    val (amin, amax) = (stats.getDouble(0), stats.getDouble(1))
    val (bmin, bmax) = (stats.getDouble(2), stats.getDouble(3))
    val buckets = (1L << bits).toDouble
    def rank(c: Column, lo: Double, hi: Double): Column =
      least(
        floor((c.cast("double") - lit(lo)) / lit(math.max(1e-12, hi - lo + 1)) * lit(buckets))
          .cast("long"),
        lit((1L << bits) - 1))
    val z = zValue2(rank(a, amin, amax), rank(b, bmin, bmax), bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }
}
