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

  /** Morton (Z-order) value of N non-negative int keys, interleaved
    * round-robin: bit i of key j lands at position i*N + j. Pure
    * shift/and/or arithmetic — whole-stage codegen, no UDF — and
    * simple enough for an external SQL engine to replay. Keys wider
    * than `bits` bits must be range-rank-compressed first (at 100 TB:
    * zvalue over `ntile` ranks, not raw keys, so skew can't crowd one
    * prefix). `bits * N` must fit a signed long. */
  def zValue(keys: Seq[Column], bits: Int = 16): Column = {
    val n = keys.size
    require(n >= 1, "zValue needs at least one key")
    require(bits * n <= 63, s"$n keys at $bits bits overflow a long")
    (0 until bits).flatMap { i =>
      keys.zipWithIndex.map { case (k, j) =>
        shiftleft(shiftright(k.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Two-key convenience (bit i of `a` at 2i, of `b` at 2i+1). */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column =
    zValue(Seq(a, b), bits)

  /** Rewrite `df` into `numFiles` output chunks z-ordered on `keys`:
    * range-partition then sort by the interleaved value, so each file
    * covers a small hyper-rectangle of the key space and min-max stats
    * prune multi-dimensional predicates. One range shuffle — the same
    * cost as a plain global sort — plus one tiny min/max stats job.
    *
    * Every key is first scaled to `bits`-bit ranks from its actual
    * min/max: raw interleaving of unequal-width keys (say an 11-bit
    * and a 7-bit one) degenerates to a plain sort on the wide key,
    * because its high bits occupy the z-value's top positions with no
    * partner bits between them. */
  def zorderBy(df: DataFrame, keys: Seq[Column], numFiles: Int,
               bits: Int): DataFrame = {
    val mm = keys.flatMap(k => Seq(min(k.cast("double")), max(k.cast("double"))))
    val stats = df.agg(mm.head, mm.tail: _*).collect()(0)
    val buckets = (1L << bits).toDouble
    def rank(c: Column, lo: Double, hi: Double): Column =
      least(
        floor((c.cast("double") - lit(lo)) / lit(math.max(1e-12, hi - lo + 1)) * lit(buckets))
          .cast("long"),
        lit((1L << bits) - 1))
    val ranked = keys.zipWithIndex.map { case (k, j) =>
      rank(k, stats.getDouble(2 * j), stats.getDouble(2 * j + 1))
    }
    val z = zValue(ranked, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Two-key convenience. */
  def zorderBy(df: DataFrame, a: Column, b: Column, numFiles: Int,
               bits: Int = 8): DataFrame =
    zorderBy(df, Seq(a, b), numFiles, bits)
}
