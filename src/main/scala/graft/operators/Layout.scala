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
  /** Order-preserving numeric surrogate for a z-order key: numerics
    * cast straight to double; STRINGS map to an 8-UTF-8-byte window
    * read as an unsigned big-endian integer (hex → base-10 via
    * codegen'd builtins, no UDF). Unsigned byte order IS code-point
    * order, so the surrogate preserves the string order the per-file
    * min/max stats prune on ([[graft.sinks.FileStats]] ASCII/prefix
    * rules). The window starts AFTER the column's global common
    * prefix (the byte-LCP of its min and max — every value in a
    * lexicographic interval shares it), so key spaces like
    * `Customer#000000042` spread over their distinguishing bytes
    * instead of collapsing onto one shared-prefix value. One tiny
    * min/max agg per string key — a layout rewrite is offline, and
    * the rank pass scans anyway. NULL and too-short strings rank as
    * 0 (clustered together, like numeric zero). */
  private def surrogate(df: DataFrame, k: Column): Column =
    df.select(k).schema.head.dataType match {
      case org.apache.spark.sql.types.StringType =>
        val r = df.agg(min(k), max(k)).collect()(0)
        val lcp =
          if (r.isNullAt(0) || r.isNullAt(1)) 0
          else {
            val a = r.getString(0).getBytes("UTF-8")
            val b = r.getString(1).getBytes("UTF-8")
            val n = math.min(a.length, b.length)
            var i = 0
            while (i < n && a(i) == b(i)) i += 1
            // Keep at least one byte so a constant column still maps
            // to a non-null constant surrogate (rank 0), not NULL.
            math.min(i, math.max(0, n - 1))
          }
        // Right-pad the hex window to 16 digits (8 zero bytes) so a
        // SHORTER string never reads as a bigger integer than a longer
        // one it precedes ('b' vs 'aa': 0x62_00… > 0x61_61… — without
        // the pad 0x62 < 0x6161 inverts the order).
        coalesce(
          conv(rpad(hex(substring(k.cast("binary"), lcp + 1, 8)), 16, "0"),
            16, 10).cast("decimal(20,0)").cast("double"),
          lit(0.0))
      case _ => k.cast("double")
    }

  /** The interleaved z-value expression for `keys` over `df`'s value
    * ranges (one stats pass) — the sort key [[zorderBy]] lays files
    * out by, exposed so callers with their own placement discipline
    * (a bucketed table, where the hash layout owns the shuffle) can
    * still z-sort WITHIN their partitions. */
  def zorderKey(df: DataFrame, keys: Seq[Column], bits: Int): Column = {
    val surr = keys.map(k => surrogate(df, k))
    val mm = surr.flatMap(k => Seq(min(k), max(k)))
    val stats = df.agg(mm.head, mm.tail: _*).collect()(0)
    val buckets = (1L << bits).toDouble
    def rank(c: Column, lo: Double, hi: Double): Column =
      least(
        floor((c.cast("double") - lit(lo)) / lit(math.max(1e-12, hi - lo + 1)) * lit(buckets))
          .cast("long"),
        lit((1L << bits) - 1))
    val ranked = surr.zipWithIndex.map { case (k, j) =>
      rank(k, stats.getDouble(2 * j), stats.getDouble(2 * j + 1))
    }
    zValue(ranked, bits)
  }

  def zorderBy(df: DataFrame, keys: Seq[Column], numFiles: Int,
               bits: Int): DataFrame = {
    val z = zorderKey(df, keys, bits)
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
  }

  /** Two-key convenience. */
  def zorderBy(df: DataFrame, a: Column, b: Column, numFiles: Int,
               bits: Int = 8): DataFrame =
    zorderBy(df, Seq(a, b), numFiles, bits)
}
