package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A3 — collection statistics (ref: mongodb_loader.py:271-299
  * `collStats` + dict-ified group counts): row count, physical file
  * count/bytes from the filesystem, and group-count breakdowns.
  *
  * Scale: the row count is one distributed count job; file stats come
  * from FileStatus metadata (no data read). The group counts (A1/A2)
  * are single hash aggregates.
  */
object Stats {

  case class TableStats(path: String, rowCount: Long, fileCount: Long,
                        totalBytes: Long)

  /** Physical + logical stats for a parquet table path. */
  def tableStats(spark: SparkSession, path: String): TableStats = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    val rows = spark.read.parquet(path).count()
    TableStats(path, rows, files.size.toLong, files.map(_.getLen).sum)
  }

  /** A1/A2-style group-count breakdown as one row per group. */
  def groupCounts(df: DataFrame, groupCol: String): DataFrame =
    df.groupBy(col(groupCol)).agg(count(lit(1)).as("n")).orderBy(col(groupCol))

  /** Per-column data-quality profile: row count, null count, distinct
    * count, min/max — one output row per profiled column (the
    * ingestion-debugging companion to [[tableStats]]: "which feed
    * column went sparse/constant this sync?").
    *
    * `exact = true` computes exact distincts with one pass PER COLUMN
    * (unioned single-row aggregates — verifiable against any SQL
    * engine). `exact = false` is the 100 TB path: ONE pass over the
    * data for all columns via approx_count_distinct (HLL, ±2% default),
    * no Expand blowup, no per-column rescans. Min/max stringify
    * through DECIMAL for floating columns upstream of the call if
    * cross-engine compares matter (double→string notation differs
    * between engines). */
  def columnProfile(df: DataFrame, cols: Seq[String],
                    exact: Boolean = true): DataFrame = {
    // col() PARSES its argument as a (possibly dotted) attribute path,
    // so a name containing a backtick or dot needs identifier quoting.
    def ref(c: String) = col("`" + c.replace("`", "``") + "`")
    if (exact)
      cols.map { c =>
        df.agg(
          count(lit(1)).as("n_rows"),
          sum(when(ref(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          count_distinct(ref(c)).as("n_distinct"),
          min(ref(c)).cast("string").as("min"),
          max(ref(c)).cast("string").as("max"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min"), col("max"))
      }.reduce(_ unionByName _)
    else {
      val aggs = cols.flatMap { c =>
        Seq(
          sum(when(ref(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
          approx_count_distinct(ref(c)).as(s"__nd_$c"),
          min(ref(c)).cast("string").as(s"__mn_$c"),
          max(ref(c)).cast("string").as(s"__mx_$c"))
      }
      val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
      // stack takes FLAT row-major args (parenthesized groups would
      // parse as named_structs, whose per-column field names differ).
      // Column names are interpolated into SQL literals/identifiers, so
      // quotes and backticks must be escaped or a hostile/unlucky name
      // breaks parsing (the exact branch uses the Column API throughout).
      def lit1(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
      def ident(s: String) = "`" + s.replace("`", "``") + "`"
      val stacked = cols.map(c =>
        s"${lit1(c)}, __n, ${ident(s"__nn_$c")}, ${ident(s"__nd_$c")}, " +
          s"${ident(s"__mn_$c")}, ${ident(s"__mx_$c")}").mkString(", ")
      one.selectExpr(s"stack(${cols.size}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min, max)")
    }
  }

  /** One-row corpus profile for a text column: document count, total
    * whitespace tokens, normalized-vocabulary size, and EXACT
    * token-count percentiles. Percentiles are type-1 (lower)
    * quantiles — the smallest length whose cumulative document count
    * reaches `ceil(p × n)` — computed from a length HISTOGRAM, not a
    * global sort: token lengths have bounded cardinality (≤ max doc
    * length), so the histogram aggregate is corpus-sized map-side
    * work followed by a tiny single-partition cumulative window over
    * distinct lengths. Exact by construction (no approx_percentile
    * sketch), so any SQL engine replays it. Vocabulary is one
    * count_distinct over exploded normalized tokens — the only
    * data-sized shuffle, uniform on the term. */
  def corpusProfile(df: DataFrame, text: org.apache.spark.sql.Column,
                    percentiles: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0 && p <= 1),
      s"percentiles must be in (0, 1], got $percentiles")
    import graft.functions.TextAnalysis
    val spark = df.sparkSession
    // Histogram of per-doc token counts: the corpus-sized work is one
    // map-side-combined aggregate; everything after runs on ≤ |distinct
    // lengths| rows.
    val hist = Checkpoints.truncate(
      df.select(TextAnalysis.tokenCount(text).cast("long").as("l"))
        .groupBy(col("l")).agg(count(lit(1)).as("c")))
    val totals = hist.agg(
      coalesce(sum(col("c")), lit(0L)).as("n"),
      coalesce(sum(col("l") * col("c")), lit(0L)).as("tot")).first()
    val n = totals.getLong(0)
    val tot = totals.getLong(1)
    // Type-1 quantiles from the cumulative histogram. The
    // un-partitioned window is over DISTINCT LENGTHS only (bounded by
    // max doc length), never the corpus.
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("l"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = hist.withColumn("cc", sum(col("c")).over(w))
    val pCols = percentiles.zipWithIndex.map { case (p, i) =>
      min(when(col("cc") >= lit(math.ceil(p * n).toLong), col("l"))).as(s"__p$i")
    }
    val pRow =
      if (n == 0) null
      else cum.agg(pCols.head, pCols.tail: _*).first()
    val vocab =
      if (n == 0) 0L
      else df.select(explode_outer(
          TextAnalysis.tokens(TextAnalysis.normalized(text))).as("term"))
        .agg(count_distinct(col("term"))).first().getLong(0)
    val pLits = percentiles.zipWithIndex.map { case (p, i) =>
      val v = if (pRow == null || pRow.isNullAt(i)) 0L else pRow.getLong(i)
      lit(v).as(s"p${math.round(p * 100)}_tokens")
    }
    spark.range(1).select(
      (Seq(lit(n).as("n_docs"), lit(tot).as("total_tokens"),
        lit(vocab).as("vocab_size")) ++ pLits): _*)
  }

  /** Top-`k` corpus terms by occurrence count over normalized tokens
    * (ties broken lexicographically) — the Zipf-head diagnostic that
    * catches a boilerplate-flooded or wrongly-decoded corpus in one
    * glance. One explode + one map-side-combined hash aggregate keyed
    * by the term; the global top-k is a TakeOrdered over per-partition
    * heads, never a full sort. */
  def termFrequencies(df: DataFrame, text: org.apache.spark.sql.Column,
                      k: Int = 20): DataFrame = {
    import graft.functions.TextAnalysis
    df.select(explode(
        TextAnalysis.tokens(TextAnalysis.normalized(text))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("term").asc)
      .limit(k)
  }
}
