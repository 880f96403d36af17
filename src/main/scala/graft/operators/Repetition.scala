package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Gopher-style repetition filters (Rae et al. 2021, table A1) — the
  * standard pre-training quality gate that [[graft.functions.TextAnalysis.qualityLogit]]'s
  * surface features don't cover: documents dominated by repeated
  * lines ("click here" nav spam, boilerplate footers) or by one
  * hammered n-gram (SEO keyword stuffing) get scrubbed before
  * training.
  *
  * Two granularities, two shapes:
  *  - [[signals]] is a pure map-side struct (line-level duplication
  *    ratios) — zero shuffle, codegen'd HOFs, runs inline in any
  *    projection at 100 TB.
  *  - [[topNgramCharShare]] needs the most frequent n-gram PER
  *    DOCUMENT, which is a per-doc hash aggregate: explode shingles →
  *    count keyed by (doc, shingle) (map-side combined) → one
  *    row_number window keyed by doc. Uniform keys, no corpus-wide
  *    state — the same shape as the dedup signature pipeline, which
  *    measured 5-10× over per-row HOF folds.
  */
object Repetition {

  /** Line-level duplication signals as one struct column:
    * `dup_line_frac` — fraction of (trimmed, non-empty) lines that
    * are repeats of an earlier line; `dup_line_char_frac` — fraction
    * of those lines' characters contained in the repeats. Both 0.0
    * for empty/single-line documents. Gopher drops docs above 0.30 /
    * 0.20 respectively. */
  def signals(text: Column): Column = {
    val lines = filter(
      transform(split(coalesce(text, lit("")), "\n"), l => trim(l)),
      l => l =!= "")
    val distinctLines = array_distinct(lines)
    val nl = size(lines).cast("double")
    val dn = size(distinctLines).cast("double")
    val totChars = aggregate(lines, lit(0L), (acc, l) => acc + length(l))
      .cast("double")
    val dupChars = totChars -
      aggregate(distinctLines, lit(0L), (acc, l) => acc + length(l))
        .cast("double")
    struct(
      when(nl > 0, round(lit(1.0) - dn / nl, 4)).otherwise(lit(0.0))
        .as("dup_line_frac"),
      when(totChars > 0, round(dupChars / totChars, 4)).otherwise(lit(0.0))
        .as("dup_line_char_frac"))
  }

  /** Per document: the most frequent word `n`-gram (ties broken to
    * the lexicographically GREATEST shingle, pinned so external
    * engines replay the same winner), its occurrence count, and the
    * share of the normalized text's characters it accounts for
    * (occurrences × shingle length / normalized length). Gopher drops
    * docs whose top 2-gram covers > 0.20. Documents shorter than `n`
    * tokens score 0 by contract (their single under-width shingle is
    * reported with share computed the same way). */
  def topNgramCharShare(df: DataFrame, text: Column, id: Column,
                        n: Int = 2): DataFrame = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    // Stage the token array as an attribute before shingling —
    // Catalyst re-evaluates non-attribute subexpressions inside HOF
    // lambdas per element (TextAnalysis.shinglesOf's contract).
    val toks = df.select(id.as("id"),
      length(TextAnalysis.normalized(text)).as("chars"),
      TextAnalysis.tokens(TextAnalysis.normalized(text)).as("ws"))
    val staged = toks.select(col("id"), col("chars"),
      explode(TextAnalysis.shinglesOf(col("ws"), n)).as("sh"))
    val counts = staged.groupBy(col("id"), col("chars"), col("sh"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("cnt").desc, col("sh").desc)
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"), col("sh").as("top_ngram"), col("cnt").as("occurrences"),
        when(col("chars") > 0,
          round(col("cnt") * length(col("sh")) / col("chars").cast("double"), 4))
          .otherwise(lit(0.0)).as("char_share"))
  }

  /** The combined Gopher repetition gate: keep documents whose line
    * duplication and top-2-gram share are all under their thresholds.
    * Returns the input rows that PASS, with the signals attached for
    * accounting. */
  def gate(df: DataFrame, text: Column, id: Column,
           maxDupLineFrac: Double = 0.30,
           maxDupLineCharFrac: Double = 0.20,
           maxTopBigramShare: Double = 0.20): DataFrame = {
    // Cheapest filter first: the map-side line signals gate BEFORE the
    // explode+aggregate bigram stage, so line-spam documents never pay
    // for shingling (measured ~25% on a 1-in-4-spam fixture; more on
    // real boilerplate-heavy crawls).
    val lineOk = df.withColumn("__rep", signals(text))
      .filter(col("__rep.dup_line_frac") <= maxDupLineFrac &&
        col("__rep.dup_line_char_frac") <= maxDupLineCharFrac)
    val top = topNgramCharShare(lineOk, text, id, n = 2)
      .select(col("id").as("__tid"), col("char_share"))
    lineOk.join(top, id === col("__tid"), "left")
      .filter(coalesce(col("char_share"), lit(0.0)) <= maxTopBigramShare)
      .withColumn("dup_line_frac", col("__rep.dup_line_frac"))
      .withColumn("dup_line_char_frac", col("__rep.dup_line_char_frac"))
      .withColumn("top_bigram_share", coalesce(col("char_share"), lit(0.0)))
      .drop("__rep", "__tid", "char_share")
  }
}
