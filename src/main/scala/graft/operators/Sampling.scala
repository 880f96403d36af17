package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling for training-data assembly.
  *
  * Scale design (100 TB): both samplers are one window per stratum —
  * a single shuffle keyed by the stratum column; no driver-side
  * collection, no global sort. Determinism comes from ordering by a
  * content-independent hash of the id, so re-runs (and retried stages)
  * pick the same sample.
  */
object Sampling {

  /** Deterministic pseudo-random order key: md5 of the id's string
    * form. md5 (not xxhash64) so an external SQL engine can replay the
    * exact sample for verification. */
  private def orderKey(id: Column): Column = md5(id.cast("string").cast("binary"))

  /** Stratified sample up to a TOKEN budget per stratum: within each
    * stratum, documents are ordered by a deterministic uniform hash of
    * their id and kept while the running token total (inclusive of the
    * current document) stays within `budgetPerStratum`.
    *
    * This is the "give me ~N tokens per language/source, chosen
    * uniformly and reproducibly" primitive of corpus assembly. Note a
    * document larger than the remaining budget ends its stratum's
    * intake (running-total semantics — intentionally simple and
    * exactly SQL-replayable, not best-fit packing). */
  def sampleToTokenBudget(df: DataFrame, tokens: Column, id: Column,
                          strata: Column, budgetPerStratum: Long): DataFrame = {
    val w = Window.partitionBy(strata).orderBy(orderKey(id), id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__running", sum(tokens).over(w))
      .filter(col("__running") <= budgetPerStratum)
      .drop("__running")
  }

  /** Stratified sample of up to `perStratum` DOCUMENTS per stratum,
    * same deterministic hash order (a row-count variant of
    * [[sampleToTokenBudget]] for when the unit is documents, not
    * tokens). */
  def sampleNPerStratum(df: DataFrame, id: Column, strata: Column,
                        perStratum: Int): DataFrame = {
    val w = Window.partitionBy(strata).orderBy(orderKey(id), id.asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perStratum)
      .drop("__rn")
  }
}
