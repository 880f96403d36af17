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

  /** Sequence packing for pretraining batches: lay each stratum's
    * documents end-to-end in deterministic hash order and cut the
    * token stream into fixed `seqLen` sequences. A document's pack
    * assignment is its START offset's sequence (documents may straddle
    * a boundary — the with-splitting packing used for LM pretraining,
    * which wastes zero tokens; no-split first-fit would need a
    * sequential scan and is deliberately not this operator).
    *
    * Adds `pack_id` (sequence index within the stratum) and
    * `pack_offset` (token offset within that sequence). One window per
    * stratum — same single-shuffle shape as the samplers, so packing
    * parallelizes across strata/shards exactly like corpus assembly
    * does in practice. */
  def packSequences(df: DataFrame, tokens: Column, id: Column,
                    strata: Column, seqLen: Long): DataFrame = {
    val w = Window.partitionBy(strata).orderBy(orderKey(id), id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__start", sum(tokens).over(w) - tokens)
      .withColumn("pack_id", floor(col("__start") / seqLen))
      .withColumn("pack_offset", col("__start") % seqLen)
      .drop("__start")
  }

  /** Weighted source mix: keep `floor(total × weight_s / Σweights)`
    * documents from each stratum, chosen by the deterministic hash
    * order — the "70% web, 20% code, 10% books" recipe knob. Strata
    * missing from `weights` are dropped; a stratum smaller than its
    * quota contributes everything it has (the mix then under-fills
    * rather than silently re-weighting — callers can renormalize and
    * re-run). */
  def weightedMix(df: DataFrame, id: Column, strata: Column,
                  weights: Map[String, Double], total: Long): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0), "need non-negative weights")
    val sumW = weights.values.sum
    // All-zero weights would make every quota floor(NaN) = 0 and
    // silently return an empty mix — fail loudly instead.
    require(sumW > 0, "weights must not all be zero")
    val quota = typedLit(weights.map { case (k, v) =>
      k -> math.floor(total * v / sumW).toLong })
    val w = Window.partitionBy(strata).orderBy(orderKey(id), id.asc)
    df.withColumn("__q", element_at(quota, strata.cast("string")))
      .filter(col("__q").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__q"))
      .drop("__q", "__rn")
  }
}
