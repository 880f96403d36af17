package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus-level TF-IDF scoring for training-data curation: documents
  * dominated by corpus-common boilerplate score low, documents with
  * rare vocabulary score high — the standard rarity/novelty signal
  * next to the per-document quality features.
  *
  * Scale design (100 TB): the canonical three-aggregate shape — explode
  * tokens once, hash-aggregate (doc, term) counts (map-side partial
  * combine collapses repeats before the shuffle), derive document
  * frequencies with a second aggregate keyed by term, join back on
  * term, and fold per document. Every stage is a hash aggregate or an
  * equi-join on a uniform key; nothing is quadratic and nothing
  * collects to the driver except the corpus row count (one scalar).
  */
object TfIdf {

  /** Per-document rarity: the token-frequency-weighted mean of smoothed
    * IDF — `sum_t tf(t,d) * (ln((N+1)/(df_t+1)) + 1)` over the
    * document's distinct normalized tokens.
    *
    * Determinism contract: IDF is quantized ONCE PER TERM to
    * DECIMAL(18,6); per-document accumulation is then `sum(cnt *
    * idf6) / len` — an exact integer-scaled decimal fold followed by a
    * single double division. The fold is associative (reproducible
    * across partitionings) and every engine-specific float operation
    * (ln, the quantization, the division) happens once per distinct
    * input value, not once per addend — which is what lets an external
    * SQL engine replay the score bit-for-bit (summing per-addend
    * doubles instead differs at round-off boundaries). */
  def docRarity(df: DataFrame, text: Column, id: Column): DataFrame = {
    // explode_outer keeps token-less documents as one null-term row so
    // the corpus size N is derivable from the aggregate below — no
    // separate full-corpus count() scan before the main job. (N counts
    // distinct ids; docRarity is keyed per id, so duplicate-id input
    // was never meaningful.)
    val toks = df.select(id.as("id"),
      explode_outer(TextAnalysis.tokens(TextAnalysis.normalized(text))).as("term"))
    // Three consumers read termCounts (document frequencies, document
    // lengths, the scoring join); without materialization Spark
    // re-tokenizes the corpus once per consumer (three scans in the
    // plan). One materialization of the aggregated (doc, term, cnt)
    // rows — far smaller than the token explosion — replaces them.
    val termCounts = Checkpoints.truncate(
      toks.groupBy(col("id"), col("term")).agg(count(lit(1)).as("cnt")))
    // One scalar over the already-materialized aggregate, not the corpus.
    val n = termCounts.agg(count_distinct(col("id"))).first().getLong(0)
    // Null-term marker rows counted toward N, excluded from scoring —
    // a token-less document has no rarity row (as before).
    val tc = termCounts.filter(col("term").isNotNull)
    val docLens = tc.groupBy(col("id")).agg(sum(col("cnt")).as("len"))
    val docFreq = tc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf6 = round(log(lit(n + 1.0) / (col("df") + lit(1.0))) + lit(1.0), 6)
      .cast("decimal(18,6)")
    tc
      .join(docFreq.select(col("term"), idf6.as("idf6")), "term")
      .groupBy(col("id"))
      .agg(sum(col("cnt") * col("idf6")).as("s"))
      .join(docLens, "id")
      .select(col("id"),
        (col("s").cast("double") / col("len").cast("double")).as("rarity"))
  }

  /** The `k` highest-IDF (rarest-in-corpus) of a document's terms —
    * the "what makes this document unusual" summary. Ties break
    * lexicographically for determinism. */
  def topRareTerms(df: DataFrame, text: Column, id: Column, k: Int = 5): DataFrame = {
    // Same single-scan shape as docRarity: materialize the distinct
    // (doc, term) rows once, then N is a scalar over that aggregate —
    // not a second pass over the raw corpus. explode_outer keeps
    // token-less documents in N (they just contribute no term rows).
    val toks0 = Checkpoints.truncate(df.select(id.as("id"),
      explode_outer(array_distinct(TextAnalysis.tokens(TextAnalysis.normalized(text))))
        .as("term")))
    val n = toks0.agg(count_distinct(col("id"))).first().getLong(0)
    val toks = toks0.filter(col("term").isNotNull)
    val docFreq = toks.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(n + 1.0) / (col("df") + lit(1.0))) + lit(1.0)
    toks.join(docFreq, "term")
      .groupBy(col("id"))
      .agg(slice(array_sort(collect_list(struct(
        (-idf).as("nidf"), col("term")))), 1, k).as("top"))
      .select(col("id"), transform(col("top"), t => t.getField("term")).as("rare_terms"))
  }
}
