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

  /** Okapi BM25 ranked retrieval for a literal query term set — the
    * standard lexical-retrieval baseline next to [[graft.operators.TextIndex]]'s
    * boolean search. Returns one row per document containing at least
    * one query term: (id, bm25), descending-score consumption is the
    * caller's ORDER BY.
    *
    * Scale design: document lengths are computed map-side from the
    * token array (no extra shuffle); only occurrences of QUERY terms
    * survive into the exploded rows, so the (doc, term) aggregate's
    * input is query-selectivity-sized, not corpus-token-sized. N and
    * avgdl come from one aggregate over the staged per-doc rows.
    * Everything downstream is an equi-join on the term (≤ |query|
    * distinct values, broadcast-sized) and one hash aggregate per doc.
    *
    * Determinism contract (same discipline as [[docRarity]]): IDF is
    * quantized once per term to DECIMAL(18,6); each (doc, term)
    * addend is IEEE double arithmetic in a fixed parenthesization,
    * quantized to DECIMAL(18,6); the per-document fold is then an
    * exact decimal sum — associative, so any engine replays it. The
    * defaults are binary-exact (k1=1.5 ⇒ k1+1=2.5, b=0.75 ⇒
    * 1−b=0.25), so an external replay can write them as plain
    * literals without decimal-vs-double parsing drift. */
  def bm25(df: DataFrame, text: Column, id: Column, queryTerms: Seq[String],
           k1: Double = 1.5, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val terms = queryTerms.map(_.toLowerCase).distinct
    // One pass stages (id, dl, matched-term occurrences); explode_outer
    // keeps match-less docs as a null-term row so N and avgdl cover the
    // WHOLE corpus without a second scan.
    val staged = Checkpoints.truncate(df.select(
        id.as("id"),
        TextAnalysis.tokens(TextAnalysis.normalized(text)).as("ws"))
      .select(col("id"), size(col("ws")).as("dl"),
        explode_outer(filter(col("ws"),
          w => w.isInCollection(terms))).as("term")))
    val docs = staged.groupBy(col("id")).agg(first(col("dl")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).first()
    val n = stats.getLong(0)
    require(n > 0, "empty corpus")
    val avgdl = stats.getLong(1).toDouble / n
    val tf = staged.filter(col("term").isNotNull)
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    // Lucene's non-negative BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)),
    // quantized once per term.
    val idf6 = round(log(lit(1.0) +
        (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5))), 6)
      .cast("decimal(18,6)")
    val tfNorm = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    tf.join(docFreq.select(col("term"), idf6.as("idf6")), "term")
      .select(col("id"),
        round(col("idf6").cast("double") * tfNorm, 6)
          .cast("decimal(18,6)").as("addend"))
      .groupBy(col("id"))
      .agg(sum(col("addend")).as("s"))
      .select(col("id"), col("s").cast("double").as("bm25"))
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
