package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling for training-data assembly.
  *
  * Scale design (100 TB): every operator here needs a per-stratum
  * RUNNING TOTAL in a deterministic order. The naive shape — one
  * window partitioned by the stratum — serializes an entire stratum
  * through a single task's sort; a real corpus mix has ~3–10 strata
  * ("70% web, 20% code, 10% books"), so the web stratum's trillions
  * of rows would funnel through one core. Instead the cumsum is
  * HIERARCHICAL: the deterministic md5 order key is range-sliced into
  * `buckets` contiguous shards by its leading hex digits, each
  * (stratum, shard) computes a local cumsum in parallel, a tiny
  * per-stratum window over the ≤ strata×buckets shard totals computes
  * each shard's starting offset, and the offsets broadcast-join back.
  * Three shuffles — the sharded window, a map-combined totals
  * aggregate, and the metadata-sized offset window — none of them
  * keyed by the bare stratum. This is the same bucket+carry-forward
  * pattern as [[RangeJoin.asofJoinBucketed]] (measured 5× on a hot
  * key in SCALE.md).
  *
  * Determinism is unchanged: the shard is a PREFIX of the md5 order
  * key, so (shard asc, orderKey asc, id asc) IS the global
  * (orderKey asc, id asc) order, and the hierarchical running totals
  * equal the single-window ones exactly (spec-pinned equivalence).
  *
  * Cardinality assumption: the broadcast offset table holds up to
  * |strata| × buckets rows. The default `buckets = 64` assumes the
  * handful-of-strata corpus-recipe regime; for high-cardinality strata
  * (per-user, per-domain — millions of groups, each small) pass
  * `buckets = 1`, which skips the broadcast entirely and lets each
  * small stratum flow through one window task.
  */
object Sampling {

  /** Deterministic pseudo-random order key: md5 of the id's string
    * form. md5 (not xxhash64) so an external SQL engine can replay the
    * exact sample for verification. */
  private def orderKey(id: Column): Column = md5(id.cast("string").cast("binary"))

  /** Names used internally by the hierarchical cumsum; reject inputs
    * that would silently collide (same contract as the as-of join). */
  private val reservedNames = Set(
    "__ok", "__bk", "__loc", "__s", "__tb", "__tot", "__off",
    "__running", "__rn", "__q", "__start")

  private def checkReserved(df: DataFrame): Unit = {
    val bad = df.columns.filter(reservedNames)
    require(bad.isEmpty,
      s"input columns ${bad.mkString(",")} collide with Sampling internal names")
  }

  /** Contiguous order-key shard: the numeric value of the md5's first
    * four hex digits scaled to [0, buckets). Monotone in the md5
    * string order, so each shard is a contiguous range of the global
    * order — the property the hierarchical cumsum rests on. */
  private def shardOf(ok: Column, buckets: Int): Column =
    (conv(substring(ok, 1, 4), 16, 10).cast("long") * buckets / 65536).cast("int")

  /** Per-stratum running sum of `value` in the global deterministic
    * (orderKey, id) order, computed hierarchically as described in the
    * object doc. Appends `out` (and nothing else); row order and all
    * input columns pass through. `buckets = 1` short-circuits to the
    * single-window shape with no broadcast at all — pass it when strata
    * cardinality is high (see inline note). */
  private def withRunning(df: DataFrame, value: Column, id: Column,
                          strata: Column, buckets: Int, out: String): DataFrame = {
    require(buckets >= 1 && buckets <= 65536,
      s"buckets must be in [1, 65536], got $buckets")
    checkReserved(df)
    if (buckets == 1) {
      // One shard means every shard offset is zero, so the totals
      // aggregate and broadcast join would be pure overhead — use the
      // single-window shape directly. This is also the escape hatch for
      // HIGH-CARDINALITY strata (per-user, per-domain): the hierarchical
      // shape's broadcast side holds |strata|×buckets rows, which stops
      // being "metadata-sized" when strata number in the millions;
      // buckets = 1 never materializes it. The trade is the documented
      // one: each stratum's cumsum serializes through one task, which is
      // exactly right when strata are many and individually small.
      val w = Window.partitionBy(strata).orderBy(orderKey(id), id.asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      return df.withColumn(out, sum(value).over(w))
    }
    val base = df.withColumn("__ok", orderKey(id))
      .withColumn("__bk", shardOf(col("__ok"), buckets))
    val wLoc = Window.partitionBy(strata, col("__bk"))
      .orderBy(col("__ok"), id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Shard totals: map-side partial aggregation reduces the shuffle to
    // ≤ strata×buckets rows regardless of input size.
    val totals = base.groupBy(strata.as("__s"), col("__bk").as("__tb"))
      .agg(sum(value).as("__tot"))
    // Each shard's starting offset = sum of STRICTLY EARLIER shards'
    // totals within its stratum — a window over the tiny aggregate.
    val wOff = Window.partitionBy(col("__s")).orderBy(col("__tb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = totals
      .withColumn("__off", coalesce(sum(col("__tot")).over(wOff), lit(0L)))
      .drop("__tot")
    base.withColumn("__loc", sum(value).over(wLoc))
      // <=> so a null stratum matches its own offsets (a window's
      // partitionBy groups nulls together; a plain === would not).
      .join(broadcast(offs), strata <=> col("__s") && col("__bk") === col("__tb"), "left")
      .withColumn(out, col("__loc") + coalesce(col("__off"), lit(0L)))
      .drop("__ok", "__bk", "__loc", "__s", "__tb", "__off")
  }

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
                          strata: Column, budgetPerStratum: Long,
                          buckets: Int = 64): DataFrame =
    withRunning(df, tokens, id, strata, buckets, "__running")
      .filter(col("__running") <= budgetPerStratum)
      .drop("__running")

  /** Single-window reference implementation (the pre-hierarchical
    * shape): correct, but serializes each stratum through one task —
    * kept for the equivalence spec and the ScaleSmoke crossover
    * measurement, not for production use. */
  private[graft] def sampleToTokenBudgetPlain(
      df: DataFrame, tokens: Column, id: Column,
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
    * tokens — the running count in the unique (orderKey, id) order IS
    * the row number). */
  def sampleNPerStratum(df: DataFrame, id: Column, strata: Column,
                        perStratum: Int, buckets: Int = 64): DataFrame =
    withRunning(df, lit(1L), id, strata, buckets, "__rn")
      .filter(col("__rn") <= perStratum)
      .drop("__rn")

  /** Sequence packing for pretraining batches: lay each stratum's
    * documents end-to-end in deterministic hash order and cut the
    * token stream into fixed `seqLen` sequences. A document's pack
    * assignment is its START offset's sequence (documents may straddle
    * a boundary — the with-splitting packing used for LM pretraining,
    * which wastes zero tokens; no-split first-fit would need a
    * sequential scan and is deliberately not this operator).
    *
    * Adds `pack_id` (sequence index within the stratum) and
    * `pack_offset` (token offset within that sequence). Hierarchical
    * cumsum per the object doc — a hot stratum packs across all
    * shards in parallel. */
  def packSequences(df: DataFrame, tokens: Column, id: Column,
                    strata: Column, seqLen: Long,
                    buckets: Int = 64): DataFrame =
    withRunning(df, tokens, id, strata, buckets, "__running")
      .withColumn("__start", col("__running") - tokens)
      .withColumn("pack_id", floor(col("__start") / seqLen))
      .withColumn("pack_offset", col("__start") % seqLen)
      .drop("__running", "__start")

  /** Single-window reference implementation of [[packSequences]] (see
    * [[sampleToTokenBudgetPlain]]). */
  private[graft] def packSequencesPlain(
      df: DataFrame, tokens: Column, id: Column,
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
                  weights: Map[String, Double], total: Long,
                  buckets: Int = 64): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0), "need non-negative weights")
    val sumW = weights.values.sum
    // All-zero weights would make every quota floor(NaN) = 0 and
    // silently return an empty mix — fail loudly instead.
    require(sumW > 0, "weights must not all be zero")
    val quota = typedLit(weights.map { case (k, v) =>
      k -> math.floor(total * v / sumW).toLong })
    val myQuota = element_at(quota, strata.cast("string"))
    withRunning(df.filter(myQuota.isNotNull), lit(1L), id, strata, buckets, "__rn")
      .filter(col("__rn") <= myQuota)
      .drop("__rn")
  }

  /** Context-window chunking: split each document's whitespace tokens
    * into fixed `maxTokens` windows that slide by `maxTokens −
    * overlap` — the retrieval/embedding preprocessing step for
    * documents longer than a model's context. Emits one row per chunk:
    * the id (as `id`), `chunk_id` (0-based), `chunk_text` (tokens
    * re-joined with single spaces — whitespace is normalized by
    * construction), and `n_chunk_tokens`. Every document yields at
    * least one chunk (empty/short docs come through whole, never
    * dropped), and no degenerate tail chunk is emitted when the last
    * window already covers the remaining tokens.
    *
    * Scale: pure map-side — tokenize, compute the chunk count from
    * arithmetic, explode, slice. No shuffle, stays in whole-stage
    * codegen. */
  def chunkDocuments(df: DataFrame, text: Column, id: Column,
                     maxTokens: Int, overlap: Int = 0): DataFrame = {
    require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
      s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
    val step = maxTokens - overlap
    // Null text tokenizes to null; coalesce to the empty array so the
    // "empty/short docs come through whole" contract holds (one chunk,
    // chunk_text "" and n_chunk_tokens 0 — not NULL under ANSI size()).
    df.select(id.as("id"),
        coalesce(graft.functions.TextAnalysis.tokens(text),
          array().cast("array<string>")).as("__ws"))
      .withColumn("__nc", greatest(lit(1L),
        ceil((size(col("__ws")) - lit(overlap)).cast("double") / step)))
      .select(col("id"), col("__ws"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_id"))
      .withColumn("__chunk", slice(col("__ws"),
        (col("chunk_id") * step + 1).cast("int"), lit(maxTokens)))
      .select(col("id"), col("chunk_id"),
        concat_ws(" ", col("__chunk")).as("chunk_text"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"))
  }

  /** Materialize packed training sequences: one row per (stratum,
    * pack_id) with the pack's documents concatenated by `sep` in
    * offset order, from [[packSequences]] output. A straddling
    * document belongs to its START offset's pack (the with-splitting
    * convention — the trainer's tokenizer performs the actual cut), so
    * a pack's token count can exceed `seqLen` by up to one document's
    * tail. One hash-aggregate shuffle keyed by (stratum, pack_id) —
    * pack ids are dense within a stratum, so the keys are uniform. */
  def assemblePacks(packed: DataFrame, text: Column, strata: Column,
                    sep: String = " "): DataFrame =
    packed.groupBy(strata.as("stratum"), col("pack_id"))
      .agg(
        concat_ws(sep, transform(
          array_sort(collect_list(struct(col("pack_offset"), text.as("__t")))),
          x => x.getField("__t"))).as("seq_text"),
        count(lit(1)).as("n_docs"))

  /** Deterministic hash-based train/validation/test assignment: each
    * document's split label depends ONLY on (seed, its id), so the
    * assignment is stable as the corpus grows, shrinks, or
    * repartitions — a document never migrates between train and
    * held-out when other documents arrive, the property
    * `randomSplit` (sample-order-dependent) cannot give and the one
    * that makes eval sets trustworthy across corpus refreshes.
    *
    * Mechanism: the first 8 hex digits of `md5(seed|id)` are a
    * uniform draw in [0, 2³²); each split takes a contiguous range
    * sized by its normalized weight. The comparison happens on the
    * HEX STRING against precomputed hex thresholds (fixed-width hex
    * compares lexicographically = numerically), so any SQL engine
    * with md5 replays the exact assignment — no numeric hex
    * conversion needed on either side.
    *
    * Scale shape: one map-side projection; no shuffle, no state, no
    * driver data. Appends `out` and passes everything else through. */
  def hashSplit(df: DataFrame, id: Column, splits: Seq[(String, Double)],
                seed: String = "graft", out: String = "split"): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 > 0), "split weights must be positive")
    val total = splits.map(_._2).sum
    // Cumulative upper bounds as 8-digit lowercase hex of the scaled
    // fraction; the last split takes the remainder via otherwise().
    val bounds = splits.init.scanLeft(0.0) { case (acc, (_, w)) =>
      acc + w / total
    }.tail.map(f => f"${math.round(f * 4294967296.0).min(0xffffffffL)}%08x")
    val key = substring(md5(concat_ws("|", lit(seed), id.cast("string"))
      .cast("binary")), 1, 8)
    val label = bounds.zip(splits.init).foldRight(
        lit(splits.last._1): Column) { case ((b, (name, _)), rest) =>
      when(key < lit(b), lit(name)).otherwise(rest)
    }
    df.withColumn(out, label)
  }

  /** [[weightedMix]] with TOKEN-share quotas — the form corpus recipes
    * are actually written in ("70% of the TOKENS from web"): each
    * stratum keeps documents in deterministic md5 order while its
    * running token total stays within `floor(totalTokens × weight_s /
    * Σweights)`. Same drop/under-fill semantics as [[weightedMix]];
    * same hierarchical cumsum (a hot stratum parallelizes across
    * shards). */
  def weightedTokenMix(df: DataFrame, tokens: Column, id: Column,
                       strata: Column, weights: Map[String, Double],
                       totalTokens: Long, buckets: Int = 64): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0), "need non-negative weights")
    val sumW = weights.values.sum
    require(sumW > 0, "weights must not all be zero")
    val quota = typedLit(weights.map { case (k, v) =>
      k -> math.floor(totalTokens * v / sumW).toLong })
    val myQuota = element_at(quota, strata.cast("string"))
    withRunning(df.filter(myQuota.isNotNull), tokens, id, strata, buckets, "__running")
      .filter(col("__running") <= myQuota)
      .drop("__running")
  }
}
