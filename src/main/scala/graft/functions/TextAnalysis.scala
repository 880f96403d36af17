package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, language-ID heuristics, quality scoring, document
  * fingerprinting. All built from codegen'd Spark built-ins (no UDFs)
  * so they vectorize over 100 TB of documents without leaving
  * whole-stage codegen.
  */
object TextAnalysis {

  /** Whitespace tokenization (empty tokens dropped). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: alpha runs, digit runs, and single
    * punctuation marks each count as one token — a cheap, deterministic
    * proxy for byte-pair-encoded token counts. */
  def subTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Calibrated token estimate for budget-driven sampling
    * ([[graft.operators.Sampling]] takes any `tokens` Column — this is
    * the recommended one when budgets must approximate a REAL
    * tokenizer's counts): the [[subTokenCount]] proxy scaled by a
    * measured per-corpus `rate` and rounded up.
    *
    * Calibration error bounds: `rate` from [[tokenCalibrationRate]]
    * makes the estimate exactly unbiased IN AGGREGATE on the sampled
    * distribution (Σ estimate = rate × Σ proxy ≈ Σ actual by
    * construction), which is the quantity token BUDGETS consume — so a
    * budget's fill error is the sampling error of the rate, shrinking
    * as 1/√n over calibration docs, not the per-document error.
    * PER-DOCUMENT error remains bounded by how much the corpus mixes
    * content with different BPE densities (prose ≈1.3 tokens/word vs
    * code/CJK substantially higher): a single English-web rate applied
    * to a code stratum misestimates systematically. The fix is
    * structural, not a better constant — calibrate per stratum and
    * pass the stratum's own rate, which the per-stratum samplers
    * compose with directly. */
  def calibratedTokenCount(text: Column, rate: Double): Column = {
    require(rate > 0, s"calibration rate must be positive, got $rate")
    ceil(subTokenCount(text) * lit(rate)).cast("long")
  }

  /** Measure a calibration rate from a sample carrying REAL tokenizer
    * counts (`actual`, e.g. from the training tokenizer run offline on
    * a few thousand docs): Σ actual / Σ proxy. One map-side aggregate;
    * apply per stratum for mixed corpora (see
    * [[calibratedTokenCount]]'s error-bounds note). */
  def tokenCalibrationRate(df: org.apache.spark.sql.DataFrame,
                           text: Column, actual: Column): Double = {
    val r = df.agg(sum(actual.cast("long")), sum(subTokenCount(text).cast("long")))
      .collect()(0)
    require(!r.isNullAt(0) && !r.isNullAt(1) && r.getLong(1) > 0L,
      "calibration sample is empty or has zero proxy tokens")
    r.getLong(0).toDouble / r.getLong(1).toDouble
  }

  /** Normalized text: lowercase, punctuation stripped, whitespace
    * collapsed — the canonical form used for fingerprints and dedup. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text. Two documents
    * with the same fingerprint are exact near-case/punct duplicates. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Distinct-word array of the normalized text. */
  def wordSet(text: Column): Column = array_distinct(tokens(normalized(text)))

  /** Word w-shingles over a PRE-MATERIALIZED token-array column.
    *
    * PERFORMANCE CONTRACT: pass an attribute reference (a column
    * staged by a previous projection), not an inline expression — the
    * lambda body references `ws` once per element, and Catalyst
    * re-evaluates non-attribute subexpressions per element (measured
    * 20× slower when the tokenization pipeline is inlined here). */
  def shinglesOf(ws: Column, w: Int = 3): Column =
    when(size(ws) < w, array(concat_ws(" ", ws)))
      .otherwise(transform(
        sequence(lit(1), size(ws) - lit(w - 1)),
        i => concat_ws(" ", slice(ws, i, lit(w)))))

  /** Word w-shingles (default w=3) over normalized text, as
    * space-joined strings. Basis for MinHash / n-gram Jaccard dedup.
    * Single-expression convenience — inside per-row loops prefer
    * staging [[tokens]] in a projection and using [[shinglesOf]]. */
  def shingles(text: Column, w: Int = 3): Column =
    shinglesOf(tokens(normalized(text)), w)

  /** Winnowing document fingerprint (the rolling-window selection
    * scheme of MOSS): hash every w-shingle, slide a `window`-wide
    * frame over the hash sequence, keep each frame's minimum, dedup
    * and sort. Guarantees of winnowing: any shared run of at least
    * `w + window - 1` tokens between two documents contributes at
    * least one COMMON selected hash, while only ~2/(window+1) of all
    * shingle hashes are kept — a compact fingerprint with a matching
    * floor, unlike fixed sampling. md5 (not xxhash64) so an external
    * SQL engine replays the selection bit-for-bit; map-side only.
    *
    * Same performance contract as [[shinglesOf]]: pass a STAGED
    * shingle-array column. */
  def winnowFingerprintOf(sh: Column, window: Int = 4): Column = {
    val hs = transform(sh, s => md5(s.cast("binary")))
    array_sort(array_distinct(
      when(size(hs) < window, array(array_min(hs)))
        .otherwise(transform(
          sequence(lit(1), size(hs) - lit(window - 1)),
          i => array_min(slice(hs, i, lit(window)))))))
  }

  /** Single-expression convenience over raw text (stage the shingles
    * first in hot paths). */
  def winnowFingerprint(text: Column, w: Int = 3, window: Int = 4): Column =
    winnowFingerprintOf(shingles(text, w), window)

  /** Stopword-ratio language-ID heuristic: score text against small
    * per-language stopword inventories; returns the argmax language or
    * "und" when nothing matches. Deterministic tie-break by language
    * code. For real pipelines swap in fastText — the plumbing (a scalar
    * Column in, a label out) is identical. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "por", "una", "con", "para"),
    "fr" -> Seq("le", "la", "les", "des", "est", "que", "pour", "dans", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "für"))

  /** Stopword hits over a PRE-MATERIALIZED token array (same
    * performance contract as [[shinglesOf]]). */
  def langScoreFrom(ws: Column, lang: String): Column =
    size(filter(ws, w => w.isInCollection(stopwords(lang))))

  def langScore(text: Column, lang: String): Column =
    langScoreFrom(tokens(normalized(text)), lang)

  /** Language pick over a PRE-MATERIALIZED token array. The argmax
    * tree references `ws` ~2× per language; with `ws` an attribute
    * that's free, with an inline tokenization it re-runs the whole
    * normalize+split per reference (the [[shinglesOf]] contract). */
  def detectLanguageFrom(ws: Column): Column = {
    val scored = stopwords.keys.toSeq.sorted.map(l => (l, langScoreFrom(ws, l)))
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** Single-expression convenience — inside hot paths stage
    * `tokens(normalized(text))` in a projection and use
    * [[detectLanguageFrom]]. */
  def detectLanguage(text: Column): Column =
    detectLanguageFrom(tokens(normalized(text)))

  /** Gopher-style quality filter: the standard training-data heuristic
    * gate composed from [[qualityFeatures]]. Returns the rows that pass
    * plus a `quality_reject_reason` column on the rejects via the
    * second element. Thresholds follow the published heuristics (doc
    * length bounds, mean-token-length band, symbol ratio, stopword
    * floor) — tune per corpus. Fully map-side: one projection, no
    * shuffle, ~zero cost next to the scan at 100 TB. */
  def qualityFilter(text: Column,
                    minTokens: Int = 50, maxTokens: Int = 100000,
                    minMeanTokenLen: Double = 3.0, maxMeanTokenLen: Double = 10.0,
                    maxPunctRatio: Double = 0.2,
                    minStopwordRatio: Double = 0.01): Column = {
    val f = qualityFeatures(text)
    val reasons = array_compact(array(
      when(f.getField("n_tokens") < minTokens, lit("too_few_tokens")),
      when(f.getField("n_tokens") > maxTokens, lit("too_many_tokens")),
      when(f.getField("mean_token_len") < minMeanTokenLen, lit("mean_token_too_short")),
      when(f.getField("mean_token_len") > maxMeanTokenLen, lit("mean_token_too_long")),
      when(f.getField("punct_ratio") > maxPunctRatio, lit("punct_heavy")),
      when(f.getField("stopword_ratio") < minStopwordRatio, lit("no_stopwords"))))
    struct((size(reasons) === 0).as("passes"), reasons.as("reject_reasons"))
  }

  /** Quality-score components: char length, token count, mean token
    * length, punctuation ratio, stopword(en) ratio, uppercase ratio.
    * Returned as a struct; a composite score is a weighted sum the
    * caller can tune. All ratios are double divisions of exact integer
    * counts — deterministic across engines. */
  def qualityFeatures(text: Column): Column = {
    val nChars = length(text).cast("long")
    val toks = tokens(text)
    val nToks = size(toks).cast("long")
    val nPunct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")
    val nUpper = size(regexp_extract_all(text, lit("[A-Z]"), lit(0))).cast("long")
    val nStop = langScore(text, "en").cast("long")
    struct(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      when(nToks > 0, nChars.cast("double") / nToks.cast("double")).otherwise(0d).as("mean_token_len"),
      when(nChars > 0, nPunct.cast("double") / nChars.cast("double")).otherwise(0d).as("punct_ratio"),
      when(nToks > 0, nStop.cast("double") / nToks.cast("double")).otherwise(0d).as("stopword_ratio"),
      when(nChars > 0, nUpper.cast("double") / nChars.cast("double")).otherwise(0d).as("upper_ratio"))
  }

  /** PII patterns, shared by [[redactPii]] and [[piiCounts]]. Kept in
    * the RE2-compatible subset (no lookaround, no backrefs) so an
    * external SQL engine can replay the exact redaction. Order
    * matters: emails first (their digits must not half-match as
    * phones), then IPv4, then phone-like digit runs. */
  private val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>",
    "\\+?[0-9][0-9()\\-\\s.]{7,}[0-9]" -> "<PHONE>")

  /** Redact emails, IPv4 addresses, and phone-like digit runs with
    * typed placeholder tokens — the standard scrub before training-data
    * release. Three chained codegen'd `regexp_replace`s; map-side, no
    * shuffle. (A real deployment extends the pattern table; the
    * operator shape — ordered regex rewrite chain — is the part that
    * matters at 100 TB.) */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (p, r)) => regexp_replace(c, p, r) }

  /** Per-category PII match counts (email/ip/phone) for audit reports
    * — counted on the SAME ordered-rewrite basis as [[redactPii]]
    * (later patterns count on the already-redacted text, so a digit
    * run inside an email is never double-counted as a phone). */
  def piiCounts(text: Column): Column = {
    val afterEmail = regexp_replace(text, piiPatterns(0)._1, piiPatterns(0)._2)
    val afterIp = regexp_replace(afterEmail, piiPatterns(1)._1, piiPatterns(1)._2)
    struct(
      size(regexp_extract_all(text, lit(piiPatterns(0)._1), lit(0))).as("emails"),
      size(regexp_extract_all(afterEmail, lit(piiPatterns(1)._1), lit(0))).as("ips"),
      size(regexp_extract_all(afterIp, lit(piiPatterns(2)._1), lit(0))).as("phones"))
  }

  /** Duplicate-shingle ratio (Gopher-style repetition signal): the
    * fraction of word w-shingles that are repeats of an earlier one —
    * 0.0 for fully diverse text, → 1.0 for a looped phrase. Expects a
    * PRE-MATERIALIZED shingle array column (same performance contract
    * as [[shinglesOf]]). */
  def duplicateShingleRatio(sh: Column): Column =
    when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
      .otherwise(0d)

  /** Compression-ratio quality signal (deflate bytes / raw bytes):
    * low = templated/repetitive, ~1+ = high-entropy noise. A native
    * codegen expression — see [[graft.expressions.DeflateRatio]] for
    * semantics, threading, and why it is spec-tested (ordering
    * properties) rather than oracle-replayed. */
  def compressionRatio(text: Column): Column =
    graft.expressions.DeflateRatio.column(text)

  /** Credit-card redaction gated on the Luhn checksum: candidate
    * 13–19-character digit runs (spaces/dashes allowed between
    * groups) are matched positionally and only checksum-VALID runs
    * are replaced with `<CC>` — bare digit-run redaction would mangle
    * order ids and tracking numbers across a commerce corpus, which
    * is why every production PII pass pairs the regex with the
    * checksum. One native codegen'd pass
    * ([[graft.expressions.RedactCards]]): extraction and replacement
    * share the SAME leftmost-longest matcher, so a valid card's
    * characters embedded inside a longer invalid run are never
    * touched (a replace-by-value fold would corrupt them). Extends
    * [[redactPii]]'s channel (compose as
    * `redactCreditCards(redactPii(text))`; run PII first so
    * card-like phone numbers are already typed). Map-side, no UDF,
    * no shuffle; the decision (candidate shape + checksum) is plain
    * RE2 + integer arithmetic, replayed by the oracle. */
  def redactCreditCards(text: Column): Column =
    graft.expressions.RedactCards.column(text)

  /** Weights of the [[qualityLogit]] linear model. The defaults are a
    * hand-set placeholder calibration (prose-positive: stopword share
    * up, punctuation/uppercase noise down, mild preference for longer
    * docs capped at `lenCap` tokens) — a real deployment fits them by
    * logistic regression on labeled keep/drop pairs and swaps ONLY
    * this object; the operator shape is what the engine provides. */
  case class QualityWeights(bias: Double = -1.2, stopword: Double = 4.0,
                            punct: Double = -3.0, upper: Double = -2.0,
                            meanTokenLen: Double = 0.1, lenNorm: Double = 1.5,
                            lenCap: Int = 256)

  /** Model-based quality score — the classifier-filter shape of
    * modern corpus curation (a fastText/logistic keep-vs-drop model
    * scoring every document), distilled to its Spark-native form: a
    * linear model over [[qualityFeatures]], fully codegen'd, one
    * map-side projection, no UDF. Returns the raw logit (> 0 = keep
    * under the default decision rule); [[qualityProb]] applies the
    * sigmoid when a calibrated probability is wanted. The arithmetic
    * is plain IEEE +/×/÷ in a FIXED evaluation order, so any engine
    * replays it bit-for-bit — the oracle does. */
  def qualityLogit(text: Column, w: QualityWeights = QualityWeights()): Column = {
    val f = qualityFeatures(text)
    val lenNorm = least(f.getField("n_tokens"), lit(w.lenCap.toLong)).cast("double") /
      lit(w.lenCap.toDouble)
    lit(w.bias) +
      lit(w.stopword) * f.getField("stopword_ratio") +
      lit(w.punct) * f.getField("punct_ratio") +
      lit(w.upper) * f.getField("upper_ratio") +
      lit(w.meanTokenLen) * f.getField("mean_token_len") +
      lit(w.lenNorm) * lenNorm
  }

  /** Sigmoid of [[qualityLogit]]: P(keep) in (0, 1). Kept separate
    * because `exp` is libm-dependent (not bit-replayable by an
    * external engine) — rank/threshold on the logit when exactness
    * matters. */
  def qualityProb(text: Column, w: QualityWeights = QualityWeights()): Column =
    lit(1.0) / (lit(1.0) + exp(-qualityLogit(text, w)))
}
