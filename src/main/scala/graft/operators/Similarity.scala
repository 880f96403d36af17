package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors

/** Approximate / exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Scale design: brute force is the correctness baseline — a broadcast
  * of the (small) query set against the full corpus, embarrassingly
  * parallel, no shuffle until the final per-query top-k (a windowed
  * rank over query_id — tiny). The LSH variant buckets the corpus by
  * anchor-projection sign bits so each query only scans its bucket:
  * the 100 TB path, at the cost of recall. Anchors travel as ONE
  * broadcast row (array of vectors), never as driver-side literals.
  */
object Similarity {

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` and `corpus` both carry (idCol, vecCol). Self-matches are
    * excluded. Result: (query_id, neighbor_id, cosine, rank).
    *
    * Scale guard: the query side is broadcast — callers must keep it
    * small (≤ ~10k vectors); `maxQueries` fails fast instead of OOMing
    * executors at 100×. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      maxQueries: Int = 100000): DataFrame = {
    // Enforce the broadcast guard: counting a limit(maxQueries + 1)
    // projection costs one cheap job on ≤ maxQueries+1 rows (never a
    // full-query-side scan) and turns a silent executor OOM at 100×
    // into an immediate, actionable error.
    val overCap = queries.limit(maxQueries + 1).count() > maxQueries
    require(!overCap,
      s"bruteForceTopK query side exceeds maxQueries=$maxQueries; broadcasting it " +
        "would risk executor OOM — partition the queries, raise maxQueries " +
        "deliberately, or use lshTopK/ivfTopK for large query sets")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Brute-force top-k over int8-QUANTIZED vectors — the memory-tier
    * ANN path: codes are 4× smaller than float32 (and 8× smaller than
    * the widened doubles an unquantized scan materializes), so a
    * 100 TB corpus's scan tier holds 4× more vectors per executor and
    * moves 4× fewer bytes; the hot loop is an integer
    * multiply-accumulate. Ranking key is the rescaled dot
    * `(qdot × qscale) × cscale` — a per-pair approximation of the
    * float DOT PRODUCT (≡ cosine ranking when embeddings are
    * L2-normalized, the usual ANN contract) with per-component error
    * ≤ scale/2.
    *
    * Quantization happens inside (one map-side projection per side,
    * scale staged before the codes lambda); the query side is
    * broadcast under the same cap as [[bruteForceTopK]]. Result:
    * (query_id, neighbor_id, qdot, rank) — qdot is the EXACT integer
    * code dot, so external engines replay the ranking bit-for-bit. */
  def quantizedTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      maxQueries: Int = 100000): DataFrame = {
    val overCap = queries.limit(maxQueries + 1).count() > maxQueries
    require(!overCap,
      s"quantizedTopK query side exceeds maxQueries=$maxQueries — partition " +
        "the queries or raise the cap deliberately")
    def quantize(df: DataFrame, prefix: String): DataFrame =
      df.select(col(idCol).as(s"${prefix}_id"),
          col(vecCol).as("__v"), Vectors.int8Scale(col(vecCol)).as(s"${prefix}_scale"))
        .select(col(s"${prefix}_id"), col(s"${prefix}_scale"),
          Vectors.int8Codes(col("__v"), col(s"${prefix}_scale")).as(s"${prefix}_codes"))
    val q = quantize(queries, "query")
    val c = quantize(corpus, "neighbor")
    quantizedTopKCodes(q, c, k)
  }

  /** The steady-state quantized scan: both sides ALREADY quantized —
    * `queries` carries (query_id, query_scale, query_codes), `corpus`
    * (neighbor_id, neighbor_scale, neighbor_codes), e.g. read back
    * from a codes table written once at ingest (the production shape:
    * quantization is amortized over every query, the scan tier never
    * touches float vectors). [[quantizedTopK]] is the convenience
    * wrapper that quantizes inline. */
  def quantizedTopKCodes(queries: DataFrame, corpus: DataFrame,
                         k: Int): DataFrame = {
    val q = queries; val c = corpus
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.int8Dot(col("query_codes"), col("neighbor_codes")).as("qdot"),
        col("query_scale"), col("neighbor_scale"))
      .select(col("query_id"), col("neighbor_id"), col("qdot"),
        (col("qdot").cast("double") * col("query_scale") *
          col("neighbor_scale")).as("__sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .drop("__sim")
  }

  /** One broadcast-able row holding the first `numAnchors` vectors (by
    * ascending id) as an ordered array — the LSH hyperplane set.
    * Deterministic and data-derived (no RNG), computed distributed
    * (sort+limit+collect_list), never `.collect()`ed to the driver. */
  private def anchorRow(anchors: DataFrame, idCol: String, vecCol: String,
                        numAnchors: Int): DataFrame =
    anchors.select(col(idCol).as("__aid"), Vectors.toDouble(col(vecCol)).as("__av"))
      .orderBy(col("__aid")).limit(numAnchors)
      .agg(array_sort(collect_list(struct(col("__aid"), col("__av")))).as("__anchors"))

  /** Random-hyperplane-style LSH bucket as a bit-string: one '0'/'1'
    * character per anchor according to the sign of the projection.
    * Vectors with high cosine agree on most signs, so they share a
    * bucket with high probability. Computed map-side after a broadcast
    * cross-join with the single anchor row. */
  def withLshBucket(corpus: DataFrame, vecCol: String,
                    anchors: DataFrame, anchorIdCol: String, anchorVecCol: String,
                    numAnchors: Int = 8): DataFrame = {
    val a = anchorRow(anchors, anchorIdCol, anchorVecCol, numAnchors)
    corpus.crossJoin(broadcast(a))
      .withColumn("bucket",
        aggregate(col("__anchors"), lit(""),
          (acc, anc) => concat(acc,
            when(Vectors.dot(col(vecCol), anc.getField("__av")) >= 0.0, lit("1"))
              .otherwise(lit("0")))))
      .drop("__anchors")
  }

  /** (id, bucket) projection — kept for API compatibility. */
  def lshBuckets(corpus: DataFrame, idCol: String, vecCol: String,
                 anchors: DataFrame, numAnchors: Int = 8): DataFrame =
    withLshBucket(corpus.select(col(idCol).as("id"), col(vecCol)),
      vecCol, anchors, idCol, vecCol, numAnchors)
      .select(col("id"), col("bucket"))

  /** Bucketed ANN: top-k per query restricted to the query's LSH bucket
    * plus (multi-probe) every bucket at Hamming distance 1 — flipping
    * one sign bit. Exact-bucket-only LSH measured recall@10 ≈ 0.08 on
    * the test embeddings (a near neighbor must agree on ALL sign bits);
    * one-bit probing lifts it to a useful level at the cost of
    * (numAnchors+1)× the query-side rows — the corpus side is
    * unchanged, each corpus row still lives in exactly one bucket, so
    * no duplicate pairs arise. The join stays an equi-join on bucket. */
  def bucketedTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: DataFrame, k: Int, numAnchors: Int = 8,
      multiProbe: Boolean = true): DataFrame = {
    val withB = withLshBucket(corpus, vecCol, corpus, idCol, vecCol, numAnchors)
    val q0 = withB.join(queryIds, Seq(idCol), "left_semi")
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket"))
    val q =
      if (!multiProbe) q0
      else {
        val flips = (0 until numAnchors).map { i =>
          concat(
            substring(col("bucket"), 1, i),
            when(substring(col("bucket"), i + 1, 1) === "1", lit("0")).otherwise(lit("1")),
            substring(col("bucket"), i + 2, numAnchors))
        }
        q0.select(col("query_id"), col("qv"),
          explode(array(col("bucket") +: flips: _*)).as("bucket"))
      }
    val c = withB.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** One broadcast-able row of IVF centroids: the first `numCells`
    * corpus vectors by ascending id (deterministic data-derived coarse
    * quantizer — k-means would improve recall but adds nondeterminism;
    * swap in trained centroids via the same row shape when needed). */
  private def centroidRow(corpus: DataFrame, idCol: String, vecCol: String,
                          numCells: Int): DataFrame =
    corpus.select(col(idCol).as("__cid"), Vectors.toDouble(col(vecCol)).as("__cv"))
      .orderBy(col("__cid")).limit(numCells)
      .agg(array_sort(collect_list(struct(col("__cid"), col("__cv")))).as("__cents"))

  /** Centroid ids ranked by cosine to `vec`, nearest first (map-side
    * HOF over the broadcast centroid array). One FUSED cosine kernel
    * call per (row, centroid): inside an interpreted lambda the
    * per-element expression-node count dominates, so a single fused
    * kernel beats hoisted-norm dot + divide + branch forms (measured
    * ~30% faster end-to-end despite 3× more flops). */
  private def rankedCells(vec: Column, cents: Column): Column =
    transform(
      array_sort(transform(cents, c =>
        struct((lit(-1.0) * Vectors.cosine(vec, c.getField("__cv"))).as("negcos"),
          c.getField("__cid").as("cid")))),
      s => s.getField("cid"))

  /** Lloyd's k-means refinement of the IVF coarse quantizer, expressed
    * relationally: assign every vector to its nearest centroid
    * (map-side, one broadcast centroid row), recompute each cell's
    * mean by (cell, dimension) hash aggregate — `posexplode` → avg →
    * re-nest — and repeat. Two shuffles per iteration, lineage
    * truncated per round; cells that end up empty drop out (the
    * quantizer shrinks rather than keeping a dead centroid).
    * Returns the same one-row broadcastable shape [[ivfTopK]] uses, so
    * trained and untrained quantizers are interchangeable. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                     numCells: Int, iters: Int = 3): DataFrame = {
    var cents = centroidRow(corpus, idCol, vecCol, numCells)
    for (_ <- 1 to iters) {
      val assigned = corpus.crossJoin(broadcast(cents))
        .select(
          element_at(rankedCells(col(vecCol), col("__cents")), 1).as("__cell"),
          col(vecCol).as("__vec"))
      // toDouble stays INLINE in the generator: naming it first lets
      // InferFiltersFromGenerate clone the HOF into a pushed filter
      // (see Dedup.dupSpanStats), doubling the per-row conversion.
      cents = assigned
        .select(col("__cell"),
          posexplode(Vectors.toDouble(col("__vec"))).as(Seq("__pos", "__x")))
        .groupBy(col("__cell"), col("__pos")).agg(avg(col("__x")).as("__m"))
        .groupBy(col("__cell").as("__cid"))
        .agg(transform(array_sort(collect_list(struct(col("__pos"), col("__m")))),
          s => s.getField("__m")).as("__cv"))
        .agg(array_sort(collect_list(struct(col("__cid"), col("__cv"))))
          .as("__cents"))
      cents = Checkpoints.truncate(cents)
    }
    cents
  }

  /** IVF-style ANN top-k: the corpus is partitioned into `numCells`
    * inverted lists by nearest centroid; each query probes its `nprobe`
    * nearest cells only. The 100 TB path alongside [[bucketedTopK]]:
    * cell assignment is map-side (one broadcast of the centroid row),
    * the probe is an equi-join on cell id — each corpus row moves once,
    * and recall/cost trades via nprobe instead of bucket bit-count.
    * `trainIters > 0` refines the coarse quantizer with that many
    * [[trainCentroids]] k-means rounds first.
    * Result: (query_id, neighbor_id, cosine, rank). */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              queryIds: DataFrame, k: Int,
              numCells: Int = 16, nprobe: Int = 2,
              trainIters: Int = 0): DataFrame = {
    val cents =
      if (trainIters > 0) trainCentroids(corpus, idCol, vecCol, numCells, trainIters)
      else centroidRow(corpus, idCol, vecCol, numCells)
    val assigned = corpus.crossJoin(broadcast(cents))
      .withColumn("__cell", element_at(rankedCells(col(vecCol), col("__cents")), 1))
    val c = assigned.select(col("__cell"), col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
    val q = assigned.join(queryIds, Seq(idCol), "left_semi")
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        explode(slice(rankedCells(col(vecCol), col("__cents")), 1, nprobe))
          .as("__cell"))
    val scored = c.join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("qv"), col("cv")).as("cosine"))
    // No dedup needed: each corpus row is assigned to exactly one cell,
    // so a (query, neighbor) pair appears at most once across probes.
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Quantized IVF ANN — the faiss `IVFx,SQ8` composition: the corpus
    * is partitioned into inverted lists by nearest centroid (the
    * [[ivfTopK]] coarse quantizer, float — centroid assignment is a
    * one-off, not the scan), but each list STORES int8 codes + a
    * per-vector scale instead of float vectors, and probes score with
    * the native integer kernel (`Int8DotProduct`). The two scale
    * levers compose multiplicatively: nprobe cuts which fraction of
    * the corpus a query touches, SQ8 cuts the bytes per touched
    * vector 4× — and the measured kernel numbers (SCALE.md: HOF int8
    * 5.4× SLOWER than float; codegen int8 faster than float) mean the
    * memory win only cashes through the native kernel, which this
    * uses. Scales are staged as attributes before the codes lambda
    * (the HOF re-evaluation pitfall). Ranking is by the rescaled
    * integer dot (qdot × qscale × nscale) with the neighbor-id
    * tie-break; `qdot` is returned exactly, so external engines replay
    * the ranking bit-for-bit. Result: (query_id, neighbor_id, qdot,
    * rank). */
  def ivfTopKQuantized(corpus: DataFrame, idCol: String, vecCol: String,
                       queryIds: DataFrame, k: Int,
                       numCells: Int = 16, nprobe: Int = 2,
                       trainIters: Int = 0): DataFrame = {
    val cents = ivfCentroids(corpus, idCol, vecCol, numCells, trainIters)
    ivfTopKQuantizedCodes(
      ivfQuantizedIndex(corpus, idCol, vecCol, cents), cents,
      corpus.join(queryIds, Seq(idCol), "left_semi"),
      idCol, vecCol, k, nprobe)
  }

  /** The IVF coarse quantizer as a one-row broadcastable frame —
    * exposed so the quantized index and its probes share ONE centroid
    * set (build once at ingest, reuse every query). */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   numCells: Int, trainIters: Int = 0): DataFrame =
    if (trainIters > 0) trainCentroids(corpus, idCol, vecCol, numCells, trainIters)
    else centroidRow(corpus, idCol, vecCol, numCells)

  /** Ingest-time half of the quantized IVF: assign each corpus vector
    * to its nearest centroid and quantize — (cell, neighbor_id,
    * neighbor_scale, neighbor_codes). Persist this (it is 4× smaller
    * than the float corpus) and the per-query cost reduces to
    * [[ivfTopKQuantizedCodes]]'s probe — assignment and quantization
    * are paid once per ingested vector, amortized over every query,
    * exactly like [[quantizedTopKCodes]]'s codes-at-rest shape. */
  def ivfQuantizedIndex(corpus: DataFrame, idCol: String, vecCol: String,
                        cents: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(cents))
      .withColumn("__cell", element_at(rankedCells(col(vecCol), col("__cents")), 1))
      .select(col("__cell"), col(idCol).as("neighbor_id"),
        col(vecCol).as("__v"), Vectors.int8Scale(col(vecCol)).as("neighbor_scale"))
      .select(col("__cell"), col("neighbor_id"), col("neighbor_scale"),
        Vectors.int8Codes(col("__v"), col("neighbor_scale")).as("neighbor_codes"))

  /** Query-time half: probe the `nprobe` nearest cells per query and
    * score the probed lists with the native integer kernel. `queries`
    * carries (idCol, vecCol) float vectors (queries are few; their
    * quantization is inline and negligible). */
  def ivfTopKQuantizedCodes(index: DataFrame, cents: DataFrame,
                            queries: DataFrame, idCol: String, vecCol: String,
                            k: Int, nprobe: Int): DataFrame = {
    val q = queries.crossJoin(broadcast(cents))
      .select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
        explode(slice(rankedCells(col(vecCol), col("__cents")), 1, nprobe))
          .as("__cell"))
      .select(col("query_id"), col("__cell"), col("__qv"),
        Vectors.int8Scale(col("__qv")).as("query_scale"))
      .select(col("query_id"), col("__cell"), col("query_scale"),
        Vectors.int8Codes(col("__qv"), col("query_scale")).as("query_codes"))
    val scored = index.join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.int8Dot(col("query_codes"), col("neighbor_codes")).as("qdot"),
        col("query_scale"), col("neighbor_scale"))
      .select(col("query_id"), col("neighbor_id"), col("qdot"),
        (col("qdot").cast("double") * col("query_scale") *
          col("neighbor_scale")).as("__sim"))
    // No dedup needed: each corpus row lives in exactly one cell.
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .drop("__sim")
  }

  /** Embedding near-duplicate pairs: pairs with cosine ≥ threshold.
    * Default is the LSH-bucketed (scale-safe) path: candidate pairs are
    * restricted to a shared sign-bucket, so the join is an equi-join.
    * Pass `bucketed = false` ONLY as the small-data oracle — that path
    * is an explicit O(n²) all-pairs comparison. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, bucketed: Boolean = true,
                   numAnchors: Int = 8): DataFrame = {
    val (l, r) =
      if (bucketed) {
        val withB = withLshBucket(corpus, vecCol, corpus, idCol, vecCol, numAnchors)
          .select(col("bucket"), col(idCol).as("id"), col(vecCol).as("v"))
        (withB.select(col("bucket"), col("id").as("id_a"), col("v").as("va")),
         withB.select(col("bucket"), col("id").as("id_b"), col("v").as("vb")))
      } else {
        val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
        (base.select(lit("0").as("bucket"), col("id").as("id_a"), col("v").as("va")),
         base.select(lit("0").as("bucket"), col("id").as("id_b"), col("v").as("vb")))
      }
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Vectors.cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }

  /** SemDeDup (semantic deduplication, Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus embeddings with the IVF
    * coarse quantizer, then inside each cluster drop every row that
    * has a LOWER-id neighbor at cosine ≥ `threshold` — greedy
    * keep-first, the same winner convention as exact dedup
    * (`Dedup.exactKeepFirst`). Near-duplicate SEMANTIC content (same
    * meaning, different words) survives exact and MinHash dedup;
    * this is the embedding-space pass large training-data pipelines
    * run after them.
    *
    * Returns every row as (id, cell, dup_of, kept): `dup_of` is the
    * smallest same-cell id that suppressed this row (null when kept),
    * so the caller can either filter `kept` or audit the clusters.
    *
    * Scale shape: clustering is SemDeDup's whole trick — the
    * quadratic pairwise comparison is confined WITHIN cells, so cost
    * is Σ|cell|² instead of n²; `numCells` scales with the corpus to
    * bound the largest cell (the paper uses ~11k clusters for 1.3B
    * embeddings). Cell assignment is map-side against one broadcast
    * centroid row; the pair join is an equi-join on cell id (one
    * shuffle of the corpus); the suppress step is a min-aggregate +
    * left join, both on the id key. `trainIters > 0` runs Lloyd
    * rounds first ([[trainCentroids]]) for tighter cells. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               numCells: Int, threshold: Double,
               trainIters: Int = 0): DataFrame = {
    val cents =
      if (trainIters > 0) trainCentroids(corpus, idCol, vecCol, numCells, trainIters)
      else centroidRow(corpus, idCol, vecCol, numCells)
    val assigned = corpus.crossJoin(broadcast(cents))
      .select(col(idCol).as("id"), col(vecCol).as("__v"),
        element_at(rankedCells(col(vecCol), col("__cents")), 1).as("cell"))
    val l = assigned.select(col("cell"), col("id"), col("__v"))
    val r = assigned.select(col("cell"), col("id").as("__id2"), col("__v").as("__v2"))
    val suppressed = l.join(r, Seq("cell"))
      .filter(col("__id2") < col("id"))
      .filter(Vectors.cosine(col("__v"), col("__v2")) >= threshold)
      .groupBy(col("id")).agg(min(col("__id2")).as("dup_of"))
    assigned.join(suppressed, Seq("id"), "left")
      .select(col("id"), col("cell"), col("dup_of"),
        col("dup_of").isNull.as("kept"))
  }

  /** Incremental maintenance of a persisted quantized-IVF index over a
    * snapshot table — the vector analog of
    * [[TextIndex.appendForSnapshotVersion]]: assign + quantize ONLY
    * the data files this commit ADDED (manifest diff against the
    * predecessor — carried-by-reference files are already indexed) and
    * append their (cell, id, scale, codes, file) rows. Ingest cost is
    * therefore ∝ the commit's delta, never the corpus; the centroid
    * set is trained once at first ingest and REUSED here (the faiss
    * train-once discipline — re-training would silently shift every
    * existing row's cell). A vacuumed predecessor degrades to
    * re-indexing carried files, which [[ivfProbeSnapshot]]'s per-file
    * dedup absorbs — duplicate index rows cost bytes, never wrong
    * top-k. */
  def appendIvfForSnapshotVersion(spark: SparkSession, root: String,
                                  version: Long, idCol: String, vecCol: String,
                                  cents: DataFrame, indexPath: String): Unit = {
    import graft.sinks.SnapshotStore
    val cur = SnapshotStore.manifest(spark, root, version).map(_.path)
    val prev =
      if (version <= 1 ||
          !SnapshotStore.versions(spark, root).contains(version - 1))
        Set.empty[String]
      else SnapshotStore.manifest(spark, root, version - 1).map(_.path).toSet
    val fresh = cur.filterNot(prev)
      .map(p => new org.apache.hadoop.fs.Path(root, p).toString)
    if (fresh.nonEmpty) {
      val tagged = spark.read.parquet(fresh: _*)
        .withColumn("__srcfile", input_file_name())
      tagged.crossJoin(broadcast(cents))
        .withColumn("__cell", element_at(rankedCells(col(vecCol), col("__cents")), 1))
        .select(col("__cell"), col(idCol).as("neighbor_id"),
          col(vecCol).as("__v"),
          Vectors.int8Scale(col(vecCol)).as("neighbor_scale"), col("__srcfile"))
        .select(col("__cell"), col("neighbor_id"), col("neighbor_scale"),
          Vectors.int8Codes(col("__v"), col("neighbor_scale")).as("neighbor_codes"),
          col("__srcfile").as("file"))
        .write.mode("append")
        .options(graft.sinks.SnapshotStore.fastCommitterOptions)
        .parquet(indexPath)
    }
  }

  /** Probe an incrementally-maintained IVF index against the CURRENT
    * snapshot: index rows are first restricted to files the current
    * manifest still references (the [[TextIndex.searchWordInSnapshot]]
    * liveness rule — rows indexed for files a later merge replaced are
    * ignored, their content lives on in the replacement files indexed
    * at that commit), then probed exactly like
    * [[ivfTopKQuantizedCodes]]. The live-file intersection is a
    * driver-side list bounded by the table's FILE count, not its row
    * count. Results equal a from-scratch index build over the current
    * snapshot with the same centroids — spec-pinned. */
  def ivfProbeSnapshot(spark: SparkSession, root: String, indexPath: String,
                       cents: DataFrame, queries: DataFrame,
                       idCol: String, vecCol: String,
                       k: Int, nprobe: Int = 2): DataFrame =
    ivfTopKQuantizedCodes(liveSnapshotIndex(spark, root, indexPath, idCol),
      cents, queries, idCol, vecCol, k, nprobe)

  /** The live rows of a file-tagged index over a snapshot table: rows
    * restricted to files the CURRENT manifest still references (the
    * [[TextIndex.searchWordInSnapshot]] liveness rule), DV'd files'
    * rows semi-joined against their surviving ids through the full
    * read boundary (bounded by the VECTORED files only — the no-DV
    * common case pays nothing), and the vacuumed-predecessor
    * double-index edge deduped per (id, file). Shared by the int8-IVF
    * and IVF-PQ probe paths. */
  private def liveSnapshotIndex(spark: SparkSession, root: String,
                                indexPath: String, idCol: String): DataFrame = {
    import graft.sinks.SnapshotStore
    val v = SnapshotStore.currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no committed snapshot under $root"))
    val rel = SnapshotStore.manifest(spark, root, v).map(_.path)
    val recorded = spark.read.parquet(indexPath)
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSeq
    // COVERAGE GUARD: every live data file must be indexed, or the
    // probe would silently drop whole files' rows. The classic way to
    // get here is a LAYOUT rewrite (compact / auto-compact / z-order /
    // cluster-by) between maintenance calls: rewritten files carry new
    // names, and their content — old AND new rows — is unindexed until
    // append*ForSnapshotVersion runs for that version too (a layout
    // version's manifest diff is exactly the rewritten files, so the
    // per-version maintenance discipline covers it — it just must not
    // be skipped). Loud beats wrong.
    val uncovered = rel.filterNot(p => recorded.exists(_.endsWith(p)))
    require(uncovered.isEmpty,
      s"index at $indexPath does not cover ${uncovered.size} live data " +
        s"file(s) of $root v$v (e.g. ${uncovered.take(3).mkString(", ")}) — " +
        "run the index maintenance for every version up to the current " +
        "one (layout rewrites like compact/auto-compact/z-order rename " +
        "files and need it too)")
    val live = recorded.filter(f => rel.exists(f.endsWith))
    val index =
      if (live.isEmpty)
        spark.read.parquet(indexPath).filter(lit(false))
      else spark.read.parquet(indexPath)
        .filter(col("file").isInCollection(live))
    // Deletion vectors: index rows describe ORIGINAL file content, so
    // rows of DV-carrying files must drop their deleted ids or the
    // probe would return deleted vectors.
    val entries = SnapshotStore.manifest(spark, root, v)
    val vecFiles = live.filter(f =>
      entries.exists(e => e.dv.nonEmpty && f.endsWith(e.path)))
    val dvClean =
      if (vecFiles.isEmpty) index
      else {
        val liveIds = SnapshotStore.readFiles(spark, root, v, vecFiles)
          .select(col(idCol).as("neighbor_id"))
        index.filter(!col("file").isInCollection(vecFiles))
          .unionByName(index.filter(col("file").isInCollection(vecFiles))
            .join(liveIds, Seq("neighbor_id"), "left_semi"))
      }
    dvClean.dropDuplicates("neighbor_id", "file").drop("file")
  }

  // ------------------------------------------------------------------ //
  // Product quantization (faiss PQm / IVFx,PQm — the production ANN    //
  // shape at 100 TB: m BYTES per stored vector instead of dim floats). //
  // ------------------------------------------------------------------ //

  /** PQ codebooks: the vector space splits into `m` subspaces of
    * dim/m dims; each subspace gets `ks` sub-centroids. Untrained
    * init = the first `ks` corpus vectors' subvectors (deterministic
    * — an external oracle replays code assignment exactly);
    * `trainIters` runs Lloyd's k-means PER SUBSPACE, relationally
    * (assign by L2 over the broadcast books, re-mean by
    * (sub, code, dimension) hash aggregate — two shuffles per round,
    * lineage truncated). One-row broadcastable frame:
    * `__books` = array over subs (ascending) of
    * struct(__sub, __cents: array over codes (ascending) of
    * struct(__code, __sv)). */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int, ks: Int, trainIters: Int = 0): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m subspaces")
    val ds = dim / m
    def subArr = sequence(lit(0), lit(m - 1))
    val seeds = corpus
      .select(col(idCol).as("__sid"), Vectors.toDouble(col(vecCol)).as("__v"))
      .orderBy(col("__sid")).limit(ks)
      .select(col("__sid"), explode(subArr).as("__sub"), col("__v"))
      .select(col("__sub"), col("__sid"),
        slice(col("__v"), col("__sub") * lit(ds) + lit(1), lit(ds)).as("__sv"))
    val w = Window.partitionBy(col("__sub")).orderBy(col("__sid"))
    var perSub = seeds.withColumn("__code", row_number().over(w) - 1)
      .groupBy(col("__sub"))
      .agg(array_sort(collect_list(struct(col("__code"), col("__sv"))))
        .as("__cents"))
    for (_ <- 1 to trainIters) {
      val exploded = corpus
        .select(Vectors.toDouble(col(vecCol)).as("__v"))
        .select(explode(subArr).as("__sub"), col("__v"))
        .select(col("__sub"),
          slice(col("__v"), col("__sub") * lit(ds) + lit(1), lit(ds)).as("__sv"))
      val assigned = exploded.join(broadcast(perSub), Seq("__sub"))
        .select(col("__sub"), col("__sv"),
          element_at(array_sort(transform(col("__cents"), c =>
            struct(Vectors.l2sq(col("__sv"), c.getField("__sv")).as("d"),
              c.getField("__code").as("code")))), 1)
            .getField("code").as("__code"))
      val refreshed = assigned
        .select(col("__sub"), col("__code"),
          posexplode(col("__sv")).as(Seq("__pos", "__x")))
        .groupBy(col("__sub"), col("__code"), col("__pos"))
        .agg(avg(col("__x")).as("__mn"))
        .groupBy(col("__sub"), col("__code"))
        .agg(transform(
          array_sort(collect_list(struct(col("__pos"), col("__mn")))),
          s => s.getField("__mn")).as("__sv"))
      // A cell no vector chose keeps its OLD centroid (faiss keeps
      // empty centroids too): the code space must stay a contiguous
      // 0..ks-1 so code VALUE == LUT POSITION — dropping a cell would
      // silently misalign every flat ADC lookup after it.
      perSub = perSub
        .select(col("__sub"), explode(col("__cents")).as("__c"))
        .select(col("__sub"), col("__c").getField("__code").as("__code"),
          col("__c").getField("__sv").as("__svOld"))
        .join(refreshed, Seq("__sub", "__code"), "left")
        .select(col("__sub"), col("__code"),
          coalesce(col("__sv"), col("__svOld")).as("__sv"))
        .groupBy(col("__sub"))
        .agg(array_sort(collect_list(struct(col("__code"), col("__sv"))))
          .as("__cents"))
      perSub = Checkpoints.truncate(perSub)
    }
    perSub.agg(array_sort(collect_list(struct(col("__sub"), col("__cents"))))
      .as("__books"))
  }

  /** Ingest-time PQ encoding: each vector becomes `m` small ints (the
    * nearest sub-centroid per subspace, by L2 with the code-ascending
    * tie-break) plus its float norm — (neighbor_id, neighbor_norm,
    * pq_codes). Persist this: m ints + one float per vector vs dim
    * floats, the asymmetric-distance trade faiss ships as IVFx,PQm.
    * Assignment cost is paid once per ingested vector, amortized over
    * every probe (the same codes-at-rest shape as
    * [[ivfQuantizedIndex]]). */
  def pqIndex(corpus: DataFrame, idCol: String, vecCol: String,
              books: DataFrame): DataFrame =
    corpus.crossJoin(broadcast(books))
      .select(col(idCol).as("neighbor_id"),
        Vectors.norm(col(vecCol)).as("neighbor_norm"),
        Vectors.toDouble(col(vecCol)).as("__v"), col("__books"))
      .select(col("neighbor_id"), col("neighbor_norm"),
        pqCodesExpr(col("__v"), subDim(books)).as("pq_codes"))

  /** The encode expression both index builders share: per subspace of
    * the broadcast `__books`, the L2-nearest code (code-ascending
    * tie-break). `__books` must be an attribute in scope. */
  private def pqCodesExpr(vecDouble: Column, ds: Int): Column =
    transform(col("__books"), b =>
      element_at(array_sort(transform(b.getField("__cents"), c =>
        struct(Vectors.l2sq(
          slice(vecDouble, b.getField("__sub") * lit(ds) + lit(1), lit(ds)),
          c.getField("__sv")).as("d"),
          c.getField("__code").as("code")))), 1).getField("code"))

  /** Asymmetric-distance (ADC) top-k over a PQ index: per query, ONE
    * m×ks lookup table of subspace dots against the broadcast books;
    * each indexed vector then scores as the sum of m table lookups —
    * never touching its original floats. The score is the ADC cosine
    * APPROXIMATION (Σ_sub lut[sub][code] / (|q|·|n|)); recall floors
    * vs the exact path are spec-pinned, exactness is not claimed.
    * Result: (query_id, neighbor_id, pq_score, rank). */
  def pqTopK(index: DataFrame, books: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = pqQuerySide(books, queries, idCol, vecCol, subDim(books))
    val scored = index.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
    rankAdc(scored, booksKs(books), k)
  }

  /** IVF-PQ index: the coarse quantizer routes each vector to an
    * inverted list ([[ivfTopK]]'s cell assignment), the list stores
    * PQ codes — (cell, neighbor_id, neighbor_norm, pq_codes). */
  def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 cents: DataFrame, books: DataFrame): DataFrame =
    ivfPqIndex(corpus, idCol, vecCol, cents, books, subDim(books))

  private def ivfPqIndex(corpus: DataFrame, idCol: String, vecCol: String,
                         cents: DataFrame, books: DataFrame,
                         ds: Int): DataFrame =
    corpus.crossJoin(broadcast(cents))
      .withColumn("__cell",
        element_at(rankedCells(col(vecCol), col("__cents")), 1))
      .crossJoin(broadcast(books))
      .select(col("__cell"), col(idCol).as("neighbor_id"),
        Vectors.norm(col(vecCol)).as("neighbor_norm"),
        Vectors.toDouble(col(vecCol)).as("__v"), col("__books"))
      .select(col("__cell"), col("neighbor_id"), col("neighbor_norm"),
        pqCodesExpr(col("__v"), ds).as("pq_codes"))

  /** IVF-PQ ANN top-k — the faiss `IVFx,PQm` composition: nprobe
    * bounds WHICH fraction of the corpus a query touches, PQ bounds
    * the BYTES per touched vector (m ints instead of dim floats), and
    * the two multiply. Builds books + centroids from the corpus
    * (share them across queries via [[pqCodebooks]]/[[ivfCentroids]]/
    * [[ivfPqIndex]] at ingest for the production shape).
    * Result: (query_id, neighbor_id, pq_score, rank). */
  def ivfTopKPQ(corpus: DataFrame, idCol: String, vecCol: String,
                queryIds: DataFrame, k: Int,
                numCells: Int = 16, nprobe: Int = 2,
                m: Int = 4, ks: Int = 16, trainIters: Int = 0): DataFrame = {
    // One tiny one-row action for dim; ds and ks then travel as ints —
    // deriving them from the (unpersisted) books frame would re-run
    // the codebook aggregation once per probe-side consumer.
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"embedding dim $dim not divisible by m=$m subspaces")
    val ds = dim / m
    val cents = ivfCentroids(corpus, idCol, vecCol, numCells, trainIters)
    val books = pqCodebooks(corpus, idCol, vecCol, m, ks, trainIters)
    val index = ivfPqIndex(corpus, idCol, vecCol, cents, books, ds)
    val queries = corpus.join(queryIds, Seq(idCol), "left_semi")
    val q = pqQuerySide(books, queries, idCol, vecCol, ds)
      .join(queries.crossJoin(broadcast(cents))
        .select(col(idCol).as("query_id"),
          explode(slice(rankedCells(col(vecCol), col("__cents")), 1, nprobe))
            .as("__cell")),
        Seq("query_id"))
    val scored = index.join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
    rankAdc(scored, ks, k)
  }

  /** Incremental maintenance of a persisted IVF-PQ index over a
    * snapshot table — [[appendIvfForSnapshotVersion]]'s discipline
    * applied to the PQ shape: encode ONLY the data files this commit
    * ADDED (manifest diff against the predecessor) against the FROZEN
    * centroids and codebooks (re-training either would silently shift
    * existing rows' cells / misalign every stored code), and append
    * their (cell, id, norm, codes, file) rows. Ingest cost ∝ the
    * commit's delta, never the corpus — the q160 contract for the
    * production `IVFx,PQm` index. */
  def appendIvfPqForSnapshotVersion(spark: SparkSession, root: String,
                                    version: Long, idCol: String,
                                    vecCol: String, cents: DataFrame,
                                    books: DataFrame,
                                    indexPath: String): Unit = {
    import graft.sinks.SnapshotStore
    val cur = SnapshotStore.manifest(spark, root, version).map(_.path)
    val prev =
      if (version <= 1 ||
          !SnapshotStore.versions(spark, root).contains(version - 1))
        Set.empty[String]
      else SnapshotStore.manifest(spark, root, version - 1).map(_.path).toSet
    val fresh = cur.filterNot(prev)
      .map(p => new org.apache.hadoop.fs.Path(root, p).toString)
    if (fresh.nonEmpty) {
      val ds = subDim(books)
      spark.read.parquet(fresh: _*)
        .withColumn("__srcfile", input_file_name())
        .crossJoin(broadcast(cents))
        .withColumn("__cell",
          element_at(rankedCells(col(vecCol), col("__cents")), 1))
        .crossJoin(broadcast(books))
        .select(col("__cell"), col(idCol).as("neighbor_id"),
          Vectors.norm(col(vecCol)).as("neighbor_norm"),
          Vectors.toDouble(col(vecCol)).as("__v"), col("__books"),
          col("__srcfile"))
        .select(col("__cell"), col("neighbor_id"), col("neighbor_norm"),
          pqCodesExpr(col("__v"), ds).as("pq_codes"),
          col("__srcfile").as("file"))
        .write.mode("append")
        .options(graft.sinks.SnapshotStore.fastCommitterOptions)
        .parquet(indexPath)
    }
  }

  /** ADC probe of a cell-carrying PQ index frame — the probe half of
    * the ingest/probe split ([[ivfTopKPQ]] composed inline; this takes
    * the index as built by [[ivfPqIndex]] / maintained by
    * [[appendIvfPqForSnapshotVersion]]). */
  def ivfPqTopKIndexed(index: DataFrame, cents: DataFrame, books: DataFrame,
                       queries: DataFrame, idCol: String, vecCol: String,
                       k: Int, nprobe: Int = 2): DataFrame = {
    val q = pqQuerySide(books, queries, idCol, vecCol, subDim(books))
      .join(queries.crossJoin(broadcast(cents))
        .select(col(idCol).as("query_id"),
          explode(slice(rankedCells(col(vecCol), col("__cents")), 1, nprobe))
            .as("__cell")),
        Seq("query_id"))
    val scored = index.join(broadcast(q), Seq("__cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
    rankAdc(scored, booksKs(books), k)
  }

  /** Probe an incrementally-maintained IVF-PQ index against the
    * CURRENT snapshot: live-manifest row intersection, DV id
    * filtering, and double-index dedup exactly as
    * [[ivfProbeSnapshot]] (shared [[liveSnapshotIndex]]), then the ADC
    * probe. Results equal a from-scratch [[ivfPqIndex]] build over the
    * current snapshot with the same frozen cents/books — spec-pinned
    * and require-pinned in the oracle row. */
  def ivfPqProbeSnapshot(spark: SparkSession, root: String,
                         indexPath: String, cents: DataFrame,
                         books: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String,
                         k: Int, nprobe: Int = 2): DataFrame =
    ivfPqTopKIndexed(liveSnapshotIndex(spark, root, indexPath, idCol),
      cents, books, queries, idCol, vecCol, k, nprobe)

  /** Subspace width recorded in a books frame. */
  private def subDim(books: DataFrame): Int =
    books.select(size(element_at(element_at(col("__books"), 1)
      .getField("__cents"), 1).getField("__sv"))).head().getInt(0)

  /** Codes per subspace recorded in a books frame. */
  private def booksKs(books: DataFrame): Int =
    books.select(size(element_at(col("__books"), 1).getField("__cents")))
      .head().getInt(0)

  /** Query side of an ADC probe: (query_id, __qnorm, __lut) where
    * __lut is the FLATTENED m×ks table (flat index sub·ks + code). */
  private def pqQuerySide(books: DataFrame, queries: DataFrame,
                          idCol: String, vecCol: String, ds: Int): DataFrame =
    queries.crossJoin(broadcast(books))
      .select(col(idCol).as("query_id"),
        Vectors.norm(col(vecCol)).as("__qnorm"),
        Vectors.toDouble(col(vecCol)).as("__qv"), col("__books"))
      .select(col("query_id"), col("__qnorm"),
        flatten(transform(col("__books"), b =>
          transform(b.getField("__cents"), c =>
            Vectors.dot(
              slice(col("__qv"), b.getField("__sub") * lit(ds) + lit(1), lit(ds)),
              c.getField("__sv"))))).as("__lut"))

  /** Σ of m LUT lookups, normalized by both norms, ranked per query.
    * The flat-index arithmetic ((sub·ks + code) + 1, 1-based) is the
    * ONLY coupling between encode and probe — both sides derive it
    * from the same books ordering. */
  private def rankAdc(scored: DataFrame, ks: Int, k: Int): DataFrame = {
    val m = size(col("pq_codes"))
    val flatIdx = zip_with(col("pq_codes"), sequence(lit(0), m - 1),
      (c, s) => s * lit(ks) + c)
    val adc = aggregate(flatIdx, lit(0.0),
      (acc, i) => acc + element_at(col("__lut"), (i + 1).cast("int")))
    val sim = (adc / (col("__qnorm") * col("neighbor_norm"))).as("pq_score")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_score").desc, col("neighbor_id").asc)
    scored.select(col("query_id"), col("neighbor_id"), sim)
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
