package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** E73/E74: SemDeDup (embedding-space semantic dedup, cell-confined
  * greedy keep-first) and the cross-document duplicated-span profile
  * (Lee et al. ExactSubstr signal). */
class SemDedupSpanSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("semDedup suppresses lower-id near-neighbors within a cell only") {
    // Centroids are the first 2 ids: cell 1 ≈ x-axis, cell 2 ≈ y-axis.
    val corpus = emb(
      (1L, Seq(1.0f, 0.0f)),   // cell 1 (is centroid 1)
      (2L, Seq(0.0f, 1.0f)),   // cell 2 (is centroid 2)
      (3L, Seq(0.99f, 0.01f)), // cell 1, cos(3,1) ≈ 1 → suppressed by 1
      (4L, Seq(0.01f, 0.99f)), // cell 2, cos(4,2) ≈ 1 → suppressed by 2
      (5L, Seq(0.6f, 0.8f)))   // cell 2, cos to 2 and 4 ≈ 0.8 → kept
    val got = Similarity.semDedup(corpus, "vec_id", "embedding",
        numCells = 2, threshold = 0.95)
      .select("id", "cell", "dup_of", "kept")
      .as[(Long, Long, Option[Long], Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, None, true),
      (2L, 2L, None, true),
      (3L, 1L, Some(1L), false),
      (4L, 2L, Some(2L), false),
      (5L, 2L, None, true)))
  }

  test("semDedup near-dups in DIFFERENT cells both survive (the SemDeDup recall trade)") {
    val corpus = emb(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.72f, 0.69f)),  // nearest centroid 1
      (4L, Seq(0.69f, 0.72f)))  // nearest centroid 2; cos(3,4) ≈ 0.999
    val got = Similarity.semDedup(corpus, "vec_id", "embedding",
        numCells = 2, threshold = 0.95)
    assert(got.filter(col("kept")).count() == 4)
    // Sanity: they really are near-dups — only the cell split saved #4.
    val cos = corpus.filter($"vec_id" === 3).select($"embedding".as("a"))
      .crossJoin(corpus.filter($"vec_id" === 4).select($"embedding".as("b")))
      .select(graft.functions.Vectors.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(cos > 0.95)
  }

  test("semDedup suppressor is the SMALLEST qualifying same-cell id") {
    val corpus = emb(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.99f, 0.0f)),
      (7L, Seq(0.98f, 0.01f))) // near both 1 and 3 → dup_of = 1
    val got = Similarity.semDedup(corpus, "vec_id", "embedding",
        numCells = 2, threshold = 0.95)
      .filter($"id" === 7).select("dup_of").as[Option[Long]].head()
    assert(got.contains(1L))
  }

  test("dupSpanStats counts cross-document span positions, distinct-doc gated") {
    val boiler = "alpha bravo charlie delta echo"  // exactly one 5-window
    val docs = Seq(
      (1L, s"$boiler foxtrot golf hotel india juliet"),
      (2L, s"kilo lima mike november oscar $boiler"),
      (3L, "papa quebec romeo sierra tango uniform")).toDF("doc_id", "text")
    // 10 tokens → 6 windows each for docs 1/2; only the shared boiler
    // window (positions differ per doc) is duplicated.
    val counts = Dedup.dupSpanStats(docs, col("text"), col("doc_id"), width = 5)
      .select("id", "n_spans", "n_dup_spans").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(counts(1L) == ((6L, 1L)))
    assert(counts(2L) == ((6L, 1L)))
    assert(counts(3L) == ((2L, 0L)))
  }

  test("a phrase repeated WITHIN one document is not boilerplate (C4 convention)") {
    val docs = Seq(
      (1L, "one two three four five x one two three four five"),
      (2L, "six seven eight nine ten eleven")).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(docs, col("text"), col("doc_id"), width = 5)
      .filter($"id" === 1).select("n_dup_spans").as[Long].head()
    assert(got == 0L)
  }

  test("documents shorter than the window contribute one whole-text span") {
    val docs = Seq(
      (1L, "tiny doc"),
      (2L, "tiny doc"),
      (3L, "other text")).toDF("doc_id", "text")
    val got = Dedup.dupSpanStats(docs, col("text"), col("doc_id"), width = 5)
      .select("id", "n_spans", "n_dup_spans", "dup_span_ratio").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((1L, 1L, 1.0)))
    assert(got(2L) == ((1L, 1L, 1.0)))
    assert(got(3L) == ((1L, 0L, 0.0)))
  }

  private def removed(docs: org.apache.spark.sql.DataFrame): Map[Long, (String, Long, Long)] =
    Dedup.removeDupSpans(docs, col("text"), col("doc_id"), width = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap

  test("removeDupSpans cuts exactly the covered tokens, keeping order") {
    // Docs 1 and 2 share the exact run "alpha beta gamma" (3 tokens =
    // one duplicated window); everything else is unique.
    val docs = Seq(
      (1L, "start alpha beta gamma end piece"),
      (2L, "alpha beta gamma closing words here"),
      (3L, "wholly unrelated text body lives")).toDF("doc_id", "text")
    val got = removed(docs)
    assert(got(1L) == (("start end piece", 6L, 3L)))
    assert(got(2L) == (("closing words here", 6L, 3L)))
    assert(got(3L) == (("wholly unrelated text body lives", 5L, 5L)))
  }

  test("removeDupSpans: overlapping duplicated windows cover their union, not double-cut") {
    // Shared run of 4 tokens = two overlapping width-3 windows in each
    // doc; coverage is the 4-token union.
    val docs = Seq(
      (1L, "aa bb cc dd keepone"),
      (2L, "keeptwo aa bb cc dd")).toDF("doc_id", "text")
    val got = removed(docs)
    assert(got(1L) == (("keepone", 5L, 1L)))
    assert(got(2L) == (("keeptwo", 5L, 1L)))
  }

  test("removeDupSpans: within-document repetition alone removes nothing") {
    val docs = Seq(
      (1L, "echo echo echo echo echo echo"),
      (2L, "fully distinct other content")).toDF("doc_id", "text")
    val got = removed(docs)
    assert(got(1L)._1 == "echo echo echo echo echo echo")
    assert(got(1L)._3 == 6L)
  }

  test("removeDupSpans: short duplicated documents empty whole; empties survive as rows") {
    val docs = Seq(
      (1L, "tiny doc"),
      (2L, "tiny doc"),
      (3L, "other words")).toDF("doc_id", "text")
    val got = removed(docs)
    assert(got(1L) == (("", 2L, 0L)))
    assert(got(2L) == (("", 2L, 0L)))
    assert(got(3L) == (("other words", 2L, 2L)))
  }
}
