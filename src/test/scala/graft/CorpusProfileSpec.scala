package graft

import org.apache.spark.sql.functions._

import graft.operators.Stats

/** E54/E55: corpus profile (exact histogram percentiles) and the
  * Zipf-head term-frequency diagnostic. */
class CorpusProfileSpec extends SparkSpec {
  import spark.implicits._

  test("corpusProfile: counts, vocab, and exact type-1 percentiles") {
    // Token counts: 1, 2, 3, 4 -> n=4, tot=10.
    val docs = Seq(
      (1L, "alpha"),
      (2L, "alpha beta"),
      (3L, "alpha beta gamma"),
      (4L, "alpha beta gamma Delta!")
    ).toDF("id", "text")
    val r = Stats.corpusProfile(docs, col("text")).collect()(0)
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("total_tokens") == 10L)
    // normalized vocab: alpha beta gamma delta (case/punct folded).
    assert(r.getAs[Long]("vocab_size") == 4L)
    // p50 = smallest l with cum >= ceil(0.5*4)=2 -> l=2;
    // p90: ceil(3.6)=4 -> l=4; p99: ceil(3.96)=4 -> l=4.
    assert(r.getAs[Long]("p50_tokens") == 2L)
    assert(r.getAs[Long]("p90_tokens") == 4L)
    assert(r.getAs[Long]("p99_tokens") == 4L)
  }

  test("corpusProfile handles an empty corpus and empty docs") {
    val empty = Seq.empty[(Long, String)].toDF("id", "text")
    val r0 = Stats.corpusProfile(empty, col("text")).collect()(0)
    assert(r0.getAs[Long]("n_docs") == 0L &&
      r0.getAs[Long]("total_tokens") == 0L &&
      r0.getAs[Long]("vocab_size") == 0L &&
      r0.getAs[Long]("p50_tokens") == 0L)
    val blank = Seq((1L, ""), (2L, "word")).toDF("id", "text")
    val r1 = Stats.corpusProfile(blank, col("text")).collect()(0)
    assert(r1.getAs[Long]("n_docs") == 2L)
    assert(r1.getAs[Long]("total_tokens") == 1L)
    assert(r1.getAs[Long]("p50_tokens") == 0L) // ceil(1)=1 -> l=0 covers
  }

  test("termFrequencies returns the Zipf head with deterministic ties") {
    val docs = Seq(
      (1L, "spam spam spam eggs"),
      (2L, "eggs ham"),
      (3L, "Ham! toast")
    ).toDF("id", "text")
    val r = Stats.termFrequencies(docs, col("text"), k = 3)
      .as[(String, Long)].collect().toSeq
    // spam 3, eggs 2, ham 2 (case/punct folded; eggs < ham on tie).
    assert(r == Seq(("spam", 3L), ("eggs", 2L), ("ham", 2L)))
  }
}
