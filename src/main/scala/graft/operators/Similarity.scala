package graft.operators

import org.apache.spark.sql.DataFrame
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
  * the 100 TB path, at the cost of recall.
  */
object Similarity {

  /** Exact brute-force top-k cosine neighbors for each query vector.
    * `queries` and `corpus` both carry (idCol, vecCol). Self-matches are
    * excluded. Result: (query_id, neighbor_id, cosine, rank). */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
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

  /** Random-hyperplane-style LSH bucket signature using the first
    * `numAnchors` corpus vectors as hyperplanes (deterministic, data-
    * derived — no RNG needed). Vectors whose cosine is high agree on
    * most projection signs, so they land in the same bucket with high
    * probability. Returns (id, bucket) where bucket packs the sign bits
    * into a long. */
  def lshBuckets(corpus: DataFrame, idCol: String, vecCol: String,
                 anchors: DataFrame, numAnchors: Int = 8): DataFrame = {
    val anchorRows = anchors.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(numAnchors).collect()
    val anchorLits = anchorRows.map { r =>
      val arr = r.getSeq[Float](1)
      array(arr.map(x => lit(x)): _*)
    }
    val bits = anchorLits.zipWithIndex.map { case (a, i) =>
      shiftleft(Vectors.projectionBit(col(vecCol), a).cast("long"), i)
    }
    corpus.select(col(idCol).as("id"), bits.reduce(_ + _).as("bucket"))
  }

  /** Bucketed ANN: top-k per query restricted to the query's LSH bucket.
    * The join is an equi-join on bucket — shuffle moves each corpus row
    * once; no cross product. Recall < 1 by construction (report it
    * against [[bruteForceTopK]] on a sample when tuning numAnchors). */
  def bucketedTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queryIds: DataFrame, k: Int, numAnchors: Int = 8): DataFrame = {
    val buckets = lshBuckets(corpus, idCol, vecCol, corpus, numAnchors)
    val withB = corpus.join(buckets, corpus(idCol) === buckets("id")).drop("id")
    val q = withB.join(queryIds, Seq(idCol), "left_semi")
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"), col("bucket"))
    val c = withB.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"), col("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        Vectors.cosine(col("qv"), col("cv")).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: all pairs with cosine ≥ threshold.
    * Quadratic baseline (corpus × corpus) — at scale, restrict via
    * [[lshBuckets]] first (join on bucket), which this does when
    * `bucketed` is true. */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, bucketed: Boolean = false,
                   numAnchors: Int = 8): DataFrame = {
    val base = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val (l, r) =
      if (bucketed) {
        val b = lshBuckets(corpus, idCol, vecCol, corpus, numAnchors)
        val withB = base.join(b, "id")
        (withB.select(col("bucket"), col("id").as("id_a"), col("v").as("va")),
         withB.select(col("bucket"), col("id").as("id_b"), col("v").as("vb")))
      } else {
        (base.select(lit(0).as("bucket"), col("id").as("id_a"), col("v").as("va")),
         base.select(lit(0).as("bucket"), col("id").as("id_b"), col("v").as("vb")))
      }
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), Vectors.cosine(col("va"), col("vb")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .distinct()
  }
}
