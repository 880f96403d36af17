package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Ad-hoc stage profiler for the dedup pipeline (dev tool). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count()
    def time(name: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    // Force evaluation via an aggregate over the value — a bare
    // count() lets Catalyst prune the projection entirely.
    def force(c: org.apache.spark.sql.Column): Long =
      docs.select(xxhash64(c).as("h")).agg(max("h")).collect()(0).getLong(0)
    time("normalized")(force(TextAnalysis.normalized(col("text"))))
    time("tokens")(force(TextAnalysis.tokens(TextAnalysis.normalized(col("text")))))
    time("shingles")(force(TextAnalysis.shingles(col("text"))))
    time("minhash_sig_md5")(force(
      graft.operators.Dedup.minHashSignature(col("text"), 12, 3)))
    time("minhash_sig_xx")(force(
      graft.operators.Dedup.minHashSignature(col("text"), 12, 3, fastHash = true)))
    time("simhash64")(force(graft.operators.Dedup.simHash(col("text"), 64)))
    import graft.operators.Dedup
    time("minhash_banded_explode") {
      val sig = docs.select(col("doc_id").as("id"),
        Dedup.minHashSignature(col("text"), 12, 3, fastHash = true).as("sig"))
      sig.select(col("id"), col("sig"),
        posexplode(array((0 until 4).map(b =>
          xxhash64(slice(col("sig"), b * 3 + 1, 3))): _*))).count()
    }
    time("minhash_pairs_fast")(
      Dedup.minHashPairs(docs, col("text"), col("doc_id"), 12, 4,
        threshold = 0.5, fastHash = true).count())
    time("minhash_pairs_nodistinct") {
      val d = Dedup.minHashPairs(docs, col("text"), col("doc_id"), 12, 4,
        threshold = 0.0, fastHash = true)
      d.count()
    }
    time("simhash_pairs")(
      Dedup.simHashPairs(docs, col("text"), col("doc_id"), 64, 4, 3).count())
    spark.stop()
  }
}
