package graft

import org.apache.spark.sql.functions._
import graft.operators.TfIdf

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "banana durian unique")).toDF("doc_id", "text")

  test("docRarity ranks rare-vocabulary docs above boilerplate-heavy ones") {
    val r = TfIdf.docRarity(docs, $"text", $"doc_id")
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    // d3 carries two corpus-unique terms, d2 one, d1 none.
    assert(r(3L) > r(2L) && r(2L) > r(1L), r.toString)
    // Spot value: d1 = tf-weighted idf of {apple 2/3, banana 1/3},
    // both df=2 -> idf = ln(4/3)+1 everywhere.
    assert(math.abs(r(1L) - (math.log(4.0 / 3) + 1)) < 1e-4)
  }

  test("topRareTerms surfaces the highest-idf terms, lexicographic on ties") {
    val r = TfIdf.topRareTerms(docs, $"text", $"doc_id", k = 2)
      .collect().map(x => x.getLong(0) -> x.getSeq[String](1)).toMap
    assert(r(3L) == Seq("durian", "unique")) // tied idf, lexicographic
    assert(r(2L).head == "cherry")
  }
}
