package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 40L).map { i =>
    (i, if (i % 2 == 0) "en" else "de", 10L) // every doc is 10 tokens
  }.toDF("id", "lang", "tokens")

  test("sampleToTokenBudget keeps a deterministic per-stratum prefix within budget") {
    val out = Sampling.sampleToTokenBudget(corpus, $"tokens", $"id", $"lang", 70L)
    val perLang = out.groupBy($"lang").agg(count(lit(1)).as("n"),
      sum($"tokens").as("tok")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 10-token docs, 70-token budget -> exactly 7 docs / 70 tokens per stratum.
    assert(perLang("en") == (7L, 70L) && perLang("de") == (7L, 70L))
    // Deterministic: same sample on re-run.
    val again = Sampling.sampleToTokenBudget(corpus, $"tokens", $"id", $"lang", 70L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("sampleToTokenBudget: a budget below the first doc keeps nothing") {
    val out = Sampling.sampleToTokenBudget(corpus, $"tokens", $"id", $"lang", 9L)
    assert(out.isEmpty)
  }

  test("sampleNPerStratum caps documents per stratum deterministically") {
    val out = Sampling.sampleNPerStratum(corpus, $"id", $"lang", 5)
    val n = out.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n == Map("en" -> 5L, "de" -> 5L))
    // Oversized cap returns everything.
    assert(Sampling.sampleNPerStratum(corpus, $"id", $"lang", 100).count() == 40)
  }
}
