package graft

import org.apache.spark.sql.functions._

import graft.operators.Repetition

/** E51: Gopher-style repetition signals and gate. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("line duplication signals count repeats beyond the first") {
    val docs = Seq(
      (1L, "alpha\nbeta\ngamma"),              // no repeats
      (2L, "click here\nbody text\nclick here\nclick here"), // 2 repeats
      (3L, ""),                                 // empty
      (4L, "only line"),
      (5L, "x\n x \nx")                         // trims before comparing
    ).toDF("id", "text")
    val r = docs.select(col("id"), Repetition.signals(col("text")).as("s"))
      .select(col("id"), col("s.dup_line_frac"), col("s.dup_line_char_frac"))
      .as[(Long, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L) == ((0.0, 0.0)))
    // 4 lines, 2 distinct -> dup_line_frac = 0.5; chars 10+9+10+10=39?
    // "click here"=10, "body text"=9: total 10+9+10+10=39, distinct 19,
    // dup chars 20 -> 20/39.
    assert(r(2L)._1 == 0.5 && math.abs(r(2L)._2 - 20.0 / 39) < 1e-3)
    assert(r(3L) == ((0.0, 0.0)))
    assert(r(4L) == ((0.0, 0.0)))
    // "x" three times after trim: dup frac 2/3, char frac 2/3.
    assert(math.abs(r(5L)._1 - 2.0 / 3) < 1e-3)
    assert(math.abs(r(5L)._2 - 2.0 / 3) < 1e-3)
  }

  test("topNgramCharShare finds the hammered bigram; ties break to greatest") {
    val docs = Seq(
      (1L, "buy now buy now buy now totally"),
      (2L, "a b a b c d c d")                   // "a b" and "c d" tie at 2
    ).toDF("id", "text")
    val r = Repetition.topNgramCharShare(docs, col("text"), col("id"))
      .as[(Long, String, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    // "buy now" occurs 3x... bigrams: buy-now, now-buy, now-buy? Count:
    // [buy now][now buy][buy now][now buy][buy now][now totally]:
    // "buy now" 3, "now buy" 2 -> winner "buy now" (7 chars * 3 / 31).
    assert(r(1L)._1 == "buy now" && r(1L)._2 == 3L)
    assert(math.abs(r(1L)._3 - 21.0 / 31) < 1e-3)
    // Tie at 2 between "a b","b a","c d","d c"? "a b" 2, "b a" 1,
    // "b c" 1, "c d" 2, "d c" 1 -> tie a b / c d -> greatest = "c d".
    assert(r(2L)._1 == "c d" && r(2L)._2 == 2L)
  }

  test("documents shorter than n tokens survive with their whole-text shingle") {
    val docs = Seq((1L, "single"), (2L, "")).toDF("id", "text")
    val r = Repetition.topNgramCharShare(docs, col("text"), col("id"))
      .as[(Long, String, Long, Double)].collect()
      .map(t => t._1 -> t._2).toMap
    assert(r(1L) == "single")
    assert(r.contains(2L))
  }

  test("gate drops line-spam and keyword-stuffed docs, keeps prose") {
    val docs = Seq(
      (1L, "a normal paragraph of reasonable prose\nwith varied " +
        "content across lines\nand no repetition to speak of"),
      (2L, Seq.fill(10)("subscribe to our newsletter").mkString("\n")),
      (3L, Seq.fill(20)("cheap flights").mkString(" ") + " and nothing else")
    ).toDF("id", "text")
    val kept = Repetition.gate(docs, col("text"), col("id"))
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L), s"kept $kept")
  }

  test("signals plan is shuffle-free (pure map-side projection)") {
    val docs = Seq((1L, "a\nb")).toDF("id", "text")
    val plan = docs.select(Repetition.signals(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
