package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Big×big as-of join: latest dim at-or-before each fact, one window
  * pass, deterministic ties, nulls before the first dim. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("each fact picks the latest dim at or before its timestamp per key") {
    val facts = Seq(
      (1L, ts("2025-04-15 09:00:00"), "f1"), // before any dim -> null
      (1L, ts("2025-04-15 10:00:00"), "f2"), // exactly at dim A -> A
      (1L, ts("2025-04-15 10:30:00"), "f3"), // between A and B -> A
      (1L, ts("2025-04-15 12:00:00"), "f4"), // after B -> B
      (2L, ts("2025-04-15 10:30:00"), "g1")) // other key, own dim
      .toDF("user_id", "ts", "fact_id")
    val dims = Seq(
      (1L, ts("2025-04-15 10:00:00"), "A"),
      (1L, ts("2025-04-15 11:00:00"), "B"),
      (2L, ts("2025-04-15 10:00:00"), "X"))
      .toDF("user_id", "ts", "level")
    val out = RangeJoin.asofJoin(facts, dims, "user_id", "ts", "ts", Seq("level"))
      .select($"fact_id", $"level").as[(String, Option[String])].collect().toMap
    assert(out == Map("f1" -> None, "f2" -> Some("A"), "f3" -> Some("A"),
      "f4" -> Some("B"), "g1" -> Some("X")))
  }

  test("dims tied on (key, ts) resolve to the greatest payload deterministically") {
    val facts = Seq((1L, ts("2025-04-15 10:00:00"), "f")).toDF("user_id", "ts", "fact_id")
    val dims = Seq(
      (1L, ts("2025-04-15 10:00:00"), "A"),
      (1L, ts("2025-04-15 10:00:00"), "C"),
      (1L, ts("2025-04-15 10:00:00"), "B")).toDF("user_id", "ts", "level")
    val out = RangeJoin.asofJoin(facts, dims, "user_id", "ts", "ts", Seq("level"))
      .select($"level").as[String].head()
    assert(out == "C")
  }

  test("matches the equivalent (quadratic) correlated lookup on random data") {
    val r = new scala.util.Random(7)
    val facts = (0 until 300).map(i =>
      (r.nextInt(5).toLong, new Timestamp(1700000000000L + r.nextInt(100000) * 1000L), i.toLong))
      .toDF("k", "ts", "fact_id")
    val dims = (0 until 60).map(i =>
      (r.nextInt(5).toLong, new Timestamp(1700000000000L + r.nextInt(100000) * 1000L), i.toDouble))
      .toDF("k", "ts", "lvl")
    val got = RangeJoin.asofJoin(facts, dims, "k", "ts", "ts", Seq("lvl"))
      .select($"fact_id", $"lvl").as[(Long, Option[Double])].collect().toMap
    // Reference: inequality join + max_by per fact (fine at spec size).
    val want = facts.as("f").join(dims.as("d"),
        $"f.k" === $"d.k" && $"d.ts" <= $"f.ts", "left_outer")
      .groupBy($"fact_id")
      .agg(max_by(struct($"d.lvl"), struct($"d.ts", $"d.lvl")).as("s"))
      .select($"fact_id", $"s.lvl").as[(Long, Option[Double])].collect().toMap
    assert(got == want)
  }

  test("one shuffle: the plan contains a single exchange for the window") {
    val facts = Seq((1L, ts("2025-04-15 10:00:00"), "f")).toDF("k", "ts", "fact_id")
    val dims = Seq((1L, ts("2025-04-15 09:00:00"), 1.0)).toDF("k", "ts", "lvl")
    val plan = RangeJoin.asofJoin(facts, dims, "k", "ts", "ts", Seq("lvl"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected exactly one hash exchange:\n${plan.take(800)}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }
}
