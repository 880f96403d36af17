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

  test("bucketed as-of equals the plain as-of on random data with gaps and boundary ties") {
    val r = new scala.util.Random(11)
    val hour = 3600L * 1000000L
    // One HOT key (0) with most rows, sparse keys, dims clustered so
    // whole buckets have no dims (exercises gap carry-forward), plus
    // exact bucket-boundary timestamps (exercises seed tie rules).
    def ts(off: Long) = new Timestamp(1700000000000L + off / 1000)
    val facts = ((0 until 400).map { i =>
      val k = if (i % 4 != 0) 0L else r.nextInt(3).toLong + 1
      (k, ts(r.nextInt(48) * hour / 2 + r.nextInt(1000) * 1000000L), i.toLong)
    } ++ Seq((0L, ts(4 * hour), 9001L), (1L, ts(8 * hour), 9002L)))
      .toDF("k", "ts", "fact_id")
    val dims = ((0 until 80).map { i =>
      val k = if (i % 3 != 0) 0L else r.nextInt(3).toLong + 1
      // Dims only in the first 12 hours: later buckets are all gaps.
      (k, ts(r.nextInt(12) * hour + r.nextInt(1000) * 1000000L), i.toDouble)
    } ++ Seq((0L, ts(4 * hour), 777.0), (0L, ts(4 * hour), 778.0)))
      .toDF("k", "ts", "lvl")
    val plain = RangeJoin.asofJoin(facts, dims, "k", "ts", "ts", Seq("lvl"))
      .select($"fact_id", $"lvl").as[(Long, Option[Double])].collect().toMap
    val bucketed = RangeJoin.asofJoinBucketed(facts, dims, "k", "ts", "ts",
        Seq("lvl"), bucketWidthMicros = hour)
      .select($"fact_id", $"lvl").as[(Long, Option[Double])].collect().toMap
    assert(bucketed == plain,
      s"diverged on ${plain.keySet.filter(k => plain(k) != bucketed.get(k).flatten).take(5)}")
    // The boundary fact at exactly 4h must see the real dim at 4h
    // (greatest payload 778.0), not a stale carried seed.
    assert(plain(9001L).contains(778.0))
    // A fact in a dim-less bucket inherits from hours before.
    assert(plain(9002L).isDefined)
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

  test("asofJoinAuto picks plain on uniform keys, bucketed on a hot key — same answers") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2025-04-15 00:00:00").getTime
    val dims = (1L to 200L).map(i =>
      (i % 50, new Timestamp(base + i * 9000), i.toDouble)).toDF("k", "ts", "lvl")
    def plan(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString

    // Uniform: 50 keys × 40 rows — under the threshold, plain variant
    // (no shard column in the window partitioning).
    val uniform = (1L to 2000L).map(i =>
      (i % 50, new Timestamp(base + i * 1000), i)).toDF("k", "ts", "fact_id")
    val autoUniform = RangeJoin.asofJoinAuto(uniform, dims, "k", "ts", "ts",
      Seq("lvl"), hotKeyThreshold = 100)
    assert(!plan(autoUniform).contains("__bk"), "uniform keys should pick plain")

    // Hot: one key holds 1500 of 2000 rows — over the threshold, the
    // bucketed variant, with byte-identical results to plain.
    val hot = (1L to 2000L).map(i =>
      (if (i <= 1500) 0L else i % 50, new Timestamp(base + i * 1000), i))
      .toDF("k", "ts", "fact_id")
    val autoHot = RangeJoin.asofJoinAuto(hot, dims, "k", "ts", "ts",
      Seq("lvl"), hotKeyThreshold = 100, targetRowsPerBucket = 200)
    assert(plan(autoHot).contains("__bk"), "hot key should pick bucketed")
    val want = RangeJoin.asofJoin(hot, dims, "k", "ts", "ts", Seq("lvl"))
      .collect().map(_.toSeq).toSet
    assert(autoHot.collect().map(_.toSeq).toSet == want)
  }

  test("asofJoinAuto degrades to plain when a hot key has only null timestamps") {
    import java.sql.Timestamp
    // 1500 rows on one key, ALL with null ts: over the hot-key threshold
    // but with no time span to bucket on — must fall back to the plain
    // variant (which carries null-ts rows through unmatched), not NPE on
    // the min/max probe.
    val hot = (1L to 2000L).map { i =>
      val t: Timestamp = if (i <= 1500) null
        else Timestamp.valueOf("2025-04-15 10:00:00")
      (if (i <= 1500) 0L else i % 50, t, i)
    }.toDF("k", "ts", "fact_id")
    // Every fact ts null (the probe's min/max both null).
    val allNull = hot.withColumn("ts",
      org.apache.spark.sql.functions.lit(null).cast("timestamp"))
    val dims = Seq((0L, ts("2025-04-15 09:00:00"), 1.0)).toDF("k", "ts", "lvl")
    val out = RangeJoin.asofJoinAuto(allNull, dims, "k", "ts", "ts",
      Seq("lvl"), hotKeyThreshold = 100)
    val want = RangeJoin.asofJoin(allNull, dims, "k", "ts", "ts", Seq("lvl"))
      .collect().map(_.toSeq).toSet
    assert(out.collect().map(_.toSeq).toSet == want)
    assert(out.count() == 2000)
  }

  test("inputs carrying the join's internal column names are rejected, not corrupted") {
    val facts = Seq((1L, ts("2025-04-15 10:00:00"), "f")).toDF("k", "ts", "fact_id")
    val dims = Seq((1L, ts("2025-04-15 09:00:00"), 1.0)).toDF("k", "ts", "lvl")
    // __bk on a fact, __p_* on a dim: both staged internally and both
    // silently overwritten before this guard existed.
    val e1 = intercept[IllegalArgumentException] {
      RangeJoin.asofJoin(facts.withColumn("__bk", lit(9)), dims,
        "k", "ts", "ts", Seq("lvl"))
    }
    assert(e1.getMessage.contains("__bk"))
    val e2 = intercept[IllegalArgumentException] {
      RangeJoin.asofJoinBucketed(facts, dims.withColumn("__p_lvl", lit(0.0)),
        "k", "ts", "ts", Seq("lvl"), bucketWidthMicros = 3600000000L)
    }
    assert(e2.getMessage.contains("__p_lvl"))
  }
}
