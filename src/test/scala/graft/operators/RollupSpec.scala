package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotStore

/** Incremental exact aggregates ([[Rollup]]): the pre-image change
  * feed, additive SUM/COUNT maintenance under arbitrary DML, the
  * MIN/MAX rebuild of groups that lose rows, NULL-sum restoration via
  * the non-null witness, group moves, and idempotence. The rollup
  * GROUP column is deliberately NOT the source's partition column —
  * the snapshot store refuses partition-moving upserts, but a data
  * column regrouping is an ordinary update, and the pre-image is what
  * lets the rollup subtract it from the old group. */
class RollupSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(prefix: String): String =
    s"${Files.createTempDirectory(prefix)}/t"

  private def rows(n: Int) = (1 to n).map(i =>
    (i.toLong, s"p${i % 2}", s"g${i % 3}", i * 10,
      if (i % 5 == 0) None else Some(i.toDouble)))
    .toDF("id", "part", "grp", "qty", "score")

  test("changes(preImages=true): updates emit pre+post rows; inserts and deletes one row") {
    val root = freshRoot("ru_cdf")
    SnapshotStore.commit(spark,
      Seq((1L, "p0", "a", 10), (2L, "p0", "b", 20))
        .toDF("id", "part", "grp", "qty"), root, "part")
    // v2: update id 1 (regroups a→b within its partition), delete
    // id 2, insert id 3.
    SnapshotStore.upsertDeleteCommit(spark, root,
      Seq((1L, "p0", "b", 11), (3L, "p0", "a", 30))
        .toDF("id", "part", "grp", "qty"),
      Some(Seq(Tuple1(2L)).toDF("id")), "id", "part")
    val feed = SnapshotStore.changes(spark, root, 1L, 2L, Seq("id"),
      preImages = true)
      .select($"id", $"grp", $"qty", $"_change_type")
      .as[(Long, String, Int, String)].collect().toSet
    assert(feed == Set(
      (1L, "a", 10, "update_preimage"), (1L, "b", 11, "update_postimage"),
      (2L, "b", 20, "delete"), (3L, "a", 30, "insert")), feed)
    // Default stays the single-row convention.
    val one = SnapshotStore.changes(spark, root, 1L, 2L, Seq("id"))
      .filter($"_change_type" === "update").count()
    assert(one == 1L)
  }

  test("sum-only rollup stays additive and exact under insert, update, delete; NULL sum restores") {
    val srcRoot = freshRoot("ru_src"); val rollRoot = freshRoot("ru_roll")
    SnapshotStore.commit(spark, rows(30), srcRoot, "part")
    def sync() = Rollup.sync(spark, srcRoot, rollRoot,
      Seq("id"), Seq("grp"), Seq("qty", "score"))
    assert(sync() == 1L)
    assert(sync() == 1L) // idempotent, no new rollup commit
    assert(SnapshotStore.currentVersion(spark, rollRoot).contains(1L))
    // Window 2: an update that REGROUPS id 3 from g0 to g1 (the
    // pre-image subtracts it from g0), a delete, and inserts.
    SnapshotStore.upsertDeleteCommit(spark, srcRoot,
      Seq((3L, "p1", "g1", 999, Some(3.0)), (31L, "p1", "g1", 310, None),
        (32L, "p0", "g2", 320, Some(32.0)))
        .toDF("id", "part", "grp", "qty", "score"),
      Some(Seq(Tuple1(7L)).toDF("id")), "id", "part")
    sync()
    assert(SnapshotStore.currentVersion(spark, rollRoot).contains(2L),
      "one atomic rollup commit per window")
    val got = Rollup.view(SnapshotStore.read(spark, rollRoot),
      Seq("grp"), Seq("qty", "score")).orderBy("grp")
    val want = Rollup.view(Rollup.profile(SnapshotStore.read(spark, srcRoot),
      Seq("grp"), Seq("qty", "score")), Seq("grp"), Seq("qty", "score"))
      .orderBy("grp")
    assert(got.collect().map(_.toSeq).toSeq ==
      want.collect().map(_.toSeq).toSeq)
    // Window 3: delete EVERY g2 row (group leaves) and every non-null
    // score in g0 (its sum must return to NULL, not 0).
    val doomed = SnapshotStore.read(spark, srcRoot)
      .filter($"grp" === "g2" || ($"grp" === "g0" && $"score".isNotNull))
      .select($"id")
    SnapshotStore.deleteCommit(spark, doomed, srcRoot, "id", "part")
    sync()
    val after = SnapshotStore.read(spark, rollRoot)
    assert(after.filter($"grp" === "g2").isEmpty,
      "an emptied group must leave the rollup")
    val g0 = after.filter($"grp" === "g0")
      .select($"qty_sum", $"score_sum", $"score_nn").collect().head
    assert(!g0.isNullAt(0) && g0.isNullAt(1) && g0.getLong(2) == 0L,
      s"g0 score sum must restore to NULL via the _nn witness: $g0")
    // And the whole table still equals direct aggregation.
    val got3 = Rollup.view(after, Seq("grp"), Seq("qty", "score"))
      .orderBy("grp").collect().map(_.toSeq).toSeq
    val want3 = Rollup.view(Rollup.profile(SnapshotStore.read(spark, srcRoot),
      Seq("grp"), Seq("qty", "score")), Seq("grp"), Seq("qty", "score"))
      .orderBy("grp").collect().map(_.toSeq).toSeq
    assert(got3 == want3)
  }

  test("min/max rollup: gain-only groups merge additively; losing groups rebuild; untouched carry") {
    val srcRoot = freshRoot("ru_src2"); val rollRoot = freshRoot("ru_roll2")
    SnapshotStore.commit(spark, rows(30), srcRoot, "part")
    def sync() = Rollup.sync(spark, srcRoot, rollRoot,
      Seq("id"), Seq("grp"), Seq("qty"), Seq("score"))
    sync()
    val before = SnapshotStore.read(spark, rollRoot)
      .select($"grp", $"score_min", $"score_max")
      .as[(String, Option[Double], Option[Double])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // g1 only GAINS a new global max (additive least/greatest path);
    // g0 LOSES its current max (id 27, score 27.0) so g0 must rebuild
    // to the next-largest.
    SnapshotStore.upsertDeleteCommit(spark, srcRoot,
      Seq((40L, "p0", "g1", 400, Some(99.0)))
        .toDF("id", "part", "grp", "qty", "score"),
      Some(Seq(Tuple1(27L)).toDF("id")), "id", "part")
    sync()
    val after = SnapshotStore.read(spark, rollRoot)
      .select($"grp", $"score_min", $"score_max")
      .as[(String, Option[Double], Option[Double])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(after("g1") == (before("g1")._1, Some(99.0)), after("g1").toString)
    assert(after("g0")._2 == Some(24.0),
      s"g0 lost its 27.0 max and must rebuild to 24.0: ${after("g0")}")
    assert(after("g2") == before("g2"), "untouched group must carry")
    // Whole-table equality against direct aggregation.
    assert(Rollup.view(SnapshotStore.read(spark, rollRoot),
      Seq("grp"), Seq("qty"), Seq("score"))
      .orderBy("grp").collect().map(_.toSeq).toSeq ==
      Rollup.view(Rollup.profile(SnapshotStore.read(spark, srcRoot),
        Seq("grp"), Seq("qty"), Seq("score")), Seq("grp"), Seq("qty"),
        Seq("score")).orderBy("grp").collect().map(_.toSeq).toSeq)
  }

  test("rollup refuses a null group value in the window loudly") {
    val srcRoot = freshRoot("ru_src3"); val rollRoot = freshRoot("ru_roll3")
    SnapshotStore.commit(spark,
      Seq((1L, "a", "u1")).toDF("id", "part2", "user"), srcRoot, "part2")
    Rollup.sync(spark, srcRoot, rollRoot, Seq("id"), Seq("user"), Seq("id"))
    SnapshotStore.appendCommit(spark,
      Seq((2L, "a", null: String)).toDF("id", "part2", "user"),
      srcRoot, "part2")
    val e = intercept[IllegalArgumentException] {
      Rollup.sync(spark, srcRoot, rollRoot, Seq("id"), Seq("user"), Seq("id"))
    }
    assert(e.getMessage.contains("null group"), e.getMessage)
  }
}
