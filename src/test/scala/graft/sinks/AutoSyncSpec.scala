package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Rollup

/** Self-maintaining rollups (`Rollup.enableAutoSync` → the
  * `graft.rollup.autoSync` source property → the post-commit hook):
  * once registered, every data commit to the source re-syncs the
  * rollup inline, so the transparent MV rewrite is ALWAYS eligible
  * between commits with zero outside orchestration. */
class AutoSyncSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("autosync").toString

  private def rowsDf(r: Range): DataFrame =
    r.map(i => (i.toLong, s"g${i % 4}", (i % 100).toLong, (i % 3).toString))
      .toDF("id", "g", "qty", "part")

  test("registered rollups stay cursor-fresh through appends, merges, and deletes") {
    val dir = freshDir()
    val src = s"$dir/src"; val roll = s"$dir/roll"
    SnapshotStore.commit(spark, rowsDf(0 until 300), src, "part")
    Rollup.sync(spark, src, roll, Seq("id"), Seq("g"), sumCols = Seq("qty"))
    Rollup.enableAutoSync(spark, src, roll)
    def cursor(): Long = SnapshotStore.tablePropertiesMap(spark, roll)(
      Rollup.CursorProp).toLong
    def srcV(): Long = SnapshotStore.currentVersion(spark, src).get
    assert(cursor() == srcV())
    // Plain append — NO manual sync anywhere below.
    SnapshotStore.appendCommit(spark, rowsDf(300 until 360), src, "part")
    assert(cursor() == srcV(), "append must auto-sync")
    // Keyed merge.
    SnapshotStore.mergeCommitOrdered(spark,
      Seq((10L, "g0", 999L, "1")).toDF("id", "g", "qty", "part"),
      src, ColSpec(Seq("id")), Nil, ColSpec(Seq("part")))
    assert(cursor() == srcV(), "merge must auto-sync")
    // Keyed delete.
    SnapshotStore.deleteCommit(spark,
      (0 until 20).map(_.toLong).toDF("id"), src, "id", "part")
    assert(cursor() == srcV(), "delete must auto-sync")
    // LAYOUT commits (OPTIMIZE/compact, z-order) bump the source
    // version without changing content — the hook must still advance
    // the cursor, or the MV rewrite silently stops firing until the
    // next data commit.
    SnapshotStore.compact(spark, src, ColSpec(Seq("part")))
    assert(cursor() == srcV(), "compaction must auto-sync the cursor")
    // Metadata-only commits bump the version too (SET TBLPROPERTIES,
    // constraints) — the cursor must follow or the rewrite goes dark.
    SnapshotStore.setProperties(spark, src, Seq("some.key" -> "v"))
    assert(cursor() == srcV(), "a property commit must auto-sync the cursor")
    SnapshotStore.addConstraint(spark, src, "qty_nonneg", "qty >= 0")
    assert(cursor() == srcV(), "a constraint commit must auto-sync the cursor")
    // The maintained state equals a direct aggregation AND feeds the
    // MV rewrite without any explicit sync call.
    spark.conf.set(RollupRewrite.RegistryConf, roll)
    try {
      val q = SnapshotStore.table(spark, src).groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("s"))
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains(roll) && !plan.contains(src),
        s"auto-synced rollup must answer the dashboard query:\n$plan")
      val direct = SnapshotStore.read(spark, src).groupBy("g")
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("s"))
        .collect().map(_.toString).toSet
      assert(q.collect().map(_.toString).toSet == direct)
    } finally spark.conf.unset(RollupRewrite.RegistryConf)
  }

  test("derive-hook rollups refuse registration; a broken registration degrades, never fails commits") {
    val dir = freshDir()
    val src = s"$dir/src"; val roll = s"$dir/roll"
    SnapshotStore.commit(spark, rowsDf(0 until 50), src, "part")
    Rollup.sync(spark, src, roll, Seq("id"), Seq("g"),
      sumCols = Seq("qty"), derive = df => df)
    val e = intercept[IllegalArgumentException] {
      Rollup.enableAutoSync(spark, src, roll)
    }
    assert(e.getMessage.contains("derive"))
    // A bogus registration (dangling rollup root) must not fail the
    // data commit — the hook degrades to a no-op.
    SnapshotStore.setProperties(spark, src,
      Seq("graft.rollup.autoSync" -> s"$dir/nonexistent"))
    SnapshotStore.appendCommit(spark, rowsDf(50 until 60), src, "part")
    assert(SnapshotStore.read(spark, src).count() == 60)
    // Self-registration is a guarded no-op, not an infinite loop.
    SnapshotStore.setProperties(spark, src,
      Seq("graft.rollup.autoSync" -> src))
    SnapshotStore.appendCommit(spark, rowsDf(60 until 70), src, "part")
    assert(SnapshotStore.read(spark, src).count() == 70)
  }
}
