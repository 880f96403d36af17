package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotStore

/** Join-time file skipping ([[DynamicPruning]]): a dim slice's keys
  * prune fact FILES before the join plans, results are identical to
  * the plain join by construction, and every bound degrades to the
  * unpruned join — never to wrong rows. */
class DynamicPruningSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("dfp").toString}/fact"

  /** Range-partitioned fact: 10 partitions of 1000 keys each, so each
    * file carries a tight [min,max] on k — the layout-correlated shape
    * dynamic pruning exists for. */
  private def seedRanged(root: String): Unit = {
    val df = (0 until 10000).map(i => (i.toLong, i % 97, (i / 1000).toString))
      .toDF("k", "v", "part")
    SnapshotStore.commit(spark, df, root, "part")
  }

  private def dimSlice(lo: Long, hi: Long): DataFrame =
    (lo until hi).map(i => (i, s"d$i")).toDF("dk", "dv")

  test("inner join: identical values, strictly fewer candidate files") {
    val root = freshRoot()
    seedRanged(root)
    val dim = dimSlice(8000, 8500)
    val (pruned, idx, engaged) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dim, "dk")
    val got = pruned.select(col("k"), col("v"), col("dv"))
      .orderBy("k").collect().toSeq
    assert(engaged)
    assert(got.size == 500)
    assert(idx.lastCandidateFiles < idx.totalFiles,
      s"expected file skipping: ${idx.lastCandidateFiles}/${idx.totalFiles}")
    val plain = SnapshotStore.table(spark, root)
      .join(dim, col("k") === col("dk"))
      .select(col("k"), col("v"), col("dv")).orderBy("k").collect().toSeq
    assert(got == plain)
  }

  test("left_semi join: same rows as the unpruned semi-join") {
    val root = freshRoot()
    seedRanged(root)
    val dim = dimSlice(2000, 2100)
    val (pruned, idx, _) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dim, "dk", joinType = "left_semi")
    val got = pruned.orderBy("k").collect().toSeq
    assert(got.size == 100 && idx.lastCandidateFiles < idx.totalFiles)
    val plain = SnapshotStore.table(spark, root)
      .join(dim, col("k") === col("dk"), "left_semi")
      .orderBy("k").collect().toSeq
    assert(got == plain)
  }

  test("over-limit key sets fall back to the plain join — values intact, no probe explosion") {
    val root = freshRoot()
    seedRanged(root)
    val dim = dimSlice(0, 5000)
    val (pruned, idx, engaged) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dim, "dk", maxKeys = 100)
    assert(!engaged)
    assert(pruned.count() == 5000)
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "fallback must not sneak a partial filter in")
  }

  test("null dim keys are dropped from the probe, not poisoning the pushdown") {
    val root = freshRoot()
    seedRanged(root)
    val dim = (Seq[(java.lang.Long, String)]((9000L, "a"), (null, "b"), (9001L, "c")))
      .toDF("dk", "dv")
    val (pruned, idx, engaged) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dim, "dk")
    assert(engaged)
    assert(pruned.select("k").as[Long].collect().sorted.toSeq == Seq(9000L, 9001L))
    assert(idx.lastCandidateFiles < idx.totalFiles,
      "a null key must not defeat the In-list translation")
  }

  test("outer joins refuse loudly — filtering the fact first would drop their rows") {
    val e = intercept[IllegalArgumentException](
      DynamicPruning.joinPruned(spark, "/nowhere", "k",
        dimSlice(0, 1), "dk", joinType = "left_outer"))
    assert(e.getMessage.contains("inner/left_semi"))
  }

  test("empty dim slice: empty join, no scan work") {
    val root = freshRoot()
    seedRanged(root)
    val (pruned, _, engaged) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dimSlice(0, 0), "dk")
    assert(engaged && pruned.count() == 0)
  }

  test("bloom sidecars prune scattered keys min/max ranges cannot") {
    val root = freshRoot()
    // SCATTERED layout: every file spans the full key range, so
    // min/max skipping is powerless; blooms still answer per-key.
    val df = (0 until 8000).map(i => (i.toLong * 7 % 9973, i, (i % 8).toString))
      .toDF("k", "v", "part")
    SnapshotStore.commit(spark, df, root, "part")
    SnapshotStore.addBloomFilters(spark, root, Seq("k"))
    // Keys guaranteed ABSENT (k < 9973 by construction).
    val absent = (Seq((20000L, "x"), (20001L, "y"))).toDF("dk", "dv")
    val (pruned, idx, _) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", absent, "dk")
    assert(pruned.count() == 0)
    assert(idx.lastCandidateFiles == 0,
      s"blooms must rule out absent keys: ${idx.lastCandidateFiles} files kept")
  }
}
