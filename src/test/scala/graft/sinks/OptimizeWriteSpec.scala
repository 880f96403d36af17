package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Optimized writes (`graft.optimizeWrite`): content commits
  * rebalance the batch by the partition columns so fragmented
  * upstream task layouts land as ~one file per partition value —
  * preventing the small files auto-compact fixes after the fact.
  * Layout rewrites and bucketed tables are untouched (they own their
  * distribution), and content is write-path-invariant. */
class OptimizeWriteSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("optwrite").toString}/t"

  /** Deliberately fragmented batch: 6 upstream tasks × 2 partition
    * values = 12 files without optimized writes. */
  private def fragmented(lo: Int, hi: Int): DataFrame =
    (lo until hi).map(i => (i.toLong, s"v$i", (i % 2).toString))
      .toDF("k", "v", "part").repartition(6)

  private def filesPerPartition(root: String): Map[String, Int] =
    SnapshotStore.manifest(spark, root,
        SnapshotStore.currentVersion(spark, root).get)
      .groupBy(_.partition).view.mapValues(_.size).toMap

  test("appends collapse to ~one file per partition; content identical") {
    val root = freshRoot()
    SnapshotStore.commit(spark, fragmented(0, 100), root, "part")
    // Baseline: the fragmented layout really lands fragmented.
    SnapshotStore.appendCommit(spark, fragmented(100, 200), root, "part")
    assert(filesPerPartition(root).values.max >= 6,
      "fixture must actually fragment, or the probe proves nothing")
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.OptimizeWriteProp -> "true"))
    val before = filesPerPartition(root)
    SnapshotStore.appendCommit(spark, fragmented(200, 300), root, "part")
    val perPart = filesPerPartition(root)
    // Prior files are carried by reference; the NEW batch added at
    // most 2 files per partition (AQE may keep a split), not 6.
    assert(perPart.forall { case (p, n) => n - before(p) <= 2 },
      s"optimized write still fragmented: $before -> $perPart")
    assert(SnapshotStore.table(spark, root).count() == 300)
    assert(SnapshotStore.table(spark, root).agg(sum(col("k")))
      .collect()(0).getLong(0) == (0L until 300L).sum)
  }

  test("a fresh-table commit under the property set at v1 cannot consult it; the NEXT commit does") {
    val root = freshRoot()
    SnapshotStore.commit(spark, fragmented(0, 100), root, "part")
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.OptimizeWriteProp -> "true"))
    val before = filesPerPartition(root).values.sum
    SnapshotStore.appendCommit(spark, fragmented(100, 400), root, "part")
    val added = filesPerPartition(root).values.sum - before
    assert(added <= 4, s"rebalanced append added $added files, expected ≤4")
  }

  test("bucketed tables ignore the property — the bucket layout owns the shuffle") {
    val root = freshRoot()
    SnapshotStore.commit(spark, fragmented(0, 200), root, "part")
    SnapshotStore.bucketTable(spark, root, Seq("k"), 4)
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.OptimizeWriteProp -> "true"))
    SnapshotStore.appendCommit(spark, fragmented(200, 400), root, "part")
    val cur = SnapshotStore.currentVersion(spark, root).get
    val newFiles = SnapshotStore.manifest(spark, root, cur)
      .filter(_.path.contains(s"v_$cur"))
    assert(newFiles.nonEmpty && newFiles.forall(e =>
      SnapshotStore.bucketIdOf(
        new org.apache.hadoop.fs.Path(e.path).getName).isDefined),
      "the bucket layout must keep stamping under optimizeWrite")
  }

  test("layout rewrites are untouched: compact under the property still converges") {
    val root = freshRoot()
    SnapshotStore.commit(spark, fragmented(0, 100), root, "part")
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.OptimizeWriteProp -> "true"))
    SnapshotStore.appendCommit(spark, fragmented(100, 200), root, "part")
    SnapshotStore.compact(spark, root, "part")
    assert(filesPerPartition(root).values.max == 1,
      "compact must still produce one file per partition")
    assert(SnapshotStore.table(spark, root).count() == 200)
  }
}
