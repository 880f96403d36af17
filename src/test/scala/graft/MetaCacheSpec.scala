package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import graft.sinks.SnapshotStore

/** The (root, version)-keyed read-path metadata cache (round-17
  * optimization): parsed manifests / header blocks / stats sidecars /
  * bloom sidecars are immutable once published, so one parse per
  * (root, version) serves every later planning pass — and every hit
  * re-validates against the file's (modTime, length) fingerprint, with
  * explicit invalidation at the engine's own mutation points. These
  * specs pin the invalidation contract the cache must honor: a cached
  * parse may NEVER outlive the file it describes. */
class MetaCacheSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("metacache").toString

  private def table(rows: (String, String, Int)*) =
    rows.toDF("product_id", "supplier", "version")

  test("a warmed planning pass reads the stats sidecar zero raw times") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    // First pass: exactly one raw parse (the existing exactly-once pin).
    val before = SnapshotStore.sidecarReads.get()
    SnapshotStore.tableWithIndex(spark, root)._1
      .filter($"version" >= 1).count()
    assert(SnapshotStore.sidecarReads.get() - before == 1)
    // Second pass, same (root, version): the cache serves the parse —
    // zero raw sidecar reads. This is the read-side analogue of the
    // one-open-per-commit discipline on the write side.
    val mid = SnapshotStore.sidecarReads.get()
    SnapshotStore.tableWithIndex(spark, root)._1
      .filter($"version" >= 1).count()
    assert(SnapshotStore.sidecarReads.get() - mid == 0,
      s"warm planning pass re-read the sidecar ${SnapshotStore.sidecarReads.get() - mid} times")
  }

  test("drop + recreate at the same path is never served the old table's parse") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("old1", "a", 1), ("old2", "a", 1), ("old3", "b", 1)), root, "supplier")
    // Warm every cache layer for (root, 1).
    assert(SnapshotStore.read(spark, root).count() == 3)
    assert(SnapshotStore.tableProperties(spark, root, 1L).isEmpty ||
      SnapshotStore.tableProperties(spark, root, 1L).nonEmpty) // header parse cached
    // Out-of-band DROP: delete the whole table directory, then
    // recreate a DIFFERENT table at the same path (same version
    // number 1 — the adversarial key collision).
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    SnapshotStore.invalidateMetadataCache(root) // the sanctioned drop hook
    SnapshotStore.commit(spark, table(("new1", "c", 7)), root, "supplier")
    val got = SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet
    assert(got == Set("new1"),
      s"recreated table served stale cached manifest: $got")
    assert(SnapshotStore.manifest(spark, root, 1L).map(_.partition).toSet == Set("c"))
  }

  test("recreate WITHOUT the hook is caught by the file fingerprint") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("old1", "a", 1), ("old2", "b", 1)), root, "supplier")
    assert(SnapshotStore.read(spark, root).count() == 2) // warm cache
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new Path(root), true)
    // No invalidate call: the recreated v1 manifest differs in length
    // (one entry vs two), so the (modTime, length) fingerprint alone
    // must reject the cached parse.
    SnapshotStore.commit(spark, table(("new1", "c", 7)), root, "supplier")
    val got = SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet
    assert(got == Set("new1"), s"fingerprint failed to catch recreate: $got")
  }

  test("vacuumed versions read like uncached ones: missing manifest throws") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 2)), root,
      "product_id", "version", "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 3)), root,
      "product_id", "version", "supplier")
    // Warm the cache for v1 specifically.
    assert(SnapshotStore.readVersion(spark, root, 1L).count() == 1)
    SnapshotStore.vacuum(spark, root, keep = 1, retainMillis = 0L)
    // v1's manifest is gone; a cached parse must not resurrect it.
    intercept[java.io.FileNotFoundException] {
      SnapshotStore.manifest(spark, root, 1L)
    }
    // The kept tip still reads.
    assert(SnapshotStore.read(spark, root)
      .select("version").as[Int].collect().toSeq == Seq(3))
  }

  test("in-place bloom sidecar rebuild is visible through a warm cache") {
    val root = freshRoot()
    val v = SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 2)), root, "supplier")
    // Warm the bloom layer with the empty pre-build state (absence is
    // not cached, but build once and re-build to exercise the
    // in-place delete+rename path under a warm positive entry).
    SnapshotStore.addBloomFilters(spark, root, Seq("product_id"), version = Some(v))
    val first = SnapshotStore.bloomFor(spark, root, v)
    assert(first.nonEmpty && first.values.forall(_.contains("product_id")))
    SnapshotStore.addBloomFilters(spark, root, Seq("version"), version = Some(v))
    val second = SnapshotStore.bloomFor(spark, root, v)
    assert(second.values.exists(_.contains("version")),
      "re-built bloom sidecar not visible through the cache")
  }

  test("RESTORE through a warm cache reads the restored content at the new tip") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 2)), root,
      "product_id", "version", "supplier")
    assert(SnapshotStore.read(spark, root)
      .select("version").as[Int].collect().toSeq == Seq(2)) // warm v2
    val rv = SnapshotStore.restore(spark, root, 1L)
    assert(rv == 3L)
    assert(SnapshotStore.read(spark, root)
      .select("version").as[Int].collect().toSeq == Seq(1),
      "restore not visible through warm cache")
  }
}
