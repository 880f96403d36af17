package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental clustering ([[SnapshotStore.clusterIncremental]]):
  * each pass z-orders ONLY the files added since the recorded
  * baseline, carries clustered files by reference, and every degraded
  * state (vacuumed baseline, future-dated baseline after RESTORE,
  * big delta) falls back to a FULL pass — never to skipped or wrong
  * maintenance. */
class ClusterIncrementalSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("clusterinc").toString}/t"

  private def batch(lo: Int, hi: Int, files: Int = 4): DataFrame =
    (lo until hi).map(i => (i.toLong, (i * 37 % 1000).toLong,
      s"v$i", (i % 2).toString)).toDF("x", "y", "v", "part")
      .repartition(files) // arrival-order files per partition

  private def paths(root: String, v: Long): Set[String] =
    SnapshotStore.manifest(spark, root, v).map(_.path).toSet

  test("first pass clusters everything and records the baseline; second pass touches ONLY the delta") {
    val root = freshRoot()
    SnapshotStore.commit(spark, batch(0, 4000), root, "part")
    val v1 = SnapshotStore.clusterIncremental(spark, root,
      "part", Seq("x", "y"))
    assert(v1 == 2L)
    assert(SnapshotStore.tablePropertiesMap(spark, root)
      .get(SnapshotStore.ClusteredAtProp).contains("2"))
    val clustered = paths(root, v1)
    // Small delta (one task → two partition files) lands; the next
    // pass must carry every clustered file BY REFERENCE and rewrite
    // only the new ones.
    SnapshotStore.appendCommit(spark, batch(4000, 4400, files = 1), root, "part")
    val delta = paths(root, 3L) -- clustered
    val v2 = SnapshotStore.clusterIncremental(spark, root,
      "part", Seq("x", "y"))
    assert(v2 == 4L)
    val after = paths(root, v2)
    assert(clustered.subsetOf(after),
      "an incremental pass must not rewrite already-clustered files")
    assert((delta -- after) == delta,
      "every delta file must be replaced by clustered output")
    // Content is layout-invariant.
    assert(SnapshotStore.table(spark, root).count() == 4400)
    assert(SnapshotStore.table(spark, root)
      .agg(sum(col("x"))).collect()(0).getLong(0) ==
      (0L until 4400L).sum)
  }

  test("nothing new since the baseline is a version no-op") {
    val root = freshRoot()
    SnapshotStore.commit(spark, batch(0, 1000), root, "part")
    val v1 = SnapshotStore.clusterIncremental(spark, root,
      "part", Seq("x"))
    assert(SnapshotStore.clusterIncremental(spark, root,
      "part", Seq("x")) == v1)
  }

  test("a delta of at least half the live files promotes to a FULL pass") {
    val root = freshRoot()
    SnapshotStore.commit(spark, batch(0, 1000), root, "part")
    val v1 = SnapshotStore.clusterIncremental(spark, root,
      "part", Seq("x"))
    val gen1 = paths(root, v1)
    SnapshotStore.appendCommit(spark, batch(1000, 9000, files = 24), root, "part")
    val v2 = SnapshotStore.clusterIncremental(spark, root,
      "part", Seq("x"))
    assert((paths(root, v2) intersect gen1).isEmpty,
      "a majority delta must reset the generations, not stack another")
    assert(SnapshotStore.table(spark, root).count() == 9000)
  }

  test("a future-dated baseline (RESTORE moved the tip behind it) degrades to a full pass") {
    val root = freshRoot()
    SnapshotStore.commit(spark, batch(0, 1000), root, "part")
    // BOTH baseline props set (keys matching the pass), so the test
    // exercises the version guard itself — without ClusterKeysProp the
    // key-mismatch filter would already reject the baseline and the
    // `_ <= cur` guard would be unpinned.
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.ClusteredAtProp -> "999",
        SnapshotStore.ClusterKeysProp -> "x"))
    val v = SnapshotStore.clusterIncremental(spark, root,
      "part", Seq("x"))
    assert(SnapshotStore.tablePropertiesMap(spark, root)
      .get(SnapshotStore.ClusteredAtProp).contains(v.toString))
    assert(SnapshotStore.table(spark, root).count() == 1000)
  }

  test("deletion vectors on delta files are materialized by the rewrite") {
    val root = freshRoot()
    SnapshotStore.commit(spark, batch(0, 1000), root, "part")
    SnapshotStore.clusterIncremental(spark, root, "part", Seq("x"))
    SnapshotStore.appendCommit(spark, batch(1000, 1400, files = 1), root, "part")
    SnapshotStore.deleteWhereDv(spark, root, "x >= 1200")
    val v = SnapshotStore.clusterIncremental(spark, root,
      "part", Seq("x"))
    assert(SnapshotStore.manifest(spark, root, v).forall(_.dv.isEmpty),
      "the layout rewrite must materialize the delta's deletion vectors")
    assert(SnapshotStore.table(spark, root).count() == 1200)
  }

  test("a baseline clustered on OTHER keys is not trusted — key change forces a full pass") {
    val root = freshRoot()
    SnapshotStore.commit(spark, batch(0, 1000), root, "part")
    val v1 = SnapshotStore.clusterIncremental(spark, root, "part", Seq("x"))
    val gen1 = paths(root, v1)
    // No new files — but the KEYS changed, so "clustered" must not
    // carry over: everything rewrites under the new keys.
    val v2 = SnapshotStore.clusterIncremental(spark, root, "part", Seq("y"))
    assert(v2 > v1)
    assert((paths(root, v2) intersect gen1).isEmpty,
      "a key change must re-cluster, not trust the old-key baseline")
    assert(SnapshotStore.tablePropertiesMap(spark, root)
      .get(SnapshotStore.ClusterKeysProp).contains("y"))
  }

  test("a FULL compactZOrder resets the baseline; a partition-scoped one does not") {
    val root = freshRoot()
    SnapshotStore.commit(spark, batch(0, 1000), root, "part")
    SnapshotStore.clusterIncremental(spark, root, "part", Seq("x"))
    val vz = SnapshotStore.compactZOrder(spark, root, "part", Seq("x"))
    assert(SnapshotStore.tablePropertiesMap(spark, root)
      .get(SnapshotStore.ClusteredAtProp).contains(vz.toString),
      "a full-scope z-order IS a clustering baseline")
    // Nothing new since the full pass → incremental is a version no-op
    // (without the reset it would re-cluster every file vz just wrote).
    assert(SnapshotStore.clusterIncremental(spark, root, "part", Seq("x")) == vz)
    // Partition-scoped: baseline untouched.
    SnapshotStore.appendCommit(spark, batch(1000, 1100, files = 1), root, "part")
    val scoped = SnapshotStore.compactZOrder(spark, root, "part", Seq("x"),
      partitions = Some(Seq("0")))
    assert(SnapshotStore.tablePropertiesMap(spark, root)
      .get(SnapshotStore.ClusteredAtProp).contains(vz.toString),
      "a partition-scoped pass is not a full baseline")
    assert(scoped > vz)
  }

  test("SQL surface: OPTIMIZE … ZORDER BY (…) INCREMENTAL; WHERE cannot compose") {
    val root = freshRoot()
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sinks.GraftCatalog].getName)
    SnapshotStore.commit(spark, batch(0, 1000), root, "part")
    val out = spark.sql(s"OPTIMIZE graft.`$root` ZORDER BY (x, y) INCREMENTAL")
      .collect()
    assert(out.length == 1 && out(0).getLong(1) == 2L)
    assert(SnapshotStore.tablePropertiesMap(spark, root)
      .get(SnapshotStore.ClusteredAtProp).contains("2"))
    // Nothing new → version no-op through the same statement (same
    // keys — different keys would rightly force a full pass).
    assert(spark.sql(s"OPTIMIZE graft.`$root` ZORDER BY (x, y) INCREMENTAL")
      .collect()(0).getLong(1) == 2L)
    val e = intercept[IllegalArgumentException](spark.sql(
      s"OPTIMIZE graft.`$root` WHERE part = '0' ZORDER BY (x) INCREMENTAL"))
    assert(e.getMessage.contains("INCREMENTAL"))
    // Classic OPTIMIZE shapes are untouched by the new keyword.
    assert(spark.sql(s"OPTIMIZE graft.`$root` ZORDER BY (x)")
      .collect()(0).getLong(1) >= 2L)
  }

  test("bucket-engaged tables keep the hash layout: the incremental pass z-sorts WITHIN buckets") {
    val root = freshRoot()
    SnapshotStore.commit(spark, batch(0, 2000), root, "part")
    SnapshotStore.bucketTable(spark, root, Seq("x"), 4)
    SnapshotStore.clusterIncremental(spark, root, "part", Seq("y"))
    SnapshotStore.appendCommit(spark, batch(2000, 2400, files = 1), root, "part")
    val v = SnapshotStore.clusterIncremental(spark, root, "part", Seq("y"))
    val cur = SnapshotStore.manifest(spark, root, v)
    assert(cur.nonEmpty && cur.forall(e =>
      SnapshotStore.bucketIdOf(
        new org.apache.hadoop.fs.Path(e.path).getName).isDefined),
      "every file must stay bucket-stamped through incremental clustering")
    assert(SnapshotStore.table(spark, root).count() == 2400)
    assert(SnapshotStore.tablePropertiesMap(spark, root)
      .get(SnapshotStore.ClusteredAtProp).contains(v.toString))
  }

  test("skipping stays sharp: a point range opens generation-count files, not the table") {
    val root = freshRoot()
    SnapshotStore.commit(spark, batch(0, 4000), root, "part")
    SnapshotStore.clusterIncremental(spark, root, "part", Seq("x"))
    SnapshotStore.appendCommit(spark, batch(4000, 4800, files = 1), root, "part")
    SnapshotStore.clusterIncremental(spark, root, "part", Seq("x"))
    val (df, idx) = SnapshotStore.tableWithIndex(spark, root)
    val n = df.filter(col("x") >= 100 && col("x") <= 120).count()
    assert(n == 21)
    assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
      s"two clustered generations must still skip: " +
        s"${idx.lastCandidateFiles}/${idx.totalFiles}")
  }
}
