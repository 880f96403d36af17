package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Key-probe file skipping in the keyed commit paths: a SMALL delete
  * key set prunes the partition-probe scan to stats/bloom candidate
  * files (Delta's MERGE file pruning; the reference's
  * `delete_many($in)` is an indexed point op, mongodb_loader.py:
  * 226-245), instead of reading every file's key column per OCC
  * attempt. Conservative by construction — mayMatch=false proves
  * absence — so every fallback (big set, weird types, no sidecars)
  * scans everything, and results never change. */
class KeyProbeSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("keyprobe")}/t"

  /** 64 rows laid out in key RANGES: 4 partitions x 4 files, each
    * file holding a contiguous c_id span, so min/max stats can prune
    * point probes precisely. */
  private def rangeTable(root: String): Unit = {
    val df = (0 until 64).map(i => (i, s"p${i / 16}", s"n$i"))
      .toDF("c_id", "part", "name")
      .repartitionByRange(16, col("c_id"))
      .sortWithinPartitions(col("c_id"))
    SnapshotStore.commit(spark, df, root, "part")
  }

  test("a 3-key delete probes only the min/max candidate files and deletes exactly those rows") {
    val root = freshRoot()
    rangeTable(root)
    val total = SnapshotStore.manifest(spark, root, 1L).size
    assert(total >= 8, s"fixture must be multi-file, got $total")
    SnapshotStore.deleteCommit(spark,
      Seq(1, 2, 62).toDF("c_id"), root, "c_id", "part")
    val probed = SnapshotStore.lastProbeCandidates.get()
    assert(probed >= 1 && probed <= 2,
      s"3 keys in 2 contiguous spans must probe <=2 of $total files, probed $probed")
    val got = SnapshotStore.read(spark, root).select("c_id").as[Int]
      .collect().toSet
    assert(got == (0 until 64).toSet -- Set(1, 2, 62))
  }

  test("bloom sidecars prune hash-ordered files that min/max cannot") {
    val root = freshRoot()
    // Hash order: every file's name range spans the domain.
    SnapshotStore.commit(spark,
      (0 until 200).map(i => (s"name_$i", s"p${i % 4}", i))
        .toDF("c_name", "part", "qty").repartition(8),
      root, "part")
    SnapshotStore.addBloomFilters(spark, root, Seq("c_name"))
    val total = SnapshotStore.manifest(spark, root, 1L).size
    SnapshotStore.deleteCommit(spark,
      Seq("name_42").toDF("c_name"), root, "c_name", "part")
    val probed = SnapshotStore.lastProbeCandidates.get()
    assert(probed >= 0 && probed < total,
      s"bloom must prune the probe below $total files, probed $probed")
    assert(SnapshotStore.read(spark, root)
      .filter(col("c_name") === "name_42").count() == 0)
    assert(SnapshotStore.read(spark, root).count() == 199)
  }

  test("a key set above the limit falls back to the full probe, same results") {
    val root = freshRoot()
    rangeTable(root)
    spark.conf.set("spark.graft.probeKeyLimit", "2")
    try {
      SnapshotStore.deleteCommit(spark,
        Seq(1, 2, 62).toDF("c_id"), root, "c_id", "part")
      assert(SnapshotStore.lastProbeCandidates.get() == -1,
        "above-limit sets must not engage pruning")
      assert(SnapshotStore.read(spark, root).select("c_id").as[Int]
        .collect().toSet == (0 until 64).toSet -- Set(1, 2, 62))
    } finally spark.conf.unset("spark.graft.probeKeyLimit")
  }

  test("an all-null key set probes zero files and is a version no-op") {
    val root = freshRoot()
    rangeTable(root)
    val v = SnapshotStore.deleteCommit(spark,
      Seq[Option[Int]](None, None).toDF("c_id"), root, "c_id", "part")
    assert(v == 1L, "null keys match nothing; no commit")
    assert(SnapshotStore.lastProbeCandidates.get() == 0)
  }

  test("composite keys prune on the first column; upsertDeleteCommit path too") {
    val root = freshRoot()
    rangeTable(root)
    // Atomic upsert+delete: delete (5, p0) and (60, p3) by composite
    // key while upserting one row — the delete probe prunes on c_id.
    SnapshotStore.upsertDeleteCommit(spark, root,
      Seq((7, "p0", "updated")).toDF("c_id", "part", "name"),
      Some(Seq((5, "p0"), (60, "p3")).toDF("c_id", "part")),
      Seq("c_id", "part"), "part")
    val probed = SnapshotStore.lastProbeCandidates.get()
    val total = SnapshotStore.manifest(spark, root, 1L).size
    assert(probed >= 1 && probed < total, s"probed $probed of $total")
    val got = SnapshotStore.read(spark, root)
      .select("c_id", "name").as[(Int, String)].collect().toMap
    assert(!got.contains(5) && !got.contains(60))
    assert(got(7) == "updated")
    assert(got.size == 62)
  }
}
