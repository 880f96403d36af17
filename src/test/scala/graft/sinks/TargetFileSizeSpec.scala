package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Advisory byte-based file sizing (`graft.targetFileSize`, E130):
  * writes split at ~target bytes via the predecessor sidecar's
  * measured bytes-per-row, compact's conformance test becomes
  * byte-aware (merging the fragmented AND splitting the oversized),
  * clusterIncremental sizes its output by bytes, and engaged bucket
  * layouts are exempt (one file per bucket is the sorted-bucket read
  * contract). Delta sizes files by bytes; this store's thresholds
  * were previously count-only. */
class TargetFileSizeSpec extends graft.SparkSpec {

  private def freshRoot(): String =
    s"${Files.createTempDirectory("targetsize").toString}/t"

  /** ~Incompressible payload (hex of md5) so parquet bytes track row
    * counts predictably. */
  private def rows(r: Range): DataFrame = {
    import spark.implicits._
    r.map(i => (i.toLong, "x")).toDF("id", "part")
      .withColumn("payload", md5(col("id").cast("string")))
      .withColumn("payload2", md5(concat(col("id").cast("string"), lit("s"))))
  }

  private def fileLens(root: String): Seq[Long] = {
    val v = SnapshotStore.currentVersion(spark, root).get
    val stats = SnapshotStore.statsFor(spark, root, v)
    SnapshotStore.manifest(spark, root, v).map(e => stats(e.path).len)
  }

  test("OPTIMIZE splits an oversized file into ~⌈bytes/target⌉ files, then converges") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 4000).coalesce(1), root, "part")
    val bytes = fileLens(root).sum
    assert(fileLens(root).size == 1, "fixture must start as ONE file")
    val target = math.max(1L, bytes / 4)
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.TargetFileSizeProp -> target.toString))
    val v = SnapshotStore.compact(spark, root, ColSpec(Seq("part")))
    val lens = fileLens(root)
    assert(lens.size >= 3 && lens.size <= 6,
      s"a 4×target file must split into ~4, got ${lens.size}: $lens")
    assert(lens.forall(_ <= 2 * target),
      s"no split file may exceed 2× target: $lens vs $target")
    // Convergence: an immediately repeated OPTIMIZE is a version no-op
    // (the +1 tolerance absorbs the bytes-per-row rounding).
    assert(SnapshotStore.compact(spark, root, ColSpec(Seq("part"))) == v,
      "a conformant layout must not re-rewrite")
    assert(SnapshotStore.table(spark, root).count() == 4000)
  }

  test("a file just past 2× target is tolerated — no non-converging re-rewrite loop") {
    // The writer sizes files from a rows-per-byte ESTIMATE, so a
    // rewrite can land a file slightly over 2× target (re-clustering
    // shifts the compression ratio). The conformance gate carries a
    // 25% margin past the 2× split point: a 2.2×-target file is left
    // alone instead of being re-rewritten on every OPTIMIZE forever.
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 4000).coalesce(1), root, "part")
    val bytes = fileLens(root).sum
    val target = math.max(1L, (bytes / 2.2).toLong)
    assert(bytes > 2 * target && bytes <= 2 * target + target / 2,
      s"fixture must land in the tolerance band: $bytes vs target $target")
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.TargetFileSizeProp -> target.toString))
    val v = SnapshotStore.currentVersion(spark, root).get
    assert(SnapshotStore.compact(spark, root, ColSpec(Seq("part"))) == v,
      "a file inside the (2t, 2.5t] tolerance band must not re-rewrite")
    // Past the band the split DOES fire.
    val tight = math.max(1L, (bytes / 2.8).toLong)
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.TargetFileSizeProp -> tight.toString))
    val v2 = SnapshotStore.currentVersion(spark, root).get
    assert(SnapshotStore.compact(spark, root, ColSpec(Seq("part"))) > v2,
      "a file past 2.5× target must still split")
  }

  test("fragmented appends converge to ~target-sized files through auto-compact") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 4000).coalesce(1), root, "part")
    val bytes = fileLens(root).sum
    val target = math.max(1L, bytes / 4)
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.TargetFileSizeProp -> target.toString,
        "graft.autoCompact.minFiles" -> "2"))
    SnapshotStore.appendCommit(spark,
      rows(4000 until 8000).repartition(8), root, "part")
    val lens = fileLens(root)
    val want = (2 * bytes + target - 1) / target // ≈ 8
    assert(lens.size <= want + 1 && lens.size >= 3,
      s"fragmented append must converge to ~$want files, got ${lens.size}")
    assert(lens.forall(_ <= 2 * target),
      s"converged files must stay ≤ 2× target: $lens vs $target")
    assert(SnapshotStore.table(spark, root).count() == 8000)
  }

  test("incremental clustering sizes its generation by bytes when the target is set") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 4000).coalesce(1), root, "part")
    val bytes = fileLens(root).sum
    val target = math.max(1L, bytes / 4)
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.TargetFileSizeProp -> target.toString))
    SnapshotStore.clusterIncremental(spark, root, ColSpec(Seq("part")),
      Seq("id"))
    val lens = fileLens(root)
    assert(lens.size >= 3 && lens.size <= 6,
      s"cluster pass must emit ~⌈bytes/target⌉ files, got ${lens.size}")
    assert(SnapshotStore.table(spark, root).count() == 4000)
  }

  test("engaged bucket layouts are exempt — one file per bucket survives a tiny target") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 2000).coalesce(1), root, "part")
    SnapshotStore.bucketTable(spark, root, Seq("id"), 4)
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.TargetFileSizeProp -> "1")) // absurdly small
    SnapshotStore.appendCommit(spark, rows(2000 until 2400), root, "part")
    val v = SnapshotStore.currentVersion(spark, root).get
    val perPartition = SnapshotStore.manifest(spark, root, v)
      .groupBy(_.partition).map(_._2.size)
    // Appends under a bucket spec land one file per bucket per commit;
    // a byte target must not shatter them (the sorted-bucket reader
    // needs one file per bucket to declare ordering).
    assert(perPartition.forall(_ <= 8),
      s"bucketed writes must ignore the byte target: $perPartition")
    assert(SnapshotStore.compact(spark, root, ColSpec(Seq("part")),
      maxFilesPerPartition = 4) ==
      SnapshotStore.compact(spark, root, ColSpec(Seq("part")),
        maxFilesPerPartition = 4),
      "compact on a bucketed table must converge, target notwithstanding")
    assert(SnapshotStore.table(spark, root).count() == 2400)
  }

  test("a malformed target fails the write loudly — silent fragmentation is the failure mode the ledger exists for") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 100).coalesce(1), root, "part")
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.TargetFileSizeProp -> "lots"))
    val e = intercept[IllegalArgumentException](
      SnapshotStore.appendCommit(spark, rows(100 until 200), root, "part"))
    assert(e.getMessage.contains("graft.targetFileSize"))
    // An absurdly large value is refused too: unbounded, `2 * t`
    // would wrap negative and flip every partition non-conformant —
    // each OPTIMIZE a non-converging full rewrite.
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.TargetFileSizeProp -> Long.MaxValue.toString))
    val e2 = intercept[IllegalArgumentException](
      SnapshotStore.appendCommit(spark, rows(100 until 200), root, "part"))
    assert(e2.getMessage.contains("2^50"))
  }
}
