package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-maintaining Bloom sidecars
  * ([[SnapshotMaintenance.maybeAutoBloom]]): with
  * `graft.autoBloom.cols` set, every commit's maintenance pass keeps
  * per-file Bloom filters current — flat and struct-leaf columns,
  * layout rewrites included — with zero manual
  * [[SnapshotStore.addBloomFilters]] calls. Failures degrade to "no
  * bloom skipping this round" on the error ledger, never a failed
  * commit. Blooms were the last index family without a rider (text
  * index, IVF, stats, clustering, compaction, rollups all
  * self-maintain); this closes the family. */
class AutoBloomSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("autobloom").toString}/t"

  /** SCATTERED layout (arrival order): every file spans nearly the
    * whole sid domain, so min/max cannot prune an in-range point
    * lookup — only a Bloom certifies absence. All sids EVEN, so any
    * odd in-range probe is provably absent. */
  private def rows(r: Range): DataFrame =
    r.map(i => (i.toLong, ((i.toLong * 13) % 4986) * 2, (i % 4).toString))
      .toDF("k", "sid", "part")
      .select(col("k"), col("sid"),
        struct(col("sid").as("id")).as("supplier"), col("part"))

  private def probeAbsent(root: String, column: String): Int = {
    val (df, idx) = SnapshotStore.tableWithIndex(spark, root)
    assert(df.filter(col(column) === 4987L).count() == 0)
    idx.lastCandidateFiles
  }

  test("appends keep FLAT and NESTED blooms current with zero manual calls; a property commit in between does not break the carry") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 2000), root, "part")
    // Register AFTER v1 (the property commit's own pass blooms the
    // backlog), sized for a zero-candidate pin (32/6 — the default
    // 10/3 has ~1.7% FP per file, enough for one deterministic FP).
    SnapshotStore.setProperties(spark, root, Seq(
      SnapshotStore.AutoBloomProp -> "sid,supplier.id",
      SnapshotStore.AutoBloomBitsProp -> "32"))
    assert(probeAbsent(root, "sid") == 0,
      "the registration pass must bloom the existing files")
    SnapshotStore.appendCommit(spark, rows(2000 until 3000), root, "part")
    assert(probeAbsent(root, "sid") == 0,
      "an append's new files must bloom on the rider, no manual call")
    assert(probeAbsent(root, "supplier.id") == 0,
      "nested struct-leaf blooms must ride the same pass")
    // A metadata-only commit moves the tip; the rider re-publishes at
    // the new tip (and the carry-forward walk keeps the cost ∝ 0 new
    // files — never a rebuild).
    SnapshotStore.setProperties(spark, root, Seq("graft.unrelated" -> "x"))
    assert(probeAbsent(root, "sid") == 0,
      "blooms must survive a property-only commit at the tip")
    // Present key still found — false negatives are impossible.
    val present = ((123L * 13) % 4986) * 2
    val (df, idx) = SnapshotStore.tableWithIndex(spark, root)
    assert(df.filter(col("sid") === present).count() >= 1)
    assert(idx.lastCandidateFiles >= 1)
  }

  test("a layout rewrite's output files re-bloom on the same pass — order after the layout riders") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 2000), root, "part")
    SnapshotStore.setProperties(spark, root, Seq(
      SnapshotStore.AutoBloomProp -> "sid",
      SnapshotStore.AutoBloomBitsProp -> "32"))
    assert(probeAbsent(root, "sid") == 0)
    // An explicit compact rewrites every file (fresh paths, no prior
    // blooms); its own postCommit pass must re-bloom the outputs.
    SnapshotStore.compact(spark, root, ColSpec(Seq("part")))
    assert(probeAbsent(root, "sid") == 0,
      "compacted files must carry fresh blooms with zero manual calls")
    assert(SnapshotStore.table(spark, root).count() == 2000)
  }

  test("a bad column leaves the commit green, rides the error ledger as component=autoBloom; fixing clears") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 300), root, "part")
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.AutoBloomProp -> "no_such_col"))
    SnapshotStore.appendCommit(spark, rows(300 until 400), root, "part")
    assert(SnapshotStore.table(spark, root).count() == 400,
      "the data commit must land regardless")
    SnapshotStore.appendCommit(spark, rows(400 until 500), root, "part")
    assert(SnapshotStore.tablePropertiesMap(spark, root)
      .get(SnapshotStore.MaintenanceErrorProp)
      .exists(_.startsWith("component=autoBloom;")),
      "the swallowed failure must be operator-visible on the ledger")
    SnapshotStore.setProperties(spark, root, Seq(
      SnapshotStore.AutoBloomProp -> "sid",
      SnapshotStore.AutoBloomBitsProp -> "32"))
    SnapshotStore.appendCommit(spark, rows(500 until 600), root, "part")
    SnapshotStore.appendCommit(spark, rows(600 until 700), root, "part")
    assert(!SnapshotStore.tablePropertiesMap(spark, root)
      .get(SnapshotStore.MaintenanceErrorProp)
      .exists(_.startsWith("component=autoBloom;")),
      "a clean pass must clear the recorded failure")
    assert(probeAbsent(root, "sid") == 0,
      "…and the fixed registration must actually bloom")
  }

  test("a MANUAL bloom survives metadata-only commits — the sidecar carries at commit time, no rider needed") {
    // The reader resolves the bloom sidecar at the exact tip version;
    // without the commit-time carry, ONE property commit (ANALYZE,
    // SET TBLPROPERTIES) stranded a manually-built sidecar one
    // version behind and silently reverted every point lookup to
    // stats-only skipping.
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 2000), root, "part")
    SnapshotStore.addBloomFilters(spark, root, Seq("sid"),
      bitsPerValue = 32, k = 6)
    assert(probeAbsent(root, "sid") == 0)
    SnapshotStore.setProperties(spark, root, Seq("graft.unrelated" -> "y"))
    assert(probeAbsent(root, "sid") == 0,
      "a property commit must not strand the sidecar behind the tip")
    SnapshotStats.analyze(spark, root)
    assert(probeAbsent(root, "sid") == 0,
      "an ANALYZE property commit must carry it too")
    // A DATA commit carries the old files' filters as well — the new
    // batch's files are simply unbloomed (kept conservatively) until
    // the next manual/rider build.
    SnapshotStore.appendCommit(spark, rows(2000 until 2100), root,
      ColSpec(Seq("part")))
    val (df, idx) = SnapshotStore.tableWithIndex(spark, root)
    assert(df.filter(col("sid") === 4987L).count() == 0)
    assert(idx.lastCandidateFiles < idx.totalFiles,
      "carried filters must still rule out the pre-append files")
  }

  test("composes with the async worker: blooms land after drain, commits never wait on the build") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rows(0 until 1500), root, "part")
    SnapshotStore.setProperties(spark, root, Seq(
      SnapshotStore.AutoBloomProp -> "sid",
      SnapshotStore.AutoBloomBitsProp -> "32",
      SnapshotStore.MaintenanceAsyncProp -> "true"))
    SnapshotStore.appendCommit(spark, rows(1500 until 2500), root, "part")
    SnapshotStore.drainAsyncMaintenance()
    assert(probeAbsent(root, "sid") == 0,
      "after the async drain every file must carry its bloom")
  }
}
