package graft

/** Stress net for the thread-pooled full sync: repeated 3-supplier
  * concurrent runs into a fresh shared sink must all succeed (the
  * merge touches only each supplier's own partitions; a regression
  * here means the concurrent-write reasoning in Pipeline.runFullSync
  * broke). */
class ConcurrentSyncSpec extends SparkSpec {
  private val refDir = "/root/reference/sample data"
  private def available =
    new java.io.File(s"$refDir/MidOcean Sample Data.jsonc").exists()

  test("3-supplier concurrent sync is stable across repetitions") {
    assume(available)
    import graft.pipeline.{Pipeline, SupplierConfig}
    (1 to 2).foreach { i =>
      val sink = java.nio.file.Files
        .createTempDirectory(s"graft-csync$i").toString + "/products"
      val results = Pipeline.runFullSync(spark, Seq(
        SupplierConfig("midocean", s"$refDir/MidOcean Sample Data.jsonc"),
        SupplierConfig("laltex", s"$refDir/Laltex Sample Data.jsonc"),
        SupplierConfig("xd", s"$refDir/XD Sample Data.jsonc")), sink)
      assert(results.forall(_.status == "success"),
        s"run $i: ${results.map(r => s"${r.supplier}=${r.status}" +
          r.errorSamples.mkString("[", "; ", "]"))}")
      val n = spark.read.parquet(sink)
        .select("supplier_id").distinct().count()
      assert(n == 3, s"run $i: expected 3 supplier partitions, got $n")
    }
  }

  test("3-supplier concurrent sync through the atomic snapshot sink") {
    assume(available)
    import graft.pipeline.{Pipeline, SupplierConfig}
    import graft.sinks.SnapshotStore
    val sink = java.nio.file.Files
      .createTempDirectory("graft-csync-snap").toString + "/products"
    val results = Pipeline.runFullSync(spark, Seq(
      SupplierConfig("midocean", s"$refDir/MidOcean Sample Data.jsonc"),
      SupplierConfig("laltex", s"$refDir/Laltex Sample Data.jsonc"),
      SupplierConfig("xd", s"$refDir/XD Sample Data.jsonc")), sink,
      atomicSink = true)
    assert(results.forall(_.status == "success"),
      results.map(r => s"${r.supplier}=${r.status}" +
        r.errorSamples.mkString("[", "; ", "]")).toString)
    // Optimistic retry serializes the three commits: exactly 3 versions,
    // and the current snapshot holds all three suppliers' rows.
    assert(SnapshotStore.versions(spark, sink) == Seq(1L, 2L, 3L))
    val n = SnapshotStore.read(spark, sink)
      .select("supplier_id").distinct().count()
    assert(n == 3, s"expected 3 supplier partitions in snapshot, got $n")
    // statusReport auto-detects the snapshot layout.
    assert(Pipeline.statusReport(spark, sink).count() >= 3)
  }
}
