package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Metadata-only COUNT(*) and the DV-adjusted row-count surface:
  * counts answered from the manifest + stats sidecar with zero data
  * files opened, and a scan fallback whenever the plan is not the
  * bare filterless count. */
class MetadataCountSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("metacount")}/t"

  private def bindCatalog(name: String): Unit =
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[GraftCatalog].getName)

  private def seed(root: String): Unit =
    SnapshotStore.commit(spark,
      (1 to 100).map(i => (s"s$i", if (i % 2 == 0) "a" else "b", i))
        .toDF("sku", "supplier", "qty"), root, "supplier")

  test("bare COUNT(*) is answered from metadata: LocalTableScan, no file scan") {
    val root = freshRoot(); bindCatalog("g_cnt")
    seed(root)
    val df = spark.sql(s"SELECT count(*) AS n FROM g_cnt.`$root`")
    assert(df.as[Long].head() == 100L)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("LocalTableScan"), phys)
    assert(!phys.contains("FileScan"), phys)
  }

  test("COUNT(*) WITH a filter is NOT rewritten and stays correct") {
    val root = freshRoot(); bindCatalog("g_cntf")
    seed(root)
    val df = spark.sql(
      s"SELECT count(*) AS n FROM g_cntf.`$root` WHERE qty > 50")
    assert(df.as[Long].head() == 50L)
    assert(df.queryExecution.executedPlan.toString.contains("FileScan"),
      "a filtered count must scan")
  }

  test("grouped and non-count aggregates are NOT rewritten") {
    val root = freshRoot(); bindCatalog("g_cntg")
    seed(root)
    assert(spark.sql(s"SELECT supplier, count(*) FROM g_cntg.`$root` " +
      "GROUP BY supplier ORDER BY supplier").collect().map(_.getLong(1))
      .toSeq == Seq(50L, 50L))
    assert(spark.sql(s"SELECT sum(qty) FROM g_cntg.`$root`")
      .head().getLong(0) == 5050L)
  }

  test("a DV-carrying read falls back to the scan and stays DV-correct; rowCount subtracts dvRows") {
    val root = freshRoot(); bindCatalog("g_cntdv")
    seed(root)
    SnapshotStore.setProperties(spark, root,
      Seq("graft.enableDeletionVectors" -> "true"))
    spark.sql(s"DELETE FROM g_cntdv.`$root` WHERE qty <= 10")
    val df = spark.sql(s"SELECT count(*) AS n FROM g_cntdv.`$root`")
    assert(df.as[Long].head() == 90L)
    // The DV anti-join sits above the relation, so the bare-count
    // pattern can't match — the plan must NOT be the local rewrite.
    assert(!df.queryExecution.executedPlan.toString.contains("LocalTableScan"))
    // The metadata API answers the same 90 without any scan.
    assert(SnapshotStore.rowCount(spark, root).contains(90L))
  }

  test("rowCount is genuinely metadata-priced: answers after the data files are gone") {
    val root = freshRoot()
    seed(root)
    assert(SnapshotStore.rowCount(spark, root).contains(100L))
    // Remove every data file; only manifests/ and sidecars remain. A
    // count that touched ANY data file would now throw.
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(dataDir, true)
    assert(SnapshotStore.rowCount(spark, root).contains(100L))
  }

  test("SHOW PARTITIONS row_count matches per-partition counts and tracks partition deletes") {
    val root = freshRoot(); bindCatalog("g_cntp")
    seed(root)
    val before = spark.sql(s"SHOW PARTITIONS g_cntp.`$root`")
      .as[(String, Long)].collect().toMap
    assert(before == Map("supplier=a" -> 50L, "supplier=b" -> 50L), before.toString)
    spark.sql(s"DELETE FROM g_cntp.`$root` WHERE supplier = 'a'")
    val after = spark.sql(s"SHOW PARTITIONS g_cntp.`$root`")
      .as[(String, Long)].collect().toMap
    assert(after == Map("supplier=b" -> 50L), after.toString)
    assert(SnapshotStore.rowCount(spark, root).contains(50L))
  }
}
