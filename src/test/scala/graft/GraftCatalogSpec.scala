package graft

import org.apache.spark.sql.functions._
import graft.sinks.{GraftCatalog, SnapshotStore}

/** The V2 snapshot catalog: standard `VERSION AS OF` SQL, warehouse
  * and path-based identifiers, catalog freshness vs view pinning, and
  * — the load-bearing assertion — that catalog reads still plan
  * through the V1 GraftFileIndex (skipping survives the V2 surface). */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft_cat_wh").toString
    spark.conf.set("spark.sql.catalog.g7", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.g7.warehouse", w)
    w
  }

  private def commitRange(root: String, from: Long, to: Long): Unit = {
    val df = spark.range(from, to).select($"id",
      ($"id" * 2).as("v"), lit("x").as("p"))
    if (SnapshotStore.versions(spark, root).isEmpty)
      SnapshotStore.commit(spark, df, root, "p")
    else
      SnapshotStore.mergeCommit(spark, df, root, "id", "v", "p")
  }

  test("warehouse tables read latest, VERSION AS OF time-travels, bad versions fail") {
    commitRange(s"$warehouse/events_t", 0, 100)
    commitRange(s"$warehouse/events_t", 100, 150)
    assert(spark.sql("SELECT count(*) FROM g7.events_t").as[Long].head() == 150)
    assert(spark.sql("SELECT count(*) FROM g7.events_t VERSION AS OF 1")
      .as[Long].head() == 100)
    assert(spark.sql("SELECT count(*) FROM g7.events_t VERSION AS OF 2")
      .as[Long].head() == 150)
    val e = intercept[Exception] {
      spark.sql("SELECT count(*) FROM g7.events_t VERSION AS OF 99").collect()
    }
    assert(e.getMessage.contains("99"))
    assert(spark.sql("SHOW TABLES IN g7").collect()
      .map(_.getString(1)).contains("events_t"))
  }

  test("absolute-path identifiers work without a warehouse") {
    val root = java.nio.file.Files.createTempDirectory("graft_cat_path")
      .toString + "/t"
    commitRange(root, 0, 25)
    warehouse // force catalog registration
    assert(spark.sql(s"SELECT sum(v) FROM g7.`$root`").as[Long].head() == 600)
  }

  test("catalog reads plan through the skipping file index (V1 relation conversion)") {
    val root = s"$warehouse/skip_t"
    val df = spark.range(1000).select($"id", ($"id" * 2).as("v"), lit("x").as("p"))
      .repartitionByRange(4, $"id").sortWithinPartitions($"id")
    SnapshotStore.commit(spark, df, root, "p")
    val q = spark.sql("SELECT count(*) FROM g7.skip_t WHERE id < 250")
    assert(q.as[Long].head() == 250)
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val idx = q.queryExecution.optimizedPlan.collectFirst {
      case l: LogicalRelation => l.relation.asInstanceOf[HadoopFsRelation]
        .location.asInstanceOf[graft.sinks.GraftFileIndex]
    }
    assert(idx.isDefined, "catalog read must resolve to the V1 skipping relation")
    assert(idx.get.lastCandidateFiles < idx.get.totalFiles,
      s"selective catalog read should prune: ${idx.get.lastCandidateFiles}/${idx.get.totalFiles}")
  }

  test("catalog tables are always fresh — no view-style pinning — and read-only") {
    val root = s"$warehouse/fresh_t"
    commitRange(root, 0, 10)
    assert(spark.sql("SELECT count(*) FROM g7.fresh_t").as[Long].head() == 10)
    commitRange(root, 10, 30)
    // Same SQL, no re-registration: the catalog resolves the manifest
    // per query, so the new commit is immediately visible (contrast
    // the unversioned USING-view pin in DataSkippingSpec).
    assert(spark.sql("SELECT count(*) FROM g7.fresh_t").as[Long].head() == 30)
    intercept[Exception] {
      spark.sql("DROP TABLE g7.fresh_t")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE g7.new_t (id BIGINT) USING parquet")
    }
  }
}
