package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Partition-spec evolution ([[SnapshotStore.repartitionTable]]):
  * one layout rewrite commit re-lays a live table under a new spec;
  * the per-version `#partcol` means DML routes by the NEW spec from
  * the next version, time travel reads old versions under the OLD
  * spec, and RESTORE snaps the spec back with the rest of the
  * target's metadata. */
class RepartitionSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("respec")}/t"

  private def seed(root: String): Unit =
    SnapshotStore.commit(spark,
      (0 until 40).map(i =>
        (i, s"s${i % 4}", if ((i / 4) % 2 == 0) "active" else "draft", i * 10))
        .toDF("id", "supplier", "status", "qty"),
      root, "supplier")

  test("evolve (supplier) -> (supplier, status): content identical, new spec governs DML") {
    val root = freshRoot()
    seed(root)
    val before = SnapshotStore.read(spark, root)
      .as[(Int, String, String, Int)].collect().toSet
    val v = SnapshotStore.repartitionTable(spark, root,
      Seq("supplier", "status"))
    assert(v == 2L)
    assert(SnapshotStore.partitionColumn(spark, root, 2L)
      .contains("supplier,status"))
    val m2 = SnapshotStore.manifest(spark, root, 2L)
    assert(m2.map(_.partition).toSet ==
      (0 until 4).flatMap(i => Seq(s"s$i/active", s"s$i/draft")).toSet,
      m2.map(_.partition).toString)
    assert(SnapshotStore.read(spark, root)
      .as[(Int, String, String, Int)].collect().toSet == before)
    // Time travel: v1 still reads under the single-column spec.
    assert(SnapshotStore.partitionColumn(spark, root, 1L)
      .contains("supplier"))
    assert(SnapshotStore.readVersion(spark, root, 1L)
      .as[(Int, String, String, Int)].collect().toSet == before)
    // A merge now touches exactly ONE (supplier, status) cell.
    SnapshotStore.mergeCommitOrdered(spark,
      Seq((0, "s0", "active", 999)).toDF("id", "supplier", "status", "qty"),
      root, "id", Nil, Seq("supplier", "status"))
    val m3 = SnapshotStore.manifest(spark, root, 3L)
    assert(m3.filterNot(_.partition == "s0/active").toSet ==
      m2.filterNot(_.partition == "s0/active").toSet,
      "a one-cell merge must carry every other cell by reference")
    assert(SnapshotStore.read(spark, root).filter(col("id") === 0)
      .select("qty").as[Int].head() == 999)
  }

  test("RESTORE across the evolution snaps the spec back") {
    val root = freshRoot()
    seed(root)
    SnapshotStore.repartitionTable(spark, root, Seq("supplier", "status"))
    val v = SnapshotStore.restore(spark, root, 1L)
    assert(SnapshotStore.partitionColumn(spark, root, v)
      .contains("supplier"))
    // And DML after the restore routes under the restored spec.
    SnapshotStore.mergeCommitOrdered(spark,
      Seq((1, "s1", "draft", 111)).toDF("id", "supplier", "status", "qty"),
      root, "id", Nil, "supplier")
    assert(SnapshotStore.read(spark, root).filter(col("id") === 1)
      .select("qty").as[Int].head() == 111)
  }

  test("CDC across the boundary: a pure re-spec is zero changes; later edits diff normally") {
    val root = freshRoot()
    seed(root)
    SnapshotStore.repartitionTable(spark, root, Seq("supplier", "status"))
    assert(SnapshotStore.changes(spark, root, 1L, 2L, "id").count() == 0,
      "re-partitioning changes no content")
    SnapshotStore.mergeCommitOrdered(spark,
      Seq((5, "s1", "draft", 555)).toDF("id", "supplier", "status", "qty"),
      root, "id", Nil, Seq("supplier", "status"))
    val ch = SnapshotStore.changes(spark, root, 1L, 3L, "id")
      .select("id", "_change_type").as[(Int, String)].collect().toSet
    assert(ch == Set((5, "update")), ch.toString)
  }

  test("deletion vectors are materialized by the rewrite") {
    val root = freshRoot()
    seed(root)
    SnapshotStore.deleteWhereDv(spark, root, "id = 7")
    assert(SnapshotStore.manifest(spark, root, 2L).exists(_.dv.nonEmpty))
    SnapshotStore.repartitionTable(spark, root, Seq("supplier", "status"))
    val m3 = SnapshotStore.manifest(spark, root, 3L)
    assert(m3.forall(_.dv.isEmpty), "rewrite must materialize DVs")
    assert(SnapshotStore.read(spark, root).filter(col("id") === 7).count() == 0)
    assert(SnapshotStore.read(spark, root).count() == 39)
  }

  test("re-speccing an empty table and a no-op spec are metadata-only") {
    val root = freshRoot()
    seed(root)
    assert(SnapshotStore.repartitionTable(spark, root, "supplier") == 1L,
      "same spec = no-op")
    SnapshotStore.truncate(spark, root)
    val v = SnapshotStore.repartitionTable(spark, root,
      Seq("supplier", "status"))
    assert(SnapshotStore.manifest(spark, root, v).isEmpty)
    assert(SnapshotStore.partitionColumn(spark, root, v)
      .contains("supplier,status"))
    // The empty re-specced table stays writable under the new spec.
    SnapshotStore.appendCommit(spark,
      Seq((100, "s9", "active", 1)).toDF("id", "supplier", "status", "qty"),
      root, Seq("supplier", "status"))
    assert(SnapshotStore.read(spark, root).count() == 1)
  }

  test("SQL spelling: ALTER TABLE ... SET PARTITIONED BY (a, b)") {
    val root = freshRoot()
    seed(root)
    spark.conf.set("spark.sql.catalog.g_respec",
      classOf[GraftCatalog].getName)
    val out = spark.sql(
      s"ALTER TABLE g_respec.`$root` SET PARTITIONED BY (supplier, status)")
      .collect()
    assert(out.head.getLong(1) == 2L)
    assert(SnapshotStore.partitionColumn(spark, root, 2L)
      .contains("supplier,status"))
    assert(SnapshotStore.read(spark, root).count() == 40)
    // And SHOW PARTITIONS reflects the composite cells.
    val parts = spark.sql(s"SHOW PARTITIONS g_respec.`$root`")
      .select("partition").as[String].collect()
    assert(parts.forall(p => p.startsWith("supplier=") &&
      p.contains("/status=")), parts.mkString(","))
  }
}
