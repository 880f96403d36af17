package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sinks.SnapshotStore

/** Keyed delete commits and the row-level change feed between
  * snapshot versions (the store's CRUD completion + CDC surface). */
class SnapshotCdcSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("snapcdc").resolve("t").toString

  private def table(rows: (String, String, Int)*) =
    rows.toDF("product_id", "supplier", "version")

  test("deleteCommit removes listed keys atomically, rewriting only their partitions") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "b", 1), ("p4", "c", 1)),
      root, "supplier")
    // Keys WITHOUT a partition column: the probe path must find that
    // only partitions a and b hold doomed keys; c is carried.
    val v2 = SnapshotStore.deleteCommit(spark,
      Seq("p1", "p3", "p_absent").toDF("product_id"), root,
      "product_id", "supplier")
    assert(v2 == 2L)
    val left = SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet
    assert(left == Set("p2", "p4"))
    // Partition c untouched → identical file paths in both manifests.
    val c1 = SnapshotStore.manifest(spark, root, 1).filter(_.partition == "c").map(_.path).toSet
    val c2 = SnapshotStore.manifest(spark, root, 2).filter(_.partition == "c").map(_.path).toSet
    assert(c1 == c2 && c1.nonEmpty)
    // Partition b lost its only row → gone from the manifest entirely.
    assert(SnapshotStore.manifest(spark, root, 2).forall(_.partition != "b"))
    // Time travel still sees the pre-delete rows.
    assert(SnapshotStore.readVersion(spark, root, 1).count() == 4)
  }

  test("deleteCommit with explicit partitions prunes the probe; empty delete is a version no-op") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    val v2 = SnapshotStore.deleteCommit(spark,
      Seq(("p1", "a")).toDF("product_id", "supplier"), root,
      "product_id", "supplier")
    assert(v2 == 2L)
    assert(SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet == Set("p2"))
    // Doomed keys that exist nowhere: current version returned, no commit.
    val v3 = SnapshotStore.deleteCommit(spark,
      Seq(("zz", "zz")).toDF("product_id", "supplier"), root,
      "product_id", "supplier")
    assert(v3 == 2L && SnapshotStore.versions(spark, root) == Seq(1L, 2L))
    // Null keys match nothing (anti-join semantics) — no mass delete;
    // and the hinted partition holds no doomed row, so this too is an
    // EXACT no-op (the probe inside the hint decides, the hint alone
    // never forces a rewrite).
    val v4 = SnapshotStore.deleteCommit(spark,
      Seq((null: String, "b")).toDF("product_id", "supplier"), root,
      "product_id", "supplier")
    assert(SnapshotStore.read(spark, root).count() == 1)
    assert(v4 == 2L && SnapshotStore.versions(spark, root) == Seq(1L, 2L))
  }

  test("deleting every row leaves a valid, readable, recoverable empty snapshot") {
    import org.apache.spark.sql.functions._
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    val v2 = SnapshotStore.deleteCommit(spark,
      Seq("p1", "p2").toDF("product_id"), root, "product_id", "supplier")
    assert(v2 == 2L)
    // The empty version reads as zero rows WITH the table's schema
    // (carried by the stats sidecar), through both the API and the
    // skipping table path.
    val empty = SnapshotStore.read(spark, root)
    assert(empty.columns.toSeq == Seq("product_id", "supplier", "version"))
    assert(empty.count() == 0)
    assert(SnapshotStore.changes(spark, root, 1, 2, "product_id")
      .filter(col("_change_type") =!= "delete").isEmpty)
    // The table is not bricked: a later merge repopulates it.
    val v3 = SnapshotStore.mergeCommit(spark, table(("p9", "a", 9)), root,
      "product_id", "version", "supplier")
    assert(v3 == 3L && SnapshotStore.read(spark, root).count() == 1)
  }

  test("changes classifies insert/update/delete and skips untouched partitions") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "b", 1), ("p5", "d", 1)),
      root, "supplier")
    SnapshotStore.mergeCommit(spark,
      table(("p1", "a", 2), ("p4", "c", 2)), root,
      "product_id", "version", "supplier")
    SnapshotStore.deleteCommit(spark,
      Seq("p3").toDF("product_id"), root, "product_id", "supplier")
    // d never touched after v1 → not even listed as changed.
    assert(SnapshotStore.changedPartitions(spark, root, 1, 3).toSet == Set("a", "b", "c"))
    val got = SnapshotStore.changes(spark, root, 1, 3, "product_id")
      .select("product_id", "version", "_change_type")
      .as[(String, Int, String)].collect().toSet
    // p1 updated (to-version values), p4 inserted, p3 deleted
    // (from-version values), p2/p5 unchanged → absent.
    assert(got == Set(("p1", 2, "update"), ("p4", 2, "insert"), ("p3", 1, "delete")))
  }

  test("compaction between versions adds zero change rows (carried rows compare equal)") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 2), ("p3", "a", 3), ("p4", "a", 4))
        .repartition(4), root, "supplier")
    assert(SnapshotStore.manifest(spark, root, 1).size > 1)
    val v = SnapshotStore.compact(spark, root, "supplier")
    assert(v == 2L)
    // The compaction rewrote partition a's files, so the partition IS
    // in the changed set — but every row compares equal, so the feed
    // is empty: layout changes are not data changes.
    assert(SnapshotStore.changedPartitions(spark, root, 1, 2) == Seq("a"))
    assert(SnapshotStore.changes(spark, root, 1, 2, "product_id").isEmpty)
  }

  test("the feed RECONSTRUCTS the target version: v_from + changes = v_to, exactly") {
    import org.apache.spark.sql.functions._
    // Seeded pseudo-random mutation pattern over a 300-row keyed
    // table: ~1/3 updated, ~1/5 deleted, 60 inserted — then the CDC
    // contract is checked semantically: applying the classified feed
    // to the old version must yield the new version row-for-row.
    val root = freshRoot()
    val base = spark.range(300).select(
      col("id").as("k"),
      pmod(col("id"), lit(7)).cast("string").as("part"),
      (col("id") * 31 % 97).as("v"))
    SnapshotStore.commit(spark, base, root, "part")
    SnapshotStore.mergeCommit(spark,
      base.filter(pmod(col("k"), lit(3)) === 0)
        .withColumn("v", col("v") + 1000)
        .unionByName(spark.range(300, 360).select(
          col("id").as("k"), pmod(col("id"), lit(7)).cast("string").as("part"),
          lit(-1L).as("v"))),
      root, "k", "v", "part")
    SnapshotStore.deleteCommit(spark,
      base.filter(pmod(col("k"), lit(5)) === 1).select(col("k")), root, "k", "part")
    val from = SnapshotStore.readVersion(spark, root, 1)
    val to = SnapshotStore.readVersion(spark, root, 3)
    val feed = SnapshotStore.changes(spark, root, 1, 3, "k")
    // Apply: drop deleted+updated keys from v_from, add back
    // insert/update payloads.
    val touchedKeys = feed.select(col("k")).distinct()
    val applied = from.join(touchedKeys, Seq("k"), "left_anti")
      .unionByName(feed.filter(col("_change_type") =!= "delete")
        .drop("_change_type"))
    val cols = to.columns.map(col).toIndexedSeq
    assert(applied.select(cols: _*).exceptAll(to.select(cols: _*)).isEmpty &&
      to.select(cols: _*).exceptAll(applied.select(cols: _*)).isEmpty,
      "applying the change feed to v1 did not reproduce v3")
    // And the feed is MINIMAL: no change row for an untouched key.
    val untouched = from.join(to, Seq("k"))
      .filter(from("v") === to("v")).select(col("k"))
    assert(feed.join(untouched, Seq("k"), "left_semi").isEmpty,
      "feed contains rows for unchanged keys")
  }

  test("SQL change-feed view equals the API feed; option errors are loud") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1), ("p2", "a", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 2), ("p3", "b", 2)), root,
      "product_id", "version", "supplier")
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdc_view USING `graft-snapshot` " +
      s"OPTIONS (path '$root', changesFrom '1', changesTo '2', key 'product_id')")
    val viaSql = spark.table("cdc_view")
      .select("product_id", "version", "_change_type")
      .as[(String, Int, String)].collect().toSet
    val viaApi = SnapshotStore.changes(spark, root, 1, 2, "product_id")
      .select("product_id", "version", "_change_type")
      .as[(String, Int, String)].collect().toSet
    assert(viaSql == viaApi &&
      viaSql == Set(("p1", 2, "update"), ("p3", 2, "insert")))
    // preImages 'true' = the Delta CDF pre/post pair per update.
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdc_view_pre USING `graft-snapshot` " +
      s"OPTIONS (path '$root', changesFrom '1', changesTo '2', " +
      "key 'product_id', preImages 'true')")
    val pre = spark.table("cdc_view_pre")
      .select("product_id", "version", "_change_type")
      .as[(String, Int, String)].collect().toSet
    assert(pre == Set(("p1", 1, "update_preimage"),
      ("p1", 2, "update_postimage"), ("p3", 2, "insert")), pre)
    // Lone changesFrom and missing key both fail loudly at creation.
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdc_bad1 USING `graft-snapshot` " +
        s"OPTIONS (path '$root', changesFrom '1')")
    }
    intercept[IllegalArgumentException] {
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW cdc_bad2 USING `graft-snapshot` " +
        s"OPTIONS (path '$root', changesFrom '1', changesTo '2')")
    }
  }

  test("changes across schema evolution and map-typed columns") {
    val root = freshRoot()
    val v1Rows = Seq(("p1", "a", Map("en" -> "one")), ("p2", "a", Map("en" -> "two")))
      .toDF("product_id", "supplier", "name_i18n")
    SnapshotStore.commit(spark, v1Rows, root, "supplier")
    // v2 adds a column and changes p2's map; p1 carried identical.
    val v2Rows = Seq(
      ("p1", "a", Map("en" -> "one"), null.asInstanceOf[String]),
      ("p2", "a", Map("en" -> "two", "de" -> "zwei"), "updated"))
      .toDF("product_id", "supplier", "name_i18n", "note")
    SnapshotStore.mergeCommit(spark, v2Rows, root,
      "product_id", "product_id", "supplier")
    val got = SnapshotStore.changes(spark, root, 1, 2, "product_id")
      .select("product_id", "_change_type").as[(String, String)].collect().toMap
    // p2's map grew → update. p1: same values, evolved column null on
    // both sides → NOT a change.
    assert(got == Map("p2" -> "update"))
    val p2 = SnapshotStore.changes(spark, root, 1, 2, "product_id")
      .filter(col("product_id") === "p2").select("name_i18n")
      .as[Map[String, String]].head()
    assert(p2 == Map("en" -> "two", "de" -> "zwei"))
  }

  test("change feed reads only the versions' differing files, not carried ones") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "b", 1)), root, "supplier")
    // Append into partition a: v2 = v1's files (carried by reference)
    // plus the appended file(s).
    SnapshotStore.appendCommit(spark, table(("p9", "a", 1)), root, "supplier")
    val carried = SnapshotStore.manifest(spark, root, 1).map(_.path).toSet
    val appended = SnapshotStore.manifest(spark, root, 2).map(_.path).toSet -- carried
    assert(appended.nonEmpty)
    val feed = SnapshotStore.changes(spark, root, 1, 2, "product_id")
    // Values: exactly the appended row, as an insert.
    assert(feed.select("product_id", "_change_type").as[(String, String)]
      .collect().toMap == Map("p9" -> "insert"))
    // Cost shape: the diff's scan set is the SYMMETRIC DIFFERENCE of
    // the manifests — an append window must read only the appended
    // files, never re-read the carried ones (CDC cost ∝ changed
    // files, the Delta-CDF add/remove-file scoping).
    val scanned = feed.inputFiles.map(f =>
      f.substring(f.indexOf("data/v_"))).toSet
    assert(scanned == appended,
      s"expected only appended files $appended, scanned $scanned")
  }
}
