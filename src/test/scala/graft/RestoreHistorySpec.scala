package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotStore

/** E48: snapshot RESTORE (roll back by reference as a new version) and
  * DESCRIBE HISTORY (per-version audit view). */
class RestoreHistorySpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("restorehist").resolve("t").toString

  private def table(rows: (String, String, Int)*) =
    rows.toDF("product_id", "supplier", "version")

  test("restore rolls content back as a NEW version; history survives") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "b", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark,
      table(("p1", "a", 2), ("p4", "b", 2)), root,
      "product_id", "version", "supplier")
    val v3 = SnapshotStore.restore(spark, root, 1L)
    assert(v3 == 3L)
    // Current read == v1 content.
    val cur = SnapshotStore.read(spark, root)
      .select("product_id", "version").as[(String, Int)].collect().toSet
    assert(cur == Set(("p1", 1), ("p2", 1), ("p3", 1)))
    // Rolled-over v2 stays time-travelable.
    val v2 = SnapshotStore.readVersion(spark, root, 2L)
      .select("product_id", "version").as[(String, Int)].collect().toSet
    assert(v2 == Set(("p1", 2), ("p2", 1), ("p3", 1), ("p4", 2)))
  }

  test("restore is a metadata-only commit (no new data files)") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 2)), root,
      "product_id", "version", "supplier")
    SnapshotStore.restore(spark, root, 1L)
    assert(SnapshotStore.manifest(spark, root, 3L).toSet ==
      SnapshotStore.manifest(spark, root, 1L).toSet)
  }

  test("restoring to current content is a version no-op") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p2", "a", 1)), root,
      "product_id", "version", "supplier")
    // Restore to the tip itself: no-op.
    assert(SnapshotStore.restore(spark, root, 2L) == 2L)
    // Restore to v1, then restore to v1 again: second is a no-op.
    assert(SnapshotStore.restore(spark, root, 1L) == 3L)
    assert(SnapshotStore.restore(spark, root, 1L) == 3L)
  }

  test("restore snaps table properties back to the target version's set") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    SnapshotStore.setProperties(spark, root,
      Seq("owner" -> "etl", "tier" -> "gold"))                    // v2
    SnapshotStore.setProperties(spark, root, Seq("tier" -> "raw")) // v3
    // Restore to v2: properties must snap back to v2's exact set
    // (Delta's RESTORE restores the target metadata including
    // configuration), not carry the abandoned tip's forward.
    SnapshotStore.restore(spark, root, 2L)
    assert(SnapshotStore.tablePropertiesMap(spark, root) ==
      Map("owner" -> "etl", "tier" -> "gold"))
    // Restore to v1 (no properties): the set empties.
    SnapshotStore.restore(spark, root, 1L)
    assert(SnapshotStore.tablePropertiesMap(spark, root).isEmpty)
    // Same files, different properties → NOT a version no-op: restoring
    // back to v2's state must commit (and restore the properties).
    val v = SnapshotStore.restore(spark, root, 2L)
    assert(v > 1L &&
      SnapshotStore.tablePropertiesMap(spark, root)("tier") == "gold")
  }

  test("restore across a widening merge snaps the schema back exactly") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    val widened = Seq(("p2", "a", 2, "extra"))
      .toDF("product_id", "supplier", "version", "note")
    SnapshotStore.mergeCommit(spark, widened, root,
      "product_id", "version", "supplier")
    assert(SnapshotStore.read(spark, root).columns.contains("note"))
    SnapshotStore.restore(spark, root, 1L)
    val restored = SnapshotStore.read(spark, root)
    assert(!restored.columns.contains("note"),
      s"restored schema leaked later columns: ${restored.columns.mkString(",")}")
    assert(restored.select("product_id").as[String].collect().toSeq == Seq("p1"))
  }

  test("history reports operations, file diffs, and row counts") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p3", "b", 2)), root,
      "product_id", "version", "supplier")
    SnapshotStore.deleteCommit(spark, Seq("p1").toDF("product_id"), root,
      "product_id", "supplier")
    SnapshotStore.restore(spark, root, 1L)
    val h = SnapshotStore.history(spark, root)
      .select("version", "operation", "n_partitions", "total_rows")
      .as[(Long, String, Int, Long)].collect().toSeq
    assert(h.map(r => (r._1, r._2)) ==
      Seq((1L, "commit"), (2L, "merge"), (3L, "delete"), (4L, "restore")))
    assert(h.map(_._4) == Seq(2L, 3L, 2L, 2L))
    // Deleting partition a's only row makes the partition vanish at v3.
    assert(h.map(_._3) == Seq(2, 2, 1, 2))
    // The restore commit adds no files beyond v1's and drops the
    // versions-2/3 rewrites relative to v3.
    val full = SnapshotStore.history(spark, root).collect()
    val restoreRow = full.find(_.getLong(0) == 4L).get
    assert(restoreRow.getAs[Int]("files_added") > 0 ||
      restoreRow.getAs[Int]("files_removed") > 0)
    // Operation metrics: rows of the files each version added/removed.
    // v1 adds both seed rows; v2 rewrites partition b (removes its
    // 1-row file, adds the 2-row merged file); v3 removes partition
    // a's 1-row file and adds nothing.
    val m = full.map(r => r.getLong(0) ->
      (r.getAs[java.lang.Long]("rows_added"),
        r.getAs[java.lang.Long]("rows_removed"))).toMap
    assert(m(1L) == (2L, 0L))
    assert(m(2L) == (2L, 1L))
    assert(m(3L) == (0L, 1L))
  }

  test("restore interoperates with the SQL surface (VERSION AS OF)") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 2)), root,
      "product_id", "version", "supplier")
    SnapshotStore.restore(spark, root, 1L)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW rh_sql USING `graft-snapshot` " +
      s"OPTIONS (path '$root')")
    assert(spark.sql("SELECT version FROM rh_sql").as[Int].collect().toSeq ==
      Seq(1))
  }

  test("RESTORE TABLE … TO VERSION AS OF runs purely in SQL through the catalog") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark,
      table(("p1", "a", 2), ("p3", "b", 2)), root,
      "product_id", "version", "supplier")
    spark.conf.set("spark.sql.catalog.rh_sqlr",
      classOf[graft.sinks.GraftCatalog].getName)
    val res = spark.sql(s"RESTORE TABLE rh_sqlr.`$root` TO VERSION AS OF 1")
      .as[(Long, Long)].collect().toSeq
    assert(res == Seq((1L, 3L)), s"expected (restored_to=1, committed=3), got $res")
    // SQL restore == API restore: current content is exactly v1's.
    assert(SnapshotStore.read(spark, root)
      .select("product_id", "version").as[(String, Int)].collect().toSet ==
      Set(("p1", 1), ("p2", 1)))
    // Restoring to the CURRENT content is a no-op (same version back).
    val again = spark.sql(s"RESTORE rh_sqlr.`$root` TO VERSION AS OF 1")
      .as[(Long, Long)].collect().toSeq
    assert(again == Seq((1L, 3L)))
  }

  test("DESCRIBE HISTORY runs purely in SQL, newest-first, equal to the API view") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    SnapshotStore.deleteCommit(spark, Seq("p2").toDF("product_id"),
      root, "product_id", "supplier")
    spark.conf.set("spark.sql.catalog.rh_sqlh",
      classOf[graft.sinks.GraftCatalog].getName)
    val got = spark.sql(s"DESC HISTORY rh_sqlh.`$root`")
      .select("version", "operation", "total_rows")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((2L, "delete", 1L), (1L, "commit", 2L)))
    val api = SnapshotStore.history(spark, root)
      .orderBy(col("version").desc)
      .select("version", "operation", "total_rows")
      .as[(Long, String, Long)].collect().toSeq
    assert(got == api)
  }

  test("VACUUM … RETAIN 0 HOURS runs purely in SQL and sweeps rolled-over versions") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 2)), root,
      "product_id", "version", "supplier")
    SnapshotStore.mergeCommit(spark, table(("p2", "b", 2)), root,
      "product_id", "version", "supplier")
    spark.conf.set("spark.sql.catalog.rh_sqlv",
      classOf[graft.sinks.GraftCatalog].getName)
    val out = spark.sql(s"VACUUM rh_sqlv.`$root` RETAIN 0 HOURS")
      .as[String].collect().toSeq
    assert(out == Seq(root))
    // Default keep window is 2: version 1's manifest is gone, current
    // content is untouched.
    assert(SnapshotStore.versions(spark, root) == Seq(2L, 3L))
    assert(SnapshotStore.read(spark, root)
      .select("product_id", "version").as[(String, Int)].collect().toSet ==
      Set(("p1", 2), ("p2", 2)))
  }

  test("OPTIMIZE resolves the partition column from manifest metadata; ZORDER variant") {
    import graft.sinks.SnapshotStore
    val root = freshRoot()
    // Partition a's rows spread over 3 write tasks -> 3 small files.
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1), ("p3", "a", 1), ("p4", "a", 1))
        .repartition(3), root, "supplier")
    assert(SnapshotStore.partitionColumn(spark, root, 1L).contains("supplier"))
    assert(SnapshotStore.manifest(spark, root, 1)
      .count(_.partition == "a") > 1, "fixture needs a multi-file partition")
    spark.conf.set("spark.sql.catalog.rh_sqlo",
      classOf[graft.sinks.GraftCatalog].getName)
    val r = spark.sql(s"OPTIMIZE rh_sqlo.`$root`")
      .as[(String, Long)].collect().toSeq
    assert(r == Seq((root, 2L)))
    assert(SnapshotStore.manifest(spark, root, 2)
      .count(_.partition == "a") == 1, "compaction must leave one file per partition")
    assert(SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet ==
      Set("p1", "p2", "p3", "p4"))
    // Re-optimize: nothing to do -> same version back.
    assert(spark.sql(s"OPTIMIZE rh_sqlo.`$root`")
      .as[(String, Long)].collect().toSeq == Seq((root, 2L)))
    // ZORDER variant re-lays-out rows (numeric keys); content unchanged.
    spark.sql(s"OPTIMIZE rh_sqlo.`$root` ZORDER BY (version)")
    assert(SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet ==
      Set("p1", "p2", "p3", "p4"))
    // Metadata survives restore and clone.
    SnapshotStore.restore(spark, root, 1L)
    val cur = SnapshotStore.currentVersion(spark, root).get
    assert(SnapshotStore.partitionColumn(spark, root, cur).contains("supplier"))
    val dst = freshRoot()
    SnapshotStore.cloneTo(spark, root, dst)
    assert(SnapshotStore.partitionColumn(spark, dst, 1L).contains("supplier"))
  }

  test("OPTIMIZE WHERE compacts only matching partitions") {
    import graft.sinks.SnapshotStore
    val root = freshRoot()
    // Both partitions get multiple small files.
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "a", 1),
        ("p4", "b", 1), ("p5", "b", 1), ("p6", "b", 1))
        .repartition(3), root, "supplier")
    assert(SnapshotStore.manifest(spark, root, 1).count(_.partition == "a") > 1)
    assert(SnapshotStore.manifest(spark, root, 1).count(_.partition == "b") > 1)
    spark.conf.set("spark.sql.catalog.rh_sqlow",
      classOf[graft.sinks.GraftCatalog].getName)
    val bBefore = SnapshotStore.manifest(spark, root, 1)
      .filter(_.partition == "b").toSet
    spark.sql(s"OPTIMIZE rh_sqlow.`$root` WHERE supplier = 'a'")
    val m2 = SnapshotStore.manifest(spark, root, 2)
    // a compacted to one file; b's files carried byte-identically.
    assert(m2.count(_.partition == "a") == 1)
    assert(m2.filter(_.partition == "b").toSet == bBefore)
    assert(SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet ==
      Set("p1", "p2", "p3", "p4", "p5", "p6"))
    // A WHERE matching no partition is a version no-op.
    assert(spark.sql(s"OPTIMIZE rh_sqlow.`$root` WHERE supplier = 'zzz'")
      .as[(String, Long)].collect().toSeq == Seq((root, 2L)))
  }

  test("DESCRIBE DETAIL summarizes the current version in one row") {
    import graft.sinks.SnapshotStore
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    SnapshotStore.addConstraint(spark, root, "v_pos", "version > 0")
    spark.conf.set("spark.sql.catalog.rh_sqld",
      classOf[graft.sinks.GraftCatalog].getName)
    val r = spark.sql(s"DESCRIBE DETAIL rh_sqld.`$root`").collect().head
    assert(r.getString(0) == "graft-snapshot")
    assert(r.getString(1) == root)
    assert(r.getString(2) == "supplier")
    assert(r.getLong(3) == 2L) // constraint commit
    assert(r.getTimestamp(4) != null)
    assert(r.getInt(5) == 2 && r.getInt(6) == 2) // 2 files, 2 partitions
    assert(r.getLong(7) > 0L)
    assert(r.getLong(8) == 2L) // num_rows, sidecar-priced
    assert(r.getSeq[String](9) == Seq("v_pos CHECK (version > 0)"))
  }

  test("GENERATE symlink_format_manifest FOR TABLE runs purely in SQL") {
    import graft.sinks.SnapshotStore
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    spark.conf.set("spark.sql.catalog.rh_sqlg",
      classOf[graft.sinks.GraftCatalog].getName)
    val out = spark.sql(s"GENERATE symlink_format_manifest FOR TABLE rh_sqlg.`$root`")
      .as[String].collect().toSeq
    assert(out.size == 1 && out.head.endsWith("_symlink_format_manifest"))
    // The export lists every data file of the current snapshot.
    val listed = spark.read.textFile(out.head + "/*").collect().toSet
    assert(listed.size == SnapshotStore.manifest(spark, root, 1).size)
  }

  test("MERGE INTO runs purely in SQL: matched rows replaced, unmatched inserted") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "b", 1)), root, "supplier")
    spark.conf.set("spark.sql.catalog.rh_merge",
      classOf[graft.sinks.GraftCatalog].getName)
    table(("p1", "a", 2), ("p4", "b", 2)).createOrReplaceTempView("rh_merge_src")
    val res = spark.sql(
      s"MERGE INTO rh_merge.`$root` AS t USING rh_merge_src AS s " +
        "ON t.product_id = s.product_id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(res == Seq((root, 2L)))
    assert(SnapshotStore.manifestOperation(spark, root, 2L).contains("merge"))
    assert(SnapshotStore.read(spark, root)
      .select("product_id", "version").as[(String, Int)].collect().toSet ==
      Set(("p1", 2), ("p2", 1), ("p3", 1), ("p4", 2)))
    // Subquery source, bare (unqualified) ON columns, no aliases.
    spark.sql(
      s"MERGE INTO rh_merge.`$root` " +
        "USING (SELECT 'p2' AS product_id, 'a' AS supplier, 3 AS version) " +
        "ON product_id = product_id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *").collect()
    assert(SnapshotStore.read(spark, root)
      .select("product_id", "version").as[(String, Int)].collect().toSet ==
      Set(("p1", 2), ("p2", 3), ("p3", 1), ("p4", 2)))
    // SQL MERGE means "source wins" even if a version column says
    // otherwise — there is no version comparison in the statement.
    table(("p1", "a", 0)).createOrReplaceTempView("rh_merge_src0")
    spark.sql(
      s"MERGE INTO rh_merge.`$root` AS t USING rh_merge_src0 AS s " +
        "ON t.product_id = s.product_id " +
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *").collect()
    assert(SnapshotStore.read(spark, root).filter(col("product_id") === "p1")
      .select("version").as[Int].collect().toSeq == Seq(0))
  }

  test("a canonical MERGE aimed at a NON-graft table flows to the session parser") {
    // Even the exact upsert shape the graft parser supports must pass
    // through when the target is another catalog: the failure must be
    // Spark's own table-not-found, never graft's resolveRoot error.
    val e = intercept[Exception] {
      spark.sql("MERGE INTO spark_catalog.default.nope_merge_tbl t " +
        "USING spark_catalog.default.nope_merge_src s " +
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * " +
        "WHEN NOT MATCHED THEN INSERT *").collect()
    }
    assert(!e.getMessage.contains("graft"),
      s"graft parser hijacked a non-graft MERGE: ${e.getMessage.take(200)}")
  }

  test("unsupported MERGE shapes and bad sources fail loudly") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    spark.conf.set("spark.sql.catalog.rh_mergex",
      classOf[graft.sinks.GraftCatalog].getName)
    table(("p1", "a", 2)).createOrReplaceTempView("rh_mergex_src")
    def bad(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    // Explicit column-list INSERT → rejected with the grammar.
    assert(bad(s"MERGE INTO rh_mergex.`$root` t USING rh_mergex_src s " +
      "ON t.product_id = s.product_id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT (product_id) VALUES (s.product_id)")
      .contains("INSERT"))
    // Non-equality ON conjunct → rejected.
    assert(bad(s"MERGE INTO rh_mergex.`$root` t USING rh_mergex_src s " +
      "ON t.product_id > s.product_id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .contains("equality key"))
    // Differently-named ON columns → rejected.
    assert(bad(s"MERGE INTO rh_mergex.`$root` t USING rh_mergex_src s " +
      "ON t.product_id = s.supplier " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .contains("equality key"))
    // A clause after an unconditional clause of the same kind → dead
    // code, rejected.
    assert(bad(s"MERGE INTO rh_mergex.`$root` t USING rh_mergex_src s " +
      "ON t.product_id = s.product_id " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN MATCHED AND s.version > 1 THEN DELETE " +
      "WHEN NOT MATCHED THEN INSERT *").contains("unreachable"))
    // Duplicate source keys → standard MERGE error before any write.
    table(("p9", "a", 1), ("p9", "a", 2)).createOrReplaceTempView("rh_mergex_dup")
    assert(bad(s"MERGE INTO rh_mergex.`$root` t USING rh_mergex_dup s " +
      "ON t.product_id = s.product_id " +
      "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
      .contains("multiple rows"))
    assert(SnapshotStore.versions(spark, root) == Seq(1L),
      "a rejected MERGE must not have committed anything")
    // A MERGE aimed at a NON-graft catalog flows to the session parser
    // (Spark's own MERGE grammar), not our shape error.
    val other = intercept[Exception] {
      spark.sql("MERGE INTO spark_catalog.default.nope t USING rh_mergex_src s " +
        "ON t.product_id = s.product_id " +
        "WHEN MATCHED THEN DELETE").collect()
    }
    assert(!other.getMessage.contains("upsert shape"), other.getMessage)
  }

  test("maintenance parser delegates everything else; bad targets fail loudly") {
    // Ordinary SQL still parses through the delegate.
    assert(spark.sql("SELECT 1 + 1 AS two").as[Int].collect().toSeq == Seq(2))
    // Unqualified table → user error, not a parse crash.
    val e1 = intercept[Exception] {
      spark.sql("RESTORE TABLE unqualified TO VERSION AS OF 1").collect()
    }
    assert(e1.getMessage.contains("graft catalog"))
    // Non-graft catalog → user error naming the catalog class.
    val e2 = intercept[Exception] {
      spark.sql("DESCRIBE HISTORY spark_catalog.default.nope").collect()
    }
    assert(e2.getMessage.contains("not a graft snapshot catalog"))
    // Restoring to an uncommitted version surfaces the store's error.
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    spark.conf.set("spark.sql.catalog.rh_sqle",
      classOf[graft.sinks.GraftCatalog].getName)
    intercept[Exception] {
      spark.sql(s"RESTORE TABLE rh_sqle.`$root` TO VERSION AS OF 9").collect()
    }
  }
}
