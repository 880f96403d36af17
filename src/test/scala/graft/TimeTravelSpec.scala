package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.{SnapshotSource, SnapshotStore}

/** `TIMESTAMP AS OF` time travel: commit wall-clock recorded as the
  * `#ts` manifest header (monotonic-clamped), surfaced in DESCRIBE
  * HISTORY, and resolved to "latest version at or before" across the
  * DataFrame option, the catalog SQL hook, and RESTORE. */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("timetravel").resolve("t").toString

  private def table(rows: (String, String, Int)*) =
    rows.toDF("product_id", "supplier", "version")

  private def threeVersions(): (String, Seq[Long]) = {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p2", "a", 2)), root,
      "product_id", "version", "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 3)), root,
      "product_id", "version", "supplier")
    val ts = Seq(1L, 2L, 3L).map(v =>
      SnapshotStore.commitTimestamp(spark, root, v).get)
    (root, ts)
  }

  test("commit timestamps are recorded and strictly monotonic") {
    val (root, ts) = threeVersions()
    assert(ts == ts.sorted && ts.distinct == ts,
      s"timestamps must be strictly increasing, got $ts")
    // History surfaces them, ascending with version.
    val h = SnapshotStore.history(spark, root)
      .select(col("version"), col("timestamp").cast("long"))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    assert(h.map(_._2 * 1000) == ts.map(t => t / 1000 * 1000),
      s"history timestamps disagree with headers: $h vs $ts")
  }

  test("timestampAsOf resolves latest-at-or-before; before-first errors; after-last reads tip") {
    val (root, ts) = threeVersions()
    def contentAt(tsOpt: String): Set[(String, Int)] =
      spark.read.format("graft-snapshot")
        .option("timestampAsOf", tsOpt).load(root)
        .select("product_id", "version").as[(String, Int)].collect().toSet
    assert(contentAt(ts(0).toString) == Set(("p1", 1)))
    assert(contentAt(ts(1).toString) == Set(("p1", 1), ("p2", 2)))
    // Between two commits → the earlier one.
    if (ts(2) - ts(1) > 1)
      assert(contentAt((ts(2) - 1).toString) == Set(("p1", 1), ("p2", 2)))
    // At and far after the last commit → tip.
    assert(contentAt(ts(2).toString) == Set(("p1", 3), ("p2", 2)))
    assert(contentAt((ts(2) + 3600_000L).toString) == Set(("p1", 3), ("p2", 2)))
    // Before the first commit: there was no table then.
    val e = intercept[Exception] { contentAt((ts(0) - 1).toString) }
    assert(e.getMessage.contains("before the first commit"), e.getMessage)
    // version and timestampAsOf together are ambiguous.
    intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("version", "1").option("timestampAsOf", ts(0).toString)
        .load(root).collect()
    }
  }

  test("SQL TIMESTAMP AS OF resolves through the catalog hook") {
    val (root, ts) = threeVersions()
    spark.conf.set("spark.sql.catalog.tt_sql",
      classOf[graft.sinks.GraftCatalog].getName)
    val got = spark.sql(
      s"SELECT product_id, version FROM tt_sql.`$root` " +
        s"TIMESTAMP AS OF timestamp_millis(${ts(1)}) ORDER BY product_id")
      .as[(String, Int)].collect().toSeq
    assert(got == Seq(("p1", 1), ("p2", 2)))
    intercept[Exception] {
      spark.sql(s"SELECT * FROM tt_sql.`$root` " +
        s"TIMESTAMP AS OF timestamp_millis(${ts(0) - 1})").collect()
    }
  }

  test("RESTORE TABLE … TO TIMESTAMP AS OF restores the resolved version") {
    val (root, ts) = threeVersions()
    spark.conf.set("spark.sql.catalog.tt_restore",
      classOf[graft.sinks.GraftCatalog].getName)
    val res = spark.sql(
      s"RESTORE TABLE tt_restore.`$root` TO TIMESTAMP AS OF '${ts(1)}'")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(res == Seq((2L, 4L)))
    assert(SnapshotStore.read(spark, root)
      .select("product_id", "version").as[(String, Int)].collect().toSet ==
      Set(("p1", 1), ("p2", 2)))
  }

  test("timestampAsOf parses millis, dates, naive timestamps, and instants") {
    import SnapshotSource.parseTimestampMillis
    assert(parseTimestampMillis("1755000000000") == 1755000000000L)
    assert(parseTimestampMillis("2026-08-14") ==
      java.time.LocalDate.parse("2026-08-14").atStartOfDay()
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    assert(parseTimestampMillis("2026-08-14 09:30:00") ==
      parseTimestampMillis("2026-08-14T09:30:00Z"))
    intercept[IllegalArgumentException] { parseTimestampMillis("next tuesday") }
  }

  test("pre-#ts manifests: recorded versions win, unrecorded resolve as oldest") {
    val (root, ts) = threeVersions()
    // Strip v1's #ts header to simulate a manifest that predates
    // timestamp recording.
    val mf = java.nio.file.Paths.get(root, "manifests", "v_000001.manifest")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.write(mf, java.nio.file.Files.readAllLines(mf)
      .asScala.filterNot(_.startsWith("#ts")).asJava)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, "manifests", ".v_000001.manifest.crc"))
    // A timestamp older than every RECORDED commit resolves to the
    // newest unrecorded version (the table demonstrably existed).
    assert(SnapshotStore.versionAtTimestamp(spark, root, ts(1) - 1) == 1L)
    // Recorded versions still resolve normally.
    assert(SnapshotStore.versionAtTimestamp(spark, root, ts(1)) == 2L)
    assert(SnapshotStore.versionAtTimestamp(spark, root, ts(2) + 10) == 3L)
  }
}
