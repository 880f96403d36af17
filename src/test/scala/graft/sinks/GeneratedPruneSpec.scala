package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Derived partition predicates from GENERATED columns (round 15):
  * `ts >= X` rewrites onto a monotone generated partition column
  * (`yr >= E(X)`) at the file-listing level — the pruning that
  * survives stats-opaque physical types (INT96 timestamps, which the
  * sidecar refuses). Non-monotone or multi-input expressions refuse
  * the rewrite: deriving through `month(ts)` would wrongly skip
  * files. */
class GeneratedPruneSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("genprune").toString}/t"

  /** Three years of hourly-ish events, committed with the generated
    * `yr` property recorded — TIMESTAMPS WRITTEN AS INT96 (Spark's
    * default), so the sidecar carries NO ev_ts stats and any pruning
    * must come from the derived predicate. */
  private def seed(root: String): Unit = {
    // Force INT96 (Spark's default, but another spec in the shared
    // session may have switched to MICROS) — the whole point is a
    // stats-opaque input column.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    val df = (0 until 3000).map { i =>
      (java.sql.Timestamp.valueOf(f"${2020 + i % 3}-0${i % 9 + 1}-1${i % 3} 0${i % 9}:00:00"),
        i.toLong, i * 1.5)
    }.toDF("ev_ts", "k", "v")
      .withColumn("yr", date_trunc("YEAR", col("ev_ts")).cast("date"))
    SnapshotStore.commit(spark, df, root, "yr")
    SnapshotStore.setProperties(spark, root, Seq(
      s"${SnapshotStore.GeneratedPropPrefix}yr" ->
        "CAST(date_trunc('YEAR', ev_ts) AS DATE)"))
  }

  test("a ts-range predicate prunes via the derived yr bound on an INT96 table — footer stats provably absent") {
    val root = freshRoot()
    seed(root)
    val (df, idx) = SnapshotStore.tableWithIndex(spark, root)
    assert(idx.statsEntries.get.forall(!_.cols.contains("ev_ts")),
      "fixture must be stats-opaque on ev_ts (INT96) — otherwise this " +
        "spec proves nothing")
    val slice = df.filter(col("ev_ts") >= lit("2021-01-01").cast("timestamp") &&
      col("ev_ts") < lit("2022-01-01").cast("timestamp"))
    val n = slice.count()
    assert(n == 1000, s"one year of three must match, got $n")
    assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
      s"the derived yr predicate must prune: " +
        s"${idx.lastCandidateFiles}/${idx.totalFiles}")
    // Values identical to the unpruned read of the same predicate.
    val all = SnapshotStore.read(spark, root)
      .filter(col("ev_ts") >= lit("2021-01-01").cast("timestamp") &&
        col("ev_ts") < lit("2022-01-01").cast("timestamp")).count()
    assert(all == n)
  }

  test("ts equality derives yr equality — a point lookup opens one year's files") {
    val root = freshRoot()
    seed(root)
    val (df, idx) = SnapshotStore.tableWithIndex(spark, root)
    val probe = df.filter(col("ev_ts") ===
      lit("2022-05-12 03:00:00").cast("timestamp"))
    probe.count()
    assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
      s"equality must derive: ${idx.lastCandidateFiles}/${idx.totalFiles}")
  }

  test("non-monotone generation (month) refuses the rewrite — all files kept, never wrong skipping") {
    val root = freshRoot()
    val df = (0 until 600).map { i =>
      (java.sql.Timestamp.valueOf(f"${2020 + i % 3}-0${i % 9 + 1}-10 00:00:00"),
        i.toLong)
    }.toDF("ev_ts", "k")
      .withColumn("mo", month(col("ev_ts")))
    SnapshotStore.commit(spark, df, root, "mo")
    SnapshotStore.setProperties(spark, root, Seq(
      s"${SnapshotStore.GeneratedPropPrefix}mo" -> "month(ev_ts)"))
    val (t, idx) = SnapshotStore.tableWithIndex(spark, root)
    t.filter(col("ev_ts") >= lit("2022-01-01").cast("timestamp")).count()
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "month(ts) is not monotone in ts — the rewrite must refuse " +
        s"(kept ${idx.lastCandidateFiles}/${idx.totalFiles})")
  }

  test("deriver construction refuses multi-input, non-monotone, unresolvable, and nondeterministic expressions") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ev_ts", TimestampType), StructField("k", LongType),
      StructField("yr", DateType), StructField("mo", IntegerType),
      StructField("s", LongType)))
    def derive(gens: (String, String)*) =
      FileStats.generatedDerivers(spark, gens.toSeq, schema)
    assert(derive("yr" -> "CAST(date_trunc('YEAR', ev_ts) AS DATE)").size == 1)
    assert(derive("yr" -> "CAST(ev_ts AS DATE)").size == 1)
    assert(derive("mo" -> "month(ev_ts)").isEmpty, "non-monotone")
    assert(derive("s" -> "k + year(ev_ts)").isEmpty, "multi-input")
    assert(derive("s" -> "k * -1").isEmpty, "sign flip is not whitelisted")
    assert(derive("yr" -> "CAST(date_trunc('YEAR', gone) AS DATE)").isEmpty,
      "unresolvable input (renamed away) must shed the deriver")
    assert(derive("gone" -> "CAST(ev_ts AS DATE)").isEmpty,
      "generated column absent from the physical schema must shed")
  }

  test("UPDATE that SETs a generation input refreshes the generated column instead of tripping its CHECK") {
    val root = freshRoot()
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.sql(s"""CREATE TABLE graft.`$root` (
      ev_ts TIMESTAMP, k BIGINT,
      day DATE GENERATED ALWAYS AS (CAST(ev_ts AS DATE))
    ) USING graft-snapshot PARTITIONED BY (day)""")
    (0 until 20).map(i => (java.sql.Timestamp.valueOf(
        s"2024-03-0${i % 3 + 1} 08:00:00"), i.toLong))
      .toDF("ev_ts", "k").createOrReplaceTempView("gp_src")
    spark.sql(s"INSERT INTO graft.`$root` SELECT ev_ts, k FROM gp_src")
    // Copy-on-write UPDATE: move k=5's timestamp a month — day must
    // follow, and the row must land in its NEW partition.
    SnapshotStore.updateWhere(spark, root,
      Seq("ev_ts" -> "TIMESTAMP '2024-04-07 09:00:00'"), Some("k = 5"))
    val got = SnapshotStore.table(spark, root).filter(col("k") === 5)
      .select(col("day").cast("string")).collect()
    assert(got.map(_.getString(0)).toSeq == Seq("2024-04-07"),
      s"day must be recomputed from the new ev_ts, got ${got.toSeq}")
    assert(spark.sql(s"SHOW PARTITIONS graft.`$root`").collect()
      .map(_.getString(0)).exists(_.contains("2024-04-07")),
      "the updated row must route to its new partition")
    // Merge-on-read (DV) UPDATE: same contract.
    SnapshotStore.updateWhereDv(spark, root,
      Seq("ev_ts" -> "TIMESTAMP '2024-05-09 10:00:00'"), Some("k = 7"))
    val got2 = SnapshotStore.table(spark, root).filter(col("k") === 7)
      .select(col("day").cast("string")).collect()
    assert(got2.map(_.getString(0)).toSeq == Seq("2024-05-09"),
      s"DV update must recompute day too, got ${got2.toSeq}")
    // An explicit contradictory SET of the generated column itself is
    // still refused — recomputation never overrides the caller's claim.
    val e = intercept[Exception](SnapshotStore.updateWhere(spark, root,
      Seq("day" -> "DATE '1999-01-01'"), Some("k = 3")))
    assert(e.getMessage.contains("gen_day"), e.getMessage)
  }
}
