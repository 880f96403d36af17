package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Derived partition predicates from GENERATED columns (round 15):
  * `ts >= X` rewrites onto a monotone generated partition column
  * (`yr >= E(X)`) at the file-listing level — the pruning that
  * survives stats-opaque physical types (INT96 timestamps, which the
  * sidecar refuses). Non-monotone or multi-input expressions refuse
  * the rewrite (deriving through `month(ts)` would wrongly skip
  * files), and ZONE-DEPENDENT expressions derive only under the
  * recorded fixed-offset creation zone — `cast(ts as date)` floors to
  * the SESSION's local day, so a reader in another zone (or any DST
  * zone) would compute bounds the stored values never satisfied. */
class GeneratedPruneSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("genprune").toString}/t"

  /** Three years of hourly-ish events committed through the DDL
    * surface (the ONLY way to record a generation expression — the
    * post-hoc property path is refused, see the last test), written
    * as INT96 (Spark's default), so the sidecar carries NO ev_ts
    * stats and any pruning must come from the derived predicate. */
  private def seed(root: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.sql(s"""CREATE TABLE graft.`$root` (
      ev_ts TIMESTAMP, k BIGINT, v DOUBLE,
      yr DATE GENERATED ALWAYS AS (CAST(date_trunc('YEAR', ev_ts) AS DATE))
    ) USING graft-snapshot PARTITIONED BY (yr)""")
    (0 until 3000).map { i =>
      (java.sql.Timestamp.valueOf(f"${2020 + i % 3}-0${i % 9 + 1}-1${i % 3} 0${i % 9}:00:00"),
        i.toLong, i * 1.5)
    }.toDF("ev_ts", "k", "v").createOrReplaceTempView("genprune_src")
    // Force INT96 (Spark's default, but another spec in the shared
    // session may have switched to MICROS) — the whole point is a
    // stats-opaque input column. Restored after the write: this is
    // shared-session config.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
    try spark.sql(
      s"INSERT INTO graft.`$root` SELECT ev_ts, k, v FROM genprune_src")
    finally spark.conf.unset("spark.sql.parquet.outputTimestampType")
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

  test("a reader in a DIFFERENT session zone sheds the zone-dependent deriver — all files, never wrong skipping") {
    val root = freshRoot()
    seed(root) // recorded creation zone: UTC (the suite session)
    // The zone gate lives at deriver-BUILD time (the expression's
    // evaluation zone is baked when the index analyzes it): a plan
    // built under Tokyo would evaluate E with Tokyo day boundaries
    // against UTC-floored stored values, so the build must shed. (An
    // index built under the recorded zone stays sound under any later
    // query-time zone — both the stored column and the derived bound
    // use the baked zone over instants.)
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      val (df, idx) = SnapshotStore.tableWithIndex(spark, root)
      df.filter(col("ev_ts") >= lit("2021-06-01").cast("timestamp")).count()
      assert(idx.lastCandidateFiles == idx.totalFiles,
        "cast(ts as date) floors to the SESSION's local day — a Tokyo-" +
          "built plan over a UTC-written layout must not derive: " +
          s"${idx.lastCandidateFiles}/${idx.totalFiles}")
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
  }

  test("a content write from a mismatched session zone is REFUSED before any file lands") {
    val root = freshRoot()
    seed(root)
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    try {
      val e = intercept[IllegalArgumentException] {
        SnapshotStore.appendCommit(spark,
          Seq((java.sql.Timestamp.valueOf("2022-06-01 10:00:00"), 9999L, 1.0))
            .toDF("ev_ts", "k", "v"), root, "yr")
      }
      assert(e.getMessage.contains("timeZone"), e.getMessage)
    } finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Back in the recorded zone, the same append lands.
    SnapshotStore.appendCommit(spark,
      Seq((java.sql.Timestamp.valueOf("2022-06-01 10:00:00"), 9999L, 1.0))
        .toDF("ev_ts", "k", "v"), root, "yr")
    assert(SnapshotStore.read(spark, root).filter(col("k") === 9999L)
      .select(col("yr").cast("string")).collect()
      .map(_.getString(0)).toSeq == Seq("2022-01-01"))
  }

  test("integral-widening casts on the predicate side unwrap and derive; chrono and overflowing ones refuse") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.sources
    import org.apache.spark.sql.types._
    // Deriver for g = CAST(i AS BIGINT) over an INT input — the shape
    // type coercion leaves when an INT column meets a LONG literal:
    // the predicate arrives as `cast(i AS BIGINT) >= 3000L`, which
    // the bare attr-vs-literal match alone would never fire on.
    val attr = AttributeReference("i", IntegerType)()
    val d = FileStats.GeneratedDeriver("g", "i", IntegerType,
      Cast(attr, LongType))
    def p(e: Expression) = FileStats.deriveGenerated(Seq(e), Seq(d))
    assert(p(GreaterThanOrEqual(Cast(attr, LongType), Literal(3000L)))
        == Seq(sources.GreaterThanOrEqual("g", 3000L)),
      "a widened >= must unwrap and derive")
    // Strict bound keeps the one-unit tightening discipline — in the
    // NARROWED (input) domain: i < 3000L ⟺ i <= 2999.
    assert(p(LessThan(Cast(attr, LongType), Literal(3000L)))
        == Seq(sources.LessThanOrEqual("g", 2999L)),
      "a widened strict < must tighten in the input domain")
    p(In(Cast(attr, LongType), Seq(Literal(5L), Literal(9L)))) match {
      case Seq(sources.In("g", vs)) => assert(vs.toSeq == Seq(5L, 9L),
        s"a widened In must derive the narrowed values, got ${vs.toSeq}")
      case other => fail(s"a widened In must unwrap and derive, got $other")
    }
    // A literal outside the input domain refuses (no derivation, the
    // conservative boundary).
    assert(p(GreaterThanOrEqual(Cast(attr, LongType),
        Literal(Long.MaxValue))).isEmpty,
      "an overflowing literal must refuse")
    // A chrono cast stays wrapped — inverting it would bake the
    // session zone into a planning-time rewrite.
    val ts = AttributeReference("ev", TimestampType)()
    val dts = FileStats.GeneratedDeriver("g2", "ev", TimestampType,
      Cast(ts, DateType))
    assert(FileStats.deriveGenerated(
        Seq(GreaterThanOrEqual(Cast(ts, DateType), Literal(18000, DateType))),
        Seq(dts)).isEmpty,
      "a chrono predicate-side cast must refuse the unwrap")
  }

  test("non-monotone generation (month) refuses the rewrite — all files kept, never wrong skipping") {
    val root = freshRoot()
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.sql(s"""CREATE TABLE graft.`$root` (
      ev_ts TIMESTAMP, k BIGINT,
      mo INT GENERATED ALWAYS AS (month(ev_ts))
    ) USING graft-snapshot PARTITIONED BY (mo)""")
    (0 until 600).map { i =>
      (java.sql.Timestamp.valueOf(f"${2020 + i % 3}-0${i % 9 + 1}-10 00:00:00"),
        i.toLong)
    }.toDF("ev_ts", "k").createOrReplaceTempView("genprune_mo")
    spark.sql(s"INSERT INTO graft.`$root` SELECT ev_ts, k FROM genprune_mo")
    val (t, idx) = SnapshotStore.tableWithIndex(spark, root)
    t.filter(col("ev_ts") >= lit("2022-01-01").cast("timestamp")).count()
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "month(ts) is not monotone in ts — the rewrite must refuse " +
        s"(kept ${idx.lastCandidateFiles}/${idx.totalFiles})")
  }

  test("deriver construction refuses multi-input, non-monotone, unresolvable, zone-unsound, and nondeterministic expressions") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ev_ts", TimestampType), StructField("k", LongType),
      StructField("yr", DateType), StructField("mo", IntegerType),
      StructField("s", LongType)))
    def derive(tz: Option[String], gens: (String, String)*) =
      FileStats.generatedDerivers(spark, gens.toSeq, schema, tz)
    val utc = Some("UTC")
    assert(derive(utc, "yr" -> "CAST(date_trunc('YEAR', ev_ts) AS DATE)").size == 1)
    assert(derive(utc, "yr" -> "CAST(ev_ts AS DATE)").size == 1)
    assert(derive(utc, "mo" -> "month(ev_ts)").isEmpty, "non-monotone")
    assert(derive(utc, "s" -> "k + year(ev_ts)").isEmpty, "multi-input")
    assert(derive(utc, "s" -> "k * -1").isEmpty, "sign flip is not whitelisted")
    assert(derive(utc, "yr" -> "CAST(date_trunc('YEAR', gone) AS DATE)").isEmpty,
      "unresolvable input (renamed away) must shed the deriver")
    assert(derive(utc, "gone" -> "CAST(ev_ts AS DATE)").isEmpty,
      "generated column absent from the physical schema must shed")
    // Zone soundness: a zone-dependent expression needs the recorded
    // zone to MATCH the session's (UTC here) and be fixed-offset.
    assert(derive(None, "yr" -> "CAST(ev_ts AS DATE)").isEmpty,
      "no recorded creation zone (pre-existing table) must shed")
    assert(derive(Some("Asia/Tokyo"), "yr" -> "CAST(ev_ts AS DATE)").isEmpty,
      "recorded zone != session zone must shed")
    // A DST zone is unsound even when recorded == session: fall-back
    // across midnight makes instant→local-date non-monotone.
    spark.conf.set("spark.sql.session.timeZone", "America/Sao_Paulo")
    try assert(derive(Some("America/Sao_Paulo"),
        "yr" -> "CAST(ev_ts AS DATE)").isEmpty,
      "a non-fixed-offset zone must shed even when consistent")
    finally spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Zone-FREE expressions derive regardless of the record.
    assert(derive(None, "s" -> "CAST(k AS BIGINT)").size == 1,
      "integral chains are zone-free — no record needed")
  }

  test("generation expressions cannot be attached post-hoc via SET TBLPROPERTIES") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      (0 until 100).map(i => (i.toLong, (i % 4).toString)).toDF("k", "part"),
      root, "part")
    // The rows above were never validated against any expression —
    // attaching one now would make derived pruning trust a lie.
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.setProperties(spark, root, Seq(
        s"${SnapshotStore.GeneratedPropPrefix}part" -> "CAST(k % 4 AS STRING)"))
    }
    assert(e.getMessage.contains("CREATE TABLE metadata"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      SnapshotStore.setProperties(spark, root, Seq(
        SnapshotStore.GeneratedTzProp -> "UTC"))
    }
    assert(e2.getMessage.contains("CREATE TABLE metadata"), e2.getMessage)
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
