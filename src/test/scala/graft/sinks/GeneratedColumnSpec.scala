package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Generated partition columns (E131, Delta's `GENERATED ALWAYS AS`):
  * CREATE TABLE records the expression (`graft.generated.<col>`
  * property + an auto gen_ CHECK), every content write computes an
  * ABSENT generated column before partition routing, and explicit
  * values that contradict the expression are refused by the existing
  * constraint machinery. */
class GeneratedColumnSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("gencol").toString}/t"

  private def create(root: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    spark.sql(s"""CREATE TABLE graft.`$root` (
      ev_ts TIMESTAMP, k BIGINT, v DOUBLE,
      day DATE GENERATED ALWAYS AS (CAST(ev_ts AS DATE))
    ) USING graft-snapshot PARTITIONED BY (day)""")
  }

  private def batch(r: Range) =
    r.map(i => (java.sql.Timestamp.valueOf(
        s"2024-01-0${i % 3 + 1} 0${i % 9}:00:00"), i.toLong, i * 1.5))
      .toDF("ev_ts", "k", "v")

  test("DDL records the expression; an omitting INSERT populates the column and routes partitions") {
    val root = freshRoot()
    create(root)
    assert(SnapshotStore.generatedColumnsAt(spark, root, 1L) ==
      Seq("day" -> "CAST(ev_ts AS DATE)"))
    batch(0 until 30).createOrReplaceTempView("gc_src")
    // Positional INSERT minus the generated column.
    spark.sql(s"INSERT INTO graft.`$root` SELECT ev_ts, k, v FROM gc_src")
    val got = SnapshotStore.table(spark, root)
    assert(got.count() == 30)
    assert(got.filter(col("day") =!= col("ev_ts").cast("date")).count() == 0,
      "every computed day must equal its expression")
    // Partition routing used the computed value: 3 distinct days.
    val parts = spark.sql(s"SHOW PARTITIONS graft.`$root`").collect()
    assert(parts.length == 3, s"expected 3 day partitions, got ${parts.toSeq}")
  }

  test("the DataFrame write path computes it too; explicit CORRECT values pass") {
    val root = freshRoot()
    create(root)
    SnapshotStore.appendCommit(spark, batch(0 until 20), root,
      ColSpec(Seq("day")))
    assert(SnapshotStore.table(spark, root).count() == 20)
    // Explicit matching values are accepted (the CHECK judges them).
    SnapshotStore.appendCommit(spark,
      batch(20 until 25).withColumn("day", col("ev_ts").cast("date")),
      root, ColSpec(Seq("day")))
    assert(SnapshotStore.table(spark, root).count() == 25)
  }

  test("explicit values contradicting the expression are REFUSED — never silently stored") {
    val root = freshRoot()
    create(root)
    val e = intercept[IllegalStateException](
      SnapshotStore.appendCommit(spark,
        batch(0 until 5).withColumn("day", lit("1999-01-01").cast("date")),
        root, ColSpec(Seq("day"))))
    assert(e.getMessage.contains("gen_day"), e.getMessage)
    // A null explicit value is a contradiction too (<=> semantics),
    // not a pass-through like ordinary CHECK nulls.
    val e2 = intercept[IllegalStateException](
      SnapshotStore.appendCommit(spark,
        batch(0 until 5).withColumn("day", lit(null).cast("date")),
        root, ColSpec(Seq("day"))))
    assert(e2.getMessage.contains("gen_day"))
  }

  test("column-list INSERT may omit a GENERATED partition column — and only a generated one") {
    val root = freshRoot()
    create(root)
    batch(0 until 10).createOrReplaceTempView("gc_src2")
    spark.sql(
      s"INSERT INTO graft.`$root` (ev_ts, k, v) SELECT ev_ts, k, v FROM gc_src2")
    assert(SnapshotStore.table(spark, root)
      .filter(col("day").isNull).count() == 0,
      "an omitted generated column must be computed, not null-filled")
  }

  test("a nondeterministic or non-resolving or type-mismatched expression refuses at CREATE") {
    spark.conf.set("spark.sql.catalog.graft",
      classOf[GraftCatalog].getName)
    val bad1 = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`${freshRoot()}` (k BIGINT,
        r DOUBLE GENERATED ALWAYS AS (rand())
      ) USING graft-snapshot PARTITIONED BY (k)"""))
    assert(bad1.getMessage.contains("nondeterministic"))
    val bad2 = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`${freshRoot()}` (k BIGINT,
        d DATE GENERATED ALWAYS AS (CAST(no_such AS DATE))
      ) USING graft-snapshot PARTITIONED BY (d)"""))
    assert(bad2.getMessage.contains("does not resolve"))
    val bad3 = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`${freshRoot()}` (ts TIMESTAMP,
        d DATE GENERATED ALWAYS AS (ts)
      ) USING graft-snapshot PARTITIONED BY (d)"""))
    assert(bad3.getMessage.contains("declared"))
    // A generated column referencing ANOTHER generated column would
    // pass a full-schema probe and then brick every omitting write
    // (the fold computes each independently) — refused at CREATE.
    val bad4 = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`${freshRoot()}` (ts TIMESTAMP,
        a DATE GENERATED ALWAYS AS (CAST(date_trunc('YEAR', z) AS DATE)),
        z DATE GENERATED ALWAYS AS (CAST(ts AS DATE))
      ) USING graft-snapshot PARTITIONED BY (a)"""))
    assert(bad4.getMessage.contains("non-generated"), bad4.getMessage)
    // current_date() reports deterministic but freezes per QUERY —
    // the CHECK probe and the write materialization are separate
    // queries, so it must refuse like nondeterminism does.
    val bad5 = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`${freshRoot()}` (k BIGINT,
        d DATE GENERATED ALWAYS AS (current_date())
      ) USING graft-snapshot PARTITIONED BY (d)"""))
    assert(bad5.getMessage.contains("query-scoped"), bad5.getMessage)
  }

  test("merge/upsert paths compute it as well — one mechanism, every content write") {
    val root = freshRoot()
    create(root)
    SnapshotStore.appendCommit(spark, batch(0 until 10), root,
      ColSpec(Seq("day")))
    // Keyed upsert with the column absent from the batch.
    SnapshotStore.upsertDeleteCommit(spark, root,
      batch(5 until 15), None, "k", "day")
    val got = SnapshotStore.table(spark, root)
    assert(got.count() == 15)
    assert(got.filter(col("day") =!= col("ev_ts").cast("date")).count() == 0)
  }
}
