package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Column DEFAULT values (E142, Delta's `DEFAULT` clause): a column
  * OMITTED from an INSERT column list fills from its recorded
  * constant expression; an explicitly listed NULL stays NULL (SQL
  * semantics); defaults are post-hoc-manageable through the VALIDATED
  * `ALTER COLUMN … SET/DROP DEFAULT` path only, and validation
  * refuses everything that would make inserted values drift
  * (non-constants, query-scoped time, lossy types). */
class DefaultValuesSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("defaults").toString}/t"

  private def create(root: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.sql(s"""CREATE TABLE graft.`$root` (
      k BIGINT,
      status STRING DEFAULT 'new',
      score BIGINT DEFAULT 40 + 2,
      part STRING
    ) USING graft-snapshot PARTITIONED BY (part)""")
  }

  test("omitted DEFAULT columns fill from their expression; listed NULLs stay NULL") {
    val root = freshRoot()
    create(root)
    Seq((1L, "0")).toDF("k", "part").createOrReplaceTempView("def_src1")
    spark.sql(s"INSERT INTO graft.`$root` (k, part) SELECT k, part FROM def_src1")
    val r1 = SnapshotStore.read(spark, root)
      .select("k", "status", "score").collect().head
    assert(r1.getString(1) == "new" && r1.getLong(2) == 42L,
      s"omitted columns must fill from defaults, got $r1")
    // A LISTED column is the caller's value — even NULL.
    Seq((2L, Option.empty[String], "0")).toDF("k", "status", "part")
      .createOrReplaceTempView("def_src2")
    spark.sql(s"INSERT INTO graft.`$root` (k, status, part) " +
      "SELECT k, status, part FROM def_src2")
    val r2 = SnapshotStore.read(spark, root).filter(col("k") === 2)
      .select("status", "score").collect().head
    assert(r2.isNullAt(0), "an explicit NULL must stay NULL")
    assert(r2.getLong(1) == 42L, "the still-omitted column must default")
  }

  test("ALTER COLUMN SET DEFAULT changes FUTURE inserts only; DROP DEFAULT reverts to null-fill") {
    val root = freshRoot()
    create(root)
    Seq((1L, "0")).toDF("k", "part").createOrReplaceTempView("def_alter1")
    spark.sql(s"INSERT INTO graft.`$root` (k, part) SELECT k, part FROM def_alter1")
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN status SET DEFAULT 'held'")
    Seq((2L, "0")).toDF("k", "part").createOrReplaceTempView("def_alter2")
    spark.sql(s"INSERT INTO graft.`$root` (k, part) SELECT k, part FROM def_alter2")
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN status DROP DEFAULT")
    Seq((3L, "0")).toDF("k", "part").createOrReplaceTempView("def_alter3")
    spark.sql(s"INSERT INTO graft.`$root` (k, part) SELECT k, part FROM def_alter3")
    val got = SnapshotStore.read(spark, root).select("k", "status")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("new"), 2L -> Some("held"), 3L -> None),
      s"defaults must apply per-insert-time, got $got")
    // Dropping an absent default is a version no-op.
    val before = SnapshotStore.currentVersion(spark, root)
    spark.sql(s"ALTER TABLE graft.`$root` ALTER COLUMN status DROP DEFAULT")
    assert(SnapshotStore.currentVersion(spark, root) == before)
  }

  test("validation refuses non-constants, column references, lossy types, unknown/partition/auto columns") {
    val root = freshRoot()
    create(root)
    def refuse(sql: String, frag: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains(frag),
        s"expected '$frag' in: ${e.getMessage}")
    }
    refuse(s"ALTER TABLE graft.`$root` ALTER COLUMN status SET DEFAULT rand()",
      "not a constant")
    refuse(s"ALTER TABLE graft.`$root` ALTER COLUMN status SET DEFAULT current_date()",
      "not a constant")
    // SESSION-scoped functions report foldable too (and some resolve
    // to a literal during analysis) — the parsed-name guard catches
    // them.
    refuse(s"ALTER TABLE graft.`$root` ALTER COLUMN status SET DEFAULT current_user()",
      "not a constant")
    refuse(s"ALTER TABLE graft.`$root` ALTER COLUMN status SET DEFAULT current_database()",
      "not a constant")
    refuse(s"ALTER TABLE graft.`$root` ALTER COLUMN status SET DEFAULT k + 1",
      "columns")
    refuse(s"ALTER TABLE graft.`$root` ALTER COLUMN score SET DEFAULT 'abc'",
      "safely")
    refuse(s"ALTER TABLE graft.`$root` ALTER COLUMN nope SET DEFAULT 1",
      "unknown column")
    refuse(s"ALTER TABLE graft.`$root` ALTER COLUMN part SET DEFAULT 'x'",
      "partition column")
    // Generated/identity columns own their fill.
    val root2 = freshRoot()
    spark.sql(s"""CREATE TABLE graft.`$root2` (
      id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, part STRING
    ) USING graft-snapshot PARTITIONED BY (part)""")
    refuse(s"ALTER TABLE graft.`$root2` ALTER COLUMN id SET DEFAULT 7",
      "generated/identity")
    // And a DEFAULT clause at CREATE refuses the same way.
    val e = intercept[Exception](spark.sql(s"""CREATE TABLE graft.`${freshRoot()}` (
      k BIGINT, part STRING DEFAULT 'x'
    ) USING graft-snapshot PARTITIONED BY (part)"""))
    assert(e.getMessage.contains("partition column"), e.getMessage)
  }

  test("raw SET/UNSET TBLPROPERTIES of graft.default.* is refused — the validated ALTER path is the only door") {
    val root = freshRoot()
    create(root)
    val e1 = intercept[IllegalArgumentException](
      SnapshotStore.setProperties(spark, root,
        Seq("graft.default.status" -> "boom(")))
    assert(e1.getMessage.contains("ALTER COLUMN"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      SnapshotStore.unsetProperties(spark, root,
        Seq("graft.default.status")))
    assert(e2.getMessage.contains("ALTER COLUMN"), e2.getMessage)
  }

  test("a DEFAULT follows RENAME COLUMN and dies with DROP COLUMN") {
    val root = freshRoot()
    create(root)
    spark.sql(s"ALTER TABLE graft.`$root` RENAME COLUMN status TO state")
    assert(SnapshotStore.defaultColumnsAt(spark, root,
        SnapshotStore.currentVersion(spark, root).get).toMap
      == Map("state" -> "'new'", "score" -> "40 + 2"),
      "the record must follow the rename")
    Seq((9L, "1")).toDF("k", "part").createOrReplaceTempView("def_ren")
    spark.sql(s"INSERT INTO graft.`$root` (k, part) SELECT k, part FROM def_ren")
    assert(SnapshotStore.read(spark, root).filter(col("k") === 9)
      .select("state").collect().head.getString(0) == "new")
    spark.sql(s"ALTER TABLE graft.`$root` DROP COLUMN state")
    assert(SnapshotStore.defaultColumnsAt(spark, root,
        SnapshotStore.currentVersion(spark, root).get).toMap
      == Map("score" -> "40 + 2"),
      "the record must die with its column")
  }
}
