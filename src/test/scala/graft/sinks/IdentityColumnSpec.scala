package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IDENTITY columns (`GENERATED ALWAYS AS IDENTITY`, Delta's
  * contract, round 15): the table owns the column — INSERTs omit it,
  * the write path allocates contiguous values from the recorded
  * high-water mark, the advanced mark rides the SAME manifest as the
  * data (a crash can never reopen allocated ids), explicit values are
  * refused at the SQL surface, and deletes never cause reuse (the
  * mark is monotone metadata, not derived from data). */
class IdentityColumnSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("identity").toString}/t"

  private def create(root: String, clause: String = ""): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.sql(s"""CREATE TABLE graft.`$root` (
      id BIGINT GENERATED ALWAYS AS IDENTITY$clause,
      k BIGINT, part STRING
    ) USING graft-snapshot PARTITIONED BY (part)""")
  }

  private def src(r: Range): DataFrame =
    r.map(i => (i.toLong, (i % 3).toString)).toDF("k", "part")

  private def ids(root: String): Seq[Long] =
    SnapshotStore.read(spark, root).select("id").collect()
      .map(_.getLong(0)).toSeq.sorted

  test("omitting INSERTs allocate 1..n; the next batch continues; a delete never reopens ids") {
    val root = freshRoot()
    create(root)
    src(0 until 40).createOrReplaceTempView("idsrc")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k, part FROM idsrc")
    assert(ids(root) == (1L to 40L),
      "first batch must allocate exactly 1..40, gap-free")
    src(100 until 125).createOrReplaceTempView("idsrc2")
    spark.sql(s"INSERT INTO graft.`$root` (k, part) SELECT k, part FROM idsrc2")
    assert(ids(root) == (1L to 65L),
      "the second batch must continue contiguously from the mark")
    // Delete the top of the range, then insert: ids must NOT be
    // reused — the mark is monotone metadata.
    SnapshotStore.deleteWhere(spark, root, "id > 60")
    src(200 until 210).createOrReplaceTempView("idsrc3")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k, part FROM idsrc3")
    val after = ids(root)
    assert(after == ((1L to 60L) ++ (66L to 75L)),
      s"deleted ids must never be reallocated, got $after")
  }

  test("START WITH / INCREMENT BY are honored, in either order of allocation math") {
    val root = freshRoot()
    create(root, " (START WITH 100 INCREMENT BY 5)")
    src(0 until 10).createOrReplaceTempView("idsrc_sw")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k, part FROM idsrc_sw")
    assert(ids(root) == (0 until 10).map(i => 100L + 5L * i),
      "allocation must start at START WITH and stride INCREMENT BY")
  }

  test("explicit identity values are refused at the SQL surface — positional and column-list") {
    val root = freshRoot()
    create(root)
    Seq((42L, 1L, "0")).toDF("id", "k", "part")
      .createOrReplaceTempView("idsrc_explicit")
    val e1 = intercept[Exception](spark.sql(
      s"INSERT INTO graft.`$root` SELECT id, k, part FROM idsrc_explicit"))
    assert(e1.getMessage.contains("IDENTITY"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"INSERT INTO graft.`$root` (id, k, part) SELECT id, k, part FROM idsrc_explicit"))
    assert(e2.getMessage.contains("IDENTITY"), e2.getMessage)
  }

  test("merge: matched rows keep their ids, inserted rows get fresh ones — no nulls, no duplicates") {
    val root = freshRoot()
    create(root)
    src(0 until 30).createOrReplaceTempView("idsrc_m")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k, part FROM idsrc_m")
    val idOf5 = SnapshotStore.read(spark, root).filter(col("k") === 5)
      .select("id").collect().head.getLong(0)
    val idOf25 = SnapshotStore.read(spark, root).filter(col("k") === 25)
      .select("id").collect().head.getLong(0)
    // Keyed merge on k: k 20..29 matched (updates), k 30..39 new
    // (inserts), incoming WITHOUT the id column — the union null-fills
    // it and the write path allocates exactly the null slots.
    SnapshotStore.mergeCommitOrdered(spark,
      (20 until 40).map(i => (i.toLong, (i % 3).toString)).toDF("k", "part"),
      root, ColSpec(Seq("k")), Nil, ColSpec(Seq("part")))
    val all = SnapshotStore.read(spark, root)
    assert(all.filter(col("id").isNull).count() == 0,
      "every row must carry an id after the merge")
    val n = all.count()
    assert(all.select("id").distinct().count() == n,
      "merge allocation must never duplicate an id")
    assert(all.filter(col("k") === 5).select("id").collect()
        .head.getLong(0) == idOf5,
      "an untouched row keeps its id")
    assert(all.filter(col("k") === 25).select("id").collect()
        .head.getLong(0) == idOf25,
      "a MATCHED (updated) row inherits its id — Delta's MERGE contract")
    assert(all.filter(col("k") >= 30).select(min(col("id"))).collect()
        .head.getLong(0) > 30,
      "inserted rows allocate above the existing range")
  }

  test("CREATE validation: non-integral type, zero step, identity+generated collision all refuse") {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    val e1 = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`${freshRoot()}` (
        id STRING GENERATED ALWAYS AS IDENTITY, k BIGINT, part STRING
      ) USING graft-snapshot PARTITIONED BY (part)"""))
    assert(e1.getMessage.contains("INT"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"""CREATE TABLE graft.`${freshRoot()}` (
        id BIGINT GENERATED ALWAYS AS IDENTITY (INCREMENT BY 0),
        k BIGINT, part STRING
      ) USING graft-snapshot PARTITIONED BY (part)"""))
    assert(e2.getMessage.contains("non-zero"), e2.getMessage)
  }

  test("the identity mark cannot be set post-hoc via SET TBLPROPERTIES") {
    val root = freshRoot()
    create(root)
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.setProperties(spark, root, Seq(
        s"${SnapshotStore.IdentityPropPrefix}id" ->
          "start=1;step=1;last=0;type=BIGINT"))
    }
    assert(e.getMessage.contains("CREATE TABLE metadata"), e.getMessage)
  }

  test("every other DML surface refuses explicit identity values too — UPDATE, DV UPDATE, MERGE source/SET, UNSET, RENAME, DROP") {
    val root = freshRoot()
    create(root)
    src(0 until 20).createOrReplaceTempView("idsrc_guard")
    spark.sql(s"INSERT INTO graft.`$root` SELECT k, part FROM idsrc_guard")
    // UPDATE SET id — copy-on-write and merge-on-read paths.
    val e1 = intercept[Exception](SnapshotStore.updateWhere(spark, root,
      Seq("id" -> "42"), Some("k = 3")))
    assert(e1.getMessage.contains("allocator-owned"), e1.getMessage)
    val e2 = intercept[Exception](SnapshotStore.updateWhereDv(spark, root,
      Seq("id" -> "42"), Some("k = 3")))
    assert(e2.getMessage.contains("allocator-owned"), e2.getMessage)
    // MERGE with a source CARRYING the column (would flow through
    // SET * / INSERT *), and an explicit SET targeting it.
    Seq((99L, 3L, "0")).toDF("id", "k", "part")
      .createOrReplaceTempView("idsrc_carry")
    val e3 = intercept[Exception](spark.sql(
      s"MERGE INTO graft.`$root` USING idsrc_carry ON k = k " +
        "WHEN MATCHED THEN UPDATE SET *"))
    assert(e3.getMessage.contains("allocator-owned") ||
      e3.getMessage.contains("identity"), e3.getMessage)
    Seq((3L, "0")).toDF("k", "part").createOrReplaceTempView("idsrc_clean")
    val e4 = intercept[Exception](spark.sql(
      s"MERGE INTO graft.`$root` t USING idsrc_clean s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET id = 42"))
    assert(e4.getMessage.contains("allocator-owned"), e4.getMessage)
    // The record is CREATE TABLE metadata end to end.
    val e5 = intercept[Exception](SnapshotStore.unsetProperties(spark, root,
      Seq(s"${SnapshotStore.IdentityPropPrefix}id")))
    assert(e5.getMessage.contains("cannot be UNSET"), e5.getMessage)
    val e6 = intercept[Exception](
      SnapshotStore.renameColumn(spark, root, "id", "oid"))
    assert(e6.getMessage.contains("identity"), e6.getMessage)
    val e7 = intercept[Exception](SnapshotStore.dropColumn(spark, root, "id"))
    assert(e7.getMessage.contains("identity"), e7.getMessage)
  }

  test("a NON-EMPTY create (CTAS shape) allocates version 1's own rows and records the advanced mark") {
    val root = freshRoot()
    val df = src(0 until 25)
      .withColumn("id", lit(null).cast("bigint"))
      .select(col("id"), col("k"), col("part"))
    val v = SnapshotStore.commitIfAbsent(spark, df, root, ColSpec(Seq("part")),
      identity = Seq(("id", 1L, 1L)))
    assert(v.contains(1L))
    assert(ids(root) == (1L to 25L),
      "v1's own rows must be allocated — the property lands in the " +
        "same manifest, after the data exists")
    // And the next batch continues from the recorded mark.
    src(100 until 110).createOrReplaceTempView("idsrc_ctas2")
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.sql(s"INSERT INTO graft.`$root` SELECT k, part FROM idsrc_ctas2")
    assert(ids(root) == (1L to 35L))
  }

  test("a garbled identity record fails loudly, never null-fills or re-allocates") {
    import org.apache.spark.sql.types._
    val garbled = Map(s"${SnapshotStore.IdentityPropPrefix}id" -> "start=1;stp=?")
    val e = intercept[IllegalStateException](
      SnapshotStore.identityColumns(garbled))
    assert(e.getMessage.contains("garbled"), e.getMessage)
  }
}
