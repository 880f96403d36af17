package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `INSERT OVERWRITE` + [[SnapshotStore.replaceWhere]] (E143): the
  * versioned overwrite family — full, static-partition, dynamic
  * partitions, and arbitrary-predicate replacement — each ONE atomic
  * commit with untouched partitions carried by reference and the old
  * state time-travelable. */
class InsertOverwriteSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("overwrite").toString}/t"

  private def rows(r: Range, partOf: Int => Int = _ % 4): DataFrame =
    r.map(i => (i.toLong, i * 10L, partOf(i).toString)).toDF("k", "v", "part")

  private def seed(root: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    SnapshotStore.commit(spark, rows(0 until 400), root, "part")
  }

  test("full INSERT OVERWRITE publishes a complete new version; the old one stays time-travelable") {
    val root = freshRoot()
    seed(root)
    rows(1000 until 1020).createOrReplaceTempView("ow_full")
    spark.sql(s"INSERT OVERWRITE TABLE graft.`$root` SELECT k, v, part FROM ow_full")
    val now = SnapshotStore.read(spark, root).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(now == (1000L until 1020L),
      s"the table must hold exactly the new rows, got ${now.size}")
    assert(SnapshotStore.readVersion(spark, root, 1).count() == 400,
      "the overwritten state must stay time-travelable")
  }

  test("static PARTITION overwrite replaces exactly the named partition; others carry BY REFERENCE") {
    val root = freshRoot()
    seed(root)
    val before = SnapshotStore.manifest(spark, root, 1)
      .filterNot(_.partition == "1").map(_.path).toSet
    // The query omits the partition column — the clause supplies it.
    rows(2000 until 2010).select(col("k"), col("v"))
      .createOrReplaceTempView("ow_static")
    spark.sql(s"INSERT OVERWRITE graft.`$root` PARTITION (part = '1') " +
      "SELECT k, v FROM ow_static")
    val cur = SnapshotStore.currentVersion(spark, root).get
    val after = SnapshotStore.manifest(spark, root, cur)
    assert(after.filterNot(_.partition == "1").map(_.path).toSet == before,
      "untouched partitions must carry byte-identical file references")
    val p1 = SnapshotStore.read(spark, root).filter(col("part") === "1")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    assert(p1 == (2000L until 2010L),
      s"partition 1 must hold exactly the new rows, got $p1")
    assert(SnapshotStore.read(spark, root).count() == 300 + 10,
      "the other partitions' rows must survive untouched")
  }

  test("dynamic PARTITION overwrite replaces only the partitions present in the output") {
    val root = freshRoot()
    seed(root)
    // Output lands wholly in partitions 2 and 3.
    rows(3000 until 3040, i => 2 + (i % 2)).createOrReplaceTempView("ow_dyn")
    spark.sql(s"INSERT OVERWRITE graft.`$root` PARTITION (part) " +
      "SELECT k, v, part FROM ow_dyn")
    val got = SnapshotStore.read(spark, root)
      .groupBy(col("part")).agg(count(lit(1)).as("n"), min(col("k")).as("mn"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("0")._1 == 100 && got("0")._2 < 1000,
      "partition 0 must keep its original rows")
    assert(got("1")._1 == 100 && got("1")._2 < 1000)
    assert(got("2") == (20L, 3000L) && got("3") == (20L, 3001L),
      s"partitions 2/3 must hold exactly the new rows, got $got")
  }

  test("replaceWhere: an arbitrary predicate replaces matching rows, survivors and untouched partitions kept") {
    val root = freshRoot()
    seed(root)
    // Replace the top half of partition '2' only.
    val incoming = rows(5000 until 5005, _ => 2)
      .withColumn("v", lit(777L))
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.replaceWhere(spark, root,
        incoming.withColumn("part", lit("3")), "part = '2' AND k >= 200")
    }
    assert(e.getMessage.contains("does not satisfy"),
      "an out-of-scope incoming row must refuse loudly: " + e.getMessage)
    SnapshotStore.replaceWhere(spark, root, incoming,
      "part = '2' AND k >= 200")
    val p2 = SnapshotStore.read(spark, root).filter(col("part") === "2")
      .select("k").collect().map(_.getLong(0)).sorted.toSeq
    // Original partition 2 = k % 4 == 2 of 0..399: survivors k < 200,
    // plus the five new rows.
    val survivors = (0 until 200).filter(_ % 4 == 2).map(_.toLong)
    assert(p2 == (survivors ++ (5000L until 5005L)),
      s"predicate-true rows replaced, survivors kept: got ${p2.take(10)}…")
    assert(SnapshotStore.read(spark, root)
      .filter(col("part") =!= "2").count() == 300,
      "other partitions untouched")
  }

  test("a positional query cannot smuggle the PARTITION clause's column — full arity refuses instead of clobbering") {
    // `PARTITION (part = '1') SELECT k, v, part` would positionally
    // map the query's part values and then silently overwrite them
    // with '1', re-routing every row. Refuse the arity (Spark does).
    val root = freshRoot()
    seed(root)
    rows(0 until 5).createOrReplaceTempView("ow_smuggle")
    val e = intercept[Exception](spark.sql(
      s"INSERT OVERWRITE graft.`$root` PARTITION (part = '1') " +
        "SELECT k, v, part FROM ow_smuggle"))
    assert(e.getMessage.contains("PARTITION"), e.getMessage)
  }

  test("dynamic overwrite on a GENERATED partition column computes the routing inside the primitive") {
    val root = freshRoot()
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.sql(s"""CREATE TABLE graft.`$root` (
      k BIGINT, tag STRING,
      grp STRING GENERATED ALWAYS AS (substring(tag, 1, 1))
    ) USING graft-snapshot PARTITIONED BY (grp)""")
    Seq((1L, "alpha"), (2L, "beta")).toDF("k", "tag")
      .createOrReplaceTempView("ow_gen1")
    spark.sql(s"INSERT INTO graft.`$root` (k, tag) SELECT k, tag FROM ow_gen1")
    // Dynamic overwrite whose output lands only in grp='a': the
    // generated column is OMITTED (computed at write), so the
    // partition set must be derived after generation, not before.
    Seq((10L, "apex"), (11L, "axiom")).toDF("k", "tag")
      .createOrReplaceTempView("ow_gen2")
    spark.sql(s"INSERT OVERWRITE graft.`$root` PARTITION (grp) " +
      "(k, tag) SELECT k, tag FROM ow_gen2")
    val got = SnapshotStore.read(spark, root).select("k", "grp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((10L, "a"), (11L, "a"), (2L, "b")),
      s"grp='a' replaced, grp='b' carried, got $got")
  }

  test("a static value containing a comma inside double quotes stays one spec entry") {
    val root = freshRoot()
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    SnapshotStore.commit(spark,
      Seq((1L, "x,y"), (2L, "z")).toDF("k", "part"), root, "part")
    Seq(5L, 6L).toDF("k").createOrReplaceTempView("ow_comma")
    spark.sql(s"""INSERT OVERWRITE graft.`$root` PARTITION (part = "x,y") """ +
      "(k) SELECT k FROM ow_comma")
    val got = SnapshotStore.read(spark, root).select("k", "part")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((5L, "x,y"), (6L, "x,y"), (2L, "z")),
      s"the quoted comma value must scope the overwrite, got $got")
  }

  test("alignment composes: DEFAULT fill + column list under a static PARTITION; clause/list double-listing refuses") {
    val root = freshRoot()
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.sql(s"""CREATE TABLE graft.`$root` (
      k BIGINT, status STRING DEFAULT 'new', part STRING
    ) USING graft-snapshot PARTITIONED BY (part)""")
    Seq(1L, 2L).toDF("k").createOrReplaceTempView("ow_def")
    spark.sql(s"INSERT OVERWRITE graft.`$root` PARTITION (part = 'a') " +
      "(k) SELECT k FROM ow_def")
    val got = SnapshotStore.read(spark, root)
      .select("k", "status", "part").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "new", "a"), (2L, "new", "a")),
      s"defaults must fill and the static value must route, got $got")
    val e = intercept[Exception](spark.sql(
      s"INSERT OVERWRITE graft.`$root` PARTITION (part = 'a') " +
        "(k, part) SELECT k, 'b' FROM ow_def"))
    assert(e.getMessage.contains("provide it once"), e.getMessage)
  }
}
