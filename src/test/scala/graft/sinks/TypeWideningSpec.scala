package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Type widening on merge evolution: a batch whose common column
  * arrives at a different NUMERIC width joins the table by safe
  * widening (byte→short→int→long, float→double) — the recorded schema
  * takes the wider type and carried files keep reading through
  * Spark 4's parquet widening conversions — while any non-widening
  * type change refuses the commit loudly, naming the column
  * (previously it recorded the new type and broke the carried files'
  * reads at some later scan). Reference anchor: Pydantic's numeric
  * coercion, unified_product_schema.py:145-207. */
class TypeWideningSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("widen")}/t"

  test("LONG batch into an INT column widens the recorded schema; carried INT files keep reading") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      Seq((1, "a", 10), (2, "b", 20)).toDF("id", "part", "qty"),
      root, "part")
    // Batch arrives with qty as LONG, touching only partition a —
    // partition b's INT-typed file is CARRIED, not rewritten.
    SnapshotStore.mergeCommitOrdered(spark,
      Seq((1L, "a", 100L)).toDF("id", "part", "qty")
        .select(col("id").cast("int"), col("part"), col("qty")),
      root, "id", Nil, "part")
    val sc = SnapshotStore.schemaFor(spark, root, 2L).get
    assert(sc("qty").dataType == org.apache.spark.sql.types.LongType, sc)
    val got = SnapshotStore.read(spark, root)
      .select("id", "qty").as[(Int, Long)].collect().toSet
    assert(got == Set((1, 100L), (2, 20L)), got.toString)
  }

  test("INT batch into a LONG column stays LONG (union widens the batch)") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      Seq((1, "a", 10L), (2, "b", 20L)).toDF("id", "part", "qty"),
      root, "part")
    SnapshotStore.mergeCommitOrdered(spark,
      Seq((1, "a", 100)).toDF("id", "part", "qty"),
      root, "id", Nil, "part")
    val sc = SnapshotStore.schemaFor(spark, root, 2L).get
    assert(sc("qty").dataType == org.apache.spark.sql.types.LongType, sc)
    assert(SnapshotStore.read(spark, root).select("qty").as[Long]
      .collect().toSet == Set(100L, 20L))
  }

  test("DOUBLE batch into a FLOAT column widens to DOUBLE") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      Seq((1, "a", 1.5f), (2, "b", 2.5f)).toDF("id", "part", "score"),
      root, "part")
    SnapshotStore.appendCommit(spark,
      Seq((3, "a", 3.25)).toDF("id", "part", "score"),
      root, "part")
    val sc = SnapshotStore.schemaFor(spark, root, 2L).get
    assert(sc("score").dataType == org.apache.spark.sql.types.DoubleType, sc)
    val got = SnapshotStore.read(spark, root)
      .select("id", "score").as[(Int, Double)].collect().toMap
    assert(got(2) == 2.5 && got(3) == 3.25, got.toString)
  }

  test("DECIMAL(18,2) batch into a DECIMAL(12,2) column widens; carried INT64-decimal files keep reading") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      Seq((1, "a", BigDecimal("19.99")), (2, "b", BigDecimal("7.50")))
        .toDF("id", "part", "price")
        .select(col("id"), col("part"),
          col("price").cast("decimal(12,2)").as("price")),
      root, "part")
    // The wider batch touches only partition a; b's DECIMAL(12,2)
    // file (parquet INT64-backed) is CARRIED under the widened scan.
    SnapshotStore.mergeCommitOrdered(spark,
      Seq((1, "a", BigDecimal("12345678901234.25")))
        .toDF("id", "part", "price")
        .select(col("id"), col("part"),
          col("price").cast("decimal(18,2)").as("price")),
      root, "id", Nil, "part")
    val sc = SnapshotStore.schemaFor(spark, root, 2L).get
    assert(sc("price").dataType ==
      org.apache.spark.sql.types.DecimalType(18, 2), sc)
    val got = SnapshotStore.read(spark, root)
      .select(col("id"), col("price").cast("string"))
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "12345678901234.25"), (2, "7.50")), got.toString)
  }

  test("decimal SCALE growth widens value-preservingly: (12,2) ∪ (11,4) → (14,4); precision overflow refuses") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      Seq((1, "a", BigDecimal("9999999999.99")), (2, "b", BigDecimal("0.25")))
        .toDF("id", "part", "price")
        .select(col("id"), col("part"),
          col("price").cast("decimal(12,2)").as("price")),
      root, "part")
    // 4-fractional-digit batch: the union must keep 10 integer digits
    // AND 4 fractional digits — DECIMAL(14,4) — so partition b's
    // carried (12,2) file rescales on read without loss.
    SnapshotStore.appendCommit(spark,
      Seq((3, "a", BigDecimal("1.2345"))).toDF("id", "part", "price")
        .select(col("id"), col("part"),
          col("price").cast("decimal(11,4)").as("price")),
      root, "part")
    val sc = SnapshotStore.schemaFor(spark, root, 2L).get
    assert(sc("price").dataType ==
      org.apache.spark.sql.types.DecimalType(14, 4), sc)
    val got = SnapshotStore.read(spark, root)
      .select(col("id"), col("price").cast("string"))
      .as[(Int, String)].collect().toSet
    assert(got == Set((1, "9999999999.9900"), (2, "0.2500"), (3, "1.2345")),
      got.toString)
    // SCALE-DOWN never widens implicitly: a (12,1) batch would need
    // rounding stored (…,4) values — the union is (15,4), which is
    // value-preserving, so this PASSES; the refusal case is overflow:
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.appendCommit(spark,
        Seq((4, "a", BigDecimal("1"))).toDF("id", "part", "price")
          .select(col("id"), col("part"),
            col("price").cast("decimal(38,2)").as("price")),
        root, "part")
    }
    assert(e.getMessage.contains("price"), e.getMessage)
    assert(SnapshotStore.versions(spark, root) == Seq(1L, 2L),
      "a refused overflow batch must publish nothing")
  }

  test("a non-widening type change refuses the commit loudly, naming the column") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      Seq((1, "a", 10)).toDF("id", "part", "qty"), root, "part")
    val e = intercept[IllegalArgumentException] {
      SnapshotStore.mergeCommitOrdered(spark,
        Seq((1, "a", "ten")).toDF("id", "part", "qty"),
        root, "id", Nil, "part")
    }
    assert(e.getMessage.contains("qty"), e.getMessage)
    assert(SnapshotStore.versions(spark, root) == Seq(1L),
      "a refused batch must publish nothing")
    // Non-numeric pairs refuse too (DATE can't widen an INT).
    val e2 = intercept[IllegalArgumentException] {
      SnapshotStore.appendCommit(spark,
        Seq((2, "a", java.sql.Date.valueOf("2026-01-01")))
          .toDF("id", "part", "qty"),
        root, "part")
    }
    assert(e2.getMessage.contains("qty"), e2.getMessage)
  }
}
