package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.sinks.SnapshotStore

/** Streaming writes through the format surface
  * (`df.writeStream.format("graft-snapshot")`): each micro-batch is
  * one atomic keyed-merge commit, and a re-delivered batch is a TRUE
  * no-op (no new version), not merely an idempotent re-merge. */
class SnapshotSinkStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  test("micro-batches land as keyed merge commits; re-delivery commits nothing") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("snapsink").toString
    val root = s"$dir/store"
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Int, Timestamp)]
    val q = input.toDF().toDF("sku", "qty", "modified_at")
      .withColumn("part", lit("stock"))
      .writeStream.format("graft-snapshot")
      .outputMode("append")
      .option("key", "sku").option("versionCol", "modified_at")
      .option("partitionCol", "part")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(root)
    try {
      input.addData(("a", 1, ts(1000)), ("b", 5, ts(1000)))
      q.processAllAvailable()
      assert(SnapshotStore.versions(spark, root) == Seq(1L))
      input.addData(("a", 3, ts(2000)))
      q.processAllAvailable()
      assert(SnapshotStore.versions(spark, root) == Seq(1L, 2L))
      // An empty drain commits nothing.
      q.processAllAvailable()
      assert(SnapshotStore.versions(spark, root) == Seq(1L, 2L))
    } finally q.stop()
    assert(SnapshotStore.read(spark, root)
      .select("sku", "qty").as[(String, Int)].collect().toSet ==
      Set(("a", 3), ("b", 5)))
    // Restart against the SAME checkpoint: the engine re-delivers the
    // last batch; the marker log must make it a true no-op — the
    // version list does not grow.
    val q2 = input.toDF().toDF("sku", "qty", "modified_at")
      .withColumn("part", lit("stock"))
      .writeStream.format("graft-snapshot")
      .outputMode("append")
      .option("key", "sku").option("versionCol", "modified_at")
      .option("partitionCol", "part")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(root)
    try q2.processAllAvailable() finally q2.stop()
    assert(SnapshotStore.versions(spark, root) == Seq(1L, 2L),
      "a re-delivered batch must not commit a new version")
    // New data after the restart still flows.
    val q3 = input.toDF().toDF("sku", "qty", "modified_at")
      .withColumn("part", lit("stock"))
      .writeStream.format("graft-snapshot")
      .outputMode("append")
      .option("key", "sku").option("versionCol", "modified_at")
      .option("partitionCol", "part")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(root)
    try {
      input.addData(("c", 9, ts(3000)))
      q3.processAllAvailable()
    } finally q3.stop()
    assert(SnapshotStore.read(spark, root)
      .select("sku", "qty").as[(String, Int)].collect().toSet ==
      Set(("a", 3), ("b", 5), ("c", 9)))
  }

  test("a NEW query (fresh checkpoint) writing to the same table is not deduped away") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("snapsink2").toString
    val root = s"$dir/store"
    def run(ckpt: String, rows: (String, Int, Timestamp)*): Unit = {
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Int, Timestamp)]
      val q = input.toDF().toDF("sku", "qty", "modified_at")
        .withColumn("part", lit("stock"))
        .writeStream.format("graft-snapshot")
        .outputMode("append")
        .option("key", "sku").option("versionCol", "modified_at")
        .option("partitionCol", "part")
        .option("checkpointLocation", ckpt)
        .start(root)
      try { input.addData(rows: _*); q.processAllAvailable() } finally q.stop()
    }
    run(s"$dir/ckptA", ("a", 1, ts(1000)))
    // A DIFFERENT query (fresh checkpoint, batch ids restart at 0)
    // targets the same table: its batch 0 must COMMIT — markers key
    // on (query id, batch id), not batch id alone.
    run(s"$dir/ckptB", ("b", 7, ts(2000)))
    assert(SnapshotStore.read(spark, root)
      .select("sku", "qty").as[(String, Int)].collect().toSet ==
      Set(("a", 1), ("b", 7)),
      "the second query's first batch was silently dropped")
  }

  test("missing required options fail at stream construction") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("snapsink_opts").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Int)]
    val e = intercept[Exception] {
      input.toDF().toDF("sku", "qty")
        .writeStream.format("graft-snapshot")
        .option("checkpointLocation", s"$dir/ckpt")
        .start(s"$dir/store")
    }
    assert(e.getMessage.contains("key"), e.getMessage)
  }
}
