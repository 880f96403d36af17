package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hash-bucketed snapshot tables (`SnapshotStore.bucketTable` +
  * `graft.bucket.spec`): co-located joins and aggregations plan
  * WITHOUT shuffling bucketed sides, point predicates prune buckets,
  * and every subsequent data commit maintains the layout. All
  * degradations are conservative: any drift (legacy files, widened
  * bucket column, renamed column) falls back to a plain scan. */
class BucketedTableSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("bucketed").toString}/t"

  private def rowsDf(n: Int, tag: String): DataFrame =
    (0 until n).map(i => (i.toLong, s"$tag$i", (i % 3).toString))
      .toDF("k", "v", "part")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Build + assert inside a no-broadcast window so tiny fixtures
    * exercise the co-located SortMergeJoin path the layout exists for. */
  private def noBroadcast[A](body: => A): A = {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try body finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  /** Whether a bare scan of `df` presents the bucket layout. Probed
    * with auto-bucketed-scan OFF: with it on, Spark rightly DISABLES
    * the bucketed read for plans with no co-location benefit
    * ("Bucketed: false (disabled by query planner)"), which would be
    * indistinguishable from the conservative no-spec fallback. */
  private def presentsBucketed(df: => DataFrame): Boolean = {
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try plan(df).contains("Bucketed: true")
    finally
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("bucketTable rewrites the layout; co-bucketed join and keyed agg plan shuffle-free") {
    val l = freshRoot(); val r = freshRoot()
    SnapshotStore.commit(spark, rowsDf(600, "l"), l, "part")
    SnapshotStore.commit(spark, rowsDf(400, "r").filter(col("k") % 2 === 0), r, "part")
    SnapshotStore.bucketTable(spark, l, Seq("k"), 8)
    SnapshotStore.bucketTable(spark, r, Seq("k"), 8)
    assert(SnapshotStore.manifestOperation(spark, l, 2L).contains("cluster-by"))
    // Every live file is bucket-stamped.
    val entries = SnapshotStore.manifest(spark, l, 2L)
    assert(entries.nonEmpty && entries.forall(e =>
      SnapshotStore.bucketIdOf(new org.apache.hadoop.fs.Path(e.path).getName)
        .exists(_ < 8)))
    noBroadcast {
      val j = SnapshotStore.table(spark, l)
        .join(SnapshotStore.table(spark, r).select(col("k"), col("v").as("w")), "k")
      val p = plan(j)
      assert(!p.contains("Exchange"), s"co-bucketed join must not shuffle:\n$p")
      assert(p.contains("Bucketed: true"))
      assert(j.count() == 200)
      assert(j.filter(col("k") === 10L).select("v", "w").as[(String, String)]
        .collect().toSet == Set(("l10", "r10")))
      val g = SnapshotStore.table(spark, l).groupBy("k").agg(count(lit(1)))
      assert(!plan(g).contains("Exchange"), "keyed agg must not shuffle")
      assert(g.count() == 600)
    }
  }

  test("point predicates prune to one bucket; content roundtrips") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rowsDf(500, "x"), root, "part")
    SnapshotStore.bucketTable(spark, root, Seq("k"), 8)
    assert(SnapshotStore.read(spark, root).select("k", "v").as[(Long, String)]
      .collect().toSet == rowsDf(500, "x").select("k", "v")
      .as[(Long, String)].collect().toSet)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val f = SnapshotStore.table(spark, root).filter(col("k") === 42L)
      val p = plan(f)
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected 1-of-8 bucket pruning:\n$p")
      assert(f.count() == 1)
    } finally
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("appends, merges, and compaction maintain the bucket layout") {
    val l = freshRoot(); val r = freshRoot()
    SnapshotStore.commit(spark, rowsDf(300, "l"), l, "part")
    SnapshotStore.commit(spark, rowsDf(300, "r"), r, "part")
    SnapshotStore.bucketTable(spark, l, Seq("k"), 8)
    SnapshotStore.bucketTable(spark, r, Seq("k"), 8)
    // Data commits AFTER bucketing keep the layout without re-clustering.
    SnapshotStore.appendCommit(spark,
      (300 until 360).map(i => (i.toLong, s"l$i", (i % 3).toString))
        .toDF("k", "v", "part"), l, "part")
    SnapshotStore.mergeCommitOrdered(spark,
      Seq((10L, "L10", "1"), (400L, "l400", "0")).toDF("k", "v", "part"),
      l, ColSpec(Seq("k")), Nil, ColSpec(Seq("part")))
    noBroadcast {
      val j = SnapshotStore.table(spark, l)
        .join(SnapshotStore.table(spark, r).select(col("k"), col("v").as("w")), "k")
      val p = plan(j)
      assert(!p.contains("Exchange"),
        s"layout must survive append+upsert:\n$p")
      assert(j.count() == 300)
      // The upsert really replaced the row, through the bucketed path.
      assert(j.filter(col("k") === 10L).select("v").as[String].collect()
        .toSet == Set("L10"))
    }
    // Compaction rewrites per-bucket (never merging buckets together).
    val before = SnapshotStore.manifest(spark, l,
      SnapshotStore.currentVersion(spark, l).get).size
    SnapshotStore.compact(spark, l, ColSpec(Seq("part")),
      maxFilesPerPartition = 8)
    val cur = SnapshotStore.currentVersion(spark, l).get
    val after = SnapshotStore.manifest(spark, l, cur)
    assert(after.size < before)
    assert(after.forall(e => SnapshotStore.bucketIdOf(
      new org.apache.hadoop.fs.Path(e.path).getName).exists(_ < 8)))
    noBroadcast {
      val j2 = SnapshotStore.table(spark, l)
        .join(SnapshotStore.table(spark, r).select(col("k"), col("v").as("w")), "k")
      assert(!plan(j2).contains("Exchange"), "layout must survive compaction")
      assert(j2.count() == 300)
    }
  }

  test("conservative fallbacks: legacy files, type drift, never-bucketed") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rowsDf(100, "x"), root, "part")
    // Never bucketed: plain scan.
    assert(!presentsBucketed(SnapshotStore.table(spark, root)))
    // Property set but files unstamped (legacy / out-of-band): plain scan.
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.BucketSpecProp -> "8;k:BIGINT"))
    assert(!presentsBucketed(SnapshotStore.table(spark, root)))
    // Real layout: bucketed scan.
    SnapshotStore.bucketTable(spark, root, Seq("k"), 8)
    assert(presentsBucketed(SnapshotStore.table(spark, root)))
    // Recorded type drifts from the schema (a widened bucket column):
    // both reads AND subsequent writes degrade conservatively.
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.BucketSpecProp -> "8;k:INT"))
    assert(!presentsBucketed(SnapshotStore.table(spark, root)))
    SnapshotStore.appendCommit(spark,
      Seq((1000L, "y", "1")).toDF("k", "v", "part"), root, "part")
    val v = SnapshotStore.currentVersion(spark, root).get
    val fresh = SnapshotStore.manifest(spark, root, v)
      .filterNot(SnapshotStore.manifest(spark, root, v - 1).toSet)
    assert(fresh.nonEmpty && fresh.forall(e => SnapshotStore.bucketIdOf(
      new org.apache.hadoop.fs.Path(e.path).getName).isEmpty),
      "a type-drifted spec must not stamp new files")
    assert(SnapshotStore.read(spark, root).count() == 101)
  }

  test("SORTED buckets eliminate the merge-join sort; multi-file buckets fall back; values stay right") {
    val l = freshRoot(); val r = freshRoot()
    // Single manifest partition -> one file per bucket -> Spark trusts
    // the declared per-bucket ordering.
    def oneDf(n: Int, tag: String) =
      (0 until n).map(i => (i.toLong, s"$tag$i", "all")).toDF("k", "v", "part")
    SnapshotStore.commit(spark, oneDf(500, "l"), l, "part")
    SnapshotStore.commit(spark, oneDf(500, "r"), r, "part")
    SnapshotStore.bucketTable(spark, l, Seq("k"), 8, sortCols = Seq("k"))
    SnapshotStore.bucketTable(spark, r, Seq("k"), 8, sortCols = Seq("k"))
    assert(SnapshotStore.tablePropertiesMap(spark, l)(
      SnapshotStore.BucketSpecProp) == "8;k:BIGINT;k:BIGINT")
    // Every written file really IS sorted by k (Spark TRUSTS the
    // declaration — a wrong order would silently corrupt merge joins).
    val perFile = SnapshotStore.read(spark, l)
      .withColumn("f", input_file_name())
      .select("f", "k").as[(String, Long)].collect()
      .groupBy(_._1).values
    assert(perFile.forall(rows => rows.map(_._2).toSeq ==
      rows.map(_._2).toSeq.sorted), "bucket files must be k-sorted")
    noBroadcast {
      // Since 3.0 Spark only TRUSTS per-bucket ordering under the
      // legacy conf (the trade: a sorted one-file bucket reads
      // single-threaded) — the layout records it either way; this
      // enables the sort-free plan for the pin.
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      def joined() = SnapshotStore.table(spark, l)
        .join(SnapshotStore.table(spark, r).select(col("k"), col("v").as("w")), "k")
      val p = plan(joined())
      assert(!p.contains("Exchange") && !p.contains("Sort ["),
        s"sorted co-bucketed join must need neither shuffle nor sort:\n$p")
      assert(joined().count() == 500)
      assert(joined().filter(col("k") === 7L).select("v", "w")
        .as[(String, String)].collect().toSet == Set(("l7", "r7")))
      // An append makes some buckets multi-file: Spark must fall back
      // to a REAL sort (trusting concatenated files would be wrong),
      // and values stay correct.
      SnapshotStore.appendCommit(spark,
        Seq((500L, "l500", "all")).toDF("k", "v", "part"), l, "part")
      val p2 = plan(joined())
      assert(p2.contains("Sort ["),
        s"multi-file buckets must re-sort:\n$p2")
      assert(!p2.contains("Exchange"), "co-location must survive")
      assert(joined().count() == 500)
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    }
  }

  test("z-order on a SORTED-bucketed table keeps the declared sort primary") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      (0 until 300).map(i => (i.toLong, pmod(lit(i) * 37, lit(500)), "all"))
        .map { case (k, _, p) => (k, (k * 37 % 500), p) }
        .toDF("k", "a", "part"), root, "part")
    SnapshotStore.bucketTable(spark, root, Seq("k"), 4, sortCols = Seq("k"))
    // The reader DECLARES the k-sort unconditionally, so z-ordering
    // must cluster WITHIN k-ties, never replace the primary order —
    // or a sort-elided merge join would silently zip garbage.
    SnapshotStore.compactZOrder(spark, root, ColSpec(Seq("part")),
      Seq("a", "k"), filesPerPartition = 1)
    val perFile = SnapshotStore.read(spark, root)
      .withColumn("f", input_file_name())
      .select("f", "k").as[(String, Long)].collect()
      .groupBy(_._1).values
    assert(perFile.forall(rows => rows.map(_._2).toSeq ==
      rows.map(_._2).toSeq.sorted),
      "spec sort must survive a z-order rewrite")
    assert(SnapshotStore.read(spark, root).count() == 300)
  }

  test("a type-drifted spec makes compaction behave as unbucketed — and converge") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rowsDf(50, "x"), root, "part")
    SnapshotStore.bucketTable(spark, root, Seq("k"), 8)
    (0 until 4).foreach(i => SnapshotStore.appendCommit(spark,
      Seq((100L + i, "y", "1")).toDF("k", "v", "part"), root, "part"))
    // Drift the recorded type: the writer stops re-bucketing, so
    // compaction must stop assuming it will (or it never converges).
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.BucketSpecProp -> "8;k:INT"))
    SnapshotStore.compact(spark, root, ColSpec(Seq("part")))
    val v = SnapshotStore.currentVersion(spark, root).get
    assert(SnapshotStore.manifest(spark, root, v).groupBy(_.partition)
      .values.forall(_.size <= 1),
      "drifted-spec compact must coalesce like an unbucketed table")
    // Converged: a second compact publishes nothing.
    assert(SnapshotStore.compact(spark, root, ColSpec(Seq("part"))) == v)
    assert(SnapshotStore.read(spark, root).count() == 54)
  }

  test("z-order on a type-drifted spec takes the classic layout, not a silent no-op") {
    val root = freshRoot()
    val grid = spark.range(4096).select(
      col("id").as("k"),
      pmod(col("id"), lit(64)).as("a"),
      (col("id") / 64).cast("long").as("b"),
      lit("g").as("part"))
    SnapshotStore.commit(spark, grid, root, "part")
    // Hash layout: every bucket file spans nearly the full a/b range,
    // so stats skipping has nothing to bite on.
    SnapshotStore.bucketTable(spark, root, Seq("k"), 8)
    // Drift the recorded type (k is BIGINT): writeDataFiles will skip
    // the bucket shuffle, so the z-order rewrite must NOT defer to it
    // — deferring would rewrite the partitions with no repartition
    // and no ordering at all (a silent layout no-op). The drifted
    // table takes the classic range+sort layout, which restores
    // skippability.
    SnapshotStore.setProperties(spark, root,
      Seq(SnapshotStore.BucketSpecProp -> "8;k:INT"))
    SnapshotStore.compactZOrder(spark, root, ColSpec(Seq("part")),
      Seq("a", "b"), filesPerPartition = 16)
    val (t1, i1) = SnapshotStore.tableWithIndex(spark, root)
    assert(t1.filter(col("a") < 8).count() == 512)
    assert(i1.lastCandidateFiles < i1.totalFiles,
      s"drifted-spec z-order must produce a skippable layout: " +
        s"${i1.lastCandidateFiles}/${i1.totalFiles}")
    assert(SnapshotStore.read(spark, root).count() == 4096)
  }

  test("comma-bearing bucket column types (DECIMAL) round-trip through the spec") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      (0 until 200).map(i => (BigDecimal(i), s"v$i", "all"))
        .toDF("price", "v", "part")
        .withColumn("price", col("price").cast("decimal(12,2)")), root, "part")
    SnapshotStore.bucketTable(spark, root, Seq("price"), 8)
    // The recorded type carries a comma — the spec must still parse,
    // or maintenance and reads silently stop engaging.
    assert(SnapshotStore.parseBucketSpec(
      SnapshotStore.tablePropertiesMap(spark, root)(
        SnapshotStore.BucketSpecProp)).exists(_.cols ==
      Seq("price" -> "DECIMAL(12,2)")))
    assert(presentsBucketed(SnapshotStore.table(spark, root)))
    // A later append keeps stamping (the writer parsed the spec too).
    SnapshotStore.appendCommit(spark,
      Seq((BigDecimal(999), "x", "all")).toDF("price", "v", "part")
        .withColumn("price", col("price").cast("decimal(12,2)")), root, "part")
    val v = SnapshotStore.currentVersion(spark, root).get
    assert(SnapshotStore.manifest(spark, root, v).forall(e =>
      SnapshotStore.bucketIdOf(
        new org.apache.hadoop.fs.Path(e.path).getName).isDefined))
    assert(presentsBucketed(SnapshotStore.table(spark, root)))
    assert(SnapshotStore.read(spark, root).count() == 201)
  }

  test("z-order on a bucketed table sorts within buckets and keeps co-location") {
    val root = freshRoot()
    SnapshotStore.commit(spark, rowsDf(400, "x")
      .withColumn("a", pmod(col("k") * 37, lit(1000)))
      .withColumn("b", pmod(col("k") * 91, lit(1000))), root, "part")
    SnapshotStore.bucketTable(spark, root, Seq("k"), 8)
    SnapshotStore.compactZOrder(spark, root, ColSpec(Seq("part")),
      Seq("a", "b"), filesPerPartition = 2)
    val cur = SnapshotStore.currentVersion(spark, root).get
    assert(SnapshotStore.manifest(spark, root, cur).forall(e =>
      SnapshotStore.bucketIdOf(
        new org.apache.hadoop.fs.Path(e.path).getName).exists(_ < 8)),
      "z-order must keep bucket stamping")
    assert(presentsBucketed(SnapshotStore.table(spark, root)))
    assert(SnapshotStore.read(spark, root).count() == 400)
  }
}
