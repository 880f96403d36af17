package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sinks.SnapshotStore

/** Atomic snapshot sink: commit protocol, file reuse, crash safety,
  * time travel, vacuum. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("snapstore").toString

  private def table(rows: (String, String, Int)*) =
    rows.toDF("product_id", "supplier", "version")

  test("commit/read roundtrip with manifest-level partition pruning") {
    val root = freshRoot()
    val v = SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "b", 1)), root, "supplier")
    assert(v == 1L)
    assert(SnapshotStore.read(spark, root).count() == 3)
    val prunedDf = SnapshotStore.read(spark, root, Some(Seq("b")))
    val pruned = prunedDf.select("product_id").as[String].collect().toSet
    assert(pruned == Set("p3"))
    // Manifest-level pruning: the scan's input files are exactly the
    // manifest entries of partition b — no listing of other partitions.
    val bPaths = SnapshotStore.manifest(spark, root, v)
      .filter(_.partition == "b").map(_.path).toSet
    val scanned = prunedDf.inputFiles.toSet
    assert(scanned.forall(f => bPaths.exists(f.endsWith)),
      s"scan read beyond partition b: $scanned vs $bPaths")
    // Fully-pruned selection keeps schema, returns no rows.
    val none = SnapshotStore.read(spark, root, Some(Seq("zz")))
    assert(none.columns.contains("product_id") && none.isEmpty)
  }

  test("mergeCommit rewrites only touched partitions and reuses others by reference") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "b", 1)), root, "supplier")
    val v2 = SnapshotStore.mergeCommit(spark,
      table(("p1", "a", 2), ("p4", "a", 2)), root,
      "product_id", "version", "supplier")
    assert(v2 == 2L)
    val out = SnapshotStore.read(spark, root)
      .select("product_id", "version").as[(String, Int)].collect().toMap
    // p1 upserted to v2, p4 inserted, p2 kept (older row survives the
    // window), p3 untouched.
    assert(out == Map("p1" -> 2, "p2" -> 1, "p3" -> 1, "p4" -> 2))

    // Partition b's files must be carried over BY REFERENCE: identical
    // paths in both manifests.
    val m1 = SnapshotStore.manifest(spark, root, 1).filter(_.partition == "b").map(_.path).toSet
    val m2 = SnapshotStore.manifest(spark, root, 2).filter(_.partition == "b").map(_.path).toSet
    assert(m1 == m2 && m1.nonEmpty)
    // And partition a's files must all be new in v2.
    val a1 = SnapshotStore.manifest(spark, root, 1).filter(_.partition == "a").map(_.path).toSet
    val a2 = SnapshotStore.manifest(spark, root, 2).filter(_.partition == "a").map(_.path).toSet
    assert(a1.intersect(a2).isEmpty)
  }

  test("a crashed write (data files, no manifest) leaves the previous snapshot intact") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1)), root, "supplier")
    // Simulate a committer that died after writing data files but
    // before publishing the manifest: orphan files under data/.
    table(("poison", "a", 9)).withColumn("__part", col("supplier"))
      .write.partitionBy("__part")
      .parquet(s"$root/data/v_2-deadbeef")
    assert(SnapshotStore.currentVersion(spark, root).contains(1L))
    val out = SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet
    assert(out == Set("p1")) // the orphan is invisible
    // The next successful commit wins version 2 regardless of orphans.
    val v2 = SnapshotStore.mergeCommit(spark, table(("p2", "a", 2)), root,
      "product_id", "version", "supplier")
    assert(v2 == 2L)
    assert(SnapshotStore.read(spark, root).count() == 2)
  }

  test("racing mergeCommits both land via optimistic retry, neither loses data") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p0", "z", 1)), root, "supplier")
    // Two writers to DIFFERENT partitions race on the same next
    // version; the loser must recompute against the winner's manifest
    // (a lost first-write that dropped the other's files would shed a
    // whole partition here).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val fa = Future(SnapshotStore.mergeCommit(spark, table(("pa", "a", 2)),
      root, "product_id", "version", "supplier"))
    val fb = Future(SnapshotStore.mergeCommit(spark, table(("pb", "b", 2)),
      root, "product_id", "version", "supplier"))
    val vs = Seq(Await.result(fa, Duration.Inf), Await.result(fb, Duration.Inf))
    assert(vs.toSet == Set(2L, 3L)) // serialized, distinct versions
    val out = SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet
    assert(out == Set("p0", "pa", "pb"))
  }

  test("compaction collapses multi-file partitions to one file, content unchanged") {
    val root = freshRoot()
    // Force several files per partition by pre-shuffling the input.
    val wide = (1 to 40).map(i => (s"p$i", if (i % 2 == 0) "a" else "b", 1))
      .toDF("product_id", "supplier", "version").repartition(4)
    SnapshotStore.commit(spark, wide, root, "supplier")
    val before = SnapshotStore.manifest(spark, root, 1).groupBy(_.partition)
    assert(before.values.exists(_.size > 1), "fixture failed to fragment files")

    val v = SnapshotStore.compact(spark, root, "supplier")
    assert(v == 2L)
    val after = SnapshotStore.manifest(spark, root, 2).groupBy(_.partition)
    assert(after.values.forall(_.size == 1), after.toString)
    val out = SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet
    assert(out == (1 to 40).map(i => s"p$i").toSet)
    // Already-compact tables are a no-op returning the current version.
    assert(SnapshotStore.compact(spark, root, "supplier") == 2L)
  }

  test("null partition values merge under the Hive default sentinel, no duplication") {
    val root = freshRoot()
    val t0 = Seq(("p1", Option("a"), 1), ("p2", Option.empty[String], 1))
      .toDF("product_id", "supplier", "version")
    SnapshotStore.commit(spark, t0, root, "supplier")
    // Upsert the null-partition key. Without normalizing null → the
    // sentinel in the touched set, the old null-partition file is
    // carried as "kept" AND the merged rows are appended — one extra
    // duplicate of p2 per commit.
    SnapshotStore.mergeCommit(spark,
      Seq(("p2", Option.empty[String], 2)).toDF("product_id", "supplier", "version"),
      root, "product_id", "version", "supplier")
    val out = SnapshotStore.read(spark, root)
    assert(out.count() == 2)
    assert(out.filter($"product_id" === "p2")
      .select("version").as[Int].collect().toSeq == Seq(2))
  }

  test("time travel reads historic versions until vacuum drops them") {
    val root = freshRoot()
    SnapshotStore.commit(spark, table(("p1", "a", 1), ("p3", "b", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 2)), root,
      "product_id", "version", "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 3)), root,
      "product_id", "version", "supplier")
    assert(SnapshotStore.versions(spark, root) == Seq(1L, 2L, 3L))
    assert(SnapshotStore.readVersion(spark, root, 1)
      .filter($"product_id" === "p1").select("version").as[Int].head() == 1)
    assert(SnapshotStore.readVersion(spark, root, 2)
      .filter($"product_id" === "p1").select("version").as[Int].head() == 2)

    val v1Files = SnapshotStore.manifest(spark, root, 1)
      .filter(_.partition == "a").map(_.path)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def exists(rel: String) =
      fs.exists(new org.apache.hadoop.fs.Path(root, rel))

    // Default retention window: unreferenced-but-fresh data files are
    // RETAINED (they could belong to an in-flight commit whose manifest
    // hasn't been published yet); only the old manifests drop.
    SnapshotStore.vacuum(spark, root, keep = 2)
    assert(SnapshotStore.versions(spark, root) == Seq(2L, 3L))
    assert(v1Files.forall(exists), "retention window must keep fresh files")
    // v2/v3 stay fully readable — including partition b's files, which
    // were written by the vacuumed v1 but are still referenced.
    assert(SnapshotStore.readVersion(spark, root, 2).count() == 2)
    assert(SnapshotStore.read(spark, root)
      .filter($"supplier" === "b").count() == 1)
    intercept[Exception] {
      SnapshotStore.manifest(spark, root, 1)
    }

    // With the window disabled (no writers active), v1's exclusive
    // files (partition a's originals) are collected.
    SnapshotStore.vacuum(spark, root, keep = 2, retainMillis = 0L)
    assert(v1Files.nonEmpty && !v1Files.exists(exists),
      "unreferenced files must be deleted once outside the window")
    assert(SnapshotStore.read(spark, root).count() == 2)
  }

  test("schema evolution: a batch adding a column merges; old versions and kept files read as typed nulls") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "b", 1)), root, "supplier")
    // The evolved batch carries a new column (the reference evolves its
    // schema via Pydantic defaults — unified_product_schema.py:145-207).
    val evolved = Seq(("p1", "a", 2, "EAN-1"), ("p4", "a", 2, "EAN-4"))
      .toDF("product_id", "supplier", "version", "gtin")
    val v2 = SnapshotStore.mergeCommit(spark, evolved, root,
      "product_id", "version", "supplier")
    assert(v2 == 2L)

    // Latest version: new column present everywhere; rows from
    // pre-evolution files (p2 via the merge union, p3 via a kept
    // old-schema file in the same manifest) read it as null.
    val cur = SnapshotStore.read(spark, root)
    assert(cur.columns.contains("gtin"))
    val byId = cur.select("product_id", "gtin").as[(String, Option[String])]
      .collect().toMap
    assert(byId == Map("p1" -> Some("EAN-1"), "p4" -> Some("EAN-4"),
      "p2" -> None, "p3" -> None))

    // Time travel to the pre-evolution version keeps its own schema.
    val v1 = SnapshotStore.readVersion(spark, root, 1)
    assert(!v1.columns.contains("gtin") && v1.count() == 3)

    // A further same-schema merge on top of the evolved table works and
    // keeps the evolved column for carried rows.
    SnapshotStore.mergeCommit(spark,
      Seq(("p3", "b", 2, "EAN-3")).toDF("product_id", "supplier", "version", "gtin"),
      root, "product_id", "version", "supplier")
    val cur3 = SnapshotStore.read(spark, root)
      .select("product_id", "gtin").as[(String, Option[String])].collect().toMap
    assert(cur3("p3").contains("EAN-3") && cur3("p1").contains("EAN-1"))
  }

  test("pre-stats upgrade: carried-only columns survive the recorded schema") {
    val root = freshRoot()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // v1 carries an extra column; its stats sidecar then goes missing
    // (pre-stats table being upgraded, or a torn write).
    SnapshotStore.commit(spark,
      Seq(("p1", "a", 1, "EAN-1"), ("p2", "b", 1, "EAN-2"))
        .toDF("product_id", "supplier", "version", "gtin"),
      root, "supplier")
    fs.delete(new org.apache.hadoop.fs.Path(root, "manifests/v_000001.stats"), false)
    // v2's batch lands in a NEW partition with a NARROWER schema: every
    // v1 file is carried by reference, and `gtin` exists ONLY in those
    // carried files. The recorded schema must still cover it (derived
    // from the carried footers), or table() would silently drop the
    // column while read() kept returning it.
    SnapshotStore.mergeCommit(spark,
      Seq(("p3", "c", 1)).toDF("product_id", "supplier", "version"),
      root, "product_id", "version", "supplier")
    val viaTable = SnapshotStore.table(spark, root)
    assert(viaTable.columns.contains("gtin"),
      "carried-only column dropped from the recorded schema")
    val byId = viaTable.select("product_id", "gtin")
      .as[(String, Option[String])].collect().toMap
    assert(byId == Map("p1" -> Some("EAN-1"), "p2" -> Some("EAN-2"), "p3" -> None))
  }

  test("a planning pass through tableWithIndex reads the stats sidecar exactly once") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "b", 1)), root, "supplier")
    val before = SnapshotStore.sidecarReads.get()
    val (t, _) = SnapshotStore.tableWithIndex(spark, root)
    t.filter($"version" >= 1).count()
    assert(SnapshotStore.sidecarReads.get() - before == 1,
      s"expected 1 sidecar read per plan, got ${SnapshotStore.sidecarReads.get() - before}")
  }

  test("symlink-format manifest export lists exactly the version's files per partition") {
    val root = freshRoot()
    SnapshotStore.commit(spark,
      table(("p1", "a", 1), ("p2", "a", 1), ("p3", "b", 1)), root, "supplier")
    SnapshotStore.mergeCommit(spark, table(("p1", "a", 2)), root,
      "product_id", "version", "supplier")
    val out = SnapshotStore.writeSymlinkManifest(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    def lines(part: String): Seq[String] = {
      val p = new org.apache.hadoop.fs.Path(out, s"__part=$part/manifest")
      assert(fs.exists(p), s"missing symlink manifest for $part")
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    val m2 = SnapshotStore.manifest(spark, root, 2)
    def expected(part: String) = m2.filter(_.partition == part)
      .map(e => fs.makeQualified(new org.apache.hadoop.fs.Path(root, e.path)).toString)
      .sorted
    assert(lines("a") == expected("a") && lines("b") == expected("b"))

    // The exported paths are directly readable as parquet (what an
    // external engine's SymlinkTextInputFormat does with each line),
    // and together reproduce the snapshot.
    val all = (lines("a") ++ lines("b"))
    val readBack = spark.read.parquet(all: _*)
      .select("product_id", "version").as[(String, Int)].collect().toMap
    assert(readBack == Map("p1" -> 2, "p2" -> 1, "p3" -> 1))

    // Re-export after another commit reflects the new version — and
    // sweeps leftovers of a previously crashed swap (a parked old tree
    // and a half-built tmp tree must not accumulate forever).
    val stale = Seq("._symlink_old-dead01", "._symlink_tmp-dead02")
      .map(n => new org.apache.hadoop.fs.Path(root, n))
    stale.foreach(fs.mkdirs)
    SnapshotStore.mergeCommit(spark, table(("p4", "b", 3)), root,
      "product_id", "version", "supplier")
    SnapshotStore.writeSymlinkManifest(spark, root)
    stale.foreach(p => assert(!fs.exists(p), s"stale swap dir $p not swept"))
    val m3 = SnapshotStore.manifest(spark, root, 3)
    assert(lines("b").toSet == m3.filter(_.partition == "b")
      .map(e => fs.makeQualified(new org.apache.hadoop.fs.Path(root, e.path)).toString).toSet)
  }

  test("DataFrame writer: ErrorIfExists/Overwrite/Append route through versioned commits") {
    import spark.implicits._
    val root = freshRoot()
    def write(df: org.apache.spark.sql.DataFrame) =
      df.write.format("graft-snapshot").option("partitionCol", "supplier")
    // Default mode (ErrorIfExists) creates v1.
    write(table(("p1", "a", 1), ("p2", "b", 1))).save(root)
    assert(SnapshotStore.versions(spark, root) == Seq(1L))
    // ...and refuses a second default-mode write.
    intercept[Exception] { write(table(("px", "a", 9))).save(root) }
    // Ignore on an existing table is a silent no-op.
    write(table(("px", "a", 9))).mode("ignore").save(root)
    assert(SnapshotStore.versions(spark, root) == Seq(1L))
    // Append = keyed merge (key + versionCol required).
    intercept[Exception] {
      write(table(("p1", "a", 2))).mode("append").save(root)
    }
    write(table(("p1", "a", 2), ("p3", "b", 2)))
      .option("key", "product_id").option("versionCol", "version")
      .mode("append").save(root)
    assert(SnapshotStore.versions(spark, root) == Seq(1L, 2L))
    assert(SnapshotStore.read(spark, root)
      .select("product_id", "version").as[(String, Int)].collect().toSet ==
      Set(("p1", 2), ("p2", 1), ("p3", 2)))
    // Overwrite = full new VERSION; the old snapshot stays readable.
    write(table(("q1", "c", 1))).mode("overwrite").save(root)
    assert(SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet == Set("q1"))
    assert(SnapshotStore.readVersion(spark, root, 2)
      .select("product_id").as[String].collect().toSet ==
      Set("p1", "p2", "p3"))
    // Writer commits record the partition column like any other path.
    assert(SnapshotStore.partitionColumn(spark, root, 3L).contains("supplier"))
    // Missing partitionCol option or a partitionCol absent from the
    // frame fail loudly before any write.
    intercept[Exception] {
      table(("z", "z", 1)).write.format("graft-snapshot")
        .mode("overwrite").save(freshRoot())
    }
    intercept[Exception] {
      Seq((1L, "x")).toDF("id", "v").write.format("graft-snapshot")
        .option("partitionCol", "supplier").mode("overwrite").save(freshRoot())
    }
    // Append under a DIFFERENT partition column than the table's
    // recorded one must fail loudly — a mismatched merge would route
    // incoming rows past every existing partition and duplicate keys.
    val e = intercept[Exception] {
      table(("p9", "a", 9)).write.format("graft-snapshot")
        .option("partitionCol", "product_id")
        .option("key", "product_id").option("versionCol", "version")
        .mode("append").save(root)
    }
    assert(e.getMessage.contains("recorded partition column"), e.getMessage)
  }

  test("DataFrame writer append on a pre-#partcol table fails loudly unless vouched") {
    import spark.implicits._
    val root = freshRoot()
    table(("p1", "a", 1)).write.format("graft-snapshot")
      .option("partitionCol", "supplier").save(root)
    // Simulate a manifest written before partition-column recording:
    // strip the #partcol header line in place.
    val mf = java.nio.file.Paths.get(root, "manifests", "v_000001.manifest")
    import scala.jdk.CollectionConverters._
    val stripped = java.nio.file.Files.readAllLines(mf).asScala
      .filterNot(_.startsWith("#partcol")).asJava
    java.nio.file.Files.write(mf, stripped)
    // Hadoop's checksummed local FS keeps a .crc sidecar that the
    // out-of-band edit invalidates — drop it.
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(root, "manifests", ".v_000001.manifest.crc"))
    assert(SnapshotStore.partitionColumn(spark, root, 1L).isEmpty)
    def append(extra: (String, String)*) = {
      val w = table(("p2", "a", 2)).write.format("graft-snapshot")
        .option("partitionCol", "supplier")
        .option("key", "product_id").option("versionCol", "version")
      extra.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
        .mode("append").save(root)
    }
    // Unverifiable layout: the guard must not silently no-op.
    val e = intercept[Exception] { append() }
    assert(e.getMessage.contains("predates partition-column recording"),
      e.getMessage)
    // An explicit vouch proceeds, and the merge re-records the column.
    append("assumePartitionCol" -> "true")
    assert(SnapshotStore.read(spark, root)
      .select("product_id").as[String].collect().toSet == Set("p1", "p2"))
    assert(SnapshotStore.partitionColumn(spark, root, 2L).contains("supplier"))
  }

  test("commitIfAbsent: concurrent creators — exactly one wins, the loser sees None") {
    import spark.implicits._
    import java.util.concurrent.CyclicBarrier
    val root = freshRoot()
    val barrier = new CyclicBarrier(2)
    @volatile var ra: Option[Long] = Some(-1L)
    @volatile var rb: Option[Long] = Some(-1L)
    @volatile var err: Throwable = null
    def create(tag: String): Option[Long] = SnapshotStore.commitIfAbsent(spark,
      Seq((tag, "a", 1)).toDF("product_id", "supplier", "version"),
      root, "supplier")
    val ta = new Thread(() => try { barrier.await(); ra = create("pA") }
      catch { case t: Throwable => err = t })
    val tb = new Thread(() => try { barrier.await(); rb = create("pB") }
      catch { case t: Throwable => err = t })
    ta.start(); tb.start(); ta.join(120000); tb.join(120000)
    if (err != null) throw err
    // Exactly one creator owns v1; the loser got None, not a v2.
    assert(Seq(ra, rb).count(_ == Some(1L)) == 1, s"got $ra / $rb")
    assert(Seq(ra, rb).count(_.isEmpty) == 1, s"got $ra / $rb")
    assert(SnapshotStore.versions(spark, root) == Seq(1L))
    // Existing-table fast path.
    assert(create("pC").isEmpty)
  }
}
