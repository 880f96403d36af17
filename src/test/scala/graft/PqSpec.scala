package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Product quantization (faiss PQm / IVFx,PQm): deterministic
  * codebooks and codes, an ADC probe that never touches stored
  * floats, and recall floors against the exact path — the compression
  * is allowed to cost recall, never determinism. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embeddings = {
    val d = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    d.cache(); d.count(); d
  }

  test("codebooks and codes rebuild byte-identically (deterministic ingest)") {
    val b1 = Similarity.pqCodebooks(embeddings, "vec_id", "embedding", 4, 8)
    val b2 = Similarity.pqCodebooks(embeddings, "vec_id", "embedding", 4, 8)
    assert(b1.collect().toSeq == b2.collect().toSeq)
    val i1 = Similarity.pqIndex(embeddings, "vec_id", "embedding", b1)
      .orderBy("neighbor_id").collect().toSeq
    val i2 = Similarity.pqIndex(embeddings, "vec_id", "embedding", b2)
      .orderBy("neighbor_id").collect().toSeq
    assert(i1 == i2)
    // Shape: m codes per vector, every code within [0, ks).
    val codes = Similarity.pqIndex(embeddings, "vec_id", "embedding", b1)
      .select(col("pq_codes")).as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
  }

  test("trained codebooks shrink quantization error vs the untrained seed") {
    def mse(books: org.apache.spark.sql.DataFrame): Double = {
      val idx = Similarity.pqIndex(embeddings, "vec_id", "embedding", books)
      // Reconstruct each vector from its codes and measure the error —
      // the quantity Lloyd's minimizes per subspace.
      idx.crossJoin(broadcast(books))
        .join(embeddings.select(col("vec_id").as("neighbor_id"),
          col("embedding")), Seq("neighbor_id"))
        .select(aggregate(
          zip_with(col("pq_codes"), col("__books"), (code, b) =>
            graft.functions.Vectors.l2sq(
              element_at(b.getField("__cents"), (code + 1).cast("int"))
                .getField("__sv"),
              slice(graft.functions.Vectors.toDouble(col("embedding")),
                b.getField("__sub") * lit(16) + lit(1), lit(16)))),
          lit(0.0), (acc, x) => acc + x).as("err"))
        .agg(avg(col("err"))).head().getDouble(0)
    }
    val seed = Similarity.pqCodebooks(embeddings, "vec_id", "embedding", 4, 8)
    val trained = Similarity.pqCodebooks(embeddings, "vec_id", "embedding",
      4, 8, trainIters = 2)
    val (e0, e1) = (mse(seed), mse(trained))
    assert(e1 < e0, s"training must reduce reconstruction error: $e0 -> $e1")
  }

  test("ADC top-k holds a recall floor against exact brute force") {
    val queries = embeddings.filter(col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(queries, embeddings,
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val books = Similarity.pqCodebooks(embeddings, "vec_id", "embedding",
      8, 16, trainIters = 1)
    val index = Similarity.pqIndex(embeddings, "vec_id", "embedding", books)
    val got = Similarity.pqTopK(index, books, queries,
        "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    // The synthetic embeddings are near-random (distance
    // concentration makes them a PQ worst case); a numpy replay of
    // this exact algorithm lands ~0.30, so the floor guards against
    // implementation misalignment (a flat-LUT off-by-one scores
    // ~0.10), not against the data's intrinsic difficulty.
    val recall = exact.keys.toSeq.map(q =>
      (got.getOrElse(q, Set.empty) & exact(q)).size.toDouble / 10).sum / exact.size
    assert(recall >= 0.25, s"PQ(8x16) recall@10 = $recall, floor 0.25")
  }

  test("IVF-PQ composes: probing ALL cells equals the flat PQ ranking") {
    val queries = embeddings.filter(col("vec_id") < 8)
    val queryIds = queries.select(col("vec_id"))
    val flatBooks = Similarity.pqCodebooks(embeddings, "vec_id", "embedding", 4, 8)
    val flat = Similarity.pqTopK(
      Similarity.pqIndex(embeddings, "vec_id", "embedding", flatBooks),
      flatBooks, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val ivf = Similarity.ivfTopKPQ(embeddings, "vec_id", "embedding",
        queryIds, k = 5, numCells = 4, nprobe = 4, m = 4, ks = 8)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf == flat,
      "nprobe = numCells must degrade IVF-PQ to the flat PQ ranking")
    // And at nprobe < cells the result per query stays a k-list with
    // distinct neighbors (the cell routing is a partition, not a
    // multiset).
    val narrow = Similarity.ivfTopKPQ(embeddings, "vec_id", "embedding",
      queryIds, k = 5, numCells = 4, nprobe = 2, m = 4, ks = 8)
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
    assert(narrow.distinct.length == narrow.length)
  }

  test("maintained IVF-PQ index: per-commit append equals from-scratch rebuild; DV deletes drop from the probe") {
    import graft.sinks.SnapshotStore
    val dir = java.nio.file.Files.createTempDirectory("pq_maint").toString
    val root = s"$dir/t"; val idxPath = s"$dir/pq_index"
    val e = embeddings.filter(col("vec_id") < 400)
      .withColumn("pt", pmod(col("vec_id"), lit(4)).cast("string"))
    SnapshotStore.commit(spark,
      e.filter(pmod(col("vec_id"), lit(3)) =!= 0), root, "pt")
    // Cents and books FREEZE at first ingest (faiss train-once).
    val v1 = SnapshotStore.read(spark, root)
    val cents = Similarity.ivfCentroids(v1, "vec_id", "embedding", numCells = 8)
    val books = Similarity.pqCodebooks(v1, "vec_id", "embedding", m = 4, ks = 8)
    Similarity.appendIvfPqForSnapshotVersion(
      spark, root, 1L, "vec_id", "embedding", cents, books, idxPath)
    val rows1 = spark.read.parquet(idxPath).count()
    SnapshotStore.appendCommit(spark,
      e.filter(pmod(col("vec_id"), lit(3)) === 0), root, "pt")
    Similarity.appendIvfPqForSnapshotVersion(
      spark, root, 2L, "vec_id", "embedding", cents, books, idxPath)
    // An append carries v1's files by reference, so the second pass
    // priced only the DELTA files' vectors.
    assert(spark.read.parquet(idxPath).count() - rows1 ==
      e.filter(pmod(col("vec_id"), lit(3)) === 0).count())
    def probe() = Similarity.ivfPqProbeSnapshot(spark, root, idxPath,
      cents, books, SnapshotStore.read(spark, root).filter(col("vec_id") < 6),
      "vec_id", "embedding", k = 5, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    def rebuilt() = Similarity.ivfPqTopKIndexed(
      Similarity.ivfPqIndex(SnapshotStore.read(spark, root),
        "vec_id", "embedding", cents, books),
      cents, books,
      SnapshotStore.read(spark, root).filter(col("vec_id") < 6),
      "vec_id", "embedding", k = 5, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(probe() == rebuilt(),
      "maintained-index probe must equal the from-scratch rebuild")
    // DV delete (SQL DELETE under the DV property — the only DV
    // write path): dropped ids must leave the probe WITHOUT any index
    // rewrite (the E88 read-boundary rule).
    spark.conf.set("spark.sql.catalog.pq_maint",
      classOf[graft.sinks.GraftCatalog].getName)
    SnapshotStore.setProperties(spark, root,
      Seq("graft.enableDeletionVectors" -> "true"))
    val doomed = probe().map(_._2).take(3)
    spark.sql(s"DELETE FROM pq_maint.`$root` " +
      s"WHERE vec_id IN (${doomed.mkString(",")})")
    assert(SnapshotStore.manifest(spark, root,
        SnapshotStore.currentVersion(spark, root).get)
      .exists(_.dv.nonEmpty), "the delete must have written DVs, not rewritten")
    val after = probe()
    assert(doomed.forall(d => !after.exists(_._2 == d)),
      s"DV-deleted ids $doomed must not surface: $after")
    assert(after == rebuilt(),
      "post-DV probe must equal a rebuild over the current snapshot")
    // LAYOUT rewrite between maintenance calls: compaction renames
    // files, so the probe must refuse LOUDLY (silently dropping whole
    // files' vectors is the failure mode) until the maintenance runs
    // for the layout version too — whose manifest diff is exactly the
    // rewritten files, restoring probe == rebuild.
    SnapshotStore.compact(spark, root, graft.sinks.ColSpec(Seq("pt")))
    val e2 = intercept[IllegalArgumentException] { probe() }
    assert(e2.getMessage.contains("does not cover"))
    Similarity.appendIvfPqForSnapshotVersion(spark, root,
      SnapshotStore.currentVersion(spark, root).get,
      "vec_id", "embedding", cents, books, idxPath)
    assert(probe() == rebuilt(),
      "post-compact maintenance must restore probe == rebuild")
  }
}
