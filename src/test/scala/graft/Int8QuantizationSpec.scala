package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.Similarity

/** E52: symmetric int8 vector quantization and the quantized ANN scan. */
class Int8QuantizationSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(0.5f, -1.0f, 0.25f)),
    (2L, Array(0.0f, 0.0f, 0.0f)),
    (3L, Array(2.0f, 1.0f, -2.0f)),
    (4L, Array(0.49f, -0.98f, 0.26f))   // near doc 1's direction
  ).toDF("id", "vec")

  private def staged = vecs
    .withColumn("scale", Vectors.int8Scale(col("vec")))
    .withColumn("codes", Vectors.int8Codes(col("vec"), col("scale")))

  test("codes are bounded, max-abs component hits ±127, zero vector is all-zero") {
    val r = staged.select(col("id"), col("scale"), col("codes"))
      .as[(Long, Double, Seq[Byte])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L)._2 == Seq[Byte](64, -127, 32))
    assert(r(2L) == ((0.0, Seq[Byte](0, 0, 0))))
    assert(r(3L)._2 == Seq[Byte](127, 64, -127))
    assert(r.values.forall(_._2.forall(c => c >= -127 && c <= 127)))
  }

  test("dequantization error is bounded by scale/2 per component") {
    val errs = staged.select(
        zip_with(transform(col("vec"), x => x.cast("double")),
          Vectors.int8Dequantize(col("codes"), col("scale")),
          (a, b) => abs(a - b)).as("err"),
        col("scale"))
      .as[(Seq[Double], Double)].collect()
    errs.foreach { case (es, s) =>
      es.foreach(e => assert(e <= s / 2 + 1e-12, s"err $e > ${s / 2}"))
    }
  }

  test("int8Dot is the exact integer code dot (no overflow at ±127)") {
    val d = Seq((Seq.fill(64)(127), Seq.fill(64)(-127)))
      .toDF("ai", "bi")
      .select(Vectors.int8Dot(
        transform(col("ai"), x => x.cast("tinyint")),
        transform(col("bi"), x => x.cast("tinyint")))).as[Long].head()
    assert(d == -127L * 127 * 64)
  }

  test("codegen int8Dot ≡ HOF formulation (incl. null/length edge cases)") {
    val pairs = Seq(
      (Seq(1, -2, 3), Seq(4, 5, -6)),
      (Seq(127, -127, 0), Seq(-127, 127, 9)),
      (Seq.empty[Int], Seq.empty[Int])
    ).toDF("ai", "bi")
      .select(transform(col("ai"), x => x.cast("tinyint")).as("a"),
        transform(col("bi"), x => x.cast("tinyint")).as("b"))
    val r = pairs.select(Vectors.int8Dot(col("a"), col("b")).as("k"),
        Vectors.int8DotHof(col("a"), col("b")).as("h"))
      .collect()
    r.foreach(row => assert(row.get(0) == row.get(1), row.toString))
    // Length mismatch -> null from the kernel (HOF zip_with pads with
    // null and the cast throws/propagates, so pin the kernel directly).
    val mm = Seq((Seq(1, 2), Seq(1))).toDF("ai", "bi")
      .select(Vectors.int8Dot(
        transform(col("ai"), x => x.cast("tinyint")),
        transform(col("bi"), x => x.cast("tinyint"))).as("d"))
      .collect()(0)
    assert(mm.isNullAt(0))
    // Interpreted path (no codegen) agrees.
    val interp = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val d = Seq((Seq(3, -4), Seq(5, 6))).toDF("ai", "bi")
        .select(Vectors.int8Dot(
          transform(col("ai"), x => x.cast("tinyint")),
          transform(col("bi"), x => x.cast("tinyint")))).as[Long].head()
      assert(d == 15L - 24L)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", interp)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("quantizedTopK ranks by rescaled dot; near-duplicate direction first") {
    val queries = vecs.filter(col("id") === 1L)
    val quant = Similarity.quantizedTopK(queries, vecs, "id", "vec", k = 3)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    // Dots vs doc1: doc4 strongly positive, doc2 zero, doc3 negative.
    assert(quant == Map(4L -> 1, 2L -> 2, 3L -> 3), quant.toString)
  }

  test("quantized output carries the exact integer dot for replay") {
    val queries = vecs.filter(col("id") === 3L)
    val r = Similarity.quantizedTopK(queries, vecs, "id", "vec", k = 3)
      .select("neighbor_id", "qdot").as[(Long, Long)].collect().toMap
    // Hand-compute doc3 (127,64,-127) · doc1 (64,-127,32):
    assert(r(1L) == 127L * 64 - 64L * 127 - 127L * 32)
    // vs zero vector: dot 0.
    assert(r(2L) == 0L)
  }

  /** Deterministic pseudo-random unit-ish vectors for the IVF probes:
    * 40 corpus vectors in 8 dims, id-seeded (no RNG state). */
  private def ivfCorpus = (0L until 40L).map { i =>
    val rnd = new scala.util.Random(i * 7919 + 17)
    (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))
  }.toDF("id", "vec")

  test("ivfTopKQuantized probing ALL cells equals the quantized full scan exactly") {
    val corpus = ivfCorpus
    val queries = corpus.filter(col("id") < 4).select(col("id"))
    val full = Similarity.quantizedTopK(
        corpus.join(queries, Seq("id"), "left_semi"), corpus, "id", "vec", k = 5)
      .select("query_id", "neighbor_id", "qdot", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val ivf = Similarity.ivfTopKQuantized(corpus, "id", "vec", queries,
        k = 5, numCells = 6, nprobe = 6)
      .select("query_id", "neighbor_id", "qdot", "rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(ivf == full,
      s"nprobe=numCells must equal the full quantized scan\nivf=$ivf\nfull=$full")
  }

  test("ivfTopKQuantized at nprobe<cells keeps useful recall vs float brute force") {
    val corpus = ivfCorpus
    val queries = corpus.filter(col("id") < 8).select(col("id"))
    val exact = Similarity.bruteForceTopK(
        corpus.join(queries, Seq("id"), "left_semi"), corpus, "id", "vec", k = 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val approx = Similarity.ivfTopKQuantized(corpus, "id", "vec", queries,
        k = 5, numCells = 6, nprobe = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = exact.keys.map { q =>
      val hit = approx.getOrElse(q, Set.empty)
      (exact(q) & hit).size.toDouble / exact(q).size
    }.toSeq
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@5 $mean too low: $recalls")
  }

  test("incrementally maintained IVF index probes equal a from-scratch rebuild") {
    import graft.sinks.SnapshotStore
    import graft.operators.Similarity
    val dir = java.nio.file.Files.createTempDirectory("ivfinc").toString
    val root = s"$dir/t"
    val idxPath = s"$dir/ivf_index"
    def rows(ids: Seq[Long], bump: Double = 0.0) = ids.map { i =>
      (i, (0 until 8).map(j =>
        (math.sin((i * 7 + j).toDouble) + (if (j == (i % 8).toInt) 2.0 + bump else 0.0)).toFloat),
        s"p${i % 3}")
    }.toDF("id", "vec", "part")
    // Commit 1 + centroids trained ONCE on the first ingest.
    SnapshotStore.commit(spark, rows(0L until 20L), root, "part")
    val cents = Similarity.ivfCentroids(
      SnapshotStore.read(spark, root), "id", "vec", numCells = 4)
    Similarity.appendIvfForSnapshotVersion(spark, root, 1L, "id", "vec", cents, idxPath)
    val queries = Seq(1L, 5L, 13L).toDF("id")
      .join(rows(0L until 40L), Seq("id")).select(col("id"), col("vec"))
    def probeViaIndex() = Similarity.ivfProbeSnapshot(
        spark, root, idxPath, cents, queries, "id", "vec", k = 4, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    def probeRebuilt() = Similarity.ivfTopKQuantizedCodes(
        Similarity.ivfQuantizedIndex(SnapshotStore.read(spark, root), "id", "vec", cents),
        cents, queries, "id", "vec", k = 4, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(probeViaIndex() == probeRebuilt(), "after initial build")
    // Commit 2: pure inserts into existing partitions (touched
    // partitions rewrite — the old files must drop out of liveness).
    SnapshotStore.mergeCommit(spark, rows(20L until 40L), root, "id", "id", "part")
    Similarity.appendIvfForSnapshotVersion(spark, root, 2L, "id", "vec", cents, idxPath)
    assert(probeViaIndex() == probeRebuilt(), "after insert commit")
    // Commit 3: UPDATE some vectors in place — replaced files' stale
    // index rows must be ignored, the rewritten files' rows used.
    SnapshotStore.mergeCommit(spark, rows(Seq(1L, 5L, 9L), bump = 1.5),
      root, "id", "id", "part")
    Similarity.appendIvfForSnapshotVersion(spark, root, 3L, "id", "vec", cents, idxPath)
    assert(probeViaIndex() == probeRebuilt(), "after update commit")
    // The index holds rows from every commit, keyed by source file.
    assert(spark.read.parquet(idxPath).select("file").distinct().count() >
      SnapshotStore.manifest(spark, root, 3L).size / 2)
    // Commit 4: a merge-on-read DELETE — the data files (and their
    // index rows) stay live, but the deleted ids carry a DV. The probe
    // must drop them; the rebuild reads through the DV path, so
    // equality proves it.
    SnapshotStore.deleteWhereDv(spark, root, "id IN (2, 6, 21)")
    assert(probeViaIndex() == probeRebuilt(), "after DV delete")
    assert(!probeViaIndex().exists(r => Set(2L, 6L, 21L)(r._2)),
      "DV-deleted ids must not surface as neighbors")
  }

  test("ivfTopKQuantized pins the qdot-then-id tie-break") {
    // Two neighbors with IDENTICAL vectors → identical rescaled dots;
    // the lower id must rank first.
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),
      (5L, Array(0.9f, 0.1f)),
      (6L, Array(0.9f, 0.1f)),
      (9L, Array(-1.0f, 0.5f))
    ).toDF("id", "vec")
    val r = Similarity.ivfTopKQuantized(corpus, "id", "vec",
        Seq(1L).toDF("id"), k = 3, numCells = 2, nprobe = 2)
      .select("neighbor_id", "rank").as[(Long, Int)].collect().toMap
    assert(r(5L) < r(6L), s"tie must break by neighbor id: $r")
  }
}
