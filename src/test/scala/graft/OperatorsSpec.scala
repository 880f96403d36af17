package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, RangeJoin, Similarity, Upsert}
import graft.functions.{TextAnalysis, Vectors}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "The quick brown fox jumps over the lazy dog!"),  // case/punct dup of 1
    (4L, "entirely different content about spark pipelines"),
    (5L, "the quick brown fox jumps over the lazy cat"))   // near dup of 1

  private def df = docs.toDF("id", "text")

  test("exactKeepFirst keeps the lowest id per exact text") {
    val kept = Dedup.exactKeepFirst(df, $"text", $"id").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(1L, 3L, 4L, 5L))
  }

  test("exactGroups counts duplicates") {
    val g = Dedup.exactGroups(df, $"text", $"id")
      .filter($"n_dups" > 1).collect()
    assert(g.length == 1 && g(0).getLong(1) == 2 && g(0).getLong(2) == 1L)
  }

  test("fingerprintGroups unifies case/punctuation variants") {
    val g = Dedup.fingerprintGroups(df, $"text", $"id")
      .filter($"n_dups" > 1).collect()
    assert(g.length == 1 && g(0).getLong(1) == 3 && g(0).getLong(2) == 1L)
  }

  test("minHashPairs finds exact and near duplicates, not unrelated docs") {
    for (fast <- Seq(false, true)) {
      val pairs = Dedup.minHashPairs(df, $"text", $"id",
        numHashes = 32, bands = 8, threshold = 0.5, fastHash = fast)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)), s"fastHash=$fast")
      assert(!pairs.exists { case (a, b) => a == 4L || b == 4L }, s"fastHash=$fast")
    }
  }

  test("dedupIncremental drops index matches and within-batch later dups, keeps fresh docs") {
    for (fast <- Seq(false, true)) {
      // Accepted corpus: docs 1 and 4. New batch: 11 ~ dup of 1 (vs
      // index), 12 fresh, 13 ~ dup of 12 (within batch, later id), 14
      // exact dup of 11 (whose match came from the index — transitive
      // drop), 15 fresh.
      val index = Dedup.minHashIndex(
        Seq((1L, "the quick brown fox jumps over the lazy dog"),
          (4L, "entirely different content about spark pipelines"))
          .toDF("id", "text"),
        $"text", $"id", numHashes = 32, bands = 8, fastHash = fast)
      val batch = Seq(
        (11L, "the quick brown fox jumps over the lazy dog"),
        (12L, "completely novel material on distributed query planning"),
        (13L, "completely novel material on distributed query planning today"),
        (14L, "the quick brown fox jumps over the lazy dog"),
        (15L, "a third topic nothing else resembles in any way at all"))
        .toDF("id", "text")
      val kept = Dedup.dedupIncremental(batch, $"text", $"id", index,
        numHashes = 32, bands = 8, threshold = 0.5, fastHash = fast)
        .select("id").as[Long].collect().toSet
      assert(kept == Set(12L, 15L), s"fastHash=$fast: got $kept")
    }
  }

  test("minHashIndex rows rebuild minHashPairs' exact candidate structure") {
    // The persisted index must be re-probe-able: pairing the index
    // against itself on (band, bucket) reproduces minHashPairs' pairs.
    val idx = Dedup.minHashIndex(df, $"text", $"id", numHashes = 32, bands = 8)
    val viaIndex = idx.as("l").join(idx.as("r"),
        Seq("band", "bucket"))
      .filter($"l.id" < $"r.id").select($"l.id", $"r.id")
      .distinct().as[(Long, Long)].collect().toSet
    val direct = Dedup.minHashPairs(df, $"text", $"id",
        numHashes = 32, bands = 8, threshold = 0.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(direct.subsetOf(viaIndex))
    assert(idx.columns.toSeq == Seq("id", "sig", "band", "bucket"))
  }

  test("simHashPairs finds near-dup cluster and skips unrelated docs") {
    val pairs = Dedup.simHashPairs(df, $"text", $"id", bits = 48, bands = 8, maxHamming = 7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("benchmarkOverlap flags exact, partial, and zero train/eval contamination") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),          // = bench 10 → 100%
      (2L, "alpha beta gamma zeta eta theta"),         // shares a prefix → partial
      (3L, "one two three four five six"),             // clean
      (4L, "hi")                                       // shorter than a shingle
    ).toDF("id", "text")
    val bench = Seq(
      (10L, "alpha beta gamma delta epsilon"),
      (11L, "totally different benchmark prompt")).toDF("bid", "btext")
    val out = Dedup.benchmarkOverlap(corpus, $"text", $"id",
        bench, $"btext", $"bid", shingleWidth = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getSeq[Long](4)))).toMap
    // doc 1: 3 shingles, all in bench 10.
    assert(out(1L) == ((3L, 3L, 1.0, Seq(10L))))
    // doc 2: 4 shingles, only "alpha beta gamma" matches.
    assert(out(2L)._1 == 4L && out(2L)._2 == 1L && out(2L)._4 == Seq(10L))
    assert(math.abs(out(2L)._3 - 0.25) < 1e-9)
    // doc 3: clean — zero overlap, EMPTY id list (not null).
    assert(out(3L) == ((4L, 0L, 0.0, Seq.empty[Long])))
    // doc 4: shorter than the width still gets its whole-text shingle.
    assert(out(4L)._1 == 1L && out(4L)._2 == 0L)
    // A shingle matching MULTIPLE bench rows must not multiply counts.
    val bench2 = bench.unionByName(
      Seq((12L, "alpha beta gamma delta epsilon")).toDF("bid", "btext"))
    val multi = Dedup.benchmarkOverlap(corpus, $"text", $"id",
        bench2, $"btext", $"bid", shingleWidth = 3)
      .filter($"id" === 1L).collect().head
    assert(multi.getLong(1) == 3L && multi.getLong(2) == 3L &&
      multi.getSeq[Long](4) == Seq(10L, 12L))
  }

  test("lineDedup drops corpus-frequent lines, keeps order, empties but never loses docs") {
    val docs = Seq(
      (1L, "COOKIE BANNER\nreal content one\nNAV MENU"),
      (2L, "COOKIE BANNER\nreal content two\nNAV MENU"),
      (3L, "COOKIE BANNER\nunique text here\nNAV MENU"),
      (4L, "COOKIE BANNER\nNAV MENU"),              // all boilerplate
      (5L, "standalone document")
    ).toDF("id", "text")
    val out = Dedup.lineDedup(docs, $"text", $"id", maxOccurrences = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // Both 4×/3×-repeated lines vanish everywhere; unique lines keep order.
    assert(out(1L) == "real content one")
    assert(out(2L) == "real content two")
    assert(out(3L) == "unique text here")
    assert(out(4L) == "", "fully-boilerplate doc must survive as empty, not vanish")
    assert(out(5L) == "standalone document")
    assert(out.size == 5)
    // At the threshold boundary: a line occurring EXACTLY maxOccurrences
    // times survives.
    val twice = Dedup.lineDedup(docs.filter($"id" <= 2), $"text", $"id",
        maxOccurrences = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(twice(1L) == "COOKIE BANNER\nreal content one\nNAV MENU")
    // Cross-DOCUMENT convention: a line repeated 3x inside ONE document
    // is that document's structure, not corpus boilerplate — it counts
    // once toward the frequency threshold and survives.
    val inDoc = Seq(
      (1L, "la\nla\nla\nbody"),
      (2L, "other text")
    ).toDF("id", "text")
    val kept = Dedup.lineDedup(inDoc, $"text", $"id", maxOccurrences = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept(1L) == "la\nla\nla\nbody",
      "within-document repeats must not trip the corpus-wide threshold")
  }

  test("connectedComponents adversarial worst case: a path graph converges in O(log n) rounds") {
    // A 16384-node chain is the deepest possible component for its
    // size: naive min-propagation needs n rounds to reach the far end.
    // Pointer jumping must close it in ~log2(n) rounds — this is the
    // empirical pin of the O(log n) claim in the scaladoc, and the
    // difference between 14 shuffles and 16k shuffles at 100 TB.
    val n = 1 << 14
    val chain = spark.range(n - 1)
      .select($"id".as("id_a"), ($"id" + 1).as("id_b"))
    val (labels, iters) = Dedup.connectedComponentsIters(chain, maxIter = 40)
    val agg = labels.agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when($"component" =!= 0L, 1L).otherwise(0L)))
      .collect()(0)
    assert(agg.getLong(0) == n, s"all $n chain nodes must be labeled")
    assert(agg.getLong(1) == 0L, "every node must collapse to component 0")
    val bound = math.ceil(math.log(n) / math.log(2)).toInt + 3
    assert(iters <= bound,
      s"path graph took $iters rounds; pointer jumping should need <= $bound")
  }

  test("dedupCorpus keep-first: drops every doc that collides with a lower id") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupCorpus(df, pairs, $"id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L) && !kept.contains(2L) && !kept.contains(3L))
    assert(kept.contains(4L)) // never paired -> survives
  }

  test("connectedComponents: transitive closure maps every node to its component min") {
    // Two components ({1,2,3,5} via a chain through larger ids, {7,8})
    // plus a 20-node chain that needs several propagation rounds.
    val chain = (100L until 119L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 3L), (2L, 3L), (3L, 5L), (7L, 8L)) ++ chain)
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 5L).forall(comps(_) == 1L))
    assert(comps(7L) == 7L && comps(8L) == 7L)
    assert((100L to 119L).forall(comps(_) == 100L))
  }

  test("dedupCorpusClusters keeps one doc per component where keep-first over-keeps") {
    // 1-3 and 2-3 are similar pairs: keep-first retains both 1 and 2
    // (2's only neighbour is larger), cluster dedup retains only 1.
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val keepFirst = Dedup.dedupCorpus(df, pairs, $"id")
      .select("id").collect().map(_.getLong(0)).toSet
    val clustered = Dedup.dedupCorpusClusters(df, pairs, $"id")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keepFirst == Set(1L, 2L, 4L, 5L))
    assert(clustered == Set(1L, 4L, 5L))
  }

  test("dedupCorpusClustersBy keeps the best-quality member per cluster") {
    // Component {1,2,3}: doc 3 has the longest text (trailing '!') so
    // the quality policy keeps 3 where min-id policy keeps 1; ties
    // (1 vs 2, equal length) would break to the lower id.
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.dedupCorpusClustersBy(df, pairs, $"id", length($"text"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L, 5L))
    val tiePairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val tied = Dedup.dedupCorpusClustersBy(df, tiePairs, $"id", length($"text"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tied == Set(1L, 3L, 4L, 5L))
  }

  test("ngramJaccardPairs: exact dups score 1.0; candidates overload restricts scoring") {
    val all = Dedup.ngramJaccardPairs(df, $"text", $"id", 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == Set((1L, 2L), (1L, 3L), (2L, 3L)))

    val cand = Seq((1L, 4L), (1L, 2L)).toDF("id_a", "id_b")
    val scored = Dedup.ngramJaccardFor(df, $"text", $"id", cand)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(scored.size == 2)
    assert(scored((1L, 2L)) == 1.0 && scored((1L, 4L)) == 0.0)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim toy corpus: 1≈2 (same direction), 3 orthogonal, 4 opposite.
  private val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f)))
  private def df = vecs.toDF("id", "vec")

  test("vector math: dot, norm, cosine") {
    val r = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(Vectors.dot($"a", $"b"), Vectors.norm($"a"), Vectors.cosine($"a", $"a"))
      .collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(5)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val q = df.filter($"id" === 1)
    val top = Similarity.bruteForceTopK(q, df, "id", "vec", 2)
      .orderBy($"rank").collect()
    assert(top.map(_.getLong(1)).toSeq == Seq(2L, 3L)) // 2 closest, 3 orthogonal, 4 excluded-by-rank
    assert(top(0).getInt(3) == 1)
  }

  test("nearDupPairs exact path finds the aligned pair only") {
    val pairs = Similarity.nearDupPairs(df, "id", "vec", threshold = 0.9, bucketed = false)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("bucketed LSH: same-direction vectors share a bucket, opposite do not") {
    val b = Similarity.lshBuckets(df, "id", "vec", df, numAnchors = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b(1L) == b(2L))
    assert(b(1L) != b(4L))
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val tiers = Seq((1, Some(9), "small"), (10, Some(24), "mid"), (25, None, "bulk"))
    .toDF("min_q", "max_q", "tier")
  private val facts = Seq((100L, 1), (101L, 9), (102L, 10), (103L, 24), (104L, 25), (105L, 9999))
    .toDF("id", "qty")

  test("resolveTier: inclusive bounds, open-ended last tier") {
    val r = RangeJoin.resolveTier(facts, tiers, $"qty", $"min_q", $"max_q")
      .select("id", "tier").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r == Map(100L -> "small", 101L -> "small", 102L -> "mid",
      103L -> "mid", 104L -> "bulk", 105L -> "bulk"))
  }

  test("resolveAsOf keeps all fact columns and picks greatest min <= value") {
    val t = Seq((1, "a"), (10, "b"), (100, "c")).toDF("thr", "band")
    val r = RangeJoin.resolveAsOf(facts, Seq("id"), t, $"qty", $"thr")
      .select("id", "qty", "band").collect()
      .map(x => x.getLong(0) -> (x.getInt(1), x.getString(2))).toMap
    assert(r(100L) == (1, "a") && r(102L) == (10, "b") && r(105L) == (9999, "c"))
  }

  test("bucketedRangeJoin matches the nested-loop result") {
    val nested = RangeJoin.resolveTier(facts, tiers, $"qty", $"min_q", $"max_q")
      .select("id", "tier").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bucketed = RangeJoin.bucketedRangeJoin(facts, tiers, $"qty", $"min_q", $"max_q",
        bucketWidth = 8, maxValue = 10000)
      .select("id", "tier").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bucketed == nested)
  }

  test("resolveBands2D resolves area x quantity grid") {
    val bands = Seq((0, Some(10), 1, Some(49), "A"), (0, Some(10), 50, None, "B"))
      .toDF("a_min", "a_max", "q_min", "q_max", "price")
    val f = Seq((1L, 5, 10), (2L, 5, 60)).toDF("id", "area", "qty")
    val r = RangeJoin.resolveBands2D(f, bands, $"area", $"a_min", $"a_max", $"qty", $"q_min", $"q_max")
      .select("id", "price").collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "A", 2L -> "B"))
  }
}

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private val existing = Seq((1L, 1L, "old1"), (2L, 1L, "old2")).toDF("k", "v", "payload")
  private val incoming = Seq((2L, 2L, "new2"), (3L, 1L, "new3")).toDF("k", "v", "payload")

  test("merge: last version wins, incoming beats existing on tie") {
    val m = Upsert.merge(existing, incoming, "k", "v")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(m == Map(1L -> "old1", 2L -> "new2", 3L -> "new3"))
    // tie on version: incoming wins
    val tie = Upsert.merge(existing, Seq((1L, 1L, "tied")).toDF("k", "v", "payload"), "k", "v")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(tie(1L) == "tied")
  }

  test("merge is idempotent (merging the same batch twice = once)") {
    val once = Upsert.merge(existing, incoming, "k", "v")
    val twice = Upsert.merge(once, incoming, "k", "v")
    assert(once.collect().toSet == twice.collect().toSet)
  }

  test("mergeIntoParquet rewrites only touched partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/t"
    val b1 = Seq((1L, 1L, "a", "s1"), (2L, 1L, "b", "s2")).toDF("k", "v", "p", "part")
    Upsert.mergeIntoParquet(spark, b1, dir, "k", "v", "part")
    val b2 = Seq((1L, 2L, "a2", "s1")).toDF("k", "v", "p", "part")
    Upsert.mergeIntoParquet(spark, b2, dir, "k", "v", "part")
    val r = spark.read.parquet(dir).collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r == Map(1L -> "a2", 2L -> "b"))
  }

  test("empty-string partition values survive successive keyed merges") {
    import graft.operators.Upsert
    val dir = java.nio.file.Files.createTempDirectory("upsert_empty_part").toString + "/t"
    // Spark files BOTH null and "" under __HIVE_DEFAULT_PARTITION__ —
    // the second merge must read the first one's rows back, or the
    // dynamic overwrite silently destroys them.
    Upsert.mergeIntoParquet(spark,
      Seq(("k1", "", 1)).toDF("id", "part", "v"), dir, "id", "v", "part")
    Upsert.mergeIntoParquet(spark,
      Seq(("k2", "", 1)).toDF("id", "part", "v"), dir, "id", "v", "part")
    val rows = spark.read.parquet(dir).select("id").as[String].collect().sorted.toSeq
    assert(rows == Seq("k1", "k2"), s"empty-string partition lost rows: $rows")
  }

  test("deleteByKeys / deleteWhere / duplicateKeys") {
    val t = Seq((1L, "x"), (2L, "y"), (2L, "z"), (3L, "w")).toDF("k", "v")
    assert(Upsert.deleteByKeys(t, Seq(2L).toDF("k"), "k").count() == 2)
    assert(Upsert.deleteWhere(t, $"v" === "x").count() == 3)
    val dups = Upsert.duplicateKeys(t, "k").collect()
    assert(dups.length == 1 && dups(0).getLong(0) == 2L)
  }

  test("deleteByKeys never forces a broadcast of the id set") {
    // A bulk GDPR purge ships an UNBOUNDED id list through K3: a
    // forced broadcast hint would bypass AQE's size check and OOM the
    // driver at scale. The anti-join must be unhinted — AQE may still
    // CHOOSE broadcast when the set proves small, so the pin is on
    // the hint (analyzed plan), not the executed strategy.
    val target = spark.range(0, 500000).toDF("k")
      .withColumn("v", col("k") % 7)
    val ids = spark.range(0, 150000, 3).toDF("k")
    val out = Upsert.deleteByKeys(target, ids, "k")
    val analyzed = out.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint") &&
      !analyzed.toLowerCase.contains("broadcast"),
      s"K3 must not hint a broadcast of an unbounded id set:\n$analyzed")
    assert(out.count() == 500000L - 50000L)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("qualityLogit ranks prose above noise; qualityProb is its sigmoid") {
    val rows = Seq(
      ("prose", "the cat sat on the mat and the dog lay in the sun for hours"),
      ("caps", "BUY NOW!!! AMAZING DEAL!!! CLICK HERE!!! WOW!!! SALE!!!"),
      ("punct", "@#$% ^&*() !!! ;;; ::: ~~~ ??? ///"),
      ("empty", ""))
      .toDF("label", "t")
      .select($"label", TextAnalysis.qualityLogit($"t").as("logit"),
        TextAnalysis.qualityProb($"t").as("p"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(rows("prose")._1 > rows("caps")._1)
    assert(rows("prose")._1 > rows("punct")._1)
    assert(rows("prose")._1 > 0 && rows("punct")._1 < 0)
    // Sigmoid: strictly monotone in the logit, bounded in (0, 1).
    for ((l, p) <- rows.values) assert(p > 0.0 && p < 1.0 &&
      math.abs(p - 1.0 / (1.0 + math.exp(-l))) < 1e-12)
    // Empty text: every ratio guards to 0 — the score is finite (the
    // bias), not NaN.
    assert(!rows("empty")._1.isNaN)
  }

  test("token and sub-token counts") {
    val r = Seq("Hello, world! 42 times").toDF("t")
      .select(TextAnalysis.tokenCount($"t"), TextAnalysis.subTokenCount($"t")).collect()(0)
    assert(r.getInt(0) == 4)
    // Hello , world ! 42 times -> 6 subtokens
    assert(r.getInt(1) == 6)
  }

  test("normalization and fingerprint equality across case/punct") {
    val r = Seq(("The QUICK fox.", "the quick fox")).toDF("a", "b")
      .select(TextAnalysis.fingerprint($"a") === TextAnalysis.fingerprint($"b")).collect()(0)
    assert(r.getBoolean(0))
  }

  test("shingles: w=3 over tokens; short docs collapse to one shingle") {
    val r = Seq("a b c d").toDF("t")
      .select(TextAnalysis.shingles($"t", 3).as("s")).collect()(0).getSeq[String](0)
    assert(r == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextAnalysis.shingles($"t", 3).as("s")).collect()(0).getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("language detection picks stopword-majority language, und when none") {
    val r = Seq("the cat and the dog is here", "el gato y la casa de que",
      "xyzzy plugh").toDF("t")
      .select(TextAnalysis.detectLanguage($"t").as("l")).collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "es", "und"))
  }

  test("quality features ratios") {
    val r = Seq("The cat, the hat!").toDF("t")
      .select(TextAnalysis.qualityFeatures($"t").as("q"))
      .select("q.n_chars", "q.n_tokens", "q.punct_ratio", "q.stopword_ratio").collect()(0)
    assert(r.getLong(0) == 17 && r.getLong(1) == 4)
    assert(r.getDouble(2) == 2.0 / 17)
    assert(r.getDouble(3) == 0.5) // 'the' twice of 4 tokens ('The' counts after lower)
  }

  test("PII redaction replaces emails, IPs, and phones with typed tokens") {
    val text = "mail john.doe+x@corp.example.org, call +1 (555) 010-7788, " +
      "server 10.0.0.1 ok"
    val r = Seq(text).toDF("t")
      .select(TextAnalysis.redactPii($"t").as("red"),
        TextAnalysis.piiCounts($"t").as("c"))
      .select($"red", $"c.emails", $"c.ips", $"c.phones").collect()(0)
    assert(r.getString(0) == "mail <EMAIL>, call <PHONE>, server <IP> ok")
    assert(r.getInt(1) == 1 && r.getInt(2) == 1 && r.getInt(3) == 1)
    // Digits inside an email never double-count as a phone; an IP's
    // digit runs never count as a phone either (ordered rewrite).
    val r2 = Seq("a12345678@ex.io and 192.168.0.254 only").toDF("t")
      .select(TextAnalysis.piiCounts($"t").as("c"))
      .select($"c.emails", $"c.ips", $"c.phones").collect()(0)
    assert(r2.getInt(0) == 1 && r2.getInt(1) == 1 && r2.getInt(2) == 0)
  }

  test("duplicate-shingle ratio: 0 for diverse text, high for looped phrases") {
    val df = Seq("a b c a b c a b c", "one two three four five six").toDF("t")
      .select($"t", TextAnalysis.tokens($"t").as("ws"))
      .select(TextAnalysis.duplicateShingleRatio(
        TextAnalysis.shinglesOf($"ws")).as("r"))
    val rs = df.collect().map(_.getDouble(0))
    // 7 shingles, 3 distinct (abc/bca/cab) -> 1 - 3/7
    assert(math.abs(rs(0) - (1.0 - 3.0 / 7.0)) < 1e-9)
    assert(rs(1) == 0.0)
  }

  test("winnowing fingerprint: compact, deterministic, and shared-run guarantee") {
    import graft.functions.TextAnalysis
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"alpha beta gamma $common delta epsilon"),
      (2L, s"one two three four five $common six seven"),
      (3L, "entirely different content with no overlap at all whatsoever"))
      .toDF("id", "text")
    val fp = docs
      .select($"id", TextAnalysis.tokens(TextAnalysis.normalized($"text")).as("ws"))
      .select($"id", TextAnalysis.shinglesOf($"ws", 3).as("sh"))
      .select($"id", size($"sh").as("n_sh"),
        TextAnalysis.winnowFingerprintOf($"sh", 4).as("fp"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getSeq[String](2).toSet))).toMap
    // Compact: selected hashes are a strict subset of all shingle hashes.
    assert(fp(1)._2.size < fp(1)._1)
    // Winnowing guarantee: a shared token run of >= w + window - 1
    // tokens forces at least one COMMON selected hash.
    assert(fp(1)._2.intersect(fp(2)._2).nonEmpty)
    // Disjoint content shares nothing.
    assert(fp(1)._2.intersect(fp(3)._2).isEmpty)
    // Short doc (< window shingles) still fingerprints (single min).
    val short = Seq((9L, "tiny doc")).toDF("id", "text")
      .select(TextAnalysis.winnowFingerprint($"text").as("fp"))
      .as[Seq[String]].head()
    assert(short.size == 1)
  }
}
