package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = (1L to 40L).map { i =>
    (i, if (i % 2 == 0) "en" else "de", 10L) // every doc is 10 tokens
  }.toDF("id", "lang", "tokens")

  test("sampleToTokenBudget keeps a deterministic per-stratum prefix within budget") {
    val out = Sampling.sampleToTokenBudget(corpus, $"tokens", $"id", $"lang", 70L)
    val perLang = out.groupBy($"lang").agg(count(lit(1)).as("n"),
      sum($"tokens").as("tok")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // 10-token docs, 70-token budget -> exactly 7 docs / 70 tokens per stratum.
    assert(perLang("en") == (7L, 70L) && perLang("de") == (7L, 70L))
    // Deterministic: same sample on re-run.
    val again = Sampling.sampleToTokenBudget(corpus, $"tokens", $"id", $"lang", 70L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
  }

  test("sampleToTokenBudget: a budget below the first doc keeps nothing") {
    val out = Sampling.sampleToTokenBudget(corpus, $"tokens", $"id", $"lang", 9L)
    assert(out.isEmpty)
  }

  test("sampleNPerStratum caps documents per stratum deterministically") {
    val out = Sampling.sampleNPerStratum(corpus, $"id", $"lang", 5)
    val n = out.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(n == Map("en" -> 5L, "de" -> 5L))
    // Oversized cap returns everything.
    assert(Sampling.sampleNPerStratum(corpus, $"id", $"lang", 100).count() == 40)
  }

  test("packSequences cuts each stratum's token stream at seqLen start offsets") {
    // 10-token docs, seqLen 25: start offsets 0,10,20,30,... → packs
    // 0,0,0,1,1,2,... and a doc straddles each 25-boundary.
    val out = Sampling.packSequences(corpus, $"tokens", $"id", $"lang", 25L)
      .select($"id", $"lang", $"pack_id", $"pack_offset")
      .as[(Long, String, Long, Long)].collect()
    val en = out.filter(_._2 == "en").sortBy(_._4).sortBy(_._3)
    assert(en.length == 20)
    // Offsets within a stratum are the running starts 0,10,20,...,190.
    val starts = out.filter(_._2 == "en").map(r => r._3 * 25 + r._4).sorted
    assert(starts.toSeq == (0L until 200L by 10L).toSeq)
    // Pack ids partition those starts by 25.
    assert(out.forall(r => r._3 == (r._3 * 25 + r._4) / 25))
    // Total packs per stratum = ceil(200/25) = 8.
    assert(out.filter(_._2 == "en").map(_._3).distinct.length == 8)
    // Deterministic re-run.
    val again = Sampling.packSequences(corpus, $"tokens", $"id", $"lang", 25L)
      .select($"id", $"pack_id", $"pack_offset")
      .as[(Long, Long, Long)].collect().toSet
    assert(again == out.map(r => (r._1, r._3, r._4)).toSet)
  }

  test("chunkDocuments slides fixed token windows with overlap, no degenerate tail") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 tokens
      (2L, "a b"),                             // shorter than one window
      (3L, "")                                 // empty
    ).toDF("id", "text")
    val out = Sampling.chunkDocuments(docs, $"text", $"id",
        maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // step 3 → starts 0,3,6 then stop (start 9 would be a tail already
    // covered): [t1..t4][t4..t7][t7..t10].
    assert(d1.map(_._3).toSeq == Seq("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    assert(d1.forall(_._4 == 4L))
    // Consecutive chunks share `overlap` tokens.
    assert(d1(0)._3.split(" ").last == d1(1)._3.split(" ").head)
    // Short and empty docs come through whole as chunk 0.
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, "a b", 2L)))
    assert(out.filter(_._1 == 3L).toSeq == Seq((3L, 0L, "", 0L)))
    intercept[IllegalArgumentException] {
      Sampling.chunkDocuments(docs, $"text", $"id", maxTokens = 4, overlap = 4)
    }
    // NULL text follows the same contract as empty: one whole chunk,
    // chunk_text "" and n_chunk_tokens 0 — not NULL (ANSI size(null)).
    val withNull = Seq((9L, null: String)).toDF("id", "text")
    val nulled = Sampling.chunkDocuments(withNull, $"text", $"id",
        maxTokens = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(nulled.toSeq == Seq((9L, 0L, "", 0L)),
      s"null text must chunk like empty text, got ${nulled.toSeq}")
  }

  test("assemblePacks concatenates each pack's documents in offset order") {
    val docs = (1L to 12L).map(i => (i, "en", s"doc$i word word", 3L))
      .toDF("id", "lang", "text", "tokens")
    val packed = Sampling.packSequences(docs, $"tokens", $"id", $"lang", 9L)
    val out = Sampling.assemblePacks(packed, $"text", $"lang", sep = "|")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // 12 docs × 3 tokens into 9-token packs → 4 packs of 3 docs.
    assert(out.length == 4 && out.forall(_._4 == 3L))
    // Offset order within the pack follows the deterministic md5
    // order: rebuild the expectation from the packing itself.
    val byPack = packed.orderBy($"pack_id", $"pack_offset")
      .select($"pack_id", $"text").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).mkString("|")).toMap
    assert(out.forall { case (_, pid, txt, _) => byPack(pid) == txt })
  }

  test("weightedTokenMix fills per-stratum TOKEN budgets from weights, drops unlisted strata") {
    // en quota: floor(160 × 0.75) = 120 tokens → 12 docs; de: 40 → 4.
    val out = Sampling.weightedTokenMix(corpus, $"tokens", $"id", $"lang",
      Map("en" -> 0.75, "de" -> 0.25), totalTokens = 160L)
    val perLang = out.groupBy($"lang").agg(sum($"tokens").as("tok")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang == Map("en" -> 120L, "de" -> 40L))
    // Unlisted stratum vanishes; zero-sum weights fail loudly.
    assert(Sampling.weightedTokenMix(corpus, $"tokens", $"id", $"lang",
      Map("en" -> 1.0), 100L).select($"lang").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("en"))
    intercept[IllegalArgumentException] {
      Sampling.weightedTokenMix(corpus, $"tokens", $"id", $"lang",
        Map("en" -> 0.0), 100L)
    }
  }

  test("hierarchical cumsum matches the single-window reference exactly, any bucket count") {
    // Ragged token sizes, a hot stratum, a null stratum, and ids that
    // land in many md5 shards — the hierarchical running totals must
    // equal the single-window ones byte-for-byte at every bucket count
    // (including the degenerate 1).
    val ragged = (1L to 300L).map { i =>
      val lang = if (i % 10 == 0) null else if (i % 3 == 0) "en" else "web"
      (i, lang, 1L + (i * 7919L) % 23L)
    }.toDF("id", "lang", "tokens")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val refBudget = rows(Sampling.sampleToTokenBudgetPlain(
      ragged, $"tokens", $"id", $"lang", 400L))
    val refPack = rows(Sampling.packSequencesPlain(
      ragged, $"tokens", $"id", $"lang", 128L))
    for (b <- Seq(1, 7, 64, 1024)) {
      assert(rows(Sampling.sampleToTokenBudget(
        ragged, $"tokens", $"id", $"lang", 400L, buckets = b)) == refBudget,
        s"budget sample diverged at buckets=$b")
      assert(rows(Sampling.packSequences(
        ragged, $"tokens", $"id", $"lang", 128L, buckets = b)) == refPack,
        s"packing diverged at buckets=$b")
    }
  }

  test("hierarchical cumsum equivalence holds on randomized corpora (seeded)") {
    // Randomized variant of the fixed-case equivalence: random sizes,
    // token distributions (incl. zero-token docs), stratum counts
    // (incl. null strata), budgets, sequence lengths, and bucket
    // counts. Ids stay unique — duplicate ids make the tie order
    // undefined in BOTH implementations, so they are out of contract.
    val rnd = new scala.util.Random(4242)
    for (_ <- 1 to 4) {
      val n = 50 + rnd.nextInt(400)
      val nStrata = 1 + rnd.nextInt(6)
      val offset = rnd.nextInt(1000000)
      val rows = (1 to n).map { i =>
        val lang = if (rnd.nextInt(10) == 0) null
                   else s"s${rnd.nextInt(nStrata)}"
        (i * 7919L + offset, lang, rnd.nextInt(50).toLong)
      }
      val df = rows.toDF("id", "lang", "tokens")
      val budget = 1L + rnd.nextInt(2000)
      val seqLen = 16L + rnd.nextInt(200)
      val buckets = 1 + rnd.nextInt(512)
      def rowsOf(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
      assert(rowsOf(Sampling.sampleToTokenBudget(df, $"tokens", $"id", $"lang",
          budget, buckets)) ==
        rowsOf(Sampling.sampleToTokenBudgetPlain(df, $"tokens", $"id", $"lang", budget)),
        s"budget diverged: n=$n strata=$nStrata budget=$budget buckets=$buckets")
      assert(rowsOf(Sampling.packSequences(df, $"tokens", $"id", $"lang",
          seqLen, buckets)) ==
        rowsOf(Sampling.packSequencesPlain(df, $"tokens", $"id", $"lang", seqLen)),
        s"packing diverged: n=$n strata=$nStrata seqLen=$seqLen buckets=$buckets")
    }
  }

  test("sampling rejects inputs whose columns collide with internal names") {
    val bad = corpus.withColumn("__bk", lit(1))
    val e = intercept[IllegalArgumentException] {
      Sampling.sampleToTokenBudget(bad, $"tokens", $"id", $"lang", 70L)
    }
    assert(e.getMessage.contains("__bk"))
  }

  test("weightedMix fills per-stratum quotas, drops unlisted strata, under-fills small ones") {
    val mixed = corpus.unionByName(
      Seq((100L, "zh", 10L), (101L, "zh", 10L)).toDF("id", "lang", "tokens"))
    val out = Sampling.weightedMix(mixed, $"id", $"lang",
      Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.25), total = 16L)
    val n = out.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // Quotas: en 8, de 4, zh 4 — but zh only has 2 rows (under-fill).
    assert(n == Map("en" -> 8L, "de" -> 4L, "zh" -> 2L))
    // A stratum absent from the weights never appears.
    val noDe = Sampling.weightedMix(mixed, $"id", $"lang",
      Map("en" -> 1.0), total = 10L)
    assert(noDe.select($"lang").distinct().as[String].collect().toSeq == Seq("en"))
  }
}
