package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotStore

/** Join-time file skipping ([[DynamicPruning]]): a dim slice's keys
  * prune fact FILES before the join plans, results are identical to
  * the plain join by construction, and every bound degrades to the
  * unpruned join — never to wrong rows. */
class DynamicPruningSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("dfp").toString}/fact"

  /** Range-partitioned fact: 10 partitions of 1000 keys each, so each
    * file carries a tight [min,max] on k — the layout-correlated shape
    * dynamic pruning exists for. */
  private def seedRanged(root: String): Unit = {
    val df = (0 until 10000).map(i => (i.toLong, i % 97, (i / 1000).toString))
      .toDF("k", "v", "part")
    SnapshotStore.commit(spark, df, root, "part")
  }

  private def dimSlice(lo: Long, hi: Long): DataFrame =
    (lo until hi).map(i => (i, s"d$i")).toDF("dk", "dv")

  test("inner join: identical values, strictly fewer candidate files") {
    val root = freshRoot()
    seedRanged(root)
    val dim = dimSlice(8000, 8500)
    val (pruned, idx, engaged) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dim, "dk")
    val got = pruned.select(col("k"), col("v"), col("dv"))
      .orderBy("k").collect().toSeq
    assert(engaged)
    assert(got.size == 500)
    assert(idx.lastCandidateFiles < idx.totalFiles,
      s"expected file skipping: ${idx.lastCandidateFiles}/${idx.totalFiles}")
    val plain = SnapshotStore.table(spark, root)
      .join(dim, col("k") === col("dk"))
      .select(col("k"), col("v"), col("dv")).orderBy("k").collect().toSeq
    assert(got == plain)
  }

  test("left_semi join: same rows as the unpruned semi-join") {
    val root = freshRoot()
    seedRanged(root)
    val dim = dimSlice(2000, 2100)
    val (pruned, idx, _) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dim, "dk", joinType = "left_semi")
    val got = pruned.orderBy("k").collect().toSeq
    assert(got.size == 100 && idx.lastCandidateFiles < idx.totalFiles)
    val plain = SnapshotStore.table(spark, root)
      .join(dim, col("k") === col("dk"), "left_semi")
      .orderBy("k").collect().toSeq
    assert(got == plain)
  }

  test("over-limit key sets fall back to the plain join — values intact, no probe explosion") {
    val root = freshRoot()
    seedRanged(root)
    val dim = dimSlice(0, 5000)
    val (pruned, idx, engaged) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dim, "dk", maxKeys = 100)
    assert(!engaged)
    assert(pruned.count() == 5000)
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "fallback must not sneak a partial filter in")
  }

  test("null dim keys are dropped from the probe, not poisoning the pushdown") {
    val root = freshRoot()
    seedRanged(root)
    val dim = (Seq[(java.lang.Long, String)]((9000L, "a"), (null, "b"), (9001L, "c")))
      .toDF("dk", "dv")
    val (pruned, idx, engaged) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dim, "dk")
    assert(engaged)
    assert(pruned.select("k").as[Long].collect().sorted.toSeq == Seq(9000L, 9001L))
    assert(idx.lastCandidateFiles < idx.totalFiles,
      "a null key must not defeat the In-list translation")
  }

  test("outer joins refuse loudly — filtering the fact first would drop their rows") {
    val e = intercept[IllegalArgumentException](
      DynamicPruning.joinPruned(spark, "/nowhere", "k",
        dimSlice(0, 1), "dk", joinType = "left_outer"))
    assert(e.getMessage.contains("inner/left_semi"))
  }

  test("empty dim slice: empty join, no scan work") {
    val root = freshRoot()
    seedRanged(root)
    val (pruned, _, engaged) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", dimSlice(0, 0), "dk")
    assert(engaged && pruned.count() == 0)
  }

  // ---- the TRANSPARENT rule (graft.sinks.DynamicPruningRule) ----

  /** Run `body` with the opt-in rule armed. */
  private def withRule[A](maxKeys: Option[Int] = None)(body: => A): A = {
    spark.conf.set(graft.sinks.DynamicPruningRule.EnabledConf, "true")
    maxKeys.foreach(k => spark.conf.set(
      graft.sinks.DynamicPruningRule.MaxKeysConf, k.toString))
    try body finally {
      spark.conf.unset(graft.sinks.DynamicPruningRule.EnabledConf)
      spark.conf.unset(graft.sinks.DynamicPruningRule.MaxKeysConf)
    }
  }

  /** A fresh ranged fact + its index, registered as temp view `fact`. */
  private def sqlFixture(): graft.sinks.GraftFileIndex = {
    val root = freshRoot()
    seedRanged(root)
    val (df, idx) = SnapshotStore.tableWithIndex(spark, root)
    df.createOrReplaceTempView("fact")
    idx
  }

  test("rule: a PLAIN SQL equi-join gets file skipping with zero API calls — values identical to the unpruned run") {
    val idx = sqlFixture()
    dimSlice(8000, 8500).createOrReplaceTempView("dim")
    val q = "SELECT k, v, dv FROM fact JOIN dim ON k = dk ORDER BY k"
    val plain = spark.sql(q).collect().toSeq
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "rule must be OFF by default — plans elsewhere stay untouched")
    val got = withRule() { spark.sql(q).collect().toSeq }
    assert(got == plain && got.size == 500)
    assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
      s"transparent pruning must engage: ${idx.lastCandidateFiles}/${idx.totalFiles}")
  }

  test("rule: DataFrame .join gets the same treatment; left_semi prunes the left fact") {
    val root = freshRoot()
    seedRanged(root)
    val (fact, idx) = SnapshotStore.tableWithIndex(spark, root)
    val dim = dimSlice(3000, 3200)
    val got = withRule() {
      fact.join(dim, col("k") === col("dk"), "left_semi")
        .orderBy("k").collect().toSeq
    }
    assert(got.size == 200)
    assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
      s"semi-join pruning: ${idx.lastCandidateFiles}/${idx.totalFiles}")
    val plain = fact.join(dim, col("k") === col("dk"), "left_semi")
      .orderBy("k").collect().toSeq
    assert(got == plain)
  }

  test("rule: over-limit dims fall back to ALL files — never a partial filter") {
    val idx = sqlFixture()
    dimSlice(0, 5000).createOrReplaceTempView("dim")
    val got = withRule(maxKeys = Some(100)) {
      spark.sql("SELECT count(*) AS n FROM fact JOIN dim ON k = dk")
        .collect()(0).getLong(0)
    }
    assert(got == 5000)
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "over-limit fallback must not sneak a partial filter in")
  }

  test("rule: outer joins never match — unmatched fact rows survive") {
    val idx = sqlFixture()
    dimSlice(8000, 8010).createOrReplaceTempView("dim")
    val got = withRule() {
      spark.sql("SELECT count(*) AS n FROM fact LEFT JOIN dim ON k = dk")
        .collect()(0).getLong(0)
    }
    assert(got == 10000, "every fact row must survive the left join")
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "an outer join must not be pruned")
  }

  test("rule: nondeterministic dims are refused — probe and join could disagree") {
    val idx = sqlFixture()
    val dim = dimSlice(8000, 9000)
      .filter(rand(42) >= 0.0) // always true, but nondeterministic
    val got = withRule() {
      SnapshotStore.table(spark,
        idx.tableRoot.get).join(dim, col("k") === col("dk")).count()
    }
    assert(got == 1000)
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "a nondeterministic dim must not be probed")
  }

  test("rule: empty (post-filter) dim collapses the join to empty — no scan work") {
    sqlFixture()
    dimSlice(0, 100).filter(col("dk") > 1000000).createOrReplaceTempView("dim")
    val got = withRule() {
      spark.sql("SELECT count(*) AS n FROM fact JOIN dim ON k = dk")
        .collect()(0).getLong(0)
    }
    assert(got == 0)
  }

  test("rule: idempotent under the fixed-point batch — exactly one In-list reaches the scan") {
    sqlFixture()
    dimSlice(500, 600).createOrReplaceTempView("dim")
    withRule() {
      val plan = spark.sql("SELECT k, dv FROM fact JOIN dim ON k = dk")
        .queryExecution.optimizedPlan
      val inLists = plan.collect { case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case i: org.apache.spark.sql.catalyst.expressions.In => i
          case i: org.apache.spark.sql.catalyst.expressions.InSet => i
        }.size
      }.sum
      assert(inLists == 1,
        s"the rewrite must fire exactly once, got $inLists In-lists:\n$plan")
    }
  }

  test("rule: a SINGLE-key dim stays idempotent — OptimizeIn folds the In to EqualTo and the rule must recognize it") {
    val idx = sqlFixture()
    // One dim row, filtered on the NON-key column so neither
    // constraint propagation nor the user supplies a key predicate —
    // only the probe can. The injected 1-element In-list becomes
    // EqualTo within the same optimizer batch; without the equality
    // case in the idempotence check the rule would re-probe on every
    // fixed-point iteration and stack duplicate predicates.
    Seq((8400L, "hot"), (1L, "cold")).toDF("dk", "dv")
      .filter(col("dv") === "hot").createOrReplaceTempView("dim")
    withRule() {
      val q = spark.sql("SELECT k, v FROM fact JOIN dim ON k = dk")
      val keyPreds = q.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case i: org.apache.spark.sql.catalyst.expressions.In => i: Any
            case i: org.apache.spark.sql.catalyst.expressions.InSet => i: Any
            case e @ org.apache.spark.sql.catalyst.expressions.EqualTo(
              _: org.apache.spark.sql.catalyst.expressions.AttributeReference,
              _: org.apache.spark.sql.catalyst.expressions.Literal) => e: Any
          }.size
      }.sum
      assert(keyPreds == 1,
        s"exactly one key predicate must survive, got $keyPreds:\n" +
          q.queryExecution.optimizedPlan)
      val got = q.collect()
      assert(got.length == 1 && got(0).getLong(0) == 8400L)
      assert(idx.lastCandidateFiles == 1,
        s"single-key pruning must open 1 file: ${idx.lastCandidateFiles}")
    }
  }

  test("rule: an UNFILTERED dim never probes — inferred IsNotNull is not selectivity") {
    sqlFixture()
    // A plain parquet dim with NO user filter: constraint inference
    // will stamp IsNotNull(dk) on the join child, which must not
    // count as "filtered" — probing an unfiltered dim is wasted
    // planning work and injects an unselective In-list.
    val dimPath = java.nio.file.Files.createTempDirectory("dfp_nofilter")
      .toString + "/dim"
    dimSlice(0, 500).write.parquet(dimPath)
    spark.read.parquet(dimPath).createOrReplaceTempView("dim")
    withRule() {
      val q = spark.sql("SELECT count(*) AS n FROM fact JOIN dim ON k = dk")
      val keyLists = q.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case i: org.apache.spark.sql.catalyst.expressions.In => i: Any
            case i: org.apache.spark.sql.catalyst.expressions.InSet => i: Any
          }.size
      }.sum
      assert(keyLists == 0,
        s"no In-list may be injected for an unfiltered dim:\n" +
          q.queryExecution.optimizedPlan)
      assert(q.collect()(0).getLong(0) == 500)
    }
  }

  test("rule: a DV-wrapped fact still prunes — the descent resolves through the anti-join wrapper") {
    // A fact that ever absorbed a DELETE reads through the
    // merge-on-read anti-join (the NORMAL state of a long-lived
    // table). The rule resolves through it to the GraftFileIndex;
    // the In-list pushes below the wrapper, and DV row filtering
    // still applies above — deleted rows stay deleted.
    val root = freshRoot()
    seedRanged(root)
    graft.sinks.SnapshotStore.deleteWhereDv(spark, root, "k % 1000 = 7")
    val (fact, idx) = SnapshotStore.tableWithIndex(spark, root)
    fact.createOrReplaceTempView("fact")
    dimSlice(8000, 8500).createOrReplaceTempView("dim")
    val q = "SELECT k, v, dv FROM fact JOIN dim ON k = dk ORDER BY k"
    val plain = spark.sql(q).collect().toSeq
    assert(plain.size == 499, "the DV must have removed k=8007 from the plain join")
    val got = withRule() { spark.sql(q).collect().toSeq }
    assert(got == plain, "pruned and plain DV reads must be value-identical")
    assert(!got.exists(_.getLong(0) == 8007L), "deleted rows must stay deleted")
    assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
      s"DV wrapper must not defeat pruning: ${idx.lastCandidateFiles}/${idx.totalFiles}")
  }

  test("rule: a column-mapped (renamed-key) fact still prunes through the alias projection") {
    val root = freshRoot()
    seedRanged(root)
    SnapshotStore.renameColumn(spark, root, "k", "kk")
    val (fact, idx) = SnapshotStore.tableWithIndex(spark, root)
    fact.createOrReplaceTempView("fact")
    dimSlice(4000, 4300).createOrReplaceTempView("dim")
    val q = "SELECT kk, v, dv FROM fact JOIN dim ON kk = dk ORDER BY kk"
    val plain = spark.sql(q).collect().toSeq
    val got = withRule() { spark.sql(q).collect().toSeq }
    assert(got == plain && got.size == 300)
    assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
      s"column mapping must not defeat pruning: ${idx.lastCandidateFiles}/${idx.totalFiles}")
  }

  /** Count frozen In/InSet predicates in a query's optimized plan —
    * zero proves the runtime path (not a planning-time freeze) did
    * any pruning observed. */
  private def frozenInLists(q: DataFrame): Int =
    q.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.collect {
          case i: org.apache.spark.sql.catalyst.expressions.In => i: Any
          case i: org.apache.spark.sql.catalyst.expressions.InSet => i: Any
        }.size
    }.sum

  test("rule: a MUTABLE (plain parquet) dim engages at EXECUTION time — no frozen keys, files still pruned, values identical") {
    // The plan-time path must never freeze keys over a replaceable
    // directory — but refusing pruning entirely (the pre-E139
    // behavior) gave the most common dim shape in a mixed lake no
    // skipping at all. The runtime rider probes at listFiles time,
    // after all planning: nothing freezes, the listing still prunes.
    val idx = sqlFixture()
    val dimPath = java.nio.file.Files.createTempDirectory("dfp_mutable")
      .toString + "/dim"
    dimSlice(8000, 8500).withColumn("tag", lit("hot"))
      .write.parquet(dimPath)
    spark.read.parquet(dimPath).filter(col("tag") === "hot")
      .createOrReplaceTempView("dim")
    val q = "SELECT k, v, dv FROM fact JOIN dim ON k = dk ORDER BY k"
    val plain = spark.sql(q).collect().toSeq
    withRule() {
      val run = spark.sql(q)
      assert(frozenInLists(run) == 0,
        s"a mutable dim must not freeze keys into the plan:\n" +
          s"${run.queryExecution.optimizedPlan}")
      val got = run.collect().toSeq
      assert(got == plain && got.size == 500,
        "runtime-pruned and plain joins must be value-identical")
      assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
        s"the runtime probe must prune the listing: " +
          s"${idx.lastCandidateFiles}/${idx.totalFiles}")
    }
  }

  test("rule: a dim overwritten between planning and a cached plan's re-execution stays consistent") {
    // The rider executes the join's OWN captured dim subtree, whose
    // relation objects (and their cached file listings) are exactly
    // what the join reads — so probe and join can never disagree, no
    // matter what happens to the directory after planning. And a
    // FRESH query over the changed directory sees the new content
    // with a fresh probe.
    val root = freshRoot()
    seedRanged(root)
    val (fact, idx) = SnapshotStore.tableWithIndex(spark, root)
    val dimPath = java.nio.file.Files.createTempDirectory("dfp_swap")
      .toString + "/dim"
    dimSlice(8000, 8100).withColumn("tag", lit("hot")).write.parquet(dimPath)
    def dim() = spark.read.parquet(dimPath).filter(col("tag") === "hot")
    withRule() {
      val cached = fact.join(dim(), col("k") === col("dk")).orderBy("k")
      val first = cached.collect().toSeq
      assert(first.size == 100)
      assert(idx.lastCandidateFiles * 2 < idx.totalFiles)
      // APPEND new keys to the directory: the cached plan's dim
      // listing (frozen at its planning, standard Spark semantics)
      // still sees only the old files — the probe saw the same, so
      // re-execution must reproduce the first result, not lose rows
      // to stale-vs-live disagreement.
      dimSlice(2000, 2050).withColumn("tag", lit("hot"))
        .write.mode("append").parquet(dimPath)
      assert(cached.collect().toSeq == first,
        "a cached plan must replay its own frozen listing+probe, " +
          "never a torn mix")
      // A freshly planned query sees the appended keys, fresh probe.
      val fresh = fact.join(dim(), col("k") === col("dk")).orderBy("k")
        .collect().toSeq
      assert(fresh.size == 150,
        s"a fresh plan must read the appended dim, got ${fresh.size}")
    }
  }

  test("rule: a CACHE over a mutable source probes at runtime; a cache over immutable leaves keeps the plan-time freeze") {
    // Spark caches are best-effort — a lost block recomputes from the
    // (possibly rewritten) source — so a cache is only as immutable
    // as what it caches. Over plain parquet: runtime path (no frozen
    // In-list, pruning still engages). Over a literal relation:
    // plan-time freeze as before.
    val idx = sqlFixture()
    val dimPath = java.nio.file.Files.createTempDirectory("dfp_cache")
      .toString + "/dim"
    dimSlice(8000, 8400).withColumn("tag", lit("hot")).write.parquet(dimPath)
    // The FILTER stays outside the cache: the selective-dim gate
    // needs a visible Filter above the (cached) leaf.
    val cachedMutable = spark.read.parquet(dimPath).cache()
    try {
      cachedMutable.count() // materialize the cache
      cachedMutable.filter(col("tag") === "hot")
        .createOrReplaceTempView("dim")
      val q = "SELECT k, v, dv FROM fact JOIN dim ON k = dk ORDER BY k"
      val plain = spark.sql(q).collect().toSeq
      withRule() {
        val run = spark.sql(q)
        assert(frozenInLists(run) == 0,
          "a cache over mutable parquet must NOT freeze keys at planning")
        assert(run.collect().toSeq == plain)
        assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
          s"…but must still prune at runtime: " +
            s"${idx.lastCandidateFiles}/${idx.totalFiles}")
      }
      // Immutable-leaf cache: the fast path still freezes at planning.
      val cachedLocal = dimSlice(8000, 8400).cache()
      try {
        cachedLocal.count()
        cachedLocal.filter(col("dk") >= 8000)
          .createOrReplaceTempView("dim2")
        withRule() {
          val run2 = spark.sql(
            "SELECT k, v, dv FROM fact JOIN dim2 ON k = dk ORDER BY k")
          run2.collect()
          assert(frozenInLists(run2) > 0,
            "an immutable-leaf cache keeps the plan-time In-list path")
        }
      } finally cachedLocal.unpersist()
    } finally cachedMutable.unpersist()
  }

  test("rule: a LIVE-READ (DSv2) dim is refused even at runtime — probe and join could read different state") {
    // The runtime rider is sound because the probe re-executes a dim
    // whose file LISTING is snapshotted in the relation (parquet
    // reads, graft scans, caches over those). A DSv2 source re-plans
    // its scan per execution — a row arriving between the probe and
    // the join's own read could match fact files the probe pruned —
    // so it must stay refused, plan-time AND run-time.
    val idx = sqlFixture()
    val dir = java.nio.file.Files.createTempDirectory("dfp_v2").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/page_1.json"),
      """[{"id": 8000}, {"id": 8001}]""".getBytes("UTF-8"))
    import org.apache.spark.sql.types._
    spark.read.format("graft-paged")
      .option("urlTemplate", s"$dir/page_{page}.json")
      .option("pages", "1").option("transport", "file").load()
      .select(explode(from_json(col("body"),
        ArrayType(StructType(Seq(StructField("id", LongType)))))).as("item"))
      .select(col("item.id").as("dk"))
      .filter(col("dk") >= 0)
      .createOrReplaceTempView("dim")
    val got = withRule() {
      spark.sql("SELECT count(*) AS n FROM fact JOIN dim ON k = dk")
        .collect()(0).getLong(0)
    }
    assert(got == 2)
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "a live-read source must never drive pruning")
  }

  test("rule: an over-limit runtime probe degrades to ALL files — never a partial filter") {
    val idx = sqlFixture()
    val dimPath = java.nio.file.Files.createTempDirectory("dfp_over")
      .toString + "/dim"
    dimSlice(0, 5000).withColumn("tag", lit("hot")).write.parquet(dimPath)
    spark.read.parquet(dimPath).filter(col("tag") === "hot")
      .createOrReplaceTempView("dim")
    val got = withRule(maxKeys = Some(100)) {
      spark.sql("SELECT count(*) AS n FROM fact JOIN dim ON k = dk")
        .collect()(0).getLong(0)
    }
    assert(got == 5000)
    assert(idx.lastCandidateFiles == idx.totalFiles,
      "an over-limit runtime probe must list everything, not a subset")
  }

  test("rule: composite keys probe the highest-NDV candidate, not the first written") {
    // (tenant, k) composite join: tenant has NDV 2 — an In-list on it
    // prunes nothing; k has NDV ~10000 — its In-list prunes nearly
    // everything. E121's recorded stats rank the candidates for free.
    val root = freshRoot()
    val df = (0 until 10000).map(i =>
      (i.toLong % 2, i.toLong, i % 97, (i / 1000).toString))
      .toDF("tenant", "k", "v", "part")
    SnapshotStore.commit(spark, df, root, "part")
    graft.sinks.SnapshotStats.analyze(spark, root, Some(Seq("tenant", "k")))
    val (fact, idx) = SnapshotStore.tableWithIndex(spark, root)
    fact.createOrReplaceTempView("fact")
    (8000L until 8200L).map(i => (i % 2, i, s"d$i")).toSeq
      .toDF("dt", "dk", "dv").createOrReplaceTempView("dim")
    val q = "SELECT k, v, dv FROM fact JOIN dim ON tenant = dt AND k = dk ORDER BY k"
    val plain = spark.sql(q).collect().toSeq
    val got = withRule() {
      val run = spark.sql(q)
      val inCols = run.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.collect {
            case org.apache.spark.sql.catalyst.expressions.In(
              a: org.apache.spark.sql.catalyst.expressions.AttributeReference, _) => a.name
            case org.apache.spark.sql.catalyst.expressions.InSet(
              a: org.apache.spark.sql.catalyst.expressions.AttributeReference, _) => a.name
          }
      }.flatten
      assert(inCols == Seq("k"),
        s"exactly one In-list, on the high-NDV key, expected; got $inCols")
      run.collect().toSeq
    }
    assert(got == plain && got.size == 200)
    assert(idx.lastCandidateFiles * 2 < idx.totalFiles,
      s"the selective key must prune: ${idx.lastCandidateFiles}/${idx.totalFiles}")
  }

  test("bloom sidecars prune scattered keys min/max ranges cannot") {
    val root = freshRoot()
    // SCATTERED layout: every file spans the full key range, so
    // min/max skipping is powerless; blooms still answer per-key.
    val df = (0 until 8000).map(i => (i.toLong * 7 % 9973, i, (i % 8).toString))
      .toDF("k", "v", "part")
    SnapshotStore.commit(spark, df, root, "part")
    SnapshotStore.addBloomFilters(spark, root, Seq("k"))
    // Keys guaranteed ABSENT (k < 9973 by construction).
    val absent = (Seq((20000L, "x"), (20001L, "y"))).toDF("dk", "dv")
    val (pruned, idx, _) = DynamicPruning.joinPrunedWithIndex(
      spark, root, "k", absent, "dk")
    assert(pruned.count() == 0)
    assert(idx.lastCandidateFiles == 0,
      s"blooms must rule out absent keys: ${idx.lastCandidateFiles} files kept")
  }
}
