package graft.sinks

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE + CBO statistics ([[SnapshotStats]]): exact always-fresh
  * table-level stats from the manifest, one-scan column stats from
  * ANALYZE, all surfaced through `LogicalRelation.catalogTable` where
  * Spark's costing looks. Stats steer plans, never results — every
  * degradation case (type drift, garbled property) sheds stats
  * conservatively. */
class SnapshotStatsSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    s"${Files.createTempDirectory("stats").toString}/t"

  /** Plan-stats window: rowCount/colStats only reach `plan.stats`
    * under the CBO/planStats flags (off by default — plans elsewhere
    * stay byte-for-byte what they were). */
  private def withCbo[A](body: => A): A = {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.planStats.enabled", "true")
    try body finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.conf.unset("spark.sql.cbo.planStats.enabled")
    }
  }

  private def seed(root: String, n: Int = 100): Unit = {
    val df = (0 until n).map { i =>
      (i.toLong, s"name_$i", (i % 7).toString, i % 2 == 0,
        new java.math.BigDecimal(s"$i.25"),
        Date.valueOf(java.time.LocalDate.ofEpochDay(1000 + i)),
        new Timestamp(1700000000000L + i * 1000L))
    }.toDF("k", "name", "part", "flag", "price", "d", "ts")
      .withColumn("price", col("price").cast("decimal(12,2)"))
    SnapshotStore.commit(spark, df, root, "part")
  }

  private def relStats(df: DataFrame) =
    df.queryExecution.optimizedPlan.collectLeaves().collectFirst {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.stats
    }.getOrElse(fail("no LogicalRelation leaf in the plan"))

  private def colStat(df: DataFrame, name: String) = {
    val st = relStats(df)
    st.attributeStats.toSeq.collectFirst {
      case (a, cs) if a.name == name => cs
    }
  }

  test("rowCount is exact, manifest-derived, and fresh at EVERY version with zero ANALYZE calls") {
    val root = freshRoot()
    seed(root, 100)
    withCbo {
      assert(relStats(SnapshotStore.table(spark, root)).rowCount.contains(BigInt(100)))
      // A DV delete touches no data file. The INNER bare scan under
      // the DV anti-join wrapper physically emits the pre-DV count, so
      // that is the count its stats must carry — the wrapper's own
      // filter selectivity nets out the deletes in costing (attaching
      // the DV-adjusted 90 there would double-count delete
      // selectivity: the round-13 ADVICE finding).
      SnapshotStore.deleteWhereDv(spark, root, "k < 10")
      assert(relStats(SnapshotStore.table(spark, root)).rowCount.contains(BigInt(100)))
      // Time travel: the PINNED version's count, not the tip's.
      assert(relStats(SnapshotStore.table(spark, root, Some(1L)))
        .rowCount.contains(BigInt(100)))
    }
  }

  test("ANALYZE records NDV/nulls/bounds; plan stats round-trip every supported type") {
    val root = freshRoot()
    seed(root, 100)
    val (_, analyzed) = SnapshotStats.analyze(spark, root)
    assert(analyzed.toSet ==
      Set("k", "name", "part", "flag", "price", "d", "ts"))
    withCbo {
      val df = SnapshotStore.table(spark, root)
      val k = colStat(df, "k").getOrElse(fail("no stats for k"))
      assert(k.distinctCount.exists(d => d >= 90 && d <= 110)) // HLL ±5%
      assert(k.nullCount.contains(BigInt(0)))
      assert(k.min.contains(0L) && k.max.contains(99L))
      val part = colStat(df, "part").getOrElse(fail("no stats for part"))
      assert(part.distinctCount.contains(BigInt(7)))
      // avgLen/maxLen are what string costing consumes (no bounds).
      assert(part.maxLen.contains(1L) && part.min.isEmpty)
      val d = colStat(df, "d").getOrElse(fail("no stats for d"))
      assert(d.min.contains(1000) && d.max.contains(1099)) // epoch days
      val ts = colStat(df, "ts").getOrElse(fail("no stats for ts"))
      assert(ts.min.contains(1700000000000000L)) // epoch micros
      val price = colStat(df, "price").getOrElse(fail("no stats for price"))
      assert(price.min.contains(org.apache.spark.sql.types.Decimal("0.25")))
      val flag = colStat(df, "flag").getOrElse(fail("no stats for flag"))
      assert(flag.distinctCount.contains(BigInt(2)))
    }
  }

  test("accurate stats flip a selective-filter join to broadcast; results identical") {
    val root = freshRoot()
    val dim = (0 until 5000).map(i =>
      (i.toLong, s"grp_${i % 50}", s"payload_$i" * 4, (i % 2).toString))
      .toDF("k", "grp", "pay", "part")
    SnapshotStore.commit(spark, dim, root, "part")
    SnapshotStats.analyze(spark, root)
    val factDf = (0 until 2000).map(i => (i.toLong % 5000, i)).toDF("k", "x")
    def joined(): DataFrame = SnapshotStore.table(spark, root)
      .filter(col("grp") === "grp_7").join(factDf, "k")
    def isBroadcast(df: DataFrame): Boolean =
      df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 16 * 1024)
    try {
      // Size-only costing: the filter keeps the full file-size
      // estimate, which exceeds the threshold → no broadcast.
      val plain = joined()
      assert(!isBroadcast(plain),
        s"expected SMJ under size-only costing:\n${plain.queryExecution.executedPlan}")
      val expected = plain.orderBy("k", "x").collect().toSeq
      withCbo {
        // NDV(grp)=50 → equality keeps ~2% → ~100 rows, well under the
        // threshold → broadcast, purely from the recorded stats.
        val cbo = joined()
        assert(isBroadcast(cbo),
          s"expected broadcast under CBO costing:\n${cbo.queryExecution.executedPlan}")
        assert(cbo.orderBy("k", "x").collect().toSeq == expected)
      }
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("column mapping: a renamed column keeps its stats; a widened type sheds them") {
    val root = freshRoot()
    seed(root, 50)
    SnapshotStats.analyze(spark, root)
    SnapshotStore.renameColumn(spark, root, "k", "key")
    withCbo {
      val df = SnapshotStore.table(spark, root)
      val k = colStat(df, "k") // physical name carries the attach
      assert(k.exists(_.min.contains(0L)),
        "renamed column lost its recorded stats through the mapping")
      assert(df.filter(col("key") < 5).count() == 5)
    }
  }

  test("type widening after ANALYZE sheds that column's stats, keeps the rest") {
    val root = freshRoot()
    val df0 = (0 until 40).map(i => (i, s"v$i", (i % 2).toString))
      .toDF("k", "v", "part")
    SnapshotStore.commit(spark, df0, root, "part")
    SnapshotStats.analyze(spark, root)
    // Widen k INT→BIGINT via an append at the wider type.
    SnapshotStore.appendCommit(spark,
      (40 until 50).map(i => (i.toLong, s"v$i", (i % 2).toString))
        .toDF("k", "v", "part"), root, "part")
    withCbo {
      val df = SnapshotStore.table(spark, root)
      assert(colStat(df, "k").isEmpty,
        "stats recorded at INT must not cost a BIGINT column")
      assert(colStat(df, "v").isDefined, "unrelated column lost its stats")
      assert(relStats(df).rowCount.contains(BigInt(50)),
        "table-level count is manifest-derived and never stale")
    }
  }

  test("SQL surface: ANALYZE TABLE on the graft catalog; loud on unknown columns") {
    val root = freshRoot()
    seed(root, 30)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sinks.GraftCatalog].getName)
    val out = spark.sql(
      s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS FOR COLUMNS k, part").collect()
    assert(out.length == 1 && out(0).getString(0) == root)
    assert(out(0).getSeq[String](2) == Seq("k", "part"))
    withCbo {
      assert(colStat(spark.sql(s"SELECT * FROM graft.`$root`"), "k").isDefined)
      assert(colStat(spark.sql(s"SELECT * FROM graft.`$root`"), "name").isEmpty)
    }
    val e = intercept[IllegalArgumentException](
      spark.sql(s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS FOR COLUMNS nope"))
    assert(e.getMessage.contains("no column 'nope'"))
    // A mid-list gap is MALFORMED, never a silent subset: the
    // recognizer refuses, the statement fails (delegate can't resolve
    // a graft path either), and nothing gets recorded for 'k' alone.
    assert(intercept[Exception](spark.sql(
      s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS FOR COLUMNS k,,part"))
      != null)
    // FOR ALL COLUMNS + bare form both mean "all supported".
    assert(spark.sql(s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS FOR ALL COLUMNS")
      .collect()(0).getSeq[String](2).nonEmpty)
    assert(spark.sql(s"ANALYZE TABLE graft.`$root` COMPUTE STATISTICS")
      .collect()(0).getSeq[String](2).nonEmpty)
  }

  test("DESCRIBE DETAIL surfaces analyzed_version (and null before any ANALYZE)") {
    val root = freshRoot()
    seed(root, 20)
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sinks.GraftCatalog].getName)
    val before = spark.sql(s"DESCRIBE DETAIL graft.`$root`").collect()(0)
    assert(before.isNullAt(before.fieldIndex("analyzed_version")))
    val (v, _) = SnapshotStats.analyze(spark, root, Some(Seq("k")))
    val after = spark.sql(s"DESCRIBE DETAIL graft.`$root`").collect()(0)
    assert(after.getLong(after.fieldIndex("analyzed_version")) == v - 1,
      "DESCRIBE DETAIL must report the version the stats were computed against")
  }

  test("a garbled recorded stat degrades to no stats, never a broken read") {
    val root = freshRoot()
    seed(root, 20)
    SnapshotStats.analyze(spark, root, Some(Seq("k")))
    SnapshotStore.setProperties(spark, root,
      Seq("graft.stats.col.k" -> "tpe=bigint|ndv=oops"))
    withCbo {
      val df = SnapshotStore.table(spark, root)
      assert(colStat(df, "k").isEmpty)
      assert(df.count() == 20)
    }
    assert(SnapshotStats.decode("") .isEmpty)
    assert(SnapshotStats.decode("tpe=bigint|ndv=3|nulls=0|min=|max=|avgLen=|maxLen=")
      .exists(s => s.ndv == 3 && s.min.isEmpty))
  }

  test("CBO join reorder fires only FROM recorded stats — a never-ANALYZEd star keeps its written order") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join => LJoin}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val dir = Files.createTempDirectory("reorder").toString
    val factR = s"$dir/fact"; val dimOR = s"$dir/dimO"; val dimSR = s"$dir/dimS"
    SnapshotStore.commit(spark, (0 until 4000)
      .map(i => (i.toLong, (i % 40).toLong, (i % 2).toString))
      .toDF("k", "sk", "part"), factR, "part")
    SnapshotStore.commit(spark, (0 until 2000)
      .map(i => (i.toLong, s"o$i", (i % 2).toString))
      .toDF("ok", "ov", "part"), dimOR, "part")
    SnapshotStore.commit(spark, (0 until 40)
      .map(i => (i.toLong, i % 10, "0")).toDF("sk2", "nat", "part"),
      dimSR, "part")
    def q(): DataFrame =
      SnapshotStore.table(spark, factR)
        .join(SnapshotStore.table(spark, dimOR), col("k") === col("ok"))
        .join(SnapshotStore.table(spark, dimSR).filter(col("nat") <= 2),
          col("sk") === col("sk2"))
        .groupBy(col("ov")).agg(count(lit(1)).as("n"))
    def bottomRoots(df: DataFrame): Set[String] = {
      val joins = df.queryExecution.optimizedPlan.collect { case j: LJoin => j }
      val bottom = joins.find(j =>
        j.collect { case jj: LJoin => jj }.size == 1).get
      bottom.collectLeaves().collect {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location match {
            case g: GraftFileIndex => g.tableRoot.getOrElse("")
            case _ => ""
          }
      }.toSet
    }
    // WITHOUT the CBO flags (declared intent), no statistics reach
    // plan costing and the star keeps its written order — reordering
    // must never be an ambient behavior change.
    val plain = q()
    assert(bottomRoots(plain).contains(dimOR) &&
      !bottomRoots(plain).contains(dimSR),
      s"without CBO the written order must hold: ${bottomRoots(plain)}")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    try withCbo {
      // On THIS store "stats absent" cannot happen: the exact live
      // rowCount is manifest-derived and attaches to every scan under
      // the CBO flags with ZERO ANALYZE calls — and relative row
      // counts alone (|dimS slice| ≪ |dimO|) already reorder the
      // star. ANALYZE then adds join-key NDVs for the cardinality
      // estimates; the chosen order is the same here.
      val cold = q()
      assert(bottomRoots(cold).contains(dimSR) &&
        !bottomRoots(cold).contains(dimOR),
        s"manifest rowCounts alone must reorder: ${bottomRoots(cold)}")
      Seq(factR, dimOR, dimSR).foreach(r => SnapshotStats.analyze(spark, r))
      val hot = q()
      assert(bottomRoots(hot).contains(dimSR) &&
        !bottomRoots(hot).contains(dimOR),
        s"ANALYZE'd NDVs must keep the selective-dim-first order: ${bottomRoots(hot)}")
      assert(hot.orderBy("ov").collect().toSeq ==
        plain.orderBy("ov").collect().toSeq)
    } finally spark.conf.unset("spark.sql.cbo.joinReorder.enabled")
  }

  test("DV-adjusted NDV/nulls: ANALYZE reads the LIVE view") {
    val root = freshRoot()
    val df0 = (0 until 60).map(i =>
      (i.toLong, if (i < 30) Some(s"g${i % 3}") else None, (i % 2).toString))
      .toDF("k", "g", "part")
    SnapshotStore.commit(spark, df0, root, "part")
    SnapshotStore.deleteWhereDv(spark, root, "k >= 30") // all the nulls go
    SnapshotStats.analyze(spark, root)
    withCbo {
      val g = colStat(SnapshotStore.table(spark, root), "g")
        .getOrElse(fail("no stats for g"))
      assert(g.nullCount.contains(BigInt(0)),
        "ANALYZE must count nulls over live rows, not dead ones")
      assert(g.distinctCount.contains(BigInt(3)))
    }
  }

  private def withHistograms[A](bins: Int)(body: => A): A = {
    spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
    spark.conf.set("spark.sql.statistics.histogram.numBins", bins.toString)
    try body finally {
      spark.conf.unset("spark.sql.statistics.histogram.enabled")
      spark.conf.unset("spark.sql.statistics.histogram.numBins")
    }
  }

  test("histograms: recorded only under the session flag, equi-height over the live rows, round-tripped to plan stats") {
    val root = freshRoot()
    seed(root, 200)
    // Flag OFF (the default): no histogram recorded, plans unchanged.
    SnapshotStats.analyze(spark, root)
    withCbo {
      val cs = colStat(SnapshotStore.table(spark, root), "k").get
      assert(cs.histogram.isEmpty,
        "without the session flag ANALYZE must not pay the histogram scans")
    }
    // Flag ON: ordered columns get Spark's own equi-height Histogram;
    // strings never do (no ordering to bin).
    withHistograms(bins = 8) { SnapshotStats.analyze(spark, root) }
    withCbo {
      val t = SnapshotStore.table(spark, root)
      val k = colStat(t, "k").get
      assert(k.histogram.isDefined, "numeric column must record a histogram")
      val h = k.histogram.get
      assert(h.bins.length == 8, s"recorded numBins must replay: ${h.bins.length}")
      assert(math.abs(h.height * h.bins.length - 200.0) <= 1.0,
        s"equi-height: height × bins ≈ non-null rows, got ${h.height}")
      assert(h.bins.head.lo == 0.0 && h.bins.last.hi == 199.0,
        s"bin endpoints must span the live range: " +
          s"${h.bins.head.lo}..${h.bins.last.hi}")
      assert(h.bins.forall(b => b.lo <= b.hi && b.ndv >= 1),
        "bins must be ordered with live NDVs")
      // Date/timestamp bin in their INTERNAL numeric form (days /
      // micros) — the convention FilterEstimation converts predicate
      // literals with.
      val d = colStat(t, "d").get
      assert(d.histogram.isDefined, "date column must record a histogram")
      assert(d.histogram.get.bins.head.lo == 1000.0,
        s"date bins are epoch days, got ${d.histogram.get.bins.head.lo}")
      assert(colStat(t, "name").get.histogram.isEmpty,
        "string columns have no ordering to bin — never a histogram")
    }
  }

  test("histograms fix RANGE selectivity on skew: the same filter flips to broadcast only once bins see the gap") {
    val root = freshRoot()
    // SKEWED value column: 99% of rows dense in [0, 100), 1% outliers
    // at ~1e6 — uniform min/max interpolation estimates `v > 5e5` at
    // ~50% of rows; the histogram knows the range is nearly empty.
    val df = (0 until 5000).map { i =>
      (i.toLong,
        if (i % 100 == 0) 1000000L + i else (i % 100).toLong,
        (i % 4).toString)
    }.toDF("k", "v", "part")
    SnapshotStore.commit(spark, df, root, "part")
    val fact = (0 until 5000).map(i => (i.toLong, (i % 13).toLong))
      .toDF("fk", "m")
    def q(): DataFrame = SnapshotStore.table(spark, root)
      .filter(col("v") > 500000L)
      .join(fact, col("k") === col("fk"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("sm"))
    val expected = q().collect().toSeq // plain run, no CBO — ground truth
    SnapshotStats.analyze(spark, root)
    withCbo {
      // Self-calibrating threshold: a quarter of the NDV-only
      // (uniform-interpolation) estimate of the filtered dim — so the
      // no-histogram plan must NOT broadcast at any SF, and only a
      // ~100× tighter histogram estimate can cross under it.
      val uniformEst = q().queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.stats.sizeInBytes
      }.head
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (uniformEst / 4).max(BigInt(1)).toString)
      try {
        val noHist = q()
        assert(!noHist.queryExecution.executedPlan.toString
            .contains("BroadcastHashJoin"),
          "uniform interpolation must overestimate the skewed range " +
            "and keep the shuffle join")
        withHistograms(bins = 64) { SnapshotStats.analyze(spark, root) }
        val hist = q()
        assert(hist.queryExecution.executedPlan.toString
            .contains("BroadcastHashJoin"),
          s"histogram bins must expose the near-empty range and flip " +
            s"to broadcast:\n${hist.queryExecution.executedPlan}")
        assert(hist.collect().toSeq == expected &&
          noHist.collect().toSeq == expected,
          "histograms steer plans, never results")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("a torn histogram record sheds alone — NDV and bounds still cost the column") {
    val stat = SnapshotStats.ColStat("bigint", 10, 0, Some("0"), Some("9"),
      None, None, Some("NOT-A-HISTOGRAM"))
    val decoded = SnapshotStats.decode(SnapshotStats.encode(stat))
    assert(decoded.exists(_.hist.contains("NOT-A-HISTOGRAM")),
      "encode/decode round-trips the payload verbatim")
    import org.apache.spark.sql.types._
    val out = SnapshotStats.recordedColStats(
      Map("graft.stats.col.v" -> SnapshotStats.encode(stat)),
      StructType(Seq(StructField("v", LongType))), Set.empty)
    assert(out.contains("v"), "the column's stats must survive")
    assert(out("v").histogram.isEmpty, "the torn histogram must shed alone")
    assert(out("v").distinctCount.contains(BigInt(10)))
    // A torn %-ESCAPE in the hist field (truncated property) must also
    // shed alone — not take NDV/bounds with it through the decoder.
    val torn = SnapshotStats.encode(stat.copy(hist = None)) + "|hist=H4sIA%2"
    val out2 = SnapshotStats.recordedColStats(
      Map("graft.stats.col.v" -> torn),
      StructType(Seq(StructField("v", LongType))), Set.empty)
    assert(out2.contains("v") && out2("v").histogram.isEmpty &&
      out2("v").distinctCount.contains(BigInt(10)),
      "a torn escape in hist must shed the histogram alone")
  }

  test("the auto-analyze rider replays the HISTOGRAM intent — a drift refresh never strips recorded bins") {
    val root = freshRoot()
    seed(root, 200)
    withHistograms(bins = 8) { SnapshotStats.analyze(spark, root) }
    SnapshotStore.setProperties(spark, root, Seq(
      SnapshotStore.AutoAnalyzeProp -> "1"))
    // A >1% append from a session with the histogram flag OFF: the
    // rider must replay the RECORDED intent, not this session's conf.
    SnapshotStore.appendCommit(spark,
      (1000 until 1100).map { i =>
        (i.toLong, s"name_$i", (i % 7).toString, i % 2 == 0,
          new java.math.BigDecimal(s"$i.25"),
          Date.valueOf(java.time.LocalDate.ofEpochDay(1000 + i)),
          new Timestamp(1700000000000L + i * 1000L))
      }.toDF("k", "name", "part", "flag", "price", "d", "ts")
        .withColumn("price", col("price").cast("decimal(12,2)")),
      root, "part")
    val props = SnapshotStore.tablePropertiesMap(spark, root)
    assert(props(SnapshotStats.AnalyzedRowsProp).toLong == 300,
      "the drift rider must have re-analyzed")
    withCbo {
      val k = colStat(SnapshotStore.table(spark, root), "k").get
      assert(k.histogram.isDefined,
        "the refresh must keep recording histograms — the intent is " +
          "the TABLE's, not the rider session's")
      assert(k.histogram.get.bins.length == 8,
        s"and with the recorded bin count, got ${k.histogram.get.bins.length}")
      assert(k.histogram.get.bins.last.hi == 1099.0,
        "over the POST-append live range")
    }
  }
}
