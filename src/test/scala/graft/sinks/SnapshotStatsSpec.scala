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
}
