package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave for the correctness check. */
  private def zRef(a: Long, b: Long, bits: Int = 16): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("zValue2 matches the reference interleave") {
    val pairs = for (a <- Seq(0L, 1L, 2L, 3L, 255L, 40000L, 65535L);
                     b <- Seq(0L, 1L, 128L, 65535L)) yield (a, b)
    val out = pairs.toDF("a", "b")
      .select($"a", $"b", Layout.zValue2($"a", $"b").as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(out((a, b)) == zRef(a, b), s"($a,$b)")
    }
  }

  test("z-ordered files cover narrow rectangles in BOTH dimensions") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(sfDir).exists())
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString

    Layout.zorderBy(li, $"l_partkey", $"l_suppkey", numFiles = 8)
      .write.mode("overwrite").parquet(s"$dir/z")
    li.repartitionByRange(8, $"l_partkey").sortWithinPartitions($"l_partkey")
      .write.mode("overwrite").parquet(s"$dir/linear")

    def meanSpans(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max($"l_partkey") - min($"l_partkey")).as("ps"),
          (max($"l_suppkey") - min($"l_suppkey")).as("ss"))
        .agg(avg($"ps"), avg($"ss")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    val g = li.agg(max($"l_partkey") - min($"l_partkey"),
      max($"l_suppkey") - min($"l_suppkey")).collect()(0)
    val (gp, gs) = (g.getLong(0).toDouble, g.getLong(1).toDouble)
    val (zp, zs) = meanSpans(s"$dir/z")
    val (lp, ls) = meanSpans(s"$dir/linear")
    info(f"partkey span: z=${zp / gp}%.2f linear=${lp / gp}%.2f of global; " +
      f"suppkey span: z=${zs / gs}%.2f linear=${ls / gs}%.2f")
    // Linear layout prunes only its sort key: near-zero partkey span,
    // full suppkey span. Z-order must stay narrow in BOTH dimensions.
    assert(zp / gp < 0.6, s"z-order partkey span too wide: $zp / $gp")
    assert(zs / gs < 0.6, s"z-order suppkey span too wide: $zs / $gs")
    assert(ls / gs > 0.9, "fixture broken: linear layout should not prune suppkey")
  }

  test("string keys z-order after common-prefix stripping: both dimensions stay narrow") {
    // Shared 'SKU#' prefix + zero-padded number: string order equals
    // the embedded numeric order, so per-file spans of the number
    // measure how well the STRING key clustered.
    val n = 20000
    val rows = (1 to n).map { i =>
      val a = (i * 7919) % n; val b = (i * 104729) % n
      (f"SKU#$a%06d", b.toLong)
    }
    val df = rows.toDF("sku", "qty")
    val dir = java.nio.file.Files.createTempDirectory("graft-zstr").toString
    Layout.zorderBy(df, $"sku", $"qty", numFiles = 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    val spans = spark.read.parquet(s"$dir/z")
      .select(substring($"sku", 5, 6).cast("long").as("a"), $"qty")
      .groupBy(input_file_name())
      .agg((max($"a") - min($"a")).as("as"), (max($"qty") - min($"qty")).as("qs"))
      .agg(avg($"as"), avg($"qs")).collect()(0)
    val (sa, sq) = (spans.getDouble(0) / n, spans.getDouble(1) / n)
    info(f"string-key span=$sa%.2f qty span=$sq%.2f of global")
    assert(sa < 0.6, s"string z-order key span too wide: $sa")
    assert(sq < 0.6, s"numeric partner span too wide: $sq")
    // Constant and null-bearing string keys still lay out (rank 0).
    Layout.zorderBy(
      Seq(("c", 1L), ("c", 2L), (null: String, 3L)).toDF("sku", "qty"),
      $"sku", $"qty", numFiles = 2)
      .write.mode("overwrite").parquet(s"$dir/const")
    assert(spark.read.parquet(s"$dir/const").count() == 3)
  }

  test("variable-length string keys keep lexicographic file ranges (right-padded surrogate)") {
    // Base-36 strings of length 1..3: without right-padding the hex
    // window, 'b' (0x62) would rank below 'aa' (0x6161) and file
    // ranges would interleave out of string order.
    val ks = (1 to 4000).map(i => java.lang.Integer.toString(i, 36))
    val dir = java.nio.file.Files.createTempDirectory("graft-zvar").toString
    Layout.zorderBy(ks.toDF("k"), Seq($"k"), numFiles = 4, bits = 12)
      .write.mode("overwrite").parquet(s"$dir/z")
    val ranges = spark.read.parquet(s"$dir/z")
      .groupBy(input_file_name())
      .agg(min($"k").as("mn"), max($"k").as("mx"))
      .orderBy($"mn").select($"mn", $"mx")
      .as[(String, String)].collect()
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._1,
          s"file string ranges overlap out of lexicographic order: $a vs $b")
      case _ =>
    }
  }

  /** Reference N-key round-robin interleave. */
  private def zRefN(ks: Seq[Long], bits: Int): Long = {
    val n = ks.size
    (0 until bits).foldLeft(0L) { (acc, i) =>
      ks.zipWithIndex.foldLeft(acc) { case (a, (k, j)) =>
        a | (((k >> i) & 1L) << (i * n + j))
      }
    }
  }

  test("zValue interleaves N keys round-robin; 2-key form unchanged") {
    val triples = for (a <- Seq(0L, 5L, 255L); b <- Seq(0L, 9L, 128L);
                       c <- Seq(0L, 3L, 200L)) yield (a, b, c)
    val out = triples.toDF("a", "b", "c")
      .select($"a", $"b", $"c",
        Layout.zValue(Seq($"a", $"b", $"c"), bits = 12).as("z3"),
        Layout.zValue2($"a", $"b").as("z2"))
      .collect()
    out.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == zRefN(Seq(a, b, c), 12), s"z3($a,$b,$c)")
      assert(r.getLong(4) == zRef(a, b), s"z2($a,$b)")
    }
  }

  test("3-key z-order narrows file spans on the third dimension too") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(sfDir).exists())
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey", $"l_orderkey")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
    Layout.zorderBy(li, Seq($"l_partkey", $"l_suppkey", $"l_orderkey"),
        numFiles = 8, bits = 8)
      .write.mode("overwrite").parquet(s"$dir/z3")
    val spans = spark.read.parquet(s"$dir/z3")
      .groupBy(input_file_name())
      .agg((max($"l_partkey") - min($"l_partkey")).as("ps"),
        (max($"l_suppkey") - min($"l_suppkey")).as("ss"),
        (max($"l_orderkey") - min($"l_orderkey")).as("os"))
      .agg(avg($"ps"), avg($"ss"), avg($"os")).collect()(0)
    val g = li.agg(max($"l_partkey") - min($"l_partkey"),
      max($"l_suppkey") - min($"l_suppkey"),
      max($"l_orderkey") - min($"l_orderkey")).collect()(0)
    val fr = (0 to 2).map(i => spans.getDouble(i) / g.getLong(i).toDouble)
    info(f"3-key spans of global: part=${fr(0)}%.2f supp=${fr(1)}%.2f order=${fr(2)}%.2f")
    // 8 files over 3 dims: each dimension's span should still be
    // meaningfully below the full range (2^3 = 8 octants exactly tile
    // one halving per dimension). Per-dim bound is loose because
    // repartitionByRange samples with a session-dependent seed; the
    // mean bound pins the aggregate narrowing.
    fr.zip(Seq("partkey", "suppkey", "orderkey")).foreach { case (f, name) =>
      assert(f < 0.9, s"3-key z-order $name span too wide: $f of global")
    }
    assert(fr.sum / 3 < 0.75, s"mean 3-key span too wide: $fr")
  }
}
