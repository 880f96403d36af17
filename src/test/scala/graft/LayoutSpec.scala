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
}
