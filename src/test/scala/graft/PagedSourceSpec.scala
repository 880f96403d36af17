package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** DataSource V2 paginated scan: one InputPartition per page, fixed
  * (page, body) schema, declarative downstream parsing. */
class PagedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writePages(n: Int): String = {
    val dir = Files.createTempDirectory("graft_pages")
    (1 to n).foreach { p =>
      // JSONC on purpose: trailing comma + comment, like real feeds.
      Files.writeString(dir.resolve(s"page_$p.json"),
        s"""[ // page $p
           |  {"id": ${p * 10 + 1}, "name": "item-${p * 10 + 1}"},
           |  {"id": ${p * 10 + 2}, "name": "item-${p * 10 + 2}"},
           |]""".stripMargin)
    }
    dir.toString
  }

  test("one partition per page; bodies parse declaratively downstream") {
    val dir = writePages(3)
    val df = spark.read.format("graft-paged")
      .option("urlTemplate", s"$dir/page_{page}.json")
      .option("pages", "3")
      .option("transport", "file")
      .option("jsonc", "true")
      .load()
    assert(df.schema.fieldNames.toSeq == Seq("page", "body"))
    assert(df.rdd.getNumPartitions == 3, "page fan-out must be the partitioning")
    val items = df
      .select(col("page"), explode(from_json(col("body"),
        ArrayType(StructType(Seq(StructField("id", LongType),
          StructField("name", StringType)))))).as("item"))
      .select(col("page"), col("item.id"), col("item.name"))
      .as[(Int, Long, String)].collect().toSet
    assert(items == (1 to 3).flatMap(p => Seq(
      (p, p * 10L + 1, s"item-${p * 10 + 1}"),
      (p, p * 10L + 2, s"item-${p * 10 + 2}"))).toSet)
  }

  test("an under-filled trailing page yields a null body, not a failed scan") {
    val dir = writePages(2)
    val df = spark.read.format("graft-paged")
      .option("urlTemplate", s"$dir/page_{page}.json")
      .option("pages", "4")
      .option("transport", "file")
      .load()
    val bodies = df.select(col("page"), col("body").isNull).as[(Int, Boolean)]
      .collect().toMap
    assert(bodies == Map(1 -> false, 2 -> false, 3 -> true, 4 -> true))
  }

  test("misconfiguration fails at load, offline transport refuses at scan") {
    val e1 = intercept[IllegalArgumentException] {
      spark.read.format("graft-paged").option("pages", "3").load()
    }
    assert(e1.getMessage.contains("urlTemplate"))
    val e2 = intercept[IllegalArgumentException] {
      spark.read.format("graft-paged")
        .option("urlTemplate", "x_{page}").option("pages", "1")
        .option("transport", "carrier-pigeon").load()
    }
    assert(e2.getMessage.contains("carrier-pigeon"))
    // Offline default: planning succeeds, any actual fetch refuses.
    val offline = spark.read.format("graft-paged")
      .option("urlTemplate", "https://api.example.com/p/{page}")
      .option("pages", "1").load()
    val err = intercept[org.apache.spark.SparkException] { offline.count() }
    assert(err.getMessage.contains("offline") ||
      Option(err.getCause).exists(_.getMessage.contains("offline")))
  }
}
