package graft

import org.apache.spark.sql.functions._

import graft.operators.Expectations
import graft.operators.Expectations.Expectation

/** E49: declarative data-quality expectations. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def batch = Seq(
    (1, Some(10), Some("a")),
    (2, Some(-3), Some("b")),   // qty_positive violated
    (3, None, Some("c")),       // qty null: CHECK passes qty_positive, fails qty_set
    (4, Some(5), None)          // name_set violated
  ).toDF("id", "qty", "name")

  private val rules = Seq(
    Expectation("qty_positive", col("qty") > 0),
    Expectation("qty_set", col("qty").isNotNull),
    Expectation("name_set", col("name").isNotNull))

  test("withViolations tags rows; null predicates pass (CHECK semantics)") {
    val tagged = Expectations.withViolations(batch, rules)
      .select(col("id"), array_join(col("_violations"), ",").as("v"))
      .as[(Int, String)].collect().toMap
    assert(tagged == Map(1 -> "", 2 -> "qty_positive", 3 -> "qty_set",
      4 -> "name_set"))
  }

  test("split sends clean rows one way, violating rows (with tags) the other") {
    val (clean, bad) = Expectations.split(batch, rules)
    assert(clean.select("id").as[Int].collect().toSeq == Seq(1))
    assert(!clean.columns.contains("_violations"))
    assert(bad.select("id").as[Int].collect().sorted.toSeq == Seq(2, 3, 4))
    assert(bad.columns.contains("_violations"))
  }

  test("report counts violations per rule in one pass") {
    val rep = Expectations.report(batch, rules)
      .select("rule", "violations", "total", "pass")
      .as[(String, Long, Long, Boolean)].collect().toSet
    assert(rep == Set(
      ("qty_positive", 1L, 4L, false),
      ("qty_set", 1L, 4L, false),
      ("name_set", 1L, 4L, false)))
  }

  test("report plan has exactly one scan (rules fold into one aggregate)") {
    val plan = Expectations.report(batch, rules)
      .queryExecution.optimizedPlan.toString
    val scans = "LocalRelation|LogicalRDD".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 scan, plan:\n$plan")
  }

  test("enforce throws naming the failed rules; scoped failOn passes") {
    val e = intercept[IllegalStateException] {
      Expectations.enforce(batch, rules)
    }
    assert(e.getMessage.contains("qty_positive=1"))
    // Gate only on a rule that holds → no throw, report returned.
    val ok = Expectations.enforce(batch,
      rules :+ Expectation("id_set", col("id").isNotNull),
      failOn = Set("id_set"))
    assert(ok.count() == 4)
  }

  test("reserved column and duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.withViolations(
        batch.withColumn("_violations", lit(1)), rules)
    }
    intercept[IllegalArgumentException] {
      Expectations.report(batch, rules :+ rules.head)
    }
  }
}
