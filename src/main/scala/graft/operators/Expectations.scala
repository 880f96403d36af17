package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Delta Live Tables
  * `EXPECT` / Great Expectations shape: a rule set evaluated over a
  * batch producing (a) per-row violation tags, (b) a clean/quarantine
  * split, and (c) a one-pass summary report. The reference validates
  * feeds imperatively before load (etl/base.py:275-292's
  * validate_source / validate_destination); this is the same gate
  * generalized to row-level rules and made declarative so Catalyst
  * runs every rule in ONE scan.
  *
  * Null semantics follow SQL `CHECK`: a rule violates only when its
  * predicate is definitively FALSE — an unknown (null) predicate
  * passes. Express non-null requirements explicitly
  * (`col.isNotNull`), as SQL constraints do.
  *
  * Scale shape (100 TB): every rule is a codegen'd boolean column in
  * the same projection — [[withViolations]] and [[split]] add zero
  * shuffles, and [[report]] is one map-side-combined aggregate whose
  * width is |rules|, not data-sized. Quarantining is a filter, not a
  * second scan.
  */
object Expectations {

  /** One named rule. The predicate is any boolean Column over the
    * batch's schema. */
  case class Expectation(name: String, predicate: Column)

  /** True when `e`'s rule is violated on this row (predicate
    * definitively false; null passes — SQL CHECK semantics). */
  private def violates(e: Expectation): Column =
    !coalesce(e.predicate, lit(true))

  /** The batch with an appended `outCol`: a sorted array of the names
    * of violated rules (empty = clean row). One projection, zero
    * shuffle. */
  def withViolations(df: DataFrame, rules: Seq[Expectation],
                     outCol: String = "_violations"): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate expectation names: ${rules.map(_.name).mkString(",")}")
    require(!df.columns.contains(outCol),
      s"input already carries a '$outCol' column")
    val tags = rules.map(e => when(violates(e), lit(e.name)))
    df.withColumn(outCol,
      array_sort(filter(array(tags: _*), x => x.isNotNull)))
  }

  /** (clean, quarantined): rows violating NO rule, and rows violating
    * at least one — the quarantined side keeps the `_violations` tags
    * for the dead-letter channel (reference §2.9's error path, row
    * granularity). Both sides are filters over one tagged projection;
    * cache the input if both sides are consumed. */
  def split(df: DataFrame, rules: Seq[Expectation],
            outCol: String = "_violations"): (DataFrame, DataFrame) = {
    val tagged = withViolations(df, rules, outCol)
    (tagged.filter(size(col(outCol)) === 0).drop(outCol),
      tagged.filter(size(col(outCol)) > 0))
  }

  /** One row per rule: (rule, violations, total, pass) — the batch
    * gate report. A single aggregate computes every rule's count in
    * one pass (conditional sums, map-side combined); the per-rule rows
    * are exploded from that singleton, so the scan count is 1
    * regardless of |rules|. */
  def report(df: DataFrame, rules: Seq[Expectation]): DataFrame = {
    require(rules.nonEmpty, "no expectations given")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate expectation names: ${rules.map(_.name).mkString(",")}")
    val sums = rules.zipWithIndex.map { case (e, i) =>
      sum(when(violates(e), 1L).otherwise(0L)).as(s"__v$i")
    }
    val agg = df.agg(count(lit(1)).as("__total"), sums: _*)
    val entries = rules.zipWithIndex.map { case (e, i) =>
      struct(lit(e.name).as("rule"), col(s"__v$i").as("violations"))
    }
    agg.select(explode(array(entries: _*)).as("e"), col("__total"))
      .select(col("e.rule").as("rule"),
        col("e.violations").as("violations"),
        col("__total").as("total"),
        (col("e.violations") === 0L).as("pass"))
  }

  /** Hard gate: throws when any `failOn` rule has violations (all
    * rules by default) — the "expect or fail" mode. Returns the
    * report otherwise so callers can persist it. */
  def enforce(df: DataFrame, rules: Seq[Expectation],
              failOn: Set[String] = Set.empty): DataFrame = {
    val rep = report(df, rules)
    val gate = if (failOn.isEmpty) rep else rep.filter(col("rule").isin(failOn.toSeq: _*))
    val failed = gate.filter(!col("pass"))
      .select("rule", "violations").collect()
    if (failed.nonEmpty)
      throw new IllegalStateException("expectations failed: " + failed
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", "))
    rep
  }
}
