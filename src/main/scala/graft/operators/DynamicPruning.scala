package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.{GraftFileIndex, SnapshotStore}

/** Dynamic file pruning: skip snapshot-table FILES at join time from
  * the other side's keys (the Delta/Databricks "dynamic file pruning"
  * shape, as an explicit bounded operator).
  *
  * `WHERE fact.k IN (dim slice)` is invisible to static skipping —
  * the filter only exists through the join. This operator makes it
  * visible: collect the dim side's distinct join keys up to a bound,
  * and when they fit, push `k IN (keys)` into the fact read, where
  * [[graft.sinks.GraftFileIndex]] already turns IN-lists into
  * planning-time file skipping (per-file min/max ranges AND Bloom
  * sidecars — `FileStats.mayMatch`/`mayMatchBloom`), and parquet gets
  * the same list row-group-level. The join itself still runs —
  * pruning can only reduce I/O, never change results.
  *
  * Bounds and degradations (the [[GroupScope]] discipline):
  *   - the key probe collects `maxKeys + 1` DISTINCT keys at most —
  *     bounded driver memory, no unbounded broadcast. The default is
  *     10k: beyond that the In-list's PLANNING cost is real (the
  *     literal list serializes into the plan, probes every file's
  *     Bloom sidecar, and pushes into parquet row-group evaluation)
  *     while its selectivity is usually gone — Delta bounds the
  *     equivalent list similarly;
  *   - more distinct keys than `maxKeys` → the PLAIN join (dim too
  *     wide to enumerate = pruning would not be selective anyway);
  *   - only `inner` and `left_semi` joins qualify (an outer join
  *     keeps unmatched fact rows — filtering them first would be
  *     WRONG, so any other join type refuses loudly);
  *   - null dim keys are dropped from the probe: they never match an
  *     equi-join anyway, and an In-list with null would poison the
  *     pushdown translation;
  *   - a NONDETERMINISTIC dim (rand-based sampling, per-evaluation
  *     timestamps) degrades to the plain join: the probe and the join
  *     would evaluate the dim twice and could disagree, so a pushed
  *     In-list might drop fact rows the join-time dim still matches —
  *     the result-identical contract only survives by not pruning.
  *
  * For plain SQL / DataFrame joins, the same pruning is available
  * transparently as an opt-in optimizer rule —
  * [[graft.sinks.DynamicPruningRule]]
  * (`spark.graft.dynamicFilePruning=true`).
  *
  * 100 TB rationale: the classic shape is a date-sliced dimension
  * against a fact table whose layout correlates with the key
  * (monotonic ingest ids, z-order, or time partitioning). The dim
  * slice is thousands of keys; the fact is thousands of files — the
  * join needs only the files whose ranges/blooms can hold those keys.
  * Without DFP the scan opens all of them and discards at the join.
  *
  * Reference anchor: the reference engine resolves joins row-at-a-time
  * against indexed MongoDB collections (pim-etl etl/loaders), where
  * point lookups are index-priced; this operator is the columnar-lake
  * equivalent for scan-priced joins. */
object DynamicPruning {

  /** [[joinPruned]] plus the fact scan's file index (for candidate
    * pins) and whether pruning engaged. */
  private[graft] def joinPrunedWithIndex(spark: SparkSession, factRoot: String,
      factKey: String, dim: DataFrame, dimKey: String,
      joinType: String = "inner", maxKeys: Int = 10000,
      version: Option[Long] = None): (DataFrame, GraftFileIndex, Boolean) = {
    require(joinType == "inner" || joinType == "left_semi",
      s"dynamic file pruning only preserves inner/left_semi semantics " +
        s"(an outer join keeps unmatched fact rows) — got '$joinType'")
    require(maxKeys > 0, s"maxKeys must be positive, got $maxKeys")
    // A nondeterministic dim would be evaluated once by the probe and
    // again by the join — the two evaluations can disagree, and a
    // pushed In-list from the first would wrongly drop fact rows the
    // second still matches. Pruning refuses; the plain join (one dim
    // evaluation per execution, standard Spark semantics) runs.
    val deterministic = dim.queryExecution.analyzed.collectFirst {
      case p if p.expressions.exists(e => !e.deterministic) => p
    }.isEmpty
    val keys =
      if (!deterministic) Array.empty[Any]
      else dim.select(col(dimKey)).where(col(dimKey).isNotNull)
        .distinct().limit(maxKeys + 1).collect().map(_.get(0))
    val (fact, idx) = SnapshotStore.tableWithIndex(spark, factRoot, version)
    val engaged = deterministic && keys.length <= maxKeys
    val pruned =
      if (!engaged) fact
      else if (keys.isEmpty) fact.where(lit(false)) // empty dim: empty join
      else fact.where(col(factKey).isin(keys.toIndexedSeq: _*))
    val joined = joinType match {
      case "left_semi" =>
        pruned.join(dim, pruned(factKey) === dim(dimKey), "left_semi")
      case _ =>
        pruned.join(dim, pruned(factKey) === dim(dimKey), "inner")
    }
    (joined, idx, engaged)
  }

  /** `fact(root) ⋈ dim` with join-time file skipping on the fact side
    * when the dim's distinct keys fit under `maxKeys`; the plain join
    * otherwise. Result-identical to
    * `SnapshotStore.table(root).join(dim, …)` by construction. */
  def joinPruned(spark: SparkSession, factRoot: String, factKey: String,
                 dim: DataFrame, dimKey: String, joinType: String = "inner",
                 maxKeys: Int = 10000, version: Option[Long] = None): DataFrame =
    joinPrunedWithIndex(spark, factRoot, factKey, dim, dimKey, joinType,
      maxKeys, version)._1
}
