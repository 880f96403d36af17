package graft.sinks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Metadata-only `SELECT COUNT(*)`: a global, filterless count over a
  * snapshot scan is answered from the stats sidecar the manifest
  * already carries — zero data files opened, at any table size (the
  * Delta OPTIMIZE_METADATA_ONLY_QUERY shape; the reference's own
  * stats call is metadata-priced, mongodb_loader.py:271-299
  * `count_documents`).
  *
  * Strictly semantics-preserving by plan shape: the rewrite fires
  * only on `Aggregate(no grouping, only COUNT(literal) aliases,
  * <bare snapshot relation>)` — any Filter, DV anti-join (a
  * DV-carrying read is wrapped above the relation, so its plan is
  * never bare), column-mapping projection with a filter, sample, or
  * join breaks the pattern and the scan proceeds normally. Deterministic
  * project lists between the aggregate and the relation are transparent
  * (COUNT(1) references no columns). Fires only when EVERY listed file
  * carries sidecar stats ([[GraftFileIndex.totalRows]]). */
case class MetadataCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def countsOnly(exprs: Seq[NamedExpression]): Boolean =
    exprs.nonEmpty && exprs.forall {
      case Alias(AggregateExpression(
        Count(Seq(Literal(v, _))), Complete, false, None, _), _) => v != null
      case _ => false
    }

  /** COUNT(1) references no attributes, so deterministic projections
    * under the aggregate are shape-transparent. */
  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case Project(projectList, child) if projectList.forall(_.deterministic) =>
      strip(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) if countsOnly(exprs) =>
      strip(child) match {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location match {
            case idx: GraftFileIndex =>
              idx.totalRows match {
                case Some(n) =>
                  LocalRelation(agg.output.map(_.toAttribute),
                    Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
                case None => agg
              }
            case _ => agg
          }
        case _ => agg
      }
  }
}
