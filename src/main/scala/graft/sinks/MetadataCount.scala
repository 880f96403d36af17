package graft.sinks

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Metadata-only `SELECT COUNT(*) / COUNT(c) / MIN(c) / MAX(c)`: a
  * global, filterless aggregate over a snapshot scan is answered from
  * the stats sidecar the manifest already carries — zero data files
  * opened, at any table size (the Delta OPTIMIZE_METADATA_ONLY_QUERY
  * shape; the reference's own stats call is metadata-priced,
  * mongodb_loader.py:271-299 `count_documents`).
  *
  * Strictly semantics-preserving by plan shape: the rewrite fires
  * only on `Aggregate(no grouping, only COUNT/MIN/MAX aliases,
  * <bare snapshot relation>)` — any Filter, DV anti-join (a
  * DV-carrying read is wrapped above the relation, so its plan is
  * never bare), sample, or join breaks the pattern and the scan
  * proceeds normally. Deterministic project lists between the
  * aggregate and the relation are transparent: COUNT(1) references no
  * columns, and MIN/MAX/COUNT(c) arguments resolve through direct
  * attribute aliases (so column-mapped logical names reach their
  * physical stats column). Fires only when EVERY listed file carries
  * sidecar stats for the referenced columns, and only for values the
  * sidecar's order discipline can replay exactly ([[FileStats]]: ints,
  * longs, floats, doubles, dates, micros timestamps; ASCII string
  * bounds recorded as EXACT — files written under a
  * `parquet.statistics.truncate.length` config carry the "str~" tag
  * instead, whose bounds may be non-attained prefixes and therefore
  * keep the scan here while still pruning) — anything else keeps the
  * scan. COUNT(c) additionally needs recorded null counts in every
  * file. */
case class MetadataCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  /** COUNT(1) references no attributes, so deterministic projections
    * under the aggregate are shape-transparent; MIN/MAX arguments
    * resolve through them via [[resolve]]. */
  private def strip(p: LogicalPlan): LogicalPlan = p match {
    case Project(projectList, child) if projectList.forall(_.deterministic) =>
      strip(child)
    case other => other
  }

  /** Follow `id` down through direct attribute aliases / pass-through
    * projections to the relation's own output attribute (its PHYSICAL
    * name — the one the parquet footers recorded stats under). Any
    * computed column on the way is None → no rewrite. */
  private def resolve(p: LogicalPlan, id: ExprId): Option[AttributeReference] =
    p match {
      case Project(list, child) => list.find(_.exprId == id).flatMap {
        case ar: AttributeReference => resolve(child, ar.exprId)
        case Alias(ar: AttributeReference, _) => resolve(child, ar.exprId)
        case _ => None
      }
      case r: LogicalRelation =>
        r.output.collectFirst { case a: AttributeReference if a.exprId == id => a }
      case _ => None
    }

  /** Parse a sidecar bound back to `dt`'s internal value. The bound
    * strings come from [[FileStats.fromFooter]]'s stringify of exact
    * footer values (Float.toString round-trips), so these parses are
    * lossless for every type the sidecar records as decidable. */
  private def internalValue(dt: DataType, bound: String): Option[Any] = {
    def t(v: => Any): Option[Any] = Try(v).toOption
    dt match {
      case ByteType => t(bound.toByte)
      case ShortType => t(bound.toShort)
      case IntegerType | DateType => t(bound.toInt)
      case LongType | TimestampType | TimestampNTZType => t(bound.toLong)
      case FloatType => t(java.lang.Float.parseFloat(bound))
      case DoubleType => t(java.lang.Double.parseDouble(bound))
      case StringType => t(UTF8String.fromString(bound))
      case _ => None
    }
  }

  /** The sidecar tag [[internalValue]] can replay for `dt` — a
    * mismatch (e.g. an INT96 timestamp recorded as absent, a decimal)
    * keeps the scan. */
  private def expectedTag(dt: DataType): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | FloatType | DoubleType => Some("num")
    case StringType => Some("str")
    case _ => None
  }

  /** One aggregate's metadata answer (internal value), or None when
    * the sidecar can't prove it. */
  private def answer(ae: AggregateExpression, rel: LogicalPlan,
                     entries: Seq[FileStats.FileStatsEntry],
                     totalRows: Long): Option[Any] = {
    if (ae.mode != Complete || ae.isDistinct || ae.filter.isDefined) return None
    def colStats(ar: AttributeReference): Option[(AttributeReference, Seq[(FileStats.FileStatsEntry, FileStats.ColStats)])] =
      resolve(rel, ar.exprId).flatMap { phys =>
        val per = entries.map(e => e.cols.get(phys.name).map(e -> _))
        if (per.forall(_.isDefined)) Some(phys -> per.map(_.get)) else None
      }
    ae.aggregateFunction match {
      case Count(Seq(Literal(v, _))) if v != null => Some(totalRows)
      case Count(Seq(ar: AttributeReference)) =>
        colStats(ar).flatMap { case (_, per) =>
          if (per.forall(_._2.nulls >= 0)) Some(totalRows - per.map(_._2.nulls).sum)
          else None
        }
      case Min(ar: AttributeReference) => bound(ar, colStats, wantMin = true)
      case Max(ar: AttributeReference) => bound(ar, colStats, wantMin = false)
      case _ => None
    }
  }

  /** Table-wide MIN/MAX from per-file bounds: all-null files (known:
    * `nulls == rows`) contribute nothing; every other file must carry
    * a decidable bound of the expected tag. No contributing file at
    * all = SQL's NULL over an all-null (or empty) column — as a typed
    * Some(null) so the caller still rewrites. */
  private def bound(ar: AttributeReference,
                    colStats: AttributeReference => Option[(AttributeReference, Seq[(FileStats.FileStatsEntry, FileStats.ColStats)])],
                    wantMin: Boolean): Option[Any] =
    for {
      tag <- expectedTag(ar.dataType)
      (_, per) <- colStats(ar)
      if per.forall { case (e, s) => s.tpe == tag &&
        ((if (wantMin) s.min else s.max).isDefined ||
          (s.nulls >= 0 && s.nulls == e.rows)) }
      bounds = per.flatMap(p => if (wantMin) p._2.min else p._2.max)
      v <- if (bounds.isEmpty) Some(null)
        else FileStats.reduceBound(tag, bounds, wantMin)
          .flatMap(internalValue(ar.dataType, _))
    } yield v

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, exprs, child, _) if exprs.nonEmpty =>
      strip(child) match {
        case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
          fs.location match {
            case idx: GraftFileIndex if idx.totalRows.isDefined &&
                idx.statsEntries.isDefined =>
              val answers = exprs.map {
                case Alias(ae: AggregateExpression, _) =>
                  answer(ae, child, idx.statsEntries.get, idx.totalRows.get)
                case _ => None
              }
              if (answers.forall(_.isDefined))
                LocalRelation(agg.output.map(_.toAttribute),
                  Seq(InternalRow.fromSeq(answers.map(_.get))))
              else agg
            case _ => agg
          }
        case _ => agg
      }
  }
}
