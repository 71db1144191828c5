package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.ManifestFileIndex

/** Metadata-answered global aggregates over commit-logged tables (the
  * Delta/Iceberg stats-based-query-answering trick): a bare global
  * `count(*)` / `min(x)` / `max(x)` over a manifest-planned relation
  * folds at optimization time to values the commit log already
  * carries — zero files opened, O(1) at any table size.
  *
  * Sound only in the exact shape matched here:
  *   - global aggregate (no grouping) whose EVERY expression is a
  *     plain `count(*)`/`count(1)`, `min(col)`, or `max(col)` —
  *     `count(col)` must see nulls, so it scans;
  *   - directly over the relation (modulo the optimizer's pruning
  *     Project) — any Filter/Join in between keeps the scan;
  *   - the [[ManifestFileIndex]] carries the needed answer: an exact
  *     row count (set only when every entry recorded rows and no
  *     deletion vector hides any) or a per-column exact (min, max)
  *     (numeric columns whose stats EVERY entry carries — nulls
  *     never contribute to min/max, and a stat-less all-null or
  *     legacy file blocks the fold; string maxes are truncation-
  *     dropped and never fold).
  *
  * Injected via `injectOptimizerRule` ([[graft.functions
  * .GraftExtensions]]) so it runs after pruning has already reduced
  * the child to the Project-over-relation shape. */
class MetadataCountRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def indexOf(plan: LogicalPlan): Option[ManifestFileIndex] =
    plan match {
      case Project(projectList, child) if projectList.forall(_.isInstanceOf[Attribute]) =>
        indexOf(child)
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location match {
          case idx: ManifestFileIndex => Some(idx)
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

  /** The folded value for one aggregate expression, if the manifest
    * can answer it. */
  private def answer(idx: ManifestFileIndex,
      e: org.apache.spark.sql.catalyst.expressions.NamedExpression): Option[Any] =
    e match {
      case Alias(AggregateExpression(f, Complete, false, None, _), _) => f match {
        case Count(Seq(Literal(_, _))) => idx.exactRowCount
        case Min(a: Attribute) =>
          idx.exactMinMax.get(a.name).map(_._1)
            .map(CatalystTypeConverters.convertToCatalyst)
        case Max(a: Attribute) =>
          idx.exactMinMax.get(a.name).map(_._2)
            .map(CatalystTypeConverters.convertToCatalyst)
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: Aggregate
        if a.groupingExpressions.isEmpty && a.aggregateExpressions.nonEmpty =>
      indexOf(a.child) match {
        case Some(idx) =>
          val answers = a.aggregateExpressions.map(answer(idx, _))
          // every column must fold, or none does (a partial fold
          // would still scan — no point, and LocalRelation can't mix)
          if (answers.forall(_.isDefined))
            LocalRelation(a.output,
              Seq(InternalRow.fromSeq(answers.map(_.get))))
          else a
        case None => a
      }
  }
}
