package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.ManifestFileIndex

/** Metadata-answered `count(*)` over commit-logged tables (the
  * Delta/Iceberg stats-based-query-answering trick): a bare global
  * count over a manifest-planned relation folds to the commit log's
  * recorded row total — zero files opened, O(1) at any table size.
  *
  * Sound only in the exact shape matched here:
  *   - global aggregate (no grouping) whose every aggregate is
  *     `count(*)`/`count(1)` — `count(col)` must see nulls, so it
  *     scans;
  *   - directly over the relation (modulo the optimizer's pruning
  *     Project) — any Filter/Join/etc. in between keeps the scan;
  *   - the [[ManifestFileIndex]] carries an exact row count, which
  *     the read path sets ONLY when every manifest entry recorded
  *     its rows and no deletion vector hides any (legacy entries and
  *     DV snapshots scan as before).
  *
  * Injected via `injectOptimizerRule` ([[graft.functions
  * .GraftExtensions]]) so it runs after pruning has already reduced
  * the child to the Project-over-relation shape. */
class MetadataCountRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def countStarOnly(a: Aggregate): Boolean =
    a.groupingExpressions.isEmpty && a.aggregateExpressions.nonEmpty &&
      a.aggregateExpressions.forall {
        case Alias(AggregateExpression(Count(Seq(Literal(_, _))), Complete,
          false, None, _), _) => true
        case _ => false
      }

  private def manifestCount(plan: LogicalPlan): Option[Long] = plan match {
    case Project(projectList, child) if projectList.isEmpty =>
      manifestCount(child)
    case l: LogicalRelation => l.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case idx: ManifestFileIndex => idx.exactRowCount
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: Aggregate if countStarOnly(a) =>
      manifestCount(a.child) match {
        case Some(n) =>
          LocalRelation(a.output,
            Seq(InternalRow.fromSeq(a.output.map(_ => n))))
        case None => a
      }
  }
}
