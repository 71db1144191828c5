package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Sample}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Analysis-time rule injecting deterministic sampling over
  * base-table scans when the session runs in a dev sample mode — the
  * rule the reference implements by *path switching* (ascii-hydra
  * `spark_script_abc.py:32-67`: SmallDev modes read pre-sampled
  * buckets) and SURVEY §4 named as the one custom-Rule candidate.
  * Path switching needs a pre-provisioned sampled copy; this rule
  * samples any full input at plan time, so identical query code runs
  * in dev against full inputs.
  *
  * Controlled per-session: `spark.graft.devSampleFraction` ∈ (0,1)
  * enables; unset/1.0 disables. Seeded → deterministic.
  *
  * Injected via `injectPostHocResolutionRule` (a run-once batch, on
  * the analyzed plan) rather than the optimizer: optimizer batches
  * run to fixed point and rewrite scan nodes (column pruning builds
  * fresh LogicalRelations), which would re-wrap and compound the
  * sample. A [[TreeNodeTag]] keeps the rewrite idempotent even if
  * the batch revisits. */
class DevSampleRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import DevSampleRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // unparseable conf → rule inert with a warning, not a query-time
    // "internal error" NumberFormatException
    val fraction = spark.conf.getOption(fractionKey).flatMap { v =>
      val p = scala.util.Try(v.toDouble).toOption
      if (p.isEmpty) logWarning(s"$fractionKey='$v' is not a number; ignoring")
      p
    }.getOrElse(1.0)
    if (fraction >= 1.0 || fraction <= 0.0) return plan
    val seed = spark.conf.getOption(seedKey).map(_.toLong).getOrElse(42L)
    plan.transformUp {
      case rel: LogicalRelation if rel.getTagValue(sampledTag).isEmpty =>
        rel.setTagValue(sampledTag, true)
        Sample(0.0, fraction, withReplacement = false, seed, rel)
    }
  }
}

object DevSampleRule {
  val fractionKey = "spark.graft.devSampleFraction"
  val seedKey = "spark.graft.devSampleSeed"
  private[plans] val sampledTag = TreeNodeTag[Boolean]("graft.devSampled")
}
