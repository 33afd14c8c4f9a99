package org.apache.spark.sql.graft

import graft.lake.LakeMicroBatchStream

import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.DataSourceStrategy
import org.apache.spark.sql.execution.datasources.v2.StreamingDataSourceV2ScanRelation

/** Delivers a streaming query's plain `WHERE` to the lake micro-batch
  * source for OBJECT-level pruning.
  *
  * Spark's `V2ScanRelationPushDown` never visits a streaming relation —
  * `MicroBatchExecution` builds the scan as `newScanBuilder(options)
  * .build()`, so `SupportsPushDownFilters` is structurally unreachable
  * from a `readStream` plan and a filtered backfill would read every
  * object in the window. This rule closes that gap from the other side:
  * it matches `Filter` directly above a lake
  * [[StreamingDataSourceV2ScanRelation]] in the PER-MICRO-BATCH
  * optimized plan (`IncrementalExecution` re-optimizes every trigger, and
  * `PushDownPredicates` has already pushed deterministic conjuncts down
  * to the relation by the time user-provided rules run), translates the
  * conjuncts to `sources.Filter`s, and hands them to
  * [[LakeMicroBatchStream.deliverFilters]].
  *
  * The plan itself is returned UNCHANGED — the rule is advisory, the
  * `Filter` node stays and re-applies row-level, so a bloom false
  * positive costs an opened object, never a wrong row (exactly the batch
  * scan's contract). Delivery is idempotent per trigger; the stream
  * recompiles its prune predicate only when the filter set actually
  * tightens. Registered by `graft.GraftExtensions` and
  * `graft.Sessions.local`.
  */
object StreamLakePrune extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    plan.foreach {
      case Filter(cond, r: StreamingDataSourceV2ScanRelation) =>
        r.stream match {
          case mb: LakeMicroBatchStream =>
            val translated = splitConjunctivePredicates(cond).flatMap(e =>
              DataSourceStrategy.translateFilter(
                e, supportNestedPredicatePushdown = true))
            if (translated.nonEmpty) mb.deliverFilters(translated.toArray)
          case _ => ()
        }
      case _ => ()
    }
    plan
  }
}
