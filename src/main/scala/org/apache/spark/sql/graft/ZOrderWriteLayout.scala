package org.apache.spark.sql.graft

import graft.lake.LakeWrite

import org.apache.spark.sql.catalyst.expressions.{Ascending, Cast, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, LogicalPlan, RepartitionByExpression, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** The OPTIMIZE-ZORDER write path through plain `df.write`:
  * `option("clusterBy", "zorder(a,b)")` lands objects clustered on the
  * MORTON interleave of both columns, so a read filtering EITHER column
  * (or a narrow box on both) prunes to ~√N of N objects where a
  * lexicographic layout prunes only its leading column.
  *
  * Why a rule and not `RequiresDistributionAndOrdering`: that interface
  * can only express sort orders Spark can resolve, and a custom
  * function-valued ordering needs a FunctionCatalog on the write plan —
  * which a pathless `df.write.format(...)` never carries. So the
  * connector reports the z-request on the built [[LakeWrite]] and this
  * rule rewrites the `AppendData` query with exactly the plan shape
  * `Distributions.ordered` would have produced: one range exchange on
  * the z-value (sampled boundaries — the write's usual shuffle, not an
  * extra one) plus an in-partition sort, both on the engine's codegen'd
  * [[exprs.ZInterleave]]. `writePartitions` caps the exchange's
  * partition count (≈ object count). Advisory and idempotent: the
  * rewrite fires once (guarded by the z-sort already sitting on the
  * query) and never changes WHAT is written, only the row→task layout.
  * Registered by `graft.GraftExtensions` and `graft.Sessions.local`;
  * without the rule the option degrades to an unclustered write
  * (documented on the option), never a wrong one. */
object ZOrderWriteLayout extends Rule[LogicalPlan] {

  private def zSort(q: LogicalPlan): Boolean = q match {
    case s: Sort => s.order.exists(_.child.exists(_.isInstanceOf[exprs.ZInterleave]))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case a: AppendData if a.write.exists {
          case w: LakeWrite => w.zorderColumns.isDefined
          case _ => false
        } && !zSort(a.query) =>
      val w = a.write.get.asInstanceOf[LakeWrite]
      val (c1, c2) = w.zorderColumns.get
      def attr(n: String) = a.query.output
        .find(o => conf.resolver(o.name, n))
        .getOrElse(throw new IllegalArgumentException(
          s"zorder column $n not found in write query output " +
            a.query.output.map(_.name).mkString("(", ",", ")")))
      val z = exprs.ZInterleave(
        Cast(attr(c1), LongType), Cast(attr(c2), LongType))
      val order = SortOrder(z, Ascending)
      val shuffled = RepartitionByExpression(Seq(order), a.query,
        if (w.zorderPartitions > 0) Some(w.zorderPartitions) else None)
      a.copy(query = Sort(Seq(order), global = false, shuffled))
  }
}
