package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** One place for the operators' "materialize this multi-consumer /
  * iterative intermediate" decision (r16 ADVICE: gate the mechanism
  * behind a config instead of hard-coding `localCheckpoint`).
  *
  * `localCheckpoint` stores lineage-free blocks on executors: the cheapest
  * way to truncate a plan and run a subtree exactly once (guide §3.3/§5),
  * but NOT fault-tolerant — a lost executor invalidates the blocks and
  * fails the query, which is wrong for dynamic allocation / spot
  * decommissioning, and it eagerly executes at call time. The right
  * mechanism is a deployment property, not an operator property, so it is
  * one session conf:
  *
  *   spark.graft.materialize = local     (default) localCheckpoint —
  *                                       retry-the-query semantics; right
  *                                       for benches, notebooks, static
  *                                       executors
  *                             reliable  RDD checkpoint to
  *                                       `sparkContext.setCheckpointDir`
  *                                       (required) — survives executor
  *                                       loss; right for spot fleets and
  *                                       multi-hour pipelines
  *                             persist   MEMORY_AND_DISK persist — lineage
  *                                       kept (recomputable on loss), plan
  *                                       NOT truncated, so huge-plan sites
  *                                       still pay planning cost
  *
  * Every operator cut point calls [[cut]]; the per-site comments at the
  * call sites say WHY that subtree must run once (self-join, N consumers,
  * iterative lineage growth).
  */
object Materialize {
  def cut(df: DataFrame): DataFrame =
    df.sparkSession.conf.get("spark.graft.materialize", "local") match {
      case "local"    => df.localCheckpoint()
      case "reliable" => df.checkpoint()
      case "persist"  => df.persist(StorageLevel.MEMORY_AND_DISK)
      case other => throw new IllegalArgumentException(
        s"spark.graft.materialize must be local|reliable|persist, got '$other'")
    }
}
