package org.apache.spark.sql.graft

import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.internal.connector.PredicateUtils
import org.apache.spark.sql.sources.Filter

/** One-method bridge to Spark's own V2→V1 predicate conversion
  * (`PredicateUtils` is `private[sql]`, hence this package): the lake's
  * SQL-DML translation ([[graft.lake.LakeRowLevel.translateDelete]])
  * pattern-matches v1 `Filter`s — the same shapes its pruning layer
  * already speaks — instead of re-implementing the V2 expression walk. */
object V2Predicates {
  /** Per-predicate conversion, order-preserving: `None` marks a conjunct
    * Spark itself cannot express as a v1 filter (the caller must refuse
    * the whole condition then — a dropped conjunct would over-delete). */
  def toV1(predicates: Array[Predicate]): Array[Option[Filter]] =
    predicates.map(p => PredicateUtils.toV1(p))
}
