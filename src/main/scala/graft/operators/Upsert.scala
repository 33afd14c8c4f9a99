package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-record-wins materialization of an append-only change log — the
  * batch face of an upsert: the lake only ever appends (immutable objects),
  * so "current state per key" is a read-side view, not an in-place mutation.
  *
  * Plan shape: one shuffle on the key, per-partition top-1 via row_number —
  * never a global sort, and map-side nothing is lost to it (the window's
  * rank filter prunes inside each partition). Tiebreaks must make the
  * ordering total or "latest" is nondeterministic across runs.
  */
object Upsert {

  /** One row per `keys` combination: the row with the greatest `version`
    * (ties broken by `tiebreaks`, descending — supply enough for a total
    * order). */
  def latest(df: DataFrame, keys: Seq[String], version: Column,
             tiebreaks: Column*): DataFrame = {
    require(!df.columns.contains("_rn"),
      "input must not already contain the reserved _rn column")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((version.desc +: tiebreaks.map(_.desc)): _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
