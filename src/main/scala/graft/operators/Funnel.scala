package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered conversion funnel: per key, the first occurrence of stage 1,
  * the first occurrence of stage 2 STRICTLY after it, … for k stages.
  *
  * The textbook formulation is k cascaded min-aggregations with k−1
  * self-joins (stage i filters on stage i−1's timestamp) — k shuffles of
  * the event log plus join traffic. This operator instead folds all k
  * stage timestamps in ONE keyed pass: group by key, sort the per-key
  * event list once (ties broken by a caller-supplied unique column), and
  * walk it left-to-right updating a k-slot state struct. One exchange
  * total, whatever k is; `PlanShapeSpec` pins the zero-join plan.
  *
  * Memory: the fold materializes each key's matching events as one array,
  * so per-key event counts must fit a task row (the usual funnel regime —
  * events are pre-filtered to the stage types). For keys with unbounded
  * histories, pre-aggregate per (key, day) or window the input first —
  * and arm `maxEventsPerKey`, which raises IN-PLAN (naming the key and
  * its count) when one bot key would otherwise OOM a task's fold buffer.
  *
  * Semantics pinned by the q55 oracle (three cascaded mins in DuckDB):
  * stage i+1 counts only when its timestamp is strictly greater than
  * stage i's — simultaneous events never satisfy two stages, whichever
  * order the tie-break sorts them.
  */
object Funnel {

  /** Per-key stage timestamps: one row per key, one nullable `BIGINT`
    * column per stage (micros or any monotone integer `tsCol` encodes).
    * `stages` are the ordered event-type labels; `typeCol` matches them.
    * Output columns: key, then one column per stage named by `names`.
    * `maxEventsPerKey > 0` arms the per-key history guard (counted AFTER
    * the stage-type filter — decoy event types don't charge the bound). */
  def stages(events: DataFrame, keyCol: Column, tsCol: Column, tieCol: Column,
             typeCol: Column, stages: Seq[String], names: Seq[String],
             maxEventsPerKey: Long = 0L): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    require(names.length == stages.length, "one output name per stage")
    require(names.distinct.length == names.length, s"duplicate names: $names")
    // distinct stage labels are the CONTRACT (shared with the streaming
    // twin, whose indexOf-based fold cannot express a repeated label)
    require(stages.distinct.length == stages.length, s"duplicate stages: $stages")
    val fields = names.indices.map(i => s"s$i")
    val zero = fields.map(f => s"'$f', CAST(NULL AS BIGINT)").mkString(", ")
    // stage labels are DATA interpolated into expression text — escape
    // them, or a label containing a quote breaks (or injects into) the
    // fold expression
    def sqlLit(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    // s0 arms on its type alone; s(i) on its type AND s(i−1) set AND a
    // strictly later timestamp. st.s(i−1) (pre-update) is equivalent to
    // the post-update value here because one event has one type: the only
    // element that changes s(i−1) fails the s(i) type test by definition.
    val arms = names.indices.map { i =>
      val tp = sqlLit(stages(i))
      val guard = if (i == 0) "" else s"AND st.s${i - 1} IS NOT NULL AND e.ts > st.s${i - 1} "
      s"'s$i', CASE WHEN st.s$i IS NULL AND e.tp = $tp ${guard}THEN e.ts ELSE st.s$i END"
    }.mkString(",\n")
    val filtered = events
      .select(keyCol.as("key"), tsCol.cast("long").as("ts"), tieCol.as("tie"),
        typeCol.as("tp"))
      .filter(col("tp").isin(stages: _*))
    Guards.perKeyRows(filtered, col("key"), maxEventsPerKey, "Funnel.stages",
        "maxEventsPerKey",
        "one key's stage events would not fit a task's fold buffer; " +
          "pre-aggregate unbounded histories per (key, day), window the " +
          "input first, or raise the bound deliberately")
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("ts"), col("tie"), col("tp")))).as("evs"))
      .withColumn("st", expr(
        s"aggregate(evs, named_struct($zero), (st, e) -> named_struct($arms))"))
      .select(col("key") +: names.indices.map(i => col(s"st.s$i").as(names(i))): _*)
  }
}
