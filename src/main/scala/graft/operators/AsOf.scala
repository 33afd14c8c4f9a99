package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each probe row, the build row with the greatest
  * timestamp ≤ the probe's (per key): the classic event-analytics operator
  * Spark has no native plan for (DuckDB: `ASOF JOIN`, which the oracle
  * uses).
  *
  * Plan: interleave both sides into one stream per key and fill build
  * attributes forward with an ordered `last(_, ignoreNulls)` running
  * window, then keep the probe rows. ONE shuffle by key and one sort —
  * the naive formulation (`p.ts >= b.ts` inequality join + max per probe)
  * explodes to |probe|·|build| rows per key before pruning, a non-starter
  * at scale. Build rows must be unique per (key, timestamp) for
  * deterministic results (pre-aggregate if not); unmatched probes get
  * nulls (left semantics).
  */
object AsOf {

  /** Join `build`'s attributes onto `probe` as-of `probe.probeTs` ≥
    * `build.buildTs` per `keys`. Build's timestamp and attribute columns
    * come back prefixed with `buildPrefix`.
    *
    * `tolerance` bounds staleness (pandas merge_asof's `tolerance`): a
    * match older than the bound nulls out, exactly as if no build row
    * existed — attribution windows, sensor-freshness rules. Units:
    * MICROSECONDS when the time columns are timestamps, the column's own
    * units when integral. The bound applies AFTER the forward fill (a
    * pure per-row projection — the plan is unchanged: one shuffle, one
    * sort).
    *
    * All build attributes travel as ONE struct and the struct is
    * forward-filled — filling columns independently would mix values
    * across build rows whenever the matched row carries a null attribute
    * (an older row's non-null value would leak through, diverging from
    * as-of semantics). The struct is null exactly on probe rows, so a
    * null fill result means "no state yet". */
  def join(probe: DataFrame, build: DataFrame, keys: Seq[String],
           probeTs: String, buildTs: String, buildPrefix: String = "asof_",
           tolerance: Option[Long] = None): DataFrame = {
    require(tolerance.forall(_ >= 0), s"tolerance must be non-negative: $tolerance")
    // All name checks go through the session resolver semantics
    // (Names.matcher): under default case-insensitive resolution, "_T"
    // collides with the internal "_t" and "ASOF_V" with output "asof_v"
    // even though the strings differ.
    val matches = Names.matcher(probe)
    val reserved = Seq("_t", "_p", "_state")
    require(!(probe.columns ++ build.columns)
        .exists(c => reserved.exists(matches(c, _))),
      s"column names ${reserved.mkString(", ")} are reserved by AsOf.join")
    val pCols = probe.columns.toSeq.filterNot(c => keys.exists(matches(c, _)))
    val bCols = build.columns.toSeq
      .filterNot(c => keys.exists(matches(c, _)) || matches(c, buildTs))
    // Output collision guard: a probe column spelled like a prefixed build
    // output would yield duplicate names that only fail on later selection.
    val outCols = (buildTs +: bCols).map(buildPrefix + _)
    val clash = probe.columns.toSeq.filter(c => outCols.exists(matches(c, _)))
    require(clash.isEmpty,
      s"probe columns ${clash.mkString(", ")} collide with as-of output columns " +
        s"(buildPrefix=$buildPrefix)")
    val pTypes = probe.schema.fields.map(f => f.name -> f.dataType).toMap
    val stateOf = struct((col(buildTs).as(buildTs) +: bCols.map(c => col(c).as(c))): _*)
    val stateType = org.apache.spark.sql.types.StructType(
      build.schema(buildTs) +: bCols.map(build.schema.apply))

    val pSide = probe.select(
      keys.map(col) ++
        Seq(col(probeTs).as("_t"), lit(1).as("_p")) ++
        pCols.map(col) ++
        Seq(lit(null).cast(stateType).as("_state")): _*)
    val bSide = build.select(
      keys.map(col) ++
        Seq(col(buildTs).as("_t"), lit(0).as("_p")) ++
        pCols.map(c => lit(null).cast(pTypes(c)).as(c)) ++
        Seq(stateOf.as("_state")): _*)

    // build sorts before probe at equal timestamps (_p: 0 < 1) → "at or
    // before"; the full-history frame makes the fill a running last().
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_t"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def asLong(c: org.apache.spark.sql.Column,
               dt: org.apache.spark.sql.types.DataType) = dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case _ => c.cast("long")
    }
    val filled = pSide.unionByName(bSide)
      .withColumn("_state", last(col("_state"), ignoreNulls = true).over(w))
      .filter(col("_p") === 1)
    val bounded = tolerance.fold(filled) { tol =>
      filled.withColumn("_state", when(
        col("_state").isNotNull &&
          asLong(col("_t"), probe.schema(probeTs).dataType) -
            asLong(col("_state").getField(buildTs), build.schema(buildTs).dataType)
            <= tol,
        col("_state")))
    }
    bounded
      .select(keys.map(col) ++ pCols.map(col) ++
        (buildTs +: bCols).map(c => col("_state").getField(c).as(buildPrefix + c)): _*)
  }
}
