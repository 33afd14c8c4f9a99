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
    * come back prefixed with `buildPrefix`. */
  def join(probe: DataFrame, build: DataFrame, keys: Seq[String],
           probeTs: String, buildTs: String, buildPrefix: String = "asof_"): DataFrame = {
    val pCols = probe.columns.toSeq.filterNot(keys.contains)
    val bCols = build.columns.toSeq.filterNot(c => keys.contains(c) || c == buildTs)
    val pTypes = probe.schema.fields.map(f => f.name -> f.dataType).toMap
    val bTypes = build.schema.fields.map(f => f.name -> f.dataType).toMap
    val outB = (buildTs +: bCols).map(buildPrefix + _)

    val pSide = probe.select(
      keys.map(col) ++
        Seq(col(probeTs).as("_t"), lit(1).as("_p")) ++
        pCols.map(col) ++
        Seq(lit(null).cast(bTypes(buildTs)).as(buildPrefix + buildTs)) ++
        bCols.map(c => lit(null).cast(bTypes(c)).as(buildPrefix + c)): _*)
    val bSide = build.select(
      keys.map(col) ++
        Seq(col(buildTs).as("_t"), lit(0).as("_p")) ++
        pCols.map(c => lit(null).cast(pTypes(c)).as(c)) ++
        Seq(col(buildTs).as(buildPrefix + buildTs)) ++
        bCols.map(c => col(c).as(buildPrefix + c)): _*)

    // build sorts before probe at equal timestamps (_p: 0 < 1) → "at or
    // before"; the full-history frame makes the fill a running last().
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_t"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pSide.unionByName(bSide)
      .select(keys.map(col) ++ Seq(col("_p")) ++ pCols.map(col) ++
        outB.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("_p") === 1)
      .drop("_p")
  }
}
