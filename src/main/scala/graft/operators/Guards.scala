package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared in-plan resource guards (the RangeJoin-guard philosophy): an
  * operator whose memory or work is bounded by a per-key quantity fails
  * LOUDLY at a declared bound — naming the key and the remedy — instead
  * of OOMing a task or silently pinning a quadratic onto one key. */
object Guards {

  /** Annotate `df` with an in-plan guard: any group of equal `keyCol`
    * values larger than `maxRows` rows raises during the scan with the
    * key, the size, and `remedy` in the message. Adds one slim keyed
    * aggregation (key → count) probed back onto the rows (null-safe, so
    * NULL keys are guarded as a real group, not spuriously raised); AQE
    * broadcasts the count side when small. `maxRows ≤ 0` disables the
    * guard. */
  def perKeyRows(df: DataFrame, keyCol: Column, maxRows: Long,
                 what: String, boundName: String, remedy: String): DataFrame = {
    if (maxRows <= 0) df
    else {
      // working-column collisions rejected loudly (the RangeJoin
      // convention): a caller column named _gn/_gblk would make the
      // count-probe resolution ambiguous and drop() would eat it
      val matches = Names.matcher(df)
      for (reserved <- Seq("_gblk", "_gn"))
        require(!df.columns.exists(matches(_, reserved)),
          s"column name $reserved is reserved by Guards.perKeyRows ($what)")
      val sizes = df.groupBy(keyCol.as("_gblk"))
        .agg(count(lit(1)).as("_gn"))
      df.join(sizes, keyCol <=> col("_gblk"), "left")
        .filter(when(col("_gn") <= maxRows, lit(true)).otherwise(raise_error(
          format_string(
            s"$what: key %s has %s rows, over $boundName=$maxRows — $remedy",
            // format_string is null-strict: an oversized NULL-key group
            // would otherwise raise with a NULL message, losing the
            // key/bound/remedy diagnostic the guard exists to provide
            coalesce(col("_gblk").cast("string"), lit("NULL")),
            col("_gn")))))
        .drop("_gblk", "_gn")
    }
  }
}
