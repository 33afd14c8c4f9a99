package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `private[sql]` bridge for V1 streaming sources: the engine asserts
  * `getBatch`'s DataFrame has a STREAMING leaf, while an arbitrary batch
  * plan (the change feed's per-commit diffs shuffle) does not. Re-root
  * the plan as its own `InternalRow` RDD lineage flagged streaming —
  * physical planning happens here, execution stays with the sink. */
object StreamingDf {

  def asStreaming(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
