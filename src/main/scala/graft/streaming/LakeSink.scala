package graft.streaming

import graft.collector.{FlushInfo, FlushTrigger}
import graft.lake.LakeWriter
import graft.types.TableSchema

import java.time.Instant
import java.util.UUID

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured-Streaming lake sink: the scale path of the ingestion contract.
  *
  * Where [[graft.collector.Collector]] is the single-process edge (reference
  * parity), this sink lands an arbitrary-volume streaming DataFrame into the
  * same `YYYY/MM/DD/HH/table/uuid.csv.gz` layout: each micro-batch epoch is
  * the durability unit (the analogue of the reference's `TableBatch`,
  * `Collector.ts:74-90`), each task writes its partition as one object
  * directly to the store — no driver bottleneck, no shuffle beyond the
  * record-limit repartition.
  *
  * Trigger mapping (SURVEY.md §2A row 10): `batchAgeLimit` →
  * `Trigger.ProcessingTime` (timer-driven, strictly tighter than the
  * reference's lazy age check); `batchRecordLimit` → repartition so each
  * object holds ≤ limit rows; backpressure → native micro-batch admission
  * control.
  */
object LakeSink {

  /** Attach a lake sink to a streaming DataFrame. Caller starts the query. */
  def writer(df: DataFrame, schema: TableSchema, rootUri: String,
             gzip: Boolean = true,
             recordLimit: Long = 200000L,
             ageLimit: java.time.Duration = java.time.Duration.ofHours(1),
             onFlush: FlushInfo => Unit = _ => ()): DataStreamWriter[Row] = {
    df.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(ageLimit.toMillis))
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          val n = batch.count()
          val parts = math.max(1L, (n + recordLimit - 1) / recordLimit).toInt
          val sized = if (n > recordLimit) batch.repartition(parts) else batch.coalesce(1)
          val t0 = System.currentTimeMillis()
          val keys = LakeWriter.write(sized, schema, rootUri, Instant.now(), gzip)
          val trigger = if (n >= recordLimit) FlushTrigger.RecordLimit else FlushTrigger.AgeLimit
          keys.foreach { k =>
            onFlush(FlushInfo(schema.name, UUID.randomUUID(), trigger,
              n / math.max(1, keys.size), System.currentTimeMillis() - t0, k))
          }
        }
      }
  }

  /** Start with availableNow semantics (drain whatever is buffered, then
    * keep running on the age-limit timer). */
  def start(df: DataFrame, schema: TableSchema, rootUri: String,
            gzip: Boolean = true,
            recordLimit: Long = 200000L,
            onFlush: FlushInfo => Unit = _ => ()): StreamingQuery =
    writer(df, schema, rootUri, gzip, recordLimit, onFlush = onFlush).start()
}
