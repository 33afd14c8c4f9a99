package graft.streaming

import graft.collector.{FlushInfo, FlushTrigger}
import graft.lake.LakeWriter
import graft.types.TableSchema

import java.time.Instant

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

  /** Attach a lake sink to a streaming DataFrame. Caller starts the query.
    *
    * Micro-batch hygiene: the batch is persisted once, counted off the
    * cache, reshaped (repartition up so no writer exceeds the record limit;
    * coalesce down for small batches but never below `writerFloor` tasks —
    * a sub-limit batch must not serialize through one writer), and written
    * in a single pass. [[LakeWriter]] rolls objects at the record limit and
    * reports exact per-object counts, so each `FlushInfo` carries the real
    * object id (the key's uuid) and its real row count. */
  def writer(df: DataFrame, schema: TableSchema, rootUri: String,
             gzip: Boolean = true,
             recordLimit: Long = 200000L,
             ageLimit: java.time.Duration = java.time.Duration.ofHours(1),
             writerFloor: Int = 4,
             sinkId: String = "",
             onFlush: FlushInfo => Unit = _ => (),
             zoneMaps: Boolean = false): DataStreamWriter[Row] = {
    df.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(ageLimit.toMillis))
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val cached = batch.persist()
        try landBatch(cached, cached.count(), schema, rootUri, gzip, recordLimit,
          writerFloor, onFlush, epochId, sinkId, zoneMaps)
        finally { cached.unpersist(); () }
      }
  }

  /** Multi-table routing sink: `tableCol` carries each record's resolved
    * table name (the wildcard-family case at scale — `Collector.ts:95-96`
    * resolves `$`→token per record, so the table name is DATA, not
    * topology). Each micro-batch splits by table off one cached pass and
    * lands per-table objects with per-table schemas. The distinct-table
    * collect is bounded by family cardinality (metadata-sized).
    *
    * Records with a NULL route name are invalid input (the reference's
    * `track` requires a table, `Collector.ts:205-214`). They are never
    * silently lost: when `deadLetterTable` is set they land there (same
    * columns, minus the route column) for later inspection; otherwise
    * `onDropped` fires with the per-batch count — the routing analogue of
    * `Collector.onError`'s signal-never-throw contract. */
  def routedWriter(df: DataFrame, tableCol: String, schemaFor: String => TableSchema,
                   rootUri: String,
                   gzip: Boolean = true,
                   recordLimit: Long = 200000L,
                   ageLimit: java.time.Duration = java.time.Duration.ofHours(1),
                   writerFloor: Int = 4,
                   sinkId: String = "",
                   onFlush: FlushInfo => Unit = _ => (),
                   deadLetterTable: Option[String] = None,
                   onDropped: Long => Unit = n =>
                     System.err.println(s"[graft.LakeSink] dropped $n record(s) with null route"),
                   zoneMaps: Boolean = false): DataStreamWriter[Row] = {
    import org.apache.spark.sql.functions.col
    df.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(ageLimit.toMillis))
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val cached = batch.persist()
        try {
          val counts = cached.groupBy(col(tableCol)).count().collect()
            .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1))
          counts.find(_._1 == null).foreach { case (_, n) =>
            deadLetterTable match {
              case Some(dlt) =>
                val sub = cached.filter(col(tableCol).isNull).drop(tableCol)
                landBatch(sub, n, schemaFor(dlt), rootUri, gzip, recordLimit,
                  writerFloor, onFlush, epochId, sinkId, zoneMaps)
              case None => onDropped(n)
            }
          }
          counts.filter(_._1 != null).foreach { case (table, n) =>
            val sub = cached.filter(col(tableCol) === table).drop(tableCol)
            landBatch(sub, n, schemaFor(table), rootUri, gzip, recordLimit,
              writerFloor, onFlush, epochId, sinkId, zoneMaps)
          }
        } finally { cached.unpersist(); () }
      }
  }

  /** Shared micro-batch landing: reshape (repartition up so no writer
    * exceeds the record limit; coalesce down but never below `writerFloor`)
    * and write in one pass with exact per-object accounting.
    *
    * Commit protocol (the piece task-level delete-on-failure can't give):
    * tasks write under a job-scoped `_staging/` prefix — invisible to
    * readers, whose key parser rejects it — and only the keys the
    * SUCCESSFUL attempts reported are renamed into the final layout, so a
    * hard-killed executor's partial object or a speculative twin that ran
    * to completion never reaches readable keys. Final object names are
    * deterministic per (table, epoch, index): when the driver dies after
    * publishing but before Spark commits the epoch, the replayed epoch
    * REWRITES the same keys instead of duplicating — idempotent as long as
    * the replay lands in the same UTC flush hour (a replay that crosses the
    * hour boundary can duplicate; compaction / [[graft.operators.Upsert]]
    * are the recovery). Two refinements to that determinism:
    *
    *  - `sinkId` folds into the name seed. Deterministic names mean two
    *    CONCURRENT writers landing the same table (separate checkpoints,
    *    both starting at epoch 0) would silently overwrite each other's
    *    objects; distinct `sinkId`s (e.g. the checkpoint path) keep their
    *    key spaces disjoint. It must be STABLE across restarts of the same
    *    query — a per-run random id would break replay idempotence.
    *  - A replay that produces FEWER objects than the first attempt would
    *    leave the first attempt's higher-index objects behind as
    *    duplicates; after publishing, the probe-delete loop below removes
    *    same-(sinkId, table, epoch) keys at indices ≥ the published count
    *    (leftovers are index-contiguous by construction, so probing stops
    *    at the first missing key).
    *
    * FlushInfo.ageMillis on this path is the epoch's
    * land-to-publish duration (streaming has no per-record arrival clock —
    * a semantic delta from the Collector's batch age, noted here on
    * purpose). */
  private[streaming] def landBatch(batch: DataFrame, n: Long, schema: TableSchema,
                        rootUri: String, gzip: Boolean, recordLimit: Long,
                        writerFloor: Int, onFlush: FlushInfo => Unit,
                        epochId: Long, sinkId: String = "",
                        zoneMaps: Boolean = false,
                        publishStore: graft.lake.Store = null): Unit =
    if (n > 0) {
      val parts = ((n + recordLimit - 1) / recordLimit).toInt
      val cur = batch.rdd.getNumPartitions
      val sized =
        if (parts > cur) batch.repartition(parts)
        else batch.coalesce(math.max(math.min(writerFloor, cur), parts))
      val trigger =
        if (n >= recordLimit) FlushTrigger.RecordLimit else FlushTrigger.AgeLimit
      val t0 = System.currentTimeMillis()
      val flushTime = Instant.now()
      val staging = s"_staging/${schema.name}-$epochId-${java.util.UUID.randomUUID()}"
      // publishStore is a test seam: the driver-side publish protocol
      // (rename/exists/delete/deletePrefix) runs against an injectable
      // Store so its behavior under S3-like semantics — copy+delete
      // rename, transient put failures — is spec-pinned (FaultyStoreSpec)
      // even though the sandbox has no real object store. Task-side
      // object writes (LakeWriter) construct their own per-executor
      // HadoopStore either way.
      val store = if (publishStore != null) publishStore
                  else new graft.lake.HadoopStore(rootUri)
      try {
        // epochs land in the current hour — above any legal seal point —
        // but the manifest guard is one exists() probe per epoch
        graft.lake.Manifests.invalidateIfCovers(store, schema.name,
          graft.lake.LakeKeys.datePrefix(flushTime))
        val written = LakeWriter.write(sized, schema, rootUri, flushTime, gzip,
          maxRecordsPerObject = recordLimit, keyPrefix = s"$staging/",
          zoneMaps = zoneMaps)
        def epochKey(i: Int): (java.util.UUID, String) = {
          // the default (no sinkId) seed must stay byte-identical to the
          // pre-sinkId format: a stream that landed epochs under the old
          // names and restarts on newer code must REWRITE those keys on
          // replay, not write a disjoint second copy it would never clean
          val seed = if (sinkId.isEmpty) s"${schema.name}:$epochId:$i"
                     else s"$sinkId:${schema.name}:$epochId:$i"
          val id = java.util.UUID.nameUUIDFromBytes(
            seed.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (id, graft.lake.LakeKeys.objectKey(schema.name, flushTime, id, gzip))
        }
        // MERGE-ON-READ × REPLAY guard (round 17): a replayed epoch
        // REWRITES its deterministic keys — safe for plain appends and
        // under equality deletes (value-based filters re-apply to the
        // replayed rows identically), but NOT for keys a committed DML
        // statement has since TOMBSTONED (the rewrite would resurrect a
        // retired object) or VECTORED (positions were computed against
        // the first attempt's bytes; a rewrite under them corrupts).
        // One exists() probe detects the replay; only then is the chain
        // consulted. Failing here is deliberate and loud — the remedy
        // is compaction (which folds vectors and re-keys the data),
        // never a silent rewrite.
        val replayView: Option[graft.lake.LakeVersions.TableView] =
          if (store.exists(epochKey(0)._2))
            Some(graft.lake.LakeVersions.tableView(store, schema.name))
          else None
        def chainGuard(k: String, rewriting: Boolean): Unit =
          replayView.foreach { view =>
            // a rewrite is unsafe under EITHER mark; a leftover DELETE
            // only under a vector (deleting a tombstoned leftover just
            // finishes the interrupted retire)
            require(!view.dvs.contains(k) &&
                !(rewriting && view.excl.contains(k)),
              s"graft-lake sink: replaying epoch $epochId would " +
                s"${if (rewriting) "rewrite" else "delete"} $k, which a " +
                "committed DML statement has since tombstoned or " +
                "vectored — that would corrupt. CALL lake.system.compact " +
                s"on '${schema.name}', then restart the stream.")
          }
        val published = written.sortBy(_.key).zipWithIndex.map { case (w, i) =>
          val (id, dst) = epochKey(i)
          chainGuard(dst, rewriting = true)
          store.rename(w.key, dst)
          // the sidecar is staged+renamed EXACTLY like its data object, so
          // the whole replay/heal protocol below carries it for free. With
          // zone maps off, any sidecar a PREVIOUS attempt left at this key
          // must go: a replayed epoch is not guaranteed byte-identical, and
          // a stale sidecar under a rewritten object would prune wrongly.
          if (zoneMaps)
            store.rename(graft.lake.ZoneMaps.statsKey(w.key),
              graft.lake.ZoneMaps.statsKey(dst))
          else
            // NO failure-swallowing here: delete on a missing key is a
            // no-op, so the only way this throws is a real store fault —
            // and eating it would commit the epoch with a stale sidecar
            // under rewritten bytes, permanently (no replay retries a
            // committed epoch). Let it fail the batch; the replay heals.
            store.delete(graft.lake.ZoneMaps.statsKey(dst))
          // the sink never writes BLOOM sidecars, but a batch index pass
          // (LakeWriter/compact with bloomColumns) may have landed one
          // under this table — and this publish may be a replay REWRITING
          // dst with different bytes, under which a stale bloom could
          // wrongly SKIP. Same no-swallowing contract as the stats
          // sidecar above. Cost: one guaranteed-miss delete per published
          // object in the common no-bloom case — deliberately NOT gated
          // on exists() (that is one RPC either way, and 2 on a hit; a
          // blind delete is 1 always, and S3-class stores price DELETE
          // requests at zero).
          store.delete(graft.lake.BloomMaps.bloomKey(dst))
          w.copy(key = dst, id = id)
        }
        // a replay that produced fewer objects than the first attempt must
        // delete the first attempt's leftover higher-index keys (contiguous
        // from the published count; stop at the first missing one) — each
        // with its sidecar, which would otherwise orphan
        var extra = published.length
        var moreLeftovers = true
        while (moreLeftovers) {
          val (_, k) = epochKey(extra)
          if (store.exists(k)) {
            // deleting a VECTORED leftover would dangle its committed
            // mapping (tombstoned is fine — deletion finishes the
            // retire); the replay guard covers it
            chainGuard(k, rewriting = false)
            store.delete(k)
            graft.lake.ZoneMaps.deleteSidecarSignaled(store, k,
              "graft.LakeSink leftover-cleanup")
            extra += 1
          } else moreLeftovers = false
        }
        // heal objects landed by the short-lived intermediate seed format
        // (":table:epoch:i" — sinkId folded in without the empty-default
        // carve-out): same epoch, disjoint key space, so a replay would
        // otherwise duplicate them instead of rewriting (same hour-boundary
        // caveat as the loop above). Runs REGARDLESS of the configured
        // sinkId — a stream that landed intermediate-format epochs and
        // restarts with a sinkId newly configured must still clean them —
        // and is a no-op (one exists() probe) when no such objects exist.
        locally {
          def interKey(i: Int): String = {
            val id = java.util.UUID.nameUUIDFromBytes(
              s":${schema.name}:$epochId:$i"
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            graft.lake.LakeKeys.objectKey(schema.name, flushTime, id, gzip)
          }
          var j = 0
          var moreInter = true
          while (moreInter) {
            val k = interKey(j)
            if (store.exists(k)) {
              store.delete(k)
              graft.lake.ZoneMaps.deleteSidecarSignaled(store, k,
                "graft.LakeSink intermediate-seed-cleanup")
              j += 1
            } else moreInter = false
          }
        }
        // again AFTER the epoch publish: a seal racing the commit heals
        graft.lake.Manifests.invalidateIfCovers(store, schema.name,
          graft.lake.LakeKeys.datePrefix(flushTime))
        val age = System.currentTimeMillis() - t0
        published.foreach { w =>
          onFlush(FlushInfo(schema.name, w.id, trigger, w.records, age, w.key))
        }
      } finally {
        // success or failure: no unpublished attempt output may linger —
        // including staged zone-map sidecars
        try store.deletePrefix(staging) catch { case _: Throwable => () }
        try store.deletePrefix(graft.lake.ZoneMaps.Prefix + staging)
        catch { case _: Throwable => () }
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
