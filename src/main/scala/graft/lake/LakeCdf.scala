package graft.lake

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.connector.read.streaming.{Offset => V2Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

/** STREAMING change-data-feed over the version chain — the Delta
  * `readChangeFeed` / Iceberg incremental-scan idea as a continuous
  * subscription (the batch half is [[LakeChanges]]; the reference's lake
  * is the system of record a training pipeline re-reads,
  * `README.md:113-117` — this is the read that turns "re-run the diff
  * nightly" into a standing query):
  *
  * {{{
  * spark.readStream.format("graft-lake-cdf")
  *   .option("table", "events")
  *   .option("startingVersion", "12")        // or a tag; default: head
  *   .option("maxGensPerTrigger", "4")       // optional admission cap
  *   .load(rootUri)
  * }}}
  *
  * Each micro-batch covers a generation WINDOW `(start, end]` of the
  * table's version chain, delivered as the UNION of PER-COMMIT row-exact
  * diffs ([[LakeChanges.between]] per generation, the Delta-CDF
  * per-commit granularity): `insert` and `delete` rows with the table's
  * columns plus [[LakeChanges.ChangeTypeCol]], `_commit_gen` and
  * `_commit_at` (the commit's wall-clock stamp) — the
  * exact commit each change row belongs to, at ANY window size (a
  * catch-up batch over N commits keeps every commit's attribution; a row
  * inserted then deleted across two commits shows BOTH events, never a
  * net). Per-commit cost is bounded by that commit's changed objects.
  * `maxGensPerTrigger` caps each batch's window, and
  * `Trigger.AvailableNow` is first-class (`SupportsTriggerAvailableNow`,
  * the FileStreamSource posture): the drain target pins at prepare
  * time and a capped run drains the WHOLE backlog in per-window
  * batches, then stops.
  *
  * '''Offsets are generation numbers''' — checkpointable, replayable:
  * committed records are immutable and `liveAt` re-resolves the same
  * snapshots, so a restarted query recomputes an identical batch
  * (exactly-once per commit window). The replay contract is the Delta
  * CDF one: retention must outlive checkpoint lag — `expire_versions`
  * reclaiming a generation the checkpoint still needs fails the replay
  * LOUDLY (the liveAt error names the remedy), never silently.
  *
  * '''What this source is NOT''': plain appends commit no generation
  * (the ingest hot path pays nothing, by design), so appended rows
  * enter the feed only when the NEXT commit's snapshot captures them —
  * a CDF batch is committed state, not a tail. Tail the table itself
  * with the regular micro-batch source (`format("graft-lake")`), which
  * delivers appends object-exactly; the two sources compose (tail for
  * freshness, CDF for row-exact mutation history).
  *
  * Needs history retention (`CALL set_retention(retain => true)`) — the
  * same contract as every time-travel read. The stream's output shape is
  * pinned at start (the established posture: a post-ALTER column appears
  * on restart; a column DROPPED under a running feed fails loudly). */
final class LakeCdfProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake-cdf"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("table", throw new IllegalArgumentException(
      "graft-lake-cdf: option(\"table\", name) is required"))

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft-lake-cdf: .load(rootUri) is required"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String])
      : (String, StructType) = {
    require(schema.isEmpty,
      "graft-lake-cdf: the schema is the table's own — do not supply one")
    (shortName(), LakeCdf.feedStruct(rootOf(parameters), tableOf(parameters)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new LakeCdfSource(sqlContext, rootOf(parameters), tableOf(parameters),
      parameters)
}

private[lake] object LakeCdf {

  val CommitGenCol = "_commit_gen"
  val CommitAtCol = "_commit_at"

  /** Table columns (declared schema when ALTERed, else one header peek)
    * + `_change_type` + `_commit_gen` + `_commit_at` (the commit's
    * wall-clock stamp, the Delta `_commit_timestamp` analogue) — the
    * feed's fixed shape. */
  def feedStruct(root: String, table: String): StructType = {
    val store = new HadoopStore(root)
    val base = LakeSchemas.current(store, table).map(_.schema)
      .getOrElse(LakeDataSource.peek(root, table))
    val cols = LakeDataSource.outputStruct(base)
    Seq(CommitGenCol, CommitAtCol).foreach { c =>
      require(!cols.fieldNames.contains(c),
        s"graft-lake-cdf: table '$table' carries a data column named " +
          s"'$c' — the feed cannot shadow it")
    }
    StructType(cols.fields :+
      StructField(LakeChanges.ChangeTypeCol, StringType, nullable = false) :+
      StructField(CommitGenCol, LongType, nullable = false) :+
      StructField(CommitAtCol, TimestampType, nullable = false))
  }
}

private final class LakeCdfSource(sqlContext: SQLContext, root: String,
                                  table: String,
                                  parameters: Map[String, String])
    extends Source with SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession
  private val store = new HadoopStore(root)
  // ONE chain view per source — a steady-state trigger pays one
  // version-directory listing and ZERO record re-reads (the round-16
  // metadata-amplification lesson the other streaming source learned;
  // committed records cache by immutability inside)
  private val chain = new LakeVersions.ChainCache(store, table)

  private val maxGens: Long = {
    val n = parameters.get("maxGensPerTrigger").map(_.toLong)
      .getOrElse(Long.MaxValue)
    require(n >= 1, s"maxGensPerTrigger must be >= 1, got $n")
    n
  }

  /** The BASELINE generation: changes strictly after it stream. Default
    * = the head at source creation ("subscribe to future commits");
    * `startingVersion` (a generation or tag) or `startingTimestamp`
    * (ISO-8601 instant or epoch millis — resolves to the newest commit
    * at or before it, the `TIMESTAMP AS OF` rule) replays history from
    * a retained snapshot forward. */
  private val startGen: Long = {
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "graft-lake-cdf: startingVersion and startingTimestamp are " +
        "mutually exclusive")
    parameters.get("startingVersion") match {
      case Some(v) =>
        val g = LakeVersions.resolveVersion(store, table, v)
        require(g <= headGen(),
          s"graft-lake-cdf: startingVersion $g of '$table' is above the " +
            s"head (${headGen()})")
        g
      case None => parameters.get("startingTimestamp") match {
        case Some(ts) =>
          val millis =
            try java.time.Instant.parse(ts).toEpochMilli
            catch {
              case _: java.time.format.DateTimeParseException =>
                try ts.trim.toLong
                catch {
                  case _: NumberFormatException =>
                    throw new IllegalArgumentException(
                      s"graft-lake-cdf: cannot parse startingTimestamp " +
                        s"'$ts' — pass an ISO-8601 instant " +
                        "(2024-06-01T00:00:00Z) or epoch millis")
                }
            }
          LakeVersions.genAtTimestamp(store, table, millis).getOrElse(
            throw new IllegalArgumentException(
              s"graft-lake-cdf: no commit of '$table' at or before $ts — " +
                "the feed streams CHANGES since a baseline snapshot; " +
                "pass startingVersion naming the earliest retained " +
                "generation instead"))
        case None => headGen()
      }
    }
  }

  // newest window END handed to getOffset — the v1 rate-limit state
  // (rebuilt from the checkpoint via getBatch's start on restart)
  @volatile private var lastPlanned: Long = -1L

  private def headGen(): Long = chain.refresh().headGen

  override val schema: StructType = LakeCdf.feedStruct(root, table)

  // Trigger.AvailableNow pins the drain TARGET at prepare time; the
  // rate limit still applies per batch, so a capped AvailableNow run
  // drains the whole backlog in per-window batches (the FileStreamSource
  // posture — v1 Source + SupportsAdmissionControl + AvailableNow)
  @volatile private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(headGen())

  /** The newest window END to offer from `base`. The engine owns the
    * window START (the checkpointed offset — `startGen` seeds only the
    * very first, checkpoint-less batch): `startGen` must NOT fold into
    * an existing base — in default head-subscribe mode a restart
    * re-resolves it to the CURRENT head, and maxing it in would let
    * one batch swallow the whole checkpoint-to-head backlog, bypassing
    * the admission cap exactly in the catch-up case it exists for. */
  private def nextEnd(base0: Long): Long = {
    val head = availableNowTarget.getOrElse(headGen())
    val base = if (base0 < 0L) startGen else base0
    // saturating: maxGens defaults to Long.MaxValue
    if (base >= head || Long.MaxValue - maxGens < base) head
    else math.min(head, base + maxGens)
  }

  override def getOffset: Option[V1Offset] = {
    val cap = nextEnd(lastPlanned)
    if (cap <= 0L) None else Some(LongOffset(cap))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: V2Offset, limit: ReadLimit): V2Offset = {
    val base = Option(start).map(asGenAny).getOrElse(lastPlanned)
    LongOffset(math.max(0L, nextEnd(base)))
  }

  override def reportLatestOffset(): V2Offset =
    LongOffset(chain.currentOrRefresh().headGen)

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    // baseline FLOOR at generation 1: the chain's first commit has no
    // parent snapshot to diff against (a stream started on a not-yet-
    // committed table has startGen 0 — on a retained table gen 1 is
    // the set_retention baseline, and "nothing changed yet" is exactly
    // right; an unretained gen 1 still fails the first REAL window
    // loudly with the retention remedy)
    val f = math.max(start.map(asGen).getOrElse(startGen), 1L)
    val t = asGen(end)
    lastPlanned = math.max(lastPlanned, t)
    // one row-exact diff PER COMMIT in the window, each stamped with its
    // own generation and commit wall-clock — catch-up batches keep
    // per-commit attribution
    val perGen = (f + 1) to t map { g =>
      val at = LakeVersions.readCommitted(store, table, g).map(_.at)
        .getOrElse(throw new IllegalStateException(
          s"graft-lake-cdf: generation $g of '$table' vanished under " +
            "the stream — expire_versions reclaimed history the " +
            "checkpoint still needs; keep retention above checkpoint lag"))
      LakeChanges.between(spark, root, table, (g - 1).toString, g.toString)
        .withColumn(LakeCdf.CommitGenCol, lit(g))
        .withColumn(LakeCdf.CommitAtCol,
          lit(new java.sql.Timestamp(at)))
    }
    val out = perGen.reduceOption(_ unionByName _).getOrElse {
      // recovery edge: an already-committed empty window re-plans as an
      // empty, correctly-shaped batch
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    // pin the start-time shape: a post-start ALTER's new columns wait
    // for a restart (select drops them); a dropped column fails loudly
    val shaped = out.select(schema.fieldNames.map(col).toSeq: _*)
    // the v1 engine requires a STREAMING leaf: re-root the (arbitrarily
    // shuffled) batch plan as its own RDD lineage — planning is lazy,
    // execution stays with the sink
    org.apache.spark.sql.graft.StreamingDf.asStreaming(spark, shaped)
  }

  private def asGen(o: V1Offset): Long = o match {
    case LongOffset(g) => g
    case other => other.json.trim.toLong
  }

  private def asGenAny(o: V2Offset): Long = o match {
    case LongOffset(g) => g
    case other => other.json.trim.toLong
  }

  override def stop(): Unit = ()
}
