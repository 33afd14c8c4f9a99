package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Typed input for the custom-state operators. */
case class Keyed(key: Long, ts: Timestamp)
/** Internal per-key state for [[StreamOps.inactivitySummaries]]. */
case class ActivityState(n: Long, firstTs: Long, lastTs: Long)
/** One summary per key activity burst, emitted when the key goes quiet. */
case class ActivitySummary(key: Long, n_events: Long, first_ts: Timestamp, last_ts: Timestamp)
/** Typed input for [[StreamOps.funnelResults]]: a keyed event with a type. */
case class TypedEvent(key: Long, ts: Timestamp, tp: String)
/** Buffered per-key events for [[StreamOps.funnelResults]] (millis, type). */
case class FunnelBuffer(events: List[(Long, String)])
/** One stage hit per key funnel: 0-based stage index + its event time. */
case class FunnelHit(key: Long, stage: Int, ts: Timestamp)
/** One per-partition Misra–Gries partial (parallel value/weight arrays +
  * the partition's row count) for [[StreamOps.heavyHitterCandidatesOf]].
  * Generic in the value domain, like the batch operator's typed paths. */
case class HHPartialOf[T](values: Seq[T], weights: Seq[Long], n: Long)
/** Merged-summary keyed state for [[StreamOps.heavyHitterCandidatesOf]]. */
case class HHStateOf[T](values: Seq[T], weights: Seq[Long], n: Long)
/** One heavy-hitter candidate as of a trigger: `weight ≤ true count ≤
  * weight + n/(k+1)` over the `n` rows drained so far. */
case class HHCandidateOf[T](value: T, weight: Long, n: Long)
/** [[HHCandidateOf]] at String — the original emission type, kept so the
  * common string-domain call sites stay source-compatible. */
case class HHCandidate(value: String, weight: Long, n: Long)

/** Streaming query surface (SURVEY.md §2B streaming row): windowed
  * aggregations with watermarks, late-data drop, streaming dedup, and
  * stream-static enrichment — thin declarative combinators over Structured
  * Streaming so semantics live in one place.
  *
  * State-size posture at scale: every operator here requires a watermark,
  * so state stores are bounded by (watermark horizon × key cardinality),
  * never by stream length.
  */
object StreamOps {

  /** Tumbling-window aggregation with late-data drop. */
  def tumbling(events: DataFrame, tsCol: String, watermark: String,
               width: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), width) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding-window aggregation. */
  def sliding(events: DataFrame, tsCol: String, watermark: String,
              width: String, slide: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), width, slide) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows (gap-based), the streaming mirror of q29_sessionize. */
  def sessions(events: DataFrame, tsCol: String, watermark: String,
               gap: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Streaming exact dedup by key within the watermark horizon — the
    * streaming face of [[graft.operators.Dedup.exact]]. State is bounded:
    * ids older than the watermark are evicted. */
  def dedup(events: DataFrame, tsCol: String, watermark: String, idCols: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Stream-stream inner join within a time interval: a left row joins
    * right rows with a matching key whose timestamp lies in
    * `[leftTs - before, leftTs + after]`. Both sides carry watermarks and
    * the join condition carries the time bound — that pair is what lets
    * Spark evict buffered rows once the watermark passes the bound; a
    * stream-stream join without it accumulates state forever. */
  def intervalJoin(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   watermark: String, keyCond: Column,
                   before: String, after: String): DataFrame =
    boundedJoin(left, leftTs, right, rightTs, watermark, keyCond,
      before, after, "inner")

  // one body for inner + outer: the watermark/bound expression is the
  // eviction contract, and a fix to it must not be able to diverge between
  // the two public faces
  private def boundedJoin(left: DataFrame, leftTs: String,
                          right: DataFrame, rightTs: String,
                          watermark: String, keyCond: Column,
                          before: String, after: String,
                          joinType: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        keyCond &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $before") &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $after"),
        joinType)

  /** Stream-stream OUTER interval join — [[intervalJoin]]'s match semantics
    * plus null-padded rows for the outer side's non-matches. A non-match is
    * only provable once no qualifying row can still arrive, so Spark emits
    * the null-padded row when the WATERMARK passes the row's join window —
    * outer results trail the stream by the watermark delay by design (the
    * documented contract; StreamingSpec replays it). State stays bounded
    * exactly as in the inner case: both sides evict at watermark + bound.
    * `joinType`: `leftOuter`, `rightOuter`, or `fullOuter`. */
  def intervalJoinOuter(left: DataFrame, leftTs: String,
                        right: DataFrame, rightTs: String,
                        watermark: String, keyCond: Column,
                        before: String, after: String,
                        joinType: String = "leftOuter"): DataFrame = {
    require(Set("leftOuter", "rightOuter", "fullOuter").contains(joinType),
      s"joinType must be leftOuter/rightOuter/fullOuter, got '$joinType'")
    boundedJoin(left, leftTs, right, rightTs, watermark, keyCond,
      before, after, joinType)
  }

  /** Custom keyed state via `flatMapGroupsWithState` — the escape hatch
    * when the built-in windows can't express the state machine. Counts a
    * key's events and emits ONE summary per activity burst once the key has
    * been quiet for `gapMs` (an inactivity session, like [[sessions]], but
    * with arbitrary user state available for richer machines). A burst
    * closes either by event-time timeout or by a later burst arriving first
    * (timeouts only fire at batch boundaries, so the data path must split
    * on gaps too). State is evicted on timeout, and the timeout is anchored
    * to the watermark — per-key state lives at most (gap + watermark
    * horizon) past the key's last event, never unbounded. */
  def inactivitySummaries(events: Dataset[Keyed], watermark: String,
                          gapMs: Long): Dataset[ActivitySummary] = {
    implicit val stateEnc = Encoders.product[ActivityState]
    implicit val outEnc = Encoders.product[ActivitySummary]
    events.withWatermark("ts", watermark)
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[ActivityState, ActivitySummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[Keyed], state: GroupState[ActivityState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ActivitySummary(key, s.n,
              new Timestamp(s.firstTs), new Timestamp(s.lastTs)))
          } else {
            // Fold events in event-time order and SPLIT on gaps: a second
            // burst can arrive before the first burst's timeout ever fires
            // (timeouts only run at batch boundaries), so gap detection
            // cannot rely on the timeout alone. Bursts closed by a later
            // burst emit here; the final burst stays open in state. Events
            // reordered ACROSS batches (within the watermark) fold into
            // whichever session is open — the timeout floor below keeps
            // every emission at/after the watermark horizon, so late events
            // the watermark still admits find their session un-emitted.
            val times = it.map(_.ts.getTime).toArray.sorted
            var s = state.getOption.getOrElse(
              ActivityState(0L, Long.MaxValue, Long.MinValue))
            val out = scala.collection.mutable.ArrayBuffer.empty[ActivitySummary]
            times.foreach { t =>
              if (s.n > 0 && t > s.lastTs + gapMs) {
                out += ActivitySummary(key, s.n,
                  new Timestamp(s.firstTs), new Timestamp(s.lastTs))
                s = ActivityState(0L, Long.MaxValue, Long.MinValue)
              }
              s = ActivityState(s.n + 1, math.min(s.firstTs, t), math.max(s.lastTs, t))
            }
            state.update(s)
            // must be beyond the current watermark or Spark rejects it —
            // a key already quiet for > gap times out at the next tick
            state.setTimeoutTimestamp(
              math.max(s.lastTs + gapMs, state.getCurrentWatermarkMs + 1))
            out.iterator
          }
      }
  }

  /** Streaming heavy-hitter CANDIDATES — the stream twin of
    * [[graft.operators.Frequency.heavyHitters]]'s nomination pass,
    * continuously maintained: each micro-batch runs per-partition
    * weighted Misra–Gries ([[graft.operators.Frequency.mgPartial]]) and
    * the partials merge PAIRWISE into keyed state under the mergeable-
    * summaries bound ([[graft.operators.Frequency.mergeMG]] — error ≤
    * n/(k+1) under any merge tree), so at every trigger the state's ≤ k
    * counters are a PROVEN superset of all values with frequency ≥ φ
    * over everything drained so far.
    *
    * Emission (Update mode): the current candidates, each with its
    * summary `weight` (`weight ≤ true count ≤ weight + n/(k+1)`) and the
    * total rows `n` — so `weight·phiDen ≥ n·phiNum` is PROVABLY heavy
    * already, and `(weight·(k+1) + n)·phiDen < n·phiNum·(k+1)` provably
    * not; only the band between needs the EXACT decision, which one
    * bounded recount of the candidate list over the retained corpus
    * gives ([[graft.operators.Frequency.recount]] — the lake retains
    * what the stream drained; StreamingSpec replays both paths to
    * equality with the batch operator).
    *
    * Scale shape: NO full-distribution shuffle — each batch ships ≤
    * k·partitions summary entries to ONE merge task whose state is ≤ k
    * counters (model-sized, like the clustering operators), and the
    * raw rows never leave their input partitions. The single-key merge
    * task touches k·P entries per trigger — the same bounded relation
    * the batch operator broadcasts. */
  def heavyHitterCandidates(values: Dataset[String], phiNum: Long, phiDen: Long,
                            maxCounters: Int = 100000): Dataset[HHCandidate] =
    heavyHitterCandidatesOf[String](values, phiNum, phiDen, maxCounters)
      .map(c => HHCandidate(c.value, c.weight, c.n))(
        Encoders.product[HHCandidate])

  /** [[heavyHitterCandidates]] GENERIC in the value domain — the stream
    * twin of the batch operator's typed Long/Int/Double/Float paths
    * ([[graft.operators.Frequency]]): Long IDs are the other common
    * streaming heavy-hitter domain, and boxing every ID into a String
    * just to count it would be the anti-pattern the batch side already
    * removed. Same algorithm, same bound, same replay-≡-batch spec
    * (StreamingSpec), with the summary/state/emission types generic.
    * `Ordering[T]` fixes the canonical emission order (weight desc,
    * value asc — determinism for the memory-sink specs); null elements
    * (possible only for boxed/reference domains) are dropped, matching
    * SQL aggregation semantics. */
  def heavyHitterCandidatesOf[
      T: scala.reflect.runtime.universe.TypeTag: Ordering: scala.reflect.ClassTag](
      values: Dataset[T], phiNum: Long, phiDen: Long,
      maxCounters: Int = 100000): Dataset[HHCandidateOf[T]] = {
    import graft.operators.Frequency
    val k = Frequency.counterBudget(phiNum, phiDen, maxCounters)
    implicit val partialEnc = Encoders.product[HHPartialOf[T]]
    implicit val stateEnc = Encoders.product[HHStateOf[T]]
    implicit val outEnc = Encoders.product[HHCandidateOf[T]]
    val partials = values
      .filter((v: T) => v.asInstanceOf[AnyRef] ne null)
      .mapPartitions { it =>
        var n = 0L
        val counted = it.map { v => n += 1; v }
        val pairs = Frequency.mgPartial(counted, k).toArray // drains `it` first
        Iterator.single(HHPartialOf[T](
          pairs.map(_._1).toSeq, pairs.map(_._2).toSeq, n))
      }
    partials
      .groupByKey(_ => 0)(Encoders.scalaInt)
      .flatMapGroupsWithState[HHStateOf[T], HHCandidateOf[T]](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_, it: Iterator[HHPartialOf[T]], state: GroupState[HHStateOf[T]]) =>
          val s0 = state.getOption.getOrElse(HHStateOf[T](Nil, Nil, 0L))
          var acc = s0.values.zip(s0.weights).toMap
          var n = s0.n
          it.foreach { p =>
            // pairwise merges only — the error-bound induction's shape
            acc = Frequency.mergeMG(acc, p.values.zip(p.weights).toMap, k)
            n += p.n
          }
          val pairs = acc.toSeq.sortBy { case (v, w) => (-w, v) }
          state.update(HHStateOf[T](pairs.map(_._1), pairs.map(_._2), n))
          pairs.iterator.map { case (v, w) => HHCandidateOf[T](v, w, n) }
      }
  }

  /** Stream-static enrichment join: the static side is a dimension table
    * (broadcast per micro-batch — no stream-side shuffle). */
  def enrich(events: DataFrame, dim: DataFrame, cond: Column,
             joinType: String = "left_outer"): DataFrame =
    events.join(broadcast(dim), cond, joinType)

  /** Streaming ordered funnel — the stream twin of
    * [[graft.operators.Funnel.stages]], with IDENTICAL fold semantics (a
    * spec replays the same events through both): per key, stage i+1 counts
    * only strictly after stage i.
    *
    * Emission contract: buffer a key's stage-typed events in state; when
    * the key has been quiet for `quietMs` (event-time timeout, anchored to
    * the watermark like [[inactivitySummaries]]), sort the buffer, run the
    * batch fold, emit one [[FunnelHit]] per reached stage, evict. Buffering
    * until quiescence — rather than folding eagerly per batch — is what
    * buys exact batch equivalence for out-of-order arrivals inside the
    * watermark: an early-stage event arriving late can still lower a stage
    * timestamp (and thereby admit conversions) because nothing has been
    * emitted yet. A key reappearing after emission starts a fresh funnel
    * (documented burst semantics, matching the session operators).
    *
    * State bound: events of the `stages` types only, per key, per burst —
    * the funnel regime (a handful per key); horizon-bounded by the timeout
    * like every operator here. That bound has one hole a timeout cannot
    * close: a BOT key that never goes quiet keeps extending its own
    * timeout while its buffer grows without limit. `maxEventsPerKey > 0`
    * arms the guard (the batch twin's `Funnel.stages(maxEventsPerKey)`
    * mirrored): the query fails loudly naming the key and bound instead
    * of OOMing the state store. Ties on ts fold in (ts, tp) order — a
    * total order per key as long as a key never carries two same-type
    * events on the same millisecond (the batch twin's tie column
    * generalizes this; same-instant DIFFERENT stages never double-count
    * under strict >). */
  def funnelResults(events: Dataset[TypedEvent], watermark: String,
                    stages: Seq[String], quietMs: Long,
                    maxEventsPerKey: Long = 0L): Dataset[FunnelHit] = {
    require(stages.nonEmpty, "at least one stage")
    // same contract as Funnel.stages: the indexOf-based fold below maps a
    // repeated label to its first index, which would silently never arm
    // the later stage — reject it loudly instead
    require(stages.distinct.length == stages.length, s"duplicate stages: $stages")
    implicit val stateEnc = Encoders.product[FunnelBuffer]
    implicit val outEnc = Encoders.product[FunnelHit]
    val stageSet = stages.toSet
    events.filter(e => stageSet.contains(e.tp))
      .withWatermark("ts", watermark)
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelBuffer, FunnelHit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[TypedEvent], state: GroupState[FunnelBuffer]) =>
          if (state.hasTimedOut) {
            val evs = state.get.events.sorted
            state.remove()
            // the batch fold: stage 0 arms on type; stage i on type + prior
            // stage set + strictly later ts (same semantics Funnel.stages
            // compiles to SQL — AnalyticsOpsSpec pins them equal)
            val reached = Array.fill[Option[Long]](stages.length)(None)
            evs.foreach { case (t, tp) =>
              val i = stages.indexOf(tp)
              if (reached(i).isEmpty &&
                  (i == 0 || reached(i - 1).exists(_ < t))) reached(i) = Some(t)
            }
            reached.iterator.zipWithIndex.collect {
              case (Some(t), i) => FunnelHit(key, i, new Timestamp(t))
            }
          } else {
            val buf = state.getOption.getOrElse(FunnelBuffer(Nil))
            val add = it.map(e => (e.ts.getTime, e.tp)).toList
            val s = FunnelBuffer(add ::: buf.events)
            if (maxEventsPerKey > 0 && s.events.lengthCompare(maxEventsPerKey.min(Int.MaxValue).toInt) > 0)
              throw new IllegalStateException(
                s"StreamOps.funnelResults: key $key has buffered more than " +
                  s"maxEventsPerKey=$maxEventsPerKey stage events without going " +
                  "quiet — a bot key would grow state without limit; filter or " +
                  "pre-aggregate the key upstream, or raise the bound deliberately")
            state.update(s)
            state.setTimeoutTimestamp(math.max(
              s.events.iterator.map(_._1).max + quietMs,
              state.getCurrentWatermarkMs + 1))
            Iterator.empty
          }
      }
  }
}
