package graft.lake

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

/** CROSS-TABLE TRANSACTION DECISIONS — the one new primitive that turns
  * the per-table generation chain ([[LakeVersions]]) into multi-table
  * atomic commits (the reference's downstream lake promises a queryable
  * store, `README.md:113-117`; a corpus table and its derived index
  * table that can drift apart are two half-truths, not a store).
  *
  * '''The idea''' (the Percolator/coordinated-2PC shape re-derived on
  * the lake's own CAS primitive): each participating table gets an
  * ordinary generation record CAS-published with one extra `txn <id>`
  * section — a PENDING record, invisible to every reader until the
  * transaction decides. The decision is ONE create-exclusive file:
  *
  * {{{ _txns/txn-<id>   — "graft-txn v1 id=<id> state=committed|aborted" }}}
  *
  * Whoever creates it decides the whole transaction; create-exclusive
  * makes the race between the coordinator's `committed` and a
  * contender's `aborted` (breaking a stalled coordinator) atomic. The
  * flip is global: every table's pending record resolves through the
  * same file, so readers can never observe table A's half without
  * table B's.
  *
  * '''Visibility rule''' ([[LakeVersions.visible]]): a record without
  * `txn` is committed by its own CAS (the single-table fast path pays
  * NOTHING for this feature — no decision file, no extra read); a
  * record with `txn` is visible iff its decision file reads
  * `committed`. Pending and aborted records read as "not yet
  * committed" — head selection falls through to the parent.
  *
  * '''Liveness''': a coordinator that crashes between its first CAS
  * and the decision leaves pending records holding their tables' head
  * slots. Any later writer on such a table waits briefly, then BREAKS
  * the transaction — create-exclusive `aborted` — and reclaims the
  * slot like a torn record ([[LakeVersions.commit]]'s contender loop).
  * The staged batches stay intact (their audit intents keep covering
  * the renamed keys), so a broken transaction is retryable, not lost.
  *
  * '''Decided files are immutable''' — cached process-wide below.
  * Absence is never cached (pending → decided is the one transition).
  * A decision file is one tiny object per cross-table transaction (an
  * explicit, rare operation — never the append hot path) and is kept:
  * a committed decision is chain metadata exactly like the generation
  * records that reference it. */
object LakeTxn {

  val Prefix = "_txns/"

  def decisionKey(id: String): String = s"${Prefix}txn-$id"

  val Committed = "committed"
  val Aborted = "aborted"

  /** How long a contender lets a pending transaction's coordinator work
    * before breaking it (measured against the pending record's commit
    * wall-clock). The coordinator's CAS-to-decision window is
    * milliseconds per table; seconds of silence is a crash. Test seam:
    * specs shrink it to exercise the break path. */
  @volatile private[graft] var breakAfterMs: Long = 5000L

  /** Decided states, process-wide — BOUNDED (round 19): an LRU capped
    * at [[DecidedCacheMax]] entries so a transaction-per-minute pipeline
    * cannot grow driver memory without bound. Eviction only costs a
    * re-read of the (immutable) decision file; correctness never
    * depends on a hit. Synchronized LinkedHashMap in access order —
    * decisions are rare, explicit operations, never the append hot
    * path, so a lock here is noise. */
  private val DecidedCacheMax = 4096
  private val decidedCache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, String](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, String]): Boolean =
          size() > DecidedCacheMax
      })

  private val TxnIdRe = "[A-Za-z0-9._-]{1,64}".r

  private[lake] def requireValidId(id: String): Unit =
    require(TxnIdRe.pattern.matcher(id).matches(),
      s"graft-lake: transaction ids are [A-Za-z0-9._-]{1,64}, got '$id'")

  /** The transaction's decided state, or None while pending (or the
    * file is torn mid-create — indistinguishable from pending, and the
    * break path heals it like a torn record slot). */
  def decision(store: Store, id: String): Option[String] = {
    val cached = decidedCache.get(id)
    if (cached != null) return Some(cached)
    val state = readDecision(store, id)
    state.foreach(decidedCache.put(id, _))
    state
  }

  def committed(store: Store, id: String): Boolean =
    decision(store, id).contains(Committed)

  /** DECIDE transaction `id`: create the decision file exclusively with
    * `state`. Returns the transaction's actual final state — `state` if
    * our create won, the existing occupant's if we lost the race (a
    * coordinator whose `committed` loses to a breaker's `aborted` must
    * roll back; a breaker whose `aborted` loses to the coordinator's
    * `committed` must leave the record alone). A torn occupant (a
    * decider crashed mid-create) is reclaimed after the same
    * stability wait as a torn generation record. */
  def decide(store: Store, id: String, state: String): String =
    decideDetailed(store, id, state)._1

  /** [[decide]] plus whether OUR create won: the winner of an `aborted`
    * decision owns reclaiming the pending records it knows about — a
    * loser must not race the winner's slot deletions (the winner may
    * already have reclaimed a slot and a new record committed there). */
  private[lake] def decideDetailed(store: Store, id: String,
                                   state: String): (String, Boolean) = {
    requireValidId(id)
    require(state == Committed || state == Aborted,
      s"graft-lake: transaction state must be committed|aborted, got '$state'")
    var attempt = 0
    while (attempt < 10) {
      attempt += 1
      val won =
        try {
          val out = store.createExclusive(decisionKey(id))
          try out.write(s"graft-txn v1 id=$id state=$state\n"
            .getBytes(StandardCharsets.UTF_8))
          finally out.close()
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case e: java.io.IOException
            if Option(e.getMessage).exists(_.toLowerCase.contains("exist")) =>
              false
        }
      if (won) { decidedCache.put(id, state); return (state, true) }
      readDecision(store, id) match {
        case Some(s) => decidedCache.put(id, s); return (s, false)
        case None =>
          // occupant exists but is torn: wait for the writer to finish
          // or prove it dead (bytes stable), then reclaim and retry
          val before = sizeOf(store, decisionKey(id))
          Thread.sleep(1000L)
          readDecision(store, id) match {
            case Some(s) => decidedCache.put(id, s); return (s, false)
            case None =>
              if (sizeOf(store, decisionKey(id)) == before)
                store.delete(decisionKey(id))
          }
      }
    }
    throw new IllegalStateException(
      s"graft-lake: could not decide transaction '$id' after 10 attempts " +
        "— a torn decision file is being rewritten continuously")
  }

  private val DecisionRe =
    """^graft-txn v1 id=(\S+) state=(committed|aborted)$""".r

  private def readDecision(store: Store, id: String): Option[String] = {
    val raw = try store.open(decisionKey(id))
              catch { case _: Exception => return None }
    try {
      val line = new BufferedReader(new InputStreamReader(raw,
        StandardCharsets.UTF_8)).readLine()
      DecisionRe.findFirstMatchIn(Option(line).getOrElse(""))
        .filter(_.group(1) == id).map(_.group(2))
    } catch { case _: Exception => None }
    finally { try raw.close() catch { case _: Exception => () } }
  }

  private def sizeOf(store: Store, key: String): Long =
    try {
      val in = store.open(key)
      try {
        var n = 0L
        val buf = new Array[Byte](4096)
        var r = in.read(buf)
        while (r >= 0) { n += r; r = in.read(buf) }
        n
      } finally in.close()
    } catch { case _: Exception => -1L }

  /** Test seam: forget decided-state cache entries (a spec that wipes
    * and recreates a lake root reuses transaction ids). */
  private[graft] def clearCacheForTests(): Unit = decidedCache.clear()

  /** Test seam: runs after every part's record is CAS-published and
    * immediately before the coordinator's `committed` decision — specs
    * interleave a contender or assert cross-table invisibility here.
    * Never set outside tests. */
  @volatile private[graft] var beforeDecideHook: () => Unit = () => ()

  /** One table's half of a cross-table transaction: `inserted` keys are
    * already renamed to their final locations behind the intent
    * `intentId` (the write-audit-publish staging discipline); `removed`
    * is the live scope this part replaces (empty for a pure append
    * part), validated at its CAS like any single-table commit. A part
    * whose audit carries BRANCH state (live-row scrubs under
    * `spark.graft.wap.branch`) additionally names its live rewrites in
    * `added` (CDC-skippable) with the scan-time vector/equality bases
    * the CAS must validate — the transactional scrubbed publish. */
  final case class Part(table: String, inserted: Seq[String],
                        intentId: String, removed: Seq[String] = Nil,
                        dropEqdels: Boolean = false,
                        added: Seq[String] = Nil,
                        dvBasis: Map[String, Option[String]] = Map.empty,
                        eqBasis: Option[Seq[String]] = None)

  /** Publish `parts` as ONE atomic cross-table transaction: CAS each
    * table's PENDING generation record (txn-marked, invisible), then
    * flip the single decision file to `committed`. Readers can never
    * observe a strict subset of the parts.
    *
    * On ANY failure — a part's CAS validation aborts, or a contender
    * breaks the transaction before the decision — every published
    * pending record is reclaimed and the error rethrows; the staged
    * batches and their intents stay INTACT, so the transaction is
    * retryable, not lost.
    *
    * A single part needs no transaction at all: it commits through the
    * ordinary single-table CAS (no decision file, no pending window).
    *
    * Post-decision cleanup (intent deletion) runs here; physical
    * retirement of `removed` scopes and manifest invalidation are the
    * caller's follow-up, exactly as after a single-table commit. */
  def publish(store: Store, parts: Seq[Part],
              op: String = "txn_publish"): Seq[LakeVersions.GenRecord] = {
    require(parts.nonEmpty, "graft-lake: a transaction needs >= 1 part")
    require(parts.map(_.table).distinct.size == parts.size,
      "graft-lake: one part per table — merge a table's batches before " +
        s"publishing (got ${parts.map(_.table).mkString(", ")})")
    if (parts.size == 1) {
      val p = parts.head
      return Seq(LakeVersions.commit(store, p.table, op,
        removed = p.removed, added = p.added, inserted = p.inserted,
        intentId = Some(p.intentId), dropEqdels = p.dropEqdels,
        dvBasis = p.dvBasis, eqBasis = p.eqBasis))
    }
    val id = java.util.UUID.randomUUID().toString
    val done = scala.collection.mutable.ArrayBuffer.empty[LakeVersions.GenRecord]
    // only run when WE won the aborted decision: a breaker that aborted
    // us owns reclaiming the slot it contends on (and may already have
    // committed a new record there — deleting it would lose a commit);
    // the other tables' aborted pending records self-heal on the next
    // write (commit()'s contender loop reclaims aborted slots), and
    // readers never see them meanwhile
    def rollback(): Unit = done.foreach { r =>
      if (LakeVersions.readRecord(store, r.table, r.gen)
            .exists(_.txn.contains(id)))
        store.delete(LakeVersions.genKey(r.table, r.gen))
    }
    try parts.foreach { p =>
      done += LakeVersions.commit(store, p.table, op,
        removed = p.removed, added = p.added, inserted = p.inserted,
        intentId = Some(p.intentId), dropEqdels = p.dropEqdels,
        dvBasis = p.dvBasis, eqBasis = p.eqBasis,
        txn = Some(id))
    } catch { case e: Throwable =>
      // decide FIRST so a contender cannot commit the half-published
      // transaction while its records are being reclaimed
      try {
        if (decideDetailed(store, id, Aborted)._2) rollback()
      } catch { case _: Throwable => () } // breakers/janitor finish the job
      throw e
    }
    beforeDecideHook()
    if (decide(store, id, Committed) != Committed) {
      throw new LakeVersions.LakeConcurrentModificationException(
        s"graft-lake: cross-table transaction '$id' " +
          s"(${parts.map(_.table).mkString(", ")}) was broken by a " +
          "concurrent writer before it could decide. No table saw any " +
          "of it; the staged batches remain — re-run the publish.")
    }
    // the intents have served their purpose: the records are visible
    // through the committed decision, so the keys must stop being
    // excluded (commit() skipped this deletion for txn parts)
    parts.foreach(p =>
      store.delete(LakeVersions.intentKey(p.table, p.intentId)))
    done.toSeq
  }
}
