package graft.lake

import graft.types.{ColType, TableSchema}

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** EQUALITY DELETES — the OTHER merge-on-read shape (Iceberg v2's
  * equality-delete file re-derived on the lake's layout), the O(1)-write
  * GDPR path: `DELETE FROM t WHERE user_id = X` on a merge-on-read
  * table writes ONE small file naming the doomed values and commits one
  * generation — where position vectors cost one vector publish per
  * CONTAINING object (O(matching objects) writes) and copy-on-write
  * rewrites them outright. Readers subtract matching rows at scan time;
  * `compact` folds the filter into clean objects and drops it.
  *
  * '''Scope''' (the sequencing problem Iceberg solves with sequence
  * numbers, solved here on the key layout's time axis): an equality
  * delete kills only rows that were IN the table when it committed —
  * rows inserted later with the same value must survive. Lake object
  * keys carry their flush hour, so the delete records
  *
  *  - `upToHour`: the wall-clock hour of its commit — every object in a
  *    STRICTLY OLDER hour is in scope;
  *  - `boundary`: the exact keys present in `upToHour` itself at commit
  *    time — one listing of one hour directory, so same-hour
  *    pre-existing rows are covered and same-hour LATER appends are
  *    not (a fresh uuid key is never in the frozen list).
  *
  * The one write this cannot scope is an append with an EXPLICIT past
  * flush time (a backfill) landing below `upToHour` — it would be
  * wrongly in scope, so such writes REFUSE while equality deletes are
  * live ([[guardBackfill]]; `compact` folds them away and unblocks).
  *
  * '''Eligibility''': a CONJUNCTION of per-column equality/IN probes
  * (`user_id = X`, or `tenant = T AND user_id = X` — the multi-tenant
  * GDPR shape), every column of a type whose wire form is canonical —
  * INTEGER, STRING, UUID, BOOLEAN. FLOAT/TIME equality deletes fall to
  * the existing probe/vector paths (float equality is a data-modeling
  * bug; TIME has multiple wire spellings). Values are stored in the
  * exact wire form [[TypedCsv]] writes, so the read-side match is a
  * string compare against the raw field — no parsing on the hot path.
  * NULL never matches (SQL `= NULL` semantics), so rows with a
  * missing/absent column always survive — and a conjunction over a
  * column the object's header lacks is unsatisfiable there.
  *
  * '''File format''' (gzip text; load-bearing like a delete vector — a
  * REFERENCED file that is missing or torn fails the read LOUDLY,
  * because ignoring it resurrects deleted rows). Single-column deletes
  * keep the v1 wire byte-identically; multi-column conjunctions write
  * v2 with one `set` section per column:
  * {{{
  * graft-eqdel v1 table=<t> col=<c> values=<n> upTo=YYYY/MM/DD/HH boundary=<m>
  * <value>      — n lines, TypedCsv-quoted wire form
  * <object key> — m lines, the frozen boundary-hour key list
  * end
  *
  * graft-eqdel v2 table=<t> cols=<a,b> upTo=YYYY/MM/DD/HH boundary=<m>
  * set <a> <n1>
  * <value>      — n1 lines
  * set <b> <n2>
  * <value>      — n2 lines
  * <object key> — m lines
  * end
  * }}} */
object LakeEqDeletes {

  val Prefix = "_eqdel/"

  def dir(table: String): String = s"$Prefix$table"

  def freshKey(table: String): String =
    s"${dir(table)}/${java.util.UUID.randomUUID()}.eq.gz"

  /** Column types whose wire form is canonical (one spelling per value)
    * — the eligibility bar for the equality path. */
  def eligible(t: ColType): Boolean = t match {
    case ColType.CInteger | ColType.CString | ColType.CUuid |
         ColType.CBoolean => true
    case _ => false
  }

  /** A typed DELETE literal → its canonical wire string, mirroring
    * [[TypedCsv]]'s serialization exactly (the read-side match is raw
    * string equality). None = not representable (null, wrong runtime
    * type, or a value whose wire form is ambiguous/line-breaking). */
  def wireForm(t: ColType, v: Any): Option[String] = {
    val s = (t, v) match {
      case (_, null) => return None
      case (ColType.CInteger, n: Number) => Some(n.longValue().toString)
      case (ColType.CBoolean, b: java.lang.Boolean) => Some(b.toString)
      case (ColType.CString | ColType.CUuid, s: String) => Some(s)
      case (ColType.CString | ColType.CUuid, u: org.apache.spark.unsafe.types.UTF8String) =>
        Some(u.toString)
      case _ => None
    }
    // the file stores one value per line; the TypedCsv quoting below
    // round-trips commas/quotes but not raw line breaks
    s.filterNot(x => x.contains('\n') || x.contains('\r'))
      .filterNot(_.isEmpty) // "" round-trips as NULL on the wire
  }

  /** The committed reference a generation record carries (the
    * values/boundary live in the FILE; the record stays slim). `col`
    * is comma-joined for a MULTI-COLUMN delete ("a,b" — a conjunction
    * of per-column IN-sets: `a IN (..) AND b IN (..)`, the tuple-exact
    * GDPR shape when each set is one value). */
  final case class EqRef(key: String, col: String, count: Long,
                         upToHour: String) {
    def cols: Seq[String] = col.split(',').toSeq
  }

  /** What an EXECUTOR needs to apply one delete to one in-scope object:
    * a CONJUNCTION of (column name, raw-wire value set) — a row is dead
    * iff EVERY column's value is in its set. Columns resolve against
    * the object's own header (by name — evolved objects work); an
    * object lacking ANY of the columns never matches (SQL `= NULL`
    * semantics make the conjunction unsatisfiable there). */
  final case class Filter(conj: Seq[(String, Set[String])])
      extends Serializable

  /** A loaded, ready-to-apply delete: per-column value sets + scope. */
  final case class Compiled(ref: EqRef, conj: Seq[(String, Set[String])],
                            boundary: Set[String]) extends Serializable {
    /** Whether `objKey` is in this delete's scope (see the scaladoc). */
    def inScope(objKey: String): Boolean = {
      val h = LakeKeys.hourPrefixOf(objKey)
      h < ref.upToHour || (h == ref.upToHour && boundary.contains(objKey))
    }
    def filter: Filter = Filter(conj)
    /** Single-column value set (the common shape) — the v1 accessor. */
    def values: Set[String] = conj.head._2
  }

  /** Write one equality delete: `probes` is the conjunction, one
    * (column, values) per column. Single-column files keep the v1 wire
    * (byte-identical to every earlier round); multi-column files write
    * v2 with one `set` section per column. */
  def write(store: Store, key: String, table: String,
            probes: Seq[(String, Seq[String])], upToHour: String,
            boundary: Seq[String]): Unit = {
    require(probes.nonEmpty, "graft-eqdel: empty conjunction")
    val out = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(store.create(key)), StandardCharsets.UTF_8))
    try {
      if (probes.size == 1) {
        val (colName, values) = probes.head
        out.write(s"graft-eqdel v1 table=$table col=$colName " +
          s"values=${values.size} upTo=$upToHour boundary=${boundary.size}\n")
        values.foreach { v => out.write(TypedCsv.quoteField(v)); out.write("\n") }
      } else {
        out.write(s"graft-eqdel v2 table=$table " +
          s"cols=${probes.map(_._1).mkString(",")} " +
          s"upTo=$upToHour boundary=${boundary.size}\n")
        probes.foreach { case (colName, values) =>
          out.write(s"set $colName ${values.size}\n")
          values.foreach { v =>
            out.write(TypedCsv.quoteField(v)); out.write("\n") }
        }
      }
      boundary.foreach { k => out.write(k); out.write("\n") }
      out.write("end\n")
    } finally out.close()
  }

  private val HeaderRe =
    ("""^graft-eqdel v1 table=(\S+) col=(\S+) values=(\d+) """ +
      """upTo=(\d{4}/\d{2}/\d{2}/\d{2}) boundary=(\d+)$""").r
  private val HeaderV2Re =
    ("""^graft-eqdel v2 table=(\S+) cols=(\S+) """ +
      """upTo=(\d{4}/\d{2}/\d{2}/\d{2}) boundary=(\d+)$""").r
  private val SetRe = """^set (\S+) (\d+)$""".r

  /** Load a referenced equality-delete file — LOUD on missing/torn
    * (load-bearing: silence resurrects deleted rows). */
  def read(store: Store, ref: EqRef, table: String): Compiled = {
    val raw = try store.open(ref.key) catch { case e: Exception =>
      throw new IllegalStateException(
        s"graft-eqdel: committed equality-delete file ${ref.key} of " +
          s"table '$table' cannot be opened — the table is corrupt " +
          "(an external delete raced the protocol?)", e)
    }
    try {
      val rd = new BufferedReader(new InputStreamReader(
        new GZIPInputStream(raw), StandardCharsets.UTF_8))
      val header = Option(rd.readLine()).getOrElse("")
      def lines(k: Int): Seq[String] = (0 until k).map { _ =>
        Option(rd.readLine()).getOrElse(throw new IllegalStateException(
          s"graft-eqdel: truncated file ${ref.key}"))
      }
      def parseValues(k: Int): Seq[String] =
        lines(k).map(l => TypedCsv.splitLine(l).headOption.getOrElse(""))
      val (conj, b) = HeaderRe.findFirstMatchIn(header) match {
        case Some(m) =>
          require(m.group(1) == table && m.group(2) == ref.col,
            s"graft-eqdel: ${ref.key} is for table=${m.group(1)} " +
              s"col=${m.group(2)}, expected $table.${ref.col}")
          (Seq(m.group(2) -> parseValues(m.group(3).toInt).toSet),
            m.group(5).toInt)
        case None =>
          val m = HeaderV2Re.findFirstMatchIn(header)
            .getOrElse(throw new IllegalStateException(
              s"graft-eqdel: torn/foreign header in ${ref.key}"))
          require(m.group(1) == table && m.group(2) == ref.col,
            s"graft-eqdel: ${ref.key} is for table=${m.group(1)} " +
              s"cols=${m.group(2)}, expected $table.${ref.col}")
          val conj = m.group(2).split(',').toSeq.map { expect =>
            val s = SetRe.findFirstMatchIn(Option(rd.readLine()).getOrElse(""))
              .getOrElse(throw new IllegalStateException(
                s"graft-eqdel: torn set section in ${ref.key}"))
            require(s.group(1) == expect,
              s"graft-eqdel: ${ref.key} set order drifted " +
                s"(${s.group(1)} vs $expect)")
            expect -> parseValues(s.group(2).toInt).toSet
          }
          (conj, m.group(4).toInt)
      }
      val boundary = lines(b)
      require(rd.readLine() == "end",
        s"graft-eqdel: missing end marker in ${ref.key}")
      Compiled(ref, conj, boundary.toSet)
    } finally { try raw.close() catch { case _: Exception => () } }
  }

  /** Load every referenced delete once (driver-side, per scan plan). */
  def compile(store: Store, table: String,
              refs: Seq[EqRef]): Seq[Compiled] =
    refs.map(r => read(store, r, table))

  /** Refuse an append that would land data objects BELOW a live
    * equality delete's scope hour — such rows would be wrongly matched
    * (they post-date the delete but their keys pre-date its watermark).
    * Called only on the explicit-past-flush paths; the common
    * now-hour append never consults the chain. */
  def guardBackfill(store: Store, table: String, flushHour: String): Unit = {
    val eqdels = LakeVersions.listDir(store, table) match {
      case st if st.gens.isEmpty => Nil
      case st => LakeVersions.head(store, table, st)
        .map(_.eqdels).getOrElse(Nil)
    }
    val covering = eqdels.filter(e => flushHour < e.upToHour)
    require(covering.isEmpty,
      s"graft-eqdel: table '$table' carries ${covering.size} live " +
        s"equality delete(s) scoped above hour $flushHour (e.g. " +
        s"${covering.take(2).map(e => s"${e.col} upTo=${e.upToHour}")
          .mkString(", ")}) — a backfill into their scope would be " +
        "wrongly deleted. CALL lake.system.compact to fold the deletes, " +
        "then retry the backfill.")
  }
}
