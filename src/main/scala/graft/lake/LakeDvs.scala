package graft.lake

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** POSITION DELETE VECTORS — the merge-on-read half of the lake's DML
  * surface (the Iceberg v2 position-delete / Delta deletion-vector idea
  * re-derived on the lake's immutable rolled objects, whose stable
  * `(_object_key, _row_pos)` row identity [[LakeDelta]] already keys
  * on). A sparse DELETE/UPDATE no longer rewrites every touched object
  * (copy-on-write, O(touched-object rows)); it publishes one small
  * delete-vector file per touched object naming the DEAD row positions
  * (O(deleted rows)) and commits the mapping `object → dv` on the
  * version chain ([[LakeVersions.GenRecord.dvs]]). Readers subtract at
  * scan time; `CALL lake.system.compact` folds vectors back into clean
  * objects.
  *
  * '''Files are immutable''': merging new positions writes a NEW file
  * (union of the superseded vector and the new dead set) under a fresh
  * uuid key; the generation CAS is what swaps the mapping, so two racing
  * MOR statements on one object serialize exactly like every other
  * mutation (the loser's basis check fails — [[LakeVersions.commit]]).
  * An UNREFERENCED dv file (a crashed publish, a superseded vector) is
  * inert garbage — readers resolve vectors only THROUGH the committed
  * mapping — reclaimed by `expire_versions`' sweep.
  *
  * '''Strictness''': a REFERENCED vector that is missing or torn fails
  * the read LOUDLY. A delete vector is load-bearing the opposite way
  * from every other sidecar: ignoring a zone map keeps extra objects
  * (conservative), ignoring a delete vector RESURRECTS deleted rows
  * (corruption). Format (gzip text):
  * {{{
  * graft-dv v1 table=<t> object=<objectKey> count=N
  * <position>                                — N lines, ascending
  * end
  * }}} */
object LakeDvs {

  val Prefix = "_dv/"

  def dir(table: String): String = s"$Prefix$table"

  /** Fresh vector key — uuid-random like data objects: never renamed
    * over, so every publish is a fresh-key create. */
  def freshKey(table: String): String =
    s"${dir(table)}/${java.util.UUID.randomUUID()}.dv.gz"

  /** Write a vector for `objectKey`: positions must be ascending and
    * distinct (the union-merge produces exactly that; a malformed set
    * here would corrupt the read-side skip walk). */
  def write(store: Store, key: String, table: String, objectKey: String,
            positions: Array[Long]): Unit = {
    var i = 1
    while (i < positions.length) {
      require(positions(i) > positions(i - 1),
        s"graft-dv: positions must be ascending+distinct, got " +
          s"${positions(i - 1)} then ${positions(i)} for $objectKey")
      i += 1
    }
    require(positions.isEmpty || positions(0) >= 0L,
      s"graft-dv: negative row position for $objectKey")
    val out = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(store.create(key)), StandardCharsets.UTF_8))
    try {
      out.write(s"graft-dv v1 table=$table object=$objectKey " +
        s"count=${positions.length}\n")
      positions.foreach { p => out.write(java.lang.Long.toString(p)); out.write("\n") }
      out.write("end\n")
    } finally out.close()
  }

  private val HeaderRe =
    """^graft-dv v1 table=(\S+) object=(\S+) count=(\d+)$""".r

  /** Read a REFERENCED vector: ascending positions. Loud on anything off
    * — absent, torn, wrong object — never a silent empty set (see the
    * scaladoc's strictness note). `table`/`objectKey` cross-check that
    * the committed mapping and the file agree. */
  def read(store: Store, key: String, table: String,
           objectKey: String): Array[Long] = {
    val raw = try store.open(key) catch { case e: Exception =>
      throw new IllegalStateException(
        s"graft-dv: committed delete vector $key for $objectKey is " +
          s"unreadable — refusing to scan (deleted rows would resurrect): $e")
    }
    try {
      val rd = new BufferedReader(new InputStreamReader(
        new GZIPInputStream(raw), StandardCharsets.UTF_8))
      val m = HeaderRe.findFirstMatchIn(Option(rd.readLine()).getOrElse(""))
        .getOrElse(throw new IllegalStateException(
          s"graft-dv: $key is not a graft delete vector"))
      require(m.group(1) == table && m.group(2) == objectKey,
        s"graft-dv: $key names table=${m.group(1)} object=${m.group(2)}, " +
          s"expected table=$table object=$objectKey")
      val n = m.group(3).toInt
      val out = new Array[Long](n)
      var i = 0
      var prev = -1L
      while (i < n) {
        val line = rd.readLine()
        require(line != null, s"graft-dv: $key torn at position line $i of $n")
        val p = java.lang.Long.parseLong(line)
        require(p > prev, s"graft-dv: $key positions not ascending at line $i")
        out(i) = p
        prev = p
        i += 1
      }
      require(rd.readLine() == "end", s"graft-dv: $key missing end marker")
      out
    } finally { try raw.close() catch { case _: Exception => () } }
  }

  /** Union-merge two ascending position sets (the supersede rule). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val c = java.lang.Long.compare(a(i), b(j))
      if (c < 0) { out(k) = a(i); i += 1 }
      else if (c > 0) { out(k) = b(j); j += 1 }
      else { out(k) = a(i); i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }

  // ------------------------------------------------------ table DML mode

  private def morKey(table: String): String =
    s"${LakeVersions.dir(table)}/dml-mor"

  /** Per-table DML mode marker: with it set, row-level SQL
    * (DELETE/UPDATE/MERGE) takes the MERGE-ON-READ path — position
    * deltas land as delete vectors + new-row objects instead of
    * copy-on-write object rewrites. `CALL lake.system.set_dml_mode`
    * flips it; the exactly-translatable metadata DELETE path is
    * unaffected (whole-object retirement needs no vector and is
    * strictly better in either mode). */
  def setMor(store: Store, table: String, on: Boolean): Unit =
    if (on) {
      val out = store.create(morKey(table))
      try out.write("graft-dml-mor v1\n".getBytes(StandardCharsets.UTF_8))
      finally out.close()
    } else store.delete(morKey(table))

  def isMor(store: Store, table: String): Boolean = store.exists(morKey(table))
}
