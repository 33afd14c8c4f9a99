package graft.lake

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** The PER-TRIGGER merge-on-read tripwire for the glob stream
  * ([[LakeReader.readStreamOf]]) — closing the one read path whose
  * safety previously rested on an operational contract instead of a
  * mechanism.
  *
  * Spark's file streaming source exposes no per-trigger hook, but it
  * LISTS its glob on the DRIVER every trigger. This delegating
  * `graftlake://<token>/...` FileSystem makes that listing the hook: a
  * memoized chain probe (one `_versions` listing + head-record read,
  * at most once per [[GuardedLakeFs.probeMemoMs]]) runs inside
  * `listStatus`, and FAILS the query loudly — the next trigger's
  * discovery throws, surfacing in `StreamingQueryException` with the
  * connector-source remedy — the moment a delete vector or equality
  * delete lands on the streamed table. Costs ZERO per-task RPCs:
  * executors only `open()` files, which delegates straight through.
  *
  * The token authority resolves through the Hadoop conf
  * (`graft.lake.guard.<token>.root` / `.table`, set by
  * [[LakeReader.readStreamOf]]), so checkpointed offsets hold stable
  * `graftlake://` paths that re-resolve on restart as long as the
  * stream is rebuilt through `readStreamOf` (which re-sets the conf
  * keys — they are a pure function of root and table). */
final class GuardedLakeFs extends FileSystem {

  private var myUri: URI = _
  private var realRoot: String = _
  private var table: String = _
  private var inner: FileSystem = _
  private var rootPath: Path = _
  private var workDir: Path = _

  override def getScheme: String = "graftlake"

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    val token = uri.getAuthority
    myUri = URI.create(s"graftlake://$token")
    realRoot = conf.get(s"graft.lake.guard.$token.root")
    table = conf.get(s"graft.lake.guard.$token.table")
    require(realRoot != null && table != null,
      s"graftlake://$token is not configured — build the stream through " +
        "LakeReader.readStreamOf, which registers the guard token")
    inner = FileSystem.get(new URI(realRoot), conf) match {
      // match HadoopStore: raw local fs, no `.crc` sidecars in listings
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    rootPath = inner.makeQualified(new Path(new URI(realRoot)))
    workDir = new Path(myUri.toString + "/")
  }

  override def getUri: URI = myUri

  private def toInner(f: Path): Path = {
    val rel = f.toUri.getPath.stripPrefix("/")
    if (rel.isEmpty) rootPath else new Path(rootPath, rel)
  }

  private def fromInner(p: Path): Path = {
    val rootp = rootPath.toUri.getPath.stripSuffix("/")
    val rel = p.toUri.getPath.stripPrefix(rootp)
    new Path(myUri.toString + (if (rel.startsWith("/")) rel else s"/$rel"))
  }

  // DELIBERATELY without permission/owner/group: the raw local fs
  // loads those LAZILY by shelling `ls` per file, which both costs a
  // process per listed entry and THROWS if the entry vanished between
  // enumeration and the stat (a commit deleting its healed intent
  // under a racing glob expansion — observed in the wild). The
  // streaming source reads only length/mtime/path; len and mtime are
  // materialized eagerly at enumeration, so this translate touches
  // nothing that can race.
  private def translate(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, fromInner(st.getPath))

  override def listStatus(f: Path): Array[FileStatus] = {
    GuardedLakeFs.probe(realRoot, table)
    inner.listStatus(toInner(f)).map(translate)
  }

  override def getFileStatus(f: Path): FileStatus =
    translate(inner.getFileStatus(toInner(f)))

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    inner.open(toInner(f), bufferSize)

  override def exists(f: Path): Boolean = inner.exists(toInner(f))

  override def setWorkingDirectory(d: Path): Unit = workDir = d
  override def getWorkingDirectory: Path = workDir

  // the guard wraps a READ path (the streaming source's listing and
  // its tasks' opens) — nothing may write through it
  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graftlake:// is the glob stream's guarded READ view — $op is " +
        "not supported; write through the lake writer/connector")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    readOnly("create")
  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    readOnly("append")
  override def rename(src: Path, dst: Path): Boolean = readOnly("rename")
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly("delete")
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    readOnly("mkdirs")
}

object GuardedLakeFs {

  /** Probe memo window: the glob expansion of one trigger issues many
    * `listStatus` calls; one chain probe per window covers them all.
    * Test seam — specs shrink it to make every trigger probe. */
  @volatile private[graft] var probeMemoMs: Long = 1000L

  private val lastProbe =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private[lake] def probe(root: String, table: String): Unit = {
    val k = s"$root|$table"
    val now = System.currentTimeMillis()
    val last = lastProbe.get(k)
    if (last != null && now - last < probeMemoMs) return
    val store = new HadoopStore(root)
    if (LakeVersions.currentDvs(store, table).nonEmpty)
      throw new IllegalStateException(
        s"graft-lake: a merge-on-read DELETE VECTOR landed on table " +
          s"'$table' while a glob stream (readStreamOf) was consuming " +
          "it — raw file delivery would resurrect the deleted rows. " +
          "Stream this table through the connector source " +
          "(spark.readStream.format(\"graft-lake\"), vector-aware at " +
          "every trigger), or CALL lake.system.compact to fold the " +
          "vectors and restart the stream")
    if (LakeVersions.currentEqdels(store, table).nonEmpty)
      throw new IllegalStateException(
        s"graft-lake: an EQUALITY DELETE landed on table '$table' " +
          "while a glob stream (readStreamOf) was consuming it — raw " +
          "file delivery would resurrect the deleted rows. Stream " +
          "this table through the connector source " +
          "(spark.readStream.format(\"graft-lake\")), or CALL " +
          "lake.system.compact to fold the deletes and restart")
    lastProbe.put(k, now)
  }

  /** Deterministic guard token for (root, table) — hex, safe as a URI
    * authority, stable across restarts. */
  private[lake] def token(rootUri: String, table: String): String =
    java.lang.Long.toHexString(
      (rootUri.hashCode.toLong << 32) ^ (table.hashCode.toLong & 0xffffffffL))
}
