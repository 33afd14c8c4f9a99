package graft.lake

import java.io.{InputStream, OutputStream}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Abstract key→byte-stream sink, the analogue of the reference's `Store`
  * interface (`/root/reference/lib/store/Store.ts:4-9`: `put(key, stream)`).
  *
  * One implementation serves every Hadoop-supported scheme (`file://`,
  * `s3a://`, `hdfs://`), which subsumes the reference's `StoreFS`
  * (`StoreFS.ts`) and `StoreS3` (`StoreS3.ts`): on a real cluster the same
  * code path lands objects in S3 via the S3A committer.
  */
/** Deflate tuning for the DATA-volume gzip writers ([[LakeWriter]] and
  * the Collector spool). Default BEST_SPEED (level 1), overridable with
  * `-Dgraft.gzip.level=N`: measured on this wire format (typed-CSV rows —
  * short, low-redundancy fields) level 1 compresses ~6× faster than the
  * JDK default level 6 for ~0.6 pp worse ratio, so the default level
  * spends the ingest path's CPU on compression that buys almost no
  * bytes (guide §2.3: "there is no universal answer — measure ... with
  * each"; measured r16). Metadata writers (generation records, sidecars,
  * manifests — tiny, write-once) keep the JDK default: their cost is the
  * RPC, not the deflate. */
object GzipOut {
  val level: Int = sys.props.get("graft.gzip.level") match {
    case None => java.util.zip.Deflater.BEST_SPEED
    case Some(v) =>
      // validate HERE with the property named (r16 ADVICE): an unchecked
      // toInt surfaced as ExceptionInInitializerError, and an out-of-range
      // value as an anonymous IllegalArgumentException from
      // Deflater.setLevel deep inside the first batch flush
      val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"-Dgraft.gzip.level must be an integer in -1..9, got '$v'"))
      require(n >= -1 && n <= 9,
        s"-Dgraft.gzip.level must be in -1..9 (java.util.zip.Deflater levels), got $n")
      n
  }
  def apply(raw: OutputStream): java.util.zip.GZIPOutputStream =
    new java.util.zip.GZIPOutputStream(raw) { `def`.setLevel(level) }
}

trait Store extends Serializable {
  /** Stream `data` to `key`, creating parent dirs as needed. */
  def put(key: String, data: InputStream): Unit
  /** Open an output stream at `key` (preferred: avoids buffering). */
  def create(key: String): OutputStream
  /** Open an output stream at `key` FAILING if the key already exists —
    * the compare-and-swap primitive [[LakeVersions]] serializes
    * multi-object commits on. Contract: of N concurrent creators of one
    * key, at most one wins; losers see
    * `java.nio.file.FileAlreadyExistsException` (or an IOException
    * naming the existing key). The default is the check-then-create
    * HDFS shape (`FileSystem.create(overwrite = false)` — atomic where
    * the namenode arbitrates); [[HadoopStore]] upgrades `file://` to a
    * true O_EXCL create. S3-style backends should override with a
    * conditional PUT (`If-None-Match: *`). */
  def createExclusive(key: String): OutputStream = {
    if (exists(key))
      throw new java.nio.file.FileAlreadyExistsException(key)
    create(key)
  }
  def open(key: String): InputStream
  def list(prefix: String): Seq[String]
  def exists(key: String): Boolean
  /** Byte size of `key` (one stat RPC), None where the backend cannot
    * answer without a download — the objects metadata read degrades its
    * `bytes` column to null there rather than reading data. */
  def size(key: String): Option[Long] = None
  /** Remove `key` (idempotent: missing keys are a no-op). */
  def delete(key: String): Unit
  /** Move `src` to `dst` (copy+delete where the backend has no rename —
    * S3-style stores). Used by compaction's publish step. */
  def rename(src: String, dst: String): Unit = {
    put(dst, open(src)); delete(src)
  }
  /** Remove every key under `prefix` (idempotent). */
  def deletePrefix(prefix: String): Unit = list(prefix).foreach(delete)
  /** Immediate child DIRECTORY names under `prefix` (non-recursive) — one
    * listing RPC per level, the delimiter-style listing object stores
    * offer. Lets readers walk `YYYY/MM/DD/HH` levels without enumerating
    * every object in the lake. */
  def listDirs(prefix: String): Seq[String]
  /** Root URI as a string, for Spark datasource paths. */
  def rootUri: String
}

/** Process-wide store-operation counters — the METADATA meter. Wall
  * seconds and even task_ms are hostage to GC and host contention, but
  * the NUMBER of store round-trips a query issues is a property of the
  * plan: on a real object store every one is a billed LIST/GET/PUT RPC,
  * so metadata amplification (a listing per trigger that should be a
  * cached read, a record re-read per scan) shows here deterministically
  * even when local wall time cannot see it. [[graft.Meter]] snapshots
  * the counters around the scale-claim bench queries and
  * [[graft.BenchGates]] asserts ceilings — a protocol change that
  * multiplies per-trigger metadata reads now fails the bench like a
  * byte blow-up does. Counting is a few atomic increments per REAL
  * store RPC — noise next to the RPC itself. */
object StoreOps {
  val lists = new java.util.concurrent.atomic.AtomicLong(0L)
  val reads = new java.util.concurrent.atomic.AtomicLong(0L)   // open/exists
  val writes = new java.util.concurrent.atomic.AtomicLong(0L)  // create/put/rename
  val deletes = new java.util.concurrent.atomic.AtomicLong(0L)
  def total: Long = lists.get + reads.get + writes.get + deletes.get
}

/** Hadoop-FileSystem-backed store rooted at `root` (e.g. `file:///tmp/lake`
  * or `s3a://bucket/prefix`). */
final class HadoopStore(val rootUri: String) extends Store {
  @transient private lazy val conf = new Configuration()
  @transient private lazy val fs = {
    val f = FileSystem.get(new URI(rootUri), conf)
    f match {
      // the RAW local fs, not the checksummed wrapper: `.crc` sidecars
      // break the atomic rename-OVER swap (moving the data file leaves
      // a stale checksum that poisons the next read), and a lake object
      // store carries its own integrity story — the checksum wrapper
      // buys nothing here. Raw rename onto an existing destination is
      // POSIX rename(2): an atomic replace, old or new, never torn.
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
  }
  private def p(key: String) =
    if (key.isEmpty) new Path(new URI(rootUri)) else new Path(new Path(new URI(rootUri)), key)

  override def create(key: String): OutputStream = {
    StoreOps.writes.incrementAndGet()
    fs.create(p(key), true)
  }

  override def createExclusive(key: String): OutputStream = {
    StoreOps.writes.incrementAndGet()
    val path = p(key)
    if ("file" == path.toUri.getScheme || rootUri.startsWith("file:")) {
      // a REAL O_EXCL create (atomic under concurrent creators), which
      // RawLocalFileSystem's check-then-create is not
      val f = java.nio.file.Paths.get(path.toUri.getPath)
      java.nio.file.Files.createDirectories(f.getParent)
      java.nio.file.Files.newOutputStream(f,
        java.nio.file.StandardOpenOption.CREATE_NEW,
        java.nio.file.StandardOpenOption.WRITE)
    } else fs.create(path, false) // namenode-atomic on HDFS-like stores
  }

  override def put(key: String, data: InputStream): Unit = {
    val out = create(key)
    try {
      val buf = new Array[Byte](64 * 1024)
      var n = data.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = data.read(buf) }
    } finally { out.close(); data.close() }
  }

  override def open(key: String): InputStream = {
    StoreOps.reads.incrementAndGet()
    fs.open(p(key))
  }

  override def list(prefix: String): Seq[String] = {
    // bounded retry: a concurrent delete (a committer retiring objects,
    // a janitor sweeping) can vanish an entry between the recursive
    // walk's enumeration and its stat — the local RawLocalFileSystem
    // shells out for permissions and throws where a real object store's
    // LIST would simply not return the key. A retried listing is just a
    // newer snapshot, which every caller already tolerates.
    var attempt = 0
    while (true) {
      try return listOnce(prefix)
      catch {
        case _: Exception if attempt < 5 =>
          attempt += 1
          Thread.sleep(20L * attempt)
      }
    }
    sys.error("unreachable")
  }

  private def listOnce(prefix: String): Seq[String] = {
    StoreOps.lists.incrementAndGet()
    val base = p(prefix)
    if (!fs.exists(base)) Seq.empty
    else {
      val it = fs.listFiles(base, true)
      val out = Seq.newBuilder[String]
      val rootPath = new Path(new URI(rootUri)).toUri.getPath.stripSuffix("/")
      while (it.hasNext) {
        val f = it.next().getPath.toUri.getPath
        out += f.stripPrefix(rootPath).stripPrefix("/")
      }
      out.result()
    }
  }

  override def exists(key: String): Boolean = {
    StoreOps.reads.incrementAndGet()
    fs.exists(p(key))
  }

  override def size(key: String): Option[Long] = {
    StoreOps.reads.incrementAndGet()
    try Some(fs.getFileStatus(p(key)).getLen)
    catch { case _: java.io.FileNotFoundException => None }
  }

  override def delete(key: String): Unit = {
    StoreOps.deletes.incrementAndGet()
    fs.delete(p(key), false); ()
  }

  override def rename(src: String, dst: String): Unit = {
    StoreOps.writes.incrementAndGet()
    val d = p(dst)
    fs.mkdirs(d.getParent) // HDFS/local rename requires an existing parent
    if (!fs.rename(p(src), d)) {
      // Hadoop's local rename REFUSES an existing destination — but the
      // rename-OVER swap (a WAP audit intent replaced mid-branch-DML)
      // must be atomic for readers: the put-fallback's in-place
      // truncate+write opens a TORN window in which a racing intent
      // read sees "no hidden keys" and a stream delivers the branch's
      // hidden objects. Local fs gets the POSIX atomic move (old or new
      // content, never torn); a real object store replaces atomically
      // at PUT, so the streaming fallback is safe there.
      if ("file" == d.toUri.getScheme || rootUri.startsWith("file:")) {
        val sp = java.nio.file.Paths.get(p(src).toUri.getPath)
        try java.nio.file.Files.move(sp,
          java.nio.file.Paths.get(d.toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
          super.rename(src, dst) // genuine cross-volume: no atomic path
        }
      } else super.rename(src, dst) // e.g. cross-volume
    }
  }

  override def deletePrefix(prefix: String): Unit = {
    StoreOps.deletes.incrementAndGet()
    val base = p(prefix)
    if (fs.exists(base)) { fs.delete(base, true); () }
  }

  override def listDirs(prefix: String): Seq[String] = {
    StoreOps.lists.incrementAndGet()
    val base = p(prefix)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  /** NEWEST modification instant under `prefix` (the prefix's own stamp
    * when it holds no files — a crashed job can leave an empty dir).
    * The staging janitor's liveness signal: an uuid-named staging
    * prefix carries no timestamp of its own, but any in-flight write
    * refreshes a file's mtime, so "newest entry older than the cutoff"
    * can never sweep a prefix an alive job is still writing into.
    * HadoopStore-only (FileStatus mtimes are a filesystem notion, not
    * part of the minimal [[Store]] contract fault doubles implement). */
  private[lake] def newestModification(prefix: String): Option[java.time.Instant] = {
    val base = p(prefix)
    if (!fs.exists(base)) return None
    // FILES only: directory mtimes refresh on child creation (mkdirs of
    // a nested hour path stamps every ancestor "now"), which would make
    // a crashed job's old content look alive forever. The prefix's own
    // stamp serves only the no-files case (an empty dir left behind).
    var newest = -1L
    val it = fs.listFiles(base, true)
    while (it.hasNext) newest = math.max(newest, it.next().getModificationTime)
    if (newest < 0) newest = fs.getFileStatus(base).getModificationTime
    Some(java.time.Instant.ofEpochMilli(newest))
  }
}
