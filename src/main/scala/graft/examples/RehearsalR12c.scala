package graft.examples

import graft.lake.{HadoopStore, LakeReader, Manifests, Store}

import java.io.{InputStream, OutputStream}
import java.time.Instant
import java.time.temporal.ChronoUnit

/** Round-12 measured evidence, part c: the sealed-hours MANIFEST at
  * listing scale. The quantity that matters is METADATA CALLS — at
  * warehouse scale the driver pays one LIST per lifetime hour directory
  * on every read, and the manifest replaces all sealed hours' LISTs
  * with one GET. 240 hours (10 days of hourly flushes) is enough to
  * show the shape; the ratio only improves with age (a 3-year table is
  * ~26k hours). */
object RehearsalR12c {

  private final class Metered(inner: Store) extends Store {
    var lists = 0; var listDirs = 0; var opens = 0; var heads = 0
    def put(k: String, d: InputStream): Unit = inner.put(k, d)
    def create(k: String): OutputStream = inner.create(k)
    def open(k: String): InputStream = { opens += 1; inner.open(k) }
    def list(p: String): Seq[String] = { lists += 1; inner.list(p) }
    // exists() is a HEAD on an object store — a metadata call by this
    // rehearsal's own definition; metered so the read path gaining one
    // someday cannot silently skew the published ratio
    def exists(k: String): Boolean = { heads += 1; inner.exists(k) }
    def delete(k: String): Unit = inner.delete(k)
    override def listDirs(p: String): Seq[String] = { listDirs += 1; inner.listDirs(p) }
    def rootUri: String = inner.rootUri
    def calls: Int = lists + listDirs + opens + heads
    def reset(): Unit = { lists = 0; listDirs = 0; opens = 0; heads = 0 }
  }

  def main(args: Array[String]): Unit = {
    // no SparkSession: the listing walk under test is driver-only Store code
    val root = "file:///tmp/graft-rehearse-r12c-lake"
    val store = new HadoopStore(root)
    store.deletePrefix("")
    val Hours = 240
    val base = Instant.parse("2024-01-01T00:00:00Z")
    // listing cost is about KEYS, not bytes: land one tiny valid object
    // per hour directly (the write path is not under test here)
    for (h <- 0 until Hours) {
      val key = graft.lake.LakeKeys.objectKey("evm",
        base.plus(h.toLong, ChronoUnit.HOURS), java.util.UUID.randomUUID(),
        gzip = false)
      val out = store.create(key)
      out.write(s"#INTEGER\nid\n$h\n".getBytes("UTF-8")); out.close()
    }
    val m = new Metered(store)
    val raw = LakeReader.listTableKeys(m, "evm", None)
    val rawTotal = m.calls // ALL metadata kinds, HEADs included
    println(f"REHEARSE raw listing: ${raw.size} keys, " +
      f"${m.lists} LIST + ${m.listDirs} LISTDIR + ${m.opens} GET + ${m.heads} HEAD = ${m.calls} calls")
    val sealedKeys = Manifests.seal(store, "evm",
      base.plus((Hours - 2).toLong, ChronoUnit.HOURS))
    m.reset()
    val viaManifest = LakeReader.listTableKeys(m, "evm", None)
    require(viaManifest.sorted == raw.sorted, "manifest read must equal raw")
    println(f"REHEARSE manifest ($sealedKeys sealed): ${viaManifest.size} keys, " +
      f"${m.lists} LIST + ${m.listDirs} LISTDIR + ${m.opens} GET + ${m.heads} HEAD = ${m.calls} calls")
    println(f"REHEARSE metadata-call ratio: $rawTotal%d -> ${m.calls}%d " +
      f"(${rawTotal.toDouble / m.calls}%.0fx fewer; " +
      "grows linearly with table age)")
  }
}
