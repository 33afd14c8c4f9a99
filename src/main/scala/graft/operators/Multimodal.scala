package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * Decoders are pluggable behind [[MediaDecoder]]. Two REAL pure-JVM codec
  * paths ship with the JDK: [[ImageIoDecoder]] (`javax.imageio` PNG/GIF/BMP
  * — the m02 gate runs PNG encode → decode → raster stats against an
  * arithmetic oracle) and [[WavDecoder]] (`javax.sound.sampled` WAV/PCM —
  * the m04 gate does the same for audio). Video codecs aren't in the
  * container, so [[StubDecoder]] stands in for those mimes only; everything
  * Spark-side (schema, batching via mapPartitions over a typed Dataset —
  * the Scala analogue of mapInPandas, partition pruning, binary functions)
  * is identical between stub and real paths.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(media_id: Long, mime: String, payload: Array[Byte])
  /** Decoded features (what a real decoder would emit per frame/clip). */
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long,
                                 width: Int, height: Int, feature: Array[Float])

  /** Pluggable decode kernel. Runs once per record inside a partition batch;
    * implementations should amortize codec init per PARTITION, not per row
    * (see [[decodeFeatures]]). */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], mime: String): (Int, Int, Array[Float])
  }

  /** Deterministic fake decoder for mimes with no JDK codec (video):
    * "dimensions" and an 8-dim "feature" derived from payload bytes.
    * Replace with a real codec in production. */
  object StubDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], mime: String): (Int, Int, Array[Float]) = {
      val n = payload.length
      val feat = new Array[Float](8)
      var i = 0
      while (i < n) { feat(i % 8) += (payload(i) & 0xFF) / 255.0f; i += 1 }
      (16 + n % 64, 16 + n % 48, feat)
    }
  }

  /** REAL pure-JVM image decoder: `javax.imageio` (PNG/GIF/BMP readers ship
    * with the JDK — no native libs). Emits the decoded raster's true
    * dimensions and, as the feature vector, `[mean, min, max]` of the
    * first-band samples. Unreadable payloads decode to (-1, -1, empty) —
    * signal, never throw, the Collector's error contract. */
  object ImageIoDecoder extends MediaDecoder {
    // ImageIO defaults to DISK-backed stream caches — one temp file per
    // image read/write. In-memory payloads need no spill; flipping the
    // JVM-global flag removes a file create+delete from every codec call.
    // Runs when this singleton first loads on a JVM — i.e. once per
    // executor, before any decode.
    javax.imageio.ImageIO.setUseCache(false)
    def decode(payload: Array[Byte], mime: String): (Int, Int, Array[Float]) = {
      // NonFatal, not just IOException: the JDK readers throw
      // ArrayIndexOutOfBounds / NegativeArraySize / IllegalArgument on
      // malformed or hostile headers, and a null payload NPEs — one bad
      // record must yield an error row, never kill the task
      val img =
        if (payload == null) null
        else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
             catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) (-1, -1, Array.empty[Float])
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var (sum, mn, mx) = (0.0, Int.MaxValue, Int.MinValue)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            x += 1
          }
          y += 1
        }
        (w, h, Array((sum / (w.toLong * h)).toFloat, mn.toFloat, mx.toFloat))
      }
    }
  }

  /** Synthesize REAL grayscale PNGs deterministically from an id column:
    * width `1 + id % 16`, height `1 + id % 12`, every pixel `id % 256` —
    * dimensions and pixel stats are pure functions of the id, so a decode
    * of the encoded payload is ORACLE-CHECKABLE by arithmetic (the planted
    * ground-truth pattern, applied to a genuine codec round-trip). Encoding
    * runs per partition batch like every media kernel here. */
  def synthesizePng(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { ids =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams, no temp files
      ids.map { id =>
        // floorMod: Scala's % is negative for negative ids, and a
        // non-positive dimension throws inside BufferedImage — this is
        // public surface, any long id must synthesize
        val w = (1 + java.lang.Math.floorMod(id, 16L)).toInt
        val h = (1 + java.lang.Math.floorMod(id, 12L)).toInt
        val gray = java.lang.Math.floorMod(id, 256L).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, gray); x += 1 }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        MediaRecord(id, "image/png", bos.toByteArray)
      }
    }
  }

  /** REAL pure-JVM audio decoder: `javax.sound.sampled` reads WAV/PCM with
    * no native libs (the WAVE reader ships with the JDK). Emits
    * (sampleRate, channels) as the "dimensions" and
    * `[frameCount, meanAbsSample, peakAbsSample]` of the 16-bit samples as
    * the feature vector. Unreadable payloads decode to (-1, -1, empty) —
    * signal, never throw, the Collector's error contract. */
  object WavDecoder extends MediaDecoder {
    def decode(payload: Array[Byte], mime: String): (Int, Int, Array[Float]) = {
      val ais =
        if (payload == null) null
        else try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (ais == null) (-1, -1, Array.empty[Float])
      else try {
        val fmt = ais.getFormat
        val bytes = ais.readAllBytes()
        val bps = fmt.getSampleSizeInBits / 8
        val n = bytes.length / math.max(bps * fmt.getChannels, 1)
        var (sum, peak) = (0.0, 0L)
        if (bps == 2) {
          // 16-bit PCM; honor the container's declared endianness
          var i = 0
          while (i + 1 < bytes.length) {
            val s =
              if (fmt.isBigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xFF)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort
            val a = math.abs(s.toLong)
            sum += a; if (a > peak) peak = a
            i += 2
          }
        }
        (fmt.getSampleRate.toInt, fmt.getChannels,
          Array(n.toFloat, if (n == 0) 0f else (sum / n).toFloat, peak.toFloat))
      } catch { case scala.util.control.NonFatal(_) => (-1, -1, Array.empty[Float]) }
      finally ais.close()
    }
  }

  /** Synthesize REAL mono 16-bit PCM WAVs deterministically from an id
    * column: sample rate `8000 + 4000·(id mod 3)`, frame count
    * `100 + id mod 400`, every sample `id mod 30000` — rate, length, and
    * amplitude stats are pure functions of the id, so a decode of the
    * encoded payload is ORACLE-CHECKABLE by arithmetic (the m02 planted
    * ground-truth pattern, applied to a genuine audio codec round-trip). */
  def synthesizeWav(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val rate = (8000 + 4000 * java.lang.Math.floorMod(id, 3L)).toInt
        val nFrames = (100 + java.lang.Math.floorMod(id, 400L)).toInt
        val amp = java.lang.Math.floorMod(id, 30000L).toShort
        val pcm = new Array[Byte](nFrames * 2) // mono, 16-bit little-endian
        var i = 0
        while (i < nFrames) {
          pcm(2 * i) = (amp & 0xFF).toByte
          pcm(2 * i + 1) = ((amp >> 8) & 0xFF).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        MediaRecord(id, "audio/wav", bos.toByteArray)
      }
    }
  }

  /** Synthesize a media table from any table with an id + string column —
    * gives the binary-column pipeline real data to flow. */
  def synthesize(df: DataFrame, idCol: String, payloadFrom: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit("application/x-fake").as("mime"),
        col(payloadFrom).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Batch decode: one decoder instance per partition (codec init amortized
    * across the partition — the batching contract of mapInPandas), rows
    * streamed through it. */
  def decodeFeatures(media: Dataset[MediaRecord],
                     decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition init point (real impl: open codec context here)
      rows.map { r =>
        val (w, h, feat) = decoder.decode(r.payload, r.mime)
        MediaFeatures(r.media_id, r.mime, r.payload.length.toLong, w, h, feat)
      }
    }
  }

  /** One sampled frame of a media payload. */
  final case class MediaFrame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** Frame sampling: `nFrames` evenly-strided `frameBytes` slices per
    * payload (a real implementation decodes the container and grabs
    * keyframes — the slicing stub is DETERMINISTIC so the whole batching
    * path is oracle-checkable; see the m03 query). Same per-partition
    * batching contract as [[decodeFeatures]]. */
  def sampleFrames(media: Dataset[MediaRecord],
                   nFrames: Int = 3, frameBytes: Int = 16): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val n = r.payload.length
        val stride = math.max((n - frameBytes) / math.max(nFrames - 1, 1), 0)
        (0 until nFrames).map { k =>
          val off = math.min(k * stride, n)
          MediaFrame(r.media_id, k,
            java.util.Arrays.copyOfRange(r.payload, off, math.min(off + frameBytes, n)))
        }
      }
    }
  }

  /** Resize: payload → payload at (w, h), metadata updated. The pixel
    * kernel is stubbed (deterministic byte resampling at the target byte
    * budget); the Spark side — batch shape, schema, partition-amortized
    * codec init — is the real contract. */
  trait MediaResizer extends Serializable {
    def resize(payload: Array[Byte], mime: String, w: Int, h: Int): Array[Byte]
  }

  object StubResizer extends MediaResizer {
    def resize(payload: Array[Byte], mime: String, w: Int, h: Int): Array[Byte] = {
      val target = math.max(w * h / 64, 1)
      val out = new Array[Byte](target)
      val n = payload.length
      var i = 0
      while (i < target) { out(i) = if (n == 0) 0 else payload((i.toLong * n / target).toInt); i += 1 }
      out
    }
  }

  def resize(media: Dataset[MediaRecord], w: Int, h: Int,
             resizer: MediaResizer = StubResizer): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map(r => MediaRecord(r.media_id, r.mime, resizer.resize(r.payload, r.mime, w, h)))
    }
  }

  /** Pure-SQL binary metadata path (no decoder): content hash, size, magic
    * prefix — the part of media processing that IS expressible relationally
    * and therefore oracle-checkable. */
  def binaryStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("sha256"),
      hex(substring(col("payload"), 1, 8)).as("magic_hex"))
}
