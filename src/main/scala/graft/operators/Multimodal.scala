package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, processed in partition-sized batches.
  *
  * Decoders are pluggable behind [[MediaDecoder]]. Three REAL pure-JVM
  * codec paths, zero fakes: [[ImageIoDecoder]] (`javax.imageio` PNG/GIF/BMP
  * — the m02 gate runs PNG encode → decode → raster stats against an
  * arithmetic oracle), [[WavDecoder]] (`javax.sound.sampled` WAV/PCM — the
  * m04 gate does the same for audio), and [[Y4mDecoder]] (a from-scratch
  * yuv4mpeg2 container parser — uncompressed planar video needs no codec
  * library; the m03/m05 gates verify frame sampling and clip stats against
  * arithmetic oracles). Mimes none of these cover fail LOUDLY via
  * [[decoderFor]] — no fabricated features, ever. Everything Spark-side
  * (schema, batching via mapPartitions over a typed Dataset — the Scala
  * analogue of mapInPandas, partition pruning, binary functions) is shared
  * across all codec paths.
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

  /** Route a mime to its real codec — or fail LOUDLY. There is no fake
    * fallback: a mime nothing here can decode is a caller error
    * (IllegalArgumentException), never plausible-looking fabricated
    * numbers. Malformed PAYLOADS under a supported mime still follow the
    * signal-never-throw contract inside each decoder. */
  def decoderFor(mime: String): MediaDecoder = mime match {
    case m if m != null && m.startsWith("image/") => ImageIoDecoder
    case m if m != null && m.startsWith("audio/") => WavDecoder
    case "video/x-yuv4mpeg" | "video/y4m" => Y4mDecoder
    case other => throw new IllegalArgumentException(
      s"no decoder for mime '$other': supported are image/* (javax.imageio), " +
        "audio/* (javax.sound.sampled), video/x-yuv4mpeg (pure-JVM Y4M parser); " +
        "pass an explicit MediaDecoder for anything else")
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
        var (sum, peak, samples) = (0.0, 0L, 0L)
        if (bps == 2) {
          // 16-bit PCM; honor the container's declared endianness
          var i = 0
          while (i + 1 < bytes.length) {
            val s =
              if (fmt.isBigEndian) ((bytes(i) << 8) | (bytes(i + 1) & 0xFF)).toShort
              else ((bytes(i + 1) << 8) | (bytes(i) & 0xFF)).toShort
            val a = math.abs(s.toLong)
            sum += a; if (a > peak) peak = a; samples += 1
            i += 2
          }
        }
        // mean over SAMPLES (frames × channels), not frames: dividing the
        // all-channel sum by the frame count would inflate the stat by the
        // channel count on stereo input (identical for mono)
        (fmt.getSampleRate.toInt, fmt.getChannels,
          Array(n.toFloat, if (samples == 0) 0f else (sum / samples).toFloat, peak.toFloat))
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

  /** One parsed yuv4mpeg2 clip: dimensions, frame count, and the decoded
    * Y (luma) plane of every frame. Internal to the Y4M paths. */
  private final case class Y4mClip(width: Int, height: Int, lumaPlanes: Array[Array[Byte]])

  /** REAL pure-JVM video parser for the yuv4mpeg2 (Y4M) container: a text
    * stream header (`YUV4MPEG2 W.. H.. F.. .. C..`), then per frame a
    * `FRAME...\n` marker followed by raw planar YCbCr data. No codec
    * library needed — Y4M is uncompressed, which is exactly why it is the
    * one video format a dependency-free JVM can genuinely decode. Supports
    * the C420* / C422 / C444 / Cmono plane layouts. Returns None for
    * anything malformed (truncated planes, bad magic, odd dims for 4:2:0). */
  private def parseY4m(payload: Array[Byte]): Option[Y4mClip] = {
    if (payload == null) return None
    def readLine(from: Int): Option[(String, Int)] = {
      var i = from
      while (i < payload.length && payload(i) != '\n') i += 1
      if (i >= payload.length) None
      else Some((new String(payload, from, i - from, java.nio.charset.StandardCharsets.US_ASCII), i + 1))
    }
    try readLine(0).flatMap { case (header, afterHeader) =>
      val tokens = header.split(' ')
      if (tokens.isEmpty || tokens(0) != "YUV4MPEG2") return None
      var (w, h) = (-1, -1)
      var colorspace = "C420jpeg" // the Y4M default when no C tag is present
      tokens.iterator.drop(1).foreach { tok =>
        if (tok.nonEmpty) tok.charAt(0) match {
          case 'W' => w = tok.substring(1).toInt
          case 'H' => h = tok.substring(1).toInt
          case 'C' => colorspace = tok
          case _ => () // F/I/A/X tags don't change the plane layout
        }
      }
      if (w <= 0 || h <= 0) return None
      val chromaBytes = colorspace match {
        case c if c.startsWith("C420") =>
          if (w % 2 != 0 || h % 2 != 0) return None
          2 * ((w / 2) * (h / 2))
        case c if c.startsWith("C422") =>
          if (w % 2 != 0) return None
          2 * ((w / 2) * h)
        case c if c.startsWith("C444") => 2 * (w * h)
        case c if c.startsWith("Cmono") => 0
        case _ => return None
      }
      val frameSize = w * h + chromaBytes
      val planes = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var pos = afterHeader
      while (pos < payload.length) {
        readLine(pos) match {
          case Some((marker, dataStart)) if marker.startsWith("FRAME") =>
            if (dataStart + frameSize > payload.length) return None // truncated frame
            planes += java.util.Arrays.copyOfRange(payload, dataStart, dataStart + w * h)
            pos = dataStart + frameSize
          case _ => return None // garbage where a FRAME marker should be
        }
      }
      if (planes.isEmpty) None else Some(Y4mClip(w, h, planes.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** REAL pure-JVM video decoder over the yuv4mpeg2 container (see
    * [[parseY4m]]). Emits the true (width, height) and, as the feature
    * vector, `[frameCount, meanLuma(first frame), meanLuma(last frame)]` —
    * per-frame mean luma is the decoded Y-plane average. Unreadable
    * payloads decode to (-1, -1, empty) — signal, never throw. */
  object Y4mDecoder extends MediaDecoder {
    private[operators] def meanLuma(plane: Array[Byte]): Float = {
      var sum = 0.0
      var i = 0
      while (i < plane.length) { sum += (plane(i) & 0xFF); i += 1 }
      if (plane.length == 0) 0f else (sum / plane.length).toFloat
    }
    def decode(payload: Array[Byte], mime: String): (Int, Int, Array[Float]) =
      parseY4m(payload) match {
        case None => (-1, -1, Array.empty[Float])
        case Some(clip) =>
          (clip.width, clip.height,
            Array(clip.lumaPlanes.length.toFloat,
              meanLuma(clip.lumaPlanes.head), meanLuma(clip.lumaPlanes.last)))
      }
  }

  /** Synthesize REAL yuv4mpeg2 clips deterministically from an id column:
    * width `2·(1 + id mod 8)`, height `2·(1 + id mod 6)` (even, as 4:2:0
    * requires), `2 + id mod 5` frames, and every luma sample of frame k is
    * `16 + (id·31 + k·7) mod 220` (chroma neutral 128) — dimensions, frame
    * count, and per-frame luma stats are pure functions of (id, k), so a
    * decode of the encoded payload is ORACLE-CHECKABLE by arithmetic (the
    * m02/m04 planted ground-truth pattern, applied to a genuine video
    * container round-trip). */
  def synthesizeY4m(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = 2 * (1 + java.lang.Math.floorMod(id, 8L)).toInt
        val h = 2 * (1 + java.lang.Math.floorMod(id, 6L)).toInt
        val nFrames = (2 + java.lang.Math.floorMod(id, 5L)).toInt
        val bos = new java.io.ByteArrayOutputStream()
        bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n"
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val chroma = new Array[Byte]((w / 2) * (h / 2))
        java.util.Arrays.fill(chroma, 128.toByte)
        var k = 0
        while (k < nFrames) {
          bos.write("FRAME\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
          val luma = new Array[Byte](w * h)
          java.util.Arrays.fill(luma,
            (16 + java.lang.Math.floorMod(id * 31 + k * 7, 220L)).toByte)
          bos.write(luma); bos.write(chroma); bos.write(chroma)
          k += 1
        }
        MediaRecord(id, "video/x-yuv4mpeg", bos.toByteArray)
      }
    }
  }

  /** One decoded, sampled video frame: which decoded frame (`frame_idx`)
    * backs sample slot `frame_no`, plus its dimensions and mean luma. */
  final case class VideoFrame(media_id: Long, frame_no: Int, frame_idx: Int,
                              width: Int, height: Int, mean_luma: Float)

  /** REAL frame sampling: decode the Y4M container and keep `nFrames`
    * evenly-strided decoded frames — `frame_idx = frame_no·(F-1) / (n-1)`
    * over the clip's F frames (keyframe-style stride; short clips repeat
    * frames rather than fail). Emits decoded per-frame stats, not byte
    * windows — this is the codec path the m03 gate verifies. Unreadable
    * payloads yield no rows (signal by absence; [[decodeFeatures]] with
    * [[Y4mDecoder]] surfaces them as (-1,-1) rows). Same per-partition
    * batching contract as every media kernel here. */
  def sampleVideoFrames(media: Dataset[MediaRecord], nFrames: Int = 3): Dataset[VideoFrame] = {
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        parseY4m(r.payload) match {
          case None => Iterator.empty
          case Some(clip) =>
            val f = clip.lumaPlanes.length
            (0 until nFrames).iterator.map { k =>
              val idx = if (nFrames == 1) 0 else (k.toLong * (f - 1) / (nFrames - 1)).toInt
              VideoFrame(r.media_id, k, idx, clip.width, clip.height,
                Y4mDecoder.meanLuma(clip.lumaPlanes(idx)))
            }
        }
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
                     decoder: MediaDecoder): Dataset[MediaFeatures] = {
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

  /** Batch decode with per-mime codec routing ([[decoderFor]]): an
    * unsupported mime fails the job loudly rather than fabricating
    * features. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, feat) = decoderFor(r.mime).decode(r.payload, r.mime)
        MediaFeatures(r.media_id, r.mime, r.payload.length.toLong, w, h, feat)
      }
    }
  }

  /** One sampled frame of a media payload. */
  final case class MediaFrame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** BYTE-window sampling: `nFrames` evenly-strided `frameBytes` slices of
    * the raw payload — a codec-free utility for peeking at opaque blobs
    * (magic sniffing, chunked hashing). For genuine decoded video frames
    * use [[sampleVideoFrames]], which the m03 gate verifies. */
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
