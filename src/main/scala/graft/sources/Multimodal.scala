package graft.sources

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal columns: media as opaque `binary` payloads with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * ALL THREE media paths are REAL byte-level container work: the
  * ingest synthesizes valid BMP (BITMAPFILEHEADER + BITMAPINFOHEADER +
  * palette + pixel rows), WAV (RIFF/fmt/data chunk walk), and Y4M
  * (YUV4MPEG2 header + FRAME-delimited raw planes) files from the
  * fixture bytes, and the decode stage parses width / height / frame
  * rate / sample rate / duration OUT OF THE ACTUAL BINARY LAYOUT —
  * malformed headers fail decode (spec-asserted). All are public,
  * documented formats simple enough to parse dependency-free; frame
  * sampling reads the actual frame payloads out of the container.
  *
  * What remains deterministic-fake, clearly declared: the embedding
  * ([[FakeCodec.decodeEmbedding]] hash-projects the decoded body — it
  * stands in for a vision/audio model, not for the codec).
  *
  * Media payloads derive deterministically from the `documents`
  * fixture (text bytes = pixel/sample/frame content) so every stage
  * is reproducible across runs and engines.
  */
object Multimodal {

  val EmbeddingDim = 16

  /** Typed media row: payload + manifest metadata. `duration_ms` is
    * an ingest-manifest hint consumed ONLY by the video fake-sampling
    * path — image/audio geometry and duration come from the container
    * bytes at decode time. */
  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte], duration_ms: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, sample_rate: Int, frames_sampled: Int,
      embedding: Array[Float])

  /** Real 8-bit-grayscale BMP encode/decode (public format: Windows
    * BITMAPFILEHEADER + BITMAPINFOHEADER v3 + 256-entry palette).
    * Widths here are multiples of 4, so the 8bpp row stride needs no
    * padding and the pixel array is exactly width·height bytes. */
  object BmpCodec {
    private val PixelOffset = 14 + 40 + 256 * 4 // file + info + palette

    /** A valid BMP of the given width whose pixel array is `content`
      * padded with trailing zeros to fill the last row. */
    def encode(content: Array[Byte], width: Int): Array[Byte] = {
      require(width > 0 && width % 4 == 0, s"width must be a positive multiple of 4: $width")
      val height = math.max(1, (content.length + width - 1) / width)
      val body = width * height
      val buf = java.nio.ByteBuffer.allocate(PixelOffset + body)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte)
      buf.putInt(PixelOffset + body)        // bfSize
      buf.putInt(0)                          // bfReserved1/2
      buf.putInt(PixelOffset)                // bfOffBits
      buf.putInt(40)                         // biSize
      buf.putInt(width).putInt(height)       // biWidth, biHeight
      buf.putShort(1).putShort(8)            // biPlanes, biBitCount
      buf.putInt(0)                          // biCompression = BI_RGB
      buf.putInt(body)                       // biSizeImage
      buf.putInt(2835).putInt(2835)          // 72 dpi
      buf.putInt(256).putInt(0)              // colors used / important
      var i = 0
      while (i < 256) { // grayscale palette, BGRA
        buf.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte); i += 1
      }
      buf.put(content)
      buf.array()
    }

    /** Parse (width, height, pixel array) out of the binary layout;
      * rejects anything that isn't the 8bpp uncompressed shape. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      require(bytes.length >= PixelOffset &&
        bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
        "not a BMP: bad magic or truncated header")
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val off = buf.getInt(10)
      val width = buf.getInt(18)
      val height = buf.getInt(22)
      val bpp = buf.getShort(28).toInt
      val compression = buf.getInt(30)
      require(bpp == 8 && compression == 0,
        s"unsupported BMP variant: bpp=$bpp compression=$compression")
      require(width > 0 && height > 0 && off >= PixelOffset &&
        off.toLong + width.toLong * height <= bytes.length,
        s"corrupt BMP geometry: ${width}x$height off=$off len=${bytes.length}")
      (width, height, java.util.Arrays.copyOfRange(bytes, off, off + width * height))
    }
  }

  /** Real WAV encode/decode (public format: RIFF container, PCM
    * `fmt ` chunk, `data` chunk; chunks pad to even byte boundaries
    * with the pad excluded from the chunk size). */
  object WavCodec {
    def encode(samples: Array[Byte], sampleRate: Int): Array[Byte] = {
      val pad = samples.length % 2
      val buf = java.nio.ByteBuffer.allocate(44 + samples.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII"))
      buf.putInt(36 + samples.length + pad)  // RIFF payload size
      buf.put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII"))
      buf.putInt(16)                         // PCM fmt chunk size
      buf.putShort(1)                        // audio format = PCM
      buf.putShort(1)                        // channels = mono
      buf.putInt(sampleRate)
      buf.putInt(sampleRate)                 // byte rate (8-bit mono)
      buf.putShort(1).putShort(8)            // block align, bits
      buf.put("data".getBytes("US-ASCII"))
      buf.putInt(samples.length)
      buf.put(samples)
      buf.array()
    }

    /** Walk the RIFF chunks and parse (sampleRate, sample bytes). */
    def decode(bytes: Array[Byte]): (Int, Array[Byte]) = {
      require(bytes.length >= 12 &&
        new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE",
        "not a WAV: bad RIFF/WAVE magic")
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var pos = 12
      var rate = -1
      var data: Array[Byte] = null
      while (pos + 8 <= bytes.length && (rate < 0 || data == null)) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val size = buf.getInt(pos + 4)
        // long arithmetic: a hostile size near Int.MaxValue would wrap
        // an int bound check (and copyOfRange's length) right past it
        require(size >= 0 && pos + 8L + size <= bytes.length,
          s"corrupt WAV chunk '$id' size=$size at $pos len=${bytes.length}")
        id match {
          case "fmt " =>
            require(size >= 16 && buf.getShort(pos + 8) == 1,
              "unsupported WAV: not integer PCM")
            rate = buf.getInt(pos + 12)
          case "data" =>
            data = java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
          case _ => ()
        }
        pos += 8 + size + (size % 2) // chunks pad to even boundaries
      }
      require(rate > 0 && data != null, "WAV missing fmt/data chunk")
      (rate, data)
    }
  }

  /** Real Y4M (YUV4MPEG2) encode/decode — the public uncompressed
    * video container mjpegtools/ffmpeg ship (`yuv4mpeg(5)`): one
    * ASCII header line `YUV4MPEG2 W<w> H<h> F<num>:<den> …\n`, then
    * each frame as a `FRAME[ params]\n` marker followed by the raw
    * plane bytes. Graft writes `Cmono` (a single full-resolution
    * luma plane, w·h bytes per frame — the documented colorspace for
    * grayscale), so the fixture text bytes ARE the frame payloads.
    * Decode parses geometry and frame rate out of the header, walks
    * the FRAME markers, and fails fast on bad magic, non-numeric or
    * absurd geometry, unsupported colorspace, or a truncated frame —
    * the same bar as [[BmpCodec]]/[[WavCodec]]. */
  object Y4mCodec {
    private val Ascii = java.nio.charset.StandardCharsets.US_ASCII
    private val MaxDim = 1 << 16

    final case class Video(width: Int, height: Int, fpsNum: Int,
        fpsDen: Int, frames: Array[Array[Byte]])

    /** A valid Y4M whose concatenated frame payloads are `content`
      * split into w·h-byte frames, zero-padded in the last frame. */
    def encode(content: Array[Byte], width: Int, height: Int, fps: Int): Array[Byte] = {
      require(width > 0 && height > 0 && fps > 0 && width <= MaxDim && height <= MaxDim,
        s"bad Y4M encode geometry: ${width}x$height@$fps")
      val fsize = width * height
      val nFrames = math.max(1, (content.length + fsize - 1) / fsize)
      val header = s"YUV4MPEG2 W$width H$height F$fps:1 Ip A1:1 Cmono\n".getBytes(Ascii)
      val marker = "FRAME\n".getBytes(Ascii)
      // allocate() zero-initializes, so skipping the pad region of the
      // last frame leaves the spec'd zero fill
      val buf = java.nio.ByteBuffer.allocate(header.length + nFrames * (marker.length + fsize))
      buf.put(header)
      var f = 0
      while (f < nFrames) {
        buf.put(marker)
        val start = f * fsize
        val n = math.min(fsize, math.max(0, content.length - start))
        if (n > 0) buf.put(content, start, n)
        if (n < fsize) buf.position(buf.position() + (fsize - n))
        f += 1
      }
      buf.array()
    }

    /** Parse (geometry, frame rate, frame payloads) out of the binary
      * layout; rejects anything that isn't the Cmono shape. */
    def decode(bytes: Array[Byte]): Video = {
      val nl = indexOfNl(bytes, 0)
      require(nl > 0 && nl < 256, "not a Y4M: missing header terminator")
      val header = new String(bytes, 0, nl, Ascii)
      val parts = header.split(" ")
      require(parts(0) == "YUV4MPEG2", "not a Y4M: bad magic")
      var w = -1; var h = -1; var fn = -1; var fd = -1
      var cs = "420jpeg" // the yuv4mpeg(5) default when C is absent
      try parts.iterator.drop(1).filter(_.nonEmpty).foreach { p =>
        p.charAt(0) match {
          case 'W' => w = p.substring(1).toInt
          case 'H' => h = p.substring(1).toInt
          case 'F' =>
            val Array(a, b) = p.substring(1).split(":", 2)
            fn = a.toInt; fd = b.toInt
          case 'C' => cs = p.substring(1)
          case _ => () // Ip/A/X params carry no geometry
        }
      } catch {
        case e: RuntimeException => // NumberFormat / MatchError → loud
          throw new IllegalArgumentException(s"corrupt Y4M header '$header'", e)
      }
      require(w > 0 && h > 0 && fn > 0 && fd > 0 && w <= MaxDim && h <= MaxDim,
        s"corrupt Y4M geometry: W=$w H=$h F=$fn:$fd")
      require(cs == "mono", s"unsupported Y4M colorspace: C$cs (only Cmono)")
      val fsize = w * h
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var pos = nl + 1
      while (pos < bytes.length) {
        require(pos + 5 <= bytes.length &&
          new String(bytes, pos, 5, Ascii) == "FRAME",
          s"corrupt Y4M: expected FRAME marker at byte $pos")
        val end = indexOfNl(bytes, pos + 5) // marker may carry params
        require(end >= 0, s"corrupt Y4M: unterminated FRAME marker at byte $pos")
        pos = end + 1
        require(pos + fsize <= bytes.length, s"truncated Y4M frame at byte $pos")
        frames += java.util.Arrays.copyOfRange(bytes, pos, pos + fsize)
        pos += fsize
      }
      require(frames.nonEmpty, "Y4M with no frames")
      Video(w, h, fn, fd, frames.toArray)
    }

    /** Sample at ~1 fps: every (fpsNum/fpsDen)-th frame starting with
      * frame 0, reading the ACTUAL payloads parsed by [[decode]]. */
    def sampleOneFps(v: Video): Array[Array[Byte]] = {
      val step = math.max(1, v.fpsNum / math.max(1, v.fpsDen))
      (0 until v.frames.length by step).map(v.frames).toArray
    }

    private def indexOfNl(bytes: Array[Byte], from: Int): Int = {
      var i = from
      while (i < bytes.length && bytes(i) != '\n'.toByte) i += 1
      if (i < bytes.length) i else -1
    }
  }

  /** ====== DETERMINISTIC FAKE (declared): the embedding model ======
    * `decodeEmbedding` hash-projects decoded body bytes into a dense
    * vector — the stand-in for a vision/audio embedding model (the
    * codecs feeding it are real; see [[BmpCodec]]/[[WavCodec]]/
    * [[Y4mCodec]]). `frameCount` derives the audio sampling count
    * from the PARSED duration (one sample per 5 s of audio). */
  object FakeCodec {
    def decodeEmbedding(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        // simple multiplicative hash per (position, byte) into buckets
        val h = (bytes(i) & 0xFF) * 2654435761L + i * 40503L
        val bucket = ((h >>> 16) % dim).toInt
        out(bucket) += ((h >>> 32) & 0xFF).toFloat / 255f - 0.5f
        i += 1
      }
      out
    }
    def frameCount(kind: String, durationMs: Int): Int = kind match {
      case "audio" => math.max(1, durationMs / 5000)
      case _ => 1 // video sampling is real: Y4mCodec.sampleOneFps
    }
  }

  val AudioRate = 16000

  /** Image width manifest formula (multiple of 4 by construction, so
    * the 8bpp BMP rows need no padding). */
  private def imageWidth(id: Long): Int = 64 + (id % 16).toInt * 16

  /** Video manifest formulas: geometry and frame rate vary per item so
    * the decode genuinely has to parse them back out of the header. */
  private def videoWidth(id: Long): Int = 32 + (id % 8).toInt * 16   // 32..144
  private def videoHeight(id: Long): Int = 16 + (id % 4).toInt * 16  // 16..64
  private def videoFps(id: Long): Int = 1 + (id % 5).toInt           // 1..5

  /** Build the deterministic media table from `documents`: text bytes
    * become BMP pixels (image), WAV samples (audio), or Y4M luma
    * frames (video). `duration_ms` stays 0 — every kind's geometry,
    * duration, and frame count now parse from the container bytes. */
  def mediaFromDocuments(t: Tables): Dataset[MediaRow] = {
    import t.spark.implicits._
    t.documents.select($"doc_id", $"text").as[(Long, String)].map { case (id, text) =>
      val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (id % 3) match {
        case 0 => MediaRow(id, "image", BmpCodec.encode(content, imageWidth(id)), 0)
        case 1 => MediaRow(id, "audio", WavCodec.encode(content, AudioRate), 0)
        case _ => MediaRow(id, "video", Y4mCodec.encode(content,
          videoWidth(id), videoHeight(id), videoFps(id)), 0)
      }
    }
  }

  /** Decode + feature-extract, partition-parallel. `mapPartitions`
    * (not per-row UDF) so a real codec could amortize per-batch init
    * (decoder contexts, native buffers) across the partition — the
    * Scala analogue of arrow-batched Python UDFs. Geometry, sample
    * rate, and duration come from the parsed container bytes; a
    * malformed header fails the task (fail-fast, spec-asserted). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, buffers)
      rows.map { m =>
        m.kind match {
          case "image" =>
            val (w, h, pixels) = BmpCodec.decode(m.bytes)
            MediaFeatures(m.media_id, m.kind, m.bytes.length, w, h, 0,
              FakeCodec.frameCount(m.kind, 0),
              FakeCodec.decodeEmbedding(pixels, EmbeddingDim))
          case "audio" =>
            val (rate, samples) = WavCodec.decode(m.bytes)
            val durMs = (samples.length.toLong * 1000L / rate).toInt
            MediaFeatures(m.media_id, m.kind, m.bytes.length, 0, 0, rate,
              FakeCodec.frameCount(m.kind, durMs),
              FakeCodec.decodeEmbedding(samples, EmbeddingDim))
          case _ =>
            // video: geometry + frame rate from the Y4M header, frame
            // sampling over the ACTUAL parsed frame payloads (~1 fps),
            // embedding over the sampled frames' concatenated bytes
            val v = Y4mCodec.decode(m.bytes)
            val sampled = Y4mCodec.sampleOneFps(v)
            val body = new Array[Byte](sampled.length * v.width * v.height)
            var off = 0
            sampled.foreach { fr =>
              System.arraycopy(fr, 0, body, off, fr.length); off += fr.length
            }
            MediaFeatures(m.media_id, m.kind, m.bytes.length, v.width, v.height, 0,
              sampled.length, FakeCodec.decodeEmbedding(body, EmbeddingDim))
        }
      }
    }
  }

  /** q121: the video path end-to-end as its own hash-checked row —
    * decode every Y4M container, parse geometry + frame rate from the
    * header bytes, walk the FRAME markers, sample at ~1 fps, and
    * checksum the SAMPLED frames' actual payload bytes (unsigned
    * sum — exact in int64, order-defined, engine-portable). A wrong
    * header parse, wrong frame walk, wrong zero-pad, or wrong
    * sampling stride each flips the hash. Embarrassingly parallel:
    * one task decodes its partition's videos, no shuffle until the
    * final order. */
  def videoDecode(t: Tables): DataFrame = {
    import t.spark.implicits._
    mediaFromDocuments(t)
      .filter(_.kind == "video")
      .map { m =>
        val v = Y4mCodec.decode(m.bytes)
        val sampled = Y4mCodec.sampleOneFps(v)
        var sum = 0L
        sampled.foreach { fr =>
          var i = 0
          while (i < fr.length) { sum += (fr(i) & 0xFF); i += 1 }
        }
        (m.media_id, v.width, v.height, v.fpsNum, v.frames.length,
          sampled.length, sum)
      }
      .toDF("media_id", "width", "height", "fps", "n_frames",
        "frames_sampled", "sampled_byte_sum")
      .orderBy($"media_id")
  }

  /** Real nearest-neighbor resample over a decoded 8bpp pixel grid:
    * out(y, x) = src(⌊y·h/th⌋, ⌊x·w/tw⌋) — pure integer index
    * arithmetic, no filtering, so the operation (and any checksum of
    * its output) is exactly reproducible on any engine. */
  def resizeNearest(w: Int, h: Int, pixels: Array[Byte],
      tw: Int, th: Int): Array[Byte] = {
    require(w > 0 && h > 0 && tw > 0 && th > 0 &&
      pixels.length >= w * h, s"bad resize geometry: ${w}x$h -> ${tw}x$th")
    val out = new Array[Byte](tw * th)
    var y = 0
    while (y < th) {
      val sy = (y.toLong * h / th).toInt
      var x = 0
      while (x < tw) {
        out(y * tw + x) = pixels(sy * w + (x.toLong * w / tw).toInt)
        x += 1
      }
      y += 1
    }
    out
  }

  /** q130: the image path's transform leg made real — decode every
    * BMP, nearest-neighbor-resample the ACTUAL pixels to a fixed
    * thumbnail geometry, and checksum the RESIZED bytes (unsigned
    * int64 sum). A wrong header parse, wrong row indexing, wrong
    * zero-pad, or wrong resample mapping each flips the hash; the
    * oracle replays the index arithmetic over the source text bytes.
    * Embarrassingly parallel like q121 — partition-local decode +
    * resample, no shuffle until the final order. */
  def imageResize(t: Tables, tw: Int = 32, th: Int = 16): DataFrame = {
    import t.spark.implicits._
    mediaFromDocuments(t)
      .filter(_.kind == "image")
      .map { m =>
        val (w, h, px) = BmpCodec.decode(m.bytes)
        val out = resizeNearest(w, h, px, tw, th)
        var sum = 0L
        var i = 0
        while (i < out.length) { sum += (out(i) & 0xFF); i += 1 }
        (m.media_id, w, h, tw, th, sum)
      }
      .toDF("media_id", "width", "height", "new_w", "new_h",
        "resized_byte_sum")
      .orderBy($"media_id")
  }

  /** q131: the audio path's feature-extraction leg made real — decode
    * every WAV container and compute frame-wise signal features over
    * the ACTUAL PCM samples, in exact integer arithmetic so the result
    * (not just a row count) is engine-reproducible:
    *
    *  - deviations are scaled by n to stay integral: dev_i = n·s_i − Σs
    *    (s_i the unsigned 8-bit sample) — sign(dev_i) is the sample's
    *    position vs the clip mean without ever forming the rational mean
    *  - `total_energy` = Σ dev_i² (scaled variance ×n²), `peak_dev` =
    *    max |dev_i|, `mean_crossings` counts strict sign flips between
    *    consecutive deviations (the ZCR analog for unsigned PCM, where
    *    a fixed 128 center would never flip on ASCII-range samples)
    *  - frames are [[AudioFrame]] samples (4 ms at 16 kHz); the loudest
    *    frame is the argmax of the per-frame energy, ties to the lowest
    *    index — the exact-integer form of "find the signal peak"
    *
    * Bounds: dev² ≤ (255n)² and Σ dev² ≤ n·(255n)², so int64 is exact
    * through n ≈ 300k samples per clip (fixture clips are ≤ 1k; the
    * require below refuses louder input rather than silently wrapping).
    * Embarrassingly parallel like q121/q130 — partition-local decode +
    * feature pass, no shuffle until the final order. */
  def audioFeatures(t: Tables): DataFrame = {
    import t.spark.implicits._
    mediaFromDocuments(t)
      .filter(_.kind == "audio")
      .map { m =>
        val a = wavFeatures(m.bytes)
        (m.media_id, a.sampleRate, a.nSamples, a.nFrames, a.totalEnergy,
          a.meanCrossings, a.peakDev, a.loudestFrame, a.loudestEnergy)
      }
      .toDF("media_id", "sample_rate", "n_samples", "n_frames",
        "total_energy", "mean_crossings", "peak_dev",
        "loudest_frame", "loudest_energy")
      .orderBy($"media_id")
  }

  /** Frame length in samples for [[audioFeatures]] (4 ms at 16 kHz). */
  val AudioFrame = 64

  case class AudioFeatures(sampleRate: Int, nSamples: Long, nFrames: Long,
      totalEnergy: Long, meanCrossings: Long, peakDev: Long,
      loudestFrame: Long, loudestEnergy: Long)

  /** The per-clip feature pass behind [[audioFeatures]] (see its doc
    * for the arithmetic and the int64-exactness bound). */
  def wavFeatures(bytes: Array[Byte]): AudioFeatures = {
    val (rate, s) = WavCodec.decode(bytes)
    val n = s.length
    require(n > 0 && n <= 300000, s"audio clip out of int64-exact range: $n samples")
    var total = 0L
    var i = 0
    while (i < n) { total += (s(i) & 0xFF); i += 1 }
    var energy = 0L; var peak = 0L; var crossings = 0L
    var prevDev = 0L
    val nFrames = (n + AudioFrame - 1) / AudioFrame
    var loudestFrame = 0; var loudestEnergy = Long.MinValue
    var f = 0
    while (f < nFrames) {
      var fe = 0L
      var j = f * AudioFrame
      val end = math.min(j + AudioFrame, n)
      while (j < end) {
        val dev = n.toLong * (s(j) & 0xFF) - total
        fe += dev * dev
        if (math.abs(dev) > peak) peak = math.abs(dev)
        if (j > 0 && ((dev > 0 && prevDev < 0) || (dev < 0 && prevDev > 0)))
          crossings += 1
        prevDev = dev
        j += 1
      }
      energy += fe
      if (fe > loudestEnergy) { loudestEnergy = fe; loudestFrame = f }
      f += 1
    }
    AudioFeatures(rate, n.toLong, nFrames.toLong, energy, crossings, peak,
      loudestFrame.toLong, loudestEnergy)
  }

  /** "Resize": target resolution for the decoded geometry — metadata
    * transform demonstrating the derived-column flow (images only;
    * audio/video carry no raster geometry). */
  def resized(features: Dataset[MediaFeatures], maxDim: Int): DataFrame = {
    import features.sparkSession.implicits._
    features.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .withColumn("out_width",
        when(greatest(col("width"), col("height")) > 0,
          (col("width") * col("scale")).cast("int")).otherwise(0))
      .withColumn("out_height",
        when(greatest(col("width"), col("height")) > 0,
          (col("height") * col("scale")).cast("int")).otherwise(0))
      .drop("scale")
  }

  /** q33: per-kind media profile over decoded features — container
    * sizes, parsed geometry and sample rate, fake-sampled frames. */
  def mediaProfile(t: Tables): DataFrame = {
    import t.spark.implicits._
    resized(extractFeatures(mediaFromDocuments(t)), maxDim = 256)
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").as("total_bytes"),
        sum($"frames_sampled").as("total_frames"),
        min($"out_width").as("min_w"), max($"out_width").as("max_w"),
        max($"sample_rate").as("max_rate"))
      .orderBy($"kind")
  }

  // ── q164: perceptual image near-dup (difference hash) ───────────────
  /** 64-bit dHash over a decoded 8bpp grid: nearest-neighbor-resample
    * to a 9×8 thumbnail (the [[resizeNearest]] integer index map),
    * then bit r·8+c = [pixel(r,c) < pixel(r,c+1)] — the standard
    * perceptual fingerprint (gradient signs survive rescaling,
    * re-encoding, and small pixel edits that a cryptographic hash
    * would scatter). Pure integer arithmetic end to end, so the hash
    * is replayable by any engine. */
  def dhash64(w: Int, h: Int, px: Array[Byte]): Long = {
    val g = resizeNearest(w, h, px, 9, 8)
    var hash = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if ((g(r * 9 + c) & 0xFF) < (g(r * 9 + c + 1) & 0xFF))
          hash |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    hash
  }

  /** Planted-twin id offset for [[imageDupCohorts]]/[[imageNearDups]];
    * synthetic Hamming-gadget ids start at 2×. */
  val PlantOffset = 10000000L

  /** Synthetic Hamming gadget: a 64×8 image whose rows are the ramp
    * 32..95 (no wraparound, ASCII-safe). Variant j ∈ 1..3 zeroes the
    * byte at (row r < j, x = 28) — exactly the source byte thumbnail
    * cell (r, 4) samples — flipping exactly comparison bit (r, 3)
    * and nothing else, so hamming(A, B_j) = j BY CONSTRUCTION. */
  private[sources] def syntheticImage(variant: Int): Array[Byte] =
    BmpCodec.encode(gadgetRamp(variant), 64)

  /** The fixture image corpus plus two planted families:
    *
    *  - IDENTICAL-hash twins (ids + [[PlantOffset]]): for every 10th
    *    image, a copy whose byte at source index 4·w/9 + 1 is
    *    incremented. That index sits strictly between the thumbnail's
    *    column sample points (c·w/9 steps ≥ 7 apart at w ≥ 64), so NO
    *    grid cell samples it — pixels differ, dHash is identical:
    *    the invariance a perceptual hash promises.
    *  - HAMMING-j quads (ids 2·PlantOffset + 4k + j): per every 60th
    *    doc id k, the [[syntheticImage]] gadget at variants 0..3 —
    *    deterministic distinct-hash pairs at Hamming exactly 1, 2, 3
    *    that exercise the banding+verify path end to end. */
  def imagesWithPlanted(t: Tables): Dataset[MediaRow] = {
    import t.spark.implicits._
    val base = mediaFromDocuments(t).filter(_.kind == "image")
    val twins = t.documents.filter($"doc_id" % 30 === 0)
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val w = imageWidth(id)
        val i0 = 4 * w / 9 + 1
        if (i0 < content.length) content(i0) = (content(i0) + 1).toByte
        MediaRow(id + PlantOffset, "image", BmpCodec.encode(content, w), 0)
      }
    val gadgets = t.documents.filter($"doc_id" % 60 === 0)
      .select($"doc_id").as[Long]
      .flatMap { k =>
        (0 to 3).map(j =>
          MediaRow(2 * PlantOffset + 4 * k + j, "image", syntheticImage(j), 0))
      }
    base.union(twins).union(gadgets)
  }

  /** Decode + dHash the planted corpus once (shared by q164/q165). */
  private def hashedImages(t: Tables): DataFrame = {
    import t.spark.implicits._
    imagesWithPlanted(t)
      .map { m =>
        val (w, h, px) = BmpCodec.decode(m.bytes)
        (m.media_id, dhash64(w, h, px))
      }
      .toDF("id", "dh")
  }

  /** Hash-equal cohorts with ≥ 2 members over any 64-bit perceptual
    * fingerprint frame `(id, h)` — one row per cohort (rep_id = min
    * member, n_members, n_planted counting ids ≥ [[PlantOffset]]).
    * One map-side-combinable agg, linear at any corpus size — the
    * scalable form of hamming-0 pair emission (the q136
    * collapse-by-hash lesson). Shared by the image (q164) and audio
    * (q183) dedup paths. */
  private def dupCohortsOver(hashed: DataFrame): DataFrame =
    hashed
      .groupBy(col("h"))
      .agg(min(col("id")).as("rep_id"), count(lit(1)).as("n_members"),
        sum(when(col("id") >= PlantOffset, 1L).otherwise(0L)).as("n_planted"))
      .filter(col("n_members") >= 2)
      .select(col("rep_id"), col("n_members"), col("n_planted"))
      .orderBy(col("rep_id"))

  /** Near-dup pairs at DISTINCT-hash granularity over a 64-bit
    * fingerprint frame `(id, h)`: collapse to distinct hashes, 4
    * disjoint 16-bit pigeonhole bands (COMPLETE to Hamming 3 — any
    * ≤3-bit pair shares a full band, the q71/q72 recipe), exact
    * bit_count(xor) verify, multiplicities instead of materialized
    * doc pairs. Shared by q165 (images) and q184 (audio). */
  private def nearDupsOver(hashed: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 3,
      s"4 disjoint 16-bit bands are complete only to Hamming 3: $maxHamming")
    val distinctHashes = hashed
      .groupBy(col("h"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("n"))
      .localCheckpoint(true)
    val bands = distinctHashes.select(col("h"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("b"),
          shiftrightunsigned(col("h"), b * 16).bitwiseAND(lit(0xFFFFL)).as("v"))
      }: _*)).as("bk"))
      .select(col("h"), col("bk.b").as("b"), col("bk.v").as("v"))
    val cands = bands.select(col("h").as("h_a"), col("b"), col("v"))
      .join(bands.select(col("h").as("h_b"), col("b"), col("v")), Seq("b", "v"))
      .filter(col("h_a") < col("h_b"))
      .select(col("h_a"), col("h_b"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .filter(col("hamming") <= maxHamming)
      .join(distinctHashes.select(col("h").as("h_a"), col("rep").as("rep_a"),
        col("n").as("n_a")), Seq("h_a"))
      .join(distinctHashes.select(col("h").as("h_b"), col("rep").as("rep_b"),
        col("n").as("n_b")), Seq("h_b"))
      .select(least(col("rep_a"), col("rep_b")).as("id_lo"),
        greatest(col("rep_a"), col("rep_b")).as("id_hi"),
        when(col("rep_a") < col("rep_b"), col("n_a")).otherwise(col("n_b")).as("n_lo"),
        when(col("rep_a") < col("rep_b"), col("n_b")).otherwise(col("n_a")).as("n_hi"),
        col("hamming"))
      .orderBy(col("id_lo"), col("id_hi"))
  }

  /** q164: exact-duplicate image cohorts — hash-equal groups with ≥ 2
    * members, one ROW per cohort: (rep_id = min member, n_members,
    * n_planted). This is the scalable form of "emit all hamming-0
    * pairs": low-entropy images collide organically (the grouped
    * fixture holds 2094-member cohorts at sf10 — 11.6M intra-cohort
    * pairs), so pair emission is answer-bound QUADRATIC while the
    * cohort table is one map-side-combinable agg, linear at any
    * corpus size — the q136 collapse-by-hash lesson applied to
    * images. Every planted identical twin lands in its original's
    * cohort (n_planted counts them). */
  def imageDupCohorts(t: Tables): DataFrame =
    dupCohortsOver(hashedImages(t).select(col("id"), col("dh").as("h")))

  /** q165: perceptual NEAR-dup pairs at DISTINCT-hash granularity —
    * the dedup family's multimodal member: decode → dHash → collapse
    * to the distinct-hash table (structure space SATURATES: 6.1k
    * values at sf1 → 12.9k at sf10 on 10× the images) → Hamming-band
    * candidates → exact verify, 1 ≤ hamming ≤ maxHamming. Banding is
    * the q71/q72 pigeonhole construction: 4 disjoint 16-bit bands, so
    * any pair within Hamming ≤ 3 shares a full band — candidate
    * generation is COMPLETE and the emitted set is exactly all
    * distinct-hash pairs within the bound (brute-force-oracle-
    * checked). Emitting (rep_a, rep_b, n_a, n_b, hamming) carries the
    * doc-pair mass as multiplicities n_a·n_b instead of materializing
    * it — the same answer-bound discipline as q164's cohorts. The
    * synthetic gadget quads guarantee deterministic rows at hamming
    * exactly 1, 2, 3 at every SF. */
  def imageNearDups(t: Tables, maxHamming: Int = 3): DataFrame =
    nearDupsOver(hashedImages(t).select(col("id"), col("dh").as("h")),
      maxHamming)

  // ── q183/q184: perceptual AUDIO near-dup (frame-sum fingerprint) ─────
  // The audio member of the perceptual-dedup family: WAV features
  // exist (q131) but nothing caught re-encoded / slightly-edited
  // clips. The fingerprint is the dHash recipe on the time axis:
  // decode the PCM, bucket samples into [[AudioFpSlices]] equal time
  // slices (position p → slice p·65/n, pure integer index arithmetic
  // — the q130 map), sum each slice (the loudness envelope for
  // unsigned PCM), and take the 64 envelope-gradient signs as bits:
  // bit i = [sum(i) < sum(i+1)]. Gradient signs survive level shifts
  // and small local edits that scatter a cryptographic hash — the
  // invariance a perceptual fingerprint promises, proven by planted
  // twins whose +1/−1 SAME-SLICE perturbation provably preserves
  // every slice sum. Exact integer arithmetic end to end, replayable
  // by any engine over the source text bytes.

  /** Time slices of the audio fingerprint (64 comparison bits). */
  val AudioFpSlices = 65

  /** Oracle-contract bounds for [[audioFingerprint]]: below 65
    * samples the 65-slice grid has empty slices (no stable gradient
    * structure — excluded from the corpus on BOTH sides); above 4096
    * the oracle's position-range unroll would truncate (loud, the
    * SsspOracleRounds contract style). */
  val AudioFpMinLen = 65
  val AudioFpMaxLen = 4096

  /** 64-bit perceptual fingerprint over decoded PCM samples. */
  def audioFingerprint(samples: Array[Byte]): Long = {
    val n = samples.length
    require(n >= AudioFpMinLen && n <= AudioFpMaxLen,
      s"clip length $n outside the fingerprint contract " +
        s"[$AudioFpMinLen, $AudioFpMaxLen]")
    val sums = new Array[Long](AudioFpSlices)
    var p = 0
    while (p < n) {
      sums((p.toLong * AudioFpSlices / n).toInt) += (samples(p) & 0xFF)
      p += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) < sums(i + 1)) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** Synthetic Hamming gadget clip: 520 samples, slice k (= 8
    * consecutive samples) at value 32+k — a strictly rising envelope,
    * all 64 bits set. Variant j ∈ 1..3 lowers the ODD slices 1, 3, …,
    * 2j−1 by one unit: bit 2r (r < j) compares 8·(32+2r) <
    * 8·(31+2r+1) = equal → flips to 0, while bits 2r±1 compare
    * across unchanged gaps — so hamming(base, variant j) = j BY
    * CONSTRUCTION (non-adjacent bits, independent flips). */
  private[sources] def syntheticClip(variant: Int): Array[Byte] = {
    val content = Array.tabulate(520) { p =>
      val k = p / 8
      val lowered = k % 2 == 1 && k <= 2 * variant - 1
      (32 + k - (if (lowered) 1 else 0)).toByte
    }
    WavCodec.encode(content, AudioRate)
  }

  /** The fixture audio corpus (clips within the fingerprint length
    * contract) plus two planted families, mirroring
    * [[imagesWithPlanted]]:
    *
    *  - IDENTICAL-fingerprint twins (ids + [[PlantOffset]]): for every
    *    10th audio doc, a copy with byte 0 incremented and byte 1
    *    decremented — both positions land in slice 0 (n ≥ 66 ⇒
    *    65/n < 1), so every slice SUM is unchanged and the
    *    fingerprint is provably identical while the samples differ.
    *  - HAMMING-j quads (ids 2·[[PlantOffset]] + 4k + j): per every
    *    60th doc id k ≡ 1 (mod 60), the [[syntheticClip]] gadget at
    *    variants 0..3 — deterministic distinct-fingerprint pairs at
    *    Hamming exactly 1, 2, 3. */
  def audiosWithPlanted(t: Tables): Dataset[MediaRow] = {
    import t.spark.implicits._
    val base = t.documents
      .filter($"doc_id" % 3 === 1 &&
        length($"text").between(AudioFpMinLen, AudioFpMaxLen))
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, "audio", WavCodec.encode(
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8), AudioRate), 0)
      }
    val twins = t.documents
      .filter($"doc_id" % 30 === 1 &&
        length($"text").between(AudioFpMinLen, AudioFpMaxLen))
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        if (content.length >= 66) {
          content(0) = (content(0) + 1).toByte
          content(1) = (content(1) - 1).toByte
        }
        MediaRow(id + PlantOffset, "audio", WavCodec.encode(content, AudioRate), 0)
      }
    val gadgets = t.documents.filter($"doc_id" % 60 === 1)
      .select($"doc_id").as[Long]
      .flatMap { k =>
        (0 to 3).map(j =>
          MediaRow(2 * PlantOffset + 4 * k + j, "audio", syntheticClip(j), 0))
      }
    base.union(twins).union(gadgets)
  }

  /** Decode + fingerprint the planted audio corpus (shared by
    * q183/q184) — partition-local decode, no shuffle until the agg. */
  private def fingerprintedAudios(t: Tables): DataFrame = {
    import t.spark.implicits._
    audiosWithPlanted(t)
      .map { m =>
        val (_, samples) = WavCodec.decode(m.bytes)
        (m.media_id, audioFingerprint(samples))
      }
      .toDF("id", "h")
  }

  /** q183: exact-duplicate audio cohorts — [[imageDupCohorts]]'s
    * contract over the audio fingerprint; every planted
    * slice-sum-preserving twin lands in its original's cohort. */
  def audioDupCohorts(t: Tables): DataFrame =
    dupCohortsOver(fingerprintedAudios(t))

  /** q184: perceptual audio NEAR-dup pairs at distinct-fingerprint
    * granularity — banding + exact Hamming verify, 1 ≤ h ≤ 3, with
    * cohort sizes as multiplicities; the gadget quads guarantee
    * deterministic rows at Hamming exactly 1, 2, 3 at every SF. */
  def audioNearDups(t: Tables, maxHamming: Int = 3): DataFrame =
    nearDupsOver(fingerprintedAudios(t), maxHamming)

  // ── q190/q191: perceptual VIDEO near-dup (temporal-majority dHash) ──
  // The video member completes the perceptual family (images q164/
  // q165, audio q183/q184): per SAMPLED frame (the q121 1-fps map,
  // reading the real parsed payloads) the q164 dHash, then TEMPORAL
  // MAJORITY POOLING — fingerprint bit i is set iff a strict majority
  // of sampled frames set it. Pooling is what makes the hash a VIDEO
  // hash: a single edited/corrupted frame cannot flip a bit the rest
  // of the clip agrees on (the spec proves it), while a re-encoded or
  // lightly-edited copy keeps the majority everywhere. Exact integer
  // arithmetic end to end (integer resample map, integer majority
  // threshold), replayable by any engine over the source text bytes.

  /** Oracle-contract bounds: the replay unrolls ≤ 8 frame indices
    * (len ≤ 4096 over the ≥ 512-pixel minimum frame keeps every
    * fixture clip inside); [[videoFingerprint]] is loud past it. */
  val VideoFpMinLen = 65
  val VideoFpMaxLen = 4096
  private val VideoFpMaxFrames = 8

  /** 64-bit perceptual fingerprint over a Y4M container: per-sampled-
    * frame dHash, bitwise strict-majority pool (ties → 0). */
  def videoFingerprint(bytes: Array[Byte]): Long = {
    val v = Y4mCodec.decode(bytes)
    val frames = Y4mCodec.sampleOneFps(v)
    require(v.frames.length <= VideoFpMaxFrames,
      s"clip has ${v.frames.length} frames, outside the fingerprint " +
        s"contract (oracle unrolls $VideoFpMaxFrames)")
    val counts = new Array[Int](64)
    frames.foreach { f =>
      val h = dhash64(v.width, v.height, f)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1
        i += 1
      }
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (2 * counts(i) > frames.length) fp |= 1L << i
      i += 1
    }
    fp
  }

  /** The 512-byte Hamming-gadget payload shared with the image path:
    * rows of the 32..95 column ramp; variant j zeroes (r < j, x = 28),
    * the one byte thumbnail cell (r, 4) samples — flipping exactly
    * comparison bit (r, 3). */
  private[sources] def gadgetRamp(variant: Int): Array[Byte] =
    Array.tabulate(512) { i =>
      val r = i / 64
      val x = i % 64
      if (x == 28 && r < variant) 0.toByte else (32 + x).toByte
    }

  /** Synthetic video gadget: ONE 64×8 frame of [[gadgetRamp]] — the
    * majority pool of a single frame IS its dHash, so the quad plants
    * video-fingerprint pairs at Hamming exactly 1, 2, 3. */
  private[sources] def syntheticVideoClip(variant: Int): Array[Byte] =
    Y4mCodec.encode(gadgetRamp(variant), 64, 8, 1)

  /** The fixture video corpus (clips within the fingerprint length
    * contract) plus the two planted families, mirroring
    * [[imagesWithPlanted]]/[[audiosWithPlanted]]:
    *
    *  - IDENTICAL-fingerprint twins (ids + [[PlantOffset]]): for every
    *    10th video doc, a copy with byte 1 incremented. Global
    *    position 1 is sampled by NO thumbnail cell of ANY frame
    *    (in-frame sample columns are multiples of w/9 ≥ 3; later
    *    frames start at ≥ w·h > 1), so every sampled pixel — hence
    *    every frame hash, hence the majority pool — is provably
    *    unchanged while the payload differs.
    *  - HAMMING-j quads (ids 2·[[PlantOffset]] + 4k + j): per every
    *    60th doc id k ≡ 2 (mod 60), [[syntheticVideoClip]] variants
    *    0..3 — deterministic distinct-fingerprint pairs at Hamming
    *    exactly 1, 2, 3. */
  def videosWithPlanted(t: Tables): Dataset[MediaRow] = {
    import t.spark.implicits._
    val base = t.documents
      .filter($"doc_id" % 3 === 2 &&
        length($"text").between(VideoFpMinLen, VideoFpMaxLen))
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        MediaRow(id, "video", Y4mCodec.encode(
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          videoWidth(id), videoHeight(id), videoFps(id)), 0)
      }
    val twins = t.documents
      .filter($"doc_id" % 30 === 2 &&
        length($"text").between(VideoFpMinLen, VideoFpMaxLen))
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        content(1) = (content(1) + 1).toByte
        MediaRow(id + PlantOffset, "video", Y4mCodec.encode(content,
          videoWidth(id), videoHeight(id), videoFps(id)), 0)
      }
    val gadgets = t.documents.filter($"doc_id" % 60 === 2)
      .select($"doc_id").as[Long]
      .flatMap { k =>
        (0 to 3).map(j =>
          MediaRow(2 * PlantOffset + 4 * k + j, "video",
            syntheticVideoClip(j), 0))
      }
    base.union(twins).union(gadgets)
  }

  /** Decode + fingerprint the planted video corpus (shared by
    * q190/q191) — partition-local decode, no shuffle until the agg. */
  private def fingerprintedVideos(t: Tables): DataFrame = {
    import t.spark.implicits._
    videosWithPlanted(t)
      .map(m => (m.media_id, videoFingerprint(m.bytes)))
      .toDF("id", "h")
  }

  /** q190: exact-duplicate video cohorts — [[imageDupCohorts]]'s
    * contract over the temporal-majority fingerprint; every planted
    * unsampled-byte twin lands in its original's cohort. */
  def videoDupCohorts(t: Tables): DataFrame =
    dupCohortsOver(fingerprintedVideos(t))

  /** q191: perceptual video NEAR-dup pairs at distinct-fingerprint
    * granularity — banding + exact Hamming verify, 1 ≤ h ≤ 3; the
    * gadget quads guarantee deterministic rows at Hamming exactly
    * 1, 2, 3 at every SF. */
  def videoNearDups(t: Tables, maxHamming: Int = 3): DataFrame =
    nearDupsOver(fingerprintedVideos(t), maxHamming)

  /** q34: media ANN — nearest media by cosine over decoded embeddings
    * for 3 probe items (composes the multimodal path with the
    * similarity operators). */
  def mediaKnn(t: Tables): DataFrame = {
    import t.spark.implicits._
    import graft.functions.SimilarityFunctions.cosine
    val feats = extractFeatures(mediaFromDocuments(t)).toDF()
      .select($"media_id", $"embedding")
    val probes = feats.filter($"media_id" < 3)
      .select($"media_id".as("probe_id"), $"embedding".as("probe_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"probe_id").orderBy($"cos_sim".desc, $"media_id")
    feats.join(broadcast(probes), $"media_id" =!= $"probe_id")
      .select($"probe_id", $"media_id",
        cosine($"probe_emb", $"embedding").as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .orderBy($"probe_id", $"rank")
  }
}
