package graft.sources

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal columns: media as opaque `binary` payloads with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * The image and audio paths are REAL byte-level container work: the
  * ingest synthesizes valid BMP (BITMAPFILEHEADER + BITMAPINFOHEADER +
  * palette + pixel rows) and WAV (RIFF/fmt/data chunk walk) files from
  * the fixture bytes, and the decode stage parses width / height /
  * sample rate / duration OUT OF THE ACTUAL BINARY LAYOUT — malformed
  * headers fail decode (spec-asserted). Both are public, documented
  * formats simple enough to parse dependency-free.
  *
  * What remains deterministic-fake, clearly declared: the VIDEO path
  * (no trivial public container; payload stays opaque bytes with
  * manifest metadata and 1-fps fake frame sampling) and the embedding
  * itself ([[FakeCodec.decodeEmbedding]] hash-projects the decoded
  * body — it stands in for a vision/audio model, not for the codec).
  *
  * Media payloads derive deterministically from the `documents`
  * fixture (text bytes = pixel/sample content) so every stage is
  * reproducible across runs and engines.
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

  /** ====== DETERMINISTIC FAKE (declared): model + video stubs ======
    * `decodeEmbedding` hash-projects decoded body bytes into a dense
    * vector — the stand-in for a vision/audio embedding model.
    * `frameCount` is the video path's 1-fps fake frame sampler (no
    * trivial public video container to really parse). */
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
      case "video" => math.max(1, durationMs / 1000) // 1 fps sample
      case "audio" => math.max(1, durationMs / 5000)
      case _ => 1
    }
  }

  val AudioRate = 16000

  /** Image width manifest formula (multiple of 4 by construction, so
    * the 8bpp BMP rows need no padding). */
  private def imageWidth(id: Long): Int = 64 + (id % 16).toInt * 16

  /** Build the deterministic media table from `documents`: text bytes
    * become BMP pixels (image), WAV samples (audio), or an opaque
    * payload (video). */
  def mediaFromDocuments(t: Tables): Dataset[MediaRow] = {
    import t.spark.implicits._
    t.documents.select($"doc_id", $"text").as[(Long, String)].map { case (id, text) =>
      val content = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (id % 3) match {
        case 0 => MediaRow(id, "image", BmpCodec.encode(content, imageWidth(id)), 0)
        case 1 => MediaRow(id, "audio", WavCodec.encode(content, AudioRate), 0)
        case _ => MediaRow(id, "video", content,
          1000 + (id % 30).toInt * 1000) // manifest hint: fake sampler input
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
            MediaFeatures(m.media_id, m.kind, m.bytes.length, 0, 0, 0,
              FakeCodec.frameCount(m.kind, m.duration_ms),
              FakeCodec.decodeEmbedding(m.bytes, EmbeddingDim))
        }
      }
    }
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
