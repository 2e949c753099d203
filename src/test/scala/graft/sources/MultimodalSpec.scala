package graft.sources

import graft.SparkSpec
import graft.sources.Multimodal.{BmpCodec, WavCodec}

/** The multimodal decode is genuinely byte-level for image/audio:
  * geometry and sample rate come out of the container's binary
  * layout, round-trip exactly, and malformed headers fail decode. */
class MultimodalSpec extends SparkSpec {

  private val content = (0 until 1000).map(i => (i % 251).toByte).toArray

  test("BMP round-trip: header fields drive the parse, pixels carry the content") {
    val bmp = BmpCodec.encode(content, width = 80)
    // genuine layout: magic, little-endian size/geometry at fixed offsets
    assert(bmp(0) == 'B'.toByte && bmp(1) == 'M'.toByte)
    val buf = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.getInt(2) === bmp.length, "bfSize must equal the file length")
    assert(buf.getInt(18) === 80 && buf.getInt(22) === 13) // 1000/80 → 13 rows
    val (w, h, pixels) = BmpCodec.decode(bmp)
    assert((w, h) === (80, 13))
    assert(pixels.length === 80 * 13)
    assert(pixels.take(content.length).toSeq === content.toSeq)
    assert(pixels.drop(content.length).forall(_ == 0), "last row zero-fills")
  }

  test("WAV round-trip: chunk walk finds fmt/data; odd sizes pad to even boundaries") {
    val odd = content.take(333)
    val wav = WavCodec.encode(odd, 16000)
    assert(wav.length === 44 + 333 + 1, "odd data chunk pads one byte")
    val (rate, samples) = WavCodec.decode(wav)
    assert(rate === 16000)
    assert(samples.toSeq === odd.toSeq, "pad byte is NOT part of the data chunk")
  }

  test("malformed headers fail decode instead of producing garbage") {
    val bmp = BmpCodec.encode(content, width = 64)
    val badMagic = bmp.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](BmpCodec.decode(badMagic))
    val badGeom = bmp.clone()
    // corrupt biWidth to claim more pixels than the file holds
    java.nio.ByteBuffer.wrap(badGeom).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(18, 1 << 20)
    assertThrows[IllegalArgumentException](BmpCodec.decode(badGeom))
    val wav = WavCodec.encode(content, 16000)
    val badRiff = wav.clone(); badRiff(8) = 'X'.toByte
    assertThrows[IllegalArgumentException](WavCodec.decode(badRiff))
    val badChunk = wav.clone()
    // oversize the data chunk beyond the file end
    java.nio.ByteBuffer.wrap(badChunk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(40, Int.MaxValue)
    assertThrows[IllegalArgumentException](WavCodec.decode(badChunk))
  }

  test("decoded features at sf0.001: parsed geometry matches the manifest formulas") {
    import spark.implicits._
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(sf001)).collect()
    assert(feats.nonEmpty)
    for (f <- feats) f.kind match {
      case "image" =>
        assert(f.width === 64 + (f.media_id % 16).toInt * 16)
        assert(f.height >= 1 && f.sample_rate === 0)
      case "audio" =>
        assert(f.sample_rate === 16000 && f.width === 0)
      case _ =>
        assert(f.width === 0 && f.sample_rate === 0)
    }
    // embeddings stay nonzero-dimensional for the similarity stage
    assert(feats.forall(_.embedding.length === Multimodal.EmbeddingDim))
  }
}
