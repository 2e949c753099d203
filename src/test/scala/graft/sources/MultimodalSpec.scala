package graft.sources

import graft.SparkSpec
import graft.sources.Multimodal.{BmpCodec, WavCodec, Y4mCodec}

/** The multimodal decode is genuinely byte-level for image, audio,
  * AND video: geometry, sample rate, and frame rate come out of the
  * container's binary layout, round-trip exactly, and malformed
  * headers fail decode. */
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

  test("Y4M round-trip: header drives the parse, frames carry the content") {
    val y4m = Y4mCodec.encode(content, width = 20, height = 10, fps = 3)
    // genuine layout: ASCII header line, then FRAME-delimited planes
    val header = new String(y4m.takeWhile(_ != '\n'.toByte), "US-ASCII")
    assert(header === "YUV4MPEG2 W20 H10 F3:1 Ip A1:1 Cmono")
    val v = Y4mCodec.decode(y4m)
    assert((v.width, v.height, v.fpsNum, v.fpsDen) === (20, 10, 3, 1))
    assert(v.frames.length === 5, "1000 bytes / 200-byte frames")
    assert(v.frames.flatten.take(content.length).toSeq === content.toSeq)
    assert(v.frames.flatten.drop(content.length).forall(_ == 0), "last frame zero-fills")
    // ~1 fps sampling reads every fps-th ACTUAL frame payload
    val sampled = Y4mCodec.sampleOneFps(v)
    assert(sampled.length === 2, "ceil(5 frames / 3 fps)")
    assert(sampled(0).toSeq === v.frames(0).toSeq)
    assert(sampled(1).toSeq === v.frames(3).toSeq)
    // the spec allows FRAME markers to carry parameters — the chunk
    // walk must honor the marker's own newline, not a fixed offset
    val withParams = new String(y4m, "ISO-8859-1")
      .replaceFirst("FRAME\n", "FRAME Xparam\n").getBytes("ISO-8859-1")
    val decoded2 = Y4mCodec.decode(withParams)
    assert(decoded2.frames.length === 5)
    assert(decoded2.frames(0).toSeq === v.frames(0).toSeq)
  }

  test("Y4M malformed headers fail decode instead of producing garbage") {
    val y4m = Y4mCodec.encode(content, width = 20, height = 10, fps = 3)
    val badMagic = y4m.clone(); badMagic(0) = 'X'.toByte
    assertThrows[IllegalArgumentException](Y4mCodec.decode(badMagic))
    // non-numeric width in the header
    val badW = new String(y4m, "ISO-8859-1")
      .replaceFirst("W20", "Wxx").getBytes("ISO-8859-1")
    assertThrows[IllegalArgumentException](Y4mCodec.decode(badW))
    // unsupported colorspace
    val badC = new String(y4m, "ISO-8859-1")
      .replaceFirst("Cmono", "C420j").getBytes("ISO-8859-1")
    assertThrows[IllegalArgumentException](Y4mCodec.decode(badC))
    // truncated last frame
    assertThrows[IllegalArgumentException](
      Y4mCodec.decode(y4m.take(y4m.length - 1)))
    // geometry claiming more bytes than the file holds
    val badGeom = new String(y4m, "ISO-8859-1")
      .replaceFirst("H10", "H9999").getBytes("ISO-8859-1")
    assertThrows[IllegalArgumentException](Y4mCodec.decode(badGeom))
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
      case _ => // video: geometry parsed back from the Y4M header
        assert(f.width === 32 + (f.media_id % 8).toInt * 16)
        assert(f.height === 16 + (f.media_id % 4).toInt * 16)
        assert(f.sample_rate === 0 && f.frames_sampled >= 1)
    }
    // embeddings stay nonzero-dimensional for the similarity stage
    assert(feats.forall(_.embedding.length === Multimodal.EmbeddingDim))
  }

  test("audio features: exact integer signal math, frame argmax, container round-trip") {
    def wav(s: Array[Byte]) = WavCodec.encode(s, 16000)
    // alternating 100/200, n=6: dev_i = 6·s_i − 900 = ∓300 → 5 strict
    // sign flips, peak 300, energy 6·300², single 64-sample frame
    val alt = Multimodal.wavFeatures(wav(Array[Byte](100, -56, 100, -56, 100, -56))) // -56 = 200 unsigned
    assert(alt.nSamples === 6 && alt.nFrames === 1)
    assert(alt.meanCrossings === 5 && alt.peakDev === 300)
    assert(alt.totalEnergy === 6L * 300 * 300)
    assert(alt.loudestFrame === 0 && alt.loudestEnergy === alt.totalEnergy)
    // constant signal: zero deviation everywhere
    val const = Multimodal.wavFeatures(wav(Array.fill[Byte](10)(42)))
    assert(const.totalEnergy === 0 && const.meanCrossings === 0 && const.peakDev === 0)
    // independent reference over a 200-sample pseudorandom signal
    // (4 frames): recompute with BigInt + functional code, no shared
    // arithmetic with the production while-loop
    val sig = Array.tabulate[Byte](200)(i => ((i * 131 + 17) % 251).toByte)
    val got = graft.api.Graft.audioFeatures(wav(sig))
    val n = sig.length
    val us = sig.map(b => BigInt(b & 0xFF))
    val total = us.sum
    val dev = us.map(v => BigInt(n) * v - total)
    assert(got.totalEnergy === dev.map(d => d * d).sum)
    assert(got.peakDev === dev.map(_.abs).max)
    assert(got.meanCrossings ===
      dev.sliding(2).count(p => p(0).signum * p(1).signum == -1))
    val frames = dev.grouped(Multimodal.AudioFrame).map(_.map(d => d * d).sum).toVector
    assert(got.nFrames === frames.length)
    assert(got.loudestEnergy === frames.max)
    assert(got.loudestFrame === frames.indexOf(frames.max))
    // end-to-end q131 at sf0.001: every audio doc's row matches an
    // independent recompute from the document text bytes
    import spark.implicits._
    val rows = Multimodal.audioFeatures(sf001).collect()
    val docs = sf001.documents.select($"doc_id", $"text").as[(Long, String)]
      .collect().filter(_._1 % 3 == 1).toMap
    assert(rows.length === docs.size && rows.nonEmpty)
    for (r <- rows.take(20)) {
      val bytes = docs(r.getLong(0)).getBytes("US-ASCII")
      val m = bytes.length
      val t2 = bytes.map(b => BigInt(b & 0xFF)).sum
      val dv = bytes.map(b => BigInt(m) * BigInt(b & 0xFF) - t2)
      assert(r.getLong(2) === m.toLong, "n_samples")
      assert(r.getLong(4) === dv.map(d => d * d).sum, "total_energy")
      assert(r.getLong(5) ===
        dv.sliding(2).count(p => p(0).signum * p(1).signum == -1).toLong,
        "mean_crossings")
    }
  }

  test("nearest-neighbor resize: identity, exact index mapping, geometry guard") {
    // 4x2 grid with distinct bytes
    val px = Array.tabulate[Byte](8)(i => (i + 1).toByte)
    // identity: same target geometry returns the same pixels
    assert(Multimodal.resizeNearest(4, 2, px, 4, 2).toSeq === px.toSeq)
    // 2x1 downscale: out(0,0)=src(0,0)=1, out(0,1)=src(0,2)=3
    assert(Multimodal.resizeNearest(4, 2, px, 2, 1).toSeq === Seq[Byte](1, 3))
    // 8x4 upscale replicates each source pixel 2x2
    val up = Multimodal.resizeNearest(4, 2, px, 8, 4)
    assert(up.length === 32)
    for (y <- 0 until 4; x <- 0 until 8)
      assert(up(y * 8 + x) === px((y / 2) * 4 + (x / 2)), s"($x,$y)")
    intercept[IllegalArgumentException] {
      Multimodal.resizeNearest(4, 2, px, 0, 2)
    }
    // end-to-end through the BMP container (the q130 path)
    val bmp = Multimodal.BmpCodec.encode("abcdefgh".getBytes("US-ASCII"), 4)
    val (w, h, out) = graft.api.Graft.resizeBmp(bmp, 2, 1)
    assert((w, h) === ((4, 2)))
    assert(out.toSeq === Seq('a'.toByte, 'c'.toByte))
  }
}
