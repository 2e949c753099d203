package graft.sources

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal columns: media as opaque `binary` payloads with typed
  * metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * Spark-side plumbing is real: schema (binary payload + metadata
  * struct), partition-parallel `mapPartitions` decode with batch
  * iteration, and hash-projected embedding vectors that feed straight
  * into the Similarity operators. The DECODE ITSELF IS A DETERMINISTIC
  * FAKE — no image/audio codecs exist in this environment — clearly
  * marked below; swapping `FakeCodec` for a real JNI/codec call is the
  * only change needed at 100 TB.
  *
  * Media payloads are derived deterministically from the `documents`
  * fixture (doc text bytes = payload) so every stage is reproducible
  * across runs and engines.
  */
object Multimodal {

  val EmbeddingDim = 16

  /** Typed media row: payload + metadata, the schema a real ingest
    * would carry (kind ∈ {image, audio, video}). */
  final case class MediaRow(
      media_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sample_rate: Int, duration_ms: Int)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, frames_sampled: Int,
      embedding: Array[Float])

  /** ============ DETERMINISTIC FAKE CODEC (STUB) ============
    * Stands in for libjpeg/ffmpeg-style decode: derives pseudo pixel
    * statistics and a hash-projected embedding from the raw bytes.
    * Deterministic in the payload alone. */
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

  /** Build the deterministic media table from `documents`: payload =
    * UTF-8 text bytes; metadata derived from doc_id. */
  def mediaFromDocuments(t: Tables): Dataset[MediaRow] = {
    import t.spark.implicits._
    t.documents.select($"doc_id", $"text").as[(Long, String)].map { case (id, text) =>
      val kind = (id % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      MediaRow(id, kind, bytes,
        width = 64 + (id % 16).toInt * 16, height = 64 + (id % 9).toInt * 16,
        sample_rate = if (kind == "audio") 16000 else 0,
        duration_ms = 1000 + (id % 30).toInt * 1000)
    }
  }

  /** Decode + feature-extract, partition-parallel. `mapPartitions`
    * (not per-row UDF) so a real codec could amortize per-batch init
    * (decoder contexts, native buffers) across the partition — the
    * Scala analogue of arrow-batched Python UDFs. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would go here (codec handles, buffers)
      rows.map { m =>
        MediaFeatures(
          media_id = m.media_id, kind = m.kind, n_bytes = m.bytes.length,
          width = m.width, height = m.height,
          frames_sampled = FakeCodec.frameCount(m.kind, m.duration_ms),
          embedding = FakeCodec.decodeEmbedding(m.bytes, EmbeddingDim))
      }
    }
  }

  /** "Resize": recompute features at a target resolution — metadata
    * transform + re-extract, demonstrating the derived-column flow. */
  def resized(features: Dataset[MediaFeatures], maxDim: Int): DataFrame = {
    import features.sparkSession.implicits._
    features.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height"))))
      .withColumn("out_width", (col("width") * col("scale")).cast("int"))
      .withColumn("out_height", (col("height") * col("scale")).cast("int"))
      .drop("scale")
  }

  /** q33: per-kind media profile over decoded features. */
  def mediaProfile(t: Tables): DataFrame = {
    import t.spark.implicits._
    resized(extractFeatures(mediaFromDocuments(t)), maxDim = 256)
      .groupBy($"kind")
      .agg(
        count(lit(1)).as("n_media"),
        sum($"n_bytes").as("total_bytes"),
        sum($"frames_sampled").as("total_frames"),
        min($"out_width").as("min_w"), max($"out_width").as("max_w"))
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
