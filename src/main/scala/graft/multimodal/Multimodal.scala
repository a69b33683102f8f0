package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed metadata carried alongside an opaque media payload. */
case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)

/** One multimodal record: media as an opaque binary column plus
  * typed metadata — the lakehouse-native representation for
  * image/audio/video at 100 TB (payloads stay in parquet binary
  * columns or are pointers into object storage; metadata is
  * columnar and prunable). */
case class MediaRecord(doc_id: Long, modality: String,
                       payload: Array[Byte], meta: MediaMeta)

/** Extracted features for one record. `feat` stands in for a model
  * embedding; its computation is the STUB (see decodeStub). */
case class MediaFeatures(doc_id: Long, modality: String, n_bytes: Int,
                         payload_crc: Long, feat: Array[Float])

/** m33: multimodal binary-column plumbing.
  *
  * The Spark-side mechanics are real and tested: a typed
  * `Dataset[MediaRecord]` with a binary payload column, batched
  * per-partition decoding via `mapPartitions` (the Scala analog of
  * `mapInPandas` — the iterator is processed in fixed-size batches
  * exactly as an Arrow batch UDF would be), and a columnar feature
  * output. The decode itself is a clearly-marked deterministic stub
  * because no image/audio codec libraries exist in this container.
  *
  * Scale notes: decoding is a pure per-partition map — no shuffle,
  * scales linearly with executors. Batch size bounds peak memory
  * per task (batch × payload size). At 100 TB, payloads larger than
  * a few MB move out of the row into object-store pointers and the
  * decode step fetches per batch.
  */
object Multimodal {

  val BatchSize = 64

  /** Deterministic fake media table derived from `documents`:
    * payload = utf-8 text bytes standing in for media bytes,
    * modality cycles image/audio/video, metadata derived from
    * doc_id/length so every field is reproducible. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"),
        struct(
          element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
            (col("doc_id") % 3 + 1).cast("int")).as("mime"),
          (col("n_chars") % 1920).cast("int").as("width"),
          (col("n_chars") % 1080).cast("int").as("height"),
          (col("n_chars") * 100).as("durationMs")).as("meta"))
      .as[MediaRecord]
  }

  /** STUB — the real implementation would decode image/audio/video
    * bytes with a codec library and run a feature extractor. Here:
    * a deterministic 8-dim projection of the payload bytes (strided
    * byte sums) + a CRC, so tests can pin exact values. The
    * *signature and batch shape* are the real contract. */
  private def decodeStub(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
    batch.map { r =>
      val crc = new java.util.zip.CRC32()
      crc.update(r.payload)
      val feat = Array.tabulate(8) { j =>
        var s = 0L
        var i = j
        while (i < r.payload.length) { s += r.payload(i) & 0xff; i += 8 }
        s.toFloat / math.max(r.payload.length, 1)
      }
      MediaFeatures(r.doc_id, r.modality, r.payload.length, crc.getValue, feat)
    }

  /** Batched per-partition decode: iterator → fixed-size batches →
    * decode → flat iterator (mapInPandas-shaped, typed). */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.grouped(BatchSize).flatMap(decodeStub))
  }

  /** m33 queries entry: features for every media record. The typed
    * API keeps `feat: Array[Float]`; the driver-facing frame renders
    * it as JSON because the driver's pandas compare can't sort/hash
    * array cells (round-1 harness crash). */
  def m33Multimodal(s: SparkSession, dir: String): DataFrame =
    decodeFeatures(mediaTable(s, dir)).toDF()
      .withColumn("feat", to_json(col("feat")))

  /** STUB resize — the real implementation decodes, scales with a
    * codec, re-encodes. Here: deterministic byte truncation scaled
    * by target area, with metadata rewritten. The contract (typed
    * in/out, pure projection, metadata stays consistent with
    * payload) is what downstream code depends on. */
  def resize(ds: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      if (r.modality != "image") r
      else {
        val srcArea = math.max(r.meta.width * r.meta.height, 1)
        val frac = math.min(1.0, (w.toLong * h).toDouble / srcArea)
        val n = math.max(1, (r.payload.length * frac).toInt)
        r.copy(
          payload = r.payload.take(n),
          meta = r.meta.copy(width = w, height = h))
      }
    }
  }

  /** One sampled frame of a video payload. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_ms: Long,
                   frame_payload: Array[Byte])

  /** STUB frame sampling — real impl seeks the container and decodes
    * keyframes. Here: one frame per `everyMs` of metadata duration,
    * payload sliced deterministically per frame. Row explosion
    * (1 video → N frames) and ordering are the real contract. */
  def sampleFrames(ds: Dataset[MediaRecord], everyMs: Long): Dataset[Frame] = {
    import ds.sparkSession.implicits._
    ds.filter(_.modality == "video").flatMap { r =>
      val n = math.max(1, (r.meta.durationMs / everyMs).toInt)
      val chunk = math.max(1, r.payload.length / n)
      (0 until n).map { i =>
        Frame(r.doc_id, i, i * everyMs,
          r.payload.slice(i * chunk, math.min((i + 1) * chunk, r.payload.length)))
      }
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m33_multimodal" -> (m33Multimodal _))

  def oracles: Map[String, String] = Map.empty
}
