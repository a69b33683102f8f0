package graft

import org.apache.spark.sql.types._
import graft.multimodal.{MediaRecord, MediaMeta, Multimodal}

/** Pins the multimodal plumbing contract: schema, batch shape,
  * determinism, and exact stub-feature values. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table carries binary payload + typed metadata with the right schema") {
    val ds = Multimodal.mediaTable(spark, sfDir)
    val sch = ds.schema
    assert(sch("payload").dataType == BinaryType)
    assert(sch("meta").dataType.isInstanceOf[StructType])
    val meta = sch("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("mime", "width", "height", "durationMs"))
    val first = ds.filter(_.doc_id == 0L).head()
    assert(first.modality == "image" && first.meta.mime == "image/png")
    assert(new String(first.payload, "UTF-8").nonEmpty)
  }

  test("decodeFeatures is deterministic and exact on a known payload") {
    val rec = MediaRecord(7L, "image", "abcdefgh".getBytes("UTF-8"),
      MediaMeta("image/png", 8, 8, 800))
    val out = Multimodal.decodeFeatures(Seq(rec).toDS()).collect()
    assert(out.length == 1)
    val f = out(0)
    assert(f.n_bytes == 8)
    // strided byte sums over "abcdefgh": feat(j) = byte('a'+j)/8
    (0 until 8).foreach { j =>
      assert(math.abs(f.feat(j) - ('a' + j).toFloat / 8) < 1e-6)
    }
    val crc = new java.util.zip.CRC32()
    crc.update("abcdefgh".getBytes("UTF-8"))
    assert(f.payload_crc == crc.getValue)
  }

  test("decode runs per-partition in batches and preserves every record") {
    val n = 500
    val recs = (0 until n).map(i =>
      MediaRecord(i.toLong, "audio", s"payload-$i".getBytes("UTF-8"),
        MediaMeta("audio/wav", 0, 0, i.toLong)))
    val out = Multimodal.decodeFeatures(recs.toDS().repartition(7))
    assert(out.count() == n)
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      (0 until n).map(_.toLong))
  }

  test("resize rewrites image metadata + payload, leaves other modalities untouched") {
    val img = MediaRecord(1L, "image", Array.fill[Byte](100)(7),
      MediaMeta("image/png", 100, 100, 0))
    val aud = MediaRecord(2L, "audio", Array.fill[Byte](50)(3),
      MediaMeta("audio/wav", 0, 0, 5000))
    val out = Multimodal.resize(Seq(img, aud).toDS(), 10, 10)
      .collect().sortBy(_.doc_id)
    // 100x100 -> 10x10 = 1% of area: payload shrinks proportionally
    assert(out(0).meta.width == 10 && out(0).meta.height == 10)
    assert(out(0).payload.length == 1)
    assert(out(1).payload.length == 50 && out(1).meta.mime == "audio/wav")
  }

  test("frame sampling explodes each video into ordered frames covering the duration") {
    val vid = MediaRecord(5L, "video", (0 until 90).map(_.toByte).toArray,
      MediaMeta("video/mp4", 0, 0, 3000))
    val frames = Multimodal.sampleFrames(Seq(vid).toDS(), 1000L)
      .collect().sortBy(_.frame_idx)
    assert(frames.length == 3)
    assert(frames.map(_.frame_ms).toSeq == Seq(0L, 1000L, 2000L))
    assert(frames(0).frame_payload.toSeq == (0 until 30).map(_.toByte))
    assert(frames(2).frame_payload.toSeq == (60 until 90).map(_.toByte))
  }

  test("m33 queries entry returns one feature row per document") {
    val docs = Tables.documents(spark, sfDir).count()
    val feats = Multimodal.m33Multimodal(spark, sfDir)
    assert(feats.count() == docs)
    assert(feats.schema.fieldNames.toSeq ==
      Seq("doc_id", "modality", "n_bytes", "payload_crc", "feat"))
  }
}
