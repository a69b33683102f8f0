package graft

import org.apache.spark.sql.types._
import graft.multimodal.{AudioCodec, ImageCodec, VideoCodec, MediaRecord, MediaMeta, Multimodal}

/** Pins the multimodal plumbing contract: schema, batch shape,
  * determinism, exact stub-feature values, and the REAL BMP/PPM
  * decode (header parse + channel means + canonical pixel CRC). */
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
    assert(first.modality == "image" && first.meta.mime == "image/bmp")
    // image rows carry a genuine BMP container, not stand-in bytes
    assert(first.payload(0) == 'B' && first.payload(1) == 'M')
    val audio = ds.filter(_.doc_id == 1L).head()
    // audio rows carry a genuine RIFF/WAVE container, not stand-in bytes
    assert(audio.modality == "audio" &&
      new String(audio.payload.take(4), "US-ASCII") == "RIFF")
    val video = ds.filter(_.doc_id == 2L).head()
    // video rows carry a genuine YUV4MPEG2 container, not stand-in bytes
    assert(video.modality == "video" &&
      new String(video.payload.take(9), "US-ASCII") == "YUV4MPEG2")
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
      Seq("doc_id", "modality", "n_bytes", "payload_crc", "decoded_format",
        "width", "height", "pixel_crc", "sample_rate", "n_samples",
        "sample_crc", "n_frames", "fps_x1000", "feat"))
  }

  test("BMP decode: handcrafted 2x2 pixels round-trip with exact dims, means, and pixel CRC") {
    // four pixels with distinct channel values, so any BGR/RGB or
    // row-order slip changes the means or the CRC
    val rgb = Array[Byte](
      10, 20, 30,   40, 50, 60,   // row 0: (10,20,30) (40,50,60)
      70, 80, 90,  100, 110, 120) // row 1
    val img = ImageCodec.decode(ImageCodec.encodeBmp(2, 2, rgb)).get
    assert(img.format == "bmp" && img.width == 2 && img.height == 2)
    assert(img.meanR == (10 + 40 + 70 + 100) / 4.0)
    assert(img.meanG == (20 + 50 + 80 + 110) / 4.0)
    assert(img.meanB == (30 + 60 + 90 + 120) / 4.0)
    val crc = new java.util.zip.CRC32()
    crc.update(rgb.take(6)); crc.update(rgb.drop(6)) // canonical row-major RGB
    assert(img.pixelCrc == crc.getValue)
  }

  test("BMP row padding: odd widths decode the same pixels as PPM of the same image") {
    // width 3 → BMP stride 12 (3 pad bytes/row); PPM has no padding.
    // Identical canonical pixel CRC proves the padding is skipped and
    // the bottom-up BGR layout is unwound correctly.
    for ((w, h) <- Seq((3, 2), (1, 1), (5, 3), (4, 2))) {
      val rgb = Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)
      val bmp = ImageCodec.decode(ImageCodec.encodeBmp(w, h, rgb)).get
      val ppm = ImageCodec.decode(ImageCodec.encodePpm(w, h, rgb)).get
      assert(bmp.width == w && bmp.height == h && ppm.width == w && ppm.height == h)
      assert(bmp.pixelCrc == ppm.pixelCrc, s"${w}x$h: format-dependent pixel CRC")
      assert(bmp.meanR == ppm.meanR && bmp.meanG == ppm.meanG && bmp.meanB == ppm.meanB)
    }
  }

  test("PPM comments and truncated/corrupt payloads: decode is total, never throws") {
    val rgb = Array.tabulate(12)(i => (i * 5).toByte)
    val withComment =
      "P6\n# a comment\n2 2\n# another\n255\n".getBytes("US-ASCII") ++ rgb
    assert(ImageCodec.decode(withComment).exists(i => i.width == 2 && i.height == 2))
    val bmp = ImageCodec.encodeBmp(2, 2, rgb)
    for (cut <- Seq(0, 1, 10, 53, bmp.length - 1)) // truncations incl. mid-header
      assert(ImageCodec.decode(bmp.take(cut)).isEmpty, s"truncated at $cut")
    assert(ImageCodec.decode("not an image at all".getBytes).isEmpty)
    assert(ImageCodec.decode("P6 9999999 9999999 255 ".getBytes).isEmpty,
      "dims larger than the payload must be rejected, not read out of bounds")
  }

  test("m33 pipeline decodes image rows for real: dims match metadata, CRC matches an independent recompute") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
      .collect()
    val images = feats.filter(_.modality == "image")
    assert(images.nonEmpty)
    images.foreach { f =>
      assert(f.decoded_format == "bmp", s"doc ${f.doc_id} not decoded")
      // recompute the expected pixels from the same doc_id derivation
      val w = 1 + (f.doc_id % 8).toInt
      val h = 1 + (f.doc_id % 6).toInt
      assert(f.width == w && f.height == h)
      val rgb = Array.tabulate(3 * w * h)(i => ((f.doc_id * 31 + i * 7) % 256).toByte)
      val crc = new java.util.zip.CRC32()
      crc.update(rgb)
      assert(f.pixel_crc == crc.getValue, s"doc ${f.doc_id} pixel CRC")
    }
    // cross-family sentinels: image rows carry no audio/video fields
    assert(feats.filter(_.modality == "image").forall(f =>
      f.sample_rate == -1 && f.n_samples == -1 && f.sample_crc == -1L &&
        f.n_frames == -1 && f.fps_x1000 == -1))
  }

  test("WAV decode: handcrafted samples round-trip with exact rate, count, rms, and sample CRC") {
    val samples = Array[Short](0, 100, -100, 32767, -32768)
    val wav = AudioCodec.encodeWav(8000, samples)
    val a = AudioCodec.decode(wav).get
    assert(a.format == "wav" && a.sampleRate == 8000 && a.nSamples == 5)
    // duration rounds to the NEAREST ms: a real 0.625 ms clip must
    // report 1, not truncate to 0 (indistinguishable from empty)
    assert(a.durationMs == 1L)
    val sumSq = samples.map(s => s.toDouble * s).sum
    assert(a.rms == math.sqrt(sumSq / 5))
    // CRC over the little-endian PCM bytes (the last 10 of the file)
    val crc = new java.util.zip.CRC32()
    crc.update(wav.drop(44))
    assert(a.sampleCrc == crc.getValue)
  }

  test("WAV corrupt/truncated payloads: decode is total, never throws") {
    val wav = AudioCodec.encodeWav(8000, Array[Short](1, 2, 3, 4))
    for (cut <- Seq(0, 3, 11, 20, 43, wav.length - 1))
      assert(AudioCodec.decode(wav.take(cut)).isEmpty, s"truncated at $cut")
    assert(AudioCodec.decode("RIFFxxxxWAVE then garbage".getBytes).isEmpty)
    // stereo and non-PCM format tags must be rejected
    val stereo = wav.clone(); stereo(22) = 2
    assert(AudioCodec.decode(stereo).isEmpty, "stereo must stay stub")
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(AudioCodec.decode(nonPcm).isEmpty, "non-PCM must stay stub")
    // a declared data size larger than the file must be rejected
    val overrun = wav.clone(); overrun(40) = 127
    assert(AudioCodec.decode(overrun).isEmpty, "data overrun must be rejected")
  }

  test("Y4M decode: handcrafted 2x2 frames round-trip with exact dims, count, means, and frame CRC") {
    // two 2x2 C420 frames (6 bytes each: 4 Y + 1 U + 1 V) with
    // distinct plane values, so any plane-order or size slip changes
    // the means or the CRC
    val f0 = Array[Byte](10, 20, 30, 40, 50, 60)
    val f1 = Array[Byte](70, 80, 90, 100, 110, 120)
    val y4m = VideoCodec.encodeY4m(2, 2, 25, 1, Seq(f0, f1))
    val v = VideoCodec.decode(y4m).get
    assert(v.format == "y4m" && v.width == 2 && v.height == 2)
    assert(v.fpsNum == 25 && v.fpsDen == 1 && v.nFrames == 2)
    assert(v.durationMs == 80L) // 2 frames at 25 fps
    assert(v.yMean == (10 + 20 + 30 + 40 + 70 + 80 + 90 + 100) / 8.0)
    assert(v.uMean == (50 + 110) / 2.0)
    assert(v.vMean == (60 + 120) / 2.0)
    val crc = new java.util.zip.CRC32()
    crc.update(f0); crc.update(f1)
    assert(v.frameCrc == crc.getValue)
    // the frame walk recovers the exact raw payloads, in order
    assert(VideoCodec.frames(y4m).get.map(_.toSeq) == Seq(f0.toSeq, f1.toSeq))
  }

  test("Y4M header variants: frame params, mono/444 colorspaces, fps rounding") {
    // FRAME params between marker and newline must be accepted
    val base = VideoCodec.encodeY4m(2, 2, 30, 1, Seq(Array[Byte](1, 2, 3, 4, 5, 6)))
    val withParams = new String(base, "ISO-8859-1")
      .replaceFirst("FRAME\n", "FRAME Ixyz\n").getBytes("ISO-8859-1")
    assert(VideoCodec.decode(withParams).exists(_.nFrames == 1))
    // Cmono: Y plane only, odd dims legal
    val mono = "YUV4MPEG2 W3 H1 F24:1 Cmono\nFRAME\n".getBytes("US-ASCII") ++
      Array[Byte](7, 8, 9)
    val m = VideoCodec.decode(mono).get
    assert(m.nFrames == 1 && m.yMean == 8.0 && m.uMean == 0.0)
    // C444: full-resolution chroma
    val c444 = "YUV4MPEG2 W1 H1 F24:1 C444\nFRAME\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3)
    assert(VideoCodec.decode(c444).exists(v => v.uMean == 2.0 && v.vMean == 3.0))
    // 30000:1001 NTSC: duration rounds to nearest ms (30 frames ≈ 1001 ms)
    val ntsc = VideoCodec.encodeY4m(2, 2, 30, 1,
      Seq.fill(3)(Array[Byte](0, 0, 0, 0, 0, 0)))
    val ntscHdr = new String(ntsc, "ISO-8859-1")
      .replaceFirst("F30:1", "F30000:1001").getBytes("ISO-8859-1")
    assert(VideoCodec.decode(ntscHdr).exists(_.durationMs == 100L))
  }

  test("Y4M corrupt/truncated payloads: decode is total, never throws") {
    val y4m = VideoCodec.encodeY4m(4, 2, 25, 1,
      Seq(Array.tabulate(12)(_.toByte), Array.tabulate(12)(i => (i + 50).toByte)))
    for (cut <- Seq(0, 5, 9, 20, y4m.length - 13, y4m.length - 1))
      assert(VideoCodec.decode(y4m.take(cut)).isEmpty, s"truncated at $cut")
    assert(VideoCodec.decode("not a video".getBytes).isEmpty)
    // odd dims are illegal for 4:2:0
    assert(VideoCodec.decode(
      "YUV4MPEG2 W3 H2 F25:1 C420\nFRAME\n   ".getBytes("ISO-8859-1")).isEmpty)
    // unknown colorspace must be rejected, not mis-sized
    assert(VideoCodec.decode(
      "YUV4MPEG2 W2 H2 F25:1 C411\nFRAME\n".getBytes ++ new Array[Byte](6)).isEmpty)
    // a non-FRAME marker where a frame should start must reject the
    // whole stream (fixture sanity first: the uncorrupted original
    // really has 2 frames and length-18 is the second marker's 'F')
    assert(VideoCodec.decode(y4m).get.nFrames == 2)
    val bad = y4m.clone(); bad(y4m.length - 18) = 'X'
    assert(VideoCodec.decode(bad).isEmpty, "corrupt FRAME marker must reject")
    // dims whose plane product overflows must be rejected up front
    assert(VideoCodec.decode(
      "YUV4MPEG2 W65536 H65536 F25:1 C420\nFRAME\n".getBytes).isEmpty)
  }

  test("Y4M property: random frames round-trip with recomputed plane means and CRC") {
    val rng = new scala.util.Random(77)
    for (_ <- 1 to 25) {
      val w = 2 * (1 + rng.nextInt(6))
      val h = 2 * (1 + rng.nextInt(5))
      val n = 1 + rng.nextInt(6)
      val fb = w * h * 3 / 2
      val frames = Seq.fill(n)(Array.fill(fb)(rng.nextInt(256).toByte))
      val v = VideoCodec.decode(VideoCodec.encodeY4m(w, h, 25, 1, frames)).get
      assert(v.width == w && v.height == h && v.nFrames == n)
      val y = frames.flatMap(_.take(w * h).map(_ & 0xff))
      val u = frames.flatMap(_.slice(w * h, w * h + fb / 6).map(_ & 0xff))
      val vv = frames.flatMap(_.drop(w * h + fb / 6).map(_ & 0xff))
      assert(v.yMean == y.sum.toDouble / y.length, s"${w}x$h n=$n yMean")
      assert(v.uMean == u.sum.toDouble / u.length)
      assert(v.vMean == vv.sum.toDouble / vv.length)
      val crc = new java.util.zip.CRC32()
      frames.foreach(crc.update)
      assert(v.frameCrc == crc.getValue)
      assert(VideoCodec.frames(VideoCodec.encodeY4m(w, h, 25, 1, frames))
        .get.map(_.toSeq) == frames.map(_.toSeq))
    }
  }

  test("m33 pipeline decodes video rows for real: fields match an independent recompute") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
      .collect()
    val video = feats.filter(_.modality == "video")
    assert(video.nonEmpty)
    video.foreach { f =>
      assert(f.decoded_format == "y4m", s"doc ${f.doc_id} not decoded")
      val w = 2 * (1 + (f.doc_id % 4).toInt)
      val h = 2 * (1 + (f.doc_id % 3).toInt)
      val nFrames = 1 + (f.doc_id % 5).toInt
      assert(f.width == w && f.height == h)
      assert(f.n_frames == nFrames && f.fps_x1000 == 25000)
      // decoded video carries no audio fields
      assert(f.sample_rate == -1 && f.n_samples == -1 && f.sample_crc == -1L)
      // recompute the frame bytes from the same doc_id derivation
      val crc = new java.util.zip.CRC32()
      (0 until nFrames).foreach { fr =>
        crc.update(Array.tabulate(w * h * 3 / 2)(i =>
          ((f.doc_id * 17 + fr * 59 + i * 13) % 256).toByte))
      }
      assert(f.pixel_crc == crc.getValue, s"doc ${f.doc_id} frame CRC")
    }
  }

  test("frame sampling on a REAL Y4M container emits true frames at true timestamps") {
    // 10 frames at 25 fps = 400 ms; sampling every 120 ms → frame
    // step = floor(120*25/1000) = 3 → frames 0,3,6,9 at their real
    // presentation times
    val frames10 = (0 until 10).map(f =>
      Array.tabulate(6)(i => (f * 10 + i).toByte))
    val y4m = VideoCodec.encodeY4m(2, 2, 25, 1, frames10)
    val rec = MediaRecord(9L, "video", y4m, MediaMeta("video/y4m", 2, 2, 400))
    val got = Multimodal.sampleFrames(Seq(rec).toDS(), 120L)
      .collect().sortBy(_.frame_idx)
    assert(got.length == 4)
    assert(got.map(_.frame_ms).toSeq == Seq(0L, 120L, 240L, 360L))
    assert(got(1).frame_payload.toSeq == frames10(3).toSeq)
    assert(got(3).frame_payload.toSeq == frames10(9).toSeq)
  }

  test("frame sampling tracks the tick grid on non-integer rates and never silently drops videos") {
    // NTSC 30000/1001 at everyMs=1000: frames-per-tick ≈ 29.97, so a
    // constant integer step drifts ~a frame per tick — the per-tick
    // floor must pick frame 29 at tick 1, 59 at tick 2, 89 at tick 3
    val frames90 = (0 until 90).map(f => Array.tabulate(6)(i => (f + i).toByte))
    val ntsc = new String(VideoCodec.encodeY4m(2, 2, 30, 1, frames90), "ISO-8859-1")
      .replaceFirst("F30:1", "F30000:1001").getBytes("ISO-8859-1")
    val got = Multimodal.sampleFrames(
      Seq(MediaRecord(1L, "video", ntsc, MediaMeta("video/y4m", 2, 2, 3003))).toDS(), 1000L)
      .collect().sortBy(_.frame_idx)
    assert(got.map(_.frame_payload.head.toInt).toSeq == Seq(0, 29, 59, 89))
    // header-valid but body-corrupt payloads fall back to the stub
    // slicing path — at least one frame row always comes out
    val corrupt = VideoCodec.encodeY4m(2, 2, 25, 1,
      Seq(Array.tabulate(6)(_.toByte))).dropRight(2)
    val fallback = Multimodal.sampleFrames(
      Seq(MediaRecord(2L, "video", corrupt, MediaMeta("video/y4m", 2, 2, 40))).toDS(), 1000L)
      .collect()
    assert(fallback.nonEmpty, "body-corrupt video must not vanish")
    // a crafted huge fpsNum must neither throw nor loop: totality
    val weird = "YUV4MPEG2 W2 H2 F2147483647:1 C420\nFRAME\n".getBytes("US-ASCII") ++
      new Array[Byte](6)
    val wOut = Multimodal.sampleFrames(
      Seq(MediaRecord(3L, "video", weird, MediaMeta("video/y4m", 2, 2, 1))).toDS(), 2000L)
      .collect()
    assert(wOut.length == 1, "first tick always lands on frame 0")
  }

  test("m33 pipeline decodes audio rows for real: fields match an independent recompute") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sfDir))
      .collect()
    val audio = feats.filter(_.modality == "audio")
    assert(audio.nonEmpty)
    audio.foreach { f =>
      assert(f.decoded_format == "wav", s"doc ${f.doc_id} not decoded")
      val n = 16 + (f.doc_id % 64).toInt
      assert(f.sample_rate == 8000 && f.n_samples == n)
      // decoded audio carries no image fields
      assert(f.width == -1 && f.height == -1 && f.pixel_crc == -1L)
      // recompute the PCM bytes from the same doc_id derivation
      val samples = Array.tabulate(n)(i =>
        ((f.doc_id * 131 + i.toLong * i * 7) % 32768).toShort)
      val pcm = new Array[Byte](2 * n)
      samples.indices.foreach { i =>
        pcm(2 * i) = samples(i).toByte
        pcm(2 * i + 1) = (samples(i) >> 8).toByte
      }
      val crc = new java.util.zip.CRC32()
      crc.update(pcm)
      assert(f.sample_crc == crc.getValue, s"doc ${f.doc_id} sample CRC")
    }
  }

  test("m34 content dedup: planted groups exact, keep-min, cross-container capture") {
    val out = Multimodal.m34MediaDedup(spark, sfDir)
      .select("doc_id", "modality", "decoded_format", "content_crc", "group_size", "keep")
      .as[(Long, String, String, Long, Long, Boolean)].collect()
    val ids = Tables.documents(spark, sfDir)
      .select("doc_id").as[Long].collect().toSet
    assert(out.map(_._1).toSet == ids, "one dedup row per media record")
    assert(!out.exists(_._3 == "stub"), "every planted payload must decode for real")
    // planted structure: content identity == doc_id % m34ContentMod,
    // so the expected group of a doc is exactly its residue class
    val expectedGroup = ids.groupBy(_ % 193L)
    out.foreach { case (id, _, _, _, size, keep) =>
      val grp = expectedGroup(id % 193L)
      assert(size == grp.size, s"doc $id: group_size $size != planted ${grp.size}")
      assert(keep == (id == grp.min), s"doc $id: keep-min violated")
    }
    // groups agree with the CONTENT key: same residue -> same crc,
    // different residue never collides (within a modality) on this corpus
    val byCrc = out.groupBy(r => (r._2, r._4)).values
    byCrc.foreach { grp =>
      assert(grp.map(_._1 % 193L).distinct.length == 1,
        s"content group mixes residues: ${grp.toSeq}")
    }
    // the cross-container story: at least one image group holds BOTH
    // a BMP and a PPM of the same pixels -- byte hashing (m33's
    // payload_crc) would split it, the decoded content key must not
    val cross = out.filter(_._2 == "image").groupBy(_._4).values
      .filter(g => g.map(_._3).distinct.sorted.toSeq == Seq("bmp", "ppm"))
    assert(cross.nonEmpty, "expected a mixed BMP/PPM content group")
    val mixed = cross.head.map(_._1).toSeq
    val byteCrcs = Multimodal.decodeFeatures(
        Multimodal.mediaTableWithDups(spark, sfDir))
      .filter(f => mixed.contains(f.doc_id)).collect().map(_.payload_crc)
    assert(byteCrcs.distinct.length > 1,
      "containers differ at byte level, so byte-hash dedup would have missed the pair")
  }

  test("m35 perceptual near-dup: planted groups complete, brightness invariance, pair uniqueness") {
    val pairs = SparkEntry.queries("m35_media_neardup")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    // contract: ordered pairs, bounded hamming, first-equal-band
    // uniqueness (each pair emitted from exactly one band)
    pairs.foreach { case (a, b, h) =>
      assert(a < b && h >= 0 && h <= 3, s"pair ($a,$b,$h) contract")
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length,
      "band join must emit each pair exactly once")
    // every planted same-content pair (all three variants share the
    // dHash by construction) must be found — banding loses nothing
    val found = pairs.map(p => (p._1, p._2)).toSet
    val ids = Multimodal.mediaTableNearImages(spark, sfDir)
      .select("doc_id").as[Long].collect()
    val byCid = ids.groupBy(_ % 40L)
    byCid.values.foreach { group =>
      val sorted = group.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        assert(found((sorted(i), sorted(j))),
          s"planted pair (${sorted(i)},${sorted(j)}) missed")
    }
    // the m35-over-m34 claim, proven on one concrete trio: same cid's
    // variant-0 (BMP base) and variant-2 (BMP +4 brightness) have
    // DIFFERENT pixels and pixel CRCs — m34's content key misses
    // them — but identical dHash (gradients unchanged)
    val cid = ids.min % 40L
    def payloadOf(variant: Long): Array[Byte] = {
      val (w, h, rgb) = Multimodal.m35Rgb(cid, if (variant == 2) 4 else 0)
      graft.multimodal.ImageCodec.encodeBmp(w, h, rgb)
    }
    val img0 = graft.multimodal.ImageCodec.decode(payloadOf(0)).get
    val img2 = graft.multimodal.ImageCodec.decode(payloadOf(2)).get
    assert(img0.pixelCrc != img2.pixelCrc,
      "brightness shift changes the content CRC (m34 key diverges)")
    assert(graft.multimodal.ImageCodec.decodeDHash(payloadOf(0)) ==
      graft.multimodal.ImageCodec.decodeDHash(payloadOf(2)),
      "dHash is brightness-shift invariant (m35 key holds)")
    // and container independence carries over from m34: BMP vs PPM of
    // the same pixels hash identically
    val (w, h, rgb) = Multimodal.m35Rgb(cid, 0)
    assert(graft.multimodal.ImageCodec.decodeDHash(
      graft.multimodal.ImageCodec.encodePpm(w, h, rgb)) ==
      graft.multimodal.ImageCodec.decodeDHash(payloadOf(0)))
  }

  test("m37 clip near-dup: planted groups complete, tint and brightness invariance, pair uniqueness") {
    val pairs = SparkEntry.queries("m37_video_neardup")(spark, sfDir)
      .as[(Long, Long, Int, Int, Double)].collect()
    assert(pairs.nonEmpty)
    // contract: ordered pairs, at least one matched frame, ratio ≥ ½
    pairs.foreach { case (a, b, m, t, r) =>
      assert(a < b && m >= 1 && m <= t && r >= 0.5, s"pair ($a,$b,$m,$t,$r) contract")
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length,
      "candidate distinct must emit each pair exactly once")
    // every planted same-content pair (all three variants share
    // every luma dHash by construction) must be found, and the
    // avalanched luma must keep different content ids apart
    val found = pairs.map(p => (p._1, p._2)).toSet
    val ids = Multimodal.mediaTableNearClips(spark, sfDir)
      .select("doc_id").as[Long].collect()
    val byCid = ids.groupBy(_ % Multimodal.m37ContentMod)
    byCid.values.foreach { group =>
      val sorted = group.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        assert(found((sorted(i), sorted(j))),
          s"planted pair (${sorted(i)},${sorted(j)}) missed")
    }
    found.foreach { case (a, b) =>
      assert(a % Multimodal.m37ContentMod == b % Multimodal.m37ContentMod,
        s"cross-content pair ($a,$b) — luma patterns not decorrelated")
    }
    // the m37-over-m34 claim on concrete frames: the re-tinted
    // (chroma-shifted) and re-leveled (+4 luma) variants change the
    // frame BYTES — any content CRC diverges — but no luma dHash
    val cid = ids.min % Multimodal.m37ContentMod
    def frameHashes(yb: Int, cs: Int): Seq[Long] = {
      val (w, h, frames) = Multimodal.m37Planes(cid, yb, cs)
      frames.map(f => graft.multimodal.ImageCodec.grayDHash(w, h, f).get)
    }
    val base = frameHashes(0, 0)
    assert(base == frameHashes(4, 0), "brightness shift changed a luma dHash")
    assert(base == frameHashes(0, 17), "chroma tint changed a luma dHash")
    assert(Multimodal.m37Planes(cid, 0, 0)._3.head.toSeq !=
      Multimodal.m37Planes(cid, 0, 17)._3.head.toSeq,
      "tint variant must differ at the byte level")
    assert(Multimodal.m37Planes(cid, 0, 0)._3.head.toSeq !=
      Multimodal.m37Planes(cid, 4, 0)._3.head.toSeq,
      "brightness variant must differ at the byte level")
  }

  test("m38 audio near-dup: planted groups complete, gain and DC invariance, pair uniqueness") {
    val pairs = SparkEntry.queries("m38_audio_neardup")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, h) =>
      assert(a < b && h >= 0 && h <= 3, s"pair ($a,$b,$h) contract")
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length,
      "band join must emit each pair exactly once")
    // every planted same-content pair (all three variants share the
    // fingerprint by construction) must be found; different content
    // ids must stay apart (avalanched window amplitudes)
    val found = pairs.map(p => (p._1, p._2)).toSet
    val ids = Multimodal.mediaTableNearAudio(spark, sfDir)
      .select("doc_id").as[Long].collect()
    ids.groupBy(_ % Multimodal.m38ContentMod).values.foreach { group =>
      val sorted = group.sorted
      for (i <- sorted.indices; j <- i + 1 until sorted.length)
        assert(found((sorted(i), sorted(j))),
          s"planted pair (${sorted(i)},${sorted(j)}) missed")
    }
    found.foreach { case (a, b) =>
      assert(a % Multimodal.m38ContentMod == b % Multimodal.m38ContentMod,
        s"cross-content pair ($a,$b)")
    }
    // the m38-over-m34 claim on concrete payloads: gain and DC edits
    // change the sample CRC, never the energy-delta fingerprint
    val cid = ids.min % Multimodal.m38ContentMod
    def wav(gs: Int, dc: Int): Array[Byte] =
      graft.multimodal.AudioCodec.encodeWav(8000, Multimodal.m38Samples(cid, gs, dc))
    val base = graft.multimodal.AudioCodec.energyDHash(wav(0, 0))
    assert(base.isDefined)
    assert(base == graft.multimodal.AudioCodec.energyDHash(wav(1, 0)),
      "gain halving changed the fingerprint")
    assert(base == graft.multimodal.AudioCodec.energyDHash(wav(0, 4)),
      "DC offset changed the fingerprint")
    val crc0 = graft.multimodal.AudioCodec.decode(wav(0, 0)).get.sampleCrc
    assert(crc0 != graft.multimodal.AudioCodec.decode(wav(1, 0)).get.sampleCrc &&
      crc0 != graft.multimodal.AudioCodec.decode(wav(0, 4)).get.sampleCrc,
      "edits must change the sample CRC (m34's key diverges)")
  }

  test("m38b: variant energies hash identically; output = all within-group pairs at Hamming 0") {
    // the invariance THEOREM, relationally: the exact-quarter (gain)
    // and constant-offset (DC) energy transforms preserve every
    // delta sign, so all three variants of a group share one hash
    val hashes = Multimodal.m38bHashFromEnergies(
      Multimodal.m38bEnergyLiterals(spark, sfDir))
      .as[(Long, Long)].collect()
    assert(hashes.length == 3 * Multimodal.m38ContentMod)
    hashes.foreach { case (_, h) => assert(h >= 0, "63-bit hash must stay positive") }
    hashes.groupBy(_._1 % Multimodal.m38ContentMod).values.foreach { g =>
      assert(g.length == 3 && g.map(_._2).distinct.length == 1,
        s"variants of a group must hash identically: $g")
    }
    // distinct groups stay apart (md5-derived energies decorrelate)
    assert(hashes.map(_._2).distinct.length == Multimodal.m38ContentMod.toInt)
    // the registered face: every within-group pair at Hamming 0,
    // nothing else — 3 pairs per content group
    val pairs = SparkEntry.queries("m38b_audio_oracle")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    assert(pairs.length == 3 * Multimodal.m38ContentMod)
    pairs.foreach { case (a, b, h) =>
      assert(a < b && h == 0 &&
        a % Multimodal.m38ContentMod == b % Multimodal.m38ContentMod,
        s"pair ($a,$b,$h) contract")
    }
    // the bit law matches the production decoder's: bit w = next
    // window strictly louder — checked against energyDHash on a real
    // WAV whose 65-window energies are read back independently
    val cid = 7L
    val wav = graft.multimodal.AudioCodec.encodeWav(
      8000, Multimodal.m38Samples(cid, 0, 0))
    val prod = graft.multimodal.AudioCodec.energyDHash(wav).get
    val samples = Multimodal.m38Samples(cid, 0, 0)
    val n = samples.length
    val e = Array.tabulate(65) { w =>
      (w * n / 65 until (w + 1) * n / 65)
        .map(i => samples(i).toLong * samples(i)).sum
    }
    val mirror = (0 until 64).map(b => if (e(b + 1) > e(b)) 1L << b else 0L).sum
    assert(prod == mirror, "energyDHash != independent energy-delta mirror")
  }

  test("m39 thumbnail match is exactly the planted image↔clip-group bipartite set") {
    val got = SparkEntry.queries("m39_thumbnail_match")(spark, sfDir)
      .as[(Long, Long, Int, Int)].collect().toSet
    assert(got.nonEmpty)
    // expected: every even image matches frame 0 of EVERY clip in
    // its content group (all three clip variants share the luma
    // hash), at Hamming 0; noise images match nothing
    val ids = Multimodal.mediaTableNearClips(spark, sfDir)
      .select("doc_id").as[Long].collect()
    val byCid = ids.groupBy(_ % Multimodal.m37ContentMod)
    val expected = (for {
      img <- ids if img % 2 == 0
      vid <- byCid(img % Multimodal.m37ContentMod)
    } yield (img, vid, 0, 0)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // the cross-modal law on one concrete pair: the gray BMP
    // thumbnail's image dHash IS the frame's grayDHash, bit for bit
    val cid = ids.min % Multimodal.m37ContentMod
    val (w, h, frames) = Multimodal.m37Planes(cid, 0, 0)
    val y = frames.head
    val bmp = graft.multimodal.ImageCodec.encodeBmp(w, h,
      Array.tabulate(3 * w * h)(i => y(i / 3)))
    assert(graft.multimodal.ImageCodec.decodeDHash(bmp) ==
      graft.multimodal.ImageCodec.grayDHash(w, h, y),
      "image dHash != frame grayDHash — the shared-definition law broke")
  }

  test("m36 closure equals an independent union-find over m35's pairs; keep-min; variants collapse") {
    val out = SparkEntry.queries("m36_media_dedup_closure")(spark, sfDir)
      .as[(Long, Long, Boolean)].collect()
    assert(out.nonEmpty)
    val pairs = SparkEntry.queries("m35_media_neardup")(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    val verts = Multimodal.m35Hashes(spark, sfDir)
      .select("doc_id").as[Long].collect()
    // independent closure: union-find attaching the larger root under
    // the smaller, so each final root is its component's min label —
    // the same keep-min contract m36 claims, derived a different way
    val parent = scala.collection.mutable.Map(verts.map(v => v -> v): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = verts.map(v => v -> find(v)).toMap
    val expected = verts.map(v => (v, comp(v), v == comp(v))).toSet
    assert(out.toSet == expected,
      s"closure mismatch: missing=${(expected -- out.toSet).take(3)} extra=${(out.toSet -- expected).take(3)}")
    // exactly one keeper per component, and it is the min label
    val keepers = out.filter(_._3).map(_._1).toSet
    assert(keepers == comp.values.toSet)
    // planted grouping: every content id's variants (BMP, PPM, +4
    // brightness) land in ONE component — the chain the pair list
    // alone cannot decide is closed
    verts.groupBy(_ % 40L).values.filter(_.length > 1).foreach { g =>
      assert(g.map(comp).distinct.length == 1,
        s"variants of one content id split across components: $g")
    }
  }

  test("m40 recovers exactly the planted scene boundaries with zero false cuts") {
    val got = SparkEntry.queries("m40_scene_cut")(spark, sfDir)
      .as[(Long, Int, Int)].collect()
    assert(got.nonEmpty)
    val ids = Multimodal.mediaTableScenes(spark, sfDir)
      .select("doc_id").as[Long].collect()
    // expected cuts: the frame index where each new scene starts —
    // cumulative sums of the planted per-scene frame counts
    val expected = (for {
      id <- ids
      cut <- Multimodal.m40ScenePlan(id).scanLeft(0)(_ + _).tail.dropRight(1)
    } yield (id, cut)).toSet
    assert(got.map(g => (g._1, g._2)).toSet == expected,
      s"cut sets differ: missing=${(expected -- got.map(g => (g._1, g._2)).toSet).take(3)} " +
        s"extra=${(got.map(g => (g._1, g._2)).toSet -- expected).take(3)}")
    // every declared cut is a genuine content switch with real
    // margin over the threshold (observed corpus minimum is 18 —
    // avalanche patterns sit near Hamming 32, never near 10)
    got.foreach { case (id, f, d) => assert(d >= 15, s"doc $id cut at $f: dist $d") }
    // and the in-scene brightness jitter is hash-invisible: every
    // clip has exactly nScenes-1 cuts, so no jittered frame ever
    // crossed the threshold (zero false positives, corpus-wide)
    val perDoc = got.groupBy(_._1).view.mapValues(_.length).toMap
    ids.foreach { id =>
      assert(perDoc.getOrElse(id, 0) == Multimodal.m40ScenePlan(id).length - 1,
        s"doc $id: ${perDoc.getOrElse(id, 0)} cuts for ${Multimodal.m40ScenePlan(id).length} scenes")
    }
  }

  // ---- m35b: the band/verify stage oracle-checked ----

  test("m35b planted structure: exact-dup at Hamming 0, two-bit variant at 2; mirror agrees") {
    val out = Multimodal.m35bNeardupOracle(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSet
    // 40 content groups of docs (cid, cid+40, cid+80): v0-v1 share
    // the md5 hash exactly, v2 differs in exactly the two planted
    // bit positions -- and nothing else pairs (random 60-bit hashes
    // never land within Hamming 3 of each other)
    val expected = (0L until 40L).flatMap { cid =>
      Seq((cid, cid + 40L, 0), (cid, cid + 80L, 2), (cid + 40L, cid + 80L, 2))
    }.toSet
    assert(out == expected, s"planted pair structure broken: ${out.size} pairs")
    // independent in-memory mirror of the banding pigeonhole + the
    // popcount verify over the SAME literal hashes -- guards the
    // production m35PairsFromHashes path m35b routes through
    val hashes = Multimodal.m35bHashLiterals(spark, sfDir)
      .as[(Long, Long)].collect()
    val mirror = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b
      if (0 to 3).exists(i => ((ha >> (16 * i)) & 0xFFFFL) == ((hb >> (16 * i)) & 0xFFFFL))
      h = java.lang.Long.bitCount(ha ^ hb)
      if h <= 3
    } yield (a, b, h)).toSet
    assert(mirror == out, "banding/verify mirror disagrees")
  }

  // ---- m36b: the closure stage oracle-checked ----

  test("m36b planted structure: every triplet closes to its min id; union-find mirror agrees") {
    val out = Multimodal.m36bClosureOracle(spark, sfDir)
      .as[(Long, Long, Boolean)].collect().toSet
    // 40 content groups (cid, cid+40, cid+80) are each fully
    // connected through the m35b pair structure → component = cid
    val expected = (0L until 40L).flatMap { cid =>
      Seq((cid, cid, true), (cid + 40L, cid, false), (cid + 80L, cid, false))
    }.toSet
    assert(out == expected, s"closure structure broken: ${out.size} rows")
    // independent union-find over the registered m35b pair stream
    val pairs = SparkEntry.queries("m35b_neardup_oracle")(spark, sfDir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map((0L until 120L).map(i => i -> i): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val mirror = (0L until 120L).map(i => (i, find(i), find(i) == i)).toSet
    assert(mirror == out, "union-find mirror disagrees with the closure")
  }

  // ---- m37b: the frame-aligned band/ratio stage oracle-checked ----

  test("m37b planted structure: re-encodes at 1.0, even-cid variants at the 0.5 boundary; mirror agrees") {
    val out = Multimodal.m37bVideoOracle(spark, sfDir)
      .as[(Long, Long, Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // 20 content groups (cid, cid+20, cid+40): v0-v1 share all 6
    // frame hashes (ratio 1.0); v2 matches 3 of 6 for even cids
    // (exactly the >= 0.5 boundary — kept) and 2 of 6 for odd cids
    // (0.3333 — dropped by the ratio verify)
    val expected = (0L until 20L).flatMap { cid =>
      val full = Seq((cid, cid + 20L) -> (6, 6, 1.0))
      if (cid % 2 == 0)
        full ++ Seq((cid, cid + 40L) -> (3, 6, 0.5),
          (cid + 20L, cid + 40L) -> (3, 6, 0.5))
      else full
    }.toMap
    assert(out == expected,
      s"planted pair structure broken: ${out.size} pairs vs ${expected.size}")
    // independent mirror: brute-force over the SAME literal stream —
    // frame-aligned band pigeonhole, per-frame popcount, ratio rule
    val frames = Multimodal.m37bFrameHashLiterals(spark, sfDir)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val ids = frames.keys.toSeq.sorted
    val mirror = (for {
      a <- ids; b <- ids
      if a < b
      ha = frames(a); hb = frames(b)
      if ha.indices.exists(fi => (0 to 3).exists(i =>
        ((ha(fi) >> (16 * i)) & 0xFFFFL) == ((hb(fi) >> (16 * i)) & 0xFFFFL)))
      m = ha.indices.count(fi => java.lang.Long.bitCount(ha(fi) ^ hb(fi)) <= 3)
      r = BigDecimal(m.toDouble / ha.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      if r >= 0.5
    } yield (a, b) -> (m, ha.size, r)).toMap
    assert(mirror == out, "frame-aligned banding/ratio mirror disagrees")
  }

  test("m34b rides m34's keep-min body: planted literal groups, one keep per group") {
    val out = SparkEntry.queries("m34b_dedup_oracle")(spark, sfDir)
      .select("doc_id", "modality", "content_crc", "group_size", "keep")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.length == 120)
    val groups = out.groupBy(g => (g._2, g._3))
    // 13 planted groups per modality, sizes 3-4, multi-member — the
    // keep-min path is exercised, not vacuous
    assert(groups.keys.map(_._1).toSet.size == 3 && groups.size == 39)
    groups.values.foreach { g =>
      assert(g.forall(_._4 == g.size) && Set(3L, 4L)(g.head._4.toLong))
      assert(g.count(_._5) == 1 && g.filter(_._5).head._1 == g.map(_._1).min,
        "exactly the min doc_id keeps")
    }
  }

  test("m39b rides m39's match body: planted poster frames hit, variant-2 at Hamming 2, off-frames silent") {
    val got = SparkEntry.queries("m39b_thumbnail_oracle")(spark, sfDir)
      .as[(Long, Long, Int, Int)].collect().toSet
    // expected: every image matches frame 0 of every clip whose
    // video_id shares its content group — exact variants (0/1) at
    // Hamming 0, the two-bit variant (2) at Hamming 2
    val mod = Multimodal.m35ContentMod
    val expected = (for {
      img <- 0L until 120L
      vid <- 0L until 60L if vid % mod == img % mod
      ham = if ((img / mod) % 3 == 2) 2 else 0
    } yield (img, vid, 0, ham)).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // frames 1-2 are independent avalanche hashes: nothing matched
    assert(got.forall(_._3 == 0), "an off-poster frame matched")
    // both Hamming populations live — the verify threshold is
    // genuinely exercised on inexact matches
    assert(got.exists(_._4 == 0) && got.exists(_._4 == 2))
  }

  test("m41 scrub: idempotent, clean rows byte-identical, planted decode preserved, sizes closed-form") {
    val pre = Multimodal.mediaTableWithMeta(spark, sfDir).collect()
    assert(pre.exists(r => Multimodal.m41Planted(r.doc_id)) &&
      pre.exists(r => !Multimodal.m41Planted(r.doc_id)))
    pre.foreach { r =>
      val once = Multimodal.m41Scrub(r.modality, r.payload)
      val twice = Multimodal.m41Scrub(r.modality, once)
      assert(java.util.Arrays.equals(once, twice),
        s"scrub not idempotent on ${r.doc_id}")
      if (!Multimodal.m41Planted(r.doc_id))
        assert(java.util.Arrays.equals(once, r.payload),
          s"clean row ${r.doc_id} changed bytes")
      else {
        // the planted delta is exactly the closed-form size
        val add = r.modality match {
          case "audio" => Multimodal.m41WavAdd(r.doc_id)
          case "image" => Multimodal.m41BmpAdd(r.doc_id)
          case _       => Multimodal.m41Y4mAdd(r.doc_id)
        }
        assert(r.payload.length - once.length == add,
          s"row ${r.doc_id}: delta ${r.payload.length - once.length} != $add")
        // decoded content identical through the real codecs
        def dec(b: Array[Byte]): Any = r.modality match {
          case "audio" => AudioCodec.decode(b)
          case "image" => ImageCodec.decode(b)
          case _       => VideoCodec.decode(b)
        }
        assert(dec(r.payload).asInstanceOf[Option[_]].isDefined,
          s"planted container ${r.doc_id} must still decode")
        assert(dec(r.payload) == dec(once),
          s"row ${r.doc_id}: scrub changed decoded content")
      }
    }
  }
}
