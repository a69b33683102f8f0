package graft.multimodal

/** One decoded clip in canonical form: dims, frame rate, frame
  * count, the derived duration (rounded to the nearest ms), the
  * mean of each plane over ALL frames (Y/U/V as unsigned bytes;
  * uMean/vMean are 0 for mono), and a CRC32 over the concatenated
  * raw frame payloads in stream order. */
case class DecodedVideo(format: String, width: Int, height: Int,
    fpsNum: Int, fpsDen: Int, nFrames: Int, durationMs: Long,
    yMean: Double, uMean: Double, vMean: Double, frameCrc: Long)

/** Pure-JVM decoder for the one video container a codec-less
  * environment can still parse end-to-end: Y4M (YUV4MPEG2) — a
  * plain-ASCII stream header (`YUV4MPEG2 W<w> H<h> F<num>:<den>
  * [Ip] [A..] [C<cs>] [X..]\n`), then per frame an ASCII `FRAME
  * [params]\n` marker followed by raw planar YUV bytes. Compressed
  * video (H.264/VP9/…) needs codec libraries absent from this
  * container and stays on m33's labeled stub path.
  *
  * Supported colorspaces: the 4:2:0 family (`C420`, `C420jpeg`,
  * `C420mpeg2`, `C420paldv` — chroma subsampling changes SITING,
  * not plane sizes), `C422`, `C444`, and `Cmono`. Everything is
  * bounds-checked: truncated or corrupt bytes return None (the
  * caller falls back to the stub path), never throw — the
  * [[ImageCodec]]/[[AudioCodec]] contract.
  */
object VideoCodec {

  /** Parsed stream header: plane byte sizes per frame plus where the
    * first FRAME marker starts. */
  private[multimodal] case class Y4mHeader(width: Int, height: Int,
      fpsNum: Int, fpsDen: Int, colorspace: String,
      ySize: Int, cSize: Int, firstFrameOff: Int) {
    def frameBytes: Int = ySize + 2 * cSize
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    if (i < b.length) i else -1
  }

  private[multimodal] def parseHeader(b: Array[Byte]): Option[Y4mHeader] = {
    val Magic = "YUV4MPEG2"
    if (b == null || b.length < Magic.length + 1) return None
    val end = lineEnd(b, 0)
    if (end < 0) return None
    val line = new String(b, 0, end, "US-ASCII")
    val toks = line.split(" ").filter(_.nonEmpty)
    if (toks.isEmpty || toks(0) != Magic) return None
    var w = -1; var h = -1; var num = 25; var den = 1; var cs = "420"
    // numeric tag values are attacker-controlled: parse defensively
    def intOf(s: String): Int =
      try { val v = s.toLong; if (v < 0 || v > Int.MaxValue) -1 else v.toInt }
      catch { case _: NumberFormatException => -1 }
    toks.drop(1).foreach { t =>
      t.head match {
        case 'W' => w = intOf(t.tail)
        case 'H' => h = intOf(t.tail)
        case 'F' => t.tail.split(":") match {
          case Array(n, d) => num = intOf(n); den = intOf(d)
          case _           => num = -1
        }
        case 'C' => cs = t.tail
        case _   => // Ip / A1:1 / Xapp-specific — irrelevant to decode
      }
    }
    if (w <= 0 || h <= 0 || num <= 0 || den <= 0) return None
    val cSizeL: Long = cs match {
      case "420" | "420jpeg" | "420mpeg2" | "420paldv" =>
        if (w % 2 != 0 || h % 2 != 0) return None
        (w / 2).toLong * (h / 2)
      case "422" =>
        if (w % 2 != 0) return None
        (w / 2).toLong * h
      case "444" => w.toLong * h
      case "mono" => 0L
      case _ => return None // 411/alpha/10-bit variants: not supported
    }
    val ySizeL = w.toLong * h
    if (ySizeL + 2 * cSizeL > Int.MaxValue) return None
    Some(Y4mHeader(w, h, num, den, cs, ySizeL.toInt, cSizeL.toInt, end + 1))
  }

  /** Payload start offsets of every frame, in order; None on a
    * malformed marker or a truncated final frame. */
  private[multimodal] def frameOffsets(b: Array[Byte], hdr: Y4mHeader): Option[Seq[Int]] = {
    val Marker = "FRAME".getBytes("US-ASCII")
    val offs = Seq.newBuilder[Int]
    var pos = hdr.firstFrameOff
    while (pos < b.length) {
      if (pos + Marker.length > b.length ||
          !Marker.indices.forall(i => b(pos + i) == Marker(i))) return None
      val end = lineEnd(b, pos + Marker.length)
      // frame params (e.g. `FRAME Ixyz`) ride between marker and \n
      if (end < 0 || (end > pos + Marker.length && b(pos + Marker.length) != ' '))
        return None
      val dataOff = end + 1
      if (dataOff.toLong + hdr.frameBytes > b.length) return None
      offs += dataOff
      pos = dataOff + hdr.frameBytes
    }
    Some(offs.result())
  }

  /** Sniff the YUV4MPEG2 magic and decode: dims, rate, frame count,
    * per-plane means over all frames, CRC over the raw frame bytes. */
  def decode(b: Array[Byte]): Option[DecodedVideo] =
    parseHeader(b).flatMap { hdr =>
      frameOffsets(b, hdr).map { offs =>
        val crc = new java.util.zip.CRC32()
        var ySum = 0L; var uSum = 0L; var vSum = 0L
        offs.foreach { off =>
          crc.update(b, off, hdr.frameBytes)
          var i = off
          val yEnd = off + hdr.ySize
          val uEnd = yEnd + hdr.cSize
          val vEnd = uEnd + hdr.cSize
          while (i < yEnd) { ySum += b(i) & 0xff; i += 1 }
          while (i < uEnd) { uSum += b(i) & 0xff; i += 1 }
          while (i < vEnd) { vSum += b(i) & 0xff; i += 1 }
        }
        val n = offs.length
        val yCount = n.toLong * hdr.ySize
        val cCount = n.toLong * hdr.cSize
        DecodedVideo("y4m", hdr.width, hdr.height, hdr.fpsNum, hdr.fpsDen, n,
          (n.toLong * 1000 * hdr.fpsDen + hdr.fpsNum / 2) / hdr.fpsNum,
          if (yCount == 0) 0.0 else ySum.toDouble / yCount,
          if (cCount == 0) 0.0 else uSum.toDouble / cCount,
          if (cCount == 0) 0.0 else vSum.toDouble / cCount,
          crc.getValue)
      }
    }

  /** The raw planar payload of each frame, in order — the REAL
    * frame-extraction primitive behind Multimodal.sampleFrames. */
  def frames(b: Array[Byte]): Option[Seq[Array[Byte]]] =
    parseHeader(b).flatMap { hdr =>
      frameOffsets(b, hdr).map(_.map(off =>
        java.util.Arrays.copyOfRange(b, off, off + hdr.frameBytes)))
    }

  /** Per-frame presentation time in ms (rounded to nearest). */
  def frameMs(idx: Int, fpsNum: Int, fpsDen: Int): Long =
    (idx.toLong * 1000 * fpsDen + fpsNum / 2) / fpsNum

  /** Encode raw 4:2:0 frames as a minimal YUV4MPEG2 container — the
    * test fixture generator and m33's deterministic video-payload
    * source. Each frame must be exactly w*h*3/2 bytes (Y then U
    * then V planes). */
  def encodeY4m(w: Int, h: Int, fpsNum: Int, fpsDen: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0, "4:2:0 needs even dims")
    require(fpsNum > 0 && fpsDen > 0, "frame rate must be positive")
    val frameBytes = w * h * 3 / 2
    require(frames.forall(_.length == frameBytes),
      s"each 4:2:0 frame must be exactly $frameBytes bytes")
    val header = s"YUV4MPEG2 W$w H$h F$fpsNum:$fpsDen Ip A1:1 C420\n"
      .getBytes("US-ASCII")
    val marker = "FRAME\n".getBytes("US-ASCII")
    val out = new java.io.ByteArrayOutputStream(
      header.length + frames.length * (marker.length + frameBytes))
    out.write(header)
    frames.foreach { f => out.write(marker); out.write(f) }
    out.toByteArray
  }
}
