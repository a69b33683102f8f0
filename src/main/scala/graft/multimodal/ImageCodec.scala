package graft.multimodal

/** One decoded raster image in canonical form: dimensions, per-channel
  * means, and a CRC32 over the pixels in row-major top-down RGB byte
  * order. The canonical order makes the checksum FORMAT-INDEPENDENT:
  * the same pixels encoded as BMP (bottom-up, BGR, row-padded) and as
  * PPM (top-down RGB) decode to the same pixelCrc — which is what the
  * spec pins. */
case class DecodedImage(format: String, width: Int, height: Int,
    meanR: Double, meanG: Double, meanB: Double, pixelCrc: Long)

/** Pure-JVM decoders for the two uncompressed raster formats a
  * container without codec libraries can still parse end-to-end:
  * BMP (Windows BITMAPINFOHEADER, 24-bit, BI_RGB) and binary PPM
  * (P6, maxval ≤ 255). Compressed formats (PNG/JPEG/…) need external
  * codec libs absent from this container and stay on m33's labeled
  * stub path.
  *
  * Both formats are published specs: BMP per the Windows bitmap file
  * layout (14-byte file header + 40-byte BITMAPINFOHEADER, rows
  * padded to 4 bytes, stored bottom-up as BGR unless height < 0);
  * PPM per the Netpbm P6 format (ASCII header with #-comments, one
  * whitespace after maxval, then raw RGB).
  *
  * Everything is bounds-checked: truncated or corrupt bytes return
  * None (the caller falls back to the stub path), never throw. */
object ImageCodec {
  import ByteIO.{le16, le32}

  /** Sniff the magic bytes and decode if the format is supported. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] =
    if (bytes == null || bytes.length < 2) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes(0) == 'P' && bytes(1) == '6') decodePpm(bytes)
    else None

  /** Canonical 64-bit DIFFERENCE hash (dHash) over the decoded
    * pixels: sample the top-down grayscale image on a 9×8
    * nearest-neighbor grid, bit = right neighbor strictly brighter
    * than its left. Container-independent (the same pixels as BMP
    * and PPM hash identically, like pixelCrc) AND perceptually
    * robust where the CRC is brittle: a global brightness shift
    * changes every byte and the CRC but no GRADIENT, so the dHash
    * is unchanged — the property m35 builds on. Integer-only
    * arithmetic (BT.601 luma in fixed point, floor-division grid),
    * so the hash is bit-stable across platforms. */
  private[multimodal] def dHashOf(w: Int, h: Int,
      pixel: (Int, Int, Int) => Int): Long = {
    def gray(gx: Int, gy: Int): Int = {
      val x = math.min(gx * w / 9, w - 1)
      val y = math.min(gy * h / 8, h - 1)
      (pixel(x, y, 0) * 299 + pixel(x, y, 1) * 587 + pixel(x, y, 2) * 114) / 1000
    }
    var hash = 0L
    var bit = 0
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (gray(gx + 1, gy) > gray(gx, gy)) hash |= 1L << bit
        bit += 1
        gx += 1
      }
      gy += 1
    }
    hash
  }

  /** Decode + dHash in one pass, any supported container. */
  def decodeDHash(bytes: Array[Byte]): Option[Long] =
    decodeAccessor(bytes).map { case (_, w, h, px) => dHashOf(w, h, px) }

  /** dHash of a raw grayscale plane (w×h unsigned bytes, row-major) —
    * the SAME 9×8 gradient grid as the image path, applied to a
    * video frame's luma plane: equal-luma channels make the BT.601
    * weighting the identity, so a frame and a gray image with the
    * same plane hash identically. ONE definition shared by m37's
    * clip hasher and its spec's independent recompute. Returns None
    * on a short buffer (corrupt frame) — the codec contract. */
  private[graft] def grayDHash(w: Int, h: Int,
      plane: Array[Byte]): Option[Long] =
    if (w <= 0 || h <= 0 || plane == null || plane.length < w * h) None
    else Some(dHashOf(w, h, (x, y, _) => plane(y * w + x) & 0xFF))

  /** Parse a payload down to (format, w, h, pixel accessor) without
    * walking pixels — shared by the stats pass and the dHash pass. */
  private def decodeAccessor(bytes: Array[Byte])
      : Option[(String, Int, Int, (Int, Int, Int) => Int)] =
    if (bytes == null || bytes.length < 2) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') parseBmp(bytes)
    else if (bytes(0) == 'P' && bytes(1) == '6') parsePpm(bytes)
    else None

  /** Canonical stats pass shared by both decoders: `pixel(x, y, c)`
    * returns the channel byte (c: 0=R,1=G,2=B) of the TOP-DOWN
    * row-major image. */
  private def stats(format: String, w: Int, h: Int,
      pixel: (Int, Int, Int) => Int): DecodedImage = {
    val crc = new java.util.zip.CRC32()
    var sr = 0L; var sg = 0L; var sb = 0L
    val row = new Array[Byte](3 * w)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = pixel(x, y, 0); val g = pixel(x, y, 1); val b = pixel(x, y, 2)
        sr += r; sg += g; sb += b
        row(3 * x) = r.toByte; row(3 * x + 1) = g.toByte; row(3 * x + 2) = b.toByte
        x += 1
      }
      crc.update(row)
      y += 1
    }
    val n = w.toLong * h
    DecodedImage(format, w, h, sr.toDouble / n, sg.toDouble / n,
      sb.toDouble / n, crc.getValue)
  }

  /** BMP: 24-bit uncompressed BITMAPINFOHEADER only — the format a
    * round-trip spec can construct by hand. Other depths/compressions
    * → None. */
  private[multimodal] def decodeBmp(b: Array[Byte]): Option[DecodedImage] =
    parseBmp(b).map { case (f, w, h, px) => stats(f, w, h, px) }

  private def parseBmp(b: Array[Byte])
      : Option[(String, Int, Int, (Int, Int, Int) => Int)] = {
    if (b.length < 54) return None
    val dataOffset = le32(b, 10)
    val dibSize = le32(b, 14)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    val planes = le16(b, 26)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (dibSize < 40 || w <= 0 || h <= 0 || planes != 1 || bpp != 24 ||
        compression != 0) return None
    // overflow-safe bounds: w,h are attacker-controlled int32s
    val stride = ((w.toLong * 3 + 3) / 4) * 4
    if (w > (Int.MaxValue - 3) / 3 || stride * h > Int.MaxValue.toLong ||
        dataOffset < 54 || dataOffset.toLong + stride * h > b.length) return None
    Some(("bmp", w, h, (x: Int, y: Int, c: Int) => {
      val srcRow = if (topDown) y else h - 1 - y // stored bottom-up by default
      val base = dataOffset + srcRow * stride.toInt + 3 * x
      // BGR on disk → channel c (0=R,1=G,2=B) reads byte (2-c)
      b(base + (2 - c)) & 0xff
    }))
  }

  /** PPM P6: ASCII header (`P6 <w> <h> <maxval≤255>`, #-comments
    * allowed, ONE whitespace byte after maxval), then raw RGB. */
  private[multimodal] def decodePpm(b: Array[Byte]): Option[DecodedImage] =
    parsePpm(b).map { case (f, w, h, px) => stats(f, w, h, px) }

  private def parsePpm(b: Array[Byte])
      : Option[(String, Int, Int, (Int, Int, Int) => Int)] = {
    var pos = 2 // past "P6"
    def token(): Option[Int] = {
      // skip whitespace and #-comments
      var inComment = false
      while (pos < b.length &&
          (inComment || b(pos).toChar.isWhitespace || b(pos) == '#')) {
        if (b(pos) == '#') inComment = true
        else if (b(pos) == '\n') inComment = false
        pos += 1
      }
      val start = pos
      while (pos < b.length && b(pos).toChar.isDigit) pos += 1
      if (pos == start || pos - start > 9) None
      else Some(new String(b, start, pos - start, "US-ASCII").toInt)
    }
    for {
      w <- token()
      h <- token()
      maxval <- token()
      if w > 0 && h > 0 && maxval > 0 && maxval <= 255 &&
        pos < b.length && b(pos).toChar.isWhitespace && {
          pos += 1 // exactly one whitespace after maxval
          w <= (Int.MaxValue - 3) / 3 / math.max(h, 1) &&
            pos.toLong + 3L * w * h <= b.length
        }
    } yield ("ppm", w, h,
      (x: Int, y: Int, c: Int) => b(pos + 3 * (y * w + x) + c) & 0xff)
  }

  /** Encode row-major top-down RGB pixels as a 24-bit BI_RGB BMP
    * (bottom-up, BGR, 4-byte row padding) — the test fixture
    * generator and m33's deterministic image-payload source. */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"need ${3 * w * h} bytes, got ${rgb.length}")
    val stride = ((w * 3 + 3) / 4) * 4
    val dataSize = stride * h
    val out = new Array[Byte](54 + dataSize)
    def putLe32(off: Int, v: Int): Unit = ByteIO.putLe32(out, off, v)
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize) // file size
    putLe32(10, 54)           // pixel data offset
    putLe32(14, 40)           // BITMAPINFOHEADER
    putLe32(18, w)
    putLe32(22, h)            // positive = bottom-up
    out(26) = 1               // planes
    out(28) = 24              // bpp
    putLe32(30, 0)            // BI_RGB
    putLe32(34, dataSize)
    var y = 0
    while (y < h) {
      val dstBase = 54 + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val src = 3 * (y * w + x)
        out(dstBase + 3 * x) = rgb(src + 2)     // B
        out(dstBase + 3 * x + 1) = rgb(src + 1) // G
        out(dstBase + 3 * x + 2) = rgb(src)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode the same canonical pixels as binary PPM (P6). */
  def encodePpm(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h, s"need ${3 * w * h} bytes, got ${rgb.length}")
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
  }
}
