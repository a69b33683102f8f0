package graft.multimodal

/** One decoded PCM clip in canonical form: rate, sample count, the
  * derived duration (rounded to the nearest ms, so a non-empty
  * sub-millisecond clip reports 1, never 0), RMS amplitude over the
  * samples, and a CRC32 over the little-endian sample bytes. */
case class DecodedAudio(format: String, sampleRate: Int, nSamples: Int,
    durationMs: Long, rms: Double, sampleCrc: Long)

/** Pure-JVM decoder for the one audio container a codec-less
  * environment can still parse end-to-end: RIFF/WAVE holding PCM
  * (format tag 1), mono, 16-bit samples — the published RIFF chunk
  * layout (12-byte RIFF/WAVE preamble, then chunks of
  * [4-byte id][4-byte LE size][payload], "fmt " and "data" among
  * them, chunks padded to even offsets). Compressed audio (MP3/
  * AAC/…) needs codec libraries absent from this container and
  * stays on m33's labeled stub path.
  *
  * Everything is bounds-checked: truncated or corrupt bytes return
  * None (the caller falls back to the stub path), never throw —
  * the [[ImageCodec]] contract, for sound. */
object AudioCodec {
  import ByteIO.{le16, le32}

  /** Chunk-walk a RIFF/WAVE buffer down to its PCM16-mono sample
    * stream: (data offset, data length, sample rate). Shared by the
    * stats decode and the perceptual hash so the two can never
    * parse a container differently. Sizes are attacker-controlled
    * int32s, so compare in Long and reject negatives. */
  private def parsePcm(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12
    var fmt = -1; var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= b.length && (dataOff < 0 || fmt < 0)) {
      val id = new String(b, pos, 4, "US-ASCII")
      val sz = le32(b, pos + 4)
      if (sz < 0 || pos.toLong + 8 + sz > b.length) return None
      if (id == "fmt " && sz >= 16) {
        fmt = le16(b, pos + 8)
        channels = le16(b, pos + 10)
        sampleRate = le32(b, pos + 12)
        bits = le16(b, pos + 22)
      } else if (id == "data") {
        dataOff = pos + 8; dataLen = sz
      }
      pos += 8 + sz + (sz & 1) // chunks pad to even boundaries
    }
    if (fmt != 1 || channels != 1 || bits != 16 || sampleRate <= 0 ||
        dataOff < 0 || dataLen < 0 || dataLen % 2 != 0) None
    else Some((dataOff, dataLen, sampleRate))
  }

  /** 64-bit energy-difference hash — the audio analog of
    * [[ImageCodec]]'s dHash: the sample stream splits into 65
    * floor-division windows (the dHash grid idiom), each window's
    * energy is the exact integer Σs², and bit w is "window w+1
    * strictly louder than window w". Robust exactly where a sample
    * CRC is brittle: a GAIN change scales every window's energy by
    * the same factor and a DC offset adds the same amount per
    * window when window sums cancel — energy-DELTA signs survive,
    * bytes and CRC don't. Integer-only; None for < 65 samples or an
    * unparseable container (the codec contract). */
  def energyDHash(b: Array[Byte]): Option[Long] =
    parsePcm(b).flatMap { case (dataOff, dataLen, _) =>
      val n = dataLen / 2
      if (n < 65) None
      else {
        val e = new Array[Long](65)
        var w = 0
        while (w < 65) {
          var i = dataOff + 2 * (w * n / 65)
          val end = dataOff + 2 * ((w + 1) * n / 65)
          var acc = 0L
          while (i < end) {
            val s = le16(b, i).toShort.toInt
            acc += s.toLong * s
            i += 2
          }
          e(w) = acc
          w += 1
        }
        var hash = 0L
        var bit = 0
        while (bit < 64) {
          if (e(bit + 1) > e(bit)) hash |= 1L << bit
          bit += 1
        }
        Some(hash)
      }
    }

  /** Sniff the RIFF/WAVE magic and decode if PCM16 mono. */
  def decode(b: Array[Byte]): Option[DecodedAudio] = {
    val parsed = parsePcm(b)
    if (parsed.isEmpty) return None
    val (dataOff, dataLen, sampleRate) = parsed.get
    val n = dataLen / 2
    val crc = new java.util.zip.CRC32()
    crc.update(b, dataOff, dataLen)
    var sumSq = 0.0
    var i = 0
    while (i < n) {
      val s = le16(b, dataOff + 2 * i).toShort.toInt // reinterpret signed
      sumSq += s.toDouble * s
      i += 1
    }
    val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
    Some(DecodedAudio("wav", sampleRate, n,
      (n * 1000L + sampleRate / 2) / sampleRate,
      rms, crc.getValue))
  }

  /** Encode mono 16-bit PCM as a minimal RIFF/WAVE container — the
    * test fixture generator and m33's deterministic audio-payload
    * source. */
  def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putLe32(off: Int, v: Int): Unit = ByteIO.putLe32(out, off, v)
    def putLe16(off: Int, v: Int): Unit = ByteIO.putLe16(out, off, v)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(16, 16)           // fmt chunk size
    putLe16(20, 1)            // PCM
    putLe16(22, 1)            // mono
    putLe32(24, sampleRate)
    putLe32(28, sampleRate * 2) // byte rate
    putLe16(32, 2)            // block align
    putLe16(34, 16)           // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }
}
