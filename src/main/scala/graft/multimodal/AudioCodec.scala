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

  /** Sniff the RIFF/WAVE magic and decode if PCM16 mono. */
  def decode(b: Array[Byte]): Option[DecodedAudio] = {
    if (b == null || b.length < 44) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    // chunk walk: find "fmt " and "data"; sizes are attacker-
    // controlled int32s, so compare in Long and reject negatives
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
        dataOff < 0 || dataLen < 0 || dataLen % 2 != 0) return None
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
