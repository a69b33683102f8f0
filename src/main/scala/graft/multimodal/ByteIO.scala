package graft.multimodal

/** Little-endian byte readers/writers shared by [[ImageCodec]] and
  * [[AudioCodec]] — one definition so a byte-order or bounds fix
  * can never apply to one codec and miss the other. */
private[multimodal] object ByteIO {

  def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def putLe32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
  }

  def putLe16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
  }
}
