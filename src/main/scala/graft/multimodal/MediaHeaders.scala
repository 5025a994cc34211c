package graft.multimodal

/** Real container-header parsing — the metadata a 100 TB media pipeline
  * extracts WITHOUT decoding pixels/samples. Pure JVM against the public
  * container specs (PNG 1.2, JPEG/JFIF ISO 10918, RIFF/WAVE): no codec
  * library needed, because dimensions/sample-rate live in the first few
  * hundred header bytes. At scale this is the difference between reading
  * a 4 KB header range and decoding a 40 MB payload per asset.
  *
  * These upgrade [[Multimodal.decodeFeatures]] from the documented stub
  * to a real parse for the three formats; the stub remains the fallback
  * for unknown mimes (where a true codec would sit). */
object MediaHeaders {

  private val PngSig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def be32(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 24) | ((b(at + 1) & 0xff) << 16) | ((b(at + 2) & 0xff) << 8) | (b(at + 3) & 0xff)
  private def be16(b: Array[Byte], at: Int): Int =
    ((b(at) & 0xff) << 8) | (b(at + 1) & 0xff)
  private def le32(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8) | ((b(at + 2) & 0xff) << 16) | ((b(at + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)

  /** PNG: signature + IHDR (always the first chunk): width/height BE at
    * bytes 16/20. */
  def pngDims(b: Array[Byte]): Option[(Int, Int)] =
    if (b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i)))
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** JPEG: walk the marker stream past APPn/COM/quant tables to the first
    * SOF0/1/2 frame header; height BE16 at +5, width at +7 inside it.
    * ISO 10918 allows runs of 0xFF fill bytes before any marker — they are
    * padding, not a segment. */
  def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var at = 2
    while (at + 4 <= b.length) {
      if ((b(at) & 0xff) != 0xff) return None
      while (at + 4 <= b.length && (b(at + 1) & 0xff) == 0xff) at += 1 // fill bytes
      if (at + 4 > b.length) return None
      val marker = b(at + 1) & 0xff
      // the full SOFn family carries the frame header: 0xC0-0xCF minus
      // DHT (0xC4), JPG (0xC8), DAC (0xCC) — lossless/arithmetic/
      // hierarchical variants included, so none silently fall to the stub
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (at + 9 > b.length) return None
        return Some((be16(b, at + 7), be16(b, at + 5))) // (width, height)
      }
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) at += 2 // bare markers
      else {
        val len = be16(b, at + 2)
        if (len < 2) return None // malformed length cannot advance
        at += 2 + len
      }
    }
    None
  }

  /** RIFF/WAVE: find the `fmt ` chunk; (channels LE16, sampleRate LE32).
    * Chunk sizes are unsigned; a size that is negative as a signed Int
    * (>= 2 GiB or crafted) cannot be walked with Int arithmetic — bail
    * out instead of looping. */
  def wavFormat(b: Array[Byte]): Option[(Int, Int)] = {
    def tag(at: Int, s: String) = s.indices.forall(i => b(at + i) == s.charAt(i).toByte)
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var at = 12
    while (at + 8 <= b.length) {
      val size = le32(b, at + 4)
      if (tag(at, "fmt ") && at + 16 <= b.length)
        return Some((le16(b, at + 10), le32(b, at + 12)))
      if (size < 0) return None // unsigned size past Int.MaxValue: not walkable
      at += 8 + size + (size & 1) // chunks are word-aligned
    }
    None
  }

  /** Locate the `data` chunk: (payload offset, byte length), clamped to
    * the container (a truncated final chunk yields the bytes present —
    * the sample decoder then consumes whole 16-bit frames only). Same
    * RIFF walk as [[wavFormat]]. */
  def wavData(b: Array[Byte]): Option[(Int, Int)] = {
    def tag(at: Int, s: String) = s.indices.forall(i => b(at + i) == s.charAt(i).toByte)
    if (b.length < 12 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var at = 12
    while (at + 8 <= b.length) {
      val size = le32(b, at + 4)
      if (size < 0) return None
      if (tag(at, "data"))
        return Some((at + 8, math.min(size, b.length - at - 8)))
      at += 8 + size + (size & 1)
    }
    None
  }
}
