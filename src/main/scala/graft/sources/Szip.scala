package graft.sources

/** Pure-JVM szip (HDF5 filter 4) decoder — the CCSDS 121.0-B extended-Rice
  * entropy coder that szlib implements, written against the public CCSDS
  * 121.0-B-2 "Lossless Data Compression" Blue Book (the same
  * public-spec-only standard as the rest of [[Hdf5]]: HDF5 File Format
  * Spec, TIFF 6.0, DAP 2.0). Closes SURVEY §2.1 S11, previously declared
  * n/a (reference boundary: libhdf5 decodes szip transparently when the
  * optional libsz is present — run/utilities/adcirc_dask_utilities.py:36-44
  * reads via xarray→libhdf5 and never checks the codec).
  *
  * Scope = exactly what HDF5's H5Z_FILTER_SZIP can produce: the filter
  * refuses datatypes wider than 32 bits, so sample size n ∈ 1..32 (1, 2 or
  * 4 output bytes; the 17..24-bit 3-byte shape szlib reserves for imagery
  * never reaches an HDF5 chunk — we fail loudly on it), raw mode (HDF5
  * always sets SZ_RAW_OPTION_MASK: no szlib container header), NN
  * (nearest-neighbor prediction) or EC (entropy-only) preprocessing, and
  * LSB/MSB output sample order per the dataset's declared byte order.
  *
  * Stream model (CCSDS 121.0-B-2 §4-5):
  *  - The chunk is a sequence of SCANLINES of `pixelsPerScanline` samples;
  *    each scanline is coded independently (the predictor resets).
  *  - A scanline is split into BLOCKS of J = `pixelsPerBlock` samples
  *    (the last block padded to J by the encoder; pad samples are decoded
  *    and discarded). Blocks group into SEGMENTS of 64 for zero-run coding.
  *  - Each coded block: an option ID (3 bits for n ≤ 8, 4 for n ≤ 16, 5
  *    for n ≤ 32), then the codewords:
  *      id 0 + '0'  zero-block: an FS codeword gives the run of all-zero
  *                  blocks (values 0..3 → runs 1..4, 4 → remainder-of-
  *                  segment, v ≥ 5 → run v)
  *      id 0 + '1'  second-extension: J/2 FS codewords, each the paired
  *                  value γ = (d₁+d₂)(d₁+d₂+1)/2 + d₂
  *      id 1..2ᵐ-2  sample splitting with k = id-1 (k = 0 is the pure
  *                  fundamental sequence): J FS codewords of the high
  *                  parts, then J k-bit low parts
  *      id 2ᵐ-1     no compression: J raw n-bit (preprocessed) samples
  *  - With NN preprocessing the FIRST sample of each scanline is a raw
  *    n-bit REFERENCE, transmitted immediately after the first block's
  *    option ID (and after the low-entropy escape bit); that block then
  *    codes J-1 mapped deltas — the second-extension pair stream gains a
  *    phantom zero first element, per §5.3.2.
  *  - Delta mapping (§4.2): against predictor p with range [0, 2ⁿ-1] and
  *    θ = min(p, 2ⁿ-1-p): Δ ∈ [-θ, θ] interleaves (2Δ / -2Δ-1); |Δ| > θ
  *    maps to θ+|Δ| with the sign away from the nearer range boundary.
  */
object Szip {

  // szlib public option mask bits
  val AllowK13 = 1
  val Chip = 2
  val EC = 4
  val LSB = 8
  val MSB = 16
  val NN = 32
  val Raw = 128

  private final class BitReader(data: Array[Byte]) {
    private var bit = 0L
    private val nbits = data.length.toLong * 8
    def read(n: Int): Long = {
      require(bit + n <= nbits, s"szip stream exhausted (want $n bits at $bit of $nbits)")
      var v = 0L
      var i = 0
      while (i < n) {
        val b = bit + i
        v = (v << 1) | ((data((b >> 3).toInt) >> (7 - (b & 7).toInt)) & 1L)
        i += 1
      }
      bit += n
      v
    }
    /** Fundamental-sequence codeword: v zeros then a terminating 1. */
    def readFs(): Long = {
      var v = 0L
      while ({
        require(bit < nbits, "szip stream exhausted mid-FS")
        val z = (data((bit >> 3).toInt) >> (7 - (bit & 7).toInt)) & 1
        bit += 1
        z == 0
      }) v += 1
      v
    }
  }

  private def idBits(n: Int): Int = if (n <= 8) 3 else if (n <= 16) 4 else 5

  private[graft] def sampleBytes(n: Int): Int =
    if (n <= 8) 1
    else if (n <= 16) 2
    else if (n <= 24) throw new IllegalArgumentException(
      s"szip bits_per_pixel $n (3-byte imagery shape) cannot come from an HDF5 chunk")
    else if (n <= 32) 4
    else throw new IllegalArgumentException(
      s"szip bits_per_pixel $n: H5Z_FILTER_SZIP refuses datatypes wider than 32 bits")

  /** Inverse of the §4.2 prediction-error mapping. */
  private def unmap(m: Long, p: Long, xmax: Long): Long = {
    val theta = math.min(p, xmax - p)
    val delta =
      if (m <= 2 * theta) { if ((m & 1L) == 0L) m / 2 else -((m + 1) / 2) }
      else if (p <= xmax - p) m - theta // predictor nearer 0: overflow side is +
      else theta - m
    p + delta
  }

  /** Decode a szip-filtered HDF5 chunk body to `outSamples` samples packed
    * at `sampleBytes(n)` bytes each (order per the LSB/MSB option bit). */
  def decode(in: Array[Byte], optionsMask: Int, n: Int, pixelsPerBlock: Int,
             pixelsPerScanline: Int, outSamples: Int): Array[Byte] = {
    require((optionsMask & Raw) != 0,
      "szip stream without SZ_RAW_OPTION_MASK (szlib container header) cannot come from HDF5")
    val nn = (optionsMask & NN) != 0
    require(nn || (optionsMask & EC) != 0, s"szip options $optionsMask: neither NN nor EC set")
    val j = pixelsPerBlock
    require(j >= 2 && j <= 32 && j % 2 == 0, s"szip pixels_per_block $j out of range")
    require(pixelsPerScanline >= 1, s"szip pixels_per_scanline $pixelsPerScanline")
    val m = idBits(n)
    val uncompressedId = (1 << m) - 1
    val xmax = (1L << n) - 1
    val r = new BitReader(in)
    val bytes = sampleBytes(n)
    val msb = (optionsMask & LSB) == 0 // szlib default (and HDF5 big-endian types)
    val out = new Array[Byte](outSamples * bytes)
    var emitted = 0

    while (emitted < outSamples) {
      val len = math.min(pixelsPerScanline, outSamples - emitted)
      val blocks = (len + j - 1) / j
      val mapped = new Array[Long](blocks * j) // mapped deltas (NN) or samples (EC)
      var haveRef = false
      var refSample = 0L
      var blockIdx = 0

      def readRef(): Unit = if (nn && blockIdx == 0) { refSample = r.read(n); haveRef = true }
      // samples coded in this block (the scanline-leading reference is separate)
      def cnt(): Int = if (nn && blockIdx == 0) j - 1 else j
      def base(): Int = if (nn && blockIdx == 0) 1 else 0

      while (blockIdx < blocks) {
        val id = r.read(m).toInt
        if (id == 0) {
          if (r.read(1) == 1L) { // second extension: J/2 gammas over pairs
            readRef()
            val off = blockIdx * j
            val phantom = nn && blockIdx == 0 // pair stream starts (0, δ₁)
            var g = 0
            while (g < j / 2) {
              val gamma = r.readFs()
              // invert γ = s(s+1)/2 + d₂ : s = pair sum, d₂ = second element
              var s = 0L
              while ((s + 1) * (s + 2) / 2 <= gamma) s += 1
              val d2 = gamma - s * (s + 1) / 2
              val d1 = s - d2
              if (g == 0 && phantom) {
                require(d1 == 0L, s"szip second-extension phantom pair has d1=$d1")
                mapped(off + 1) = d2 // pair (phantom 0, δ₁)
              } else {
                mapped(off + 2 * g) = d1 // pairs tile the block: (2g, 2g+1)
                mapped(off + 2 * g + 1) = d2
              }
              g += 1
            }
            blockIdx += 1
          } else { // zero-block run
            readRef()
            val v = r.readFs()
            val run =
              if (v <= 3) (v + 1).toInt
              else if (v == 4) { // remainder of segment (64-block groups)
                val segEnd = math.min(((blockIdx / 64) + 1) * 64, blocks)
                segEnd - blockIdx
              } else v.toInt
            require(blockIdx + run <= blocks,
              s"szip zero run $run overflows scanline at block $blockIdx/$blocks")
            blockIdx += run // mapped[] already zero
          }
        } else if (id == uncompressedId) {
          readRef()
          val off = blockIdx * j + base()
          var i = 0
          val c = cnt()
          while (i < c) { mapped(off + i) = r.read(n); i += 1 }
          blockIdx += 1
        } else { // sample splitting, k = id - 1 (k = 0: pure FS)
          val k = id - 1
          readRef()
          val off = blockIdx * j + base()
          val c = cnt()
          var i = 0
          while (i < c) { mapped(off + i) = r.readFs(); i += 1 }
          if (k > 0) {
            i = 0
            while (i < c) { mapped(off + i) = (mapped(off + i) << k) | r.read(k); i += 1 }
          }
          blockIdx += 1
        }
      }

      // reconstruct the scanline
      var i = 0
      var prev = 0L
      while (i < len) {
        val x =
          if (!nn) mapped(i)
          else if (i == 0) { require(haveRef, "szip NN scanline missing reference"); refSample }
          else unmap(mapped(i), prev, xmax)
        require(x >= 0 && x <= xmax, s"szip decoded sample $x outside [0, $xmax]")
        prev = x
        val at = (emitted + i) * bytes
        var b = 0
        while (b < bytes) {
          val shift = if (msb) (bytes - 1 - b) * 8 else b * 8
          out(at + b) = ((x >> shift) & 0xff).toByte
          b += 1
        }
        i += 1
      }
      emitted += len
    }
    out
  }
}
