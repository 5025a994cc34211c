package graft

import java.nio.file.{Files, Paths}
import graft.sources.{NcFile, Szip}

/** szip / CCSDS 121.0-B extended-Rice decode (SURVEY §2.1 S11).
  * Evidence standard = the rest of Hdf5Spec: fixtures are written against
  * the public spec (hand-assembled bit streams below; the
  * [[Hdf5Fixture.szipEncode]] option-searching encoder for realistic
  * streams), never via the code under test. */
class SzipSpec extends SparkSpec {

  private val RawNnMsb = 128 | 32 | 16
  private val RawEcMsb = 128 | 4 | 16
  private val RawEcLsb = 128 | 4 | 8
  private val RawNnLsb = 128 | 32 | 8

  private def decodeSamples(bytes: Array[Byte], opts: Int, n: Int, j: Int,
                            pps: Int, cnt: Int): Seq[Long] = {
    val out = Szip.decode(bytes, opts, n, j, pps, cnt)
    val es = Szip.sampleBytes(n)
    val msb = (opts & 8) == 0
    (0 until cnt).map { i =>
      (0 until es).foldLeft(0L) { (acc, b) =>
        val shift = if (msb) (es - 1 - b) * 8 else b * 8
        acc | ((out(i * es + b) & 0xffL) << shift)
      }
    }
  }

  // ---- hand-assembled bit vectors (spec §5, no encoder in the loop) ----

  test("hand vector: k=0 fundamental sequence, 8-bit EC") {
    // samples [3,0,1,2], J=4, pps=4, m=3: ID '001', FS 3,0,1,2 →
    // 001 0001 1 01 001 = 0010001101001 → 0x23 0x48
    val got = decodeSamples(Array(0x23, 0x48).map(_.toByte), RawEcMsb, 8, 4, 4, 4)
    assert(got === Seq(3L, 0L, 1L, 2L))
  }

  test("hand vector: zero-block run, 8-bit EC") {
    // 8 zeros in one scanline of two J=4 blocks: ID '000', escape '0',
    // FS(1) = run of 2 → 000 0 01 → 0x04
    val got = decodeSamples(Array(0x04.toByte), RawEcMsb, 8, 4, 8, 8)
    assert(got === Seq.fill(8)(0L))
  }

  test("hand vector: second extension, 8-bit EC") {
    // samples [1,0,1,0]: pairs (1,0),(1,0), γ = 1·2/2+0 = 1 each:
    // ID '000', escape '1', FS(1), FS(1) → 0001 0101 = 0x15
    val got = decodeSamples(Array(0x15.toByte), RawEcMsb, 8, 4, 4, 4)
    assert(got === Seq(1L, 0L, 1L, 0L))
  }

  test("hand vector: NN reference + uncompressed block with overflow-side mapping") {
    // samples [100,101,99,120]: ref=100 raw; deltas +1,-2,+21 map (§4.2)
    // to 2,3,42. ID '111', ref 01100100, then 3 raw bytes 2,3,42.
    val bits = "111" + "01100100" + "00000010" + "00000011" + "00101010"
    val padded = bits.padTo((bits.length + 7) / 8 * 8, '0')
    val bytes = padded.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val got = decodeSamples(bytes, RawNnMsb, 8, 4, 4, 4)
    assert(got === Seq(100L, 101L, 99L, 120L))
  }

  // ---- encoder/decoder roundtrips across the parameter grid -----------

  private def roundtrip(samples: Array[Long], opts: Int, n: Int, j: Int, pps: Int): Unit = {
    val enc = Hdf5Fixture.szipEncode(samples, opts, n, j, pps)
    val got = decodeSamples(enc, opts, n, j, pps, samples.length)
    assert(got === samples.toSeq, s"roundtrip n=$n j=$j pps=$pps opts=$opts")
  }

  test("roundtrip: 8-bit EC, small values exercise FS and splitting") {
    val s = Array.tabulate(200)(i => ((i * 37) % 23).toLong)
    roundtrip(s, RawEcMsb, 8, 8, 50)
  }

  test("roundtrip: 8-bit NN random walk, scanline not a block multiple") {
    var v = 128L
    val s = Array.tabulate(301) { i => v = (v + ((i * 29) % 11) - 5).max(0).min(255); v }
    roundtrip(s, RawNnMsb, 8, 8, 37) // 37 = 4 blocks + 5-sample edge block
  }

  test("roundtrip: 16-bit NN with jumps (uncompressed blocks) and plateaus (zero runs)") {
    val s = Array.tabulate(400) { i =>
      if (i % 50 < 25) 30000L else ((i * 9973) % 65536).toLong
    }
    roundtrip(s, RawNnMsb, 16, 10, 100)
    roundtrip(s, RawNnLsb, 16, 10, 100) // LSB output order
  }

  test("roundtrip: 32-bit NN full-range values") {
    val s = Array.tabulate(120)(i => ((i.toLong * 2654435761L) & 0xffffffffL))
    roundtrip(s, RawNnMsb, 32, 4, 30)
    roundtrip(s, RawEcLsb, 32, 4, 30)
  }

  test("roundtrip: long constant run crosses the 64-block segment boundary (ROS)") {
    // 70 blocks of J=4 in one scanline: zero run must split at block 64
    val s = Array.fill(280)(777L) ++ Array.tabulate(20)(i => (i * 7).toLong)
    roundtrip(s, RawNnMsb, 16, 4, 300)
  }

  test("roundtrip: second-extension-friendly alternating deltas win and decode") {
    // EC samples alternating 1,0: SE codes each pair in 2 bits vs 3 for FS
    val s = Array.tabulate(64)(i => (i % 2 ^ 1).toLong)
    val enc = Hdf5Fixture.szipEncode(s, RawEcMsb, 8, 8, 64)
    // 8 blocks: ID(3)+escape(1)+4 pairs × FS(γ=1 → 2 bits) = 12 bits/block
    assert(enc.length === (8 * 12 + 7) / 8, "second extension was not selected")
    assert(decodeSamples(enc, RawEcMsb, 8, 8, 64, 64) === s.toSeq)
  }

  test("roundtrip: multi-scanline references reset the NN predictor") {
    // big inter-scanline discontinuity: only correct reference handling
    // reconstructs scanline heads
    val s = Array.tabulate(90)(i => if ((i / 30) % 2 == 0) (i % 30).toLong else 200L + i % 30)
    roundtrip(s, RawNnMsb, 8, 6, 30)
  }

  test("roundtrip: final scanline shorter than one block") {
    // 10 samples, pps=8, J=4: scanline 2 has len=2 inside one padded block
    val s = Array.tabulate(10)(i => (i * 3 + 1).toLong)
    roundtrip(s, RawNnMsb, 8, 4, 8)
    roundtrip(s, RawEcMsb, 8, 4, 8)
  }

  test("output byte order is exactly MSB/LSB, checked at the byte level") {
    // one 16-bit sample 0x1234 via the no-compression option, EC: the
    // J=2 block still codes two samples (the pad is decoded + discarded)
    val bits = "1111" + "0001001000110100" + "0001001000110100"
    val bytes = bits.padTo(40, '0').grouped(8).map(x => Integer.parseInt(x, 2).toByte).toArray
    val msbOut = Szip.decode(bytes, RawEcMsb, 16, 2, 2, 1)
    assert(msbOut.take(2).toSeq === Seq(0x12.toByte, 0x34.toByte))
    val lsbOut = Szip.decode(bytes, RawEcLsb, 16, 2, 2, 1)
    assert(lsbOut.take(2).toSeq === Seq(0x34.toByte, 0x12.toByte))
  }

  // ---- guards ----------------------------------------------------------

  test("guards: >32-bit, 3-byte imagery shape, missing RAW, truncation all fail loudly") {
    val e1 = intercept[IllegalArgumentException](Szip.sampleBytes(64))
    assert(e1.getMessage.contains("wider than 32 bits"))
    val e2 = intercept[IllegalArgumentException](Szip.sampleBytes(20))
    assert(e2.getMessage.contains("cannot come from an HDF5 chunk"))
    val e3 = intercept[IllegalArgumentException](
      Szip.decode(Array[Byte](0), 32 | 16, 8, 4, 4, 4))
    assert(e3.getMessage.contains("SZ_RAW_OPTION_MASK"))
    val e4 = intercept[IllegalArgumentException](
      Szip.decode(Array[Byte](0x23), RawEcMsb, 8, 4, 4, 4)) // truncated FS vector
    assert(e4.getMessage.contains("exhausted"))
  }

  // ---- end-to-end: szip-filtered chunked variable through the reader ---

  test("szip-filtered int32 record variable reads back exactly through NcFile") {
    val c = Hdf5Fixture.Content(
      n = 12, m = 5, t = 4, fill = -99999.0,
      dry = Set((1, 2), (3, 7)), dryMax = Set(5),
      units = "seconds since 2008-09-09 00:00:00 UTC")
    val dir = Files.createTempDirectory("graft_h5szip").toString
    val p = s"$dir/fort63_szip.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeV0(c, szipWind = true))
    val nc = NcFile.open(p)
    try {
      assert(nc.varNames.contains("wind"))
      assert(nc.isRecordVar("wind"))
      (0 until c.t).foreach { t =>
        val row = nc.readRecord("wind", t)
        assert(row.length === c.n)
        (0 until c.n).foreach(nid =>
          assert(row(nid) === c.wind(t, nid), s"wind($t,$nid)"))
      }
      // the szip variable coexists with the unfiltered ones
      (0 until c.t).foreach { t =>
        val row = nc.readRecord("zeta", t)
        (0 until c.n).foreach(nid => assert(row(nid) === c.zeta(t, nid)))
      }
    } finally nc.close()
  }
}
