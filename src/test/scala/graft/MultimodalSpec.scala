package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{MediaHeaders, Multimodal}

/** Multimodal plumbing tests: binary payload schema, per-partition decode
  * batch shape, stub determinism, and the REAL container-header parsers
  * (PNG IHDR / JPEG SOF walk / RIFF-WAVE fmt chunk). */
class MultimodalSpec extends SparkSpec {

  test("header parsers read planted dims from real container bytes") {
    val tail = "pixel data stand-in".getBytes("UTF-8")
    assert(MediaHeaders.pngDims(Multimodal.pngBytes(640, 480, tail)) === Some((640, 480)))
    // the JPEG walk must step over APP0 and COM segments to reach SOF0
    assert(MediaHeaders.jpegDims(Multimodal.jpegBytes(1920, 1080, tail)) === Some((1920, 1080)))
    assert(MediaHeaders.wavFormat(Multimodal.wavBytes(2, 44100, tail)) === Some((2, 44100)))
    // corrupt signatures parse to None (callers fall back to the stub)
    val broken = Multimodal.pngBytes(640, 480, tail); broken(0) = 0
    assert(MediaHeaders.pngDims(broken) === None)
    assert(MediaHeaders.jpegDims(Array[Byte](1, 2, 3, 4)) === None)
    assert(MediaHeaders.wavFormat("RIFFxxxxNOPE".getBytes("US-ASCII")) === None)
  }

  test("decodeFeatures over the asset table parses every format's real header") {
    val feats = Multimodal.decodeFeatures(Multimodal.assetTable(spark, sf)).collect()
    assert(feats.length === Tables.documents(spark, sf).count())
    feats.foreach { f =>
      f.mime match {
        case "image/png" | "image/jpeg" =>
          val (w, h) = Multimodal.dimsOf(f.doc_id)
          assert((f.width, f.height) === ((w, h)), s"doc ${f.doc_id} ${f.mime}")
        case "audio/wav" =>
          assert(f.width === 1 + (f.doc_id % 2).toInt,  s"doc ${f.doc_id} channels")
          assert(f.height === 8000 * (1 + (f.doc_id % 6).toInt), s"doc ${f.doc_id} rate")
        case other => fail(s"unexpected mime $other")
      }
    }
  }

  test("media table carries a real BINARY payload column") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName === "binary")
    val r = m.orderBy("doc_id").limit(1).collect().head
    val payload = r.getAs[Array[Byte]]("payload")
    assert(payload.nonEmpty)
    assert(Set("image/png", "audio/wav", "video/mp4").contains(r.getAs[String]("mime")))
  }

  test("decodeFeatures preserves row count and is deterministic") {
    val feats1 = Multimodal.decodeFeatures(Multimodal.media(spark, sf)).collect()
    val feats2 = Multimodal.decodeFeatures(Multimodal.media(spark, sf)).collect()
    assert(feats1.length === Multimodal.mediaTable(spark, sf).count())
    assert(feats1.map(_.toString).sorted.toSeq === feats2.map(_.toString).sorted.toSeq)
    feats1.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.width >= 64 && f.width <= 176 && f.height >= 64 && f.height <= 176)
    }
  }

  test("stub decode matches a direct invocation (plumbing adds nothing)") {
    val row = Multimodal.media(spark, sf).filter(col("doc_id") === 7).collect().head
    val (w, h, sum) = Multimodal.decodeStub(row.payload)
    val viaPlumbing = Multimodal.decodeFeatures(Multimodal.media(spark, sf))
      .filter(col("doc_id") === 7).collect().head
    assert((viaPlumbing.width, viaPlumbing.height, viaPlumbing.checksum) === ((w, h, sum)))
  }

  test("metadata query never exceeds limit and derives stable pseudo-dims") {
    val out = Multimodal.qMultimodalMeta(spark, sf).collect()
    assert(out.length === 200)
    assert(out.forall { r =>
      val w = r.getAs[Long]("width"); w >= 64 && w <= 176 && w % 16 === 0
    })
  }

  test("sampleFrames fans each video row out to its stride-sampled frames") {
    import graft.multimodal.Multimodal
    val m = Multimodal.media(spark, sf).filter(_.payload.length >= 100)
    val frames = Multimodal.sampleFrames(m, frameBytes = 100, stride = 10).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.doc_id)
    val lens = m.collect().map(x => x.doc_id -> x.payload.length).toMap
    byDoc.foreach { case (doc, fs) =>
      val expected = (0 until lens(doc) / 100 by 10).toSeq
      assert(fs.map(_.frame_idx).sorted.toSeq === expected)
      assert(fs.forall(_.frame_bytes.length == 100))
    }
    // the relational frames query agrees on (doc, frame) membership
    val rel = Multimodal.qMultimodalFrames(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("frame_idx").toInt)).toSet
    val typedSet = frames.filter(f => f.doc_id % 3 == 2).map(f => (f.doc_id, f.frame_idx)).toSet
    assert(rel.subsetOf(typedSet)) // rel is LIMITed; typed covers all videos
  }

  test("decodeWavStats: true s16le PCM decode — sign extension, odd tail, RIFF walk") {
    import spark.implicits._
    // planted samples cover both sign branches and the extremes; an odd
    // trailing byte must be dropped (whole 16-bit frames only) — the
    // cases the ASCII fixture corpus can never trigger (high byte < 0x80)
    val samples = Seq[Short](1000, -2, 32767, -32768)
    val data = samples.flatMap(s =>
      Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray :+ 0x7f.toByte
    val wav = Multimodal.wavBytes(2, 44100, data)
    assert(MediaHeaders.wavData(wav).exists { case (off, len) => len == data.length })
    val out = Multimodal.decodeWavStats(
      Seq(Multimodal.Media(7L, "audio/wav", wav)).toDS()).collect()
    assert(out.length === 1)
    val st = out.head
    assert(st.channels === 2L && st.sample_rate === 44100L)
    assert(st.n_samples === 4L, "odd trailing byte must not count as a sample")
    assert(st.peak === 32768L)
    assert(st.sum_s === 1000L - 2L + 32767L - 32768L)
    assert(st.energy === 1000L * 1000 + 4 + 32767L * 32767 + 32768L * 32768)
    // non-wav mimes and truncated containers yield no row, never garbage
    assert(Multimodal.decodeWavStats(
      Seq(Multimodal.Media(8L, "image/png", wav),
          Multimodal.Media(9L, "audio/wav", wav.take(10))).toDS()).count() === 0L)
  }

  test("decodeBmpStats: true 24bpp decode — orientation, stride pads, truncation") {
    import spark.implicits._
    // 2x2 image, image-order B,G,R bytes; row 0 sums differ from row 1
    // so a file-order reader (no orientation normalization) is caught
    val pix = Array[Byte](10, 20, 30, 40, 50, 60, /* row 0 */
                          1, 2, 3, 4, 5, 6)       /* row 1 */
    val up = Multimodal.bmpBytes(2, 2, topDown = false, pix)
    val down = Multimodal.bmpBytes(2, 2, topDown = true, pix)
    val out = Multimodal.decodeBmpStats(
      Seq(Multimodal.Media(1L, "image/bmp", up),
          Multimodal.Media(2L, "image/bmp", down)).toDS())
      .collect().sortBy(_.doc_id)
    assert(out.length === 2)
    // both orientations must decode to the SAME image-space statistics
    out.foreach { st =>
      assert(st.width === 2L && st.height === 2L && st.n_pixels === 4L)
      assert(st.sum_b === 10L + 40 + 1 + 4)
      assert(st.sum_g === 20L + 50 + 2 + 5)
      assert(st.sum_r === 30L + 60 + 3 + 6)
      assert(st.top_row_sum === 10L + 20 + 30 + 40 + 50 + 60,
        "top row is IMAGE row 0 — stored last in a bottom-up file")
    }
    // width 1, all-zero pixels: stride 4 plants a 0xAA pad byte per row —
    // any decoder that sums raw file rows reads 170 per row, not 0
    val zero = Multimodal.bmpBytes(1, 3, topDown = false, Array.fill(9)(0.toByte))
    val zst = Multimodal.decodeBmpStats(
      Seq(Multimodal.Media(3L, "image/bmp", zero)).toDS()).collect().head
    assert(zst.sum_b === 0L && zst.sum_g === 0L && zst.sum_r === 0L &&
      zst.top_row_sum === 0L, "stride pad bytes must be excluded")
    // truncated container, foreign mime, and non-24bpp yield no row
    val bpp32 = up.clone(); bpp32(28) = 32.toByte
    assert(Multimodal.decodeBmpStats(
      Seq(Multimodal.Media(4L, "image/bmp", up.take(53)),
          Multimodal.Media(5L, "image/bmp", up.dropRight(1)),
          Multimodal.Media(6L, "audio/wav", up),
          Multimodal.Media(7L, "image/bmp", bpp32)).toDS()).count() === 0L)
  }

  test("decodePngStats: inflate + every scanline filter reverses to the planted pixels") {
    import spark.implicits._
    // 4x5 RGB ramp — every channel value distinct, so a single
    // mis-reversed byte moves a sum
    val w = 4; val h = 5
    val pix = Array.tabulate(3 * w * h)(i => ((i * 7 + 3) % 251).toByte)
    def statsOf(filterOf: Int => Int) = {
      val png = Multimodal.pngFullBytes(w, h, pix, filterOf)
      Multimodal.decodePngStats(
        Seq(Multimodal.Media(1L, "image/png", png)).toDS()).collect().head
    }
    val expR = (0 until 3 * w * h by 3).map(i => (pix(i) & 0xff).toLong).sum
    val expG = (1 until 3 * w * h by 3).map(i => (pix(i) & 0xff).toLong).sum
    val expB = (2 until 3 * w * h by 3).map(i => (pix(i) & 0xff).toLong).sum
    val expTop = (0 until 3 * w).map(i => (pix(i) & 0xff).toLong).sum
    // each filter type alone, then the production mix (id+row)%5
    for (f <- 0 to 4; st = statsOf(_ => f)) {
      assert((st.width, st.height, st.n_pixels) === ((w.toLong, h.toLong, (w * h).toLong)))
      assert((st.sum_r, st.sum_g, st.sum_b, st.top_row_sum) ===
        ((expR, expG, expB, expTop)), s"filter $f mis-reversed")
    }
    val mixed = statsOf(r => (1 + r) % 5)
    assert((mixed.sum_r, mixed.sum_g, mixed.sum_b) === ((expR, expG, expB)))

    // refusals: truncated IDAT, interlaced, wrong color type, foreign
    // mime, corrupt zlib — NO row, never garbage
    val good = Multimodal.pngFullBytes(w, h, pix, _ => 4)
    val interlaced = good.clone(); interlaced(8 + 4 + 4 + 12) = 1.toByte // IHDR interlace byte
    val gray = good.clone(); gray(8 + 4 + 4 + 9) = 0.toByte              // color type 0
    val corrupt = good.clone(); corrupt(good.length - 20) = (corrupt(good.length - 20) ^ 0x5a).toByte
    assert(Multimodal.decodePngStats(Seq(
      Multimodal.Media(2L, "image/png", good.take(good.length / 2)),
      Multimodal.Media(3L, "image/png", interlaced),
      Multimodal.Media(4L, "image/png", gray),
      Multimodal.Media(5L, "audio/wav", good),
      Multimodal.Media(6L, "image/png", corrupt)).toDS()).count() === 0L)

    // the asset table round-trips: decode recovers the planting formula
    val assets = Multimodal.pngAssetTable(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty)
      .collect().toMap
    val decoded = Multimodal.decodePngStats(assets).collect()
    assert(decoded.length === docs.size, "every planted PNG must decode")
    decoded.take(50).foreach { st =>
      val t = docs(st.doc_id).getBytes("US-ASCII")
      val n = (3 * st.width * st.height).toInt
      val exp = (0 until n).map(p => (t(p % t.length) & 0xff).toLong)
      assert(st.sum_r === exp.indices.collect { case i if i % 3 == 0 => exp(i) }.sum)
      assert(st.sum_b === exp.indices.collect { case i if i % 3 == 2 => exp(i) }.sum)
    }
  }

  test("decodeGifStats: general LZW — dictionary entries, KwKwK, width bump, refusals") {
    import spark.implicits._
    // round-trip through the root-code encoder (clear-every-250 keeps
    // the width at 9; the decoder must track clears exactly)
    val w = 7; val h = 4
    val pix = Array.tabulate(w * h)(i => ((i * 11 + 5) % 251).toByte)
    val st = Multimodal.decodeGifStats(
      Seq(Multimodal.Media(1L, "image/gif", Multimodal.gifBytes(w, h, pix))).toDS())
      .collect().head
    assert((st.width, st.height, st.n_pixels) === ((w.toLong, h.toLong, (w * h).toLong)))
    assert(st.sum_idx === pix.map(b => (b & 0xff).toLong).sum)
    assert(st.top_row_sum === pix.take(w).map(b => (b & 0xff).toLong).sum)
    // a long uniform image exercises CLEAR handling across sub-blocks
    val big = Array.fill(1000)(65.toByte)
    val bigSt = Multimodal.decodeGifStats(
      Seq(Multimodal.Media(2L, "image/gif", Multimodal.gifBytes(250, 4, big))).toDS())
      .collect().head
    assert(bigSt.sum_idx === 65000L && bigSt.n_pixels === 1000L)

    // handcrafted DICTIONARY stream with the KwKwK corner: codes
    // [CLEAR, 1, 258, 259, EOI] decode to pixels [1, 1,1, 1,1,1]
    // (258 is the not-yet-defined entry = prev + first(prev); 259 chains
    // it again), n = 6 — a decoder that defines entries in the wrong
    // order or mis-times the width bump desyncs here
    def handGif(codes: Seq[Int], w: Int, h: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF87a".getBytes("US-ASCII"))
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      u16(w); u16(h); out.write(0xF7); out.write(0); out.write(0)
      (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
      out.write(0x2C); u16(0); u16(0); u16(w); u16(h); out.write(0); out.write(8)
      var acc = 0L; var nBits = 0
      val bits = new java.io.ByteArrayOutputStream()
      codes.foreach { c =>
        acc |= (c.toLong << nBits); nBits += 9
        while (nBits >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
      }
      if (nBits > 0) bits.write((acc & 0xff).toInt)
      val data = bits.toByteArray
      out.write(data.length); out.write(data, 0, data.length)
      out.write(0); out.write(0x3B)
      out.toByteArray
    }
    val kw = Multimodal.decodeGifStats(
      Seq(Multimodal.Media(3L, "image/gif", handGif(Seq(256, 1, 258, 259, 257), 6, 1))).toDS())
      .collect().head
    assert(kw.n_pixels === 6L && kw.sum_idx === 6L && kw.top_row_sum === 6L,
      s"KwKwK chain must decode to six 1-pixels: $kw")

    // refusals: truncated data, missing EOI, wrong pixel count,
    // interlace, foreign mime — NO row
    val good = Multimodal.gifBytes(w, h, pix)
    val interlaced = good.clone()
    val imgOff = 13 + 768 // image descriptor offset
    interlaced(imgOff + 9) = (interlaced(imgOff + 9) | 0x40).toByte
    assert(Multimodal.decodeGifStats(Seq(
      Multimodal.Media(4L, "image/gif", good.take(good.length - 8)),
      Multimodal.Media(5L, "image/gif", interlaced),
      Multimodal.Media(6L, "image/png", good),
      Multimodal.Media(7L, "image/gif", handGif(Seq(256, 1, 257), 6, 1))).toDS()).count() === 0L,
      "truncated / interlaced / foreign / underfilled containers must refuse")

    // asset round-trip against the planting formula
    val assets = Multimodal.gifAssetTable(spark, sf)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty).collect().toMap
    val decoded = Multimodal.decodeGifStats(assets).collect()
    assert(decoded.length === docs.size)
    decoded.take(40).foreach { g =>
      val t = docs(g.doc_id).getBytes("US-ASCII")
      val exp = (0 until (g.width * g.height).toInt).map(p => (t(p % t.length) & 0xff).toLong).sum
      assert(g.sum_idx === exp, s"doc ${g.doc_id}")
    }
  }

  test("decodeJpegStats: Huffman vectors, AC-bearing IDCT block, DC prediction, refusals") {
    import spark.implicits._
    // (1) canonical Huffman build — hand-checked vectors off the Annex K
    // DC-luminance spec (bits = 0,1,5,1,1,1,1,1,1): category 0 is the
    // lone 2-bit code 00, categories 1-5 take 010..110, then one code
    // per length up to 11111110
    val dc = Multimodal.jpegCanonical(
      Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
      (0 to 11).map(_.toByte).toArray)
    assert(dc(0) === ((0, 2)))
    assert(dc(1) === ((2, 3)) && dc(5) === ((6, 3)))
    assert(dc(6) === ((0xe, 4)) && dc(7) === ((0x1e, 5)) && dc(8) === ((0x3e, 6)))
    // (2) zig-zag sanity: the spec's first anti-diagonals
    assert(Multimodal.jpegZigzag.take(10).toSeq ===
      Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    // (3) one AC-BEARING 8x8 block pinned against a first-principles
    // IDCT: Y carries DC + three AC coefficients, Cb/Cr are flat 128
    // (zero coefficients), so RGB = Y exactly and any Huffman/run-length
    // /de-zig-zag/dequant/IDCT slip moves a sum
    val zzY = new Array[Int](64)
    zzY(0) = 5; zzY(1) = 3; zzY(3) = -2; zzY(20) = 1
    val jfif = Multimodal.jfifCoefBytes(8, 8, Array(
      Array(zzY), Array(new Array[Int](64)), Array(new Array[Int](64))))
    val cosT = Array.tabulate(8, 8) { (x, u) =>
      (if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0) *
        StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
    }
    val got = Multimodal.decodeOneJpeg(jfif, cosT)
    assert(got.isDefined, "the AC-bearing vector must decode")
    val (w8, h8, rgb) = got.get
    assert((w8, h8) === ((8, 8)))
    // first principles: de-zig-zag, dequant by the flat step 8, direct
    // 2-D IDCT, level shift, clamp
    val coefNat = new Array[Int](64)
    (0 until 64).foreach(k => coefNat(Multimodal.jpegZigzag(k)) = zzY(k) * 8)
    val expY = Array.tabulate(64) { i =>
      val x = i % 8; val y = i / 8
      var sum = 0.0
      for (v <- 0 until 8; u <- 0 until 8)
        sum += cosT(x)(u) * cosT(y)(v) * coefNat(v * 8 + u)
      val px = math.floor(sum * 0.25 + 128.0 + 0.5).toInt
      math.max(0, math.min(255, px))
    }
    (0 until 64).foreach { i =>
      assert(rgb(3 * i) === expY(i) && rgb(3 * i + 1) === expY(i) &&
             rgb(3 * i + 2) === expY(i), s"pixel $i")
    }
    assert(expY.distinct.length > 4, "the vector must produce a non-flat block")

    // (4) DC prediction chain + YCbCr: the planting roundtrip on real docs
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty)
      .collect().toMap
    val decoded = Multimodal.decodeJpegStats(
      Multimodal.jpegAssetTable(spark, sf)).collect()
    assert(decoded.length === docs.size, "every planted JPEG must decode")
    decoded.take(50).foreach { st =>
      val t = docs(st.doc_id).getBytes("US-ASCII")
      val wb = (st.width / 8).toInt; val hb = (st.height / 8).toInt
      def cl(x: Double): Long = math.max(0, math.min(255, math.floor(x + 0.5).toLong))
      val blocks = (0 until wb * hb).map { b =>
        val y = (t((3 * b) % t.length) & 0xff).toDouble
        val cb = (t((3 * b + 1) % t.length) & 0xff) - 128.0
        val cr = (t((3 * b + 2) % t.length) & 0xff) - 128.0
        (cl(y + 1.402 * cr), cl(y - 0.344136 * cb - 0.714136 * cr), cl(y + 1.772 * cb))
      }
      assert(st.sum_r === 64 * blocks.map(_._1).sum, s"doc ${st.doc_id} sum_r")
      assert(st.sum_g === 64 * blocks.map(_._2).sum, s"doc ${st.doc_id} sum_g")
      assert(st.sum_b === 64 * blocks.map(_._3).sum, s"doc ${st.doc_id} sum_b")
      assert(st.top_row_sum ===
        8 * blocks.take(wb).map(b => b._1 + b._2 + b._3).sum)
    }

    // (5) refusal classes — NO row, never garbage
    def patch(b: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = b.clone(); f(c); c
    }
    def findMarker(b: Array[Byte], mk: Int): Int = {
      var i = 2
      while (i + 1 < b.length &&
             !((b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == mk)) i += 1
      i
    }
    val good = jfif
    val sof = findMarker(good, 0xc0)
    val dqt = findMarker(good, 0xdb)
    val progressive = patch(good)(c => c(sof + 1) = 0xc2.toByte)
    val arithmetic = patch(good)(c => c(sof + 1) = 0xc9.toByte)
    val prec12 = patch(good)(c => c(sof + 4) = 12.toByte)
    val subsampled = patch(good)(c => c(sof + 11) = 0x22.toByte)
    val dqt16 = patch(good)(c => c(dqt + 4) = 0x10.toByte)
    val truncated = good.take(good.length - 6)
    assert(Multimodal.decodeJpegStats(Seq(
      Multimodal.Media(2L, "image/jpeg", progressive),
      Multimodal.Media(3L, "image/jpeg", arithmetic),
      Multimodal.Media(4L, "image/jpeg", prec12),
      Multimodal.Media(5L, "image/jpeg", subsampled),
      Multimodal.Media(6L, "image/jpeg", dqt16),
      Multimodal.Media(7L, "image/jpeg", truncated),
      Multimodal.Media(8L, "image/png", good)).toDS()).count() === 0L)
  }

  test("resizeStub shrinks payloads by the factor, deterministically") {
    import graft.multimodal.Multimodal
    val m = Multimodal.media(spark, sf).limit(20)
    val r1 = Multimodal.resizeStub(m, 4).collect().sortBy(_.doc_id)
    val r2 = Multimodal.resizeStub(m, 4).collect().sortBy(_.doc_id)
    val orig = m.collect().sortBy(_.doc_id)
    r1.zip(orig).foreach { case (r, o) => assert(r.payload.length === o.payload.length / 4) }
    r1.zip(r2).foreach { case (a, b) => assert(a.payload.toSeq === b.payload.toSeq) }
  }
}
