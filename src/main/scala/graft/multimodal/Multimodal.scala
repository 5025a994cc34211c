package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns (SURVEY §2 EXT): image/audio/video payloads as opaque
  * BINARY columns with typed metadata, plus the batch decode/feature-extract
  * plumbing a training-data pipeline needs.
  *
  * Spark-side design (all real and tested):
  *  - payloads are `BinaryType` columns — Parquet stores them as BYTE_ARRAY
  *    pages, so column pruning keeps metadata-only queries from ever reading
  *    the bytes (critical at 100 TB: scanning (doc_id, mime, n_bytes) must
  *    not touch the media pages);
  *  - metadata travels as ordinary typed columns next to the payload;
  *  - decode/resize/frame-sample runs per-PARTITION (`mapPartitions` over a
  *    typed Dataset), so a real codec would amortize init (decoder tables,
  *    native contexts) across the partition — the JVM analogue of a
  *    batch-iterating Pandas UDF.
  *
  * The codec itself is a clearly-marked deterministic STUB — no image/audio
  * libraries exist in this environment. `decodeStub` derives fake features
  * from the bytes; swap `decodeStub` for a real codec and nothing else
  * changes (schema, partitioning, batch shape are the contract).
  */
object Multimodal {

  case class Media(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, mime: String, n_bytes: Long,
                           width: Int, height: Int, checksum: Long)

  /** Simulated media table: the documents corpus with a BINARY payload
    * (UTF-8 bytes of the text — deterministic) and a mime type. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
              element_at(array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
                         (col("doc_id") % 3 + 1).cast("int")).as("mime"),
              encode(col("text"), "UTF-8").as("payload"))

  // ---- real containers (header-level) -----------------------------------

  /** Planted per-doc dimensions, recomputable in pure SQL (the oracle). */
  private[graft] def dimsOf(docId: Long): (Int, Int) =
    (16 * (1 + (docId % 32).toInt), 16 * (1 + ((docId / 32) % 32).toInt))

  /** Minimal VALID PNG: signature + IHDR chunk, payload appended after
    * (parsers stop at IHDR; the tail models the pixel data's bulk). */
  private[graft] def pngBytes(w: Int, h: Int, tail: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(33 + tail.length)
    b.put(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    b.putInt(13).put("IHDR".getBytes("US-ASCII"))
    b.putInt(w).putInt(h)
    b.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    b.putInt(0) // CRC (not validated by header readers)
    b.put(tail)
    b.array()
  }

  /** Minimal VALID JPEG/JFIF prefix: SOI, APP0, COM, then SOF0 carrying
    * the dimensions — parsers must walk past the variable segments. */
  private[graft] def jpegBytes(w: Int, h: Int, tail: Array[Byte]): Array[Byte] = {
    val app0 = Array[Byte]('J', 'F', 'I', 'F', 0, 1, 2, 0, 0, 1, 0, 1, 0, 0)
    val com = "graft".getBytes("US-ASCII")
    val b = java.nio.ByteBuffer.allocate(4 + (2 + 2 + app0.length) +
      (2 + 2 + com.length) + (2 + 2 + 15) + tail.length)
    b.putShort(0xffd8.toShort)                              // SOI
    b.putShort(0xffe0.toShort).putShort((2 + app0.length).toShort).put(app0)
    b.putShort(0xfffe.toShort).putShort((2 + com.length).toShort).put(com)
    b.putShort(0xffc0.toShort).putShort(17.toShort)         // SOF0, len 17
    b.put(8.toByte).putShort(h.toShort).putShort(w.toShort) // precision, H, W
    b.put(3.toByte)                                         // 3 components
    (1 to 3).foreach(c => b.put(c.toByte).put(0x11.toByte).put(0.toByte))
    b.put(tail)
    b.array()
  }

  /** Minimal VALID RIFF/WAVE: fmt chunk with (channels, sampleRate),
    * then a data chunk holding the tail. */
  private[graft] def wavBytes(channels: Int, rate: Int, tail: Array[Byte]): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(44 + tail.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + tail.length)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(channels.toShort).putInt(rate)
    b.putInt(rate * channels * 2).putShort((channels * 2).toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(tail.length)
    b.put(tail)
    b.array()
  }

  /** Asset table with REAL container bytes: PNG / JPEG / WAV round-robin
    * by doc_id, planted dims `dimsOf(doc_id)` (WAV: channels 1 + id%2,
    * rate 8000·(1 + id%6)), document text as the payload bulk. Typed
    * synthesis path — the engine-side consumers read it as an ordinary
    * (doc_id, mime, payload) relation. */
  def assetTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val tail = text.getBytes("UTF-8")
        val (w, h) = dimsOf(id)
        (id % 3) match {
          case 0 => Media(id, "image/png", pngBytes(w, h, tail))
          case 1 => Media(id, "image/jpeg", jpegBytes(w, h, tail))
          case _ => Media(id, "audio/wav",
            wavBytes(1 + (id % 2).toInt, 8000 * (1 + (id % 6).toInt), tail))
        }
      }
  }

  /** STUB codec: deterministic pseudo-decode of a payload. A real
    * implementation would parse the container header (PNG IHDR / WAV fmt /
    * MP4 moov); the stub derives stable dimensions from payload bytes. */
  private[graft] def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
    var h = 1125899906842597L // FNV-ish rolling hash over the payload
    var i = 0
    while (i < payload.length) { h = h * 31 + payload(i); i += 1 }
    val width = 64 + (math.abs(h) % 8).toInt * 16
    val height = 64 + (math.abs(h / 8) % 8).toInt * 16
    (width, height, h)
  }

  /** Per-partition batch decode: Dataset[Media] → Dataset[MediaFeatures].
    * One decoder init per partition (the `iter =>` prefix is where a real
    * codec would allocate native context), then a streaming map. PNG/JPEG
    * dimensions and WAV (channels, sampleRate) come from REAL header
    * parsing ([[MediaHeaders]]) — no pixel/sample decode; the stub remains
    * the fallback for mimes with no header parser (where a true codec
    * would sit). */
  def decodeFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // real codec: allocate decoder context here, once per partition
      iter.map { m =>
        val parsed = m.mime match {
          case "image/png"  => MediaHeaders.pngDims(m.payload)
          case "image/jpeg" => MediaHeaders.jpegDims(m.payload)
          case "audio/wav"  => MediaHeaders.wavFormat(m.payload)
          case _            => None
        }
        val (w, h, sum) = parsed match {
          case Some((a, b)) =>
            var hh = 1125899906842597L
            var i = 0
            while (i < math.min(m.payload.length, 64)) { hh = hh * 31 + m.payload(i); i += 1 }
            (a, b, hh)
          case None => decodeStub(m.payload)
        }
        MediaFeatures(m.doc_id, m.mime, m.payload.length.toLong, w, h, sum)
      }
    }
  }

  /** Typed entry: the media table as a Dataset[Media]. */
  def media(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    mediaTable(s, d).as[Media]
  }

  /** EXT (oracle-checked): metadata-only scan over the media table — byte
    * length and md5-derived pseudo-dimensions per mime type. Demonstrates
    * that metadata queries never decode payloads (pure column math). */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame = {
    val h = md5(col("payload"))
    mediaTable(s, d)
      .select(col("doc_id"), col("mime"),
              length(col("payload")).cast("long").as("n_bytes"),
              (lit(64) + (ascii(substring(h, 1, 1)) % 8) * 16).cast("long").as("width"),
              (lit(64) + (ascii(substring(h, 2, 1)) % 8) * 16).cast("long").as("height"))
      .orderBy("doc_id")
      .limit(200)
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Frame sampling plumbing: one video row fans out to every stride-th
    * "frame" (a payload slice in the stub; a real codec seeks keyframes).
    * flatMap inside mapPartitions keeps the one-decoder-per-partition
    * shape; output rows carry only the sampled frames, so downstream
    * (feature extraction, dedup of frames) never holds whole videos. */
  def sampleFrames(media: Dataset[Media], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // real codec: demuxer/decoder context allocated here, per partition
      iter.flatMap { m =>
        val nFrames = m.payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          Frame(m.doc_id, f, java.util.Arrays.copyOfRange(
            m.payload, f * frameBytes, math.min((f + 1) * frameBytes, m.payload.length)))
        }
      }
    }
  }

  /** Resize plumbing stub: deterministic byte-decimation standing in for a
    * pixel resample — contract is (payload, target) → smaller payload,
    * same per-partition batch shape as [[decodeFeatures]]. */
  def resizeStub(media: Dataset[Media], factor: Int): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.map { m =>
        val out = Array.tabulate(m.payload.length / factor)(i => m.payload(i * factor))
        Media(m.doc_id, m.mime, out)
      }
    }
  }

  /** EXT (oracle-checked): the frame-sampling SHAPE relationally — video
    * rows explode to (doc_id, frame_idx, byte_off) for every 10th frame
    * of 100 bytes. The explode is the plan fact that matters at scale:
    * a generator, not a join, and byte offsets mean a reader can fetch
    * sampled frames with range requests instead of whole payloads. */
  def qMultimodalFrames(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .filter(col("mime") === "video/mp4" && length(col("payload")) >= 100)
      .select(col("doc_id"),
              explode(sequence(lit(0), (length(col("payload")) / lit(100)).cast("int") - 1,
                               lit(10))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
              (col("frame_idx") * 100).cast("long").as("byte_off"))
      .orderBy("doc_id", "frame_idx")
      .limit(500)

  /** EXT (oracle-checked): REAL header parsing in pure Column expressions —
    * PNG dimensions read out of the IHDR bytes with substring/hex/conv
    * (all codegen'd, no UDF, no mapPartitions). The signature filter and
    * the byte offsets are the PNG 1.2 spec; the oracle recomputes the
    * dims from the PLANTING formula, so any mis-parse hash-mismatches.
    * At 100 TB: this is a header-range read per asset — never the body. */
  def qMultimodalHeaders(s: SparkSession, d: String): DataFrame =
    assetTable(s, d).toDF()
      .filter(col("mime") === "image/png" &&
              hex(substring(col("payload"), 1, 8)) === "89504E470D0A1A0A")
      .select(col("doc_id"),
              conv(hex(substring(col("payload"), 17, 4)), 16, 10).cast("long").as("width"),
              conv(hex(substring(col("payload"), 21, 4)), 16, 10).cast("long").as("height"))
      .orderBy("doc_id")

  case class WavStats(doc_id: Long, channels: Long, sample_rate: Long,
                      n_samples: Long, peak: Long, sum_s: Long, energy: Long)

  /** TRUE content decode (r13 verdict #8 — the one real codec in the
    * mapPartitions seam): 16-bit little-endian PCM sample statistics
    * from the WAV assets' `data` chunk. Pure-JVM (the Szip precedent:
    * no native deps), a REAL decoder shape — RIFF chunk walk
    * ([[MediaHeaders.wavData]]), sign-extended s16le reads, whole
    * frames only — and every statistic is exact integer arithmetic
    * (count / peak-abs / sum / energy), so the result hashes. */
  def decodeWavStats(media: Dataset[Media]): Dataset[WavStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // real-codec seam: per-partition init would go here
      iter.flatMap { m =>
        if (m.mime != "audio/wav") None
        else for {
          (ch, rate) <- MediaHeaders.wavFormat(m.payload)
          (off, len) <- MediaHeaders.wavData(m.payload)
        } yield {
          val n = len / 2 // complete 16-bit samples; a trailing odd byte drops
          var i = 0
          var peak = 0L; var sum = 0L; var energy = 0L
          while (i < n) {
            val s = ((m.payload(off + 2 * i) & 0xff) |
                     (m.payload(off + 2 * i + 1).toInt << 8)).toShort.toLong
            if (math.abs(s) > peak) peak = math.abs(s)
            sum += s; energy += s * s
            i += 1
          }
          WavStats(m.doc_id, ch.toLong, rate.toLong, n.toLong, peak, sum, energy)
        }
      }
    }
  }

  /** EXT (oracle-checked): the decoded-sample statistics table. The
    * oracle replays the whole decode in SQL — the corpus text is ASCII
    * (verified property of the fixture), so byte k of the data chunk is
    * `ascii(substring(text, k+1, 1))` and each s16le sample is
    * b0 + 256·b1 (sign case included for form's sake; ASCII high bytes
    * < 0x80 never trigger it) — the q_warc_documents convention: one
    * hashed query gates the RIFF walk, the sample framing AND the
    * arithmetic. */
  def qMultimodalDecode(s: SparkSession, d: String): DataFrame =
    decodeWavStats(assetTable(s, d)).toDF().orderBy("doc_id")

  // ---- second true codec: uncompressed 24bpp BMP (r13 verdict #8 named
  // BMP-or-PCM; PCM landed first, this closes the image side) ----------

  /** Minimal VALID Windows BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * 24bpp, BI_RGB): `pix` is 3·w·h bytes in IMAGE order (row 0 = top,
    * B,G,R per pixel); the builder handles the two things that make BMP
    * decode nontrivial — 4-byte row stride padding (planted 0xAA so a
    * decoder that sums raw rows is caught) and bottom-up vs top-down
    * row order (`topDown` ⇒ negative biHeight, the spec's convention). */
  private[graft] def bmpBytes(w: Int, h: Int, topDown: Boolean,
                              pix: Array[Byte]): Array[Byte] = {
    require(pix.length == 3 * w * h, "pix must be 3*w*h image-order bytes")
    val stride = ((3 * w + 3) / 4) * 4
    val size = 54 + stride * h
    val b = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
    b.putShort(0).putShort(0).putInt(54)                  // reserved, pixel offset
    b.putInt(40).putInt(w).putInt(if (topDown) -h else h) // BITMAPINFOHEADER
    b.putShort(1).putShort(24).putInt(0).putInt(stride * h) // planes, bpp, BI_RGB
    b.putInt(2835).putInt(2835).putInt(0).putInt(0)       // 72 dpi, palette
    var fr = 0
    while (fr < h) {
      val ir = if (topDown) fr else h - 1 - fr // image row stored at file row fr
      var c = 0
      while (c < 3 * w) { b.put(pix(ir * 3 * w + c)); c += 1 }
      while (c < stride) { b.put(0xAA.toByte); c += 1 }
      fr += 1
    }
    b.array()
  }

  /** BMP asset table: every document becomes a real 24bpp BMP — planted
    * dims (w = 1 + id%8, h = 1 + (id/8)%4), ORIENTATION by id parity
    * (odd = top-down/negative height), pixel byte p (image order) =
    * text byte p mod |text| (the ASCII corpus property the WAV oracle
    * established makes this SQL-replayable). Empty-text docs carry no
    * pixels and are skipped on both sides. */
  def bmpAssetTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id", "text").as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty)
      .map { case (id, text) =>
        val w = 1 + (id % 8).toInt
        val h = 1 + ((id / 8) % 4).toInt
        val t = text.getBytes("US-ASCII")
        val pix = Array.tabulate(3 * w * h)(p => t(p % t.length))
        Media(id, "image/bmp", bmpBytes(w, h, topDown = id % 2 == 1, pix))
      }
  }

  case class BmpStats(doc_id: Long, width: Long, height: Long, n_pixels: Long,
                      sum_b: Long, sum_g: Long, sum_r: Long, top_row_sum: Long)

  /** TRUE pixel decode in the mapPartitions seam: header-validated
    * (magic, 24bpp, BI_RGB, payload covers offset + stride·|h| — a
    * truncated or foreign container yields NO row, never garbage),
    * stride-aware row walk that EXCLUDES the pad bytes, and orientation
    * normalization (bottom-up files are read last-row-first) so stats
    * are in image space. Channel sums are order-independent — the
    * orientation gate is `top_row_sum` (image row 0 lives at the END of
    * a bottom-up file). Exact integer arithmetic throughout, so the
    * result hashes. */
  def decodeBmpStats(media: Dataset[Media]): Dataset[BmpStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // real-codec seam: per-partition init would go here
      iter.flatMap { m =>
        val p = m.payload
        def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
        def s32(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
          ((p(o + 2) & 0xff) << 16) | (p(o + 3) << 24)
        if (m.mime != "image/bmp" || p.length < 54 || p(0) != 'B' || p(1) != 'M') None
        else {
          val off = s32(10); val w = s32(18); val hRaw = s32(22)
          val h = math.abs(hRaw); val topDown = hRaw < 0
          val stride = ((3L * w + 3) / 4) * 4
          if (u16(28) != 24 || s32(30) != 0 || w <= 0 || h == 0 ||
              off < 54 || off + stride * h > p.length) None
          else {
            var sb = 0L; var sg = 0L; var sr = 0L; var top = 0L
            var ir = 0
            while (ir < h) {
              val fr = if (topDown) ir else h - 1 - ir
              val base = off + fr * stride.toInt
              var c = 0
              while (c < w) {
                val vb = p(base + 3 * c) & 0xff
                val vg = p(base + 3 * c + 1) & 0xff
                val vr = p(base + 3 * c + 2) & 0xff
                sb += vb; sg += vg; sr += vr
                if (ir == 0) top += vb + vg + vr
                c += 1
              }
              ir += 1
            }
            Some(BmpStats(m.doc_id, w.toLong, h.toLong, w.toLong * h,
              sb, sg, sr, top))
          }
        }
      }
    }
  }

  /** EXT (oracle-checked): decoded BMP pixel statistics. The oracle
    * replays the PLANTING formula (pixel p = text byte p mod |text|),
    * while the engine decodes the CONTAINER — so one hash gates the
    * header validation, the stride walk (pads planted 0xAA would
    * poison any raw-row sum), and the orientation normalization
    * (odd doc_ids are top-down, even bottom-up; top_row_sum differs
    * between a correct and a file-order read). */
  def qMultimodalBmp(s: SparkSession, d: String): DataFrame =
    decodeBmpStats(bmpAssetTable(s, d)).toDF().orderBy("doc_id")

  // ---- third true codec: COMPRESSED PNG (r14 verdict #5 — the first
  // decoder with an entropy-coded body: zlib inflate + per-scanline
  // filter reversal, pure JVM like the Szip precedent) -----------------

  /** CRC32 of chunk type + payload — PNG requires real CRCs. */
  private def pngChunk(b: java.io.ByteArrayOutputStream, typ: String,
                       payload: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(payload.length).array()
    b.write(len)
    val tb = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(payload)
    b.write(tb); b.write(payload)
    b.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** A COMPLETE valid PNG (signature, IHDR, one IDAT, IEND): 8-bit RGB
    * (color type 2), `pix` = 3·w·h bytes in image order, per-row filter
    * types from `filterOf(row)` — the builder APPLIES each filter
    * (Sub/Up/Average/Paeth deltas per the PNG 1.2 spec, bpp=3) before
    * deflating, so a decoder that skips the reversal reads garbage. */
  private[graft] def pngFullBytes(w: Int, h: Int, pix: Array[Byte],
                                  filterOf: Int => Int): Array[Byte] = {
    require(pix.length == 3 * w * h, "pix must be 3*w*h image-order bytes")
    val stride = 3 * w
    val raw = new Array[Byte](h * (1 + stride))
    var r = 0
    while (r < h) {
      val f = filterOf(r)
      raw(r * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val orig = pix(r * stride + x) & 0xff
        val a = if (x >= 3) pix(r * stride + x - 3) & 0xff else 0
        val b = if (r >= 1) pix((r - 1) * stride + x) & 0xff else 0
        val c = if (x >= 3 && r >= 1) pix((r - 1) * stride + x - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => // Paeth
            val p = a + b - c
            val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        raw(r * (1 + stride) + 1 + x) = ((orig - pred) & 0xff).toByte
        x += 1
      }
      r += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", zout.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** PNG asset table: every document becomes a real COMPRESSED 8-bit RGB
    * PNG — planted dims (w = 1 + id%8, h = 1 + (id/8)%4, the BMP
    * convention), pixel byte p (image order, R,G,B) = text byte
    * p mod |text|, and per-row filter type (id + row) % 5 so the corpus
    * exercises ALL five PNG filters. Empty-text docs are skipped. */
  def pngAssetTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id", "text").as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty)
      .map { case (id, text) =>
        val w = 1 + (id % 8).toInt
        val h = 1 + ((id / 8) % 4).toInt
        val t = text.getBytes("US-ASCII")
        val pix = Array.tabulate(3 * w * h)(p => t(p % t.length))
        Media(id, "image/png", pngFullBytes(w, h, pix, r => ((id + r) % 5).toInt))
      }
  }

  case class PngStats(doc_id: Long, width: Long, height: Long, n_pixels: Long,
                      sum_r: Long, sum_g: Long, sum_b: Long, top_row_sum: Long)

  /** TRUE compressed-image decode in the mapPartitions seam: chunk walk
    * (length/type/CRC framing), IHDR validation (8-bit, color type 2
    * RGB, deflate compression, filter method 0, NON-interlaced — an
    * interlaced, paletted, or truncated container yields NO row, never
    * garbage), zlib INFLATE of the concatenated IDAT payloads
    * (`java.util.zip.Inflater` — pure JVM, the Szip precedent), then
    * per-scanline filter REVERSAL (None/Sub/Up/Average/Paeth, bpp=3,
    * PNG 1.2 §6) to recover the planted pixels. Exact integer channel
    * sums, so the result hashes; `top_row_sum` gates row orientation
    * and the Up/Paeth reversal chain (any mis-reversal cascades down
    * every later row). */
  def decodePngStats(media: Dataset[Media]): Dataset[PngStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // real-codec seam: one Inflater per record (cheap); a native codec
      // context would be allocated here, once per partition
      iter.flatMap { m =>
        val p = m.payload
        val sig = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)
        def u32(o: Int): Long = ((p(o) & 0xffL) << 24) | ((p(o + 1) & 0xffL) << 16) |
          ((p(o + 2) & 0xffL) << 8) | (p(o + 3) & 0xffL)
        if (m.mime != "image/png" || p.length < 45 ||
            !p.take(8).sameElements(sig)) None
        else {
          // chunk walk: collect IDAT spans, stop at IEND; bail on any
          // malformed framing
          var off = 8
          var w = 0L; var h = 0L; var ok = true; var seenIhdr = false
          var interlace = -1; var depth = -1; var color = -1
          val idat = new java.io.ByteArrayOutputStream()
          var done = false
          while (ok && !done && off + 12 <= p.length) {
            val len = u32(off)
            val typ = new String(p, off + 4, 4, "US-ASCII")
            if (len > Int.MaxValue - 12 || off + 12 + len > p.length) ok = false
            else {
              typ match {
                case "IHDR" =>
                  if (len != 13) ok = false
                  else {
                    seenIhdr = true
                    w = u32(off + 8); h = u32(off + 12)
                    depth = p(off + 16) & 0xff; color = p(off + 17) & 0xff
                    val comp = p(off + 18) & 0xff; val fm = p(off + 19) & 0xff
                    interlace = p(off + 20) & 0xff
                    if (comp != 0 || fm != 0) ok = false
                  }
                case "IDAT" => idat.write(p, off + 8, len.toInt)
                case "IEND" => done = true
                case _ => () // ancillary chunks skip
              }
              off += 12 + len.toInt
            }
          }
          // refusals: non-RGB8, interlaced, no IHDR/IDAT, oversized
          if (!ok || !seenIhdr || depth != 8 || color != 2 || interlace != 0 ||
              w <= 0 || h <= 0 || w * h > (1L << 26) || idat.size() == 0) None
          else {
            val stride = (3 * w).toInt
            val expect = (h * (1 + stride)).toInt
            val raw = new Array[Byte](expect)
            val inf = new java.util.zip.Inflater()
            inf.setInput(idat.toByteArray)
            val got = try {
              var n = 0
              var stuck = false
              while (n < expect && !inf.finished() && !stuck) {
                val k = inf.inflate(raw, n, expect - n)
                if (k == 0 && (inf.needsInput() || inf.needsDictionary())) stuck = true
                else n += k
              }
              // an over-long stream must refuse too: try one extra byte
              if (!stuck && n == expect && !inf.finished()) {
                val extra = new Array[Byte](1)
                if (inf.inflate(extra, 0, 1) > 0) n += 1
              }
              if (stuck) -1 else n
            } catch { case _: java.util.zip.DataFormatException => -1 }
            finally inf.end()
            if (got != expect) None // truncated / over-long stream: refuse
            else {
              // filter reversal IN PLACE over a recon buffer
              val recon = new Array[Byte](h.toInt * stride)
              var ir = 0
              var bad = false
              while (!bad && ir < h) {
                val f = raw(ir * (1 + stride)) & 0xff
                if (f > 4) bad = true
                else {
                  var x = 0
                  while (x < stride) {
                    val ft = raw(ir * (1 + stride) + 1 + x) & 0xff
                    val a = if (x >= 3) recon(ir * stride + x - 3) & 0xff else 0
                    val b = if (ir >= 1) recon((ir - 1) * stride + x) & 0xff else 0
                    val c = if (x >= 3 && ir >= 1) recon((ir - 1) * stride + x - 3) & 0xff else 0
                    val pred = f match {
                      case 0 => 0
                      case 1 => a
                      case 2 => b
                      case 3 => (a + b) / 2
                      case 4 =>
                        val pp = a + b - c
                        val (pa, pb, pc) =
                          (math.abs(pp - a), math.abs(pp - b), math.abs(pp - c))
                        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
                    }
                    recon(ir * stride + x) = ((ft + pred) & 0xff).toByte
                    x += 1
                  }
                }
                ir += 1
              }
              if (bad) None
              else {
                var sr = 0L; var sg = 0L; var sb = 0L; var top = 0L
                var i = 0
                while (i < recon.length) {
                  val v = recon(i) & 0xff
                  (i % 3) match {
                    case 0 => sr += v
                    case 1 => sg += v
                    case _ => sb += v
                  }
                  if (i < stride) top += v
                  i += 1
                }
                Some(PngStats(m.doc_id, w, h, w * h, sr, sg, sb, top))
              }
            }
          }
        }
      }
    }
  }

  /** EXT (oracle-checked): decoded COMPRESSED-PNG pixel statistics. The
    * oracle replays the PLANTING formula (pixel p = text byte p mod
    * |text| — the BMP convention) while the engine inflates the IDAT
    * stream and reverses all five scanline filters ((id+row) % 5 plants
    * every type): one hash gates the chunk walk, the inflate, and the
    * filter arithmetic — a single mis-predicted byte cascades through
    * Up/Paeth into every later row's sums. */
  def qMultimodalPng(s: SparkSession, d: String): DataFrame =
    decodePngStats(pngAssetTable(s, d)).toDF().orderBy("doc_id")

  // ---- fourth true codec: GIF87a / LZW (r15 — the second entropy
  // coder after PNG's deflate; variable-width codes, dictionary
  // rebuild, the KwKwK corner) --------------------------------------

  /** Minimal VALID GIF87a: 256-entry grayscale global color table
    * (palette[i] = (i,i,i), so a decoded index IS its channel value),
    * one image block, LZW min code size 8. The encoder emits ROOT codes
    * with a CLEAR every 250 codes — that keeps the code width pinned at
    * 9 bits only because the DECODER's dictionary resets before
    * reaching 512 entries, so a decoder that mis-tracks dictionary
    * growth or clear handling desynchronizes immediately. Codes pack
    * LSB-first into ≤255-byte sub-blocks (the GIF bit order). */
  private[graft] def gifBytes(w: Int, h: Int, pix: Array[Byte]): Array[Byte] = {
    require(pix.length == w * h, "pix must be w*h palette indices")
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF87a".getBytes("US-ASCII"))
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    u16(w); u16(h)
    out.write(0xF7) // global table, 8 bits/pixel, 256 entries
    out.write(0); out.write(0) // background, aspect
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    out.write(0x2C) // image descriptor
    u16(0); u16(0); u16(w); u16(h)
    out.write(0) // no local table, not interlaced
    out.write(8) // LZW min code size
    // 9-bit code stream: CLEAR, then root codes with CLEAR every 250
    val codes = scala.collection.mutable.ArrayBuffer[Int](256)
    var sinceClear = 0
    pix.foreach { p =>
      if (sinceClear == 250) { codes += 256; sinceClear = 0 }
      codes += (p & 0xff); sinceClear += 1
    }
    codes += 257 // EOI
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nBits = 0
    codes.foreach { c =>
      acc |= (c.toLong << nBits); nBits += 9
      while (nBits >= 8) { bits.write((acc & 0xff).toInt); acc >>= 8; nBits -= 8 }
    }
    if (nBits > 0) bits.write((acc & 0xff).toInt)
    val data = bits.toByteArray
    var off = 0
    while (off < data.length) {
      val n = math.min(255, data.length - off)
      out.write(n); out.write(data, off, n)
      off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF asset table: planted dims and pixels exactly like BMP/PNG
    * (w = 1 + id%8, h = 1 + (id/8)%4, pixel p = text byte p mod |text|
    * — ASCII, so the palette index IS the byte). */
  def gifAssetTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id", "text").as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty)
      .map { case (id, text) =>
        val w = 1 + (id % 8).toInt
        val h = 1 + ((id / 8) % 4).toInt
        val t = text.getBytes("US-ASCII")
        val pix = Array.tabulate(w * h)(p => t(p % t.length))
        Media(id, "image/gif", gifBytes(w, h, pix))
      }
  }

  case class GifStats(doc_id: Long, width: Long, height: Long, n_pixels: Long,
                      sum_idx: Long, top_row_sum: Long)

  /** TRUE GIF/LZW decode in the mapPartitions seam — the GENERAL
    * decoder, not the encoder's inverse: variable code width (bumps at
    * every 2^width dictionary fill up to 12 bits), dictionary rebuild
    * on CLEAR, the KwKwK corner (a code referencing the entry about to
    * be defined), LSB-first bit unpacking across sub-block boundaries,
    * and strict framing (truncated data, missing EOI pixels, oversized
    * dims, local color tables, interlace, or a mid-stream desync yield
    * NO row, never garbage). Exact integer outputs: palette-index sum
    * and the top-row sum (the row-framing gate). */
  def decodeGifStats(media: Dataset[Media]): Dataset[GifStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      iter.flatMap { m =>
        val p = m.payload
        def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
        if (m.mime != "image/gif" || p.length < 14 ||
            !(new String(p, 0, 6, "US-ASCII") == "GIF87a" ||
              new String(p, 0, 6, "US-ASCII") == "GIF89a")) None
        else {
          val flags = p(10) & 0xff
          val hasGct = (flags & 0x80) != 0
          val gctSize = if (hasGct) 2 << (flags & 7) else 0
          var off = 13 + 3 * gctSize
          // skip extension blocks (0x21 <label> then sub-blocks)
          var ok = hasGct && off < p.length
          while (ok && off < p.length && (p(off) & 0xff) == 0x21) {
            off += 2
            while (ok && off < p.length && p(off) != 0) {
              off += 1 + (p(off) & 0xff)
              if (off >= p.length) ok = false
            }
            off += 1
          }
          if (!ok || off + 10 > p.length || (p(off) & 0xff) != 0x2C) None
          else {
            val w = u16(off + 5); val h = u16(off + 7)
            val imgFlags = p(off + 9) & 0xff
            off += 10
            // refuse local color tables and interlace
            if ((imgFlags & 0x80) != 0 || (imgFlags & 0x40) != 0 ||
                w <= 0 || h <= 0 || w.toLong * h > (1L << 26) ||
                off >= p.length) None
            else {
              val minCode = p(off) & 0xff; off += 1
              if (minCode < 2 || minCode > 11) None
              else {
                // concatenate sub-blocks
                val data = new java.io.ByteArrayOutputStream()
                var bad = false; var done = false
                while (!bad && !done && off < p.length) {
                  val n = p(off) & 0xff; off += 1
                  if (n == 0) done = true
                  else if (off + n > p.length) bad = true
                  else { data.write(p, off, n); off += n }
                }
                if (bad || !done) None
                else {
                  val d = data.toByteArray
                  val clear = 1 << minCode; val eoi = clear + 1
                  val n = w * h
                  val pixOut = new Array[Byte](n)
                  var nOut = 0
                  // dictionary: entries as (prefixCode, lastByte);
                  // roots are implicit
                  val prefix = new Array[Int](4096)
                  val last = new Array[Byte](4096)
                  var dictSize = eoi + 1
                  var width = minCode + 1
                  var acc = 0L; var nBits = 0; var di = 0
                  var prev = -1
                  var fail = false; var sawEoi = false
                  def emit(code: Int): Int = { // writes entry's bytes, returns first byte
                    var stack = List.empty[Byte]
                    var c = code
                    while (c >= clear + 2) { stack = last(c) :: stack; c = prefix(c) }
                    stack = c.toByte :: stack
                    val first = stack.head
                    stack.foreach { b =>
                      if (nOut < n) { pixOut(nOut) = b; nOut += 1 } else fail = true
                    }
                    first & 0xff
                  }
                  while (!fail && !sawEoi) {
                    while (nBits < width && di < d.length) {
                      acc |= (d(di) & 0xffL) << nBits; nBits += 8; di += 1
                    }
                    if (nBits < width) fail = true
                    else {
                      val code = (acc & ((1L << width) - 1)).toInt
                      acc >>= width; nBits -= width
                      if (code == clear) { dictSize = eoi + 1; width = minCode + 1; prev = -1 }
                      else if (code == eoi) sawEoi = true
                      else if (code > dictSize || (code >= clear && code < clear + 2)) fail = true
                      else {
                        val first =
                          if (code == dictSize) { // KwKwK: code not yet defined
                            if (prev < 0 || dictSize >= 4096) { fail = true; 0 }
                            else {
                              // entry = prev + firstByte(prev): define it
                              // BEFORE emitting by walking prev's first
                              var c = prev
                              while (c >= clear + 2) c = prefix(c)
                              prefix(dictSize) = prev; last(dictSize) = c.toByte
                              dictSize += 1
                              emit(dictSize - 1)
                            }
                          } else {
                            val f = emit(code)
                            if (prev >= 0 && dictSize < 4096) {
                              prefix(dictSize) = prev; last(dictSize) = f.toByte
                              dictSize += 1
                            }
                            f
                          }
                        if (!fail) {
                          prev = code
                          if (dictSize >= (1 << width) && width < 12) width += 1
                        }
                      }
                    }
                  }
                  if (fail || !sawEoi || nOut != n) None
                  else {
                    var sum = 0L; var top = 0L; var i = 0
                    while (i < n) {
                      val v = pixOut(i) & 0xff
                      sum += v
                      if (i < w) top += v
                      i += 1
                    }
                    Some(GifStats(m.doc_id, w.toLong, h.toLong, n.toLong, sum, top))
                  }
                }
              }
            }
          }
        }
      }
    }
  }

  /** EXT (oracle-checked): decoded GIF/LZW pixel statistics — the
    * second entropy coder under the planting-formula convention: the
    * oracle recomputes pixel p = text byte p mod |text| while the
    * engine unpacks variable-width LZW codes, tracks the decoder
    * dictionary, and reframes rows; one hash gates the bit unpacking,
    * the dictionary discipline, and the framing. */
  def qMultimodalGif(s: SparkSession, d: String): DataFrame =
    decodeGifStats(gifAssetTable(s, d)).toDF().orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_gif" -> (qMultimodalGif _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_headers" -> (qMultimodalHeaders _),
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_multimodal_bmp" -> (qMultimodalBmp _),
    "q_multimodal_png" -> (qMultimodalPng _),
  )

  val oracle: Map[String, String] = Map(
    // planting formula, single channel: the grayscale palette makes the
    // decoded index the byte itself (ASCII corpus, bytes < 128)
    "q_multimodal_gif" ->
      """WITH d AS (SELECT doc_id, text,
        |    1 + doc_id % 8 AS w, 1 + (doc_id // 8) % 4 AS h,
        |    length(text) AS L
        |  FROM documents WHERE length(text) >= 1),
        |px AS (SELECT doc_id, w, p,
        |    ascii(substring(text, CAST(p % L AS INT) + 1, 1)) AS v
        |  FROM (SELECT doc_id, text, w, L,
        |          unnest(range(0, w * h)) AS p FROM d)),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(v) AS BIGINT) AS sum_idx,
        |    CAST(SUM(CASE WHEN p < w THEN v ELSE 0 END) AS BIGINT) AS top_row_sum
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels, sum_idx, top_row_sum
        |FROM d JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    // same planting formula as the BMP oracle; the channel index runs
    // R,G,B in image order (PNG) where BMP files run B,G,R — the engine
    // decodes the CONTAINER (inflate + filter reversal) to recover it
    "q_multimodal_png" ->
      """WITH d AS (SELECT doc_id, text,
        |    1 + doc_id % 8 AS w, 1 + (doc_id // 8) % 4 AS h,
        |    length(text) AS L
        |  FROM documents WHERE length(text) >= 1),
        |px AS (SELECT doc_id, w, p,
        |    p % 3 AS k,
        |    ascii(substring(text, CAST(p % L AS INT) + 1, 1)) AS v
        |  FROM (SELECT doc_id, text, w, L,
        |          unnest(range(0, 3 * w * h)) AS p FROM d)),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN k = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
        |    CAST(SUM(CASE WHEN k = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
        |    CAST(SUM(CASE WHEN k = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
        |    CAST(SUM(CASE WHEN p < 3 * w THEN v ELSE 0 END) AS BIGINT) AS top_row_sum
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels, sum_r, sum_g, sum_b, top_row_sum
        |FROM d JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_multimodal_bmp" ->
      """WITH d AS (SELECT doc_id, text,
        |    1 + doc_id % 8 AS w, 1 + (doc_id // 8) % 4 AS h,
        |    length(text) AS L
        |  FROM documents WHERE length(text) >= 1),
        |px AS (SELECT doc_id, w, p,
        |    p % 3 AS k,
        |    ascii(substring(text, CAST(p % L AS INT) + 1, 1)) AS v
        |  FROM (SELECT doc_id, text, w, L,
        |          unnest(range(0, 3 * w * h)) AS p FROM d)),
        |agg AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN k = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_b,
        |    CAST(SUM(CASE WHEN k = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
        |    CAST(SUM(CASE WHEN k = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
        |    CAST(SUM(CASE WHEN p < 3 * w THEN v ELSE 0 END) AS BIGINT) AS top_row_sum
        |  FROM px GROUP BY doc_id)
        |SELECT d.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(w * h AS BIGINT) AS n_pixels, sum_b, sum_g, sum_r, top_row_sum
        |FROM d JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q_multimodal_decode" ->
      """WITH w AS (SELECT doc_id, text,
        |    CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |    CAST(8000 * (1 + doc_id % 6) AS BIGINT) AS sample_rate
        |  FROM documents WHERE doc_id % 3 = 2),
        |sm AS (SELECT doc_id,
        |    ascii(substring(text, CAST(2 * i + 1 AS INT), 1))
        |      + 256 * ascii(substring(text, CAST(2 * i + 2 AS INT), 1)) AS u
        |  FROM (SELECT doc_id, text,
        |          unnest(range(0, CAST(length(text) // 2 AS BIGINT))) AS i
        |        FROM w)),
        |sv AS (SELECT doc_id,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s FROM sm),
        |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
        |    CAST(MAX(ABS(s)) AS BIGINT) AS peak,
        |    CAST(SUM(s) AS BIGINT) AS sum_s,
        |    CAST(SUM(s * s) AS BIGINT) AS energy
        |  FROM sv GROUP BY doc_id)
        |SELECT w.doc_id, channels, sample_rate,
        |  COALESCE(n_samples, 0) AS n_samples, COALESCE(peak, 0) AS peak,
        |  COALESCE(sum_s, 0) AS sum_s, COALESCE(energy, 0) AS energy
        |FROM w LEFT JOIN agg ON w.doc_id = agg.doc_id
        |ORDER BY w.doc_id""".stripMargin,
    "q_multimodal_headers" ->
      """SELECT doc_id,
        |  CAST(16 * (1 + doc_id % 32) AS BIGINT) AS width,
        |  CAST(16 * (1 + (doc_id // 32) % 32) AS BIGINT) AS height
        |FROM documents WHERE doc_id % 3 = 0 ORDER BY doc_id""".stripMargin,
    "q_multimodal_frames" ->
      """SELECT doc_id, frame_idx, CAST(frame_idx * 100 AS BIGINT) AS byte_off
        |FROM (SELECT doc_id,
        |        unnest(range(0, CAST(octet_length(encode(text)) // 100 AS INT), 10)) AS frame_idx
        |      FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= 100)
        |ORDER BY doc_id, frame_idx LIMIT 500""".stripMargin,
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  ['image/png', 'audio/wav', 'video/mp4'][CAST(doc_id % 3 + 1 AS INT)] AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(64 + (ascii(substring(md5(text), 1, 1)) % 8) * 16 AS BIGINT) AS width,
        |  CAST(64 + (ascii(substring(md5(text), 2, 1)) % 8) * 16 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id LIMIT 200""".stripMargin,
  )
}
