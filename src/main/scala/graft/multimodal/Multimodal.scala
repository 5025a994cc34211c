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

  // ----------------------------------------------------------------- JPEG
  // Baseline JFIF — the third entropy family of the deliberate codec
  // ladder (szip Rice -> PNG deflate -> GIF LZW -> JPEG Huffman+DCT),
  // and the format a real multimodal crawl actually carries.
  // Planting convention: per-8x8-block CONSTANT YCbCr at quant step 8
  // makes the lossy codec exactly invertible — a constant block has one
  // DC coefficient 8·(v−128) whose quantized value v−128 is integral, so
  // ANY correct baseline decoder reproduces the planted constants
  // bit-exactly and the DuckDB oracle replays the planting formula while
  // the engine decodes the real container (Huffman scan, DC prediction,
  // dequant, IDCT, YCbCr->RGB).

  /** ITU T.81 Annex K Huffman tables (public spec constants). */
  private val dcLumBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val dcLumVals = (0 to 11).map(_.toByte).toArray
  private val dcChrBits = Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val dcChrVals = (0 to 11).map(_.toByte).toArray
  private val acLumBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val acLumVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)
  private val acChrBits = Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val acChrVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** T.81 zig-zag order: zigzag(k) = natural index of the k-th scanned
    * coefficient. */
  private[graft] val jpegZigzag: Array[Int] = {
    val zz = new Array[Int](64)
    var k = 0
    var s = 0
    while (s < 15) { // anti-diagonals
      val range = (math.max(0, s - 7) to math.min(7, s))
      val cells = if (s % 2 == 0) range.reverse else range // even diag runs up
      cells.foreach { y => val x = s - y; zz(k) = y * 8 + x; k += 1 }
      s += 1
    }
    zz
  }

  /** Canonical code assignment (T.81 Annex C): value -> (code, length). */
  private[graft] def jpegCanonical(bits: Array[Int], vals: Array[Byte])
      : Map[Int, (Int, Int)] = {
    require(bits.sum == vals.length, "malformed Huffman spec")
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    (1 to 16).foreach { len =>
      (0 until bits(len - 1)).foreach { _ =>
        out += ((vals(k) & 0xff) -> (code, len))
        code += 1; k += 1
      }
      code <<= 1
    }
    out.result()
  }

  private class JpegBitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s (T.81 F.1.2.3)
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; n = 0
    }
  }

  private def jpegCat(v: Int): Int =
    if (v == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** A COMPLETE valid baseline JFIF: 8-bit, 3 components YCbCr 4:4:4,
    * Annex K Huffman tables, flat quant tables (every step 8), one
    * interleaved scan. `blocks(c)(i)` = the CONSTANT sample value of
    * component c's i-th 8x8 block (raster order over ceil dims) —
    * encoded as a lone DC coefficient (v−128, exact at step 8) + EOB.
    * The general coefficient path ([[jpegEncodeBlock]]) also carries AC
    * for the spec's hand-assembled vectors. */
  private[graft] def jpegEncodeBlock(wr: JpegBitWriter, zz: Array[Int],
      pred: Int, dcTab: Map[Int, (Int, Int)], acTab: Map[Int, (Int, Int)]): Int = {
    // zz = 64 QUANTIZED coefficients in zig-zag order
    val diff = zz(0) - pred
    val s = jpegCat(diff)
    val (dc, dl) = dcTab(s)
    wr.put(dc, dl)
    if (s > 0) wr.put(if (diff >= 0) diff else diff + (1 << s) - 1, s)
    var lastNz = 63
    while (lastNz > 0 && zz(lastNz) == 0) lastNz -= 1
    var k = 1
    while (k <= lastNz) {
      var run = 0
      while (zz(k) == 0) { run += 1; k += 1 }
      while (run >= 16) { val (c, l) = acTab(0xf0); wr.put(c, l); run -= 16 }
      val sz = jpegCat(zz(k))
      val (c, l) = acTab((run << 4) | sz)
      wr.put(c, l)
      wr.put(if (zz(k) >= 0) zz(k) else zz(k) + (1 << sz) - 1, sz)
      k += 1
    }
    if (lastNz < 63) { val (c, l) = acTab(0x00); wr.put(c, l) } // EOB
    zz(0)
  }

  private[graft] def jfifFullBytes(w: Int, h: Int,
                                   blocks: Array[Array[Int]]): Array[Byte] =
    jfifCoefBytes(w, h, blocks.map(_.map { v =>
      val zz = new Array[Int](64); zz(0) = v - 128; zz
    }))

  /** General form: `coefs(c)(b)` = the b-th block's 64 QUANTIZED
    * coefficients in zig-zag order — the spec's AC-bearing vectors ride
    * this path; [[jfifFullBytes]] wraps it for the constant planting. */
  private[graft] def jfifCoefBytes(w: Int, h: Int,
                                   coefs: Array[Array[Array[Int]]]): Array[Byte] = {
    require(coefs.length == 3, "3 components (Y, Cb, Cr)")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def seg(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      u16(payload.length + 2)
      payload.foreach(out.write)
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0 +: Array.fill(64)(8)) // DQT id 0, all steps 8
    seg(0xdb, 1 +: Array.fill(64)(8)) // DQT id 1
    seg(0xc0, Array(8, (h >> 8) & 0xff, h & 0xff, (w >> 8) & 0xff, w & 0xff, 3,
                    1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)) // SOF0 4:4:4
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Byte]): Unit =
      seg(0xc4, ((cls << 4) | id) +: (bits ++ vals.map(_ & 0xff)))
    dht(0, 0, dcLumBits, dcLumVals); dht(1, 0, acLumBits, acLumVals)
    dht(0, 1, dcChrBits, dcChrVals); dht(1, 1, acChrBits, acChrVals)
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)) // SOS
    val wr = new JpegBitWriter
    val dcT = Array(jpegCanonical(dcLumBits, dcLumVals),
                    jpegCanonical(dcChrBits, dcChrVals))
    val acT = Array(jpegCanonical(acLumBits, acLumVals),
                    jpegCanonical(acChrBits, acChrVals))
    val nB = coefs(0).length
    val pred = Array(0, 0, 0)
    var b = 0
    while (b < nB) {
      var c = 0
      while (c < 3) {
        val t = if (c == 0) 0 else 1
        pred(c) = jpegEncodeBlock(wr, coefs(c)(b), pred(c), dcT(t), acT(t))
        c += 1
      }
      b += 1
    }
    wr.flush()
    wr.out.toByteArray.foreach(x => out.write(x & 0xff))
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** JPEG asset table: dims are whole 8x8 blocks (w = 8·(1+id%4),
    * h = 8·(1+(id/4)%2)), block i's planted constants Y/Cb/Cr = text
    * bytes (3i, 3i+1, 3i+2) mod |text| — every block exercises the DC
    * predictor chain; AC is all-zero by construction (the EXACTNESS
    * condition). Empty-text docs are skipped. */
  def jpegAssetTable(s: SparkSession, d: String): Dataset[Media] = {
    import s.implicits._
    Tables.documents(s, d).select("doc_id", "text").as[(Long, String)]
      .filter(t => t._2 != null && t._2.nonEmpty)
      .map { case (id, text) =>
        val w = 8 * (1 + (id % 4).toInt)
        val h = 8 * (1 + ((id / 4) % 2).toInt)
        val t = text.getBytes("US-ASCII")
        val nB = (w / 8) * (h / 8)
        val blocks = Array.tabulate(3, nB)((c, b) => t((3 * b + c) % t.length) & 0xff)
        Media(id, "image/jpeg", jfifFullBytes(w, h, blocks))
      }
  }

  case class JpegStats(doc_id: Long, width: Long, height: Long, n_pixels: Long,
                       sum_r: Long, sum_g: Long, sum_b: Long, top_row_sum: Long)

  /** TRUE baseline-JFIF decode in the mapPartitions seam — the full
    * general pipeline, not a replay of the planting: marker walk (APPn
    * skipped; DQT 8-bit tables; DHT canonical Huffman build; SOF0 dims +
    * components; DRI honored), entropy scan decode (bit reader with
    * 0xFF00 unstuffing, RSTn predictor resets, DC category + extend
    * with per-component prediction, AC run/size with ZRL and EOB,
    * de-zig-zag), per-table dequantization, general 2-D IDCT
    * (StrictMath cosine table — deterministic across JVMs), level shift
    * + clamp, and BT.601 YCbCr->RGB with floor(x+0.5) rounding (the
    * oracle replays the same IEEE expression). Refusal classes yield NO
    * row, never garbage: progressive (SOF2) or any non-SOF0 frame
    * (incl. the arithmetic-coded SOF9-SOFB family), 16-bit quant
    * tables, non-8-bit precision, subsampled chroma (only 4:4:4 or
    * single-component greyscale decode), missing tables, truncated or
    * malformed scans. */
  def decodeJpegStats(media: Dataset[Media]): Dataset[JpegStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { iter =>
      // per-partition cosine table — the codec-context seam
      val cosT = Array.tabulate(8, 8) { (x, u) =>
        (if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0) *
          StrictMath.cos((2 * x + 1) * u * StrictMath.PI / 16.0)
      }
      iter.flatMap { m =>
        val p = m.payload
        if (m.mime != "image/jpeg" || p.length < 4 ||
            (p(0) & 0xff) != 0xff || (p(1) & 0xff) != 0xd8) None
        else decodeOneJpeg(p, cosT).map { case (w, h, rgb) =>
          var sr = 0L; var sg = 0L; var sb = 0L; var top = 0L
          var i = 0
          while (i < w * h) {
            sr += rgb(3 * i); sg += rgb(3 * i + 1); sb += rgb(3 * i + 2)
            if (i < w) top += rgb(3 * i) + rgb(3 * i + 1) + rgb(3 * i + 2)
            i += 1
          }
          JpegStats(m.doc_id, w, h, w.toLong * h, sr, sg, sb, top)
        }
      }
    }
  }

  /** The decoder core — returns (w, h, interleaved RGB ints) or None
    * on any refusal class. Shared by the stats seam and the spec's
    * per-stage vectors. */
  private[graft] def decodeOneJpeg(p: Array[Byte], cosT: Array[Array[Double]])
      : Option[(Int, Int, Array[Int])] = {
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[Map[(Int, Int), Int]](4)
    val acTabs = new Array[Map[(Int, Int), Int]](4)
    var w = 0; var h = 0; var nComp = 0
    var compId: Array[Int] = null; var compQ: Array[Int] = null
    var restartInterval = 0
    var off = 2
    var sofSeen = false
    var ok = true
    var scanAt = -1
    var scanComps: Array[(Int, Int, Int)] = null // (compIdx, dcTab, acTab)
    def u16(o: Int): Int = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
    while (ok && scanAt < 0 && off + 4 <= p.length) {
      if ((p(off) & 0xff) != 0xff) { ok = false }
      else {
        val marker = p(off + 1) & 0xff
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) off += 2
        else if (marker == 0xd9) ok = false // EOI before scan
        else {
          val len = u16(off + 2)
          if (off + 2 + len > p.length) ok = false
          else {
            marker match {
              case 0xdb => // DQT: one or more tables
                var o = off + 4
                while (ok && o < off + 2 + len) {
                  val pq = (p(o) & 0xff) >> 4; val tq = p(o) & 0x0f
                  if (pq != 0 || tq > 3 || o + 65 > off + 2 + len) ok = false
                  else {
                    quant(tq) = Array.tabulate(64)(i => p(o + 1 + i) & 0xff)
                    o += 65
                  }
                }
              case 0xc4 => // DHT: canonical decode maps (code,len) -> val
                var o = off + 4
                while (ok && o < off + 2 + len) {
                  val tc = (p(o) & 0xff) >> 4; val th = p(o) & 0x0f
                  if (tc > 1 || th > 3 || o + 17 > off + 2 + len) ok = false
                  else {
                    val bits = Array.tabulate(16)(i => p(o + 1 + i) & 0xff)
                    val n = bits.sum
                    if (o + 17 + n > off + 2 + len) ok = false
                    else {
                      var code = 0; var k = 0
                      val mb = Map.newBuilder[(Int, Int), Int]
                      (1 to 16).foreach { l =>
                        (0 until bits(l - 1)).foreach { _ =>
                          mb += ((code, l) -> (p(o + 17 + k) & 0xff))
                          code += 1; k += 1
                        }
                        code <<= 1
                      }
                      if (tc == 0) dcTabs(th) = mb.result()
                      else acTabs(th) = mb.result()
                      o += 17 + n
                    }
                  }
                }
              case 0xc0 => // SOF0 baseline
                sofSeen = true
                val prec = p(off + 4) & 0xff
                h = u16(off + 5); w = u16(off + 7)
                nComp = p(off + 9) & 0xff
                if (prec != 8 || (nComp != 1 && nComp != 3) ||
                    w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) ok = false
                else {
                  compId = new Array[Int](nComp); compQ = new Array[Int](nComp)
                  var c = 0
                  while (ok && c < nComp) {
                    compId(c) = p(off + 10 + 3 * c) & 0xff
                    val samp = p(off + 11 + 3 * c) & 0xff
                    compQ(c) = p(off + 12 + 3 * c) & 0xff
                    if (samp != 0x11) ok = false // subsampled -> refuse
                    c += 1
                  }
                }
              case mk if (mk >= 0xc1 && mk <= 0xcf) && mk != 0xc4 && mk != 0xc8 =>
                ok = false // progressive/extended/arithmetic frames refused
              case 0xdd =>
                restartInterval = u16(off + 4)
              case 0xda => // SOS
                if (!sofSeen) ok = false
                else {
                  val ns = p(off + 4) & 0xff
                  if (ns != nComp) ok = false
                  else {
                    scanComps = Array.tabulate(ns) { i =>
                      val cid = p(off + 5 + 2 * i) & 0xff
                      val tabs = p(off + 6 + 2 * i) & 0xff
                      val idx = compId.indexOf(cid)
                      (idx, tabs >> 4, tabs & 0x0f)
                    }
                    if (scanComps.exists(_._1 < 0)) ok = false
                    else scanAt = off + 2 + len
                  }
                }
              case _ => () // APPn / COM / others: skip
            }
            off += 2 + len
          }
        }
      }
    }
    if (!ok || scanAt < 0) return None
    // components' quant/huffman must exist
    if (scanComps.exists { case (ci, dt, at) =>
          quant(compQ(ci)) == null || dcTabs(dt) == null || acTabs(at) == null })
      return None
    val wB = (w + 7) / 8; val hB = (h + 7) / 8
    val planes = Array.ofDim[Int](nComp, wB * hB * 64)
    // entropy decode
    var pos = scanAt; var acc = 0; var nb = 0; var truncated = false
    def nextBit(): Int = {
      if (nb == 0) {
        if (pos >= p.length) { truncated = true; return 0 }
        var b = p(pos) & 0xff; pos += 1
        if (b == 0xff) {
          val b2 = if (pos < p.length) p(pos) & 0xff else -1
          if (b2 == 0x00) pos += 1
          else { truncated = true; return 0 } // marker mid-entropy
        }
        acc = b; nb = 8
      }
      nb -= 1
      (acc >> nb) & 1
    }
    def huffDecode(tab: Map[(Int, Int), Int]): Int = {
      var code = 0; var len = 0
      while (len < 16) {
        code = (code << 1) | nextBit(); len += 1
        if (truncated) return -1
        tab.get((code, len)) match {
          case Some(v) => return v
          case None => ()
        }
      }
      -1
    }
    def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    val pred = new Array[Int](nComp)
    val nMcu = wB * hB
    var mcu = 0
    var bad = false
    while (mcu < nMcu && !bad) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align and expect RSTn
        nb = 0
        if (pos + 1 < p.length && (p(pos) & 0xff) == 0xff &&
            (p(pos + 1) & 0xff) >= 0xd0 && (p(pos + 1) & 0xff) <= 0xd7) {
          pos += 2
          java.util.Arrays.fill(pred, 0)
        } else bad = true
      }
      var sc = 0
      while (sc < scanComps.length && !bad) {
        val (ci, dt, at) = scanComps(sc)
        val zz = new Array[Int](64)
        val s = huffDecode(dcTabs(dt))
        if (s < 0 || s > 11) bad = true
        else {
          var diffBits = 0
          var i = 0
          while (i < s) { diffBits = (diffBits << 1) | nextBit(); i += 1 }
          if (truncated) bad = true
          else {
            pred(ci) += extend(diffBits, s)
            zz(0) = pred(ci)
            var k = 1
            var eob = false
            while (k < 64 && !eob && !bad) {
              val rs = huffDecode(acTabs(at))
              if (rs < 0) bad = true
              else if (rs == 0x00) eob = true
              else if (rs == 0xf0) k += 16
              else {
                k += rs >> 4
                val sz = rs & 0x0f
                var vb = 0
                var j = 0
                while (j < sz) { vb = (vb << 1) | nextBit(); j += 1 }
                if (truncated || k > 63) bad = true
                else { zz(k) = extend(vb, sz); k += 1 }
              }
            }
            if (!bad) {
              // de-zig-zag + dequant + IDCT into the plane
              val q = quant(compQ(ci))
              val coef = new Array[Int](64)
              var k2 = 0
              while (k2 < 64) { coef(jpegZigzag(k2)) = zz(k2) * q(k2); k2 += 1 }
              val base = mcu * 64
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  var sum = 0.0
                  var v = 0
                  while (v < 8) {
                    var u = 0
                    while (u < 8) {
                      sum += cosT(x)(u) * cosT(y)(v) * coef(v * 8 + u)
                      u += 1
                    }
                    v += 1
                  }
                  val px = math.floor(sum * 0.25 + 128.0 + 0.5).toInt
                  planes(ci)(base + y * 8 + x) =
                    if (px < 0) 0 else if (px > 255) 255 else px
                  x += 1
                }
                y += 1
              }
            }
          }
        }
        sc += 1
      }
      mcu += 1
    }
    if (bad || truncated) return None
    // assemble: planes are MCU-major; emit interleaved RGB over (w, h)
    val rgb = new Array[Int](3 * w * h)
    var py = 0
    while (py < h) {
      var px2 = 0
      while (px2 < w) {
        val mcuI = (py / 8) * wB + (px2 / 8)
        val o = mcuI * 64 + (py % 8) * 8 + (px2 % 8)
        val i3 = 3 * (py * w + px2)
        if (nComp == 1) {
          val yv = planes(0)(o)
          rgb(i3) = yv; rgb(i3 + 1) = yv; rgb(i3 + 2) = yv
        } else {
          val yv = planes(0)(o).toDouble
          val cb = planes(1)(o) - 128.0
          val cr = planes(2)(o) - 128.0
          def cl(x: Double): Int = {
            val r = math.floor(x + 0.5).toInt
            if (r < 0) 0 else if (r > 255) 255 else r
          }
          rgb(i3) = cl(yv + 1.402 * cr)
          rgb(i3 + 1) = cl(yv - 0.344136 * cb - 0.714136 * cr)
          rgb(i3 + 2) = cl(yv + 1.772 * cb)
        }
        px2 += 1
      }
      py += 1
    }
    Some((w, h, rgb))
  }

  def qMultimodalJpeg(s: SparkSession, d: String): DataFrame =
    decodeJpegStats(jpegAssetTable(s, d)).toDF().orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_jpeg" -> (qMultimodalJpeg _),
    "q_multimodal_gif" -> (qMultimodalGif _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_multimodal_headers" -> (qMultimodalHeaders _),
    "q_multimodal_decode" -> (qMultimodalDecode _),
    "q_multimodal_bmp" -> (qMultimodalBmp _),
    "q_multimodal_png" -> (qMultimodalPng _),
  )

  val oracle: Map[String, String] = Map(
    // planting formula: per-8x8-block constant YCbCr from the text
    // bytes, EXACT through the codec at quant step 8 (a constant
    // block's lone DC coefficient 8(v-128) quantizes integrally), then
    // the same BT.601 floor(x+0.5) RGB expression the decoder runs —
    // IEEE doubles, bit-equal across engines. The engine decodes the
    // real container: Huffman scan, DC prediction, dequant, IDCT.
    "q_multimodal_jpeg" ->
      """WITH d AS (SELECT doc_id, text,
        |    1 + doc_id % 4 AS wb, 1 + (doc_id // 4) % 2 AS hb,
        |    length(text) AS L
        |  FROM documents WHERE length(text) >= 1),
        |blk AS (SELECT doc_id, wb, hb, b,
        |    ascii(substring(text, CAST((3*b) % L AS INT) + 1, 1)) AS yv,
        |    ascii(substring(text, CAST((3*b+1) % L AS INT) + 1, 1)) AS cb,
        |    ascii(substring(text, CAST((3*b+2) % L AS INT) + 1, 1)) AS cr
        |  FROM (SELECT doc_id, text, wb, hb, L,
        |          unnest(range(0, wb * hb)) AS b FROM d)),
        |rgbb AS (SELECT doc_id, wb, b,
        |    LEAST(255, GREATEST(0, CAST(FLOOR(yv + 1.402*(cr-128) + 0.5) AS BIGINT))) AS r,
        |    LEAST(255, GREATEST(0, CAST(FLOOR(yv - 0.344136*(cb-128) - 0.714136*(cr-128) + 0.5) AS BIGINT))) AS g,
        |    LEAST(255, GREATEST(0, CAST(FLOOR(yv + 1.772*(cb-128) + 0.5) AS BIGINT))) AS bl
        |  FROM blk),
        |agg AS (SELECT doc_id,
        |    CAST(64 * SUM(r) AS BIGINT) AS sum_r,
        |    CAST(64 * SUM(g) AS BIGINT) AS sum_g,
        |    CAST(64 * SUM(bl) AS BIGINT) AS sum_b,
        |    CAST(8 * SUM(CASE WHEN b < wb THEN r + g + bl ELSE 0 END) AS BIGINT) AS top_row_sum
        |  FROM rgbb GROUP BY doc_id)
        |SELECT d.doc_id, CAST(8 * wb AS BIGINT) AS width,
        |  CAST(8 * hb AS BIGINT) AS height,
        |  CAST(64 * wb * hb AS BIGINT) AS n_pixels,
        |  sum_r, sum_g, sum_b, top_row_sum
        |FROM d JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,
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
