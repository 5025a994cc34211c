package graft

import java.nio.{ByteBuffer, ByteOrder}

/** Hand-written HDF5 fixture generator — fort.63-shaped NetCDF-4 files
  * built byte-by-byte against the public HDF5 File Format Specification,
  * NOT via the reader under test ([[graft.sources.Hdf5]]).
  *
  * `writeV0` mirrors what netcdf-c actually emits: superblock v0,
  * old-style groups (symbol-table message → v1 B-tree → SNOD → local
  * heap), v1 object headers, contiguous coordinate variables, CHUNKED
  * record variables (the unlimited time dimension forces chunking in
  * real files), `_FillValue` and CF `units` attributes.
  *
  * `writeV2` covers the modern container: superblock v2, v2 object
  * headers ("OHDR"), compact Link messages, and a compact-layout
  * dataset. */
object Hdf5Fixture {

  private val Undef = -1L

  private final class Buf(cap: Int = 1 << 20) {
    val bb: ByteBuffer = ByteBuffer.allocate(cap).order(ByteOrder.LITTLE_ENDIAN)
    def pos: Long = bb.position().toLong
    def align8(): Unit = while (bb.position() % 8 != 0) bb.put(0.toByte)
    def bytes: Array[Byte] = java.util.Arrays.copyOf(bb.array(), bb.position())
  }

  // ---- reusable message bodies (each padded to 8 by the caller) --------

  /** IEEE float64 LE datatype message (full v1 property list). */
  private def f64Type: Array[Byte] = {
    val b = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x11.toByte)                      // version 1, class 1 (float)
    b.put(0x20.toByte).put(0x3f.toByte).put(0.toByte) // LE, MSB-set norm, sign bit 63
    b.putInt(8)                             // size
    b.putShort(0).putShort(64)              // bit offset, precision
    b.put(52.toByte).put(11.toByte)         // exponent location, size
    b.put(0.toByte).put(52.toByte)          // mantissa location, size
    b.putInt(1023)                          // exponent bias
    b.array()
  }

  /** int32 datatype message; bigEndian exercises the byte-order bit. */
  private def i32Type(bigEndian: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x10.toByte)                      // version 1, class 0 (fixed-point)
    b.put(((if (bigEndian) 1 else 0) | 8).toByte).put(0.toByte).put(0.toByte) // order | signed
    b.putInt(4)
    b.putShort(0).putShort(32)              // bit offset, precision
    b.array()
  }

  private def strType(len: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(0x13.toByte)                      // version 1, class 3 (string)
    b.put(0.toByte).put(0.toByte).put(0.toByte) // null-terminated, ASCII
    b.putInt(len)
    b.array()
  }

  /** Dataspace v1. `unlimitedFirst` writes max-dims with H5S_UNLIMITED
    * in the first position (what netcdf-c does for the time dim). */
  private def dataspace(dims: Array[Long], unlimitedFirst: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + dims.length * 8 * (if (unlimitedFirst) 2 else 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(dims.length.toByte)
    b.put((if (unlimitedFirst) 1 else 0).toByte).put(0.toByte).putInt(0)
    dims.foreach(b.putLong)
    if (unlimitedFirst) {
      b.putLong(Undef) // H5S_UNLIMITED
      dims.drop(1).foreach(b.putLong)
    }
    b.array()
  }

  private def scalarSpace: Array[Byte] = {
    val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(0)
    b.array()
  }

  private def pad8(a: Array[Byte]): Array[Byte] =
    if (a.length % 8 == 0) a else java.util.Arrays.copyOf(a, (a.length + 7) & ~7)

  /** Attribute message v1: name / datatype / dataspace each padded to 8. */
  private def attrMsg(name: String, dtype: Array[Byte], dspace: Array[Byte],
                      data: Array[Byte]): Array[Byte] = {
    val nameB = (name + "\u0000").getBytes("UTF-8")
    val b = ByteBuffer.allocate(8 + pad8(nameB).length + pad8(dtype).length +
      pad8(dspace).length + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(0.toByte)
    b.putShort(nameB.length.toShort)
    b.putShort(dtype.length.toShort)
    b.putShort(dspace.length.toShort)
    b.put(pad8(nameB)).put(pad8(dtype)).put(pad8(dspace)).put(data)
    b.array()
  }

  private def doubleAttr(name: String, v: Double): Array[Byte] = {
    val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array()
    attrMsg(name, f64Type, scalarSpace, d)
  }

  private def stringAttr(name: String, v: String): Array[Byte] =
    attrMsg(name, strType(v.length + 1), scalarSpace, (v + "\u0000").getBytes("UTF-8"))

  private def contiguousLayout(addr: Long, size: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte).put(1.toByte).putLong(addr).putLong(size)
    b.array()
  }

  private def chunkedLayout(btreeAddr: Long, chunkDims: Array[Int], elemSize: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(11 + 4 * (chunkDims.length + 1)).order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte).put(2.toByte)
    b.put((chunkDims.length + 1).toByte)
    b.putLong(btreeAddr)
    chunkDims.foreach(b.putInt)
    b.putInt(elemSize)
    b.array()
  }

  private def compactLayout(data: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte).put(0.toByte).putShort(data.length.toShort).put(data)
    b.array()
  }

  // ---- filters (write-side, matching the HDF5 registered filters) --------

  /** Filter Pipeline message v1: unnamed filters, values padded to 8. */
  private def filterPipelineMsg(filters: Seq[(Int, Array[Int])]): Array[Byte] = {
    val sz = 8 + filters.map { case (_, v) => 8 + 4 * v.length + (if (v.length % 2 == 1) 4 else 0) }.sum
    val b = ByteBuffer.allocate(sz).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(filters.length.toByte).putShort(0).putInt(0)
    filters.foreach { case (id, values) =>
      b.putShort(id.toShort).putShort(0 /* no name */).putShort(0 /* flags */)
      b.putShort(values.length.toShort)
      values.foreach(b.putInt)
      if (values.length % 2 == 1) b.putInt(0) // v1 pads client data to 8
    }
    b.array()
  }

  /** HDF5 shuffle (id 2): byte-plane transposition, element size `es`. */
  private def shuffleBytes(in: Array[Byte], es: Int): Array[Byte] = {
    val n = in.length / es
    val out = new Array[Byte](in.length)
    var p = 0
    while (p < es) {
      var i = 0
      while (i < n) { out(p * n + i) = in(i * es + p); i += 1 }
      p += 1
    }
    out
  }

  /** HDF5 deflate (id 1): one zlib stream per chunk. */
  private def deflateBytes(in: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(4)
    d.setInput(in); d.finish()
    val buf = new Array[Byte](in.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** HDF5 fletcher32 (id 3): H5_checksum_fletcher32 over big-endian
    * 16-bit words appended little-endian. */
  private def fletcher32Bytes(in: Array[Byte]): Array[Byte] = {
    var s1 = 0L; var s2 = 0L
    var i = 0
    while (i + 1 < in.length) {
      s1 = (s1 + (((in(i) & 0xffL) << 8) | (in(i + 1) & 0xffL))) % 65535
      s2 = (s2 + s1) % 65535
      i += 2
    }
    if (i < in.length) { s1 = (s1 + ((in(i) & 0xffL) << 8)) % 65535; s2 = (s2 + s1) % 65535 }
    val sum = (s2 << 16) | s1
    val out = java.util.Arrays.copyOf(in, in.length + 4)
    val b = ByteBuffer.wrap(out, in.length, 4).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(sum.toInt)
    out
  }

  /** Test-side CCSDS 121.0-B extended-Rice ENCODER — the szip (HDF5
    * filter 4) bit-stream producer, spec-derived like every other fixture
    * writer here; [[graft.sources.Szip]] must invert it. Picks the
    * cheapest option per block, so realistic inputs exercise zero-run/
    * ROS, second-extension, FS, k-splitting and no-compression paths.
    * Public so SzipSpec can drive parameter-grid roundtrips directly. */
  def szipEncode(samples: Array[Long], optionsMask: Int, n: Int, j: Int, pps: Int): Array[Byte] = {
    val nn = (optionsMask & 32) != 0
    val m = if (n <= 8) 3 else if (n <= 16) 4 else 5
    val uncompId = (1 << m) - 1
    val maxK = math.min(uncompId - 2, n - 2)
    val xmax = (1L << n) - 1
    val bits = new scala.collection.mutable.ArrayBuffer[Boolean]
    def put(v: Long, w: Int): Unit =
      (w - 1 to 0 by -1).foreach(b => bits += ((v >> b) & 1L) == 1L)
    def putFs(v: Long): Unit = { var z = 0L; while (z < v) { bits += false; z += 1 }; bits += true }
    var at = 0
    while (at < samples.length) {
      val len = math.min(pps, samples.length - at)
      val blocks = (len + j - 1) / j
      val padded = blocks * j
      // pad with the last real sample: zero deltas under NN
      val s = Array.tabulate(padded)(i => samples(at + math.min(i, len - 1)))
      val mapped = new Array[Long](padded)
      if (nn) {
        var p = s(0)
        for (i <- 1 until padded) {
          val d = s(i) - p
          val theta = math.min(p, xmax - p)
          mapped(i) =
            if (d >= -theta && d <= theta) { if (d >= 0) 2 * d else -2 * d - 1 }
            else theta + math.abs(d)
          p = s(i)
        }
      } else for (i <- 0 until padded) mapped(i) = s(i)
      var b = 0
      while (b < blocks) {
        val first = nn && b == 0
        val lo = b * j + (if (first) 1 else 0)
        val vals = (lo until (b + 1) * j).map(mapped)
        if (vals.forall(_ == 0L)) { // zero-block run, segment-bounded
          val segEnd = math.min(((b / 64) + 1) * 64, blocks)
          var e = b + 1
          while (e < segEnd && (e * j until (e + 1) * j).forall(i => mapped(i) == 0L)) e += 1
          val run = e - b
          put(0, m); put(0, 1)
          if (first) put(s(0), n)
          if (e == segEnd) putFs(4) // remainder of segment (or scanline)
          else if (run <= 4) putFs(run - 1)
          else putFs(run)
          b = e
        } else {
          val cnt = vals.length
          val refBits = if (first) n else 0
          def splitCost(k: Int): Long = m + refBits + vals.map(_ >> k).sum + cnt + cnt.toLong * k
          val (bestK, bestKCost) = (0 to maxK).map(k => k -> splitCost(k)).minBy(_._2)
          val pairs = (0 until j / 2).map { g =>
            if (first && g == 0) (0L, mapped(b * j + 1)) // phantom-zero pair
            else (mapped(b * j + 2 * g), mapped(b * j + 2 * g + 1))
          }
          // γ = s(s+1)/2 + d₂ overflows Long for large pair sums — SE is
          // only ever competitive for tiny deltas, so gate it there
          val seViable = pairs.forall { case (d1, d2) => d1 + d2 < (1L << 20) }
          val gammas =
            if (seViable) pairs.map { case (d1, d2) => val ds = d1 + d2; ds * (ds + 1) / 2 + d2 }
            else Seq.empty[Long]
          val seCost = if (seViable) m + 1 + refBits + gammas.map(_ + 1).sum else Long.MaxValue
          val rawCost = m.toLong + refBits + cnt.toLong * n
          if (seCost < bestKCost && seCost < rawCost) {
            put(0, m); put(1, 1); if (first) put(s(0), n); gammas.foreach(putFs)
          } else if (bestKCost <= rawCost) {
            put(bestK + 1, m); if (first) put(s(0), n)
            vals.foreach(v => putFs(v >> bestK))
            if (bestK > 0) vals.foreach(v => put(v & ((1L << bestK) - 1), bestK))
          } else {
            put(uncompId, m); if (first) put(s(0), n); vals.foreach(put(_, n))
          }
          b += 1
        }
      }
      at += len
    }
    val out = new Array[Byte]((bits.length + 7) / 8)
    bits.zipWithIndex.foreach { case (bit, i) =>
      if (bit) out(i >> 3) = (out(i >> 3) | (1 << (7 - (i & 7)))).toByte
    }
    out
  }

  /** v1 object header: 16-byte prologue + 8-byte-aligned messages. */
  private def writeObjectHeaderV1(buf: Buf, messages: Seq[(Int, Array[Byte])]): Long = {
    buf.align8()
    val addr = buf.pos
    val padded = messages.map { case (t, body) => (t, pad8(body)) }
    val hdrSize = padded.map(_._2.length + 8).sum
    buf.bb.put(1.toByte).put(0.toByte)
    buf.bb.putShort(messages.length.toShort)
    buf.bb.putInt(1)        // reference count
    buf.bb.putInt(hdrSize)
    buf.bb.putInt(0)        // pad prologue to 16
    padded.foreach { case (t, body) =>
      buf.bb.putShort(t.toShort).putShort(body.length.toShort)
      buf.bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      buf.bb.put(body)
    }
    addr
  }

  // ---- dataset writers ---------------------------------------------------

  /** Raw little-endian doubles at the current (aligned) position. */
  private def writeDoubles(buf: Buf, vals: Array[Double]): Long = {
    buf.align8(); val addr = buf.pos
    vals.foreach(buf.bb.putDouble)
    addr
  }

  private def writeIntsBE(buf: Buf, vals: Array[Int]): Long = {
    buf.align8(); val addr = buf.pos
    vals.foreach { v =>
      buf.bb.put((v >>> 24).toByte).put((v >>> 16).toByte).put((v >>> 8).toByte).put(v.toByte)
    }
    addr
  }

  /** Chunked storage: full-size chunks (HDF5 allocates whole chunks even
    * past the dataset extent; the overhang is fill), each run through
    * `transform` (the write-side filter pipeline), + a level-0 v1
    * B-tree (node type 1) indexing the STORED sizes. Returns the B-tree
    * address. */
  private def writeChunks(buf: Buf, shape: Array[Long], chunk: Array[Int],
                          cellAt: Array[Long] => Double, fillPad: Double,
                          transform: Array[Byte] => Array[Byte] = identity,
                          leafSize: Int = 0, elemSize: Int = 8,
                          putElem: (ByteBuffer, Double) => Unit = (bb, v) => bb.putDouble(v)): Long = {
    val rank = shape.length
    val grid = shape.indices.map(d => ((shape(d) + chunk(d) - 1) / chunk(d)).toInt)
    val chunkElems = chunk.product
    // enumerate chunk origins in row-major grid order
    val origins = (0 until grid.product).map { gi =>
      var rem = gi
      val o = new Array[Long](rank)
      for (d <- (rank - 1) to 0 by -1) {
        o(d) = (rem % grid(d)).toLong * chunk(d); rem /= grid(d)
      }
      o
    }
    val chunkAddrSizes = origins.map { o =>
      val raw = ByteBuffer.allocate(chunkElems * elemSize).order(ByteOrder.LITTLE_ENDIAN)
      val idx = new Array[Long](rank)
      for (e <- 0 until chunkElems) {
        var rem = e
        for (d <- (rank - 1) to 0 by -1) { idx(d) = o(d) + rem % chunk(d); rem /= chunk(d) }
        val inBounds = (0 until rank).forall(d => idx(d) < shape(d))
        putElem(raw, if (inBounds) cellAt(idx) else fillPad)
      }
      val stored = transform(raw.array())
      buf.align8(); val addr = buf.pos
      buf.bb.put(stored)
      (addr, stored.length)
    }
    // B-tree nodes: key_i (chunk size, filter mask, offsets+0) child_i …
    // key_N. `leafSize` 0 = one root leaf; > 0 splits the entries into
    // leaves of that size under a level-1 internal node — the shape
    // netcdf-c's DEFAULT (non-latest) format grows past a few hundred
    // chunks per variable. Internal keys are the first chunk key of each
    // child subtree, per the v1 spec.
    val entries: Seq[(Int, Seq[Long], Long)] = origins.zip(chunkAddrSizes).map {
      case (o, (addr, size)) => (size, o.toSeq :+ 0L, addr)
    }
    val pastEnd: (Int, Seq[Long]) = (0, shape.toSeq :+ 0L)
    def writeNode(level: Int, es: Seq[(Int, Seq[Long], Long)],
                  nextKey: (Int, Seq[Long])): Long = {
      buf.align8(); val node = buf.pos
      buf.bb.put('T'.toByte).put('R'.toByte).put('E'.toByte).put('E'.toByte)
      buf.bb.put(1.toByte).put(level.toByte)
      buf.bb.putShort(es.length.toShort)
      buf.bb.putLong(Undef).putLong(Undef)
      es.foreach { case (size, key, child) =>
        buf.bb.putInt(size).putInt(0)
        key.foreach(buf.bb.putLong)
        buf.bb.putLong(child)
      }
      buf.bb.putInt(nextKey._1).putInt(0)
      nextKey._2.foreach(buf.bb.putLong)
      node
    }
    if (leafSize <= 0 || entries.length <= leafSize) writeNode(0, entries, pastEnd)
    else {
      val groups = entries.grouped(leafSize).toSeq
      val leafAddrs = groups.zipWithIndex.map { case (g, i) =>
        val next =
          if (i + 1 < groups.length) { val h = groups(i + 1).head; (h._1, h._2) }
          else pastEnd
        writeNode(0, g, next)
      }
      val internal = groups.zip(leafAddrs).map { case (g, a) => (g.head._1, g.head._2, a) }
      writeNode(1, internal, pastEnd)
    }
  }

  // ---- "latest format" building blocks (layout v4 + dense groups) --------

  /** Dataspace v2 — what the latest format writes (type byte instead of
    * the v1 reserved run). */
  private def dataspaceV2(dims: Array[Long], unlimitedFirst: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(4 + dims.length * 8 * (if (unlimitedFirst) 2 else 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(2.toByte).put(dims.length.toByte)
    b.put((if (unlimitedFirst) 1 else 0).toByte)
    b.put(1.toByte) // type: simple
    dims.foreach(b.putLong)
    if (unlimitedFirst) {
      b.putLong(Undef)
      dims.drop(1).foreach(b.putLong)
    }
    b.array()
  }

  /** Attribute message v3 — unpadded name/dtype/dspace + charset byte,
    * the latest-format form. */
  private def attrMsgV3(name: String, dtype: Array[Byte], dspace: Array[Byte],
                        data: Array[Byte]): Array[Byte] = {
    val nameB = (name + "\u0000").getBytes("UTF-8")
    val b = ByteBuffer.allocate(9 + nameB.length + dtype.length + dspace.length + data.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(3.toByte).put(0.toByte) // version, flags
    b.putShort(nameB.length.toShort)
    b.putShort(dtype.length.toShort)
    b.putShort(dspace.length.toShort)
    b.put(0.toByte) // name character-set encoding: ASCII
    b.put(nameB).put(dtype).put(dspace).put(data)
    b.array()
  }

  private def doubleAttrV3(name: String, v: Double): Array[Byte] =
    attrMsgV3(name, f64Type, scalarSpace,
      ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v).array())

  private def stringAttrV3(name: String, v: String): Array[Byte] =
    attrMsgV3(name, strType(v.length + 1), scalarSpace, (v + "\u0000").getBytes("UTF-8"))

  /** Data Layout v4 builder. `rawDims` is written libhdf5-style: the
    * chunk dims PLUS the trailing element-size dim, 8-byte encoded.
    * `idxSpecific` carries the index-type-specific property bytes. */
  private def layoutV4(flags: Int, rawDims: Array[Long], idxType: Int,
                       idxSpecific: Array[Byte], addr: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(5 + rawDims.length * 8 + 1 + idxSpecific.length + 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put(4.toByte).put(2.toByte) // version 4, class 2 (chunked)
    b.put(flags.toByte)
    b.put(rawDims.length.toByte)
    b.put(8.toByte) // dim size encoded length
    rawDims.foreach(b.putLong)
    b.put(idxType.toByte)
    b.put(idxSpecific)
    b.putLong(addr)
    b.array()
  }

  /** Write the chunk payloads of a dataset (row-major grid order),
    * each through `transform`; returns (addr, storedSize) per chunk.
    * `packed` writes chunks back-to-back (the implicit-index layout). */
  private def writeChunkData(buf: Buf, shape: Array[Long], chunk: Array[Int],
                             cellAt: Array[Long] => Double, fillPad: Double,
                             transform: Array[Byte] => Array[Byte] = identity,
                             packed: Boolean = false): Seq[(Long, Int)] = {
    val rank = shape.length
    val grid = shape.indices.map(d => ((shape(d) + chunk(d) - 1) / chunk(d)).toInt)
    val chunkElems = chunk.product
    (0 until grid.product).map { gi =>
      var rem = gi
      val o = new Array[Long](rank)
      for (d <- (rank - 1) to 0 by -1) { o(d) = (rem % grid(d)).toLong * chunk(d); rem /= grid(d) }
      val raw = ByteBuffer.allocate(chunkElems * 8).order(ByteOrder.LITTLE_ENDIAN)
      val idx = new Array[Long](rank)
      for (e <- 0 until chunkElems) {
        var r = e
        for (d <- (rank - 1) to 0 by -1) { idx(d) = o(d) + r % chunk(d); r /= chunk(d) }
        val inBounds = (0 until rank).forall(d => idx(d) < shape(d))
        raw.putDouble(if (inBounds) cellAt(idx) else fillPad)
      }
      val stored = transform(raw.array())
      if (!packed) buf.align8()
      val addr = buf.pos
      buf.bb.put(stored)
      (addr, stored.length)
    }
  }

  /** One chunk-index element: client 0 = addr only; client 1 = addr +
    * 4-byte stored size + 4-byte filter mask (entry size 16). */
  private def putIdxElement(bb: ByteBuffer, addr: Long, size: Int, filtered: Boolean): Unit = {
    bb.putLong(addr)
    if (filtered) { bb.putInt(size); bb.putInt(0) }
  }

  /** Fixed Array index: FAHD header + FADB data block — unpaged while
    * the entries fit in one 2^pageBits page, otherwise paged (page-init
    * bitmap + block checksum, then per-page element runs each with its
    * own checksum). */
  private def writeFixedArray(buf: Buf, chunks: Seq[(Long, Int)],
                              filtered: Boolean, pageBits: Int = 10): Long = {
    val entrySize = if (filtered) 16 else 8
    val pageElems = 1 << pageBits
    buf.align8(); val dbAddr = buf.pos
    buf.bb.put("FADB".getBytes("US-ASCII"))
    buf.bb.put(0.toByte).put((if (filtered) 1 else 0).toByte)
    val dbHdrPatch = buf.pos; buf.bb.putLong(Undef) // header addr, patched
    if (chunks.length <= pageElems) {
      chunks.foreach { case (a, s) => putIdxElement(buf.bb, a, s, filtered) }
      buf.bb.putInt(0) // checksum (not verified by the reader)
    } else {
      val npages = (chunks.length + pageElems - 1) / pageElems
      val bitmap = new Array[Byte]((npages + 7) / 8)
      // H5VM bit order: bit 0 = first byte's HIGH bit (H5VMprivate.h)
      (0 until npages).foreach(p => bitmap(p / 8) = (bitmap(p / 8) | (1 << (7 - (p % 8)))).toByte)
      buf.bb.put(bitmap)
      buf.bb.putInt(0) // block checksum
      chunks.grouped(pageElems).foreach { page =>
        page.foreach { case (a, s) => putIdxElement(buf.bb, a, s, filtered) }
        buf.bb.putInt(0) // page checksum
      }
    }
    buf.align8(); val hdr = buf.pos
    buf.bb.put("FAHD".getBytes("US-ASCII"))
    buf.bb.put(0.toByte).put((if (filtered) 1 else 0).toByte)
    buf.bb.put(entrySize.toByte).put(pageBits.toByte)
    buf.bb.putLong(chunks.length.toLong)
    buf.bb.putLong(dbAddr)
    buf.bb.putInt(0) // checksum
    buf.bb.putLong(dbHdrPatch.toInt, hdr)
    hdr
  }

  /** Extensible Array index: EAHD + EAIB + EADBs per the super-block
    * geometry (sblk s → 2^(s/2) blocks of 2^((s+1)/2)·minElmts elements).
    * The first 2·log2(minPtrs) super blocks' data blocks are addressed
    * from the index block; later super blocks spill into EASB secondary
    * blocks whose addresses the index block carries. */
  private def writeExtensibleArray(buf: Buf, chunks: Seq[(Long, Int)], filtered: Boolean,
                                   idxElmts: Int, minElmts: Int, minPtrs: Int,
                                   pageBits: Int = 10):
      (Long, Array[Byte]) = {
    val clientId = if (filtered) 1 else 0
    val elmtSize = if (filtered) 16 else 8
    val maxBits = 32
    val arrOffSize = (maxBits + 7) / 8
    val pageElems = 1 << pageBits
    def log2(v: Int): Int = 63 - java.lang.Long.numberOfLeadingZeros(v.toLong)
    val nsblks = 1 + maxBits - log2(minElmts)
    val nsblksInIblock = math.min(2 * log2(minPtrs), nsblks)
    val ndblkAddrs = 2 * (minPtrs - 1)
    val nsblkAddrs = nsblks - nsblksInIblock
    // super-block table (all of them)
    case class Sblk(ndblks: Int, dblkNelmts: Int, startIdx: Long, startDblk: Int)
    val sblks = {
      var si = 0L; var sd = 0
      (0 until nsblks).map { s =>
        val i = Sblk(1 << (s / 2), (1 << ((s + 1) / 2)) * minElmts, si, sd)
        si += i.ndblks.toLong * i.dblkNelmts; sd += i.ndblks; i
      }
    }
    val overflow = chunks.drop(idxElmts) // elements past the direct slots
    val patches = Seq.newBuilder[Long]   // header-addr fields to patch
    def writeDataBlock(base: Int, nelmts: Int): (Long, Seq[Boolean]) = {
      buf.align8(); val dAddr = buf.pos
      buf.bb.put("EADB".getBytes("US-ASCII"))
      buf.bb.put(0.toByte).put(clientId.toByte)
      patches += buf.pos; buf.bb.putLong(Undef) // header addr
      buf.bb.putInt(idxElmts + base)            // block offset (element index)
      if (nelmts <= pageElems) {
        (0 until nelmts).foreach { e =>
          val (a, s) = if (base + e < overflow.length) overflow(base + e) else (Undef, 0)
          putIdxElement(buf.bb, a, s, filtered)
        }
        buf.bb.putInt(0) // checksum
        (dAddr, Seq.empty)
      } else {
        // PAGED: the prefix checksum closes the block itself; fixed-stride
        // pages (pageElems entries + page checksum) follow back-to-back.
        // Pages holding no real element stay uninit in the EASB bitmap and
        // are filled with ZERO entries — garbage a reader that ignored the
        // bitmap would misread as chunks at file offset 0.
        buf.bb.putInt(0) // block checksum
        val npages = nelmts / pageElems
        val init = (0 until npages).map { p =>
          val pageHasData = base + p * pageElems < overflow.length
          (0 until pageElems).foreach { e =>
            val idx = base + p * pageElems + e
            val (a, s) =
              if (!pageHasData) (0L, 0)
              else if (idx < overflow.length) overflow(idx)
              else (Undef, 0)
            putIdxElement(buf.bb, a, s, filtered)
          }
          buf.bb.putInt(0) // page checksum
          pageHasData
        }
        (dAddr, init)
      }
    }
    val dblkAddrs = Array.fill(ndblkAddrs)(Undef)
    val sblkAddrs = Array.fill(nsblkAddrs)(Undef)
    sblks.zipWithIndex.foreach { case (info, s) =>
      if (info.startIdx < overflow.length) {
        if (s < nsblksInIblock) {
          require(info.dblkNelmts <= pageElems,
            "fixture: index-block data blocks must be unpaged (as in libhdf5)")
          (0 until info.ndblks).foreach { bi =>
            val base = (info.startIdx + bi.toLong * info.dblkNelmts).toInt
            if (base < overflow.length)
              dblkAddrs(info.startDblk + bi) = writeDataBlock(base, info.dblkNelmts)._1
          }
        } else {
          // secondary block: data blocks first, then the EASB listing them
          val written = (0 until info.ndblks).map { bi =>
            val base = (info.startIdx + bi.toLong * info.dblkNelmts).toInt
            if (base < overflow.length) writeDataBlock(base, info.dblkNelmts)
            else (Undef, Seq.empty[Boolean])
          }
          val paged = info.dblkNelmts > pageElems
          val npagesPer = if (paged) info.dblkNelmts / pageElems else 0
          val bmBytesPer = (npagesPer + 7) / 8
          buf.align8(); val sAddr = buf.pos
          buf.bb.put("EASB".getBytes("US-ASCII"))
          buf.bb.put(0.toByte).put(clientId.toByte)
          patches += buf.pos; buf.bb.putLong(Undef)   // header addr
          buf.bb.putInt((idxElmts + info.startIdx).toInt) // block offset
          if (paged) {
            // one byte-aligned page-init region per data block; H5VM bit
            // order: bit 0 = the byte's HIGH bit
            val bitmap = new Array[Byte](info.ndblks * bmBytesPer)
            written.zipWithIndex.foreach { case ((_, init), bi) =>
              init.zipWithIndex.foreach { case (on, p) =>
                if (on) {
                  val bit = bi * bmBytesPer * 8 + p
                  bitmap(bit / 8) = (bitmap(bit / 8) | (1 << (7 - (bit % 8)))).toByte
                }
              }
            }
            buf.bb.put(bitmap)
          }
          written.foreach(w => buf.bb.putLong(w._1))
          buf.bb.putInt(0) // checksum
          sblkAddrs(s - nsblksInIblock) = sAddr
        }
      }
    }
    // index block
    buf.align8(); val iblock = buf.pos
    buf.bb.put("EAIB".getBytes("US-ASCII"))
    buf.bb.put(0.toByte).put(clientId.toByte)
    patches += buf.pos; buf.bb.putLong(Undef) // header addr
    (0 until idxElmts).foreach { i =>
      val (a, s) = if (i < chunks.length) chunks(i) else (Undef, 0)
      putIdxElement(buf.bb, a, s, filtered)
    }
    dblkAddrs.foreach(buf.bb.putLong)
    sblkAddrs.foreach(buf.bb.putLong)
    buf.bb.putInt(0) // checksum
    // header
    buf.align8(); val hdr = buf.pos
    buf.bb.put("EAHD".getBytes("US-ASCII"))
    buf.bb.put(0.toByte).put(clientId.toByte)
    buf.bb.put(elmtSize.toByte).put(maxBits.toByte)
    buf.bb.put(idxElmts.toByte).put(minElmts.toByte).put(minPtrs.toByte)
    buf.bb.put(pageBits.toByte) // max data-block page elements bits
    val nDblksUsed = dblkAddrs.count(_ != Undef)
    buf.bb.putLong(0L)                        // # secondary blocks
    buf.bb.putLong(0L)                        // secondary block size
    buf.bb.putLong(nDblksUsed.toLong)         // # data blocks
    buf.bb.putLong(0L)                        // data block size
    buf.bb.putLong(chunks.length.toLong)      // max index set
    buf.bb.putLong(chunks.length.toLong)      // # elements
    buf.bb.putLong(iblock)
    buf.bb.putInt(0) // checksum
    patches.result().foreach(p => buf.bb.putLong(p.toInt, hdr))
    // layout-message creation parameters, libhdf5 field order
    (hdr, Array(maxBits.toByte, idxElmts.toByte, minPtrs.toByte, minElmts.toByte, pageBits.toByte))
  }

  /** v2 B-tree. `leafSize` 0 writes a root leaf; > 0 splits the records
    * into leaves of that size under one BTIN internal root (libhdf5
    * serial order: all records, then all child pointers). `subtreeSize`
    * > 0 additionally groups that many records into depth-1 subtrees
    * under a depth-2 BTIN root whose child pointers carry the extra
    * total-records field (width = enc size of the depth-1 cumulative
    * max, the H5B2 cum_max_nrec_size geometry). Records must share one
    * length. */
  private def writeV2Btree(buf: Buf, typ: Int, records: Seq[Array[Byte]],
                           nodeSize: Int = 512, leafSize: Int = 0,
                           subtreeSize: Int = 0): Long = {
    val recordSize = records.headOption.map(_.length).getOrElse(8)
    def encSize(v: Long): Int = {
      var n = 1; var lim = 256L; while (v >= lim) { n += 1; lim *= 256 }; n
    }
    val maxLeafRec = (nodeSize - 10) / recordSize
    val nrecSize = encSize(maxLeafRec.toLong)
    // depth-1 cumulative capacity: fixes the depth-2 pointer's total field
    val ptr1 = 8 + nrecSize
    val maxNrec1 = (nodeSize - 10 - ptr1) / (recordSize + ptr1)
    val cumSize1 = encSize((maxNrec1 + 1).toLong * maxLeafRec + maxNrec1)
    def writeLeaf(rs: Seq[Array[Byte]]): Long = {
      buf.align8(); val leaf = buf.pos
      buf.bb.put("BTLF".getBytes("US-ASCII"))
      buf.bb.put(0.toByte).put(typ.toByte)
      rs.foreach(buf.bb.put)
      buf.bb.putInt(0) // checksum
      leaf
    }
    def writeHeader(depth: Int, rootAddr: Long, rootNRec: Int): Long = {
      buf.align8(); val hdr = buf.pos
      buf.bb.put("BTHD".getBytes("US-ASCII"))
      buf.bb.put(0.toByte).put(typ.toByte)
      buf.bb.putInt(nodeSize)
      buf.bb.putShort(recordSize.toShort)
      buf.bb.putShort(depth.toShort)
      buf.bb.put(100.toByte).put(40.toByte) // split/merge percent
      buf.bb.putLong(rootAddr)
      buf.bb.putShort(rootNRec.toShort)
      buf.bb.putLong(records.length.toLong)
      buf.bb.putInt(0) // checksum
      hdr
    }
    // in-order split into `unit`-sized groups with separator records
    def split(rs: Seq[Array[Byte]], unit: Int): (Seq[Seq[Array[Byte]]], Seq[Array[Byte]]) = {
      val groups = Seq.newBuilder[Seq[Array[Byte]]]
      val seps = Seq.newBuilder[Array[Byte]]
      var i = 0
      var pending: Seq[Array[Byte]] = Seq.empty
      while (i < rs.length) {
        pending = rs.slice(i, math.min(i + unit, rs.length))
        i += pending.length
        if (i < rs.length) {
          groups += pending; pending = Seq.empty
          seps += rs(i); i += 1
        }
      }
      groups += pending // final group (possibly short, never a separator)
      (groups.result(), seps.result())
    }
    // depth-1 subtree: leaves under one BTIN; pointers = addr + nrec
    def writeInternal1(rs: Seq[Array[Byte]]): (Long, Int) = {
      val (ls, ss) = split(rs, leafSize)
      val leafAddrs = ls.map(writeLeaf)
      buf.align8(); val node = buf.pos
      buf.bb.put("BTIN".getBytes("US-ASCII"))
      buf.bb.put(0.toByte).put(typ.toByte)
      ss.foreach(buf.bb.put)               // ALL records first
      ls.zip(leafAddrs).foreach { case (rs2, a) => // then ALL child pointers
        buf.bb.putLong(a)
        (0 until nrecSize).foreach(k => buf.bb.put(((rs2.length >> (8 * k)) & 0xff).toByte))
      }
      buf.bb.putInt(0) // checksum
      (node, ss.length)
    }
    if (leafSize <= 0 || records.length < 3) writeHeader(0, writeLeaf(records), records.length)
    else if (subtreeSize <= 0 || records.length < 2 * subtreeSize + 1) {
      val (root, nrec) = writeInternal1(records)
      writeHeader(1, root, nrec)
    } else {
      // depth 2: depth-1 subtrees under a root whose pointers carry
      // addr + nrec + total-records-in-subtree (cumSize1 bytes)
      val (subs, ss) = split(records, subtreeSize)
      val built = subs.map(rs => (writeInternal1(rs), rs.length))
      buf.align8(); val root = buf.pos
      buf.bb.put("BTIN".getBytes("US-ASCII"))
      buf.bb.put(0.toByte).put(typ.toByte)
      ss.foreach(buf.bb.put)
      built.foreach { case ((a, nrec), total) =>
        buf.bb.putLong(a)
        (0 until nrecSize).foreach(k => buf.bb.put(((nrec >> (8 * k)) & 0xff).toByte))
        (0 until cumSize1).foreach(k => buf.bb.put(((total >> (8 * k)) & 0xff).toByte))
      }
      buf.bb.putInt(0) // checksum
      writeHeader(2, root, ss.length)
    }
  }

  /** v2 B-tree chunk record: type 10 (plain) = addr + scaled offsets;
    * type 11 (filtered) = addr + 4-byte size + mask + scaled offsets.
    * Scaled offsets are chunk-grid coordinates, rank dims. */
  private def chunkRecord(addr: Long, size: Int, scaled: Array[Long],
                          filtered: Boolean): Array[Byte] = {
    val b = ByteBuffer.allocate(8 + (if (filtered) 8 else 0) + scaled.length * 8)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.putLong(addr)
    if (filtered) { b.putInt(size); b.putInt(0) }
    scaled.foreach(b.putLong)
    b.array()
  }

  /** Fractal heap over managed objects. One direct block while the
    * objects fit; otherwise direct blocks per the doubling table (rows 0
    * and 1: `width` starting-size blocks, row r ≥ 2 doubling) under an
    * FHIB indirect root — the dense-group shape past ~25 links. Rows at
    * or past the max-direct row (from `maxDirectSize`) hold CHILD
    * indirect blocks of r − log2(width) rows, subdividing their span
    * from row 0 of the same table — the any-link-count shape. Returns
    * (header addr, heap IDs aligned with `objects`). Geometry:
    * maxHeapSize 32 bits → 4-byte offsets; max managed object 4096 →
    * 2-byte lengths; heap ID = 1 + 4 + 2 = 7 bytes. */
  private def writeFractalHeap(buf: Buf, objects: Seq[Array[Byte]],
                               startSize: Long = 512L,
                               maxDirectSize: Long = 65536L): (Long, Seq[Array[Byte]]) = {
    val width = 4
    val hdrLen = 13 + 4 // sig+ver+hdrAddr+blockOffset(4); flags bit1 unset: no checksum
    def rowSize(row: Int): Long = if (row < 2) startSize else startSize << (row - 1)
    val maxDbRows = ((63 - java.lang.Long.numberOfLeadingZeros(maxDirectSize)) -
      (63 - java.lang.Long.numberOfLeadingZeros(startSize)) + 2).toInt
    val log2W = (63 - java.lang.Long.numberOfLeadingZeros(width.toLong)).toInt
    // object-length field width, sized the way libhdf5 does (smaller of
    // the max-direct-block and max-managed-object encodings)
    def limitEnc(v: Long): Int = ((63 - java.lang.Long.numberOfLeadingZeros(v)) / 8) + 1
    val lenSize = math.min(limitEnc(maxDirectSize), limitEnc(4096L))
    // heap-order direct-block sizes inside a child indirect block of
    // nrows rows (all direct at fixture scale — one nesting level)
    def childSizes(nrows: Int): Seq[Long] = {
      require(nrows <= maxDbRows, "fixture: one level of child indirect blocks")
      (0 until nrows).flatMap(r => Seq.fill(width)(rowSize(r)))
    }
    // the root's heap-order direct-block size sequence, unbounded
    def rootBlockSizes: Iterator[Long] = Iterator.from(0).flatMap { r =>
      if (r < maxDbRows) Seq.fill(width)(rowSize(r))
      else (0 until width).flatMap(_ => childSizes(r - log2W))
    }
    val szIt = rootBlockSizes
    val sizeList = scala.collection.mutable.ArrayBuffer.empty[Long]
    def blockLen(i: Int): Long = {
      while (sizeList.length <= i) sizeList += szIt.next()
      sizeList(i)
    }

    // pack objects into block-local runs (objects never span blocks)
    case class Placed(obj: Array[Byte], heapOff: Long)
    val blockRuns = Seq.newBuilder[(Int, Seq[Placed])] // (blockIdx, objects)
    val ids = Seq.newBuilder[Array[Byte]]
    var blockIdx = 0
    var blockStart = 0L
    var cursor = hdrLen.toLong // heap-space offset within the current block
    var run = Seq.newBuilder[Placed]
    objects.foreach { o =>
      if (cursor + o.length > blockStart + blockLen(blockIdx)) {
        blockRuns += ((blockIdx, run.result())); run = Seq.newBuilder[Placed]
        blockStart += blockLen(blockIdx)
        blockIdx += 1
        cursor = blockStart + hdrLen
      }
      run += Placed(o, cursor)
      val id = ByteBuffer.allocate(1 + 4 + lenSize).order(ByteOrder.LITTLE_ENDIAN)
      id.put(0.toByte).putInt(cursor.toInt)
      (0 until lenSize).foreach(k => id.put(((o.length >> (8 * k)) & 0xff).toByte))
      ids += id.array()
      cursor += o.length
    }
    blockRuns += ((blockIdx, run.result()))
    val runs = blockRuns.result()
    val nBlocks = blockIdx + 1
    val patches = Seq.newBuilder[Long] // heap-header-addr fields to patch

    // direct blocks
    val blockAddrs = scala.collection.mutable.Map.empty[Int, Long]
    var bStart = 0L
    (0 until nBlocks).foreach { i =>
      buf.align8(); val dblock = buf.pos
      buf.bb.put("FHDB".getBytes("US-ASCII"))
      buf.bb.put(0.toByte)
      patches += buf.pos; buf.bb.putLong(Undef) // heap header addr
      buf.bb.putInt(bStart.toInt)               // block offset in heap space
      val content = runs.find(_._1 == i).map(_._2).getOrElse(Seq.empty)
      var at = bStart + hdrLen
      content.foreach { p =>
        (at until p.heapOff).foreach(_ => buf.bb.put(0.toByte)) // intra-block gap
        buf.bb.put(p.obj)
        at = p.heapOff + p.obj.length
      }
      (at until bStart + blockLen(i)).foreach(_ => buf.bb.put(0.toByte)) // tail pad
      blockAddrs(i) = dblock
      bStart += blockLen(i)
    }
    val heapSpace = bStart

    // indirect root when more than one block; rows past maxDbRows get
    // child indirect blocks (written first, bottom-up)
    val (rootAddr, curRows) =
      if (nBlocks == 1) (blockAddrs(0), 0)
      else {
        var covered = 0; var rows = 0
        while (covered < nBlocks) {
          covered += (if (rows < maxDbRows) width
                      else width * childSizes(rows - log2W).length)
          rows += 1
        }
        var flat = 0
        var heapOff = 0L
        val rootEntries = Seq.newBuilder[Long]
        (0 until rows).foreach { r =>
          (0 until width).foreach { _ =>
            if (r < maxDbRows) {
              rootEntries += blockAddrs.getOrElse(flat, Undef)
              flat += 1
            } else {
              val nchild = childSizes(r - log2W).length
              val childFlats = flat until flat + nchild
              if (childFlats.forall(i => !blockAddrs.contains(i))) rootEntries += Undef
              else {
                buf.align8(); val cib = buf.pos
                buf.bb.put("FHIB".getBytes("US-ASCII"))
                buf.bb.put(0.toByte)
                patches += buf.pos; buf.bb.putLong(Undef) // heap header addr
                buf.bb.putInt(heapOff.toInt)              // block offset in heap space
                childFlats.foreach(i => buf.bb.putLong(blockAddrs.getOrElse(i, Undef)))
                buf.bb.putInt(0) // checksum
                rootEntries += cib
              }
              flat += nchild
            }
            heapOff += rowSize(r)
          }
        }
        buf.align8(); val ib = buf.pos
        buf.bb.put("FHIB".getBytes("US-ASCII"))
        buf.bb.put(0.toByte)
        patches += buf.pos; buf.bb.putLong(Undef) // heap header addr
        buf.bb.putInt(0)                          // block offset
        rootEntries.result().foreach(buf.bb.putLong)
        buf.bb.putInt(0) // checksum
        (ib, rows)
      }

    buf.align8(); val hdr = buf.pos
    buf.bb.put("FRHP".getBytes("US-ASCII"))
    buf.bb.put(0.toByte)
    buf.bb.putShort((1 + 4 + lenSize).toShort)  // heap ID length
    buf.bb.putShort(0.toShort)  // io filter length
    buf.bb.put(0.toByte)        // flags (no dblock checksums)
    buf.bb.putInt(4096)         // max managed object size
    buf.bb.putLong(0L).putLong(Undef)    // next huge id, huge btree
    buf.bb.putLong(heapSpace - cursor).putLong(Undef) // free space, fs manager
    buf.bb.putLong(heapSpace).putLong(heapSpace)      // managed space, allocated
    buf.bb.putLong(cursor).putLong(objects.length.toLong) // iterator offset, nobjs
    buf.bb.putLong(0L).putLong(0L).putLong(0L).putLong(0L) // huge/tiny stats
    buf.bb.putShort(width.toShort)
    buf.bb.putLong(startSize)      // starting block size
    buf.bb.putLong(maxDirectSize)  // max direct block size
    buf.bb.putShort(32.toShort) // max heap size (bits)
    buf.bb.putShort((if (curRows == 0) 0 else curRows).toShort) // starting rows
    buf.bb.putLong(rootAddr)
    buf.bb.putShort(curRows.toShort) // 0 = root is a direct block
    buf.bb.putInt(0)            // checksum
    patches.result().foreach(p => buf.bb.putLong(p.toInt, hdr))
    (hdr, ids.result())
  }

  /** Serialized Link message body (also the object stored in a dense
    * group's fractal heap). */
  private def linkMsgBody(name: String, oh: Long): Array[Byte] = {
    val nb = name.getBytes("UTF-8")
    val b = ByteBuffer.allocate(3 + nb.length + 8).order(ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).put(0.toByte) // version, flags: 1-byte name length
    b.put(nb.length.toByte).put(nb)
    b.putLong(oh)
    b.array()
  }

  /** v2 object header ("OHDR"), 2-byte chunk-0 size, no times/corder. */
  private def writeObjectHeaderV2(buf: Buf, msgs: Seq[(Int, Array[Byte])]): Long = {
    buf.align8(); val addr = buf.pos
    val bodyLen = msgs.map { case (_, m) => 4 + m.length }.sum
    buf.bb.put("OHDR".getBytes("US-ASCII"))
    buf.bb.put(2.toByte).put(1.toByte)      // version, flags: 2-byte size
    buf.bb.putShort((bodyLen + 4).toShort)  // chunk 0 size incl. checksum
    msgs.foreach { case (t, m) =>
      buf.bb.put(t.toByte).putShort(m.length.toShort).put(0.toByte).put(m)
    }
    buf.bb.putInt(0) // checksum
    addr
  }

  /** The "latest format" file (H5Pset_libver_bounds(latest, latest)):
    * superblock v2, v2 object headers, layout-v4 chunk indexes — every
    * index type netcdf-c/libhdf5 can emit (single chunk, implicit, fixed
    * array, extensible array for the unlimited dim, v2 B-tree) — and a
    * DENSE root group (fractal heap + name-index v2 B-tree) as written
    * once a group passes the compact-links threshold. */
  def writeLatest(c: Content, extraVars: Int = 0, faPageBits: Int = 10,
                  eaPageBits: Int = 10, zmSubtree: Int = 0,
                  heapStart: Long = 512L, heapMaxDirect: Long = 65536L,
                  zmDenseAttrs: Int = 0): Array[Byte] = {
    val buf = new Buf()
    buf.bb.position(48) // superblock v2; patched last

    // x: single-chunk index (type 1), one chunk spanning the whole var
    val Seq((xAddr, _)) = writeChunkData(buf, Array(c.n.toLong), Array(c.n),
      idx => c.x(idx(0).toInt), fillPad = 0.0)
    val xOh = writeObjectHeaderV2(buf, Seq(
      0x0001 -> dataspace(Array(c.n.toLong), unlimitedFirst = false),
      0x0003 -> f64Type,
      0x0008 -> layoutV4(0, Array(c.n.toLong, 8L), 1, Array.empty, xAddr)))

    // y: implicit index (type 2) — packed full chunks, address arithmetic
    val yChunks = writeChunkData(buf, Array(c.n.toLong), Array(5),
      idx => c.y(idx(0).toInt), fillPad = 0.0, packed = true)
    val yOh = writeObjectHeaderV2(buf, Seq(
      0x0001 -> dataspace(Array(c.n.toLong), unlimitedFirst = false),
      0x0003 -> f64Type,
      0x0008 -> layoutV4(0, Array(5L, 8L), 2, Array.empty, yChunks.head._1)))

    // element: fixed-array index (type 3). Stored as f64 chunks for
    // simplicity of the shared writer — dtype stays f64, values integral
    val eleChunks = writeChunkData(buf, Array(c.m.toLong, 3L), Array(2, 3),
      idx => c.ele((idx(0) * 3 + idx(1)).toInt).toDouble, fillPad = 0.0)
    val eleFa = writeFixedArray(buf, eleChunks, filtered = false, pageBits = faPageBits)
    val eleOh = writeObjectHeaderV2(buf, Seq(
      0x0001 -> dataspace(Array(c.m.toLong, 3L), unlimitedFirst = false),
      0x0003 -> f64Type,
      0x0008 -> layoutV4(0, Array(2L, 3L, 8L), 3, Array(faPageBits.toByte), eleFa)))

    // zeta_max: v2 B-tree index (type 5), fletcher32-filtered records
    val zmChunks = writeChunkData(buf, Array(c.n.toLong), Array(5),
      idx => c.zetaMax(idx(0).toInt), fillPad = c.fill, transform = fletcher32Bytes)
    val zmRecords = zmChunks.zipWithIndex.map { case ((a, s), i) =>
      chunkRecord(a, s, Array(i.toLong), filtered = true)
    }
    val zmBt = writeV2Btree(buf, 11, zmRecords, leafSize = 1,
      subtreeSize = zmSubtree) // BTIN root (depth 2 when zmSubtree > 0)
    // zmDenseAttrs > 0: _FillValue + that many extras stored DENSE — the
    // Attribute Info (0x0015) shape libhdf5 writes past 8 attributes:
    // attribute message bodies in a fractal heap + a name v2 B-tree
    // (type 8: heap ID padded to 8 + flags + creation order + hash)
    val zmAttrMsgs: Seq[(Int, Array[Byte])] =
      if (zmDenseAttrs <= 0) Seq(0x000C -> doubleAttr("_FillValue", c.fill))
      else {
        val bodies = doubleAttrV3("_FillValue", c.fill) +:
          (0 until zmDenseAttrs).map(i => stringAttrV3(f"meta$i%02d", s"value-$i"))
        val (afh, aids) = writeFractalHeap(buf, bodies)
        val recs = aids.zipWithIndex.map { case (id, i) =>
          val b = ByteBuffer.allocate(17).order(ByteOrder.LITTLE_ENDIAN)
          b.put(java.util.Arrays.copyOf(id, 8)) // heap ID, zero-padded
          b.put(0.toByte).putInt(i).putInt(i)   // msg flags, creation order, hash
          b.array()
        }
        val abt = writeV2Btree(buf, 8, recs)
        val info = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
        info.put(0.toByte).put(0.toByte).putLong(afh).putLong(abt)
        Seq(0x0015 -> info.array())
      }
    val zmOh = writeObjectHeaderV2(buf, Seq(
      0x0001 -> dataspace(Array(c.n.toLong), unlimitedFirst = false),
      0x0003 -> f64Type,
      0x0008 -> layoutV4(0, Array(5L, 8L), 5,
        { val b = ByteBuffer.allocate(6).order(ByteOrder.LITTLE_ENDIAN)
          b.putInt(512).put(100.toByte).put(40.toByte); b.array() }, zmBt),
      0x000B -> filterPipelineMsg(Seq(3 -> Array.empty[Int]))) ++ zmAttrMsgs)

    // time: extensible-array index (type 4), 1 direct slot → exercises a
    // data block too (2 chunks of 3 records)
    val tChunks = writeChunkData(buf, Array(c.t.toLong), Array(3),
      idx => c.time(idx(0).toInt), fillPad = 0.0)
    val (tEa, tEaParams) = writeExtensibleArray(buf, tChunks, filtered = false,
      idxElmts = 1, minElmts = 2, minPtrs = 4, pageBits = eaPageBits)
    val timeOh = writeObjectHeaderV2(buf, Seq(
      // latest-format message versions: dataspace v2, attribute v3
      0x0001 -> dataspaceV2(Array(c.t.toLong), unlimitedFirst = true),
      0x0003 -> f64Type,
      0x0008 -> layoutV4(0, Array(3L, 8L), 4, tEaParams, tEa),
      0x000C -> stringAttrV3("units", c.units)))

    // zeta: extensible array over shuffle+deflate chunks (client 1) —
    // the compressed record variable, the netcdf-c latest-format shape
    val zChunks = writeChunkData(buf, Array(c.t.toLong, c.n.toLong), Array(2, 5),
      idx => c.zeta(idx(0).toInt, idx(1).toInt), fillPad = c.fill,
      transform = b => deflateBytes(shuffleBytes(b, 8)))
    val (zEa, zEaParams) = writeExtensibleArray(buf, zChunks, filtered = true,
      idxElmts = 2, minElmts = 2, minPtrs = 4, pageBits = eaPageBits)
    val zetaOh = writeObjectHeaderV2(buf, Seq(
      0x0001 -> dataspaceV2(Array(c.t.toLong, c.n.toLong), unlimitedFirst = true),
      0x0003 -> f64Type,
      0x0008 -> layoutV4(0, Array(2L, 5L, 8L), 4, zEaParams, zEa),
      0x000C -> doubleAttrV3("_FillValue", c.fill),
      0x000B -> filterPipelineMsg(Seq(2 -> Array(8), 1 -> Array(4)))))

    // optional extra tiny vars: enough links overflow the heap's first
    // 512-byte direct block, forcing an FHIB indirect root
    val extras = (0 until extraVars).map { i =>
      val a = writeDoubles(buf, Array(i.toDouble, i + 0.5))
      f"extra$i%02d" -> writeObjectHeaderV2(buf, Seq(
        0x0001 -> dataspace(Array(2L), unlimitedFirst = false),
        0x0003 -> f64Type,
        0x0008 -> contiguousLayout(a, 16L)))
    }

    // dense root group: link messages live in the fractal heap, indexed
    // by a name v2 B-tree (type 5: hash + 7-byte heap ID)
    val links = Seq("element" -> eleOh, "time" -> timeOh, "x" -> xOh,
                    "y" -> yOh, "zeta" -> zetaOh, "zeta_max" -> zmOh) ++ extras
    val (fheap, heapIds) = writeFractalHeap(buf,
      links.map { case (n, oh) => linkMsgBody(n, oh) },
      startSize = heapStart, maxDirectSize = heapMaxDirect)
    val nameRecords = heapIds.zipWithIndex.map { case (id, i) =>
      val b = ByteBuffer.allocate(4 + id.length).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(i) // name hash: a lookup key only — enumeration ignores it
      b.put(id)
      b.array()
    }
    val nameBt = writeV2Btree(buf, 5, nameRecords)
    val linkInfo = {
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0.toByte).put(0.toByte) // version, flags
      b.putLong(fheap)
      b.putLong(nameBt)
      b.array()
    }
    val rootOh = writeObjectHeaderV2(buf, Seq(0x0002 -> linkInfo))

    // superblock v2
    val eof = buf.pos
    val sb = ByteBuffer.wrap(buf.bb.array(), 0, 48).order(ByteOrder.LITTLE_ENDIAN)
    sb.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    sb.put(2.toByte)             // superblock v2
    sb.put(8.toByte).put(8.toByte) // sizeof offsets / lengths
    sb.put(0.toByte)             // consistency flags
    sb.putLong(0L).putLong(Undef).putLong(eof)
    sb.putLong(rootOh)
    sb.putInt(0)                 // checksum (not verified by the reader)
    buf.bytes
  }

  // ---- fixture content (matches the IngestSpec CDF-1 fixture) ------------

  /** Fixture content. The default generators give the Hdf5Spec lattice;
    * override them (PipelineSpec does) for arbitrary meshes/fields. */
  case class Content(n: Int, m: Int, t: Int, fill: Double,
                     dry: Set[(Int, Int)], dryMax: Set[Int],
                     units: String,
                     xAt: Int => Double = _ * 0.5,
                     yAt: Int => Double = i => 40.0 + i * 0.25,
                     eleAt: Option[Int => Int] = None,
                     fieldAt: Option[(Int, Int) => Double] = None,
                     timeAt: Int => Double = _ * 3600.0) {
    def x(i: Int): Double = xAt(i)
    def y(i: Int): Double = yAt(i)
    def ele(i: Int): Int = eleAt.map(_(i)).getOrElse((i % n) + 1) // 1-based
    def zeta(ts: Int, node: Int): Double =
      if (dry((ts, node))) fill
      else fieldAt.map(_(ts, node)).getOrElse(ts * 100.0 + node + 0.25)
    def zetaMax(node: Int): Double = if (dryMax(node)) fill else 900.0 + node
    def time(ts: Int): Double = timeAt(ts)
    /** int32 wind field for the szip-filtered variable: jumping values in
      * the head (split/uncompressed blocks), a constant tail (zero-delta
      * blocks → zero-run codewords). */
    def wind(ts: Int, node: Int): Double =
      if (node >= 7) 300.0 else ((ts * 131 + node * 67) % 800).toDouble
  }

  /** netcdf-c-shaped file: superblock v0 + old-style group + chunked
    * record vars. `compress = true` runs zeta through shuffle+deflate and
    * time through fletcher32 — `nccopy -d4 -s` output shape. Returns the
    * file bytes. */
  def writeV0(c: Content, compress: Boolean = false,
              zetaFilterIdOverride: Option[Int] = None,
              corruptTimeChunk: Boolean = false,
              v1LeafSize: Int = 0,
              szipWind: Boolean = false): Array[Byte] = {
    val buf = new Buf()
    buf.bb.position(96) // superblock v0 reserved; patched last

    // ---- raw data + chunk indexes
    val xAddr = writeDoubles(buf, Array.tabulate(c.n)(c.x))
    val yAddr = writeDoubles(buf, Array.tabulate(c.n)(c.y))
    val eleAddr = writeIntsBE(buf, Array.tabulate(c.m * 3)(c.ele))
    val zmaxAddr = writeDoubles(buf, Array.tabulate(c.n)(c.zetaMax))
    // corruptTimeChunk: flip one data bit AFTER the checksum is appended —
    // the shape of real on-disk corruption a declared fletcher32 must catch
    val timeXform: Array[Byte] => Array[Byte] =
      if (corruptTimeChunk) { b =>
        val out = fletcher32Bytes(b); out(0) = (out(0) ^ 0x01).toByte; out
      }
      else if (compress) fletcher32Bytes else identity
    val timeBtree = writeChunks(buf, Array(c.t.toLong), Array(3),
      idx => c.time(idx(0).toInt), fillPad = 0.0,
      transform = timeXform)
    val zetaBtree = writeChunks(buf, Array(c.t.toLong, c.n.toLong), Array(2, 5),
      idx => c.zeta(idx(0).toInt, idx(1).toInt), fillPad = c.fill,
      transform = if (compress) (b => deflateBytes(shuffleBytes(b, 8))) else identity,
      leafSize = v1LeafSize)
    // szip-filtered int32 record var: samples flow LE-int32 raw chunk →
    // extended-Rice bit stream; cd_values as H5Z_FILTER_SZIP stores them
    val szipOpts = 128 | 32 | 16 // RAW | NN | MSB (matches the BE dtype below)
    val windBtree =
      if (!szipWind) Undef
      else writeChunks(buf, Array(c.t.toLong, c.n.toLong), Array(2, 5),
        idx => c.wind(idx(0).toInt, idx(1).toInt), fillPad = 0.0,
        transform = raw => {
          val ib = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
          val vals = Array.fill(raw.length / 4)(ib.getInt().toLong & 0xffffffffL)
          val stream = szipEncode(vals, szipOpts, n = 32, j = 4, pps = 5)
          // H5Zszip prepends the uncompressed byte count, 4-byte LE
          val out = ByteBuffer.allocate(4 + stream.length).order(ByteOrder.LITTLE_ENDIAN)
          out.putInt(raw.length).put(stream)
          out.array()
        },
        elemSize = 4, putElem = (bb, v) => bb.putInt(v.toInt))

    // ---- dataset object headers
    val xOh = writeObjectHeaderV1(buf, Seq(
      0x0001 -> dataspace(Array(c.n.toLong), unlimitedFirst = false),
      0x0003 -> f64Type,
      0x0008 -> contiguousLayout(xAddr, c.n * 8L)))
    val yOh = writeObjectHeaderV1(buf, Seq(
      0x0001 -> dataspace(Array(c.n.toLong), unlimitedFirst = false),
      0x0003 -> f64Type,
      0x0008 -> contiguousLayout(yAddr, c.n * 8L)))
    val eleOh = writeObjectHeaderV1(buf, Seq(
      0x0001 -> dataspace(Array(c.m.toLong, 3L), unlimitedFirst = false),
      0x0003 -> i32Type(bigEndian = true),
      0x0008 -> contiguousLayout(eleAddr, c.m * 3 * 4L)))
    val zmaxOh = writeObjectHeaderV1(buf, Seq(
      0x0001 -> dataspace(Array(c.n.toLong), unlimitedFirst = false),
      0x0003 -> f64Type,
      0x0008 -> contiguousLayout(zmaxAddr, c.n * 8L),
      0x000C -> doubleAttr("_FillValue", c.fill)))
    val timeOh = writeObjectHeaderV1(buf,
      Seq(
        0x0001 -> dataspace(Array(c.t.toLong), unlimitedFirst = true),
        0x0003 -> f64Type,
        0x0008 -> chunkedLayout(timeBtree, Array(3), 8),
        0x000C -> stringAttr("units", c.units),
        0x000C -> stringAttr("base_date", "2008-09-09 00:00:00")) ++
      (if (compress) Seq(0x000B -> filterPipelineMsg(Seq(3 -> Array.empty[Int])))
       else Seq.empty))
    val zetaOh = writeObjectHeaderV1(buf,
      Seq(
        0x0001 -> dataspace(Array(c.t.toLong, c.n.toLong), unlimitedFirst = true),
        0x0003 -> f64Type,
        0x0008 -> chunkedLayout(zetaBtree, Array(2, 5), 8),
        0x000C -> doubleAttr("_FillValue", c.fill)) ++
      // netcdf-c pipeline order: shuffle(es=8) THEN deflate(level 4);
      // the override declares a foreign filter id (unknown-filter tests)
      (if (compress) Seq(0x000B -> filterPipelineMsg(
         zetaFilterIdOverride.map(id => Seq(id -> Array.empty[Int]))
           .getOrElse(Seq(2 -> Array(8), 1 -> Array(4)))))
       else Seq.empty))

    val windOh =
      if (!szipWind) Undef
      else writeObjectHeaderV1(buf, Seq(
        0x0001 -> dataspace(Array(c.t.toLong, c.n.toLong), unlimitedFirst = true),
        0x0003 -> i32Type(bigEndian = true),
        0x0008 -> chunkedLayout(windBtree, Array(2, 5), 4),
        0x000B -> filterPipelineMsg(Seq(4 -> Array(szipOpts, 32, 4, 5)))))

    // ---- old-style root group: local heap, SNOD (name-sorted), B-tree
    val entries = (Seq( // MUST be in ascending name order for SNOD
      "element" -> eleOh, "time" -> timeOh, "x" -> xOh,
      "y" -> yOh, "zeta" -> zetaOh, "zeta_max" -> zmaxOh) ++
      (if (szipWind) Seq("wind" -> windOh) else Seq.empty)).sortBy(_._1)

    buf.align8()
    val heapDataAddr = buf.pos + 32
    val nameOffsets = scala.collection.mutable.Map.empty[String, Long]
    val heapData = {
      val hb = ByteBuffer.allocate(4096)
      hb.position(8) // offset 0 reserved for the empty string
      entries.foreach { case (name, _) =>
        nameOffsets(name) = hb.position().toLong
        hb.put((name + "\u0000").getBytes("UTF-8"))
        while (hb.position() % 8 != 0) hb.put(0.toByte)
      }
      java.util.Arrays.copyOf(hb.array(), hb.position())
    }
    buf.bb.put('H'.toByte).put('E'.toByte).put('A'.toByte).put('P'.toByte)
    buf.bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    buf.bb.putLong(heapData.length.toLong)
    buf.bb.putLong(Undef) // no free blocks
    buf.bb.putLong(heapDataAddr)
    buf.bb.put(heapData)

    buf.align8(); val snodAddr = buf.pos
    buf.bb.put('S'.toByte).put('N'.toByte).put('O'.toByte).put('D'.toByte)
    buf.bb.put(1.toByte).put(0.toByte)
    buf.bb.putShort(entries.length.toShort)
    entries.foreach { case (name, oh) =>
      buf.bb.putLong(nameOffsets(name)).putLong(oh)
      buf.bb.putInt(0).putInt(0) // cache type + reserved
      (0 until 16).foreach(_ => buf.bb.put(0.toByte)) // scratch
    }

    buf.align8(); val btreeAddr = buf.pos
    buf.bb.put('T'.toByte).put('R'.toByte).put('E'.toByte).put('E'.toByte)
    buf.bb.put(0.toByte).put(0.toByte)
    buf.bb.putShort(1.toShort) // one child (the single SNOD)
    buf.bb.putLong(Undef).putLong(Undef)
    buf.bb.putLong(0L)                           // key 0: empty string
    buf.bb.putLong(snodAddr)                     // child 0
    buf.bb.putLong(nameOffsets(entries.last._1)) // key 1: last name

    val heapAddr = heapDataAddr - 32
    val rootOh = writeObjectHeaderV1(buf, Seq(
      0x0011 -> { // symbol table message: btree + heap
        val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        b.putLong(btreeAddr).putLong(heapAddr); b.array()
      }))

    // ---- superblock v0 at offset 0
    val eof = buf.pos
    val sb = ByteBuffer.wrap(buf.bb.array(), 0, 96).order(ByteOrder.LITTLE_ENDIAN)
    sb.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    sb.put(0.toByte) // superblock v0
    sb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // fs ver, root ver, res, shared ver
    sb.put(8.toByte).put(8.toByte).put(0.toByte) // sizeof offsets/lengths, reserved
    sb.putShort(4.toShort)  // group leaf k
    sb.putShort(16.toShort) // group internal k
    sb.putInt(0)            // consistency flags
    sb.putLong(0L).putLong(Undef).putLong(eof).putLong(Undef)
    sb.putLong(0L)      // root entry: link name offset
    sb.putLong(rootOh)  // root entry: object header address
    sb.putInt(0).putInt(0) // cache type + reserved
    (0 until 16).foreach(_ => sb.put(0.toByte)) // scratch

    buf.bytes
  }

  /** Modern-container variant: superblock v2, root OHDR v2 with compact
    * Link messages, one contiguous dataset ("v" with _FillValue) and one
    * COMPACT-layout dataset ("small"). */
  def writeV2(vals: Array[Double], small: Array[Double], fill: Double): Array[Byte] = {
    val buf = new Buf()
    buf.bb.position(48) // superblock v2 is 48 bytes; patched last

    val vAddr = writeDoubles(buf, vals)
    val vOh = writeObjectHeaderV1(buf, Seq(
      0x0001 -> dataspace(Array(vals.length.toLong), unlimitedFirst = false),
      0x0003 -> f64Type,
      0x0008 -> contiguousLayout(vAddr, vals.length * 8L),
      0x000C -> doubleAttr("_FillValue", fill)))
    val smallData = {
      val b = ByteBuffer.allocate(small.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      small.foreach(b.putDouble); b.array()
    }
    val smallOh = writeObjectHeaderV1(buf, Seq(
      0x0001 -> dataspace(Array(small.length.toLong), unlimitedFirst = false),
      0x0003 -> f64Type,
      0x0008 -> compactLayout(smallData)))

    // root group: OHDR v2, link info (compact) + one Link message per dataset
    def linkMsg(name: String, oh: Long): Array[Byte] = {
      val nb = name.getBytes("UTF-8")
      val b = ByteBuffer.allocate(2 + 1 + nb.length + 8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte)        // version
      b.put(0.toByte)        // flags: 1-byte name length, no extras
      b.put(nb.length.toByte).put(nb)
      b.putLong(oh)
      b.array()
    }
    val linkInfo = {
      val b = ByteBuffer.allocate(18).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0.toByte).put(0.toByte) // version, flags (no creation order)
      b.putLong(Undef)              // fractal heap: undefined = compact links
      b.putLong(Undef)              // name index b-tree
      b.array()
    }
    val msgs = Seq(0x0002 -> linkInfo, 0x0006 -> linkMsg("v", vOh),
                   0x0006 -> linkMsg("small", smallOh))
    buf.align8(); val rootOh = buf.pos
    val bodyLen = msgs.map { case (_, m) => 4 + m.length }.sum
    buf.bb.put('O'.toByte).put('H'.toByte).put('D'.toByte).put('R'.toByte)
    buf.bb.put(2.toByte)
    buf.bb.put(1.toByte) // flags: 2-byte chunk0 size, no times/corder/phase
    buf.bb.putShort((bodyLen + 4).toShort) // chunk 0 size incl. checksum gap
    msgs.foreach { case (t, m) =>
      buf.bb.put(t.toByte).putShort(m.length.toShort).put(0.toByte).put(m)
    }
    buf.bb.putInt(0) // checksum (readers that verify would reject; ours doesn't)

    val eof = buf.pos
    val sb = ByteBuffer.wrap(buf.bb.array(), 0, 48).order(ByteOrder.LITTLE_ENDIAN)
    sb.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
    sb.put(2.toByte)
    sb.put(8.toByte).put(8.toByte).put(0.toByte) // sizes, flags
    sb.putLong(0L).putLong(Undef).putLong(eof)
    sb.putLong(rootOh)
    sb.putInt(0) // checksum
    buf.bytes
  }
}
