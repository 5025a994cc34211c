package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM read-only HDF5 subset — the container behind
  * NetCDF-4, the reference's production input format (`fort.63.nc` is
  * opened with `xr.open_dataset`,
  * /root/reference/run/utilities/adcirc_dask_utilities.py:36-44; ASGS
  * writes NetCDF-4/HDF5). No codec library exists in this build
  * environment, so the subset a netcdf-c-written file needs is
  * implemented directly against the public HDF5 File Format
  * Specification (v3):
  *
  *  - superblock v0/v1 (what netcdf-c writes by default) and v2/v3
  *  - object headers v1 and v2 ("OHDR"), with continuation blocks
  *  - old-style groups: symbol-table message → B-tree v1 (node type 0)
  *    → SNOD entries → local heap names (netcdf-c's layout), new-style
  *    COMPACT groups (Link messages), and DENSE groups (Link Info
  *    message → fractal heap + B-tree v2 of link records)
  *  - messages: dataspace (v1/v2), datatype (fixed-point, IEEE float,
  *    string), data layout v3 (compact / contiguous / chunked),
  *    attribute (v1/v2/v3)
  *  - chunked raw data via the v1 B-tree (node type 1), with the four
  *    filters real NetCDF-4 producers use: deflate (id 1, via
  *    java.util.zip), shuffle (id 2, byte transposition), fletcher32
  *    (id 3, trailing checksum), and szip (id 4, CCSDS 121.0-B Rice —
  *    [[Szip]]). Unknown filter ids fail with the id in the message.
  *
  * Scale shape: identical to [[NetCdf3]] — metadata is a handful of KB
  * parsed per-task from a few small ranged reads; bulk data reads are
  * offset-addressable (contiguous rows by arithmetic, chunked rows via
  * the cached chunk index), so [[Ingest]] stripes record reads across
  * executors through [[RangeReader]] (local file or HTTP Range) with no
  * shared state.
  */
object Hdf5 {

  private val Undef = -1L // 0xFFFF... = "undefined address"

  case class Attr(name: String, nums: Array[Double], str: String)

  sealed trait Layout
  case class Compact(data: Array[Byte]) extends Layout
  case class Contiguous(addr: Long, size: Long) extends Layout
  /** Chunked storage. For layout v3 (`idxType` 0, the v1 B-tree index)
    * `rawDims` has the spec's trailing element-size dimension already
    * dropped. For layout v4 (`idxType` 1–5: single chunk / implicit /
    * fixed array / extensible array / v2 B-tree) `rawDims` is as stored;
    * whether it carries the trailing element-size dim is resolved against
    * the DATASPACE rank at use ([[Chunked.chunkDims]]) so the reader
    * tolerates either convention. */
  case class Chunked(btreeAddr: Long, rawDims: Array[Int], idxType: Int = 0,
                     singleFilt: Option[(Long, Int)] = None,
                     eaParams: Option[EaParams] = None) extends Layout {
    def chunkDims(rank: Int): Array[Int] =
      if (idxType == 0) rawDims
      else if (rawDims.length == rank + 1) rawDims.dropRight(1)
      else rawDims
  }
  /** Extensible-array creation parameters (from the layout message). */
  case class EaParams(maxNelmtsBits: Int, idxBlkElmts: Int, supBlkMinDataPtrs: Int,
                      dataBlkMinElmts: Int, maxDblkPageNelmtsBits: Int)

  /** clazz: 0 fixed-point, 1 IEEE float, 3 string. */
  case class Dtype(clazz: Int, size: Int, littleEndian: Boolean, signed: Boolean)

  /** One pipeline entry: 1 = deflate, 2 = shuffle, 3 = fletcher32. */
  case class Filter(id: Int, clientValues: Array[Int])

  case class Dataset(name: String, shape: Array[Long], unlimitedFirst: Boolean,
                     dtype: Dtype, layout: Layout, attrs: Map[String, Attr],
                     filters: Seq[Filter] = Seq.empty) {
    def rank: Int = shape.length
    def rowElems: Long = if (rank <= 1) 1L else shape.drop(1).product
    def fillValue: Option[Double] =
      attrs.get("_FillValue").orElse(attrs.get("missing_value")).flatMap(_.nums.headOption)
  }

  def open(r: RangeReader): Hdf5File = new Hdf5File(r)

  /** One entry of a chunk index: logical offsets (per dim, element
    * units), STORED byte size (post-filter), file address, and the
    * per-chunk filter mask (bit i set = pipeline filter i skipped). */
  private[sources] case class Chunk(offsets: Array[Long], size: Int, addr: Long,
                                    filterMask: Int)

  // ---------------------------------------------------------------------

  /** NOT thread-safe: holds unsynchronized read-side caches (the per-
    * dataset chunk index and a one-entry decoded-chunk memo); sharing one
    * handle across threads can hand one thread another's chunk values.
    * The contract everywhere in graft is one handle per Spark task —
    * [[NcFile.open]] per partition — which is also the cheap-open design
    * point ([[RangeReader]] is stateless between reads). */
  final class Hdf5File(r: RangeReader) extends AutoCloseable {

    private def bytesAt(off: Long, n: Int): ByteBuffer = {
      val a = new Array[Byte](n)
      r.readFully(off, a)
      ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN) // HDF5 metadata is LE
    }

    // ---- superblock ----------------------------------------------------

    private val sbOffset: Long = {
      // the signature sits at 0 (netcdf) or 512 << n for user blocks
      val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
      def sigAt(off: Long): Boolean = off + 8 <= r.length && {
        val b = new Array[Byte](8); r.readFully(off, b); b.sameElements(sig)
      }
      Iterator.iterate(512L)(_ * 2).take(12).foldLeft(if (sigAt(0)) Some(0L) else None) {
        (acc, off) => acc.orElse(if (sigAt(off)) Some(off) else None)
      }.getOrElse(throw new IllegalArgumentException("no HDF5 superblock signature"))
    }

    /** Address of the root group's object header. */
    private val rootAddr: Long = {
      val b = bytesAt(sbOffset, 128)
      b.position(8)
      val ver = b.get()
      ver match {
        case 0 | 1 =>
          b.position(13)
          val sizeOff = b.get(); val sizeLen = b.get()
          require(sizeOff == 8 && sizeLen == 8,
            s"unsupported offset/length sizes $sizeOff/$sizeLen (only 8 handled)")
          // v0: root symbol-table entry at +24+32; v1 inserts 4 bytes
          val entryAt = sbOffset + (if (ver == 0) 24 else 28) + 32
          bytesAt(entryAt + 8, 8).getLong // entry: nameOffset(8), OH addr(8)
        case 2 | 3 =>
          val sizeOff = b.get(); val sizeLen = b.get()
          require(sizeOff == 8 && sizeLen == 8,
            s"unsupported offset/length sizes $sizeOff/$sizeLen (only 8 handled)")
          b.get() // flags
          b.getLong; b.getLong; b.getLong // base, extension, eof
          b.getLong // root OH address
          bytesAt(sbOffset + 12 + 24, 8).getLong
        case v => throw new IllegalArgumentException(s"unsupported HDF5 superblock version $v")
      }
    }

    // ---- object headers -------------------------------------------------

    private case class Msg(typ: Int, body: Array[Byte])

    /** All messages of the object header at `addr`, following
      * continuation blocks, v1 and v2 forms. */
    private def readMessages(addr: Long): Seq[Msg] = {
      val head = bytesAt(addr, 16)
      val first = head.get(0)
      if (first == 1) readMessagesV1(addr)
      else {
        val sig = new Array[Byte](4); head.position(0); head.get(sig)
        require(new String(sig, "US-ASCII") == "OHDR",
          s"unrecognized object header at $addr")
        readMessagesV2(addr)
      }
    }

    private def readMessagesV1(addr: Long): Seq[Msg] = {
      val pre = bytesAt(addr, 16)
      pre.get(); pre.get()
      val nMsgs = pre.getShort() & 0xffff
      pre.getInt() // ref count
      val hdrSize = pre.getInt()
      val out = Seq.newBuilder[Msg]
      var taken = 0
      // (blockAddr, blockLen) queue; continuations are raw v1 msg streams
      var blocks = List((addr + 16, hdrSize.toLong))
      while (taken < nMsgs && blocks.nonEmpty) {
        val (bAddr, bLen) = blocks.head
        blocks = blocks.tail
        val b = bytesAt(bAddr, bLen.toInt)
        while (taken < nMsgs && b.remaining() >= 8) {
          val typ = b.getShort() & 0xffff
          val size = b.getShort() & 0xffff
          b.get(); b.get(); b.get(); b.get() // flags + reserved
          val body = new Array[Byte](size); b.get(body)
          taken += 1
          if (typ == 0x0010) {
            val cb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
            blocks = blocks :+ ((cb.getLong, cb.getLong))
          } else out += Msg(typ, body)
        }
      }
      out.result()
    }

    private def readMessagesV2(addr: Long): Seq[Msg] = {
      val pre = bytesAt(addr, 16)
      pre.position(4)
      require(pre.get() == 2, "OHDR version != 2")
      val flags = pre.get() & 0xff
      var at = addr + 6
      if ((flags & 0x20) != 0) at += 16 // times
      if ((flags & 0x10) != 0) at += 4  // storage phase
      val szLen = 1 << (flags & 3)
      val chunk0 = szLen match {
        case 1 => bytesAt(at, 1).get() & 0xffL
        case 2 => bytesAt(at, 2).getShort() & 0xffffL
        case 4 => bytesAt(at, 4).getInt() & 0xffffffffL
        case _ => bytesAt(at, 8).getLong
      }
      at += szLen
      val creationOrder = (flags & 0x04) != 0
      val out = Seq.newBuilder[Msg]
      // (blockStart, messagesLen) — v2 continuation blocks carry an OCHK
      // signature before the messages and a checksum after
      var blocks = List((at, chunk0))
      while (blocks.nonEmpty) {
        val (bAddr, bLen) = blocks.head
        blocks = blocks.tail
        val b = bytesAt(bAddr, bLen.toInt)
        val hdrLen = if (creationOrder) 6 else 4
        // trailing 4 bytes of every block are its checksum
        while (b.remaining() > 4 + hdrLen - 1) {
          val typ = b.get() & 0xff
          val size = b.getShort() & 0xffff
          b.get() // msg flags
          if (creationOrder) b.getShort()
          if (size > b.remaining() - 4) { b.position(b.limit()) } // gap
          else {
            val body = new Array[Byte](size); b.get(body)
            if (typ == 0x0010) {
              val cb = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
              val cAddr = cb.getLong; val cLen = cb.getLong
              // skip the 4-byte OCHK signature; len includes sig+checksum
              blocks = blocks :+ ((cAddr + 4, cLen - 4))
            } else out += Msg(typ, body)
          }
        }
      }
      out.result()
    }

    // ---- message decoders -----------------------------------------------

    /** (currentDims, firstDimUnlimited) */
    private def parseDataspace(body: Array[Byte]): (Array[Long], Boolean) = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val ver = b.get()
      val rank = b.get() & 0xff
      val flags = b.get() & 0xff
      if (ver == 1) { b.get(); b.getInt() } // reserved
      else b.get() // v2: dataspace type
      val dims = Array.fill(rank)(b.getLong)
      val unlimitedFirst = (flags & 1) != 0 && rank > 0 && {
        val max0 = b.getLong // first max dim
        max0 == Undef
      }
      (dims, unlimitedFirst)
    }

    private def parseDatatype(body: Array[Byte]): Dtype = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val b0 = b.get() & 0xff
      val clazz = b0 & 0x0f
      val bits0 = b.get() & 0xff; b.get(); b.get()
      val size = b.getInt()
      Dtype(clazz, size, littleEndian = (bits0 & 1) == 0, signed = (bits0 & 8) != 0)
    }

    private def parseLayout(body: Array[Byte]): Layout = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val ver = b.get()
      require(ver == 3 || ver == 4,
        s"data layout message version $ver unsupported (v3/v4 handled)")
      b.get() & 0xff match {
        case 0 =>
          val n = b.getShort() & 0xffff
          val d = new Array[Byte](n); b.get(d); Compact(d)
        case 1 => Contiguous(b.getLong, b.getLong)
        case 2 if ver == 3 =>
          val dimensionality = b.get() & 0xff // rank + 1 (elem-size dim)
          val btree = b.getLong
          val dims = Array.fill(dimensionality)(b.getInt)
          Chunked(btree, dims.dropRight(1))
        case 2 => // v4: the "latest format" chunk indexes
          val flags = b.get() & 0xff
          val ndims = b.get() & 0xff
          val encLen = b.get() & 0xff
          def dimVal(): Long = encLen match {
            case 1 => b.get() & 0xffL
            case 2 => b.getShort() & 0xffffL
            case 4 => b.getInt() & 0xffffffffL
            case 8 => b.getLong
            case n => throw new IllegalArgumentException(s"dim encoding length $n")
          }
          val dims = Array.fill(ndims)(dimVal().toInt)
          val idxType = b.get() & 0xff
          var singleFilt: Option[(Long, Int)] = None
          var ea: Option[EaParams] = None
          idxType match {
            case 1 => // single chunk: filtered variant stores size + mask inline
              if ((flags & 0x02) != 0) singleFilt = Some((b.getLong, b.getInt()))
            case 2 => () // implicit: address arithmetic only
            case 3 => b.get() // fixed array: page bits
            case 4 => // five 1-byte creation parameters, libhdf5 field order
              val maxBits = b.get() & 0xff; val idxElmts = b.get() & 0xff
              val minPtrs = b.get() & 0xff; val minElmts = b.get() & 0xff
              val pageBits = b.get() & 0xff
              ea = Some(EaParams(maxBits, idxElmts, minPtrs, minElmts, pageBits))
            case 5 => b.getInt(); b.get(); b.get() // v2 btree: node size, split%, merge%
            case t => throw new IllegalArgumentException(s"chunk index type $t unknown")
          }
          Chunked(b.getLong, dims, idxType, singleFilt, ea)
        case c => throw new IllegalArgumentException(s"layout class $c unsupported")
      }
    }

    private def pad8(n: Int): Int = (n + 7) & ~7

    /** Filter Pipeline message (0x000B), v1 (named, 8-padded) and v2. */
    private def parseFilters(body: Array[Byte]): Seq[Filter] = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val ver = b.get() & 0xff
      val n = b.get() & 0xff
      if (ver == 1) { b.getShort(); b.getInt() } // reserved
      (0 until n).map { _ =>
        val id = b.getShort() & 0xffff
        val nameLen = if (ver == 1 || id >= 256) b.getShort() & 0xffff else 0
        b.getShort() // flags (bit 0: optional filter)
        val nValues = b.getShort() & 0xffff
        if (nameLen > 0) {
          val skip = if (ver == 1) pad8(nameLen) else nameLen
          b.position(b.position() + skip)
        }
        val values = Array.fill(nValues)(b.getInt())
        if (ver == 1 && nValues % 2 == 1) b.getInt() // pad to 8
        Filter(id, values)
      }
    }

    private def parseAttr(body: Array[Byte]): Attr = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      val ver = b.get() & 0xff
      val flags = if (ver >= 2) b.get() & 0xff else { b.get(); 0 }
      val nameSize = b.getShort() & 0xffff
      val dtSize = b.getShort() & 0xffff
      val dsSize = b.getShort() & 0xffff
      if (ver == 3) b.get() // name character-set encoding
      val padded = ver == 1
      def chunk(n: Int): Array[Byte] = {
        val take = if (padded) pad8(n) else n
        val a = new Array[Byte](take); b.get(a); a.take(n)
      }
      val nameRaw = chunk(nameSize)
      val name = new String(nameRaw.takeWhile(_ != 0), "UTF-8")
      val dtBytes = chunk(dtSize)
      val dsBytes = chunk(dsSize)
      if ((flags & 1) != 0) return Attr(name, Array.empty, "") // shared dtype: skip
      val (dims, _) = parseDataspace(dsBytes)
      val count = if (dims.isEmpty) 1L else dims.product
      val dt = parseDatatype(dtBytes)
      val data = new Array[Byte](b.remaining()); b.get(data)
      dt.clazz match {
        case 0 | 1 =>
          val n = math.min(count, data.length.toLong / math.max(dt.size, 1)).toInt
          Attr(name, decodeNums(data, dt, n), "")
        case 3 =>
          Attr(name, Array.empty, new String(data.takeWhile(_ != 0), "UTF-8"))
        case _ => Attr(name, Array.empty, "") // vlen/reference/compound: opaque
      }
    }

    // ---- groups ----------------------------------------------------------

    private def heapString(heapAddr: Long, offset: Long): String = {
      val h = bytesAt(heapAddr, 32)
      val sig = new Array[Byte](4); h.get(sig)
      require(new String(sig, "US-ASCII") == "HEAP", s"bad local heap at $heapAddr")
      h.position(24)
      val dataAddr = h.getLong
      // names are short; read a bounded window and cut at NUL
      val n = math.min(256L, r.length - (dataAddr + offset)).toInt
      val raw = new Array[Byte](n); r.readFully(dataAddr + offset, raw)
      new String(raw.takeWhile(_ != 0), "UTF-8")
    }

    /** (name, objectHeaderAddress) pairs of the group's children. */
    private def groupLinks(msgs: Seq[Msg]): Seq[(String, Long)] = {
      val viaSymtab = msgs.find(_.typ == 0x0011).map { m =>
        val b = ByteBuffer.wrap(m.body).order(ByteOrder.LITTLE_ENDIAN)
        val btree = b.getLong; val heap = b.getLong
        walkGroupBtree(btree, heap)
      }
      val linkMsgs = msgs.filter(_.typ == 0x0006).map(m => parseLink(m.body))
      // Link Info (the "new style" group): dense storage moves the link
      // messages into a fractal heap, indexed by a name-order v2 B-tree
      // (type 5 records: hash + heap ID) — the "latest format" shape once
      // a group exceeds the compact threshold (netcdf-c: > 8 variables)
      val denseLinks = msgs.find(_.typ == 0x0002).toSeq.flatMap { m =>
        val b = ByteBuffer.wrap(m.body).order(ByteOrder.LITTLE_ENDIAN)
        b.get(); val flags = b.get() & 0xff
        if ((flags & 1) != 0) b.getLong // max creation index
        val fheap = b.getLong
        val nameBtree = b.getLong
        if (fheap == Undef) Seq.empty
        else {
          val heap = new FractalHeap(fheap)
          walkV2Btree(nameBtree, 5).map { rec =>
            // record: name hash (4) + heap ID (rest); the hash is only a
            // lookup key — enumeration ignores it
            parseLink(heap.readObject(java.util.Arrays.copyOfRange(rec, 4, rec.length)))
          }
        }
      }
      viaSymtab.getOrElse(Seq.empty) ++ linkMsgs ++ denseLinks
    }

    /** Attribute Info (0x0015): DENSE attribute storage — libhdf5 moves
      * ALL of an object's attributes into a fractal heap indexed by a
      * name v2 B-tree (type 8 records) once they exceed the compact
      * threshold (8 by default). Missing this would silently drop
      * `_FillValue` on a heavily-attributed variable, so the fill mask
      * must survive this storage form like any other. */
    private def denseAttrMsgs(msgs: Seq[Msg]): Seq[Array[Byte]] =
      msgs.find(_.typ == 0x0015).toSeq.flatMap { m =>
        val b = ByteBuffer.wrap(m.body).order(ByteOrder.LITTLE_ENDIAN)
        b.get() // version
        val flags = b.get() & 0xff
        if ((flags & 1) != 0) b.getShort() // max creation index (2 bytes here)
        val fheap = b.getLong
        val nameBtree = b.getLong
        if (fheap == Undef || nameBtree == Undef) Seq.empty
        else {
          val heap = new FractalHeap(fheap)
          walkV2Btree(nameBtree, 8).map { rec =>
            // type 8 record: heap ID (8, zero-padded past the heap's real
            // ID width) + message flags (1) + creation order (4) + name
            // hash (4); enumeration needs only the ID
            heap.readObject(java.util.Arrays.copyOf(rec, 8))
          }
        }
      }

    /** Bytes needed to encode values up to `v` — libhdf5's
      * H5VM_limit_enc_size, the field-width rule behind fractal-heap
      * lengths and v2-B-tree record counts. */
    private def limitEnc(v: Long): Int =
      ((63 - java.lang.Long.numberOfLeadingZeros(v)) / 8) + 1

    /** Managed-object subset of the fractal heap: a direct-block root,
      * or an indirect root walked recursively through the doubling table
      * (rows 0 and 1 hold `width` starting-size blocks, row r ≥ 2 holds
      * `width` blocks of startingSize·2^(r-1)); rows at or past the max-
      * direct-block row hold CHILD indirect blocks, each subdividing its
      * span with the same table from row 0 with r−log2(width) rows — the
      * libhdf5 `H5HF__dtable_size_to_rows` geometry, covering dense
      * groups of any link count. Huge/tiny heap IDs fail by name. Field
      * widths derive from the header the way libhdf5 sizes them: offsets
      * use maxHeapSize bits, lengths the smaller of the max-direct-block
      * and max-managed-object encodings. */
    private final class FractalHeap(addr: Long) {
      // (heap-space start, byte size, file address or Undef) per direct
      // block, ascending by start
      private val (blocks, offSize, lenSize) = {
        val h = bytesAt(addr, 4 + 1 + 2 + 2 + 1 + 4 + 8 * 12 + 2 + 8 + 8 + 2 + 2 + 8 + 2)
        val sig = new Array[Byte](4); h.get(sig)
        require(new String(sig, "US-ASCII") == "FRHP", s"bad fractal heap header at $addr")
        h.get() // version
        val heapIdLen = h.getShort() & 0xffff
        val ioFilterLen = h.getShort() & 0xffff
        require(ioFilterLen == 0, "filtered fractal heap unsupported")
        h.get() // flags (bit 1: direct blocks carry checksums — not verified here)
        val maxManagedObjSize = h.getInt() & 0xffffffffL
        h.getLong; h.getLong // next huge id, huge btree
        h.getLong; h.getLong // free space, fs mgr
        val managedSpace = h.getLong
        h.getLong; h.getLong; h.getLong // alloc/iter/nobjs
        h.getLong; h.getLong; h.getLong; h.getLong // huge size/nobjs, tiny size/nobjs
        val width = h.getShort() & 0xffff
        val startSize = h.getLong
        val maxDirectSize = h.getLong
        val maxHeapBits = h.getShort() & 0xffff
        h.getShort() // starting # rows in root indirect block
        val rootAddr = h.getLong
        val curRows = h.getShort() & 0xffff
        val offS = (maxHeapBits + 7) / 8
        val lenS = math.min(limitEnc(maxDirectSize), limitEnc(maxManagedObjSize))
        require(heapIdLen == 1 + offS + lenS,
          s"fractal heap ID length $heapIdLen != 1+$offS+$lenS")
        val blks: IndexedSeq[(Long, Long, Long)] =
          if (curRows == 0) // root IS a direct block (bounded by the heap's
            // managed space, which exceeds startSize if the block was grown)
            IndexedSeq((0L, math.max(startSize, managedSpace), rootAddr))
          else {
            // indirect blocks, recursively: rows of direct-block addresses
            // (8 bytes each; unfiltered heap) up to the max-direct row,
            // then rows of CHILD indirect blocks — a child in row r covers
            // rowSize(r) of heap space, subdivided by the same doubling
            // table from row 0 with r − log2(width) rows
            def rowSize(row: Int): Long = if (row < 2) startSize else startSize << (row - 1)
            val maxDbRows =
              (63 - java.lang.Long.numberOfLeadingZeros(maxDirectSize)) -
                (63 - java.lang.Long.numberOfLeadingZeros(startSize)) + 2
            val log2Width = 63 - java.lang.Long.numberOfLeadingZeros(width.toLong)
            def walkIndirect(iAddr: Long, nrows: Int, base: Long): IndexedSeq[(Long, Long, Long)] = {
              val ib = bytesAt(iAddr, 13 + offS + nrows * width * 8)
              val isig = new Array[Byte](4); ib.get(isig)
              require(new String(isig, "US-ASCII") == "FHIB",
                s"bad fractal heap indirect block at $iAddr")
              ib.get()    // version
              ib.getLong  // heap header address
              ib.position(ib.position() + offS) // block offset
              var start = base
              (0 until nrows).flatMap { row =>
                (0 until width).flatMap { _ =>
                  val a = ib.getLong
                  val span = rowSize(row)
                  val s0 = start
                  start += span
                  if (row < maxDbRows || a == Undef) IndexedSeq((s0, span, a))
                  else walkIndirect(a, row - log2Width, s0)
                }
              }.toIndexedSeq
            }
            walkIndirect(rootAddr, curRows, 0L)
          }
        (blks, offS, lenS)
      }

      /** Resolve a managed heap ID to the object's bytes. */
      def readObject(id: Array[Byte]): Array[Byte] = {
        val b = ByteBuffer.wrap(id).order(ByteOrder.LITTLE_ENDIAN)
        val first = b.get() & 0xff
        require((first & 0xc0) == 0, "fractal heap ID version != 0") // vers mask 0xC0
        require((first & 0x30) == 0, s"non-managed fractal heap object (huge/tiny) unsupported") // type mask 0x30
        var off = 0L; var len = 0L
        (0 until offSize).foreach(i => off |= (b.get() & 0xffL) << (8 * i))
        (0 until lenSize).foreach(i => len |= (b.get() & 0xffL) << (8 * i))
        // heap offsets address the heap's logical space, which INCLUDES
        // direct-block headers; locate the covering direct block
        val blk = blocks.find(e => off >= e._1 && off < e._1 + e._2)
          .getOrElse(throw new IllegalArgumentException(
            s"fractal heap offset $off outside the ${blocks.length}-block managed space"))
        require(blk._3 != Undef, s"fractal heap object in an unallocated block (offset $off)")
        val out = new Array[Byte](len.toInt)
        r.readFully(blk._3 + (off - blk._1), out)
        out
      }
    }

    private def parseLink(body: Array[Byte]): (String, Long) = {
      val b = ByteBuffer.wrap(body).order(ByteOrder.LITTLE_ENDIAN)
      require(b.get() == 1, "link message version != 1")
      val flags = b.get() & 0xff
      val linkType = if ((flags & 8) != 0) b.get() & 0xff else 0
      if ((flags & 4) != 0) b.getLong // creation order
      if ((flags & 16) != 0) b.get()  // charset
      val nameLen = (flags & 3) match {
        case 0 => b.get() & 0xffL
        case 1 => b.getShort() & 0xffffL
        case 2 => b.getInt() & 0xffffffffL
        case _ => b.getLong
      }
      val name = { val a = new Array[Byte](nameLen.toInt); b.get(a); new String(a, "UTF-8") }
      require(linkType == 0, s"non-hard link '$name' unsupported")
      (name, b.getLong)
    }

    private def walkGroupBtree(btreeAddr: Long, heapAddr: Long): Seq[(String, Long)] = {
      val head = bytesAt(btreeAddr, 24)
      val sig = new Array[Byte](4); head.get(sig)
      require(new String(sig, "US-ASCII") == "TREE", s"bad group B-tree node at $btreeAddr")
      require(head.get() == 0, "B-tree node type != group")
      val level = head.get() & 0xff
      val used = head.getShort() & 0xffff
      // entries: key0, child0, key1, child1, ..., keyN — keys are heap
      // offsets (8), children addresses (8); we only need the children
      val body = bytesAt(btreeAddr + 24, (2 * used + 1) * 8)
      val children = (0 until used).map { i =>
        body.position((2 * i + 1) * 8); body.getLong
      }
      if (level > 0) children.flatMap(walkGroupBtree(_, heapAddr))
      else children.flatMap(readSnod(_, heapAddr))
    }

    private def readSnod(addr: Long, heapAddr: Long): Seq[(String, Long)] = {
      val head = bytesAt(addr, 8)
      val sig = new Array[Byte](4); head.get(sig)
      require(new String(sig, "US-ASCII") == "SNOD", s"bad symbol node at $addr")
      head.get()
      head.get()
      val n = head.getShort() & 0xffff
      val body = bytesAt(addr + 8, n * 40)
      (0 until n).map { _ =>
        val nameOff = body.getLong
        val oh = body.getLong
        body.position(body.position() + 24) // cache type + reserved + scratch
        (heapString(heapAddr, nameOff), oh)
      }
    }

    // ---- datasets ---------------------------------------------------------

    /** Every dataset reachable from the root group (one level — the
      * NetCDF-4 classic model keeps all variables in the root group). */
    val datasets: Map[String, Dataset] = {
      val rootMsgs = readMessages(rootAddr)
      groupLinks(rootMsgs).flatMap { case (name, ohAddr) =>
        val msgs = readMessages(ohAddr)
        for {
          ds <- msgs.find(_.typ == 0x0001).map(m => parseDataspace(m.body))
          dt <- msgs.find(_.typ == 0x0003).map(m => parseDatatype(m.body))
          lo <- msgs.find(_.typ == 0x0008).map(m => parseLayout(m.body))
        } yield {
          val attrs = msgs.filter(_.typ == 0x000C).map(m => parseAttr(m.body)) ++
            denseAttrMsgs(msgs).map(parseAttr)
          val filters = msgs.find(_.typ == 0x000B).map(m => parseFilters(m.body))
            .getOrElse(Seq.empty)
          name -> Dataset(name, ds._1, ds._2, dt, lo,
            attrs.map(a => a.name -> a).toMap, filters)
        }
      }.toMap
    }

    // chunk indexes are walked once per dataset, sorted by logical offset,
    // and cached (per-task readers pull many rows from the same chunked
    // variable; the sort lets readRow binary-search its row's chunk run
    // instead of scanning the whole index)
    private val chunkIndex = scala.collection.mutable.Map.empty[String, IndexedSeq[Chunk]]

    private def chunksOf(ds: Dataset): IndexedSeq[Chunk] = chunkIndex.getOrElseUpdate(ds.name, {
      val ch = ds.layout.asInstanceOf[Chunked]
      val dims = ch.chunkDims(ds.rank)
      val chunkBytes = dims.map(_.toLong).product * ds.dtype.size
      val filtered = ds.filters.nonEmpty
      val found: Seq[Chunk] = ch.idxType match {
        case 0 => walkV1ChunkBtree(ch.btreeAddr, dims.length + 1)
        case 1 => // single chunk: the address IS the (only) chunk
          if (ch.btreeAddr == Undef) Seq.empty
          else {
            val (sz, mask) = ch.singleFilt.getOrElse((chunkBytes, 0))
            Seq(Chunk(new Array[Long](dims.length), sz.toInt, ch.btreeAddr, mask))
          }
        case 2 => // implicit: dense row-major chunk array, address arithmetic
          require(!filtered, s"${ds.name}: implicit chunk index cannot carry filters")
          if (ch.btreeAddr == Undef) Seq.empty
          else chunkGridOrigins(ds.shape, dims).zipWithIndex.map { case (o, i) =>
            Chunk(o, chunkBytes.toInt, ch.btreeAddr + i * chunkBytes, 0)
          }
        case 3 => fixedArrayChunks(ds, ch.btreeAddr, dims, chunkBytes, filtered)
        case 4 => extensibleArrayChunks(ds, ch.btreeAddr, ch.eaParams.get, dims,
                                        chunkBytes, filtered)
        case 5 => v2BtreeChunks(ds, ch.btreeAddr, dims, chunkBytes, filtered)
        case t => throw new IllegalArgumentException(s"${ds.name}: chunk index type $t")
      }
      found.toIndexedSeq.sortBy(c => (c.offsets(0), c.offsets.lift(1).getOrElse(0L)))
    })

    /** The classic v1 B-tree (node type 1) chunk index — netcdf-c default. */
    private def walkV1ChunkBtree(btree: Long, dimensionality: Int): Seq[Chunk] = {
      def walk(addr: Long): Seq[Chunk] = {
        if (addr == Undef) return Seq.empty
        val head = bytesAt(addr, 24)
        val sig = new Array[Byte](4); head.get(sig)
        require(new String(sig, "US-ASCII") == "TREE", s"bad chunk B-tree node at $addr")
        require(head.get() == 1, "B-tree node type != raw data chunk")
        val level = head.get() & 0xff
        val used = head.getShort() & 0xffff
        val keySize = 8 + 8 * dimensionality
        val body = bytesAt(addr + 24, used * (keySize + 8) + keySize)
        (0 until used).flatMap { _ =>
          val size = body.getInt()
          val filterMask = body.getInt()
          val offsets = Array.fill(dimensionality)(body.getLong)
          val child = body.getLong
          if (level > 0) walk(child)
          else Seq(Chunk(offsets.dropRight(1), size, child, filterMask))
        }
      }
      walk(btree)
    }

    /** Chunk-grid origins in row-major linear order — the element order
      * implicit/fixed-array/extensible-array indexes address chunks by. */
    private def chunkGridOrigins(shape: Array[Long], dims: Array[Int]): Seq[Array[Long]] = {
      val rank = dims.length
      val grid = Array.tabulate(rank)(d => ((shape(d) + dims(d) - 1) / dims(d)).toInt)
      (0 until grid.product).map { gi =>
        var rem = gi
        val o = new Array[Long](rank)
        var d = rank - 1
        while (d >= 0) { o(d) = (rem % grid(d)).toLong * dims(d); rem /= grid(d); d -= 1 }
        o
      }
    }

    /** One index element (client 0: address only; client 1: address +
      * stored size + filter mask), as (addr, size, mask). */
    private def readIdxElement(b: ByteBuffer, filtered: Boolean, sizeLen: Int,
                               chunkBytes: Long): (Long, Int, Int) =
      if (!filtered) (b.getLong, chunkBytes.toInt, 0)
      else {
        require(sizeLen >= 1 && sizeLen <= 8, s"chunk size field of $sizeLen bytes")
        val addr = b.getLong
        var size = 0L // little-endian, any width libhdf5 can emit
        (0 until sizeLen).foreach(i => size |= (b.get() & 0xffL) << (8 * i))
        (addr, size.toInt, b.getInt())
      }

    private def elementsToChunks(ds: Dataset, dims: Array[Int],
                                 elems: Seq[(Long, Int, Int)]): Seq[Chunk] = {
      val origins = chunkGridOrigins(ds.shape, dims)
      elems.zipWithIndex.collect {
        case ((addr, size, mask), i) if addr != Undef && i < origins.length =>
          Chunk(origins(i), size, addr, mask)
      }
    }

    /** Fixed Array index ("latest format", fixed-extent datasets): FAHD
      * header → FADB data block of equal-width elements addressed by
      * row-major chunk index. PAGED data blocks (entries beyond
      * 2^pageBits — a big static 2-D var at fine chunking) are walked
      * too: the block carries a page-init bitmap + checksum, then pages
      * of 2^pageBits elements each followed by its own checksum;
      * uninitialized pages contribute unallocated (fill) chunks. */
    private def fixedArrayChunks(ds: Dataset, addr: Long, dims: Array[Int],
                                 chunkBytes: Long, filtered: Boolean): Seq[Chunk] = {
      if (addr == Undef) return Seq.empty
      val h = bytesAt(addr, 32)
      val sig = new Array[Byte](4); h.get(sig)
      require(new String(sig, "US-ASCII") == "FAHD", s"${ds.name}: bad fixed-array header at $addr")
      h.get() // version
      val clientId = h.get() & 0xff
      require(clientId == (if (filtered) 1 else 0),
        s"${ds.name}: fixed-array client $clientId vs filter pipeline mismatch")
      val entrySize = h.get() & 0xff
      val pageBits = h.get() & 0xff
      val nElmts = h.getLong
      val dbAddr = h.getLong
      if (dbAddr == Undef) return Seq.empty
      val sizeLen = entrySize - 12 // filtered element: addr(8) + size + mask(4)
      val elems: Seq[(Long, Int, Int)] =
        if (nElmts <= (1L << pageBits)) {
          val db = bytesAt(dbAddr, 14 + (nElmts * entrySize).toInt)
          val dsig = new Array[Byte](4); db.get(dsig)
          require(new String(dsig, "US-ASCII") == "FADB", s"${ds.name}: bad fixed-array data block")
          db.get(); db.get() // version, client id
          db.getLong         // header address
          (0L until nElmts).map(_ => readIdxElement(db, filtered, sizeLen, chunkBytes))
        } else {
          val pageElems = 1 << pageBits
          val npages = ((nElmts + pageElems - 1) / pageElems).toInt
          val bitmapLen = (npages + 7) / 8
          val db = bytesAt(dbAddr, 14 + bitmapLen)
          val dsig = new Array[Byte](4); db.get(dsig)
          require(new String(dsig, "US-ASCII") == "FADB", s"${ds.name}: bad fixed-array data block")
          db.get(); db.get() // version, client id
          db.getLong         // header address
          val bitmap = new Array[Byte](bitmapLen); db.get(bitmap)
          // prefix = header + bitmap + block checksum; then page i of
          // elems(i) entries + 4-byte page checksum, back to back
          val prefix = 14L + bitmapLen + 4
          var pageAddr = dbAddr + prefix
          (0 until npages).flatMap { p =>
            val inPage = math.min(pageElems.toLong, nElmts - p.toLong * pageElems).toInt
            // H5VM_bit_get order: bit 0 is the first byte's HIGH bit
            // (H5VMprivate.h: "bit offset 0 in the first byte's high-bit
            // position") — MSB-first, not the naive LSB packing
            val init = (bitmap(p / 8) & (1 << (7 - (p % 8)))) != 0
            val out =
              if (!init) Seq.fill(inPage)((Undef, 0, 0)) // never-written page
              else {
                val pg = bytesAt(pageAddr, inPage * entrySize)
                (0 until inPage).map(_ => readIdxElement(pg, filtered, sizeLen, chunkBytes))
              }
            pageAddr += inPage.toLong * entrySize + 4
            out
          }
        }
      elementsToChunks(ds, dims, elems)
    }

    /** Extensible Array index (the "latest format" index for ONE unlimited
      * dimension — what netcdf-c latest writes for record variables):
      * EAHD header → EAIB index block, whose direct elements plus
      * index-block-resident data blocks (EADB) cover the first
      * idx + Σ_{s<2·log2(minPtrs)} 2^(s/2)·2^((s+1)/2)·minElmts elements —
      * hundreds of chunks at libhdf5 defaults. Later super blocks spill
      * into EASB secondary blocks, whose data blocks may be PAGED once
      * they exceed 2^pageBits elements (~1e5 chunks at defaults — a
      * multi-year fine-chunked record variable); both are walked, with
      * the secondary block's page-init bitmap gating which pages were
      * ever written. Geometry per the public spec:
      * super block s holds 2^(s/2) data blocks of 2^((s+1)/2)·minElmts
      * elements; the index block stores data-block addresses for the
      * first 2·log2(minPtrs) super blocks (= 2·(minPtrs−1) addresses). */
    private def extensibleArrayChunks(ds: Dataset, addr: Long, p: EaParams,
                                      dims: Array[Int], chunkBytes: Long,
                                      filtered: Boolean): Seq[Chunk] = {
      if (addr == Undef) return Seq.empty
      val h = bytesAt(addr, 12 + 6 * 8 + 8 + 4)
      val sig = new Array[Byte](4); h.get(sig)
      require(new String(sig, "US-ASCII") == "EAHD", s"${ds.name}: bad extensible-array header")
      h.get() // version
      val clientId = h.get() & 0xff
      require(clientId == (if (filtered) 1 else 0),
        s"${ds.name}: extensible-array client $clientId vs filter pipeline mismatch")
      // all geometry comes from THIS header (never the layout message's
      // copy of the creation parameters, so a field-order skew between the
      // two encodings cannot corrupt the walk)
      val elmtSize = h.get() & 0xff
      val maxBits = h.get() & 0xff
      val idxElmts = h.get() & 0xff
      val minElmts = h.get() & 0xff // data block min elements
      val minPtrs = h.get() & 0xff  // secondary block min data pointers
      val pageBits = h.get() & 0xff // max data-block page elements bits
      // statistics block: six 8-byte lengths; the max index set bounds the walk
      h.getLong; h.getLong; h.getLong; h.getLong
      val maxIdxSet = h.getLong
      h.getLong
      val iblockAddr = h.getLong
      if (iblockAddr == Undef || maxIdxSet == 0) return Seq.empty
      def log2(v: Int): Int = 63 - java.lang.Long.numberOfLeadingZeros(v.toLong)
      val nsblks = 1 + maxBits - log2(minElmts) // total super blocks the array can grow to
      val nsblksInIblock = math.min(2 * log2(minPtrs), nsblks)
      val ndblkAddrs = 2 * (minPtrs - 1)
      val nsblkAddrs = nsblks - nsblksInIblock
      // super-block geometry table (ALL super blocks; the first
      // nsblksInIblock have their data blocks addressed from the index
      // block, the rest live in EASB secondary blocks)
      case class SblkInfo(ndblks: Int, dblkNelmts: Int, startIdx: Long, startDblk: Int)
      val sblkInfo = {
        var startIdx = 0L; var startDblk = 0
        (0 until nsblks).map { s =>
          val info = SblkInfo(1 << (s / 2), (1 << ((s + 1) / 2)) * minElmts, startIdx, startDblk)
          startIdx += info.ndblks.toLong * info.dblkNelmts
          startDblk += info.ndblks
          info
        }
      }
      val sizeLen = elmtSize - 12
      val arrOffSize = (maxBits + 7) / 8
      val ib = bytesAt(iblockAddr,
        14 + idxElmts * elmtSize + ndblkAddrs * 8 + nsblkAddrs * 8)
      val isig = new Array[Byte](4); ib.get(isig)
      require(new String(isig, "US-ASCII") == "EAIB", s"${ds.name}: bad extensible-array index block")
      ib.get(); ib.get() // version, client id
      ib.getLong         // header address
      // the index block always carries idxElmts element slots (unset ones
      // hold undefined addresses); the data-block address list follows them
      val direct = (0 until idxElmts)
        .map(_ => readIdxElement(ib, filtered, sizeLen, chunkBytes))
      val dblkAddrs = Array.fill(ndblkAddrs)(ib.getLong)
      val sblkAddrs = Array.fill(nsblkAddrs)(ib.getLong)
      def readDataBlock(dAddr: Long, nelmts: Int,
                        pageInit: Int => Boolean = _ => true): Seq[(Long, Int, Int)] =
        if (dAddr == Undef) Seq.fill(nelmts)((Undef, 0, 0)) // unallocated run
        else {
          val pageElems = 1 << pageBits
          val hdrLen = 14 + arrOffSize
          val db = bytesAt(dAddr, hdrLen)
          val dsig = new Array[Byte](4); db.get(dsig)
          require(new String(dsig, "US-ASCII") == "EADB",
            s"${ds.name}: bad extensible-array data block at $dAddr")
          db.get(); db.get() // version, client id
          db.getLong         // header address
          if (nelmts <= pageElems) {
            val eb = bytesAt(dAddr + hdrLen, nelmts * elmtSize)
            (0 until nelmts).map(_ => readIdxElement(eb, filtered, sizeLen, chunkBytes))
          } else {
            // PAGED data block — an unlimited-dim variable grown past
            // ~1e5 chunks at libhdf5 defaults (a multi-year fine-chunked
            // record variable). On disk the block itself is just the
            // prefix (sig + version + client + header addr + block offset
            // + checksum); pages of 2^pageBits elements, each tailed by
            // its own 4-byte checksum, follow back-to-back. Which pages
            // were ever written lives in the POINTING secondary block's
            // page-init bitmap, passed in via `pageInit`.
            val npages = nelmts / pageElems // dblk nelmts is a 2^k multiple of the page
            val pageSize = pageElems.toLong * elmtSize + 4
            val prefix = hdrLen + 4L // + block checksum
            (0 until npages).flatMap { p =>
              if (!pageInit(p)) Seq.fill(pageElems)((Undef, 0, 0)) // never-written page
              else {
                val pg = bytesAt(dAddr + prefix + p * pageSize, pageElems * elmtSize)
                (0 until pageElems).map(_ => readIdxElement(pg, filtered, sizeLen, chunkBytes))
              }
            }
          }
        }
      val fromDblks =
        if (maxIdxSet <= idxElmts) Seq.empty
        else {
          val needed = maxIdxSet - idxElmts // elements living past the direct set
          sblkInfo.zipWithIndex.flatMap { case (info, s) =>
            if (info.startIdx >= needed) Seq.empty
            else if (s < nsblksInIblock) {
              // data blocks addressed straight from the index block
              (0 until info.ndblks).flatMap { bi =>
                val base = info.startIdx + bi.toLong * info.dblkNelmts
                if (base >= needed) Seq.empty
                else readDataBlock(dblkAddrs(info.startDblk + bi), info.dblkNelmts)
              }
            } else {
              // EASB secondary block: its own header + the super block's
              // data-block addresses
              val sAddr = sblkAddrs(s - nsblksInIblock)
              if (sAddr == Undef)
                Seq.fill((info.ndblks.toLong * info.dblkNelmts).toInt)((Undef, 0, 0))
              else {
                // when this super block's data blocks are paged, the EASB
                // carries one byte-aligned page-init bitmap region PER data
                // block, before the data-block addresses (H5VM bit order:
                // bit 0 = first byte's HIGH bit)
                val pageElems = 1 << pageBits
                val npagesPer =
                  if (info.dblkNelmts > pageElems) info.dblkNelmts / pageElems else 0
                val bmBytesPer = (npagesPer + 7) / 8
                val sb = bytesAt(sAddr,
                  14 + arrOffSize + info.ndblks * bmBytesPer + info.ndblks * 8)
                val ssig = new Array[Byte](4); sb.get(ssig)
                require(new String(ssig, "US-ASCII") == "EASB",
                  s"${ds.name}: bad extensible-array secondary block at $sAddr")
                sb.get(); sb.get() // version, client id
                sb.getLong         // header address
                sb.position(sb.position() + arrOffSize) // block offset
                val bitmap = new Array[Byte](info.ndblks * bmBytesPer); sb.get(bitmap)
                val addrs = Array.fill(info.ndblks)(sb.getLong)
                (0 until info.ndblks).flatMap { bi =>
                  val base = info.startIdx + bi.toLong * info.dblkNelmts
                  if (base >= needed) Seq.empty
                  else readDataBlock(addrs(bi), info.dblkNelmts, p => {
                    val bit = bi * bmBytesPer * 8 + p // per-dblk regions are byte-aligned
                    npagesPer == 0 || (bitmap(bit / 8) & (1 << (7 - (bit % 8)))) != 0
                  })
                }
              }
            }
          }
        }
      elementsToChunks(ds, dims, (direct ++ fromDblks).take(maxIdxSet.toInt))
    }

    /** v2 B-tree chunk index (record types 10/11 — multiple unlimited
      * dims in the latest format): BTHD header → BTLF leaves, through any
      * depth of BTIN internal nodes. Offsets in records are SCALED
      * (chunk-grid coordinates); sizes derive from the header's record
      * size, so either rank or rank+1 stored offset dims parse. */
    private def v2BtreeChunks(ds: Dataset, addr: Long, dims: Array[Int],
                              chunkBytes: Long, filtered: Boolean): Seq[Chunk] = {
      val recs = walkV2Btree(addr, if (filtered) 11 else 10)
      if (recs.isEmpty) return Seq.empty
      val rank = dims.length
      recs.map { rec =>
        val b = ByteBuffer.wrap(rec).order(ByteOrder.LITTLE_ENDIAN)
        val (chunkAddr, size, mask) =
          if (!filtered) (b.getLong, chunkBytes.toInt, 0)
          else {
            // record: addr(8) + size(csLen) + mask(4) + 8·nOff scaled offs;
            // nOff is rank or rank+1 — pick the split that leaves a valid
            // 1..8-byte size field
            val csLenRank = rec.length - 12 - 8 * rank
            val csLen = if (csLenRank >= 1 && csLenRank <= 8) csLenRank
                        else rec.length - 12 - 8 * (rank + 1)
            require(csLen >= 1 && csLen <= 8,
              s"${ds.name}: cannot split v2 B-tree record of ${rec.length} bytes")
            readIdxElement(b, filtered = true, csLen, chunkBytes)
          }
        val offsets = Array.tabulate(rank)(d => b.getLong * dims(d))
        Chunk(offsets, size, chunkAddr, mask)
      }
    }

    /** All records of a v2 B-tree at ANY depth. Internal-node child
      * pointers carry (address, records-in-child) and — when the child is
      * itself internal (node depth ≥ 2) — a total-records-in-subtree
      * count whose byte width derives from the cumulative max-records
      * geometry (libhdf5 `node_info[u].cum_max_nrec_size`): leaf max
      * fixes the per-child count width; each internal level's capacity is
      * what fits after its own pointer width is subtracted, and the
      * cumulative totals' encoded sizes feed the next level up. Returns
      * raw record bytes in key order; callers decode per record type. */
    private def walkV2Btree(addr: Long, expectType: Int): Seq[Array[Byte]] = {
      if (addr == Undef) return Seq.empty
      val h = bytesAt(addr, 40)
      val sig = new Array[Byte](4); h.get(sig)
      require(new String(sig, "US-ASCII") == "BTHD", s"bad v2 B-tree header at $addr")
      h.get() // version
      val typ = h.get() & 0xff
      require(typ == expectType, s"v2 B-tree type $typ, expected $expectType")
      val nodeSize = h.getInt()
      val recordSize = h.getShort() & 0xffff
      val depth = h.getShort() & 0xffff
      h.get(); h.get() // split/merge percent
      val rootAddr = h.getLong
      val rootNRec = h.getShort() & 0xffff
      h.getLong // total records
      if (rootAddr == Undef || (rootNRec == 0 && depth == 0)) return Seq.empty
      // per-child "number of records" field: sized for the max records a
      // LEAF can hold (the largest per-node count, H5B2 max_nrec_size)
      val maxLeafRec = (nodeSize - 10) / recordSize
      val nrecSize = limitEnc(maxLeafRec.toLong)
      // cumulative-capacity table up the levels: cumMaxNrec(u) = records a
      // depth-u subtree can hold; encoded size of level u-1's total is the
      // extra field in a depth-u node's child pointers (only when u ≥ 2)
      val cumMaxNrec = new Array[Long](depth + 1)
      val cumSize = new Array[Int](depth + 1)
      cumMaxNrec(0) = maxLeafRec.toLong
      (1 to depth).foreach { u =>
        val ptrSize = 8 + nrecSize + (if (u >= 2) cumSize(u - 1) else 0)
        val maxNrecU = (nodeSize - 10 - ptrSize) / (recordSize + ptrSize)
        cumMaxNrec(u) = (maxNrecU + 1).toLong * cumMaxNrec(u - 1) + maxNrecU
        cumSize(u) = limitEnc(cumMaxNrec(u))
      }
      def leafRecords(a: Long, n: Int): Seq[Array[Byte]] = {
        val b = bytesAt(a, 6 + n * recordSize)
        val s2 = new Array[Byte](4); b.get(s2)
        require(new String(s2, "US-ASCII") == "BTLF", s"bad v2 B-tree leaf at $a")
        b.get(); b.get()
        (0 until n).map { _ => val r = new Array[Byte](recordSize); b.get(r); r }
      }
      def node(a: Long, n: Int, d: Int): Seq[Array[Byte]] =
        if (d == 0) leafRecords(a, n)
        else {
          // internal node: ALL n records first, then ALL n+1 child
          // pointers — the libhdf5 serial order, NOT interleaved
          val ptrSize = 8 + nrecSize + (if (d >= 2) cumSize(d - 1) else 0)
          val b = bytesAt(a, 6 + n * recordSize + (n + 1) * ptrSize)
          val s2 = new Array[Byte](4); b.get(s2)
          require(new String(s2, "US-ASCII") == "BTIN", s"bad v2 B-tree internal node at $a")
          b.get(); b.get()
          val recs = (0 until n).map { _ =>
            val r = new Array[Byte](recordSize); b.get(r); r
          }
          val children = (0 to n).map { _ =>
            val ca = b.getLong
            var cn = 0L
            (0 until nrecSize).foreach(i => cn |= (b.get() & 0xffL) << (8 * i))
            if (d >= 2) (0 until cumSize(d - 1)).foreach(_ => b.get()) // subtree total
            (ca, cn.toInt)
          }
          // in-tree order: child0, rec0, child1, rec1, …, childN
          val acc = Seq.newBuilder[Array[Byte]]
          (0 until n).foreach { i =>
            acc ++= node(children(i)._1, children(i)._2, d - 1)
            acc += recs(i)
          }
          acc ++= node(children(n)._1, children(n)._2, d - 1)
          acc.result()
        }
      node(rootAddr, rootNRec, depth)
    }

    /** HDF5 semantics for storage that was never written: the dataset's
      * fill value. The fill-value MESSAGE is not parsed (netcdf-c mirrors
      * it into `_FillValue`), so the attribute drives it; NaN otherwise —
      * which [[Ingest]]'s mask step nulls, so absent data can never
      * masquerade as a legitimate 0.0 reading. */
    private def fillOf(ds: Dataset): Double = ds.fillValue.getOrElse(Double.NaN)

    // one-entry decoded-chunk memo: tasks read rows in sequence, so
    // consecutive rows of a (cr, cols)-chunked variable hit the same
    // chunk cr times — cache the last decode instead of re-reading and
    // re-inflating it per row
    private var lastChunkAddr: Long = -1L
    private var lastChunkVals: Array[Double] = null

    /** Read one chunk and reverse its filter pipeline (write order is
      * pipeline order, so read order is REVERSED), honoring the
      * per-chunk skip mask. Returns exactly the chunk's raw elements. */
    private def chunkValues(ds: Dataset, c: Chunk, chunkElems: Int): Array[Double] = {
      if (c.addr == lastChunkAddr && lastChunkVals != null) return lastChunkVals
      val raw = new Array[Byte](c.size); r.readFully(c.addr, raw)
      val expected = chunkElems * ds.dtype.size
      val data = ds.filters.zipWithIndex.reverseIterator
        .filter { case (_, i) => (c.filterMask & (1 << i)) == 0 }
        .foldLeft(raw) { case (bytes, (f, _)) => unapplyFilter(bytes, f, ds, expected) }
      require(data.length >= expected,
        s"${ds.name}: chunk decoded to ${data.length} bytes, expected $expected")
      val vals = decodeNums(data, ds.dtype, chunkElems)
      lastChunkAddr = c.addr; lastChunkVals = vals
      vals
    }

    private def unapplyFilter(bytes: Array[Byte], f: Filter, ds: Dataset,
                              expected: Int): Array[Byte] = f.id match {
      case 1 => // deflate (zlib stream)
        val inf = new java.util.zip.Inflater()
        inf.setInput(bytes)
        val out = new Array[Byte](expected)
        var at = 0
        while (at < expected && !inf.finished()) {
          val n = inf.inflate(out, at, expected - at)
          require(n > 0 || !inf.needsInput, s"${ds.name}: truncated deflate chunk")
          at += n
        }
        inf.end()
        require(at == expected, s"${ds.name}: deflate gave $at of $expected bytes")
        out
      case 2 => // shuffle: bytes stored plane-major (all byte-0s, all byte-1s, ...)
        val es = f.clientValues.headOption.getOrElse(ds.dtype.size)
        if (es <= 1) bytes
        else {
          val n = bytes.length / es
          val out = new Array[Byte](bytes.length)
          var p = 0
          while (p < es) {
            var i = 0
            while (i < n) { out(i * es + p) = bytes(p * n + i); i += 1 }
            p += 1
          }
          out
        }
      case 3 => // fletcher32: 4-byte LE checksum appended to the chunk —
        // VERIFIED, not just stripped: a file that declares integrity
        // checking must not decode corrupted chunks silently
        val body = java.util.Arrays.copyOf(bytes, bytes.length - 4)
        val stored = (bytes(bytes.length - 4) & 0xffL) |
          ((bytes(bytes.length - 3) & 0xffL) << 8) |
          ((bytes(bytes.length - 2) & 0xffL) << 16) |
          ((bytes(bytes.length - 1) & 0xffL) << 24)
        val computed = fletcher32(body)
        require(computed == stored,
          f"${ds.name}: fletcher32 mismatch (stored 0x$stored%08x, computed 0x$computed%08x) — corrupted chunk")
        body
      case 4 => // szip: CCSDS 121.0-B extended Rice (SURVEY §2.1 S11, closed r6)
        // client data as H5Z_FILTER_SZIP stores it:
        // [options_mask, bits_per_pixel, pixels_per_block, pixels_per_scanline]
        val cv = f.clientValues
        require(cv.length >= 4, s"${ds.name}: szip filter carries ${cv.length} client values, need 4")
        val n = cv(1)
        // H5Zszip prepends the uncompressed byte count as a 4-byte LE word
        // before the Rice stream (UINT32ENCODE in the encode path) —
        // verify it against the chunk's expected size, then skip it
        require(bytes.length >= 4, s"${ds.name}: szip chunk shorter than its size header")
        val stored = (bytes(0) & 0xffL) | ((bytes(1) & 0xffL) << 8) |
          ((bytes(2) & 0xffL) << 16) | ((bytes(3) & 0xffL) << 24)
        require(stored == expected,
          s"${ds.name}: szip stored uncompressed size $stored != chunk size $expected")
        Szip.decode(java.util.Arrays.copyOfRange(bytes, 4, bytes.length),
          cv(0), n, cv(2), cv(3), expected / Szip.sampleBytes(n))
      case other =>
        throw new IllegalArgumentException(
          s"${ds.name}: HDF5 filter id $other unsupported (deflate/shuffle/fletcher32 handled)")
    }

    /** HDF5's Fletcher-32 (H5checksum semantics, public file-format spec):
      * 16-bit big-endian words, sums folded mod 2^16-ish via end-around
      * carry every ≤360 words, odd trailing byte high-aligned. */
    private def fletcher32(data: Array[Byte]): Long = {
      var sum1 = 0L; var sum2 = 0L
      var i = 0
      val words = data.length / 2
      var remaining = words
      while (remaining > 0) {
        var tlen = math.min(remaining, 360)
        remaining -= tlen
        while (tlen > 0) {
          sum1 += ((data(i) & 0xffL) << 8) | (data(i + 1) & 0xffL)
          i += 2
          sum2 += sum1
          tlen -= 1
        }
        sum1 = (sum1 & 0xffff) + (sum1 >>> 16)
        sum2 = (sum2 & 0xffff) + (sum2 >>> 16)
      }
      if (data.length % 2 != 0) {
        sum1 += (data(data.length - 1) & 0xffL) << 8
        sum2 += sum1
        sum1 = (sum1 & 0xffff) + (sum1 >>> 16)
        sum2 = (sum2 & 0xffff) + (sum2 >>> 16)
      }
      sum1 = (sum1 & 0xffff) + (sum1 >>> 16)
      sum2 = (sum2 & 0xffff) + (sum2 >>> 16)
      ((sum2 << 16) | sum1) & 0xffffffffL
    }

    private def decodeNums(bytes: Array[Byte], dt: Dtype, count: Int): Array[Double] = {
      val b = ByteBuffer.wrap(bytes)
        .order(if (dt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val out = new Array[Double](count)
      var i = 0
      while (i < count) {
        out(i) = (dt.clazz, dt.size) match {
          case (1, 8) => b.getDouble(i * 8)
          case (1, 4) => b.getFloat(i * 4).toDouble
          case (0, 8) => b.getLong(i * 8).toDouble
          case (0, 4) =>
            if (dt.signed) b.getInt(i * 4).toDouble else (b.getInt(i * 4) & 0xffffffffL).toDouble
          case (0, 2) =>
            if (dt.signed) b.getShort(i * 2).toDouble else (b.getShort(i * 2) & 0xffff).toDouble
          case (0, 1) => if (dt.signed) bytes(i).toDouble else (bytes(i) & 0xff).toDouble
          case (c, s) => throw new IllegalArgumentException(s"datatype class $c size $s")
        }
        i += 1
      }
      out
    }

    /** Read a whole dataset, flattened row-major (the [[NetCdf3.readFixed]]
      * contract). Rank ≤ 2. */
    def readAll(ds: Dataset): Array[Double] = {
      val total = math.max(1L, ds.shape.product).toInt
      ds.layout match {
        case Compact(data) => decodeNums(data, ds.dtype, total)
        case Contiguous(addr, _) =>
          if (addr == Undef) Array.fill(total)(fillOf(ds)) // never allocated
          else {
            val raw = new Array[Byte](total * ds.dtype.size)
            r.readFully(addr, raw)
            decodeNums(raw, ds.dtype, total)
          }
        case ch: Chunked =>
          val chunkDims = ch.chunkDims(ds.rank)
          // cells no chunk covers (sparse writes) stay at the fill value
          val out = Array.fill(total)(fillOf(ds))
          val nCols = if (ds.rank <= 1) 1L else ds.shape(1)
          chunksOf(ds).foreach { c =>
            val vals = chunkValues(ds, c, chunkDims.product)
            // scatter the chunk into the row-major output, clipping edge
            // chunks (HDF5 allocates full chunks past the dataset extent)
            val cr = chunkDims(0)
            val cc = if (ds.rank <= 1) 1 else chunkDims(1)
            var lr = 0
            while (lr < cr && c.offsets(0) + lr < ds.shape(0)) {
              val row = c.offsets(0) + lr
              var lc = 0
              val colBase = if (ds.rank <= 1) 0L else c.offsets(1)
              while (lc < cc && colBase + lc < nCols) {
                out((row * nCols + colBase + lc).toInt) = vals(lr * cc + lc)
                lc += 1
              }
              lr += 1
            }
          }
          out
      }
    }

    /** Read one slice along the first dimension (one record of a
      * (time, node) variable) — the [[NetCdf3.readRecord]] contract.
      * Out-of-range rows fail LOUDLY: a silent fabricated row in a bulk
      * ingest is the worst failure mode. */
    def readRow(ds: Dataset, row: Int): Array[Double] = {
      val n = ds.rowElems.toInt
      require(row >= 0 && row < ds.shape.headOption.getOrElse(1L),
        s"${ds.name}: row $row out of range [0, ${ds.shape.headOption.getOrElse(1L)})")
      ds.layout match {
        case Compact(data) =>
          decodeNums(data.slice(row * n * ds.dtype.size, (row + 1) * n * ds.dtype.size),
            ds.dtype, n)
        case Contiguous(addr, _) =>
          if (addr == Undef) Array.fill(n)(fillOf(ds)) // never allocated
          else {
            val raw = new Array[Byte](n * ds.dtype.size)
            r.readFully(addr + row.toLong * n * ds.dtype.size, raw)
            decodeNums(raw, ds.dtype, n)
          }
        case ch: Chunked =>
          val chunkDims = ch.chunkDims(ds.rank)
          // cells no chunk covers (sparse writes) stay at the fill value
          val out = Array.fill(n)(fillOf(ds))
          val cr = chunkDims(0)
          val cc = if (ds.rank <= 1) 1 else chunkDims(1)
          val nCols = if (ds.rank <= 1) 1L else ds.shape(1)
          // chunk origins are cr-aligned: binary-search the sorted index
          // for this row's origin, then take its contiguous column run —
          // O(log chunks + chunks-per-row), not a full index scan
          val cs = chunksOf(ds)
          val target = (row / cr).toLong * cr
          var lo = 0; var hi = cs.length
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cs(mid).offsets(0) < target) lo = mid + 1 else hi = mid
          }
          Iterator.range(lo, cs.length).map(cs)
            .takeWhile(_.offsets(0) == target)
            .foreach { c =>
              val vals = chunkValues(ds, c, chunkDims.product)
              val lr = row - c.offsets(0).toInt
              val colBase = if (ds.rank <= 1) 0L else c.offsets(1)
              var lc = 0
              while (lc < cc && colBase + lc < nCols) {
                // rank-1 row slice is a single element; rank-2 is a row segment
                val outIdx = if (ds.rank <= 1) 0 else (colBase + lc).toInt
                out(outIdx) = vals(lr * cc + lc)
                lc += 1
              }
            }
          out
      }
    }

    def close(): Unit = r.close()
  }
}
