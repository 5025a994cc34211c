package graft.sources

import java.nio.{BufferUnderflowException, ByteBuffer, ByteOrder}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Minimal pure-JVM NetCDF-3 "classic" reader (public CDF-1/CDF-2/CDF-5
  * spec, the format of the reference's input `fort.63.nc` —
  * `xr.open_dataset` at /root/reference/run/utilities/
  * adcirc_dask_utilities.py:36-44). No third-party codec exists in this
  * build environment, so the subset the ADCIRC contract needs is
  * implemented directly against the file-format spec: header parse
  * (dims, vars, and their attributes), fixed-size variables, and
  * record variables (the unlimited `time` dimension), big-endian.
  * CDF-5 ("64-bit data", version byte 5, `nccopy -k nc5` output) widens
  * every NON_NEG header integer to 64 bits and adds the unsigned and
  * 64-bit integer types — both handled.
  *
  * Attributes are PARSED, not skipped: `_FillValue`/`missing_value`
  * drive the ingest-time mask→null step (the reference's
  * `var_d[var_d.mask] = np.nan`, adcirc_utilities.py:30) and the time
  * variable's CF `units` string drives real timestamp decoding
  * (adcircTime2cogs.py:190-194 bakes those instants into COG names).
  *
  * Scale note: the HEADER is tiny and parsed once (driver-side); bulk
  * data reads are offset-addressable (`begin + rec * recSize`), which
  * is what lets [[Ingest]] stripe record reads across executors
  * without any shared parser state. All reads go through [[RangeReader]]
  * so the same code serves local files and HTTP range requests.
  */
object NetCdf3 {

  val NcDimension = 0x0a
  val NcVariable = 0x0b
  val NcAttribute = 0x0c

  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6
  // CDF-5 additions
  val NcUByte = 7; val NcUShort = 8; val NcUInt = 9
  val NcInt64 = 10; val NcUInt64 = 11

  def typeSize(t: Int): Int = t match {
    case NcByte | NcChar | NcUByte => 1
    case NcShort | NcUShort => 2
    case NcInt | NcFloat | NcUInt => 4
    case NcDouble | NcInt64 | NcUInt64 => 8
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  case class Dim(name: String, size: Int) { def isRecord: Boolean = size == 0 }

  /** One attribute: NC_CHAR payloads land in `str`, numeric in `nums`. */
  case class Attr(name: String, ncType: Int, nums: Array[Double], str: String)

  case class Var(name: String, dimIds: Seq[Int], ncType: Int, vsize: Long, begin: Long,
                 isRecord: Boolean, attrs: Map[String, Attr]) {
    /** Elements per record (record var) or total elements (fixed var),
      * given the resolved dimension sizes. */
    def elemCount(dims: Seq[Dim]): Long =
      dimIds.map(dims(_)).filterNot(_.isRecord).map(_.size.toLong).product
    /** The sentinel the producer wrote into masked cells — `_FillValue`
      * per NUG, `missing_value` as the legacy fallback (ADCIRC writes
      * -99999 into dry nodes). */
    def fillValue: Option[Double] =
      attrs.get("_FillValue").orElse(attrs.get("missing_value")).flatMap(_.nums.headOption)
  }

  case class Header(dims: Seq[Dim], vars: Seq[Var], numRecs: Int, recSize: Long,
                    globalAttrs: Map[String, Attr])

  /** HDF5 signature (the container behind NetCDF-4). */
  private val Hdf5Magic: Array[Byte] =
    Array(0x89.toByte, 'H'.toByte, 'D'.toByte, 'F'.toByte, '\r', '\n', 0x1a, '\n')

  def isHdf5(head: Array[Byte]): Boolean =
    head.length >= 8 && Hdf5Magic.indices.forall(i => head(i) == Hdf5Magic(i))

  /** Parse the header from the first `n` bytes of the file (headers are
    * KBs; 1 MiB covers any plausible mesh metadata). */
  def parseHeader(r: RangeReader): Header = {
    val n = math.min(r.length, 1 << 20).toInt
    val bytes = new Array[Byte](n)
    r.readFully(0, bytes)
    try parseHeaderBytes(bytes, r.length)
    catch {
      case _: BufferUnderflowException =>
        throw new IllegalArgumentException(
          "NetCDF header exceeds the 1 MiB parse cap (or the file is truncated)")
    }
  }

  private[sources] def parseHeaderBytes(bytes: Array[Byte],
                                        fileLength: Long = -1L): Header = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    if (isHdf5(bytes))
      throw new IllegalArgumentException(
        "NetCDF-4/HDF5 container detected — handled by graft.sources.Hdf5, " +
        "not the classic CDF reader")
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F', "not a NetCDF classic file")
    val version = buf.get()
    require(version == 1 || version == 2 || version == 5,
      s"unsupported CDF version $version")
    val wideOffsets = version == 2 || version == 5
    val v5 = version == 5 // CDF-5: every NON_NEG header integer is 64-bit
    def nonNeg(): Long = if (v5) buf.getLong() else buf.getInt().toLong & 0xffffffffL
    def intChecked(v: Long, what: String): Int = {
      require(v >= 0 && v <= Int.MaxValue, s"$what $v exceeds this reader's Int bound")
      v.toInt
    }
    val numRecsRaw = if (v5) buf.getLong() else buf.getInt().toLong
    // all-ones marks a writer-in-progress STREAMING file: the record
    // count then comes from the file length (complete records past the
    // record block's start) — resolved after the var list is parsed.
    val streaming = numRecsRaw == -1L
    require(streaming || numRecsRaw >= 0, s"negative numrecs $numRecsRaw")

    def name(): String = {
      val len = intChecked(nonNeg(), "name length")
      val s = new Array[Byte](len); buf.get(s)
      buf.position(buf.position() + ((4 - len % 4) % 4)) // pad to 4
      new String(s, "UTF-8")
    }
    def readAttrs(): Map[String, Attr] = {
      val tag = buf.getInt(); val count = intChecked(nonNeg(), "attr count")
      require(tag == NcAttribute || (tag == 0 && count == 0), s"bad attr list tag $tag")
      (0 until count).map { _ =>
        val an = name()
        val t = buf.getInt(); val nelems = intChecked(nonNeg(), "attr nelems")
        val byteLen = nelems * typeSize(t)
        val raw = new Array[Byte](byteLen); buf.get(raw)
        buf.position(buf.position() + ((4 - byteLen % 4) % 4))
        val a = if (t == NcChar) Attr(an, t, Array.empty, new String(raw, "UTF-8"))
                else Attr(an, t, decode(raw, t, nelems), "")
        an -> a
      }.toMap
    }

    // dim list
    val dimTag = buf.getInt(); val nDims = intChecked(nonNeg(), "dim count")
    require(dimTag == NcDimension || (dimTag == 0 && nDims == 0), s"bad dim list tag $dimTag")
    val dims = (0 until nDims).map(_ => Dim(name(), intChecked(nonNeg(), "dim size")))
    val globalAttrs = readAttrs()
    // var list
    val varTag = buf.getInt(); val nVars = intChecked(nonNeg(), "var count")
    require(varTag == NcVariable || (varTag == 0 && nVars == 0), s"bad var list tag $varTag")
    val vars = (0 until nVars).map { _ =>
      val vname = name()
      val nd = intChecked(nonNeg(), "var rank")
      val dimIds = (0 until nd).map(_ => intChecked(nonNeg(), "dimid"))
      val attrs = readAttrs()
      val ncType = buf.getInt()
      val vsize = nonNeg()
      val begin = if (wideOffsets) buf.getLong() else buf.getInt().toLong & 0xffffffffL
      val isRecord = dimIds.headOption.exists(dims(_).isRecord)
      Var(vname, dimIds, ncType, vsize, begin, isRecord, attrs)
    }
    // record size = sum of record-var vsizes (each already padded to 4)
    val recSize = vars.filter(_.isRecord).map(_.vsize).sum
    val numRecs =
      if (!streaming) intChecked(numRecsRaw, "numrecs")
      else {
        // writer-in-progress file (live ASGS output): count the COMPLETE
        // records present; a partial record at the tail is excluded by
        // the integer division, matching netcdf-c's read-side behavior
        require(fileLength >= 0 && recSize > 0,
          "NetCDF STREAMING numrecs needs a known file length and a record variable")
        val recBegin = vars.filter(_.isRecord).map(_.begin).min
        intChecked(math.max(0L, fileLength - recBegin) / recSize, "derived numrecs")
      }
    Header(dims, vars, numRecs, recSize, globalAttrs)
  }

  private def decode(bytes: Array[Byte], ncType: Int, count: Int): Array[Double] = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](count)
    var i = 0
    while (i < count) {
      out(i) = ncType match {
        case NcInt => buf.getInt(i * 4).toDouble
        case NcFloat => buf.getFloat(i * 4).toDouble
        case NcDouble => buf.getDouble(i * 8)
        case NcShort => buf.getShort(i * 2).toDouble
        case NcByte => bytes(i).toDouble
        case NcUByte => (bytes(i) & 0xff).toDouble
        case NcUShort => (buf.getShort(i * 2) & 0xffff).toDouble
        case NcUInt => (buf.getInt(i * 4).toLong & 0xffffffffL).toDouble
        case NcInt64 => buf.getLong(i * 8).toDouble
        case NcUInt64 => // no unsigned 64-bit double path without BigInt;
          // values past Long.MaxValue lose exactness anyway in a Double
          val v = buf.getLong(i * 8)
          if (v >= 0) v.toDouble else v.toDouble + 1.8446744073709552E19
        case other => throw new IllegalArgumentException(s"nc_type $other")
      }
      i += 1
    }
    out
  }

  /** Read a FIXED (non-record) variable in full. */
  def readFixed(r: RangeReader, h: Header, v: Var): Array[Double] = {
    require(!v.isRecord, s"${v.name} is a record variable")
    val count = v.elemCount(h.dims).toInt
    val bytes = new Array[Byte](count * typeSize(v.ncType))
    r.readFully(v.begin, bytes)
    decode(bytes, v.ncType, count)
  }

  /** Read ONE record of a record variable (e.g. one timestep of zeta).
    * Offset-addressable: any executor can read any record directly. */
  def readRecord(r: RangeReader, h: Header, v: Var, rec: Int): Array[Double] = {
    require(v.isRecord, s"${v.name} is not a record variable")
    val count = v.elemCount(h.dims).toInt
    val bytes = new Array[Byte](count * typeSize(v.ncType))
    r.readFully(v.begin + rec.toLong * h.recSize, bytes)
    decode(bytes, v.ncType, count)
  }

  // ---- CF time decoding ------------------------------------------------

  private val unitSeconds = Map(
    "second" -> 1.0, "seconds" -> 1.0, "sec" -> 1.0, "secs" -> 1.0, "s" -> 1.0,
    "minute" -> 60.0, "minutes" -> 60.0, "min" -> 60.0, "mins" -> 60.0,
    "hour" -> 3600.0, "hours" -> 3600.0, "hr" -> 3600.0, "hrs" -> 3600.0, "h" -> 3600.0,
    "day" -> 86400.0, "days" -> 86400.0, "d" -> 86400.0)

  private val sinceRe = """(?i)^\s*([a-z]+)\s+since\s+(.+?)\s*$""".r

  /** Decode a CF `units` attribute — `"seconds since 2008-09-09 00:00:00 UTC"`
    * and friends (the attribute ADCIRC writes on `time`; the reference
    * resolves it via xarray's decoder) — to `(secondsPerUnit,
    * epochSecondsUtc)`. Returns None for non-time or unparseable units,
    * in which case ingest falls back to raw values + record indices. */
  def parseTimeUnits(units: String): Option[(Double, Long)] = units match {
    case sinceRe(unit, date) =>
      unitSeconds.get(unit.toLowerCase).flatMap { mult =>
        // normalize the zoo of CF epoch spellings to yyyy-M-d[ H:m:s]
        val cleaned = date.trim
          .replaceAll("(?i)\\s*UTC\\s*$", "").stripSuffix("Z").trim
          .replace('T', ' ')
          .replaceAll("\\.\\d+$", "") // drop fractional seconds
        val fmts = Seq("yyyy-M-d H:m:s", "yyyy-M-d H:m", "yyyy-M-d")
        fmts.iterator.flatMap { p =>
          try Some(if (p == "yyyy-M-d")
                     java.time.LocalDate.parse(cleaned, DateTimeFormatter.ofPattern(p)).atStartOfDay()
                   else LocalDateTime.parse(cleaned, DateTimeFormatter.ofPattern(p)))
          catch { case _: Exception => None }
        }.toSeq.headOption.map(ldt => (mult, ldt.toEpochSecond(java.time.ZoneOffset.UTC)))
      }
    case _ => None
  }
}
