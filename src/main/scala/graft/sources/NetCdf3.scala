package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM NetCDF-3 "classic" reader (public CDF-1/CDF-2 spec,
  * the format of the reference's input `fort.63.nc` —
  * `xr.open_dataset` at /root/reference/run/utilities/
  * adcirc_dask_utilities.py:36-44). No third-party codec exists in this
  * build environment, so the subset the ADCIRC contract needs is
  * implemented directly against the file-format spec: header parse
  * (dims, vars, attrs skipped structurally), fixed-size variables, and
  * record variables (the unlimited `time` dimension), big-endian,
  * NC_INT / NC_FLOAT / NC_DOUBLE.
  *
  * Scale note: the HEADER is tiny and parsed once (driver-side); bulk
  * data reads are offset-addressable (`begin + rec * recSize`), which
  * is what lets [[Ingest]] stripe record reads across executors
  * without any shared parser state.
  */
object NetCdf3 {

  val NcDimension = 0x0a
  val NcVariable = 0x0b
  val NcAttribute = 0x0c

  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6

  def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  case class Dim(name: String, size: Int) { def isRecord: Boolean = size == 0 }
  case class Var(name: String, dimIds: Seq[Int], ncType: Int, vsize: Long, begin: Long,
                 isRecord: Boolean) {
    /** Elements per record (record var) or total elements (fixed var),
      * given the resolved dimension sizes. */
    def elemCount(dims: Seq[Dim]): Long =
      dimIds.map(dims(_)).filterNot(_.isRecord).map(_.size.toLong).product
  }
  case class Header(dims: Seq[Dim], vars: Seq[Var], numRecs: Int, recSize: Long)

  /** Parse the header from the first `n` bytes of the file (headers are
    * KBs; 1 MiB covers any plausible mesh metadata). */
  def parseHeader(raf: RandomAccessFile): Header = {
    val n = math.min(raf.length(), 1 << 20).toInt
    val bytes = new Array[Byte](n)
    raf.seek(0); raf.readFully(bytes)
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F', "not a NetCDF classic file")
    val version = buf.get()
    require(version == 1 || version == 2, s"unsupported CDF version $version")
    val wideOffsets = version == 2
    val numRecs = buf.getInt()

    def name(): String = {
      val len = buf.getInt()
      val s = new Array[Byte](len); buf.get(s)
      buf.position(buf.position() + ((4 - len % 4) % 4)) // pad to 4
      new String(s, "UTF-8")
    }
    def skipAttrs(): Unit = {
      val tag = buf.getInt(); val count = buf.getInt()
      require(tag == NcAttribute || (tag == 0 && count == 0), s"bad attr list tag $tag")
      (0 until count).foreach { _ =>
        name()
        val t = buf.getInt(); val nelems = buf.getInt()
        val byteLen = nelems * typeSize(t)
        buf.position(buf.position() + byteLen + ((4 - byteLen % 4) % 4))
      }
    }

    // dim list
    val dimTag = buf.getInt(); val nDims = buf.getInt()
    require(dimTag == NcDimension || (dimTag == 0 && nDims == 0), s"bad dim list tag $dimTag")
    val dims = (0 until nDims).map(_ => Dim(name(), buf.getInt()))
    skipAttrs() // global attributes
    // var list
    val varTag = buf.getInt(); val nVars = buf.getInt()
    require(varTag == NcVariable || (varTag == 0 && nVars == 0), s"bad var list tag $varTag")
    val vars = (0 until nVars).map { _ =>
      val vname = name()
      val nd = buf.getInt()
      val dimIds = (0 until nd).map(_ => buf.getInt())
      skipAttrs()
      val ncType = buf.getInt()
      val vsize = buf.getInt().toLong & 0xffffffffL
      val begin = if (wideOffsets) buf.getLong() else buf.getInt().toLong & 0xffffffffL
      val isRecord = dimIds.headOption.exists(dims(_).isRecord)
      Var(vname, dimIds, ncType, vsize, begin, isRecord)
    }
    // record size = sum of record-var vsizes (each already padded to 4)
    val recSize = vars.filter(_.isRecord).map(_.vsize).sum
    Header(dims, vars, numRecs, recSize)
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
        case other => throw new IllegalArgumentException(s"nc_type $other")
      }
      i += 1
    }
    out
  }

  /** Read a FIXED (non-record) variable in full. */
  def readFixed(raf: RandomAccessFile, h: Header, v: Var): Array[Double] = {
    require(!v.isRecord, s"${v.name} is a record variable")
    val count = v.elemCount(h.dims).toInt
    val bytes = new Array[Byte](count * typeSize(v.ncType))
    raf.seek(v.begin); raf.readFully(bytes)
    decode(bytes, v.ncType, count)
  }

  /** Read ONE record of a record variable (e.g. one timestep of zeta).
    * Offset-addressable: any executor can read any record directly. */
  def readRecord(raf: RandomAccessFile, h: Header, v: Var, rec: Int): Array[Double] = {
    require(v.isRecord, s"${v.name} is not a record variable")
    val count = v.elemCount(h.dims).toInt
    val bytes = new Array[Byte](count * typeSize(v.ncType))
    raf.seek(v.begin + rec.toLong * h.recSize); raf.readFully(bytes)
    decode(bytes, v.ncType, count)
  }
}
