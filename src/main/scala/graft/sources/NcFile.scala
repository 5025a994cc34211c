package graft.sources

/** Container-neutral view of a NetCDF file — the polymorphism the
  * reference gets from `xr.open_dataset` (which dispatches NetCDF-3 vs
  * NetCDF-4/HDF5 by magic bytes,
  * /root/reference/run/utilities/adcirc_dask_utilities.py:36-44).
  * [[Ingest]] is written against this trait, so classic CDF-1/CDF-2/CDF-5
  * ([[NetCdf3]]) and NetCDF-4/HDF5 ([[Hdf5]]) files take the same
  * ingest path, local or over HTTP ranges ([[RangeReader]]).
  *
  * "Record variable" means: carries the unlimited/time dimension as its
  * first axis. In classic files that is structural (the record
  * dimension); in HDF5 it is the dataspace's unlimited max-dim flag,
  * with a rank-2 fallback for files written without one. */
trait NcFile extends AutoCloseable {
  def varNames: Seq[String]
  def isRecordVar(name: String): Boolean
  /** Records (timesteps) of the unlimited dimension. */
  def numRecs: Int
  def fillValue(name: String): Option[Double]
  def strAttr(name: String, attr: String): Option[String]
  /** Whole fixed-size variable, flattened row-major. */
  def readFixed(name: String): Array[Double]
  /** One record (first-axis slice) of a record variable. */
  def readRecord(name: String, rec: Int): Array[Double]
}

object NcFile {
  /** Magic-byte dispatch, classic CDF vs HDF5 — both containers arrive
    * with the `.nc` extension in the wild. OPeNDAP endpoints (the
    * reference's THREDDS `dodsC` URLs) are recognized by URL shape and
    * speak [[Dap2]] instead: the server parses the container and ships
    * arrays, so there are no magic bytes to read.
    *
    * Dispatch heuristic: an http(s) URL whose path contains `/dodsC/`,
    * `/dods/`, or `/opendap/` is treated as a DAP2 endpoint. Both
    * directions can be forced: `dap2+http(s)://…` speaks DAP2 to a
    * non-standard mount; `raw+http(s)://…` bypasses the heuristic and
    * reads the URL as plain container bytes over HTTP ranges (a file in
    * a bucket that merely happens to be named `dods`). */
  def open(path: String): NcFile = {
    if (Dap2.isDapUrl(path)) return new Dap2NcFile(path)
    val r = RangeReader.open(Dap2.stripForce(path))
    val head = new Array[Byte](math.min(8L, r.length).toInt)
    r.readFully(0, head)
    if (NetCdf3.isHdf5(head)) new Hdf5NcFile(Hdf5.open(r))
    else new Cdf3NcFile(r, NetCdf3.parseHeader(r))
  }
}

private final class Cdf3NcFile(r: RangeReader, h: NetCdf3.Header) extends NcFile {
  private def v(name: String) = h.vars.find(_.name == name)
    .getOrElse(throw new IllegalArgumentException(
      s"no variable '$name' (has: ${h.vars.map(_.name).mkString(", ")})"))
  def varNames: Seq[String] = h.vars.map(_.name)
  def isRecordVar(name: String): Boolean = v(name).isRecord
  def numRecs: Int = h.numRecs
  def fillValue(name: String): Option[Double] = v(name).fillValue
  def strAttr(name: String, attr: String): Option[String] =
    v(name).attrs.get(attr).map(_.str).filter(_.nonEmpty)
  def readFixed(name: String): Array[Double] = NetCdf3.readFixed(r, h, v(name))
  def readRecord(name: String, rec: Int): Array[Double] = NetCdf3.readRecord(r, h, v(name), rec)
  def close(): Unit = r.close()
}

private final class Hdf5NcFile(f: Hdf5.Hdf5File) extends NcFile {
  private def d(name: String) = f.datasets.getOrElse(name,
    throw new IllegalArgumentException(
      s"no variable '$name' (has: ${f.datasets.keys.mkString(", ")})"))
  def varNames: Seq[String] = f.datasets.keys.toSeq.sorted
  /** netcdf-c always marks the unlimited (time) dimension in the
    * dataspace max-dims, so that flag is authoritative when ANY dataset
    * carries it. Only a file with no unlimited dims at all falls back to
    * "rank ≥ 2 means (time, node)" — and then `element(nele, nvertex)`
    * is excluded by name-independent shape logic being unavailable, so
    * the fallback is best-effort for non-netcdf writers only. */
  private val anyUnlimited = f.datasets.values.exists(_.unlimitedFirst)
  def isRecordVar(name: String): Boolean = {
    val ds = d(name)
    if (anyUnlimited) ds.unlimitedFirst else ds.rank >= 2
  }
  def numRecs: Int =
    f.datasets.values.filter(ds => if (anyUnlimited) ds.unlimitedFirst else ds.rank >= 2)
      .map(_.shape.headOption.getOrElse(0L)).maxOption.getOrElse(0L).toInt
  def fillValue(name: String): Option[Double] = d(name).fillValue
  def strAttr(name: String, attr: String): Option[String] =
    d(name).attrs.get(attr).map(_.str).filter(_.nonEmpty)
  def readFixed(name: String): Array[Double] = f.readAll(d(name))
  def readRecord(name: String, rec: Int): Array[Double] = f.readRow(d(name), rec)
  def close(): Unit = f.close()
}
