package graft.sources

import java.io.RandomAccessFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** The ingest boundary the reference crosses first on every run:
  * `fort.63.nc` (ADCIRC mesh + water-surface timeseries, NetCDF-3) →
  * the long-form Parquet layout every graft operator consumes.
  *
  * Contract (mirrors /root/reference/run/utilities/
  * adcirc_dask_utilities.py:10-44 and SURVEY §2.1 S2):
  *  - `nodes.parquet`    (node_id, lon, lat)           from vars x, y
  *  - `elements.parquet` (ele_id, n1, n2, n3)          from var element,
  *    with the reference's `-1` connectivity shift (NetCDF stores 1-based
  *    node ids; `adcirc_utilities.py` subtracts 1 on load) applied HERE,
  *    at ingest — downstream operators never see 1-based ids
  *  - `series.parquet`   (ts, node_id, value)          from record var
  *    zeta(time, node), long-form
  *
  * Scale shape: the header is parsed once on the driver (KBs); node and
  * element arrays are small (O(mesh)); the BULK — zeta records — is
  * read in parallel, one `(executor, record-range)` per partition, each
  * task seeking directly to `begin + rec*recSize` in its own file
  * handle. No driver materialization of the timeseries, no shared
  * state; at production scale the .nc sits on shared storage and record
  * reads stripe across the cluster, where the reference loops timesteps
  * serially in one process. */
object Ingest {

  /** Convert an ADCIRC-shaped NetCDF-3 file to the graft Parquet layout.
    * Variable names are parameters so swan/other solvers map too. */
  def fort63ToParquet(s: SparkSession, ncPath: String, outDir: String,
                      xVar: String = "x", yVar: String = "y",
                      eleVar: String = "element", seriesVar: String = "zeta"): Unit = {
    import s.implicits._
    val raf = new RandomAccessFile(ncPath, "r")
    try {
      val h = NetCdf3.parseHeader(raf)
      def v(name: String) = h.vars.find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(
          s"$ncPath has no variable '$name' (has: ${h.vars.map(_.name).mkString(", ")})"))

      // nodes: two fixed arrays, mesh-sized — driver read is the right tool
      val xs = NetCdf3.readFixed(raf, h, v(xVar))
      val ys = NetCdf3.readFixed(raf, h, v(yVar))
      require(xs.length == ys.length, s"x/y length mismatch: ${xs.length}/${ys.length}")
      xs.indices.map(i => (i.toLong, xs(i), ys(i))).toDF("node_id", "lon", "lat")
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/nodes")

      // elements: (nele, 3) ints, 1-based in the file → 0-based AT INGEST
      val ele = NetCdf3.readFixed(raf, h, v(eleVar)).map(_.toLong - 1L)
      require(ele.length % 3 == 0, s"element var length ${ele.length} not divisible by 3")
      (0 until ele.length / 3)
        .map(e => (e.toLong, ele(3 * e), ele(3 * e + 1), ele(3 * e + 2)))
        .toDF("ele_id", "n1", "n2", "n3")
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/elements")

      // series: record variable — parallel record-striped read
      seriesToParquet(s, ncPath, outDir, seriesVar, h.numRecs)
    } finally raf.close()
  }

  /** Long-form (ts, node_id, value) from a record variable, records
    * striped across tasks; each task re-parses the (tiny) header and
    * seeks straight to its records. */
  private def seriesToParquet(s: SparkSession, ncPath: String, outDir: String,
                              seriesVar: String, numRecs: Int): Unit = {
    import s.implicits._
    s.range(0, numRecs)
      .repartition(math.min(numRecs, 32))
      .mapPartitions { recs =>
        val raf = new RandomAccessFile(ncPath, "r")
        val h = NetCdf3.parseHeader(raf)
        val v = h.vars.find(_.name == seriesVar).get
        recs.flatMap { rec =>
          val vals = NetCdf3.readRecord(raf, h, v, rec.toInt)
          vals.indices.iterator.map(i => (rec, i.toLong, vals(i)))
        } // raf leaks per-task; acceptable: task JVMs release on completion
      }
      .toDF("ts", "node_id", "value")
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/series")
  }

  /** The reference's 1-D/2-D variable dispatch (adcirc_utilities
    * `get_water_levels63` vs max-variable slicing,
    * /root/reference/run/utilities/adcirc_dask_utilities.py:24-33):
    * time-varying variables (zeta) are (time, node) and slice per
    * timestep; max-variables (zeta_max, vel_max) are nodal 1-D with no
    * time axis. The dispatch is SCHEMA-DRIVEN — whether the variable
    * carries the record (unlimited) dimension decides the shape, exactly
    * as the reference branches on `len(var.dims)`:
    *  - record var  → long-form `(ts, node_id, value)` (record-striped)
    *  - fixed var   → static   `(node_id, value)` snapshot
    * Returns the written sub-directory name ("series" or the var name). */
  def varToParquet(s: SparkSession, ncPath: String, outDir: String,
                   varName: String): String = {
    import s.implicits._
    val raf = new RandomAccessFile(ncPath, "r")
    try {
      val h = NetCdf3.parseHeader(raf)
      val v = h.vars.find(_.name == varName)
        .getOrElse(throw new IllegalArgumentException(s"no variable '$varName'"))
      if (v.isRecord) {
        seriesToParquet(s, ncPath, outDir, varName, h.numRecs); "series"
      } else {
        val vals = NetCdf3.readFixed(raf, h, v)
        vals.indices.map(i => (i.toLong, vals(i))).toDF("node_id", "value")
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$varName")
        varName
      }
    } finally raf.close()
  }

  /** Read the ingested layout back (the operators' input contract). */
  def nodes(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/nodes")
  def elements(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/elements")
  def series(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/series")
}
