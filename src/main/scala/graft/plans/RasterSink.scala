package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Interp

/** The reference's output stage, relationalized (SURVEY §2.1 S5/S6):
  * one raster per timestep + GeoServer ImageMosaic sidecar metadata.
  *
  *  - S5 (one COG per timestep, run/adcircTime2cogs.py:205-206): the raster
  *    table written `partitionBy("ts")` — each timestep lands in its own
  *    directory of columnar files, the engine's equivalent of
  *    one-image-per-timestep (SURVEY §4: partition output by ts). True
  *    GeoTIFF byte-encoding is out of relational scope (SURVEY §7.5.5).
  *  - S6 (indexer/timeregex/datastore properties,
  *    run/adcircTime2cogs.py:211-222): the same sidecar strings derived
  *    relationally and written once from the driver.
  *
  * At 100 TB: `partitionBy` turns downstream per-timestep reads into
  * partition-pruned scans; the sort within partitions keeps row-groups
  * ordered by (grow, gcol) so a tile reader seeks, not scans.
  */
object RasterSink {

  /** P4 reprojection stage (reference construct_geopandas + to_crs,
    * run/adcircTime2cogs.py:29-47): closed-form spherical-Mercator forward
    * over the mesh nodes — a narrow, codegen'd transformation, no shuffle
    * (the reference repartitions to 4 for the same step; here partitioning
    * is inherited from the source). Identity in production (4326→4326) but
    * the operator exists, as in the reference. */
  def reprojectNodes(s: SparkSession): DataFrame = {
    val R = lit(6378137.0)
    val rad = lit(math.Pi) / lit(180.0)
    // lattice coords are degree-like; scale into a valid lon/lat window
    val lon = col("lon") - lit(90.0)
    val lat = col("lat") + lit(20.0)
    Interp.nodes(s)
      .withColumn("mx", lon * rad * R)
      .withColumn("my", R * log(tan(lit(math.Pi) / lit(4.0) + lat * rad / lit(2.0))))
  }

  /** Write the interpolated raster partitioned by timestep; returns the
    * frame that was written (for assertions). */
  def writeRaster(s: SparkSession, outDir: String): DataFrame = {
    val raster = Interp.qInterpBarycentric(s, "")
    raster.write
      .mode(SaveMode.Overwrite)
      .partitionBy("ts")
      .parquet(s"$outDir/raster")
    raster
  }

  /** S5 closed: one true GeoTIFF per timestep ([[GeoTiff]], pure-JVM
    * TIFF 6.0 — the reference's write_cog contract,
    * run/adcircTime2cogs.py:205-206). Distribution shape: repartition by
    * ts so every timestep's cells land in ONE task, then each task
    * assembles its timesteps' grids (O(grid) memory, same envelope as
    * the reference's in-memory grid) and writes
    * `<var>_<ts>.tiff` via foreachPartition — executors write in
    * parallel across timesteps, the driver never sees pixel data. At
    * 100 TB `outDir` is shared storage and timesteps fan out across the
    * cluster; the serial per-timestep Python loop in the reference
    * becomes embarrassing parallelism here. */
  def writeGeoTiffs(s: SparkSession, outDir: String, varName: String = "fort_63_zeta",
                    cog: Boolean = false, tile: Int = 32): Unit = {
    val g = Interp.G
    new java.io.File(outDir).mkdirs()
    Interp.qInterpBarycentric(s, "")
      .repartition(col("ts"))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val grids = scala.collection.mutable.Map.empty[Long, Array[Float]]
        it.foreach { r =>
          val grid = grids.getOrElseUpdate(r.getAs[Long]("ts"), new Array[Float](g * g))
          grid(r.getAs[Int]("grow") * g + r.getAs[Int]("gcol")) =
            (r.getAs[Long]("zi4") / 10000.0).toFloat
        }
        grids.foreach { case (ts, grid) =>
          // north-up: grow 0 is the top row; origin at the grid's NW corner
          val bytes =
            if (cog) GeoTiff.encodeCog(g, g, grid,
              originX = 0.3 - 0.19, originY = 0.3 + (g - 1) * 0.38 + 0.19,
              res = 0.38, tile = tile)
            else GeoTiff.encode(g, g, grid,
              originX = 0.3 - 0.19, originY = 0.3 + (g - 1) * 0.38 + 0.19, res = 0.38)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$outDir/${varName}_ts$ts%03d.tiff"), bytes)
        }
      }
  }

  /** Generalized per-timestep COG writer for an arbitrary raster
    * (ts, grow, gcol, value) + GridSpec — the sink stage of the full
    * [[graft.Pipeline]]. Same distribution shape as [[writeGeoTiffs]];
    * absent cells (outside the mesh) stay 0 in the stub's Float32 band
    * (a production writer would add a nodata mask band or TIFF nodata
    * tag). */
  def writeCogs(raster: DataFrame, spec: Interp.GridSpec, outDir: String,
                varName: String, tile: Int = 256): Unit = {
    val g = spec.g
    val (ox, oy, res) = (spec.originX, spec.originY, spec.resX)
    new java.io.File(outDir).mkdirs()
    raster
      .repartition(col("ts"))
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        val grids = scala.collection.mutable.Map.empty[Long, Array[Float]]
        it.foreach { r =>
          val grid = grids.getOrElseUpdate(r.getAs[Long]("ts"), new Array[Float](g * g))
          grid(r.getAs[Int]("grow") * g + r.getAs[Int]("gcol")) =
            r.getAs[Double]("value").toFloat
        }
        grids.foreach { case (ts, grid) =>
          val bytes = GeoTiff.encodeCog(g, g, grid, ox, oy, res, tile)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(f"$outDir/${varName}_ts$ts%03d.tiff"), bytes)
        }
      }
  }

  /** The matching SOURCE: read a directory of per-timestep GeoTIFF/COGs
    * back into the long-form raster (ts, grow, gcol, value) — the engine
    * consumes its own sink format (and the reference ecosystem's COGs,
    * within the Float32/tiled-or-striped subset [[GeoTiff]] writes).
    * Distribution: one task per file via a parallelized path list; each
    * task decodes its file locally — tiff bytes never cross the network
    * beyond the scan (same shape as binaryFiles, minus the driver
    * collect). Timestep parsed from the `_ts<NNN>.tiff` suffix. */
  def readGeoTiffs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tiff")).map(_.getAbsolutePath).toSeq.sorted
    val suffix = """_ts(\d+)\.tiff$""".r
    s.sparkContext.parallelize(files, math.max(1, files.length))
      .flatMap { path =>
        val ts = suffix.findFirstMatchIn(path).map(_.group(1).toLong)
          .getOrElse(throw new IllegalArgumentException(s"no _tsNNN suffix: $path"))
        val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
        val (w, h, vals) =
          try { val (cw, ch, cv, _, _) = GeoTiff.decodeCog(bytes); (cw, ch, cv) }
          catch { case _: Exception => GeoTiff.decode(bytes) } // striped fallback
        vals.indices.iterator.map(i => (ts, i / w, i % w, vals(i).toDouble))
      }
      .toDF("ts", "grow", "gcol", "value")
  }

  /** Per-timestep mosaic filenames — the reference's
    * `<var>_<yyyyMMdd'T'HHmmss>Z.tiff` naming (run/adcircTime2cogs.py:192-194),
    * derived from the raster's distinct timesteps. */
  def mosaicIndex(s: SparkSession, varName: String): DataFrame =
    Interp.series(s)
      .select(col("ts")).distinct()
      .select(col("ts"),
              concat(lit(varName), lit("_"),
                     date_format(timestamp_seconds(col("ts") * 3600), "yyyyMMdd'T'HHmmss"),
                     lit("Z.tiff")).as("fname"))
      .orderBy("ts")

  /** The three sidecar properties payloads (contents match the reference's
    * ImageMosaic contract, run/adcircTime2cogs.py:211-222; connection
    * parameters are left as placeholders — they arrive from deployment
    * config, never from code). */
  def sidecars(layerName: String): Map[String, String] = Map(
    "indexer.properties" ->
      s"""TimeAttribute=time
         |Schema=*the_geom:Polygon,location:String,time:java.util.Date
         |PropertyCollectors=TimestampFileNameExtractorSPI[timeregex](time)""".stripMargin,
    "timeregex.properties" ->
      "regex=[0-9]{8}T[0-9]{6}",
    "datastore.properties" ->
      s"""SPI=org.geotools.data.postgis.PostgisNGDataStoreFactory
         |host=HOST_PLACEHOLDER
         |port=PORT_PLACEHOLDER
         |database=$layerName
         |schema=public
         |Loose\\ bbox=true
         |Estimated\\ extends=false
         |validate\\ connections=true
         |Connection\\ timeout=10
         |preparedStatements=true""".stripMargin,
  )

  /** Full pipeline demo: raster write + sidecar files, mirroring
    * run/adcircTime2cogs.py:121-240 stage for stage. */
  def run(s: SparkSession, outDir: String, layerName: String = "graft"): Unit = {
    writeRaster(s, outDir)
    val dir = new java.io.File(outDir); dir.mkdirs()
    sidecars(layerName).foreach { case (name, body) =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/$name"), body)
    }
  }
}
