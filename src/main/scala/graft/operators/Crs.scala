package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** P4 generalized: the reference reprojects through
  * `gdf.to_crs(CRS(targetepsg))` with the EPSG code as a PARAMETER
  * (/root/reference/run/adcircTime2cogs.py:29-47, default 4326) — not a
  * single hardcoded projection. This is the matching (srcEpsg, dstEpsg)
  * entry point over the closed-form projections a pure-JVM engine can
  * carry without a PROJ dependency:
  *
  *  - 4326        geographic lon/lat degrees (identity axis)
  *  - 3857/900913 spherical web-Mercator meters
  *  - 32662/54001 plate-carrée (equirectangular) meters
  *
  * Any (src, dst) pair composes inverse(src)∘forward(dst) through the
  * 4326 pivot. Everything is `Column` arithmetic over
  * `org.apache.spark.sql.functions` — codegen'd, narrow, no shuffle, no
  * UDF — so reprojection fuses into the surrounding stage at any scale.
  * Unsupported codes fail at plan time with the supported list. */
object Crs {

  /** WGS84/web-Mercator sphere radius (the 3857 contract). */
  val R = 6378137.0

  private val rad = lit(math.Pi) / lit(180.0)

  private val supported = Set(4326, 3857, 900913, 32662, 54001)

  private def check(epsg: Int): Int = {
    require(supported.contains(epsg),
      s"EPSG:$epsg unsupported; closed-form codes: ${supported.toSeq.sorted.mkString(", ")}")
    epsg
  }

  /** (x, y) of `lon`/`lat` degrees in the target CRS. */
  def forward(dstEpsg: Int, lon: Column, lat: Column): (Column, Column) =
    check(dstEpsg) match {
      case 4326 => (lon, lat)
      case 3857 | 900913 =>
        (lon * rad * lit(R),
         lit(R) * log(tan(lit(math.Pi) / lit(4.0) + lat * rad / lit(2.0))))
      case 32662 | 54001 => (lon * rad * lit(R), lat * rad * lit(R))
    }

  /** `lon`/`lat` degrees of (x, y) in the source CRS. */
  def inverse(srcEpsg: Int, x: Column, y: Column): (Column, Column) =
    check(srcEpsg) match {
      case 4326 => (x, y)
      case 3857 | 900913 =>
        (x / lit(R) / rad,
         (atan(exp(y / lit(R))) * lit(2.0) - lit(math.Pi) / lit(2.0)) / rad)
      case 32662 | 54001 => (x / lit(R) / rad, y / lit(R) / rad)
    }

  /** Reproject coordinate columns `xCol`/`yCol` from `srcEpsg` to
    * `dstEpsg`, replacing them in place. Same-code pairs short-circuit
    * to identity (the reference's production case is 4326→4326). */
  def transform(df: DataFrame, xCol: String, yCol: String,
                srcEpsg: Int, dstEpsg: Int): DataFrame = {
    check(srcEpsg); check(dstEpsg)
    if (srcEpsg == dstEpsg) df
    else {
      val (lon, lat) = inverse(srcEpsg, col(xCol), col(yCol))
      val (x, y) = forward(dstEpsg, lon, lat)
      // atomic: both expressions resolve against the ORIGINAL columns
      // (sequential withColumn would feed the replaced x into y)
      df.withColumns(Map(xCol -> x, yCol -> y))
    }
  }
}
