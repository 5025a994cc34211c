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
  *  - 4326          geographic lon/lat degrees (identity axis)
  *  - 3857/900913   spherical web-Mercator meters
  *  - 32662/54001   plate-carrée (equirectangular) meters
  *  - 32601–32660 / 32701–32760  UTM zones 1–60 N/S — ellipsoidal
  *    transverse Mercator on WGS84 via the public Snyder series
  *    ("Map Projections — A Working Manual", USGS PP 1395, eqs 8-9…8-25;
  *    cm-accurate inside a zone's ±3° width)
  *  - 2154 / 3978   Lambert Conformal Conic 2SP (France Lambert-93,
  *    Canada Atlas) — Snyder eqs 15-1…15-11, fixed-unroll inverse
  *  - 5070          Albers Equal-Area 2SP (Conus Albers) — Snyder eqs
  *    14-1…14-12 with the 3-18 authalic-latitude series (closed form)
  *
  * Any (src, dst) pair composes inverse(src)∘forward(dst) through the
  * 4326 pivot. Everything is `Column` arithmetic over
  * `org.apache.spark.sql.functions` — codegen'd, narrow, no shuffle, no
  * UDF — so reprojection fuses into the surrounding stage at any scale
  * (whole-stage codegen's subexpression elimination dedups the shared
  * sin/cos/tan terms). Unsupported codes fail at plan time with the
  * supported list. */
object Crs {

  /** WGS84/web-Mercator sphere radius (the 3857 contract). */
  val R = 6378137.0

  // WGS84 ellipsoid (UTM contract)
  val SemiMajor = 6378137.0
  val Flattening = 1.0 / 298.257223563
  val E2 = Flattening * (2.0 - Flattening)   // first eccentricity²
  val Ep2 = E2 / (1.0 - E2)                  // second eccentricity²
  val K0 = 0.9996                            // UTM central-meridian scale
  // meridional-arc series coefficients (Snyder 3-21)
  val Mc0 = 1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0
  val Mc2 = 3.0 * E2 / 8.0 + 3.0 * E2 * E2 / 32.0 + 45.0 * E2 * E2 * E2 / 1024.0
  val Mc4 = 15.0 * E2 * E2 / 256.0 + 45.0 * E2 * E2 * E2 / 1024.0
  val Mc6 = 35.0 * E2 * E2 * E2 / 3072.0
  // footpoint-latitude series base (Snyder 3-24)
  val E1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))

  private val rad = lit(math.Pi) / lit(180.0)

  private val supported = Set(4326, 3857, 900913, 32662, 54001)

  /** EPSG 326zz/327zz → (central meridian degrees, southern false
    * northing). */
  private[operators] def utmZone(epsg: Int): Option[(Double, Boolean)] =
    if (epsg >= 32601 && epsg <= 32660) Some(((epsg - 32600) * 6.0 - 183.0, false))
    else if (epsg >= 32701 && epsg <= 32760) Some(((epsg - 32700) * 6.0 - 183.0, true))
    else None

  /** Lambert Conformal Conic (2SP) definitions — the most-used projected
    * family after UTM/web-Mercator. Parameters from the public EPSG
    * registry entries. */
  case class LccDef(lat0: Double, lon0: Double, sp1: Double, sp2: Double,
                    fe: Double, fn: Double) {
    import math._
    private val e = sqrt(E2)
    private def m(phi: Double) = cos(phi) / sqrt(1.0 - E2 * sin(phi) * sin(phi))
    private def t(phi: Double) =
      tan(Pi / 4.0 - phi / 2.0) /
        pow((1.0 - e * sin(phi)) / (1.0 + e * sin(phi)), e / 2.0)
    private val (p0, p1, p2) = (toRadians(lat0), toRadians(sp1), toRadians(sp2))
    /** Cone constant, scale factor, origin radius — Snyder 15-3/15-2/15-1a. */
    val n: Double = (log(m(p1)) - log(m(p2))) / (log(t(p1)) - log(t(p2)))
    val bigF: Double = m(p1) / (n * pow(t(p1), n))
    val rho0: Double = SemiMajor * bigF * pow(t(p0), n)
  }

  private[operators] val lccDefs: Map[Int, LccDef] = Map(
    // RGF93 / Lambert-93 (France)
    2154 -> LccDef(lat0 = 46.5, lon0 = 3.0, sp1 = 44.0, sp2 = 49.0,
                   fe = 700000.0, fn = 6600000.0),
    // NAD83 / Canada Atlas Lambert
    3978 -> LccDef(lat0 = 49.0, lon0 = -95.0, sp1 = 49.0, sp2 = 77.0,
                   fe = 0.0, fn = 0.0))

  /** Albers Equal-Area Conic (2SP) definitions (EPSG registry). */
  case class AlbersDef(lat0: Double, lon0: Double, sp1: Double, sp2: Double,
                       fe: Double, fn: Double) {
    import math._
    private val e = sqrt(E2)
    private def m(phi: Double) = cos(phi) / sqrt(1.0 - E2 * sin(phi) * sin(phi))
    /** Authalic q (Snyder 3-12). */
    def qAuth(phi: Double): Double =
      (1.0 - E2) * (sin(phi) / (1.0 - E2 * sin(phi) * sin(phi)) -
        (1.0 / (2.0 * e)) * log((1.0 - e * sin(phi)) / (1.0 + e * sin(phi))))
    private val (p0, p1, p2) = (toRadians(lat0), toRadians(sp1), toRadians(sp2))
    /** Cone constant, C, origin radius — Snyder 14-6/14-5/14-3a. */
    val n: Double = (m(p1) * m(p1) - m(p2) * m(p2)) / (qAuth(p2) - qAuth(p1))
    val bigC: Double = m(p1) * m(p1) + n * qAuth(p1)
    val rho0: Double = SemiMajor * sqrt(bigC - n * qAuth(p0)) / n
    /** q at the pole — normalizes q' to the authalic-latitude sine. */
    val qPole: Double = qAuth(Pi / 2.0)
  }

  private[operators] val albersDefs: Map[Int, AlbersDef] = Map(
    // NAD83 / Conus Albers
    5070 -> AlbersDef(lat0 = 23.0, lon0 = -96.0, sp1 = 29.5, sp2 = 45.5,
                      fe = 0.0, fn = 0.0))

  private def check(epsg: Int): Int = {
    require(supported.contains(epsg) || utmZone(epsg).isDefined ||
              lccDefs.contains(epsg) || albersDefs.contains(epsg),
      s"EPSG:$epsg unsupported; closed-form codes: " +
        s"${supported.toSeq.sorted.mkString(", ")}, 32601-32660 (UTM N), " +
        s"32701-32760 (UTM S), ${lccDefs.keys.toSeq.sorted.mkString(", ")} (LCC 2SP), " +
        s"${albersDefs.keys.toSeq.sorted.mkString(", ")} (Albers 2SP)")
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
      case other =>
        utmZone(other) match {
          case Some((lon0, south)) => tmForward(lon, lat, lon0, south)
          case None if lccDefs.contains(other) => lccForward(lccDefs(other), lon, lat)
          case None => albersForward(albersDefs(other), lon, lat)
        }
    }

  /** `lon`/`lat` degrees of (x, y) in the source CRS. */
  def inverse(srcEpsg: Int, x: Column, y: Column): (Column, Column) =
    check(srcEpsg) match {
      case 4326 => (x, y)
      case 3857 | 900913 =>
        (x / lit(R) / rad,
         (atan(exp(y / lit(R))) * lit(2.0) - lit(math.Pi) / lit(2.0)) / rad)
      case 32662 | 54001 => (x / lit(R) / rad, y / lit(R) / rad)
      case other =>
        utmZone(other) match {
          case Some((lon0, south)) => tmInverse(x, y, lon0, south)
          case None if lccDefs.contains(other) => lccInverse(lccDefs(other), x, y)
          case None => albersInverse(albersDefs(other), x, y)
        }
    }

  /** Ellipsoidal TM forward (Snyder 8-9…8-13): degrees → UTM meters.
    * 500 km false easting; 10,000 km false northing in the south. */
  private def tmForward(lonDeg: Column, latDeg: Column,
                        lon0Deg: Double, south: Boolean): (Column, Column) = {
    val phi = latDeg * rad
    val sinp = sin(phi); val cosp = cos(phi); val tanp = tan(phi)
    val n = lit(SemiMajor) / sqrt(lit(1.0) - lit(E2) * sinp * sinp)
    val t = tanp * tanp
    val c = lit(Ep2) * cosp * cosp
    val a = (lonDeg - lit(lon0Deg)) * rad * cosp
    val a2 = a * a; val a3 = a2 * a; val a4 = a2 * a2; val a5 = a4 * a; val a6 = a4 * a2
    val m = lit(SemiMajor) *
      (lit(Mc0) * phi - lit(Mc2) * sin(phi * lit(2.0)) +
       lit(Mc4) * sin(phi * lit(4.0)) - lit(Mc6) * sin(phi * lit(6.0)))
    val x = lit(500000.0) + lit(K0) * n *
      (a + (lit(1.0) - t + c) * a3 / lit(6.0) +
       (lit(5.0) - lit(18.0) * t + t * t + lit(72.0) * c - lit(58.0) * Ep2) * a5 / lit(120.0))
    val y0 = lit(K0) *
      (m + n * tanp *
        (a2 / lit(2.0) + (lit(5.0) - t + lit(9.0) * c + lit(4.0) * c * c) * a4 / lit(24.0) +
         (lit(61.0) - lit(58.0) * t + t * t + lit(600.0) * c - lit(330.0) * Ep2) * a6 / lit(720.0)))
    (x, if (south) y0 + lit(10000000.0) else y0)
  }

  /** Lambert Conformal Conic 2SP forward (Snyder 15-1…15-4): degrees →
    * projected meters. The per-row work is one isometric-latitude t, one
    * pow, and a sin/cos pair; the cone constants (n, F, ρ0) are Scala
    * doubles baked into the plan as literals. (Datum note: 2154/3978 are
    * GRS80; its flattening differs from WGS84 in the 9th significant
    * digit — sub-mm here, carried on the WGS84 constants.) */
  private def lccForward(d: LccDef, lonDeg: Column, latDeg: Column): (Column, Column) = {
    val ecc = math.sqrt(E2)
    val phi = latDeg * rad
    val sinp = sin(phi)
    val t = tan(lit(math.Pi) / lit(4.0) - phi / lit(2.0)) /
      pow((lit(1.0) - lit(ecc) * sinp) / (lit(1.0) + lit(ecc) * sinp), lit(ecc / 2.0))
    val rho = lit(SemiMajor * d.bigF) * pow(t, lit(d.n))
    val theta = lit(d.n) * ((lonDeg - lit(d.lon0)) * rad)
    (lit(d.fe) + rho * sin(theta),
     lit(d.fn) + lit(d.rho0) - rho * cos(theta))
  }

  /** LCC 2SP inverse (Snyder 15-8…15-11): projected meters → degrees.
    * The conformal-latitude iteration is unrolled to a FIXED 5 steps —
    * deterministic (no data-dependent convergence test in the plan) and
    * converged to < 1e-12 rad for |φ| ≤ 89°. */
  private def lccInverse(d: LccDef, xCol: Column, yCol: Column): (Column, Column) = {
    val ecc = math.sqrt(E2)
    val xr = xCol - lit(d.fe)
    val yr = lit(d.rho0) - (yCol - lit(d.fn))
    // sign(n) folds into both operands so atan2/sqrt see a positive cone
    val sgn = if (d.n >= 0) 1.0 else -1.0
    val rho = sqrt(xr * xr + yr * yr) * lit(sgn)
    val tP = pow(rho / lit(SemiMajor * d.bigF), lit(1.0 / d.n))
    val theta = atan2(xr * lit(sgn), yr * lit(sgn))
    val lam = theta / lit(d.n) + lit(math.toRadians(d.lon0))
    def next(phi: Column): Column =
      lit(math.Pi / 2.0) - lit(2.0) * atan(tP *
        pow((lit(1.0) - lit(ecc) * sin(phi)) / (lit(1.0) + lit(ecc) * sin(phi)),
            lit(ecc / 2.0)))
    val phi0: Column = lit(math.Pi / 2.0) - lit(2.0) * atan(tP)
    val phi = next(next(next(next(next(phi0)))))
    (lam / rad, phi / rad)
  }

  /** Albers Equal-Area Conic 2SP forward (Snyder 14-1…14-4): degrees →
    * projected meters. q is the authalic function (one ln per row);
    * cone constants (n, C, ρ0) baked as literals. */
  private def albersForward(d: AlbersDef, lonDeg: Column, latDeg: Column): (Column, Column) = {
    val ecc = math.sqrt(E2)
    val phi = latDeg * rad
    val sinp = sin(phi)
    val q = lit(1.0 - E2) *
      (sinp / (lit(1.0) - lit(E2) * sinp * sinp) -
       lit(1.0 / (2.0 * ecc)) * log((lit(1.0) - lit(ecc) * sinp) / (lit(1.0) + lit(ecc) * sinp)))
    val rho = lit(SemiMajor) * sqrt(lit(d.bigC) - lit(d.n) * q) / lit(d.n)
    val theta = lit(d.n) * ((lonDeg - lit(d.lon0)) * rad)
    (lit(d.fe) + rho * sin(theta),
     lit(d.fn) + lit(d.rho0) - rho * cos(theta))
  }

  /** Albers 2SP inverse (Snyder 14-8…14-11 + the 3-18 authalic-latitude
    * series): projected meters → degrees. Closed form — no iteration. */
  private def albersInverse(d: AlbersDef, xCol: Column, yCol: Column): (Column, Column) = {
    val xr = xCol - lit(d.fe)
    val yr = lit(d.rho0) - (yCol - lit(d.fn))
    val sgn = if (d.n >= 0) 1.0 else -1.0
    val rho = sqrt(xr * xr + yr * yr) * lit(sgn)
    val qP = (lit(d.bigC) - rho * rho * lit(d.n * d.n / (SemiMajor * SemiMajor))) / lit(d.n)
    val theta = atan2(xr * lit(sgn), yr * lit(sgn))
    val lam = theta / lit(d.n) + lit(math.toRadians(d.lon0))
    val beta = asin(qP / lit(d.qPole)) // authalic latitude
    // Snyder 3-18 series coefficients (e² terms precomputed in Scala)
    val c2 = E2 / 3.0 + 31.0 * E2 * E2 / 180.0 + 517.0 * E2 * E2 * E2 / 5040.0
    val c4 = 23.0 * E2 * E2 / 360.0 + 251.0 * E2 * E2 * E2 / 3780.0
    val c6 = 761.0 * E2 * E2 * E2 / 45360.0
    val phi = beta + lit(c2) * sin(beta * lit(2.0)) +
      lit(c4) * sin(beta * lit(4.0)) + lit(c6) * sin(beta * lit(6.0))
    (lam / rad, phi / rad)
  }

  /** Ellipsoidal TM inverse (Snyder 8-17…8-25): UTM meters → degrees. */
  private def tmInverse(xCol: Column, yCol: Column,
                        lon0Deg: Double, south: Boolean): (Column, Column) = {
    val y = if (south) yCol - lit(10000000.0) else yCol
    val mu = y / lit(K0) / lit(SemiMajor * Mc0)
    val phi1 = mu +
      lit(3.0 * E1 / 2.0 - 27.0 * E1 * E1 * E1 / 32.0) * sin(mu * lit(2.0)) +
      lit(21.0 * E1 * E1 / 16.0 - 55.0 * E1 * E1 * E1 * E1 / 32.0) * sin(mu * lit(4.0)) +
      lit(151.0 * E1 * E1 * E1 / 96.0) * sin(mu * lit(6.0)) +
      lit(1097.0 * E1 * E1 * E1 * E1 / 512.0) * sin(mu * lit(8.0))
    val sin1 = sin(phi1); val cos1 = cos(phi1); val tan1 = tan(phi1)
    val c1 = lit(Ep2) * cos1 * cos1
    val t1 = tan1 * tan1
    val oneMinus = lit(1.0) - lit(E2) * sin1 * sin1
    val n1 = lit(SemiMajor) / sqrt(oneMinus)
    val r1 = lit(SemiMajor * (1.0 - E2)) / (oneMinus * sqrt(oneMinus))
    val d = (xCol - lit(500000.0)) / (n1 * lit(K0))
    val d2 = d * d; val d3 = d2 * d; val d4 = d2 * d2; val d5 = d4 * d; val d6 = d4 * d2
    val phi = phi1 - (n1 * tan1 / r1) *
      (d2 / lit(2.0) -
       (lit(5.0) + lit(3.0) * t1 + lit(10.0) * c1 - lit(4.0) * c1 * c1 - lit(9.0) * Ep2) * d4 / lit(24.0) +
       (lit(61.0) + lit(90.0) * t1 + lit(298.0) * c1 + lit(45.0) * t1 * t1 -
        lit(252.0) * Ep2 - lit(3.0) * c1 * c1) * d6 / lit(720.0))
    val lam = (d - (lit(1.0) + lit(2.0) * t1 + c1) * d3 / lit(6.0) +
               (lit(5.0) - lit(2.0) * c1 + lit(28.0) * t1 - lit(3.0) * c1 * c1 +
                lit(8.0) * Ep2 + lit(24.0) * t1 * t1) * d5 / lit(120.0)) / cos1
    (lit(lon0Deg) + lam / rad, phi / rad)
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
