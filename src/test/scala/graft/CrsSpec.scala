package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.operators.Crs

/** The parameterized (srcEpsg, dstEpsg) reprojection operator —
  * P4 generalized toward the reference's `to_crs(CRS(targetepsg))`
  * (run/adcircTime2cogs.py:29-47). Round-trip properties over a dense
  * lon/lat grid, the identity short-circuit, plan shape (narrow, no
  * shuffle), and the plan-time failure for unsupported codes. */
class CrsSpec extends SparkSpec {

  private def grid = {
    import spark.implicits._
    // 37x33 lon/lat lattice over Mercator's valid domain
    spark.range(0, 37).toDF("i").crossJoin(spark.range(0, 33).toDF("j"))
      .select((col("i") * 10.0 - 180.0).as("x"), (col("j") * 5.0 - 80.0).as("y"))
  }

  private def maxAbs(df: org.apache.spark.sql.DataFrame, c: String): Double =
    df.agg(max(abs(col(c)))).collect()(0).getDouble(0)

  test("4326 -> 3857 -> 4326 round-trips to identity within 1e-9 degrees") {
    val src = grid.withColumn("x0", col("x")).withColumn("y0", col("y"))
    val rt = Crs.transform(Crs.transform(src, "x", "y", 4326, 3857), "x", "y", 3857, 4326)
      .select((col("x") - col("x0")).as("dx"), (col("y") - col("y0")).as("dy"))
    assert(maxAbs(rt, "dx") < 1e-9)
    assert(maxAbs(rt, "dy") < 1e-9)
  }

  test("4326 -> 32662 -> 4326 (plate-carree) round-trips exactly-ish") {
    val src = grid.withColumn("x0", col("x")).withColumn("y0", col("y"))
    val rt = Crs.transform(Crs.transform(src, "x", "y", 4326, 32662), "x", "y", 32662, 4326)
      .select((col("x") - col("x0")).as("dx"), (col("y") - col("y0")).as("dy"))
    assert(maxAbs(rt, "dx") < 1e-12)
    assert(maxAbs(rt, "dy") < 1e-12)
  }

  test("3857 -> 32662 composition equals forward(32662) of the original lon/lat") {
    val src = grid
    val viaMerc = Crs.transform(Crs.transform(src, "x", "y", 4326, 3857), "x", "y", 3857, 32662)
    val direct = Crs.transform(src, "x", "y", 4326, 32662)
    val a = viaMerc.orderBy("x", "y").collect()
    val b = direct.orderBy("x", "y").collect()
    a.zip(b).foreach { case (ra, rb) =>
      assert(math.abs(ra.getDouble(0) - rb.getDouble(0)) < 1e-6)
      assert(math.abs(ra.getDouble(1) - rb.getDouble(1)) < 1e-6)
    }
  }

  test("known anchor: forward(3857) of (180, 0) is (pi*R, 0)") {
    import spark.implicits._
    val df = Seq((180.0, 0.0)).toDF("x", "y")
    val out = Crs.transform(df, "x", "y", 4326, 3857).collect()(0)
    assert(math.abs(out.getDouble(0) - math.Pi * Crs.R) < 1e-6)
    assert(math.abs(out.getDouble(1)) < 1e-6)
  }

  test("same-code pairs short-circuit to the identity plan") {
    val src = grid
    assert(Crs.transform(src, "x", "y", 4326, 4326) eq src)
    assert(Crs.transform(src, "x", "y", 3857, 3857) eq src)
  }

  test("reprojection is narrow: no exchange in the plan") {
    val df = Crs.transform(grid, "x", "y", 4326, 3857)
    // the only exchanges allowed are the ones the grid's crossJoin brings;
    // reprojection itself must add none (compare plan exchange counts)
    def exchanges(p: org.apache.spark.sql.DataFrame) =
      p.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }.size
    assert(exchanges(df) === exchanges(grid))
  }

  test("unsupported EPSG fails at plan time with the supported list") {
    val e = intercept[IllegalArgumentException] {
      Crs.transform(grid, "x", "y", 4326, 27700)
    }
    assert(e.getMessage.contains("EPSG:27700"))
    assert(e.getMessage.contains("3857"))
    assert(e.getMessage.contains("32601-32660")) // UTM family advertised
  }

  /** Zone 33 (CM 15°E) lattice spanning the FULL zone width including both
    * ±3° boundaries, lats from 80°S to 84°N (the UTM domain). */
  private def zoneGrid = {
    import spark.implicits._
    spark.range(0, 13).toDF("i").crossJoin(spark.range(0, 42).toDF("j"))
      .select((col("i") * 0.5 + 12.0).as("x"), (col("j") * 4.0 - 80.0).as("y"))
  }

  test("UTM 4326 -> 32633 -> 4326 round-trips within 1e-7 deg incl. zone boundaries") {
    val src = zoneGrid.withColumn("x0", col("x")).withColumn("y0", col("y"))
    val rt = Crs.transform(Crs.transform(src, "x", "y", 4326, 32633), "x", "y", 32633, 4326)
      .select((col("x") - col("x0")).as("dx"), (col("y") - col("y0")).as("dy"))
    // Snyder series are cm-accurate in the zone; 1e-7 deg ~ 1.1 cm
    assert(maxAbs(rt, "dx") < 1e-7)
    assert(maxAbs(rt, "dy") < 1e-7)
  }

  test("UTM anchors: central meridian easting, equator northing, quarter meridian") {
    import spark.implicits._
    val df = Seq((15.0, 0.0), (15.0, 90.0), (15.0, 45.0)).toDF("x", "y")
    val out = Crs.transform(df, "x", "y", 4326, 32633).orderBy("y").collect()
    // (15, 0): zone 33 CM at the equator = (false easting, 0)
    assert(math.abs(out(0).getDouble(0) - 500000.0) < 1e-6)
    assert(math.abs(out(0).getDouble(1)) < 1e-6)
    // (15, 90): northing = k0 * WGS84 quarter meridian (10001965.729 m,
    // an INDEPENDENT textbook geodesy constant, not derived from the code)
    assert(math.abs(out(2).getDouble(1) - 0.9996 * 10001965.729) < 1.0)
    assert(math.abs(out(2).getDouble(0) - 500000.0) < 1e-6)
  }

  test("UTM south zone: 32733 northing = 32633 northing + 10,000 km") {
    import spark.implicits._
    val df = Seq((16.5, -33.9)).toDF("x", "y") // Cape Town-ish, zone 33S
    val north = Crs.transform(df, "x", "y", 4326, 32633).collect()(0)
    val south = Crs.transform(df, "x", "y", 4326, 32733).collect()(0)
    assert(south.getDouble(0) === north.getDouble(0)) // same easting
    assert(math.abs(south.getDouble(1) - (north.getDouble(1) + 1e7)) < 1e-6)
    assert(south.getDouble(1) > 0 && south.getDouble(1) < 1e7) // in-range
  }

  test("LCC anchors: projection origin maps to the false origin exactly-ish") {
    import spark.implicits._
    // Lambert-93: (3.0 E, 46.5 N) -> (700000, 6600000); Canada Atlas:
    // (-95, 49) -> (0, 0)
    val fr = Crs.transform(Seq((3.0, 46.5)).toDF("x", "y"), "x", "y", 4326, 2154).collect()(0)
    assert(math.abs(fr.getDouble(0) - 700000.0) < 1e-5)
    assert(math.abs(fr.getDouble(1) - 6600000.0) < 1e-5)
    val ca = Crs.transform(Seq((-95.0, 49.0)).toDF("x", "y"), "x", "y", 4326, 3978).collect()(0)
    assert(math.abs(ca.getDouble(0)) < 1e-5)
    assert(math.abs(ca.getDouble(1)) < 1e-5)
  }

  test("LCC standard parallels are distortion-free: scale ~1 along sp1/sp2") {
    import spark.implicits._
    // on a standard parallel, projected distance per degree of longitude
    // must equal the ellipsoidal parallel arc (cos-corrected) to ~1e-6
    Seq(44.0, 49.0).foreach { sp =>
      val df = Seq((2.0, sp), (2.001, sp)).toDF("x", "y")
      val out = Crs.transform(df, "x", "y", 4326, 2154).orderBy("x").collect()
      val dx = out(1).getDouble(0) - out(0).getDouble(0)
      val dy = out(1).getDouble(1) - out(0).getDouble(1)
      val projected = math.sqrt(dx * dx + dy * dy)
      val phi = math.toRadians(sp)
      val nRad = Crs.SemiMajor / math.sqrt(1.0 - Crs.E2 * math.sin(phi) * math.sin(phi))
      val arc = nRad * math.cos(phi) * math.toRadians(0.001)
      assert(math.abs(projected / arc - 1.0) < 1e-6, s"scale at sp=$sp: ${projected / arc}")
    }
  }

  test("LCC 4326 -> 2154 -> 4326 round-trips within 1e-8 deg over France") {
    import spark.implicits._
    val src = spark.range(0, 15).toDF("i").crossJoin(spark.range(0, 11).toDF("j"))
      .select((col("i") * 1.0 - 5.0).as("x"), (col("j") * 1.0 + 41.0).as("y"))
      .withColumn("x0", col("x")).withColumn("y0", col("y"))
    val rt = Crs.transform(Crs.transform(src, "x", "y", 4326, 2154), "x", "y", 2154, 4326)
      .select((col("x") - col("x0")).as("dx"), (col("y") - col("y0")).as("dy"))
    assert(maxAbs(rt, "dx") < 1e-8)
    assert(maxAbs(rt, "dy") < 1e-8)
  }

  test("Albers anchors and round-trip over CONUS") {
    import spark.implicits._
    // EPSG 5070: projection origin (-96, 23) -> (0, 0)
    val o = Crs.transform(Seq((-96.0, 23.0)).toDF("x", "y"), "x", "y", 4326, 5070).collect()(0)
    assert(math.abs(o.getDouble(0)) < 1e-5)
    assert(math.abs(o.getDouble(1)) < 1e-5)
    val src = spark.range(0, 30).toDF("i").crossJoin(spark.range(0, 14).toDF("j"))
      .select((col("i") * 2.0 - 125.0).as("x"), (col("j") * 2.0 + 24.0).as("y"))
      .withColumn("x0", col("x")).withColumn("y0", col("y"))
    val rt = Crs.transform(Crs.transform(src, "x", "y", 4326, 5070), "x", "y", 5070, 4326)
      .select((col("x") - col("x0")).as("dx"), (col("y") - col("y0")).as("dy"))
    assert(maxAbs(rt, "dx") < 1e-7)
    assert(maxAbs(rt, "dy") < 1e-7)
  }

  test("Albers is equal-area: projected cell area matches the ellipsoidal cell") {
    import spark.implicits._
    // independent property — the defining invariant of the projection,
    // checked against the ellipsoid (M·N·cosφ·dλ·dφ), not the code
    Seq(27.0, 38.5, 48.0).foreach { latC =>
      val d = 0.01
      val quad = Seq((-100.0, latC), (-100.0 + d, latC),
                     (-100.0 + d, latC + d), (-100.0, latC + d))
      val out = Crs.transform(quad.toDF("x", "y"), "x", "y", 4326, 5070)
        .collect().map(r => (r.getDouble(0), r.getDouble(1)))
      // the transform preserves input order within a tiny local collect
      val area = math.abs((0 until 4).map { i =>
        val (x1, y1) = out(i); val (x2, y2) = out((i + 1) % 4)
        x1 * y2 - x2 * y1
      }.sum / 2.0)
      val phi = math.toRadians(latC + d / 2.0)
      val w = 1.0 - Crs.E2 * math.sin(phi) * math.sin(phi)
      val mRad = Crs.SemiMajor * (1.0 - Crs.E2) / (w * math.sqrt(w))
      val nRad = Crs.SemiMajor / math.sqrt(w)
      val ell = mRad * nRad * math.cos(phi) * math.toRadians(d) * math.toRadians(d)
      assert(math.abs(area / ell - 1.0) < 1e-5, s"area ratio at $latC: ${area / ell}")
    }
  }

  test("UTM composes through the pivot: 32633 -> 3857 equals direct forward") {
    // pair rows by the ORIGINAL lon/lat (sorting by outputs would tie-break
    // x-equal groups on the inverse's ULP noise and mispair lats)
    val src = zoneGrid.withColumn("x0", col("x")).withColumn("y0", col("y"))
    val viaUtm = Crs.transform(Crs.transform(src, "x", "y", 4326, 32633),
                               "x", "y", 32633, 3857)
    val direct = Crs.transform(src, "x", "y", 4326, 3857)
    val a = viaUtm.orderBy("x0", "y0").select("x", "y").collect()
    val b = direct.orderBy("x0", "y0").select("x", "y").collect()
    a.zip(b).foreach { case (ra, rb) =>
      assert(math.abs(ra.getDouble(0) - rb.getDouble(0)) < 0.01) // 1 cm
      assert(math.abs(ra.getDouble(1) - rb.getDouble(1)) < 0.01)
    }
  }
}
