package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.file.{Files, Paths}
import graft.sources.NetCdf3

/** End-to-end pipeline proof: a synthetic fort.63-shaped NetCDF with a
  * LINEAR field over a 2-triangle mesh → ingest → interpolate → COGs.
  * Barycentric interpolation reproduces a linear field exactly, so every
  * in-mesh pixel of the written COG is checkable in closed form. Also
  * covers the real-time-axis filename contract and the fill-value
  * (dry-node) mask: a dry node NaNs exactly the pixels its triangles
  * cover, with no bleed into the wet side. */
class PipelineSpec extends SparkSpec {

  // 4 nodes on the unit square, 2 triangles, 2 timesteps.
  // field(t, x, y) = 10t + 2x + 3y  (linear -> barycentric-exact)
  private val xs = Array(0.0, 1.0, 0.0, 1.0)
  private val ys = Array(0.0, 0.0, 1.0, 1.0)
  private val tris1Based = Array(1, 2, 3, 2, 4, 3) // (n1,n2,n3) x2, 1-based
  private val T = 2
  private val Fill = -99999.0
  private def field(t: Int, x: Double, y: Double): Double = 10.0 * t + 2.0 * x + 3.0 * y

  /** `dryAt`: (ts, node) cells written as the fill sentinel. */
  private def writeNc(path: String, dryAt: Set[(Int, Int)] = Set.empty): Unit = {
    val N = 4; val M = 2
    def headerBytes(begins: Map[String, Int]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); val o = new DataOutputStream(bos)
      def name(s: String): Unit = {
        o.writeInt(s.length); o.writeBytes(s)
        (0 until (4 - s.length % 4) % 4).foreach(_ => o.writeByte(0))
      }
      def attrList(as: Seq[(String, Any)]): Unit =
        if (as.isEmpty) { o.writeInt(0); o.writeInt(0) }
        else {
          o.writeInt(NetCdf3.NcAttribute); o.writeInt(as.length)
          as.foreach {
            case (n, s: String) =>
              name(n); o.writeInt(NetCdf3.NcChar); o.writeInt(s.length)
              o.writeBytes(s)
              (0 until (4 - s.length % 4) % 4).foreach(_ => o.writeByte(0))
            case (n, d: Double) =>
              name(n); o.writeInt(NetCdf3.NcDouble); o.writeInt(1); o.writeDouble(d)
            case (n, v) => fail(s"unsupported attr fixture $n=$v")
          }
        }
      o.writeBytes("CDF"); o.writeByte(1)
      o.writeInt(T)
      o.writeInt(NetCdf3.NcDimension); o.writeInt(4)
      name("time"); o.writeInt(0)
      name("node"); o.writeInt(N)
      name("nele"); o.writeInt(M)
      name("nvertex"); o.writeInt(3)
      attrList(Nil)
      o.writeInt(NetCdf3.NcVariable); o.writeInt(5)
      def vr(nm: String, dimIds: Seq[Int], typ: Int, vsize: Int,
             attrs: Seq[(String, Any)] = Nil): Unit = {
        name(nm); o.writeInt(dimIds.length); dimIds.foreach(o.writeInt)
        attrList(attrs)
        o.writeInt(typ); o.writeInt(vsize); o.writeInt(begins.getOrElse(nm, 0))
      }
      vr("x", Seq(1), NetCdf3.NcDouble, N * 8)
      vr("y", Seq(1), NetCdf3.NcDouble, N * 8)
      vr("element", Seq(2, 3), NetCdf3.NcInt, M * 3 * 4)
      vr("time", Seq(0), NetCdf3.NcDouble, 8,
         attrs = Seq("units" -> "seconds since 2008-09-09 00:00:00 UTC"))
      vr("zeta", Seq(0, 1), NetCdf3.NcDouble, N * 8,
         attrs = Seq("_FillValue" -> Fill))
      o.flush(); bos.toByteArray
    }
    val hLen = headerBytes(Map.empty).length
    val begins = Map(
      "x" -> hLen, "y" -> (hLen + 32), "element" -> (hLen + 64),
      "time" -> (hLen + 64 + 24), "zeta" -> (hLen + 64 + 24 + 8))
    val bos = new ByteArrayOutputStream(); val o = new DataOutputStream(bos)
    o.write(headerBytes(begins))
    xs.foreach(o.writeDouble); ys.foreach(o.writeDouble)
    tris1Based.foreach(o.writeInt)
    (0 until T).foreach { t =>
      o.writeDouble(t * 3600.0)
      (0 until 4).foreach(n =>
        o.writeDouble(if (dryAt((t, n))) Fill else field(t, xs(n), ys(n))))
    }
    o.flush(); Files.write(Paths.get(path), bos.toByteArray)
  }

  test("fort.63.nc -> ingest -> interpolate -> COGs, linear field exact") {
    val dir = Files.createTempDirectory("graft_pipeline").toString
    writeNc(s"$dir/fort.63.nc")
    val g = 16
    val n = Pipeline.run(spark, s"$dir/fort.63.nc", dir, g)
    assert(n > 0, "raster cells written")

    val cogs = new java.io.File(s"$dir/cogs").listFiles()
      .filter(_.getName.endsWith(".tiff")).sortBy(_.getName)
    assert(cogs.length === T, "one COG per timestep")

    // the reference's filename contract: real decoded instants, matching
    // timeregex.properties (run/adcircTime2cogs.py:190-194)
    assert(cogs.map(_.getName).toSeq === Seq(
      "fort_63_zeta_20080909T000000Z.tiff", "fort_63_zeta_20080909T010000Z.tiff"))

    val spec = operators.Interp.GridSpec(0.0, 1.0, 0.0, 1.0, g)
    (0 until T).foreach { t =>
      val (w, h, vals, _, afterIfds) =
        plans.GeoTiff.decodeCog(Files.readAllBytes(cogs(t).toPath))
      assert(w === g && h === g && afterIfds)
      var checked = 0
      for (row <- 0 until g; c <- 0 until g) {
        val x = spec.minX + (c + 0.5) * spec.resX
        val y = spec.maxY - (row + 0.5) * spec.resY
        val v = vals(row * g + c)
        if (!v.isNaN) { // in-mesh pixel (NaN = absent/nodata)
          assert(math.abs(v - field(t, x, y)) < 1e-4,
                 s"ts=$t pixel($row,$c) at ($x,$y): $v vs ${field(t, x, y)}")
          checked += 1
        }
      }
      assert(checked > (g * g) / 2, s"most pixels in-mesh, got $checked")
    }

    for (f <- Seq("indexer.properties", "timeregex.properties", "datastore.properties"))
      assert(new java.io.File(s"$dir/$f").exists(), s"$f missing")
  }

  test("NetCDF-4/HDF5 (compressed) input runs the same pipeline to the same COGs") {
    // the production container: superblock v0, chunked+deflate zeta — the
    // file a real ASGS user would hand the pipeline; everything downstream
    // of the magic-byte dispatch is identical to the classic-CDF case
    val dir = Files.createTempDirectory("graft_pipeline_h5").toString
    val nodeXs = xs; val nodeYs = ys
    val c = Hdf5Fixture.Content(
      n = 4, m = 2, t = T, fill = Fill, dry = Set.empty, dryMax = Set.empty,
      units = "seconds since 2008-09-09 00:00:00 UTC",
      xAt = nodeXs(_), yAt = nodeYs(_),
      eleAt = Some(tris1Based(_)),
      fieldAt = Some((t, node) => field(t, nodeXs(node), nodeYs(node))),
      timeAt = t => t * 3600.0)
    Files.write(Paths.get(s"$dir/fort.63.nc"), Hdf5Fixture.writeV0(c, compress = true))

    val g = 16
    val n = Pipeline.run(spark, s"$dir/fort.63.nc", dir, g)
    assert(n > 0)
    val cogs = new java.io.File(s"$dir/cogs").listFiles()
      .filter(_.getName.endsWith(".tiff")).sortBy(_.getName)
    assert(cogs.map(_.getName).toSeq === Seq(
      "fort_63_zeta_20080909T000000Z.tiff", "fort_63_zeta_20080909T010000Z.tiff"))

    val spec = operators.Interp.GridSpec(0.0, 1.0, 0.0, 1.0, g)
    (0 until T).foreach { t =>
      val (w, h, vals, _, afterIfds) =
        plans.GeoTiff.decodeCog(Files.readAllBytes(cogs(t).toPath))
      assert(w === g && h === g && afterIfds)
      var checked = 0
      for (row <- 0 until g; col <- 0 until g) {
        val x = spec.minX + (col + 0.5) * spec.resX
        val y = spec.maxY - (row + 0.5) * spec.resY
        val v = vals(row * g + col)
        if (!v.isNaN) {
          assert(math.abs(v - field(t, x, y)) < 1e-4,
                 s"ts=$t pixel($row,$col) at ($x,$y): $v vs ${field(t, x, y)}")
          checked += 1
        }
      }
      assert(checked > (g * g) / 2)
    }
  }

  test("dry node (-99999 fill) masks exactly its triangles' pixels — no bleed") {
    val dir = Files.createTempDirectory("graft_pipeline_dry").toString
    // node 3 = (1,1), vertex of the UPPER triangle only, dry at ts=1
    writeNc(s"$dir/fort.63.nc", dryAt = Set((1, 3)))
    val g = 16
    Pipeline.run(spark, s"$dir/fort.63.nc", dir, g)
    val cogs = new java.io.File(s"$dir/cogs").listFiles()
      .filter(_.getName.endsWith(".tiff")).sortBy(_.getName)
    assert(cogs.length === T)

    val spec = operators.Interp.GridSpec(0.0, 1.0, 0.0, 1.0, g)
    (0 until T).foreach { t =>
      val (w, _, vals, _, _) = plans.GeoTiff.decodeCog(Files.readAllBytes(cogs(t).toPath))
      for (row <- 0 until g; c <- 0 until g) {
        val x = spec.minX + (c + 0.5) * spec.resX
        val y = spec.maxY - (row + 0.5) * spec.resY
        val v = vals(row * w + c)
        val lowerTri = x + y <= 1.0 // tri 0 = nodes (0,0),(1,0),(0,1); ties → lower ele_id
        if (t == 1 && !lowerTri)
          // every pixel of the dry node's triangle is nodata — the fill
          // value must NOT blend into a finite (wrong) water level
          assert(v.isNaN, s"ts=1 pixel($row,$c) at ($x,$y) touches the dry node: $v")
        else {
          // the wet side is untouched: exact linear field, no bleed
          assert(!v.isNaN && math.abs(v - field(t, x, y)) < 1e-4,
                 s"ts=$t pixel($row,$c) at ($x,$y): $v vs ${field(t, x, y)}")
        }
      }
    }
  }
}
