package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.file.{Files, Paths}
import graft.sources.NetCdf3

/** End-to-end pipeline proof: a synthetic fort.63-shaped NetCDF with a
  * LINEAR field over a 2-triangle mesh → ingest → interpolate → COGs.
  * Barycentric interpolation reproduces a linear field exactly, so every
  * in-mesh pixel of the written COG is checkable in closed form. */
class PipelineSpec extends SparkSpec {

  // 4 nodes on the unit square, 2 triangles, 2 timesteps.
  // field(t, x, y) = 10t + 2x + 3y  (linear -> barycentric-exact)
  private val xs = Array(0.0, 1.0, 0.0, 1.0)
  private val ys = Array(0.0, 0.0, 1.0, 1.0)
  private val tris1Based = Array(1, 2, 3, 2, 4, 3) // (n1,n2,n3) x2, 1-based
  private val T = 2
  private def field(t: Int, x: Double, y: Double): Double = 10.0 * t + 2.0 * x + 3.0 * y

  private def writeNc(path: String): Unit = {
    val N = 4; val M = 2
    def headerBytes(begins: Map[String, Int]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); val o = new DataOutputStream(bos)
      def name(s: String): Unit = {
        o.writeInt(s.length); o.writeBytes(s)
        (0 until (4 - s.length % 4) % 4).foreach(_ => o.writeByte(0))
      }
      o.writeBytes("CDF"); o.writeByte(1)
      o.writeInt(T)
      o.writeInt(NetCdf3.NcDimension); o.writeInt(4)
      name("time"); o.writeInt(0)
      name("node"); o.writeInt(N)
      name("nele"); o.writeInt(M)
      name("nvertex"); o.writeInt(3)
      o.writeInt(0); o.writeInt(0)
      o.writeInt(NetCdf3.NcVariable); o.writeInt(5)
      def vr(nm: String, dimIds: Seq[Int], typ: Int, vsize: Int): Unit = {
        name(nm); o.writeInt(dimIds.length); dimIds.foreach(o.writeInt)
        o.writeInt(0); o.writeInt(0); o.writeInt(typ); o.writeInt(vsize)
        o.writeInt(begins.getOrElse(nm, 0))
      }
      vr("x", Seq(1), NetCdf3.NcDouble, N * 8)
      vr("y", Seq(1), NetCdf3.NcDouble, N * 8)
      vr("element", Seq(2, 3), NetCdf3.NcInt, M * 3 * 4)
      vr("time", Seq(0), NetCdf3.NcDouble, 8)
      vr("zeta", Seq(0, 1), NetCdf3.NcDouble, N * 8)
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
      (0 until 4).foreach(n => o.writeDouble(field(t, xs(n), ys(n))))
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
        if (v != 0f) { // in-mesh pixel (0 = absent/nodata in the stub)
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
}
