package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.file.{Files, Paths}
import graft.sources.{Ingest, NetCdf3}

/** Ingest-boundary test: a synthetic fort.63-shaped NetCDF-3 binary
  * (written here byte-by-byte against the public CDF-1 spec, NOT via the
  * reader under test) converted to the long-form Parquet layout — checks
  * the -1 connectivity shift, the record-striped series read, and value
  * fidelity. */
class IngestSpec extends SparkSpec {

  private val N = 12 // nodes
  private val M = 5  // elements
  private val T = 4  // records (timesteps)

  private def zeta(t: Int, n: Int): Double = t * 100.0 + n + 0.25

  /** CDF-1 writer: dims (time=unlimited, node, nele, nvertex), vars
    * x(node) y(node) double, element(nele,nvertex) int 1-BASED,
    * time(time) double, zeta(time,node) double. */
  private def writeFixture(path: String): Unit = {
    val elements1Based: Array[Int] =
      Array.tabulate(M * 3)(i => (i % N) + 1) // valid 1-based node ids

    def headerBytes(begins: Map[String, Int]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val o = new DataOutputStream(bos)
      def name(s: String): Unit = {
        o.writeInt(s.length); o.writeBytes(s)
        (0 until (4 - s.length % 4) % 4).foreach(_ => o.writeByte(0))
      }
      o.writeBytes("CDF"); o.writeByte(1)
      o.writeInt(T) // numrecs
      o.writeInt(NetCdf3.NcDimension); o.writeInt(4)
      name("time"); o.writeInt(0)
      name("node"); o.writeInt(N)
      name("nele"); o.writeInt(M)
      name("nvertex"); o.writeInt(3)
      o.writeInt(0); o.writeInt(0) // no global attrs
      o.writeInt(NetCdf3.NcVariable); o.writeInt(6)
      def vr(nm: String, dimIds: Seq[Int], typ: Int, vsize: Int): Unit = {
        name(nm); o.writeInt(dimIds.length); dimIds.foreach(o.writeInt)
        o.writeInt(0); o.writeInt(0) // no var attrs
        o.writeInt(typ); o.writeInt(vsize); o.writeInt(begins.getOrElse(nm, 0))
      }
      vr("x", Seq(1), NetCdf3.NcDouble, N * 8)
      vr("y", Seq(1), NetCdf3.NcDouble, N * 8)
      vr("element", Seq(2, 3), NetCdf3.NcInt, M * 3 * 4)
      vr("zeta_max", Seq(1), NetCdf3.NcDouble, N * 8)
      vr("time", Seq(0), NetCdf3.NcDouble, 8)
      vr("zeta", Seq(0, 1), NetCdf3.NcDouble, N * 8)
      o.flush(); bos.toByteArray
    }

    val hLen = headerBytes(Map.empty).length
    val begins = Map(
      "x" -> hLen, "y" -> (hLen + N * 8), "element" -> (hLen + 2 * N * 8),
      "zeta_max" -> (hLen + 2 * N * 8 + M * 3 * 4),
      "time" -> (hLen + 3 * N * 8 + M * 3 * 4),
      "zeta" -> (hLen + 3 * N * 8 + M * 3 * 4 + 8))

    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.write(headerBytes(begins))
    (0 until N).foreach(i => o.writeDouble(i * 0.5))       // x
    (0 until N).foreach(i => o.writeDouble(40.0 + i * 0.25)) // y
    elements1Based.foreach(o.writeInt)                      // element (1-based)
    (0 until N).foreach(n => o.writeDouble(900.0 + n))      // zeta_max (fixed, 1-D)
    (0 until T).foreach { t =>                              // records: time, zeta
      o.writeDouble(t * 3600.0)
      (0 until N).foreach(n => o.writeDouble(zeta(t, n)))
    }
    o.flush()
    Files.write(Paths.get(path), bos.toByteArray)
  }

  test("NetCDF-3 ingest: header, -1 shift, record-striped series, value fidelity") {
    val dir = Files.createTempDirectory("graft_ingest").toString
    val nc = s"$dir/fort63.nc"
    writeFixture(nc)

    Ingest.fort63ToParquet(spark, nc, dir)

    val nodes = Ingest.nodes(spark, dir).collect().sortBy(_.getAs[Long]("node_id"))
    assert(nodes.length === N)
    assert(nodes(3).getAs[Double]("lon") === 1.5)
    assert(nodes(3).getAs[Double]("lat") === 40.75)

    val eles = Ingest.elements(spark, dir).collect().sortBy(_.getAs[Long]("ele_id"))
    assert(eles.length === M)
    // 1-based in the file, 0-based after ingest
    val all = eles.flatMap(r => Seq(r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("n3")))
    assert(all.min === 0L && all.max === (N - 1).toLong)
    assert(eles(0).getAs[Long]("n1") === 0L) // file had 1

    val series = Ingest.series(spark, dir).collect()
    assert(series.length === T * N)
    series.foreach { r =>
      assert(r.getAs[Double]("value") ===
        zeta(r.getAs[Long]("ts").toInt, r.getAs[Long]("node_id").toInt))
    }
  }

  test("1-D/2-D variable dispatch: record var -> long-form, fixed var -> static nodal") {
    val dir = Files.createTempDirectory("graft_ingest3").toString
    val nc = s"$dir/fort63.nc"
    writeFixture(nc)
    // 2-D (time, node): dispatches to the record-striped long form
    assert(Ingest.varToParquet(spark, nc, dir, "zeta") === "series")
    assert(Ingest.series(spark, dir).count() === (T * N).toLong)
    // 1-D max-variable (node only): dispatches to a static nodal snapshot
    assert(Ingest.varToParquet(spark, nc, dir, "zeta_max") === "zeta_max")
    val mx = spark.read.parquet(s"$dir/zeta_max").collect().sortBy(_.getAs[Long]("node_id"))
    assert(mx.length === N)
    assert(mx(7).getAs[Double]("value") === 907.0)
  }

  test("ingested layout drives the interpolation join shape end-to-end") {
    val dir = Files.createTempDirectory("graft_ingest2").toString
    writeFixture(s"$dir/fort63.nc")
    Ingest.fort63ToParquet(spark, s"$dir/fort63.nc", dir)
    // the operators' contract: join series to elements through node ids
    val joined = Ingest.series(spark, dir)
      .join(Ingest.elements(spark, dir),
            org.apache.spark.sql.functions.col("node_id") === org.apache.spark.sql.functions.col("n1"))
    assert(joined.count() > 0)
  }

  test("CDF-2 (64-bit offset) variant parses identically") {
    // same fixture, version byte 2 + 8-byte begin offsets
    val dir = Files.createTempDirectory("graft_ingest_v2").toString
    val nc = s"$dir/fort63_v2.nc"
    val N = 4; val M = 1; val T2 = 2
    def headerBytes(begins: Map[String, Long]): Array[Byte] = {
      val bos = new ByteArrayOutputStream(); val o = new DataOutputStream(bos)
      def name(s: String): Unit = {
        o.writeInt(s.length); o.writeBytes(s)
        (0 until (4 - s.length % 4) % 4).foreach(_ => o.writeByte(0))
      }
      o.writeBytes("CDF"); o.writeByte(2) // CDF-2
      o.writeInt(T2)
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
        o.writeLong(begins.getOrElse(nm, 0L)) // 8-byte begin in CDF-2
      }
      vr("x", Seq(1), NetCdf3.NcDouble, N * 8)
      vr("y", Seq(1), NetCdf3.NcDouble, N * 8)
      vr("element", Seq(2, 3), NetCdf3.NcInt, M * 3 * 4)
      vr("time", Seq(0), NetCdf3.NcDouble, 8)
      vr("zeta", Seq(0, 1), NetCdf3.NcDouble, N * 8)
      o.flush(); bos.toByteArray
    }
    val hLen = headerBytes(Map.empty).length.toLong
    val begins = Map(
      "x" -> hLen, "y" -> (hLen + 32), "element" -> (hLen + 64),
      "time" -> (hLen + 64 + 12), "zeta" -> (hLen + 64 + 12 + 8))
    val bos = new ByteArrayOutputStream(); val o = new DataOutputStream(bos)
    o.write(headerBytes(begins))
    (0 until N).foreach(i => o.writeDouble(i * 1.0))
    (0 until N).foreach(i => o.writeDouble(i * 2.0))
    Seq(1, 2, 3).foreach(o.writeInt) // one triangle, 1-based
    (0 until T2).foreach { t =>
      o.writeDouble(t * 60.0)
      (0 until N).foreach(n => o.writeDouble(t * 10.0 + n))
    }
    o.flush(); Files.write(Paths.get(nc), bos.toByteArray)

    Ingest.fort63ToParquet(spark, nc, dir)
    assert(Ingest.nodes(spark, dir).count() === N)
    val ele = Ingest.elements(spark, dir).collect()
    assert(ele.length === 1 && ele(0).getAs[Long]("n1") === 0L)
    val sr = Ingest.series(spark, dir).collect()
    assert(sr.length === T2 * N)
    assert(sr.forall(r => r.getAs[Double]("value") ===
      r.getAs[Long]("ts") * 10.0 + r.getAs[Long]("node_id")))
  }
}
