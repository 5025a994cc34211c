package graft

import java.nio.file.Files
import graft.plans.RasterSink

/** End-to-end output-stage test: raster partitioned by timestep + sidecar
  * metadata, the relational equivalent of the reference's COG-per-timestep
  * plus ImageMosaic properties contract. */
class RasterSinkSpec extends SparkSpec {

  test("raster sink writes one partition directory per timestep + sidecars") {
    val out = Files.createTempDirectory("graft_raster").toString
    RasterSink.run(spark, out)

    val rasterDir = new java.io.File(s"$out/raster")
    val tsDirs = rasterDir.listFiles().filter(_.getName.startsWith("ts=")).map(_.getName).sorted
    assert(tsDirs.toSeq === (0 until graft.operators.Interp.T).map(t => s"ts=$t"))

    // read back one timestep: partition pruning path
    val t1 = spark.read.parquet(s"$out/raster").filter(org.apache.spark.sql.functions.col("ts") === 1)
    assert(t1.count() === graft.operators.Interp.G.toLong * graft.operators.Interp.G)

    for (f <- Seq("indexer.properties", "timeregex.properties", "datastore.properties"))
      assert(new java.io.File(s"$out/$f").exists(), s"$f missing")
    val timeregex = Files.readString(java.nio.file.Paths.get(s"$out/timeregex.properties"))
    assert(timeregex.contains("[0-9]{8}T[0-9]{6}"))
  }

  test("GeoTiff encode/decode round-trips header, dims, and strip data") {
    val w = 37; val h = 211 // force multiple ~64KiB strips and a short tail strip
    val vals = Array.tabulate(w * h)(i => (i * 0.25f) - 3f)
    val bytes = graft.plans.GeoTiff.encode(w, h, vals, -98.0, 45.0, 0.005)
    // TIFF magic: little-endian "II", 42
    assert(bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte && bytes(2) == 42.toByte)
    val (dw, dh, dvals) = graft.plans.GeoTiff.decode(bytes)
    assert(dw === w); assert(dh === h)
    assert(dvals.toSeq === vals.toSeq)
  }

  test("GeoTiff carries the EPSG:4326 GeoKey and pixel scale") {
    val bytes = graft.plans.GeoTiff.encode(4, 4, new Array[Float](16), -98.0, 45.0, 0.005)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.position(buf.getInt(4))
    val n = buf.getShort()
    val tags = (0 until n).map { i =>
      val base = buf.getInt(4) + 2 + i * 12
      (buf.getShort(base) & 0xffff, buf.getShort(base + 2).toInt, buf.getInt(base + 4), buf.getInt(base + 8))
    }
    assert(tags.map(_._1).toSeq === tags.map(_._1).sorted, "IFD tags must be ascending")
    val geo = tags.find(_._1 == 34735).get
    val keys = (0 until geo._3).map(i => buf.getShort(geo._4 + 2 * i) & 0xffff)
    // key triple (2048, 0, 1, 4326) = GeographicTypeGeoKey -> EPSG:4326
    assert(keys.sliding(4, 4).exists(g => g.headOption.contains(2048) && g.lift(3).contains(4326)))
    val scale = tags.find(_._1 == 33550).get
    assert(buf.getDouble(scale._4) === 0.005)
  }

  test("COG encode: tiled base round-trips, overview chained, data after IFDs") {
    val w = 70; val h = 90 // 32px tiles -> 3x3 base tile grid with padding
    val vals = Array.tabulate(w * h)(i => i * 0.5f - 100f)
    val bytes = graft.plans.GeoTiff.encodeCog(w, h, vals, -98.0, 45.0, 0.005, tile = 32)
    val (dw, dh, dvals, (ovW, ovH), dataAfterIfds) = graft.plans.GeoTiff.decodeCog(bytes)
    assert(dw === w && dh === h)
    assert(dvals.toSeq === vals.toSeq, "tiled base image must round-trip exactly")
    assert(ovW === 35 && ovH === 45, "2x overview dims")
    assert(dataAfterIfds, "COG ordering: all pixel data after the IFDs")
  }

  test("COG overview pyramid: levels halve until one tile covers the image") {
    // 300x200, 32px tiles: 150x100 -> 75x50 -> 38x25 -> 19x13 (fits a tile)
    val w = 300; val h = 200
    val vals = Array.tabulate(w * h)(i => i.toFloat)
    val bytes = graft.plans.GeoTiff.encodeCog(w, h, vals, 0, 0, 1.0, tile = 32)
    assert(graft.plans.GeoTiff.cogOverviewCount(bytes) === 4)
    val (dw, dh, dvals, (ovW, ovH), afterIfds) = graft.plans.GeoTiff.decodeCog(bytes)
    assert(dw === w && dh === h && ovW === 150 && ovH === 100 && afterIfds)
    assert(dvals.toSeq === vals.toSeq, "pyramid must not disturb the base image")
  }

  test("COG deflate compression: exact round-trip, smaller bytes, NaN padding intact") {
    val w = 70; val h = 90
    val vals = Array.tabulate(w * h)(i => if (i % 11 == 0) Float.NaN else i * 0.5f - 100f)
    val plain = graft.plans.GeoTiff.encodeCog(w, h, vals, -98.0, 45.0, 0.005, tile = 32)
    val packed = graft.plans.GeoTiff.encodeCog(w, h, vals, -98.0, 45.0, 0.005, tile = 32,
      compress = true)
    assert(packed.length < plain.length,
      s"deflate must shrink the file (${packed.length} vs ${plain.length})")
    val (dw, dh, dvals, (ovW, ovH), dataAfterIfds) = graft.plans.GeoTiff.decodeCog(packed)
    assert(dw === w && dh === h && ovW === 35 && ovH === 45 && dataAfterIfds)
    // float-bit equality incl. NaN cells
    assert(dvals.map(java.lang.Float.floatToIntBits).toSeq
             === vals.map(java.lang.Float.floatToIntBits).toSeq)
  }

  test("writeGeoTiffs cog=true emits per-timestep COGs matching the raster") {
    val out = Files.createTempDirectory("graft_cog").toString
    RasterSink.writeGeoTiffs(spark, out, cog = true)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".tiff")).sortBy(_.getName)
    assert(files.length === graft.operators.Interp.T)
    val g = graft.operators.Interp.G
    val (w, h, vals, _, afterIfds) =
      graft.plans.GeoTiff.decodeCog(Files.readAllBytes(files(2).toPath))
    assert(w === g && h === g && afterIfds)
    val expected = graft.operators.Interp.qInterpBarycentric(spark, "")
      .filter(org.apache.spark.sql.functions.col("ts") === 2)
      .collect().map(r => (r.getAs[Int]("grow") * g + r.getAs[Int]("gcol"),
                           (r.getAs[Long]("zi4") / 10000.0).toFloat)).toMap
    assert(vals.zipWithIndex.forall { case (v, i) => expected(i) === v })
  }

  test("writeGeoTiffs emits one valid GeoTIFF per timestep with the raster's values") {
    val out = Files.createTempDirectory("graft_tiff").toString
    RasterSink.writeGeoTiffs(spark, out)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".tiff")).sortBy(_.getName)
    assert(files.length === graft.operators.Interp.T)
    val g = graft.operators.Interp.G
    // cross-check ts=1 against the relational raster
    val bytes = Files.readAllBytes(files(1).toPath)
    val (w, h, vals) = graft.plans.GeoTiff.decode(bytes)
    assert(w === g && h === g)
    val expected = graft.operators.Interp.qInterpBarycentric(spark, "")
      .filter(org.apache.spark.sql.functions.col("ts") === 1)
      .collect().map(r => (r.getAs[Int]("grow") * g + r.getAs[Int]("gcol"),
                           (r.getAs[Long]("zi4") / 10000.0).toFloat)).toMap
    assert(vals.zipWithIndex.forall { case (v, i) => expected(i) === v })
  }

  test("readGeoTiffs round-trips both COG and striped sinks to the raster") {
    val out = Files.createTempDirectory("graft_rt").toString
    RasterSink.writeGeoTiffs(spark, s"$out/cog", cog = true)
    RasterSink.writeGeoTiffs(spark, s"$out/strip", cog = false)
    val g = graft.operators.Interp.G
    val expected = graft.operators.Interp.qInterpBarycentric(spark, "")
      .collect()
      .map(r => ((r.getAs[Long]("ts"), r.getAs[Int]("grow"), r.getAs[Int]("gcol")),
                 (r.getAs[Long]("zi4") / 10000.0).toFloat.toDouble)).toMap
    for (sub <- Seq("cog", "strip")) {
      val back = RasterSink.readGeoTiffs(spark, s"$out/$sub").collect()
      assert(back.length === graft.operators.Interp.T * g * g, s"$sub cell count")
      back.foreach { r =>
        val key = (r.getAs[Long]("ts"), r.getAs[Int]("grow"), r.getAs[Int]("gcol"))
        val v = r.getAs[Double]("value")
        expected.get(key) match {
          case Some(e) => assert(v === e, s"$sub $key")
          case None => assert(v.isNaN, s"$sub $key should be NaN nodata")
        }
      }
    }
  }

  test("reprojection stage is a narrow transform preserving node count") {
    val proj = RasterSink.reprojectNodes(spark)
    assert(proj.count() === graft.operators.Interp.K.toLong * graft.operators.Interp.K)
    // Mercator x is linear in lon; y is monotonic in lat
    val rows = proj.orderBy("node_id").limit(graft.operators.Interp.K).collect()
    val mxs = rows.map(_.getAs[Double]("mx"))
    assert(mxs.zip(mxs.tail).forall { case (a, b) => a < b })
  }

  test("existence-gated source: optional missing table is an empty relation") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("a", LongType)))
    val missing = Tables.tableOrEmpty(spark, sf, "swan_not_there", schema)
    assert(missing.count() === 0)
    assert(missing.schema === schema)
    val present = Tables.tableOrEmpty(spark, sf, "region",
      StructType(Seq(StructField("r_regionkey", IntegerType), StructField("r_name", StringType))))
    assert(present.count() === 5)
    // hard path: required source still throws
    intercept[org.apache.spark.sql.AnalysisException] {
      Tables.table(spark, sf, "swan_not_there").collect()
    }
  }

  test("mosaic index derives the reference's compact-ISO tiff names") {
    val idx = RasterSink.mosaicIndex(spark, "fort_63_zeta").collect()
    assert(idx.length === graft.operators.Interp.T)
    assert(idx.forall(_.getAs[String]("fname").matches("fort_63_zeta_[0-9]{8}T[0-9]{6}Z\\.tiff")))
  }

  test("mosaic index from an ingested time axis carries the REAL instants") {
    import spark.implicits._
    // 2008-09-09T00:00:00Z epoch, half-hourly records — as Ingest writes it
    val times = Seq(
      (0L, 0.0, Some(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1220918400L)))),
      (1L, 1800.0, Some(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1220920200L)))),
      (2L, 3600.0, None)) // undecodable instant → excluded, not fabricated
      .toDF("ts", "t_raw", "t_utc")
    val idx = RasterSink.mosaicIndexFromTimes(times, "fort_63_zeta").collect()
    assert(idx.map(_.getAs[String]("fname")).toSeq === Seq(
      "fort_63_zeta_20080909T000000Z.tiff", "fort_63_zeta_20080909T003000Z.tiff"))

    // a library caller with a NON-UTC session must get the same UTC names
    // (the COGs on disk were named via the UTC-pinned Ingest.timeLabels)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val idxNy = RasterSink.mosaicIndexFromTimes(times, "fort_63_zeta").collect()
      assert(idxNy.map(_.getAs[String]("fname")).toSeq === Seq(
        "fort_63_zeta_20080909T000000Z.tiff", "fort_63_zeta_20080909T003000Z.tiff"))
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("COG GDAL_NODATA is 'nan' and the overview skips NaN, not zeta==0") {
    // 4x4 grid where 0.0 is REAL data (zeta at datum) and NaN is nodata:
    //   block(0,0) = [NaN, 0, 5, 6]   -> overview 0.0 (NOT a hole: the old
    //                                    0-sentinel rule returned NaN here)
    //   block(0,1) = all NaN          -> overview NaN
    //   block(1,0) = [7, 8, 9, 10]    -> overview 7
    //   block(1,1) = all real 0.0     -> overview 0.0
    val w = 4; val h = 4
    val vals = Array[Float](
      Float.NaN, 0f,  Float.NaN, Float.NaN,
      5f,        6f,  Float.NaN, Float.NaN,
      7f,        8f,  0f,        0f,
      9f,        10f, 0f,        0f)
    val bytes = graft.plans.GeoTiff.encodeCog(w, h, vals, 0, 0, 1.0, tile = 16)
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // GDAL_NODATA (42113) in IFD0 must be ASCII "nan"
    val ifd0 = buf.getInt(4)
    buf.position(ifd0)
    val n0 = buf.getShort()
    val entries0 = (0 until n0).map { i =>
      val base = ifd0 + 2 + i * 12
      (buf.getShort(base) & 0xffff) -> base
    }.toMap
    val vb = entries0(42113) + 8
    assert(new String(Array(bytes(vb), bytes(vb + 1), bytes(vb + 2))) === "nan")
    // base image round-trips including NaN cells
    val (_, _, base, (ovW, ovH), _) = graft.plans.GeoTiff.decodeCog(bytes)
    assert(ovW === 2 && ovH === 2)
    assert(base.zip(vals).forall { case (a, b) => (a.isNaN && b.isNaN) || a === b })
    // decode the overview tile straight from IFD1 (single 16x16 tile)
    val ifd1 = buf.getInt(ifd0 + 2 + n0 * 12)
    buf.position(ifd1)
    val n1 = buf.getShort()
    val entries1 = (0 until n1).map { i =>
      val base1 = ifd1 + 2 + i * 12
      (buf.getShort(base1) & 0xffff) -> buf.getInt(base1 + 8)
    }.toMap
    val tileAt = entries1(324) // TileOffsets, count 1 → inline offset
    def ov(oy: Int, ox: Int): Float = buf.getFloat(tileAt + (oy * 16 + ox) * 4)
    assert(ov(0, 0) === 0f, "NaN-then-real-0 block keeps the real 0")
    assert(ov(0, 1).isNaN, "all-NaN block stays nodata")
    assert(ov(1, 0) === 7f)
    assert(ov(1, 1) === 0f, "all-zero block is real data, not a hole")
  }
}
