package graft

import java.nio.file.{Files, Paths}
import graft.sources.{Hdf5, Ingest, NcFile, RangeReader}

/** NetCDF-4/HDF5 ingest boundary: the [[Hdf5Fixture]] files are written
  * byte-by-byte against the public HDF5 spec (not via the reader), then
  * read back through [[graft.sources.Hdf5]] / [[NcFile]] / [[Ingest]].
  * Covers: superblock v0 + old-style groups (netcdf-c's layout), chunked
  * record variables with edge chunks, big-endian fixed-point data,
  * `_FillValue` → null, CF time decoding, the full fort63 ingest parity
  * with the classic-CDF path, and the modern superblock-v2 / OHDR /
  * compact-links / compact-layout container. */
class Hdf5Spec extends SparkSpec {

  private val c = Hdf5Fixture.Content(
    n = 12, m = 5, t = 4, fill = -99999.0,
    dry = Set((1, 2), (3, 7)), dryMax = Set(5),
    units = "seconds since 2008-09-09 00:00:00 UTC")

  private def v0Path: String = {
    val dir = Files.createTempDirectory("graft_h5").toString
    val p = s"$dir/fort63_v0.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeV0(c))
    p
  }

  test("superblock v0: datasets, shapes, record detection, attributes") {
    val nc = NcFile.open(v0Path)
    try {
      assert(nc.varNames.toSet === Set("x", "y", "element", "zeta_max", "time", "zeta"))
      assert(nc.isRecordVar("zeta"))
      assert(nc.isRecordVar("time"))
      assert(!nc.isRecordVar("element"), "rank-2 element must NOT be a record var")
      assert(!nc.isRecordVar("x"))
      assert(nc.numRecs === c.t)
      assert(nc.fillValue("zeta") === Some(c.fill))
      assert(nc.fillValue("zeta_max") === Some(c.fill))
      assert(nc.fillValue("x") === None)
      assert(nc.strAttr("time", "units") === Some(c.units))
    } finally nc.close()
  }

  test("contiguous doubles and big-endian int32 read back exactly") {
    val nc = NcFile.open(v0Path)
    try {
      val xs = nc.readFixed("x"); val ys = nc.readFixed("y")
      (0 until c.n).foreach { i =>
        assert(xs(i) === c.x(i)); assert(ys(i) === c.y(i))
      }
      val ele = nc.readFixed("element") // int32 BIG-endian in the fixture
      (0 until c.m * 3).foreach(i => assert(ele(i) === c.ele(i).toDouble))
    } finally nc.close()
  }

  test("chunked record reads assemble rows across column chunks, edge chunks clipped") {
    // zeta shape (4,12), chunks (2,5): a row spans 3 column chunks, the
    // last of width 2 — exercises clipping of the full-size edge chunk
    val nc = NcFile.open(v0Path)
    try {
      (0 until c.t).foreach { t =>
        val row = nc.readRecord("zeta", t)
        assert(row.length === c.n)
        (0 until c.n).foreach(nid => assert(row(nid) === c.zeta(t, nid),
          s"zeta($t,$nid)"))
      }
      // 1-D chunked: time chunks of 3 over length 4
      (0 until c.t).foreach { t =>
        assert(nc.readRecord("time", t)(0) === c.time(t))
      }
    } finally nc.close()
  }

  test("readAll on a chunked 2-D dataset scatters every chunk correctly") {
    val r = RangeReader.open(v0Path)
    val f = Hdf5.open(r)
    try {
      val ds = f.datasets("zeta")
      val all = f.readAll(ds)
      assert(all.length === c.t * c.n)
      for (t <- 0 until c.t; nid <- 0 until c.n)
        assert(all(t * c.n + nid) === c.zeta(t, nid))
    } finally f.close()
  }

  test("fort63ToParquet over HDF5: same layout, mask, and time labels as classic CDF") {
    val outDir = Files.createTempDirectory("graft_h5_ingest").toString
    Ingest.fort63ToParquet(spark, v0Path, outDir)
    import org.apache.spark.sql.functions.col

    assert(Ingest.nodes(spark, outDir).count() === c.n.toLong)
    val ele = Ingest.elements(spark, outDir).collect()
    assert(ele.length === c.m)
    ele.foreach { r => // 1-based in the file → 0-based after ingest
      val e = r.getAs[Long]("ele_id").toInt
      assert(r.getAs[Long]("n1") === (c.ele(3 * e) - 1).toLong)
    }

    val series = Ingest.series(spark, outDir)
    assert(series.count() === (c.t * c.n).toLong)
    assert(series.filter(col("value") === c.fill).count() === 0,
      "the fill sentinel must never surface")
    val nulls = series.filter(col("value").isNull).collect()
      .map(r => (r.getAs[Long]("ts").toInt, r.getAs[Long]("node_id").toInt)).toSet
    assert(nulls === c.dry)
    series.filter(col("value").isNotNull).collect().foreach { r =>
      assert(r.getAs[Double]("value") ===
        c.zeta(r.getAs[Long]("ts").toInt, r.getAs[Long]("node_id").toInt))
    }

    // CF time decoding: epoch 2008-09-09T00:00:00Z = 1220918400
    val labels = Ingest.timeLabels(spark, outDir)
    assert(labels(0L) === "20080909T000000")
    assert(labels(3L) === "20080909T030000")
  }

  test("varToParquet dispatch on HDF5: fixed var with fill masks to null") {
    val outDir = Files.createTempDirectory("graft_h5_var").toString
    val p = v0Path
    assert(Ingest.varToParquet(spark, p, outDir, "zeta_max") === "zeta_max")
    import org.apache.spark.sql.functions.col
    val mx = spark.read.parquet(s"$outDir/zeta_max")
    assert(mx.count() === c.n.toLong)
    assert(mx.filter(col("value").isNull).count() === c.dryMax.size.toLong)
    assert(mx.filter(col("value") === c.fill).count() === 0)
    assert(Ingest.varToParquet(spark, p, outDir, "zeta") === "series")
  }

  test("deflate+shuffle and fletcher32 filtered chunks decode exactly") {
    // the `nccopy -d4 -s` shape: zeta chunks stored shuffle→deflate, time
    // chunks with a fletcher32 trailer — the compressed form real
    // NetCDF-4 producers emit
    val dir = Files.createTempDirectory("graft_h5z").toString
    val p = s"$dir/fort63_z.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeV0(c, compress = true))
    // compression actually happened (file materially smaller than raw)
    val plain = Hdf5Fixture.writeV0(c).length
    assert(Files.size(Paths.get(p)) < plain,
      s"compressed fixture (${Files.size(Paths.get(p))}) not smaller than plain ($plain)")
    val nc = NcFile.open(p)
    try {
      assert(nc.numRecs === c.t)
      (0 until c.t).foreach { t =>
        val row = nc.readRecord("zeta", t)
        (0 until c.n).foreach(nid => assert(row(nid) === c.zeta(t, nid), s"zeta($t,$nid)"))
        assert(nc.readRecord("time", t)(0) === c.time(t))
      }
    } finally nc.close()
    // and the full ingest path is identical to the uncompressed file
    val outDir = Files.createTempDirectory("graft_h5z_ingest").toString
    Ingest.fort63ToParquet(spark, p, outDir)
    import org.apache.spark.sql.functions.col
    val series = Ingest.series(spark, outDir)
    assert(series.count() === (c.t * c.n).toLong)
    assert(series.filter(col("value").isNull).count() === c.dry.size.toLong)
    assert(Ingest.timeLabels(spark, outDir)(3L) === "20080909T030000")
  }

  test("multi-level v1 chunk B-tree (default netcdf-c shape past ~300 chunks)") {
    // t=20, chunk (2,5): zeta has 30 chunks; leafSize=4 splits them into
    // 8 leaves under a level-1 internal node — the tree any long
    // DEFAULT-format (non-latest) record variable grows
    val cb = c.copy(t = 20, dry = Set((1, 2), (17, 11)))
    val dir = Files.createTempDirectory("graft_h5v1ml").toString
    val p = s"$dir/fort63_mlbtree.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeV0(cb, v1LeafSize = 4))
    val nc = NcFile.open(p)
    try {
      assert(nc.numRecs === 20)
      (0 until 20).foreach { t =>
        val row = nc.readRecord("zeta", t)
        (0 until cb.n).foreach(nid => assert(row(nid) === cb.zeta(t, nid), s"zeta($t,$nid)"))
      }
    } finally nc.close()
  }

  test("latest format: superblock v2, dense group, all five v4 chunk indexes") {
    // H5Pset_libver_bounds(latest) shape: OHDR v2 + layout v4 with
    // single-chunk (x), implicit (y), fixed-array (element), v2-B-tree
    // (zeta_max, fletcher32), and extensible-array (time plain; zeta
    // shuffle+deflate) indexes, under a DENSE root group (fractal heap +
    // name v2 B-tree)
    val dir = Files.createTempDirectory("graft_h5latest").toString
    val p = s"$dir/fort63_latest.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeLatest(c))
    val nc = NcFile.open(p)
    try {
      assert(nc.varNames.toSet === Set("element", "time", "x", "y", "zeta", "zeta_max"))
      assert(nc.numRecs === c.t)
      assert(nc.isRecordVar("zeta") && nc.isRecordVar("time"))
      assert(!nc.isRecordVar("x"))
      assert(nc.fillValue("zeta") === Some(c.fill))
      assert(nc.strAttr("time", "units") === Some(c.units))
      // single chunk
      assert(nc.readFixed("x").toSeq === (0 until c.n).map(c.x))
      // implicit
      assert(nc.readFixed("y").toSeq === (0 until c.n).map(c.y))
      // fixed array
      assert(nc.readFixed("element").toSeq === (0 until c.m * 3).map(i => c.ele(i).toDouble))
      // v2 B-tree + fletcher32
      assert(nc.readFixed("zeta_max").toSeq === (0 until c.n).map(c.zetaMax))
      // extensible array: direct slot + data-block spill
      (0 until c.t).foreach { t =>
        assert(nc.readRecord("time", t)(0) === c.time(t), s"time($t)")
        val row = nc.readRecord("zeta", t)
        (0 until c.n).foreach(nid => assert(row(nid) === c.zeta(t, nid), s"zeta($t,$nid)"))
      }
    } finally nc.close()
    // and the whole ingest path over the latest-format container
    val outDir = Files.createTempDirectory("graft_h5latest_ingest").toString
    Ingest.fort63ToParquet(spark, p, outDir)
    import org.apache.spark.sql.functions.col
    val series = Ingest.series(spark, outDir)
    assert(series.count() === (c.t * c.n).toLong)
    assert(series.filter(col("value").isNull).count() === c.dry.size.toLong)
    assert(Ingest.timeLabels(spark, outDir)(3L) === "20080909T030000")
  }

  test("latest format at forecast cadence: EA secondary-block spill reads back") {
    // 40 timesteps -> zeta has 60 chunks: past the index block's direct +
    // resident coverage (2 + 2+4+8+16 = 32 at these parameters), so the
    // walk must go through an EASB secondary block — the shape a real
    // O(100)-timestep forecast file lands in
    val c40 = c.copy(t = 40, dry = Set((1, 2), (37, 7)))
    val dir = Files.createTempDirectory("graft_h5latest40").toString
    val p = s"$dir/fort63_latest40.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeLatest(c40))
    val nc = NcFile.open(p)
    try {
      assert(nc.numRecs === 40)
      (0 until 40 by 7).foreach { t =>
        assert(nc.readRecord("time", t)(0) === c40.time(t), s"time($t)")
        val row = nc.readRecord("zeta", t)
        (0 until c40.n).foreach(nid => assert(row(nid) === c40.zeta(t, nid), s"zeta($t,$nid)"))
      }
      // the last record lives deepest in the secondary-block range
      val last = nc.readRecord("zeta", 39)
      (0 until c40.n).foreach(nid => assert(last(nid) === c40.zeta(39, nid)))
    } finally nc.close()
  }

  test("paged fixed-array data block: pages + partial tail read back exactly") {
    // pageBits=1 -> 2-element pages; element has 3 chunks -> 2 pages with
    // a partial tail — the layout a big static var hits past 2^10 chunks
    val dir = Files.createTempDirectory("graft_h5fapage").toString
    val p = s"$dir/fa_paged.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeLatest(c, faPageBits = 1))
    val nc = NcFile.open(p)
    try assert(nc.readFixed("element").toSeq === (0 until c.m * 3).map(i => c.ele(i).toDouble))
    finally nc.close()
  }

  test("paged extensible-array data blocks: multi-page spill reads back exactly") {
    // pageBits=3 -> 8-element pages; t=210 drives time (70 chunks) and
    // zeta (315 chunks) deep into EASB secondary blocks whose data
    // blocks page (dblkNelmts 16/32 > 8) — the layout an unlimited-dim
    // variable reaches past ~1e5 chunks at libhdf5 defaults. time's
    // second page holds no written element, so the EASB page-init bitmap
    // must gate it (the fixture fills uninit pages with zero entries a
    // bitmap-blind reader would misread as chunks at file offset 0).
    val cp = c.copy(t = 210, dry = Set((1, 2), (77, 7), (209, 11)))
    val dir = Files.createTempDirectory("graft_h5eapage").toString
    val p = s"$dir/ea_paged.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeLatest(cp, eaPageBits = 3))
    val nc = NcFile.open(p)
    try {
      assert(nc.numRecs === 210)
      (0 until 210 by 13).foreach { t =>
        assert(nc.readRecord("time", t)(0) === cp.time(t), s"time($t)")
        val row = nc.readRecord("zeta", t)
        (0 until cp.n).foreach(nid => assert(row(nid) === cp.zeta(t, nid), s"zeta($t,$nid)"))
      }
      // the last record lives in a partially-initialized paged data block
      val last = nc.readRecord("zeta", 209)
      (0 until cp.n).foreach(nid => assert(last(nid) === cp.zeta(209, nid)))
    } finally nc.close()
  }

  test("v2 B-tree depth 2: internal-over-internal chunk index reads back") {
    // n=55 -> zeta_max has 11 fletcher32 chunk records; leafSize 1 +
    // subtree 3 forces a depth-2 tree whose root child pointers carry the
    // extra total-records-in-subtree field (2 bytes at this geometry) —
    // the multi-unlimited-dim shape past thousands of chunks
    val c2 = c.copy(n = 55, dryMax = Set(5, 23, 54))
    val dir = Files.createTempDirectory("graft_h5bt2").toString
    val p = s"$dir/bt_depth2.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeLatest(c2, zmSubtree = 3))
    val nc = NcFile.open(p)
    try assert(nc.readFixed("zeta_max").toSeq === (0 until 55).map(c2.zetaMax))
    finally nc.close()
  }

  test("dense group past one heap block: FHIB indirect root enumerates all links") {
    // 40 extra vars make the link messages overflow the 512-byte starting
    // direct block — the fractal heap grows an indirect root, the shape
    // any >~25-variable dense group lands in
    val dir = Files.createTempDirectory("graft_h5dense").toString
    val p = s"$dir/many_vars.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeLatest(c, extraVars = 40))
    val nc = NcFile.open(p)
    try {
      assert(nc.varNames.length === 46)
      assert(nc.varNames.contains("extra00") && nc.varNames.contains("extra39"))
      assert(nc.readFixed("extra07").toSeq === Seq(7.0, 7.5))
      assert(nc.readFixed("extra39").toSeq === Seq(39.0, 39.5))
      // the original six still read through every v4 index type
      assert(nc.readFixed("x").toSeq === (0 until c.n).map(c.x))
      assert(nc.readRecord("zeta", 1).toSeq === (0 until c.n).map(n => c.zeta(1, n)))
    } finally nc.close()
  }

  test("dense attribute storage: _FillValue survives the fractal-heap form") {
    // past 8 attributes libhdf5 moves ALL of an object's attrs dense
    // (Attribute Info message + fractal heap + name v2 B-tree); a reader
    // that only parses compact 0x000C messages would silently lose the
    // fill mask and ingest -99999 sentinels as real values
    val dir = Files.createTempDirectory("graft_h5denseattr").toString
    val p = s"$dir/dense_attrs.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeLatest(c, zmDenseAttrs = 9))
    val nc = NcFile.open(p)
    try {
      assert(nc.fillValue("zeta_max") === Some(c.fill))
      assert(nc.strAttr("zeta_max", "meta03") === Some("value-3"))
      assert(nc.readFixed("zeta_max").toSeq === (0 until c.n).map(c.zetaMax))
    } finally nc.close()
  }

  test("fractal heap with CHILD indirect blocks enumerates every link") {
    // small doubling table (start 64, max direct 128 -> 3 direct rows
    // covering 1 KiB) + 60 extra vars: the heap must grow child indirect
    // blocks under the root — the any-link-count dense-group shape
    val dir = Files.createTempDirectory("graft_h5childib").toString
    val p = s"$dir/child_indirect.nc"
    Files.write(Paths.get(p),
      Hdf5Fixture.writeLatest(c, extraVars = 60, heapStart = 64, heapMaxDirect = 128))
    val nc = NcFile.open(p)
    try {
      assert(nc.varNames.length === 66)
      assert(nc.readFixed("extra00").toSeq === Seq(0.0, 0.5))
      assert(nc.readFixed("extra59").toSeq === Seq(59.0, 59.5))
      // links stored deep in the child-indirect range still resolve
      assert(nc.readRecord("zeta", 1).toSeq === (0 until c.n).map(n => c.zeta(1, n)))
    } finally nc.close()
  }

  test("fletcher32 detects a corrupted chunk instead of decoding it") {
    val dir = Files.createTempDirectory("graft_h5fc").toString
    val p = s"$dir/corrupt.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeV0(c, compress = true,
      corruptTimeChunk = true))
    val nc = NcFile.open(p)
    try {
      val e = intercept[IllegalArgumentException](nc.readRecord("time", 0))
      assert(e.getMessage.contains("fletcher32 mismatch"))
    } finally nc.close()
  }

  test("szip with a malformed filter message fails loudly, never decodes garbage") {
    // filter 4 declared with NO client values (a corrupt/truncated filter
    // message): the szip path (SzipSpec covers the working decode) must
    // refuse by name instead of guessing parameters
    val dir = Files.createTempDirectory("graft_h5uf").toString
    val p = s"$dir/szip.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeV0(c, compress = true,
      zetaFilterIdOverride = Some(4 /* szip */)))
    val nc = NcFile.open(p)
    try {
      val e = intercept[IllegalArgumentException](nc.readRecord("zeta", 0))
      assert(e.getMessage.contains("szip"))
      assert(e.getMessage.contains("client values"))
    } finally nc.close()
  }

  test("unknown filter id fails with an actionable message") {
    val dir = Files.createTempDirectory("graft_h5uf2").toString
    val p = s"$dir/unknown_filter.nc"
    Files.write(Paths.get(p), Hdf5Fixture.writeV0(c, compress = true,
      zetaFilterIdOverride = Some(307 /* bzip2 (registered third-party id) */)))
    val nc = NcFile.open(p)
    try {
      val e = intercept[IllegalArgumentException](nc.readRecord("zeta", 0))
      assert(e.getMessage.contains("filter id 307"))
    } finally nc.close()
  }

  test("superblock v2 + OHDR + compact links + compact layout") {
    val dir = Files.createTempDirectory("graft_h5v2").toString
    val p = s"$dir/modern.h5"
    val vals = Array.tabulate(9)(i => if (i == 4) -1.0 else i * 1.5)
    val small = Array(3.25, -7.5)
    Files.write(Paths.get(p), Hdf5Fixture.writeV2(vals, small, fill = -1.0))
    val nc = NcFile.open(p)
    try {
      assert(nc.varNames.toSet === Set("v", "small"))
      assert(nc.fillValue("v") === Some(-1.0))
      val v = nc.readFixed("v")
      (0 until 9).foreach(i => assert(v(i) === vals(i)))
      val s = nc.readFixed("small") // compact layout: data inline in the header
      assert(s.toSeq === small.toSeq)
    } finally nc.close()
  }

  test("HDF5 ingest over HTTP range requests (remote NetCDF-4)") {
    val bytes = Hdf5Fixture.writeV0(c)
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/fort63.nc", { (ex: com.sun.net.httpserver.HttpExchange) =>
      val range = Option(ex.getRequestHeaders.getFirst("Range"))
      ex.getRequestMethod match {
        case "HEAD" =>
          ex.sendResponseHeaders(200, bytes.length.toLong); ex.getResponseBody.close()
        case "GET" => range match {
          case Some(r) =>
            val Array(a, b) = r.stripPrefix("bytes=").split("-").map(_.toLong)
            val slice = java.util.Arrays.copyOfRange(bytes, a.toInt, b.toInt + 1)
            ex.getResponseHeaders.set("Content-Range", s"bytes $a-$b/${bytes.length}")
            ex.sendResponseHeaders(206, slice.length.toLong)
            ex.getResponseBody.write(slice); ex.getResponseBody.close()
          case None =>
            ex.sendResponseHeaders(200, bytes.length.toLong)
            ex.getResponseBody.write(bytes); ex.getResponseBody.close()
        }
        case _ => ex.sendResponseHeaders(405, -1); ex.getResponseBody.close()
      }
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/fort63.nc"
      val outDir = Files.createTempDirectory("graft_h5_http").toString
      Ingest.fort63ToParquet(spark, url, outDir)
      assert(Ingest.series(spark, outDir).count() === (c.t * c.n).toLong)
      assert(Ingest.timeLabels(spark, outDir)(0L) === "20080909T000000")
    } finally server.stop(0)
  }
}
