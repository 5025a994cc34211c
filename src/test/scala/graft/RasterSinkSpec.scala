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

  test("mosaic index derives the reference's compact-ISO tiff names") {
    val idx = RasterSink.mosaicIndex(spark, "fort_63_zeta").collect()
    assert(idx.length === graft.operators.Interp.T)
    assert(idx.forall(_.getAs[String]("fname").matches("fort_63_zeta_[0-9]{8}T[0-9]{6}Z\\.tiff")))
  }
}
