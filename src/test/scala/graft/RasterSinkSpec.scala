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
}
