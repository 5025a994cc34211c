package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink format coverage: the engine round-trips its relations
  * through every columnar/text format Spark ships (the reference's
  * ecosystem writes GeoTIFF + properties text; a general engine needs the
  * standard lake formats too). */
class FormatsSpec extends SparkSpec {

  private def roundTrip(fmt: String): Unit = {
    val out = Files.createTempDirectory(s"graft_fmt_$fmt").toString
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name").as("name"))
      .orderBy("k")
    src.write.format(fmt).mode("overwrite").save(out)
    val back = spark.read.format(fmt)
      .option("inferSchema", "true").option("header", "true")
      .load(out)
    // csv reads back as strings unless inferred; compare on normalized strings
    val a = src.collect().map(r => s"${r.getLong(0)}|${r.getString(1)}").sorted
    val b = back.select(col("k").cast("long"), col("name"))
      .collect().map(r => s"${r.getLong(0)}|${r.getString(1)}").sorted
    assert(b.toSeq === a.toSeq, s"$fmt round-trip mismatch")
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("orc round-trip")(roundTrip("orc"))
  test("json round-trip")(roundTrip("json"))
  test("csv round-trip") {
    val out = Files.createTempDirectory("graft_fmt_csv").toString
    val src = Tables.nation(spark, sf)
      .select(col("n_nationkey").cast("long").as("k"), col("n_name").as("name"))
    src.write.format("csv").option("header", "true").mode("overwrite").save(out)
    val back = spark.read.format("csv").option("header", "true").load(out)
    assert(back.count() === src.count())
    assert(back.columns.toSeq === Seq("k", "name"))
  }
}
