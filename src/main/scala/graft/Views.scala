package graft

import org.apache.spark.sql.SparkSession

/** SQL frontend: register the corpus as temp views so `spark.sql(...)` runs
  * any ANSI query over the same tables the DataFrame API sees. (The
  * reference has no SQL surface at all — SURVEY "What the reference IS";
  * here it is free via the session catalog.) `events` is registered with
  * the converted timestamp so SQL users never see raw nanos. */
object Views {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings")

  def register(s: SparkSession, sfDir: String): Unit = {
    names.foreach(n => Tables.table(s, sfDir, n).createOrReplaceTempView(n))
    Tables.events(s, sfDir).createOrReplaceTempView("events")
  }
}
