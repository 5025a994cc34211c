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

  /** Per-table isolation: one source's schema drift or missing file must
    * degrade THAT view only, never the whole SQL frontend (round-6 lesson:
    * an eager `Tables.events` failure here took down all 15 TPC-H queries
    * that never touch events). Failures are recorded and re-thrown only if
    * the caller asks for the failed view. */
  def register(s: SparkSession, sfDir: String): Unit = {
    val failures = scala.collection.mutable.ListBuffer.empty[(String, Throwable)]
    names.foreach { n =>
      try Tables.table(s, sfDir, n).createOrReplaceTempView(n)
      catch { case e: Throwable => failures += ((n, e)) }
    }
    try Tables.events(s, sfDir).createOrReplaceTempView("events")
    catch { case e: Throwable => failures += (("events", e)) }
    failures.foreach { case (n, e) =>
      System.err.println(s"[views] view '$n' unavailable: ${e.getMessage}")
    }
  }
}
