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

  /** The corpus dir whose views are currently registered, per session —
    * every SQL-frontend query calls register() defensively, and without
    * memoization each call re-reads ~10 parquet footers (schema
    * inference); across a 16-query TPC-H run that is seconds of pure
    * re-planning. Only a FULLY-clean registration is memoized, so a
    * partial failure is retried on the next call. */
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Per-table isolation: one source's schema drift or missing file must
    * degrade THAT view only, never the whole SQL frontend (round-6 lesson:
    * an eager `Tables.events` failure here took down all 15 TPC-H queries
    * that never touch events). Failures are recorded and re-thrown only if
    * the caller asks for the failed view. */
  def register(s: SparkSession, sfDir: String): Unit = {
    if (sfDir == registered.get(s)) return
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
    if (failures.isEmpty) registered.put(s, sfDir)
  }
}
