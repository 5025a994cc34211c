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
    * that never touch events). A failed table is logged and its view
    * DROPPED, so asking for it fails with TABLE_OR_VIEW_NOT_FOUND rather
    * than silently serving a previously-registered corpus's rows. */
  def register(s: SparkSession, sfDir: String): Unit = {
    if (sfDir == registered.get(s)) return
    // invalidate BEFORE mutating the catalog: if this registration fails
    // partway, the memo must not keep claiming the previous dir is live
    registered.remove(s)
    val failures = scala.collection.mutable.ListBuffer.empty[(String, Throwable)]
    def bind(n: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      try df.createOrReplaceTempView(n)
      catch { case e: Throwable =>
        // drop any stale binding from a previously-registered dir — the
        // next use must fail with TABLE_OR_VIEW_NOT_FOUND, not silently
        // serve the other corpus's rows
        s.catalog.dropTempView(n)
        failures += ((n, e))
      }
    names.foreach(n => bind(n)(Tables.table(s, sfDir, n)))
    bind("events")(Tables.events(s, sfDir))
    failures.foreach { case (n, e) =>
      System.err.println(s"[views] view '$n' unavailable: ${e.getMessage}")
    }
    if (failures.isEmpty) registered.put(s, sfDir)
  }

  /** Forget this session's registration memo so the NEXT register() call
    * rebinds every view with fresh file listings. Required after rewriting
    * any registered table's files in place (Layout.compact calls this
    * alongside Tables.invalidate): a bound temp view freezes its file
    * listing at bind time, and the memo would otherwise turn the rebind
    * into an early-return no-op — leaving SQL queries reading deleted
    * pre-compaction files (r7 advice, medium). */
  def invalidate(s: SparkSession): Unit = registered.remove(s)
}
