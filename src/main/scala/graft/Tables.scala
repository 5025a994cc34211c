package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver corpus (TESTDATA.md).
  *
  * Mirrors the reference's scan layer: `extract_url_grid` opens the source
  * lazily with variable pruning (reference `run/utilities/adcirc_dask_utilities.py:36-44`);
  * here `spark.read.parquet` gives a lazy `LogicalRelation` and Catalyst
  * prunes columns/row-groups automatically. At 100 TB each of these becomes
  * a partitioned table (partitioned by date/ts); the API is unchanged.
  */
object Tables {
  /** Reader memo: `spark.read.parquet` pays a footer read (schema
    * inference) + directory listing at DATAFRAME CREATION, and a
    * bench/driver run builds each table's frame hundreds of times. A
    * DataFrame is an immutable logical plan, so reusing one per
    * (session, path) is safe; a regenerated corpus arrives under a new
    * sfDir (new key). LRU-bounded at 4 sessions — a memoized DataFrame
    * strongly references its session, so a WeakHashMap on the session
    * could never collect (the classic value-refers-to-key trap); bounded
    * eviction caps retention at 4 sessions' worth of plans,
    * deterministically, instead of pretending weakness. In-place
    * rewrites of a memoized path must call [[invalidate]]
    * (Layout.compact does). */
  private val MaxMemoSessions = 4
  private val readerMemo =
    new java.util.LinkedHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[String, DataFrame]](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession,
            scala.collection.concurrent.TrieMap[String, DataFrame]]): Boolean =
        size() > MaxMemoSessions
    }

  private def memoFor(spark: SparkSession) = readerMemo.synchronized {
    var m = readerMemo.get(spark)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty[String, DataFrame]
      readerMemo.put(spark, m)
    }
    m
  }

  /** Drop memoized readers under `pathPrefix` for this session — required
    * after rewriting a table's files IN PLACE (the memoized frame's file
    * listing is frozen at creation and would read deleted files). */
  def invalidate(spark: SparkSession, pathPrefix: String): Unit = {
    val m = memoFor(spark)
    // path-separator boundary: ".../sf1" must not evict ".../sf10/orders"
    m.keys.filter(k => k == pathPrefix || k.startsWith(pathPrefix + "/"))
      .foreach(m.remove)
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    memoFor(spark).getOrElseUpdate(s"$sfDir/$name.parquet",
      spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  /** events.ts has shipped as both INT64 TIMESTAMP(NANOS) and
    * timestamp[us] parquet across corpus generations, so the loader adapts
    * to the SCANNED dtype instead of assuming one physical encoding:
    *  - LongType (nanosAsLong legacy read of ns): integer-divide to micros
    *    (double division would lose precision above 2^53 ns);
    *  - TIMESTAMP_NTZ (plain timestamp[us], isAdjustedToUTC=false): cast to
    *    session-tz TimestampType — value-preserving because every session
    *    in this engine pins spark.sql.session.timeZone=UTC;
    *  - TimestampType: already canonical.
    * DuckDB reads the same file natively; oracles compare ts at >= second
    * granularity so ns-vs-us precision never matters.
    *
    * Legacy INT64-nanos files additionally need
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which every session
    * builder in this engine sets at BUILD time (Graft.session, the mains,
    * the test harness) — a loader must never mutate session conf as a side
    * effect (r7 advice: a mid-session conf flip changes semantics for
    * unrelated readers of other nanos files). */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeTs(table(s, d, "events"))

  /** The ts-normalization contract, shared by the batch loader above and
    * the streaming source ([[graft.streaming.Streams.readEvents]]) so the
    * next encoding generation is fixed in ONE place. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => // TIMESTAMP_NTZ (or date-like): normalize to TimestampType
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
  /** events with ts exactly as scanned (raw INT64 nanos on old corpora,
    * timestamp on new) — for queries that need range predicates PUSHED to
    * the parquet scan (a derived column blocks pushdown past IsNotNull).
    * Callers must branch on `schema("ts").dataType` for their bounds. */
  def eventsRawTs(s: SparkSession, d: String): DataFrame =
    table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** S10 existence-gated source (reference run/adcircTime2cogs.py:270-279:
    * missing swan* inputs exit 0, other missing inputs exit 1). Engine form:
    * optional sources surface as an EMPTY relation with the supplied schema
    * (soft path), required sources keep Spark's AnalysisException (hard
    * path — just call `table`). */
  def tableOrEmpty(s: SparkSession, d: String, name: String,
                   schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val path = new java.io.File(s"$d/$name.parquet")
    if (path.exists()) s.read.schema(schema).parquet(path.toString)
    else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }
}
