package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** The corpus has shipped events.ts as BOTH int64-nanos and timestamp[us]
  * across generations (the round-6 driver regeneration broke 39 queries).
  * This suite pins the contract: `Tables.events` / `qScanPruneTime` /
  * `Streams.readEvents` must produce identical results on either physical
  * encoding, and the time-range predicate must reach the parquet scan in
  * both — so the next corpus drift is a unit-test failure, not a driver
  * surprise.
  */
class TsEncodingSpec extends SparkSpec {

  /** A copy of the sf0.001 corpus events with ts re-encoded as int64
    * nanoseconds (what the old corpus' TIMESTAMP(NANOS) reads as under
    * spark.sql.legacy.parquet.nanosAsLong). */
  private lazy val nanosDir: String = {
    val dir = Files.createTempDirectory("events-nanos").toString
    Tables.events(spark, sf)
      .withColumn("ts", (unix_micros(col("ts")) * 1000L).cast(LongType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val within = p match {
      case q: QueryStageExec => allNodes(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(allNodes) ++ within)
  }

  test("Tables.events normalizes both encodings to the same TimestampType rows") {
    val fromTimestamp = Tables.events(spark, sf)
    val fromNanos = Tables.events(spark, nanosDir)
    assert(fromTimestamp.schema("ts").dataType === TimestampType)
    assert(fromNanos.schema("ts").dataType === TimestampType)
    val key = Seq("event_id", "ts", "user_id", "event_type", "value")
    val a = fromTimestamp.select(key.map(col): _*).orderBy("event_id").collect()
    val b = fromNanos.select(key.map(col): _*).orderBy("event_id").collect()
    assert(a.length > 0)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("qScanPruneTime returns identical rows on both encodings") {
    val a = operators.Relational.qScanPruneTime(spark, sf).collect()
    val b = operators.Relational.qScanPruneTime(spark, nanosDir).collect()
    assert(a.nonEmpty, "the 2024-01-01 slice must select rows at sf0.001")
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("the time-range predicate reaches the parquet scan on both encodings") {
    for (dir <- Seq(sf, nanosDir)) {
      val df = operators.Relational.qScanPruneTime(spark, dir)
      val scans = allNodes(finalPlan(df)).collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      val pushed = scans.flatMap(_.metadata.get("PushedFilters"))
      assert(pushed.exists(f => f.contains("GreaterThanOrEqual(ts") &&
                                f.contains("LessThan(ts")),
        s"ts range must be pushed to the scan for $dir, got: $pushed")
    }
  }

  test("Streams.readEvents streams both encodings into identical aggregates") {
    // file streams want a source DIRECTORY: stage each encoding's
    // events.parquet (file or part-dir) under its own temp dir
    def stage(from: String): String = {
      val src = java.nio.file.Paths.get(s"$from/events.parquet")
      if (Files.isDirectory(src)) src.toString // already a part-file dir
      else {
        val dir = Files.createTempDirectory("ts-enc-src")
        Files.copy(src, dir.resolve("events.parquet"))
        dir.toString
      }
    }
    for ((dir, name) <- Seq(sf -> "ts_enc_us", nanosDir -> "ts_enc_ns")) {
      val q = streaming.Streams.tumblingCounts(
          streaming.Streams.readEvents(spark, stage(dir)))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    val a = spark.table("ts_enc_us").orderBy("ws", "event_type").collect()
    val b = spark.table("ts_enc_ns").orderBy("ws", "event_type").collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("legacy nanos files landing in a started empty-dir stream fail fast, never misread") {
    // readEvents' empty-landing fallback declares the CURRENT encoding
    // (timestamp[us]); the documented contract (r7 advice) is that a
    // legacy INT64-nanos file arriving later must FAIL the micro-batch at
    // the scan — a loud schema error, never silently-absurd timestamps.
    val landing = Files.createTempDirectory("landing-nanos").toString
    val stream = streaming.Streams.readEvents(spark, landing)
    assert(stream.schema("ts").dataType === TimestampType) // fallback path
    val q = streaming.Streams.tumblingCounts(stream)
      .writeStream.format("memory").queryName("nanos_landing")
      .outputMode("append").start()
    try {
      val src = new java.io.File(s"$nanosDir/events.parquet").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        java.nio.file.Paths.get(landing, src.getName))
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
      }
      info(s"failed fast as documented: ${String.valueOf(ex.getMessage).take(120)}")
    } finally q.stop()
  }
}
