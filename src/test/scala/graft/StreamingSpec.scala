package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams

/** Streaming wiring proof (SURVEY §2.9/§7.4): the AvailableNow file stream
  * over the same events parquet must reproduce the batch aggregation. */
class StreamingSpec extends SparkSpec {

  private def stageEventsDir(): String = {
    val dir = Files.createTempDirectory("graft_stream_src")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
               StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("AvailableNow tumbling-window stream equals the batch aggregation") {
    val src = stageEventsDir()
    val q = Streams.tumblingCounts(Streams.readEvents(spark, src))
      .writeStream
      .format("memory")
      .queryName("tumbling_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // Append mode emits a window only once the watermark passes it; the
    // trailing window(s) stay in state. Compare below the cutoff.
    val cutoff = Tables.events(spark, sf)
      .agg(date_trunc("hour", max(col("ts")) - expr("INTERVAL 1 HOUR")).as("c"))
      .collect().head.getTimestamp(0)

    val streamed = spark.table("tumbling_test")
      .select("ws", "event_type", "n", "sum_value")
      .filter(col("ws") < lit(cutoff))
      .orderBy("ws", "event_type").collect()

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .filter(col("ws") < lit(cutoff))
      .orderBy("ws", "event_type").collect()

    assert(streamed.length > 0)
    assert(streamed.map(_.toString).toSeq === batch.map(_.toString).toSeq)
  }

  test("sliding windows double-count each event across overlapping windows") {
    val src = stageEventsDir()
    val q = Streams.slidingCounts(Streams.readEvents(spark, src))
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val emitted = spark.table("sliding_test")
    assert(emitted.count() > 0)
    // every emitted window is exactly 1 hour long on a 30-minute boundary
    val bad = emitted.filter(
      unix_timestamp(col("we")) - unix_timestamp(col("ws")) =!= 3600 ||
      unix_timestamp(col("ws")) % 1800 =!= 0).count()
    assert(bad === 0)
  }

  test("session_window groups per-user bursts with a gap bound") {
    val src = stageEventsDir()
    val q = Streams.sessionWindows(Streams.readEvents(spark, src), "2 hours")
      .writeStream.format("memory").queryName("sesswin_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val rows = spark.table("sesswin_test").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[java.sql.Timestamp]("we").getTime >
             r.getAs[java.sql.Timestamp]("ws").getTime)
      assert(r.getAs[Long]("n_events") > 0)
    }
  }

  test("streaming parquet sink partitioned by key writes prunable directories") {
    val src = stageEventsDir()
    val out = Files.createTempDirectory("graft_stream_out").toString
    val chk = Files.createTempDirectory("graft_stream_chk").toString
    val agg = Streams.readEvents(spark, src)
      .select(col("event_id"), col("event_type"), col("value"))
    val q = Streams.partitionedParquetSink(agg, out, chk)
    q.awaitTermination(120000)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(dirs.nonEmpty, "expected event_type= partition directories")
    val readBack = spark.read.parquet(out)
    assert(readBack.count() === Tables.events(spark, sf).count())
  }

  test("flatMapGroupsWithState sessionization: totals conserve events and values") {
    val src = stageEventsDir()
    val q = Streams.sessionize(Streams.readEvents(spark, src), gapMicros = 3600L * 1000000)
      .writeStream
      .format("memory")
      .queryName("sessions_test")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val sessions = spark.table("sessions_test").collect()
    // closed sessions only (state holds each user's trailing session), so
    // bounds — not equality — against the raw table:
    val totalEvents = sessions.map(_.getAs[Long]("n_events")).sum
    val nRaw = Tables.events(spark, sf).count()
    assert(totalEvents <= nRaw)
    assert(sessions.forall(s => s.getAs[Long]("first_id") <= s.getAs[Long]("last_id")))
  }
}
