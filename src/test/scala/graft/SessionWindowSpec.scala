package graft

import org.apache.spark.sql.functions._
import graft.operators.{Aggregates, Similarity}

/** Conservation and cross-check tests for sessionization, sliding windows,
  * and the LSH probe path. */
class SessionWindowSpec extends SparkSpec {

  test("batch sessionization conserves events and values") {
    val sessions = Aggregates.qSessionizeBatch(spark, sf).collect()
    val nRaw = Tables.events(spark, sf).count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum === nRaw)
    sessions.foreach { r =>
      assert(r.getAs[Long]("first_id") <= r.getAs[Long]("last_id"))
      assert(r.getAs[Long]("session_id") >= 1L)
    }
    // session ids are contiguous 1..k per user
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("session_id")).sorted
      assert(ids.toSeq === (1L to ids.length))
    }
  }

  test("sliding windows count every event exactly twice") {
    val slid = Aggregates.qStreamSliding(spark, sf).collect()
    val nRaw = Tables.events(spark, sf).count()
    assert(slid.map(_.getAs[Long]("n")).sum === 2 * nRaw)
  }

  test("LSH probe cosines agree with brute-force for shared pairs") {
    val brute = Similarity.qAnnBruteTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")) -> r.getAs[Double]("cos"))
      .toMap
    val probe = Similarity.qAnnLshProbe(spark, sf).collect()
    assert(probe.nonEmpty)
    val shared = probe.flatMap { r =>
      brute.get((r.getAs[Long]("qid"), r.getAs[Long]("cid")))
        .map(b => (b, r.getAs[Double]("cos")))
    }
    shared.foreach { case (b, p) => assert(b === p) }
  }

  test("streaming and batch sessionizers agree on closed sessions") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_sess_cmp")
    Files.copy(Paths.get(s"$sf/events.parquet"), dir.resolve("events.parquet"),
               StandardCopyOption.REPLACE_EXISTING)
    val q = streaming.Streams.sessionize(
        streaming.Streams.readEvents(spark, dir.toString), gapMicros = 3600L * 1000000)
      .writeStream.format("memory").queryName("sess_cmp")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("sess_cmp")
      .select("user_id", "n_events", "first_id", "last_id")
      .collect().map(_.toString).toSet
    val batch = Aggregates.qSessionizeBatch(spark, sf)
      .select("user_id", "n_events", "first_id", "last_id")
      .collect().map(_.toString).toSet
    // streaming emits only CLOSED sessions (trailing session stays in
    // state) so every streamed session must appear in the batch result
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
           s"streamed-only sessions: ${streamed.diff(batch).take(3)}")
  }
}
