package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.Warc

/** Splittable WARC reader/exporter (ISO 28500). The load-bearing
  * invariants, each of which has a way to fail silently at scale:
  *  - split ownership: every record emitted EXACTLY once for EVERY cut
  *    position (swept byte-by-byte — covers the trailer-straddles-the-
  *    boundary case where a naive position check double-emits);
  *  - anchor spoofing: `WARC/1.0` TEXT inside a payload never resyncs
  *    a split scan mid-record;
  *  - gzip member chaining (the Common Crawl per-record convention);
  *  - strict ingest (S2 convention): truncation/corruption throws,
  *    oversized records degrade to NULL body, never a wrong row;
  *  - the declared query equals a first-principles transform of the
  *    source table (the same claim the DuckDB oracle hashes).
  */
class WarcSpec extends SparkSpec {

  private def record(id: Long, text: String): Array[Byte] =
    Warc.responseRecord(id, text)

  /** A 5-record fixture mixing types: warcinfo, request, response
    * (html), response (non-200), metadata. Only the html 200 response
    * survives toDocuments. */
  private def fixtureBytes(): Array[Byte] = {
    def rec(tp: String, extra: String, payload: Array[Byte]): Array[Byte] = {
      val head = (s"WARC/1.0\r\nWARC-Type: $tp\r\n" + extra +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII")
      val b = new ByteArrayOutputStream()
      b.write(head); b.write(payload); b.write("\r\n\r\n".getBytes("US-ASCII"))
      b.toByteArray
    }
    val b = new ByteArrayOutputStream()
    b.write(rec("warcinfo", "WARC-Record-ID: <urn:w:0>\r\n",
      "software: graft\r\n".getBytes("US-ASCII")))
    b.write(rec("request",
      "WARC-Record-ID: <urn:w:1>\r\nWARC-Target-URI: http://x/1\r\n" +
        "Content-Type: application/http; msgtype=request\r\n",
      "GET /1 HTTP/1.1\r\nHost: x\r\n\r\n".getBytes("US-ASCII")))
    b.write(record(7, "alpha beta  gamma"))
    b.write(rec("response",
      "WARC-Record-ID: <urn:w:3>\r\nWARC-Target-URI: http://x/3\r\n" +
        "Content-Type: application/http; msgtype=response\r\n",
      "HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone".getBytes("US-ASCII")))
    b.write(rec("metadata", "WARC-Record-ID: <urn:w:4>\r\n",
      "via: graft\r\n".getBytes("US-ASCII")))
    b.toByteArray
  }

  private def writeTmp(name: String, bytes: Array[Byte]): String = {
    val dir = Files.createDirectories(Paths.get(
      sys.props("java.io.tmpdir"), "graft_warcspec"))
    val p = dir.resolve(name)
    Files.write(p, bytes)
    p.toString
  }

  test("parses all record types; http fields lifted; offsets strictly increasing") {
    val p = writeTmp("mixed.warc", fixtureBytes())
    val df = Warc.read(spark, p).cache()
    val rows = df.orderBy("offset").collect()
    assert(rows.length === 5)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ===
      Seq("warcinfo", "request", "response", "response", "metadata"))
    val offs = rows.map(_.getAs[Long]("offset")).toSeq
    assert(offs === offs.sorted && offs.distinct.length === 5)
    val html = rows(2)
    assert(html.getAs[Int]("http_status") === 200)
    assert(html.getAs[String]("http_content_type").startsWith("text/html"))
    assert(html.getAs[String]("target_uri") === "http://example.com/doc/7")
    val notFound = rows(3)
    assert(notFound.getAs[Int]("http_status") === 404)
    // non-http payloads pass through untyped, body intact
    assert(rows(0).isNullAt(rows(0).fieldIndex("http_status")))
    assert(new String(rows(4).getAs[Array[Byte]]("body"), "US-ASCII") === "via: graft\r\n")
    df.unpersist()
  }

  test("split ownership: exactly-once for EVERY cut position (byte sweep)") {
    val bytes = fixtureBytes()
    val p = writeTmp("sweep.warc", bytes)
    // every split size from 40 bytes up cuts the file at different
    // boundaries, including inside headers, payloads and trailers
    for (sb <- 40 to bytes.length by 13) {
      val n = Warc.read(spark, p, splitBytes = sb.toLong).count()
      assert(n === 5, s"splitBytes=$sb emitted $n records (want 5)")
    }
  }

  test("anchor spoofing: WARC/1.0 text inside a payload never resyncs a split") {
    // payload containing a fake version line + plausible headers — but
    // no chain-consistent trailer, so validAt must reject it
    val trap = "see WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 10\r\n\r\n" +
      "0123456789 and more prose making the payload long"
    val b = new ByteArrayOutputStream()
    b.write(record(1, "first"))
    val head = (s"WARC/1.0\r\nWARC-Type: resource\r\nWARC-Record-ID: <urn:t:2>\r\n" +
      s"Content-Length: ${trap.getBytes("US-ASCII").length}\r\n\r\n").getBytes("US-ASCII")
    b.write(head); b.write(trap.getBytes("US-ASCII")); b.write("\r\n\r\n".getBytes("US-ASCII"))
    b.write(record(3, "last"))
    val bytes = b.toByteArray
    val p = writeTmp("trap.warc", bytes)
    for (sb <- 40 to bytes.length by 11) {
      val df = Warc.read(spark, p, splitBytes = sb.toLong)
      assert(df.count() === 3, s"splitBytes=$sb")
      assert(df.filter(col("warc_type") === "resource").count() === 1)
    }
  }

  test("gzip member chaining: per-record members, concatenated") {
    val b = new ByteArrayOutputStream()
    for (i <- 0 until 4) {
      val g = new GZIPOutputStream(b)
      g.write(record(i, s"doc number $i")); g.finish()
    }
    val p = writeTmp("members.warc.gz", b.toByteArray)
    val df = Warc.read(spark, p)
    assert(df.count() === 4)
    assert(df.agg(max("offset")).head.getLong(0) > 0L) // decompressed offsets
  }

  test("strict ingest: garbage at offset 0 and truncation both throw") {
    val g = writeTmp("garbage.warc", "not a warc at all".getBytes("US-ASCII"))
    val e1 = intercept[org.apache.spark.SparkException] {
      Warc.read(spark, g).count()
    }
    assert(e1.getMessage.contains("WARC") || e1.getCause != null)
    val full = record(9, "truncated victim")
    val t = writeTmp("trunc.warc", full.dropRight(20))
    intercept[org.apache.spark.SparkException] { Warc.read(spark, t).count() }
  }

  test("oversized record: headers survive, body NULL, neighbors intact") {
    val b = new ByteArrayOutputStream()
    b.write(record(1, "small"))
    b.write(record(2, "x" * 5000))
    b.write(record(3, "also small"))
    val p = writeTmp("big.warc", b.toByteArray)
    val df = Warc.read(spark, p, maxRecordBytes = 1000).orderBy("offset")
    val rows = df.collect()
    assert(rows.length === 3)
    assert(!rows(0).isNullAt(rows(0).fieldIndex("body")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("body")))
    assert(rows(1).getAs[String]("record_id") === "<urn:graft:doc:2>")
    assert(!rows(2).isNullAt(rows(2).fieldIndex("body")))
  }

  test("htmlToText: tags, script/style subtrees, comments, entities, whitespace") {
    import spark.implicits._
    val html = "<html><head><style>p{x:1}</style><script>if(1<2)alert()</script>" +
      "</head><!-- note --><body><p>a &amp;lt; b</p>\n\n<div>c &nbsp; d</div></body></html>"
    val out = Seq(html).toDF("h").select(Warc.htmlToText(col("h")).as("t")).head.getString(0)
    assert(out === "a &lt; b c d")
  }

  test("declared query equals first-principles transform of documents") {
    val got = Warc.qWarcDocuments(spark, sf).collect()
    val want = Tables.documents(spark, sf)
      .select(col("doc_id"),
        concat(lit("http://example.com/doc/"), col("doc_id")).as("url"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("text"))
      .orderBy("doc_id").collect()
    assert(got.length === want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }

  test("export: mixed raw + per-record-gzip partitions round-trip losslessly") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"text with <markup> & entities $i"))
      .toDF("doc_id", "text")
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_warcspec_rt").toString
    Warc.writeWarc(docs, dir, partitions = 6)
    val names = new java.io.File(dir).list().toSeq
    assert(names.exists(_.endsWith(".warc")) && names.exists(_.endsWith(".warc.gz")),
      s"expected both container legs, got $names")
    val back = Warc.toDocuments(Warc.read(spark, dir, splitBytes = 512L))
      .select(regexp_extract(col("doc_id"), ":([0-9]+)>$", 1).cast("long").as("doc_id"),
        col("text"))
    val got = back.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === (0L until 40L).map(i => (i, s"text with <markup> & entities $i")))
  }

  test("WET: conversion records round-trip text VERBATIM through splits and gzip") {
    import spark.implicits._
    // markup chars and runs of whitespace must survive untouched — the
    // defining difference from the response-record round-trip, which
    // HTML-escapes and whitespace-collapses
    val docs = (0L until 30L).map(i => (i, s"raw <tag> &amp;  double  space $i"))
      .toDF("doc_id", "text")
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_wetspec_rt").toString
    Warc.writeWet(docs, dir, partitions = 5)
    val names = new java.io.File(dir).list().toSeq
    assert(names.exists(_.endsWith(".warc.wet")) && names.exists(_.endsWith(".warc.wet.gz")),
      s"expected both WET legs, got $names")
    val raw = Warc.read(spark, dir, splitBytes = 256L)
    // every record is a conversion record with a refers-to link back to
    // its response id, and NO http fields (the payload is not enveloped)
    val recs = raw.collect()
    assert(recs.forall(_.getAs[String]("warc_type") == "conversion"))
    assert(recs.forall(r => r.isNullAt(r.fieldIndex("http_status"))))
    val back = Warc.wetToDocuments(raw)
      .select(regexp_extract(col("doc_id"), ":([0-9]+)>$", 1).cast("long").as("doc_id"),
        col("text"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(back.toSeq === (0L until 30L).map(i => (i, s"raw <tag> &amp;  double  space $i")))
  }

  test("WAT: metadata records parse back to the exact edge list through splits") {
    import spark.implicits._
    // host i links to (2i+1, 2i+2) mod 40; empty-link hosts drop out
    val docs = (0L until 20L).map { i =>
      val links = if (i % 7 == 6) "[]" else s"[${(2 * i + 1) % 40}, ${(2 * i + 2) % 40}]"
      (i, s"""{"host": $i, "links": $links}""")
    }.toDF("doc_id", "text")
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_watspec_rt").toString
    Warc.writeWat(docs, dir, partitions = 4)
    val got = Warc.watToEdges(Warc.read(spark, dir, splitBytes = 200L))
      .orderBy("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (0L until 20L).filter(_ % 7 != 6)
      .flatMap(i => Seq((i, (2 * i + 1) % 40), (i, (2 * i + 2) % 40)))
      .sorted
    assert(got.toSeq === want)
  }

  test("WAT: a malformed JSON payload throws (strict ingest), never drops silently") {
    import spark.implicits._
    val docs = Seq(
      (1L, """{"host": 1, "links": [2]}"""),
      (2L, """{"host": 2, "links": [3""")  // truncated JSON
    ).toDF("doc_id", "text")
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_watspec_bad").toString
    Warc.writeWat(docs, dir, partitions = 1, mixGzip = false)
    val err = intercept[org.apache.spark.SparkException] {
      Warc.watToEdges(Warc.read(spark, dir)).collect()
    }
    assert(err.getMessage.contains("MALFORMED_RECORD") ||
           err.getMessage.toLowerCase.contains("malformed"), err.getMessage)
  }
}
