package graft.sources

import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Splittable WARC (ISO 28500 / WARC/1.x) reader — the Common Crawl
  * container, i.e. THE input format a 100 TB LLM training-data pipeline
  * starts from. Public spec: ISO 28500:2017 (the WARC file format);
  * record grammar: a `WARC/1.x` version line, CRLF-terminated
  * `Name: value` header lines (with RFC-822-style continuation
  * folding), an empty line, `Content-Length` payload octets, then a
  * CRLF CRLF block trailer.
  *
  * Scale shape:
  *  - **Uncompressed `.warc`**: byte-range splits (Hadoop input-split
  *    convention — a task owns every record whose START offset falls in
  *    [start, end), reading past `end` to finish its last record). The
  *    split-start record boundary is found by scanning for the
  *    `WARC/1.` anchor and VALIDATING it: the header block must parse
  *    (version line, ≤64 CRLF header lines, numeric `Content-Length`,
  *    `WARC-Type` present) AND the payload must terminate in CRLF CRLF
  *    chained onto EOF or another anchor — so `WARC/1.0` text INSIDE a
  *    payload (a crawl of this very scaladoc) cannot fool the scanner
  *    unless it embeds a full, chain-consistent record (a verbatim
  *    WARC-in-WARC payload re-syncs the chain one record early — the
  *    documented residual, identical to Hadoop text-format practice).
  *    The scan costs at most ~one record length per split, once.
  *  - **Per-record-gzip `.warc.gz`** (how Common Crawl actually ships):
  *    one task per FILE, streaming the concatenated gzip members
  *    sequentially. Crawls are laid out as tens of thousands of ~1 GB
  *    files, so file granularity already saturates any cluster; the
  *    `offset` column is the decompressed stream offset.
  *
  * Listing goes through the Hadoop `FileSystem` (glob — object-store
  * safe); task-side byte access through [[RangeReader.openHadoop]]
  * (local / http(s) / any Hadoop scheme). Records larger than
  * `maxRecordBytes` are emitted with their headers and a NULL body
  * (metadata survives, no task OOMs on a pathological record).
  *
  * The reference ingests one container format at its boundary (NetCDF →
  * long-form Parquet, /root/reference/run/utilities/
  * adcirc_dask_utilities.py:10-44); this is the same S2 boundary
  * pattern applied to the web-archive container: parse ONCE at ingest,
  * emit a typed DataFrame every downstream operator (dedup, quality,
  * lang-id, minhash) consumes without re-touching bytes. */
object Warc {

  /** One emitted record. `body` is the HTTP entity body when the record
    * payload is `application/http` (status/headers lifted into typed
    * columns), otherwise the raw payload block; NULL when the record
    * exceeded `maxRecordBytes`. */
  // qualified-private (public in bytecode) — Spark's encoder codegen
  // must be able to reach these from generated classes
  private[sources] case class Rec(
      file: String, offset: Long, record_id: String, warc_type: String,
      target_uri: Option[String], warc_date: Option[String],
      refers_to: Option[String],
      content_type: Option[String], content_length: Long,
      http_status: Option[Int], http_content_type: Option[String],
      body: Array[Byte])

  private[sources] case class Split(path: String, start: Long, end: Long, len: Long, gz: Boolean)

  /** Read `pattern` (file, glob, directory, or http(s) URL) into
    * (file, offset, record_id, warc_type, target_uri, warc_date,
    * refers_to, content_type, content_length, http_status,
    * http_content_type, body). */
  def read(s: SparkSession, pattern: String, splitBytes: Long = 64L << 20,
           maxRecordBytes: Int = 64 << 20): DataFrame =
    readFiles(s, listFiles(s, pattern), splitBytes, maxRecordBytes)

  /** [[read]] over an explicit (path, length) list — the leg a caller
    * with its own file inventory uses (e.g. [[graft.streaming.Streams
    * .crawlStream]], whose file-discovery stream already carries the
    * length), skipping a second FileSystem listing round-trip. */
  def readFiles(s: SparkSession, files: Seq[(String, Long)],
                splitBytes: Long = 64L << 20,
                maxRecordBytes: Int = 64 << 20): DataFrame = {
    require(splitBytes > 0 && maxRecordBytes > 0, "positive split/record caps")
    require(files.nonEmpty, "empty WARC file list")
    val confMap: Map[String, String] =
      s.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toMap
    val splits = files.flatMap { case (path, len) =>
      val gz = path.endsWith(".gz")
      if (gz || len <= splitBytes) Seq(Split(path, 0L, len, len, gz))
      else (0L until len by splitBytes)
        .map(st => Split(path, st, math.min(st + splitBytes, len), len, gz))
    }
    // fanout: the Ingest convention — stripe at least 32-wide, scale
    // with the cluster, never wider than there are splits
    val fanout = math.min(splits.size, math.max(32, s.sparkContext.defaultParallelism))
    import s.implicits._
    s.createDataset(splits)
      .repartition(fanout)
      .mapPartitions(_.flatMap(sp => parseSplit(sp, confMap, maxRecordBytes)))
      .toDF()
      .withColumn("warc_date", to_timestamp(col("warc_date")))
  }

  /** Crawl responses → the engine's `documents` shape: 200 `text/html`
    * responses tag-stripped to plain text via a pure codegen'd
    * expression chain (zero UDFs), ready for the TextOps/Dedup family. */
  def toDocuments(warc: DataFrame): DataFrame =
    warc.filter(col("warc_type") === "response" && col("http_status") === 200 &&
        col("http_content_type").startsWith("text/html") && col("body").isNotNull)
      .select(
        col("record_id").as("doc_id"),
        col("target_uri").as("url"),
        col("warc_date").as("fetch_ts"),
        htmlToText(decode(col("body"), "UTF-8")).as("text"))

  /** HTML → text as built-in expressions only: drop script/style
    * subtrees and comments, strip tags, decode the six entities that
    * dominate real text (`&amp;` LAST — decoding it first would
    * double-decode `&amp;lt;`), collapse whitespace. A heuristic
    * extractor by design (boilerplate removal is [[graft.operators
    * .TextOps]] quality-model territory); the point is that it runs
    * inside WholeStageCodegen, not in a UDF. */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val ent = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTag) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  // ---------------------------------------------------------------- export

  /** Corpus → WARC export sink (the interchange direction: re-shard a
    * curated corpus back into the crawl container other pipelines
    * consume). Each task writes one `part-<pid>.warc` — or, for odd
    * partitions when `mixGzip` (the default, so one export exercises
    * both container legs), a per-record-gzip `part-<pid>.warc.gz`,
    * the Common Crawl member-per-record convention. Files are written
    * through the Hadoop `FileSystem` resolved from `dir`'s scheme, so
    * the same call targets `file:`, `hdfs:` or `s3a:`; tasks rebuild
    * the `Configuration` from a plain Map (it is not Serializable).
    * Expects (doc_id, text); everything else in the record is a pure
    * function of those two. */
  def writeWarc(docs: DataFrame, dir: String, partitions: Int = 8,
                mixGzip: Boolean = true): Unit =
    writeContainer(docs, dir, "warc", partitions, mixGzip, responseRecord)

  /** Corpus → WET export (ISO 28500 `conversion` records, text/plain
    * payload — the Common Crawl *.warc.wet.gz convention: the extracted-
    * text companion of the response container, and the format most
    * public text pipelines actually ingest). Same container plumbing as
    * [[writeWarc]]; the record carries `WARC-Refers-To` back to the
    * response record id, exactly as Common Crawl's WET files do. */
  def writeWet(docs: DataFrame, dir: String, partitions: Int = 8,
               mixGzip: Boolean = true): Unit =
    writeContainer(docs, dir, "warc.wet", partitions, mixGzip, conversionRecord)

  private def writeContainer(docs: DataFrame, dir: String, ext: String,
                             partitions: Int, mixGzip: Boolean,
                             record: (Long, String) => Array[Byte]): Unit = {
    val s = docs.sparkSession
    val confMap: Map[String, String] =
      s.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toMap
    val root = new org.apache.hadoop.fs.Path(dir)
    val dfs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    dfs.delete(root, true)
    dfs.mkdirs(root)
    docs.select(col("doc_id").cast("long"), col("text"))
      .repartition(partitions, col("doc_id"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val gz = mixGzip && pid % 2 == 1
          val c = new org.apache.hadoop.conf.Configuration(false)
          confMap.foreach { case (k, v) => c.set(k, v) }
          val path = new org.apache.hadoop.fs.Path(root,
            f"part-$pid%05d.$ext" + (if (gz) ".gz" else ""))
          val out = path.getFileSystem(c).create(path, true)
          try it.foreach { r =>
            val rec = record(r.getLong(0), r.getString(1))
            if (gz) {
              val g = new java.util.zip.GZIPOutputStream(out, 1 << 16)
              g.write(rec); g.finish()          // member trailer, stream stays open
            } else out.write(rec)
          } finally out.close()
        }
      }
  }

  /** One WARC/1.1 response record for (doc_id, text), as the exact
    * on-wire bytes: WARC header block, `application/http` payload with
    * the text HTML-escaped into a minimal page, CRLF CRLF trailer.
    * Deterministic — the URL, date and markup are pure functions of the
    * inputs, which is what makes [[qWarcDocuments]] fully oracle-able. */
  private[graft] def responseRecord(id: Long, text: String): Array[Byte] = {
    val esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val html = "<html><head><meta charset=\"utf-8\"></head><body>" +
      "<!-- graft export --><p>" + esc + "</p></body></html>"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" + html
    val payload = http.getBytes("UTF-8")
    val head = new StringBuilder()
      .append("WARC/1.1\r\n")
      .append("WARC-Type: response\r\n")
      .append(s"WARC-Record-ID: <urn:graft:doc:$id>\r\n")
      .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      .append(s"WARC-Target-URI: http://example.com/doc/$id\r\n")
      .append("Content-Type: application/http; msgtype=response\r\n")
      .append(s"Content-Length: ${payload.length}\r\n\r\n")
      .toString.getBytes("US-ASCII")
    val outB = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    outB.write(head); outB.write(payload); outB.write("\r\n\r\n".getBytes("US-ASCII"))
    outB.toByteArray
  }

  /** One WET `conversion` record for (doc_id, text): plain-text payload
    * (no HTTP envelope — the defining difference from a response
    * record), `WARC-Refers-To` naming the response it was extracted
    * from. Deterministic for the same reason [[responseRecord]] is. */
  private[graft] def conversionRecord(id: Long, text: String): Array[Byte] = {
    val payload = text.getBytes("UTF-8")
    val head = new StringBuilder()
      .append("WARC/1.1\r\n")
      .append("WARC-Type: conversion\r\n")
      .append(s"WARC-Record-ID: <urn:graft:wet:$id>\r\n")
      .append(s"WARC-Refers-To: <urn:graft:doc:$id>\r\n")
      .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      .append(s"WARC-Target-URI: http://example.com/doc/$id\r\n")
      .append("Content-Type: text/plain\r\n")
      .append(s"Content-Length: ${payload.length}\r\n\r\n")
      .toString.getBytes("US-ASCII")
    val outB = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    outB.write(head); outB.write(payload); outB.write("\r\n\r\n".getBytes("US-ASCII"))
    outB.toByteArray
  }

  /** Corpus → WAT export (the Common Crawl *.warc.wat.gz convention:
    * `metadata` records whose JSON payload describes each response —
    * here url + outlinks, the fields the webgraph build consumes).
    * Expects (doc_id, wat) where `wat` is the JSON string (callers
    * build it with `to_json(struct(...))` so it stays codegen'd);
    * shares the container writer via the record-builder parameter. */
  def writeWat(docs: DataFrame, dir: String, partitions: Int = 8,
               mixGzip: Boolean = true): Unit =
    writeContainer(docs, dir, "warc.wat", partitions, mixGzip, metadataRecord)

  /** One WAT `metadata` record for (doc_id, json payload). */
  private[graft] def metadataRecord(id: Long, json: String): Array[Byte] = {
    val payload = json.getBytes("UTF-8")
    val head = new StringBuilder()
      .append("WARC/1.1\r\n")
      .append("WARC-Type: metadata\r\n")
      .append(s"WARC-Record-ID: <urn:graft:wat:$id>\r\n")
      .append(s"WARC-Refers-To: <urn:graft:doc:$id>\r\n")
      .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
      .append(s"WARC-Target-URI: http://example.com/doc/$id\r\n")
      .append("Content-Type: application/json\r\n")
      .append(s"Content-Length: ${payload.length}\r\n\r\n")
      .toString.getBytes("US-ASCII")
    val outB = new java.io.ByteArrayOutputStream(head.length + payload.length + 4)
    outB.write(head); outB.write(payload); outB.write("\r\n\r\n".getBytes("US-ASCII"))
    outB.toByteArray
  }

  /** WAT metadata records → the LINK GRAPH: parse each record's JSON
    * payload ({host, links: [host]}) with a typed `from_json` schema
    * and explode the outlinks to an edge list — the webgraph-build
    * front door (Common Crawl's published host graph is produced from
    * exactly this record type). Zero UDFs: JSON parse and explode are
    * codegen'd expressions. */
  def watToEdges(warc: DataFrame): DataFrame = {
    warc.filter(col("warc_type") === "metadata" &&
        col("content_type").startsWith("application/json") && col("body").isNotNull)
      // FAILFAST: the S2 strict-ingest convention — a metadata record
      // whose payload does not parse must throw, not silently vanish
      // from the edge list (from_json's default PERMISSIVE mode would
      // null the struct and the explode would drop the row unseen)
      .select(from_json(decode(col("body"), "UTF-8"),
        "host BIGINT, links ARRAY<BIGINT>",
        Map("mode" -> "FAILFAST")).as("w"))
      .select(col("w.host").as("src"), explode(col("w.links")).as("dst"))
      .distinct()
  }

  /** WET conversion records → the `documents` shape. No HTTP split, no
    * HTML stripping — the payload IS the text (which is why pipelines
    * prefer WET when they trust the extractor). */
  def wetToDocuments(warc: DataFrame): DataFrame =
    warc.filter(col("warc_type") === "conversion" &&
        col("content_type").startsWith("text/plain") && col("body").isNotNull)
      .select(
        col("record_id").as("doc_id"),
        col("target_uri").as("url"),
        col("warc_date").as("fetch_ts"),
        decode(col("body"), "UTF-8").as("text"),
        // WARC-Refers-To names the response record this conversion was
        // extracted from — the link the unified crawl door uses to drop
        // a WET duplicate of a WARC ingested in the same micro-batch
        col("refers_to"))

  // --------------------------------------------------------- declared query

  /** Full container round-trip, oracle-hashed: the documents table is
    * exported as WARC (half raw, half per-record gzip), re-ingested
    * through the splittable reader at a split size small enough that
    * every raw file is cut mid-record, and reduced to the `documents`
    * shape. Because every generated byte is a pure function of
    * (doc_id, text), the DuckDB oracle reproduces the whole pipeline as
    * plain SQL over the source table — so one hashed query gates record
    * framing, split ownership, gzip member chaining, the HTTP payload
    * split AND the entity-exact HTML→text decode. Staging goes under
    * java.io.tmpdir here (local driver contract); production callers
    * point [[writeWarc]]/[[read]] at a shared filesystem URI. */
  def qWarcDocuments(s: SparkSession, d: String): DataFrame = {
    val staging = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_warc_" + Integer.toHexString(d.hashCode)).getAbsolutePath
    writeWarc(graft.Tables.documents(s, d).select(col("doc_id"), col("text")), staging)
    toDocuments(read(s, staging, splitBytes = 32L << 10))
      .select(
        regexp_extract(col("doc_id"), ":([0-9]+)>$", 1).cast("bigint").as("doc_id"),
        col("url"), col("text"))
      .orderBy("doc_id")
  }

  /** WET round-trip, oracle-hashed: export → splittable re-ingest (every
    * raw file cut mid-record) → convert back. A conversion record's
    * payload is the text VERBATIM — no markup wrap, no whitespace
    * massaging — so the oracle is the identity on (doc_id, text) plus
    * the pure-function url, and the hash gates the WET record framing,
    * the split-ownership scan over `conversion` records, and the gzip
    * member chaining on the second container type. */
  def qWetDocuments(s: SparkSession, d: String): DataFrame = {
    val staging = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_wet_" + Integer.toHexString(d.hashCode)).getAbsolutePath
    writeWet(graft.Tables.documents(s, d).select(col("doc_id"), col("text")), staging)
    wetToDocuments(read(s, staging, splitBytes = 32L << 10))
      .select(
        regexp_extract(col("doc_id"), ":([0-9]+)>$", 1).cast("bigint").as("doc_id"),
        col("url"), col("text"))
      .orderBy("doc_id")
  }

  /** WAT round-trip into the LINK GRAPH, oracle-hashed: each document's
    * outlinks (the [[graft.operators.Graph.graphEdges]] fixture
    * derivation — a pure function of doc_id) are serialized as the WAT
    * JSON payload with `to_json(struct(...))`, exported as `metadata`
    * records (half gzip), re-ingested through the splittable reader
    * (every raw file cut mid-record), and parsed back to the edge list
    * with a typed `from_json`. The DuckDB oracle is the same edge
    * derivation in SQL — so the hash gates the JSON encode/decode pair,
    * WAT record framing, split ownership over `metadata` records, AND
    * that the container round-trip feeds the graph family losslessly
    * (this edge list is bit-identical to what q_graph_* consume). */
  def qWatLinks(s: SparkSession, d: String): DataFrame = {
    val staging = new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_wat_" + Integer.toHexString(d.hashCode)).getAbsolutePath
    val wat = graft.Tables.documents(s, d).select(
      col("doc_id"),
      to_json(struct(
        (col("doc_id") % 997L).as("host"),
        array_distinct(filter(
          transform(sequence(lit(1L), lit(1L) + col("doc_id") % 3L),
            k => (col("doc_id") * 31L + k * 7L) % 997L),
          dst => dst =!= col("doc_id") % 997L)).as("links"))).as("wat"))
    writeWat(wat.select(col("doc_id"), col("wat").as("text")), staging)
    watToEdges(read(s, staging, splitBytes = 16L << 10))
      .orderBy("src", "dst")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_warc_documents" -> (qWarcDocuments _),
    "q_wet_documents"  -> (qWetDocuments _),
    "q_wat_links"      -> (qWatLinks _))

  /** The oracle replays the only two text transforms that survive the
    * round-trip: whitespace collapse + trim (the escape/decode pair and
    * the container framing are exact inverses). */
  val oracle: Map[String, String] = Map(
    "q_warc_documents" ->
      """SELECT doc_id,
        |       concat('http://example.com/doc/', doc_id) AS url,
        |       trim(regexp_replace(text, '\s+', ' ', 'g')) AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // WET payloads carry the text verbatim — the round-trip is the
    // identity, so any framing/split/gzip defect shows as a hash miss
    "q_wet_documents" ->
      """SELECT doc_id,
        |       concat('http://example.com/doc/', doc_id) AS url,
        |       text
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the fixture link derivation in SQL (the q_graph_* edge relation):
    // JSON encode→decode and the container legs are exact inverses
    "q_wat_links" ->
      """WITH ks AS (SELECT UNNEST([1, 2, 3]) AS k)
        |SELECT DISTINCT (doc_id % 997) AS src, ((doc_id * 31 + k * 7) % 997) AS dst
        |FROM documents CROSS JOIN ks
        |WHERE k <= 1 + doc_id % 3 AND (doc_id % 997) <> ((doc_id * 31 + k * 7) % 997)
        |ORDER BY src, dst""".stripMargin)

  // ---------------------------------------------------------------- listing

  private def listFiles(s: SparkSession, pattern: String): Seq[(String, Long)] =
    if (pattern.startsWith("http://") || pattern.startsWith("https://"))
      Seq((pattern, new HttpRangeReader(pattern).length))
    else {
      val p = new org.apache.hadoop.fs.Path(pattern)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
      val expanded = matched.flatMap { f =>
        if (f.isDirectory) fs.listStatus(f.getPath).filter(_.isFile) else Array(f)
      }
      require(expanded.nonEmpty, s"no files match $pattern")
      expanded.map(f => (f.getPath.toString, f.getLen)).toSeq.sortBy(_._1)
    }

  // ---------------------------------------------------------------- parsing

  private val Anchor = "WARC/1.".getBytes("US-ASCII")

  private def parseSplit(sp: Split, conf: Map[String, String],
                         maxRec: Int): Iterator[Rec] = {
    val rr = RangeReader.openHadoop(sp.path, conf)
    // backstop close on task end (success OR failure); the iterator
    // also closes eagerly on exhaustion so a many-split task holds one
    // handle at a time, not one per split
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => rr.close()))
    val it =
      if (sp.gz) {
        val sc = new StreamScanner(new java.io.BufferedInputStream(
          new GZIPInputStream(new RRInputStream(rr, sp.len, 0L), 1 << 16), 1 << 16))
        Iterator.continually(nextRecord(sc, sp.path, maxRec))
          .takeWhile(_.isDefined).flatten
      } else parseRaw(sp, rr, maxRec)
    new Iterator[Rec] {
      private var open = true
      def hasNext: Boolean = {
        val h = open && it.hasNext
        if (open && !h) { open = false; rr.close() }
        h
      }
      def next(): Rec = it.next()
    }
  }

  private def parseRaw(sp: Split, rr: RangeReader, maxRec: Int): Iterator[Rec] = {
    val b = new Buf(rr, sp.len)
    var first = -1L
    if (sp.start == 0L) {
      require(validAt(b, sp.len, 0L), s"${sp.path}: not a WARC file (no valid record at offset 0)")
      first = 0L
    } else {
      var c = sp.start
      while (first < 0 && c >= 0 && c < sp.end) {
        c = scanForAnchor(b, c, sp.end)
        if (c >= 0) { if (validAt(b, sp.len, c)) first = c else c += 1 }
      }
    }
    if (first < 0) Iterator.empty
    else {
      val base = first
      val sc = new StreamScanner(new java.io.BufferedInputStream(
        new RRInputStream(rr, sp.len, base), 1 << 16))
      // ownership: a record belongs to this split iff its START offset
      // (after the predecessor's CRLF CRLF trailer) falls in [start, end)
      Iterator.continually(nextRecord(sc, sp.path, maxRec))
        .takeWhile(_.exists(r => base + r.offset < sp.end))
        .flatten.map(r => r.copy(offset = base + r.offset))
    }
  }

  /** Parse the record at the scanner's position; None at clean EOF;
    * throws on mid-chain corruption (strict-ingest, the S2 convention). */
  private def nextRecord(sc: StreamScanner, file: String, maxRec: Int): Option[Rec] = {
    // consume the previous record's CRLF CRLF trailer (and any padding)
    var b0 = sc.readByte()
    while (b0 == '\r' || b0 == '\n') b0 = sc.readByte()
    if (b0 < 0) return None
    sc.unread(b0)
    val off = sc.pos
    val ver = sc.readLine(64)
    require(ver.startsWith("WARC/1."),
      s"$file: expected WARC version line at offset $off, got '$ver'")
    val hdrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var lastKey: String = null
    var line = sc.readLine(8192)
    var n = 0
    while (line.nonEmpty) {
      n += 1
      require(n <= 64, s"$file: >64 header lines at offset $off")
      if ((line.head == ' ' || line.head == '\t') && lastKey != null)
        hdrs(lastKey) = hdrs(lastKey) + " " + line.trim   // RFC-822 folding
      else {
        val i = line.indexOf(':')
        require(i > 0, s"$file: malformed header '$line' at offset $off")
        lastKey = line.substring(0, i).trim.toLowerCase
        hdrs(lastKey) = line.substring(i + 1).trim
      }
      line = sc.readLine(8192)
    }
    val cl = hdrs.get("content-length").flatMap(_.toLongOption)
      .getOrElse(throw new IllegalArgumentException(
        s"$file: record at $off has no numeric Content-Length"))
    val wt = hdrs.getOrElse("warc-type",
      throw new IllegalArgumentException(s"$file: record at $off has no WARC-Type"))
    val payload: Array[Byte] =
      if (cl <= maxRec) { val a = new Array[Byte](cl.toInt); sc.readFully(a); a }
      else { sc.skipFully(cl); null }
    val isHttp = hdrs.get("content-type").exists(_.startsWith("application/http"))
    val (status, httpCt, body) = httpSplit(payload, isHttp)
    Some(Rec(file, off,
      hdrs.getOrElse("warc-record-id", s"$file#$off"), wt,
      hdrs.get("warc-target-uri"), hdrs.get("warc-date"),
      hdrs.get("warc-refers-to"),
      hdrs.get("content-type"), cl, status, httpCt, body))
  }

  /** Split an `application/http` payload into (status, Content-Type,
    * entity body). Payloads without a complete HTTP header block pass
    * through untyped. */
  private def httpSplit(payload: Array[Byte],
                        isHttp: Boolean): (Option[Int], Option[String], Array[Byte]) = {
    if (!isHttp || payload == null) return (None, None, payload)
    var i = 0
    var split = -1
    while (split < 0 && i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') split = i
      i += 1
    }
    if (split < 0) return (None, None, payload)
    val head = new String(payload, 0, split, "ISO-8859-1")
    val lines = head.split("\r\n")
    val status =
      if (lines.head.startsWith("HTTP/"))
        lines.head.split(" ", 3).lift(1).flatMap(_.toIntOption)
      else None
    val ct = lines.iterator.drop(1)
      .find(_.toLowerCase.startsWith("content-type:"))
      .map(_.substring("content-type:".length).trim)
    (status, ct, java.util.Arrays.copyOfRange(payload, split + 4, payload.length))
  }

  // ------------------------------------------------- split-boundary scan

  /** Next occurrence of `WARC/1.` at an offset in [from, limit), or -1.
    * Byte-at-a-time through the Buf chunk cache — runs once per split,
    * over at most ~one record length. */
  private def scanForAnchor(b: Buf, from: Long, limit: Long): Long = {
    var p = from
    while (p < limit) {
      if (b.at(p) == 'W' && matches(b, p)) return p
      p += 1
    }
    -1L
  }

  private def matches(b: Buf, p: Long): Boolean = {
    var i = 0
    while (i < Anchor.length) {
      if (b.at(p + i) != (Anchor(i) & 0xff)) return false
      i += 1
    }
    true
  }

  /** A candidate anchor is a record boundary iff the header block
    * parses AND the payload terminates in CRLF CRLF chained onto EOF or
    * another anchor — the chain check that makes payload-embedded
    * `WARC/1.0` text inert. */
  private def validAt(b: Buf, fileLen: Long, c: Long): Boolean = {
    if (!matches(b, c)) return false
    var q = c + Anchor.length
    val d = b.at(q)
    if (d < '0' || d > '9') return false
    q += 1
    if (b.at(q) != '\r' || b.at(q + 1) != '\n') return false
    q += 2
    // header lines until the empty one
    var cl = -1L
    var sawType = false
    var lines = 0
    while (true) {
      if (b.at(q) == '\r' && b.at(q + 1) == '\n') {
        q += 2
        if (cl < 0 || !sawType) return false
        val bodyEnd = q + cl
        if (bodyEnd + 4 > fileLen) return false   // trailer must fit
        if (b.at(bodyEnd) != '\r' || b.at(bodyEnd + 1) != '\n' ||
            b.at(bodyEnd + 2) != '\r' || b.at(bodyEnd + 3) != '\n') return false
        var next = bodyEnd + 4
        while (next < fileLen && (b.at(next) == '\r' || b.at(next) == '\n')) next += 1
        return next == fileLen || matches(b, next)
      }
      lines += 1
      if (lines > 64) return false
      // one header line: bounded scan to CRLF, remembering the two gate headers
      val lineStart = q
      var colon = -1L
      while (b.at(q) != '\r') {
        if (b.at(q) < 0 || q - lineStart > 8192) return false
        if (colon < 0 && b.at(q) == ':') colon = q
        q += 1
      }
      if (b.at(q + 1) != '\n') return false
      val first = b.at(lineStart)
      if (colon < 0 && first != ' ' && first != '\t') return false
      if (colon > lineStart) {
        val name = ascii(b, lineStart, (colon - lineStart).toInt).trim.toLowerCase
        val value = ascii(b, colon + 1, (q - colon - 1).toInt).trim
        if (name == "content-length") cl = value.toLongOption.getOrElse(return false)
        if (name == "warc-type") sawType = value.nonEmpty
      }
      q += 2
    }
    false
  }

  private def ascii(b: Buf, p: Long, n: Int): String = {
    val a = new Array[Byte](n)
    var i = 0
    while (i < n) { a(i) = b.at(p + i).toByte; i += 1 }
    new String(a, "ISO-8859-1")
  }

  // ---------------------------------------------------------- byte plumbing

  /** Chunk-cached random access over a RangeReader (validation path). */
  private final class Buf(rr: RangeReader, fileLen: Long) {
    private val CHUNK = 1 << 20
    private var bufStart = 0L
    private var buf = new Array[Byte](0)
    def at(p: Long): Int =
      if (p < 0 || p >= fileLen) -1
      else {
        if (p < bufStart || p >= bufStart + buf.length) {
          val n = math.min(CHUNK.toLong, fileLen - p).toInt
          val a = new Array[Byte](n)
          rr.readFully(p, a)
          bufStart = p; buf = a
        }
        buf((p - bufStart).toInt) & 0xff
      }
  }

  /** Sequential InputStream view of a RangeReader from `startAt`. */
  private final class RRInputStream(rr: RangeReader, len: Long, startAt: Long)
      extends java.io.InputStream {
    private var pos = startAt
    private val one = new Array[Byte](1)
    override def read(): Int =
      if (pos >= len) -1 else { rr.readFully(pos, one); pos += 1; one(0) & 0xff }
    override def read(dst: Array[Byte], off: Int, n: Int): Int =
      if (n == 0) 0
      else if (pos >= len) -1
      else {
        val m = math.min(n.toLong, len - pos).toInt
        val a = if (off == 0 && m == dst.length) dst else new Array[Byte](m)
        rr.readFully(pos, a)
        if (!(a eq dst)) System.arraycopy(a, 0, dst, off, m)
        pos += m
        m
      }
  }

  /** Position-tracking record scanner with 1-byte pushback. */
  private final class StreamScanner(in: java.io.InputStream) {
    private val pb = new java.io.PushbackInputStream(in, 8)
    var pos: Long = 0L
    def readByte(): Int = { val b = pb.read(); if (b >= 0) pos += 1; b }
    def unread(b: Int): Unit = { pb.unread(b); pos -= 1 }
    def readFully(dst: Array[Byte]): Unit = {
      var o = 0
      while (o < dst.length) {
        val n = pb.read(dst, o, dst.length - o)
        require(n >= 0, s"EOF mid-record at $pos")
        o += n; pos += n
      }
    }
    def skipFully(n: Long): Unit = {
      var left = n
      val tmp = new Array[Byte](1 << 16)
      while (left > 0) {
        val m = pb.read(tmp, 0, math.min(left, tmp.length.toLong).toInt)
        require(m >= 0, s"EOF mid-skip at $pos")
        left -= m; pos += m
      }
    }
    /** One CRLF-terminated line (CR stripped), capped at `max` bytes. */
    def readLine(max: Int): String = {
      val sb = new java.lang.StringBuilder(64)
      var b = readByte()
      while (b >= 0 && b != '\n') {
        require(sb.length < max, s"header line exceeds $max bytes at $pos")
        sb.append(b.toChar)
        b = readByte()
      }
      require(b == '\n', s"EOF inside header line at $pos")
      if (sb.length > 0 && sb.charAt(sb.length - 1) == '\r') sb.setLength(sb.length - 1)
      sb.toString
    }
  }
}
