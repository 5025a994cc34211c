package graft.sources

import java.io.RandomAccessFile
import java.net.{HttpURLConnection, URI}

/** Offset-addressable byte source — the one abstraction the NetCDF
  * reader needs. The reference opens local paths *or* THREDDS/OPeNDAP
  * URLs through the same call
  * (/root/reference/run/utilities/adcirc_dask_utilities.py:36-44);
  * here the same polymorphism lives at the byte layer: a local file is
  * a `RandomAccessFile`, a remote file is HTTP `Range:` requests. Both
  * are cheap to open per-task, so [[Ingest]]'s record-striped executor
  * reads work identically against either — no driver-side download, no
  * shared handle.
  */
trait RangeReader extends AutoCloseable {
  def length: Long
  /** Fill `dst` from `offset`; throws if the range extends past EOF. */
  def readFully(offset: Long, dst: Array[Byte]): Unit
}

object RangeReader {
  /** `http(s)://` → range-request reader; anything else → local file. */
  def open(path: String): RangeReader =
    if (path.startsWith("http://") || path.startsWith("https://")) new HttpRangeReader(path)
    else new FileRangeReader(path)

  /** Scheme-dispatching open for Hadoop-visible URIs: `http(s)` keeps
    * the native range reader (a plain static host needs no Hadoop
    * client); bare paths and `file:` URIs use RandomAccessFile; every
    * other scheme (hdfs://, s3a://, …) goes through the Hadoop
    * FileSystem client — positioned reads against an FSDataInputStream,
    * the same API DFSClient/S3A serve Spark's own parquet scans with.
    * `conf` arrives as a plain Map so tasks can rebuild a Configuration
    * without serializing one (Configuration is not Serializable). */
  def openHadoop(path: String, conf: Map[String, String]): RangeReader =
    if (path.startsWith("http://") || path.startsWith("https://")) new HttpRangeReader(path)
    else if (path.startsWith("file:"))
      new FileRangeReader(new java.net.URI(path).getPath)
    else if (!path.contains("://")) new FileRangeReader(path)
    else {
      val c = new org.apache.hadoop.conf.Configuration(false)
      conf.foreach { case (k, v) => c.set(k, v) }
      new HadoopRangeReader(path, c)
    }
}

/** Hadoop `FileSystem` positioned reads — the object-store-correct leg
  * of [[RangeReader.openHadoop]]. One open stream per reader (one per
  * task); `readFully(position, …)` is the pread API every Hadoop
  * filesystem implements natively (HDFS short-circuit, S3A ranged GET). */
final class HadoopRangeReader(path: String, conf: org.apache.hadoop.conf.Configuration)
    extends RangeReader {
  private val p = new org.apache.hadoop.fs.Path(path)
  private val fs = p.getFileSystem(conf)
  val length: Long = fs.getFileStatus(p).getLen
  private val in = fs.open(p)
  def readFully(offset: Long, dst: Array[Byte]): Unit = in.readFully(offset, dst)
  def close(): Unit = in.close()
}

final class FileRangeReader(path: String) extends RangeReader {
  private val raf = new RandomAccessFile(path, "r")
  def length: Long = raf.length()
  def readFully(offset: Long, dst: Array[Byte]): Unit = {
    raf.seek(offset); raf.readFully(dst)
  }
  def close(): Unit = raf.close()
}

/** One GET with a `Range: bytes=a-b` header per read — the access
  * pattern a COG/NetCDF-over-HTTP server (THREDDS fileServer, S3, any
  * static host) is built for. Stateless between reads: each task opens
  * its own reader from the URL string, so nothing here is serialized.
  * Transient failures (IO resets, 5xx, 408/429) retry with backoff —
  * at wide task fan-out a single socket reset should cost one backoff,
  * not a whole Spark task attempt; definitive statuses (404, a 200 that
  * ignored Range) fail immediately. */
final class HttpRangeReader(url: String) extends RangeReader {
  /** HEAD Content-Length when the server provides it; otherwise a 1-byte
    * ranged GET whose Content-Range carries the total (`bytes 0-0/N`) —
    * some servers (including the JDK's) omit lengths on HEAD. */
  val length: Long = withRetry {
    val head = connect("HEAD", None)
    val viaHead =
      try {
        val code = head.getResponseCode
        throwIfTransient(code, s"HEAD $url")
        require(code / 100 == 2, s"HEAD $url -> $code")
        head.getContentLengthLong
      } finally head.disconnect()
    if (viaHead >= 0) viaHead
    else {
      val probe = connect("GET", Some((0L, 0L)))
      try {
        throwIfTransient(probe.getResponseCode, s"GET $url (length probe)")
        require(probe.getResponseCode == 206, s"$url: server does not honor Range requests")
        val cr = Option(probe.getHeaderField("Content-Range")).getOrElse("")
        val total = cr.split('/').lastOption.flatMap(_.toLongOption)
          .getOrElse(throw new IllegalArgumentException(s"$url: unparseable Content-Range '$cr'"))
        probe.getInputStream.close()
        total
      } finally probe.disconnect()
    }
  }

  def readFully(offset: Long, dst: Array[Byte]): Unit = {
    if (dst.length == 0) return
    withRetry {
      val c = connect("GET", Some((offset, offset + dst.length - 1)))
      try {
        val code = c.getResponseCode
        throwIfTransient(code, s"GET $url range bytes=$offset-${offset + dst.length - 1}")
        require(code == 206 || code == 200,
          s"GET $url range bytes=$offset-${offset + dst.length - 1} -> $code")
        val in = c.getInputStream
        try {
          // a 200 (server ignored Range) would stream from 0 — reject, the
          // whole point is not transferring the file
          require(code == 206, s"$url: server does not honor Range requests")
          var read = 0
          while (read < dst.length) {
            val n = in.read(dst, read, dst.length - read)
            require(n >= 0, s"$url: EOF at ${offset + read}, wanted ${dst.length} from $offset")
            read += n
          }
        } finally in.close()
      } finally c.disconnect()
    }
  }

  /** 5xx and the two retry-me 4xx codes surface as IOException so the
    * retry loop below sees exactly the transient class. */
  private def throwIfTransient(code: Int, what: String): Unit =
    if (code >= 500 || code == 408 || code == 429)
      throw new java.io.IOException(s"$what -> $code (transient)")

  private def withRetry[A](f: => A): A = {
    var last: Throwable = null
    var i = 0
    while (i < 3) {
      try return f
      catch {
        case e: java.io.IOException =>
          last = e
          i += 1
          if (i < 3) Thread.sleep(250L << i)
      }
    }
    throw last
  }

  private def connect(method: String, range: Option[(Long, Long)]): HttpURLConnection = {
    val c = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    c.setConnectTimeout(15000); c.setReadTimeout(60000)
    range.foreach { case (a, b) => c.setRequestProperty("Range", s"bytes=$a-$b") }
    c
  }

  def close(): Unit = () // nothing held between requests
}
