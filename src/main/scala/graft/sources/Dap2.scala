package graft.sources

import java.io.ByteArrayOutputStream
import java.net.{HttpURLConnection, URI}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal DAP2 (OPeNDAP) client — the protocol behind the reference's
  * canonical remote input: a THREDDS `dodsC` URL opened via
  * `xr.open_dataset(url)` (/root/reference/run/utilities/
  * adcirc_dask_utilities.py:36-44). A DAP endpoint does NOT serve
  * container bytes (so [[RangeReader]] cannot read it); the server
  * parses the file and ships arrays on demand:
  *
  *  - `GET url.dds`  → Dataset Descriptor Structure: names/types/shapes
  *  - `GET url.das`  → Dataset Attribute Structure: per-var attributes
  *    (`_FillValue`, CF `units`, …) + `DODS_EXTRA.Unlimited_Dimension`
  *  - `GET url.dods?var[a:b][c:d]` → the constrained DDS text, a
  *    `Data:` separator line, then the array XDR-encoded (element count
  *    sent twice as big-endian UInt32, then big-endian values)
  *
  * Implemented against the public DAP 2.0 specification (ESE-RFC-004).
  * The subset covers the NetCDF classic model THREDDS/Hyrax serve for
  * ADCIRC output: top-level atomic arrays, Grids (whose array member is
  * projected as `grid.array`, maps promoted to first-class coordinates
  * the way xarray does), and Structures (members flattened under dotted
  * names, last component promoted when unshadowed — the grouped-file
  * shape Hyrax serves), and Sequences (the protocol's relational
  * construct, decoded straight to a DataFrame with the constraint
  * expression — projection + selection — executed server-side).
  *
  * Scale shape: identical to the file-backed readers — the tiny
  * DDS+DAS parse happens once per task open, and each
  * [[Dap2NcFile.readRecord]] is ONE ranged request
  * (`zeta[rec:rec][0:n-1]`), so [[Ingest]]'s record-striped executor
  * reads map 1:1 onto DAP constraint expressions with no driver
  * materialization. The server does the subsetting; the wire carries
  * exactly the requested record.
  */
object Dap2 {

  /** The canonical OPeNDAP URL shapes (THREDDS `dodsC`, GrADS/Hyrax
    * `dods`/`opendap` mounts). A `dap2+http(s)://` prefix forces the
    * protocol for non-standard mounts; a `raw+http(s)://` prefix forces
    * it OFF — the escape hatch for a plain file served from a path that
    * merely contains `/dods/` (e.g. an object-store bucket named so),
    * which then reads via [[RangeReader]] like any other HTTP file. */
  def isDapUrl(url: String): Boolean =
    url.startsWith("dap2+http://") || url.startsWith("dap2+https://") ||
      (!isForcedRaw(url) &&
        (url.startsWith("http://") || url.startsWith("https://")) &&
        (url.contains("/dodsC/") || url.contains("/dods/") || url.contains("/opendap/")))

  def isForcedRaw(url: String): Boolean =
    url.startsWith("raw+http://") || url.startsWith("raw+https://")

  def stripForce(url: String): String = url.stripPrefix("dap2+").stripPrefix("raw+")

  // ---- wire ------------------------------------------------------------

  /** Non-200 terminal status, with the redirect target when the server
    * sent one — so a refused cross-protocol hop is diagnosable. */
  final case class HttpStatusException(code: Int, url: String, location: Option[String])
    extends RuntimeException(
      s"GET $url -> $code${location.map(l => s" (Location: $l)").getOrElse("")}")

  /** A DAP `Error { … }` document (served with HTTP 200). Classification
    * MUST read the structured fields, never `getMessage`: the message
    * embeds the URL, and a port like `:24041` or a date-stamped path like
    * `/20240404/fort.63.nc` would otherwise make a backend-failure Error
    * doc read as "not found" (dropping `_FillValue`, so −99999 sentinels
    * ingest as real values — the exact hazard the DAS branch guards).
    *
    * @param url  the endpoint that answered (diagnostics only)
    * @param body the Error document text, URL-free (first 500 bytes)
    * @param code the document's own `code = NNN;` field when present —
    *             THREDDS/Hyrax emit HTTP-style codes here
    */
  final class DapErrorException(val url: String, val body: String, val code: Option[Int])
    extends IllegalArgumentException(s"$url returned a DAP error:\n$body") {
    /** Definitive "this document does not exist" per the Error doc ITSELF:
      * a parsed `code = 404`, or — only when the server omitted the code
      * field — not-found phrasing in the body (never the URL-bearing
      * message). A present non-404 code is a definitive non-answer
      * (backend failure, auth, …) regardless of body phrasing. */
    def notFound: Boolean = code match {
      case Some(c) => c == 404
      case None =>
        val b = body.toLowerCase
        b.contains("no such") || b.contains("not found") || b.contains("does not exist")
    }
  }

  private val ErrorCodeRe = """(?is).*?\bcode\s*=\s*(\d+)\s*;.*""".r

  private[sources] def parseDapErrorCode(body: String): Option[Int] = body match {
    case ErrorCodeRe(n) => scala.util.Try(n.toInt).toOption
    case _ => None
  }

  private[sources] def fetchBytes(url: String, maxRedirects: Int = 5): Array[Byte] = {
    val c = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod("GET")
    c.setInstanceFollowRedirects(true) // same-protocol hops
    c.setConnectTimeout(15000); c.setReadTimeout(120000)
    try {
      val code = c.getResponseCode
      if (code == 301 || code == 302 || code == 303 || code == 307 || code == 308) {
        // HttpURLConnection never follows cross-protocol redirects — the
        // common THREDDS front door is an http->https 302 — so follow the
        // Location header ourselves, bounded
        val loc = Option(c.getHeaderField("Location")).filter(_.nonEmpty)
        if (loc.isEmpty || maxRedirects <= 0) throw HttpStatusException(code, url, loc)
        return fetchBytes(URI.create(url).resolve(loc.get).toString, maxRedirects - 1)
      }
      if (code != 200) throw HttpStatusException(code, url, None)
      val in = c.getInputStream
      try {
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toByteArray
      } finally in.close()
    } finally c.disconnect()
  }

  /** DAP servers report failures as an `Error { … }` document with HTTP
    * 200 — surface those as [[DapErrorException]], not parse noise. */
  private[sources] def fetchText(url: String): String = {
    val t = new String(fetchBytes(url), "US-ASCII")
    if (t.startsWith("Error")) {
      val body = t.take(500)
      throw new DapErrorException(url, body, parseDapErrorCode(body))
    }
    t
  }

  /** Transient = worth a retry: IO errors, 5xx, and the two 4xx codes
    * that mean "try again" (408 Request Timeout, 429 Too Many Requests —
    * a rate limiter under our 32-wide task fan-out). Everything else —
    * 200, 404, other 4xx, a DAP Error document — is a definitive answer. */
  private def isTransient(e: Throwable): Boolean = e match {
    case HttpStatusException(code, _, _) => code >= 500 || code == 408 || code == 429
    case _: java.io.IOException => true
    case _ => false
  }

  private def retrying[A](attempts: Int)(f: => A): A = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case e if isTransient(e) =>
          last = e
          i += 1
          if (i < attempts) Thread.sleep(250L << i)
      }
    }
    throw last
  }

  private[sources] def fetchTextRetrying(url: String, attempts: Int = 3): String =
    retrying(attempts)(fetchText(url))

  private[sources] def fetchBytesRetrying(url: String, attempts: Int = 3): Array[Byte] =
    retrying(attempts)(fetchBytes(url))

  // ---- DDS -------------------------------------------------------------

  case class DapDim(name: String, size: Int)

  /** `proj` is the constraint-expression path — the bare name for a
    * top-level array, `grid.member` for Grid members. */
  case class DapVar(name: String, typ: String, dims: Seq[DapDim], proj: String)

  /** One member of a DAP2 Sequence — atomic scalar only (the tabular
    * station/point-obs shape Hyrax and ERDDAP serve). */
  case class DapSeqMember(name: String, typ: String)

  /** A DAP2 Sequence: the protocol's relational construct — an unbounded
    * ordered bag of instances, each one value per member. */
  case class DapSeq(name: String, members: Seq[DapSeqMember])

  case class Dds(name: String, vars: Seq[DapVar], seqs: Seq[DapSeq] = Nil)

  private val atomicTypes = Set(
    "Byte", "Int16", "UInt16", "Int32", "UInt32", "Float32", "Float64", "String", "Url")

  /** Whitespace/punct tokenizer that keeps quoted strings whole (quotes
    * retained so the DAS parser can tell `"42"` from `42`). */
  private[sources] def tokenize(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) { out += sb.toString; sb.clear() }
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (ch == '"') {
        flush()
        val s = new StringBuilder("\"")
        i += 1
        while (i < text.length && text.charAt(i) != '"') {
          if (text.charAt(i) == '\\' && i + 1 < text.length) { s.append(text.charAt(i + 1)); i += 2 }
          else { s.append(text.charAt(i)); i += 1 }
        }
        i += 1 // closing quote
        out += s.append('"').toString
      } else if (ch.isWhitespace) { flush(); i += 1 }
      else if ("{}[]=;:,".indexOf(ch) >= 0) { flush(); out += ch.toString; i += 1 }
      else { sb.append(ch); i += 1 }
    }
    flush(); out.result()
  }

  private final class Cursor(toks: Vector[String], what: String) {
    private var at = 0
    def peek: String = if (at < toks.length) toks(at) else
      throw new IllegalArgumentException(s"$what: unexpected end of input")
    def next(): String = { val t = peek; at += 1; t }
    def expect(t: String): Unit = {
      val g = next()
      require(g == t, s"$what: expected '$t', got '$g' at token $at")
    }
    def done: Boolean = at >= toks.length
  }

  def parseDds(text: String): Dds = {
    val c = new Cursor(tokenize(text), "DDS")
    c.expect("Dataset"); c.expect("{")
    val vars = Vector.newBuilder[DapVar]
    val seqs = Vector.newBuilder[DapSeq]
    val gridMaps = Vector.newBuilder[(String, DapVar)] // (grid name, map var)

    def arrayDims(): Seq[DapDim] = {
      val dims = Vector.newBuilder[DapDim]
      while (c.peek == "[") {
        c.expect("[")
        val first = c.next()
        if (c.peek == "=") { c.expect("="); dims += DapDim(first, c.next().toInt) }
        else dims += DapDim("", first.toInt) // anonymous size-only dim
        c.expect("]")
      }
      dims.result()
    }

    /** One atomic declaration: `Type name [dims]* ;` → the var. */
    def atomicDecl(prefix: String): DapVar = {
      val typ = c.next()
      require(atomicTypes.contains(typ), s"DDS: expected atomic type, got '$typ'")
      val name = c.next()
      val dims = arrayDims()
      c.expect(";")
      DapVar(name, typ, dims, if (prefix.isEmpty) name else s"$prefix.$name")
    }

    while (c.peek != "}") {
      c.peek match {
        case "Grid" =>
          c.expect("Grid"); c.expect("{")
          c.expect("ARRAY"); c.expect(":")
          val arr = atomicDecl("") // proj patched once the grid name is known
          c.expect("MAPS"); c.expect(":")
          val maps = Vector.newBuilder[DapVar]
          while (c.peek != "}") maps += atomicDecl("")
          c.expect("}")
          val gridName = c.next(); c.expect(";")
          // the grid's array member IS the variable (NetCDF model); maps
          // are promoted to first-class coordinates after the full parse
          vars += arr.copy(name = gridName, proj = s"$gridName.${arr.name}")
          maps.result().foreach(m => gridMaps += gridName -> m)
        case "Structure" =>
          // flatten members under dotted names (what a grouped NetCDF-4
          // file serves through Hyrax); bare-name promotion happens with
          // the grid maps below
          def structDecl(): Seq[DapVar] = {
            c.expect("Structure"); c.expect("{")
            val members = Vector.newBuilder[DapVar]
            while (c.peek != "}") {
              c.peek match {
                case "Structure" => members ++= structDecl()
                case "Grid" | "Sequence" => throw new IllegalArgumentException(
                  s"DDS: ${c.peek} nested in a Structure is outside the subset this client speaks")
                case _ => members += atomicDecl("")
              }
            }
            c.expect("}")
            val sname = c.next()
            require(c.peek == ";",
              "DDS: Structure arrays are outside the subset this client speaks")
            c.expect(";")
            members.result().map(m =>
              m.copy(name = s"$sname.${m.name}", proj = s"$sname.${m.proj}"))
          }
          structDecl().foreach { m =>
            // same promotion pool as grid maps: the LAST path component
            // becomes the variable name when nothing shadows it
            val bare = m.name.substring(m.name.lastIndexOf('.') + 1)
            gridMaps += m.name.dropRight(bare.length + 1) -> m.copy(name = bare)
          }
        case "Sequence" =>
          // DAP2's relational construct: an unbounded bag of instances,
          // one scalar per member — decoded by [[parseDodsSequence]] and
          // surfaced as a DataFrame by [[sequenceToDataFrame]]. Flat
          // atomic members only; a nested constructor fails by name.
          c.expect("Sequence"); c.expect("{")
          val members = Vector.newBuilder[DapSeqMember]
          while (c.peek != "}") {
            c.peek match {
              case t @ ("Sequence" | "Structure" | "Grid") =>
                throw new IllegalArgumentException(
                  s"DDS: $t nested in a Sequence is outside the subset this client speaks")
              case _ =>
                val typ = c.next()
                require(atomicTypes.contains(typ),
                  s"DDS: expected atomic Sequence member type, got '$typ'")
                val mname = c.next()
                require(c.peek == ";",
                  "DDS: Sequence member arrays are outside the subset this client speaks")
                c.expect(";")
                members += DapSeqMember(mname, typ)
            }
          }
          c.expect("}")
          val sname = c.next(); c.expect(";")
          seqs += DapSeq(sname, members.result())
        case _ => vars += atomicDecl("")
      }
    }
    c.expect("}")
    val dsName = c.next()
    // Grid map vectors become first-class coordinate variables under
    // their own names (xarray's promotion: a served Grid's lon/lat/time
    // maps read without dotted paths). A map whose bare name is taken —
    // by a top-level variable, another grid, or an identically-named map
    // of an earlier grid (the shared-dimension case) — keeps the dotted
    // `grid.map` name instead; the projection is always dotted.
    val base = vars.result()
    val taken = scala.collection.mutable.Set.from(base.map(_.name))
    val promoted = gridMaps.result().flatMap { case (g, m) =>
      if (taken.add(m.name)) Some(m.copy(name = m.name, proj = s"$g.${m.name}"))
      else if (taken.add(s"$g.${m.name}"))
        Some(m.copy(name = s"$g.${m.name}", proj = s"$g.${m.name}"))
      else None
    }
    Dds(dsName, base ++ promoted, seqs.result())
  }

  // ---- DAS -------------------------------------------------------------

  /** container → attribute → raw value (strings unquoted; multi-valued
    * attributes comma-joined). Nested sub-containers are flattened with
    * dotted names. */
  def parseDas(text: String): Map[String, Map[String, String]] = {
    val c = new Cursor(tokenize(text), "DAS")
    c.expect("Attributes"); c.expect("{")
    val out = Map.newBuilder[String, Map[String, String]]

    def unquote(t: String): String =
      if (t.length >= 2 && t.head == '"' && t.last == '"') t.substring(1, t.length - 1) else t

    def container(name: String): Unit = {
      c.expect("{")
      val attrs = Map.newBuilder[String, String]
      while (c.peek != "}") {
        val first = c.next()
        if (atomicTypes.contains(first)) {
          val attrName = c.next()
          val vals = Vector.newBuilder[String]
          var cont = true
          while (cont) {
            vals += unquote(c.next())
            if (c.peek == ",") c.expect(",") else { c.expect(";"); cont = false }
          }
          attrs += attrName -> vals.result().mkString(",")
        } else container(s"$name.$first") // nested attribute container
      }
      c.expect("}")
      out += name -> attrs.result()
    }

    while (c.peek != "}") container(c.next())
    c.expect("}")
    out.result()
  }

  // ---- .dods XDR -------------------------------------------------------

  private val DataMarker = "\nData:\n".getBytes("US-ASCII")
  private val DataMarkerCrlf = "\nData:\r\n".getBytes("US-ASCII")

  private def indexOf(hay: Array[Byte], needle: Array[Byte]): Int = {
    var i = 0
    while (i <= hay.length - needle.length) {
      var j = 0
      while (j < needle.length && hay(i + j) == needle(j)) j += 1
      if (j == needle.length) return i + needle.length
      i += 1
    }
    -1
  }

  /** Decode ONE projected atomic array from a `.dods` response body:
    * skip the constrained-DDS text to the `Data:` line, read the
    * twice-sent element count, then `expected` big-endian values. */
  private[graft] def parseDodsArray(body: Array[Byte], typ: String,
                                      expected: Long): Array[Double] = {
    val at = {
      val a = indexOf(body, DataMarker)
      if (a >= 0) a else indexOf(body, DataMarkerCrlf)
    }
    require(at >= 0, "malformed .dods response: no 'Data:' separator")
    val bb = ByteBuffer.wrap(body, at, body.length - at).order(ByteOrder.BIG_ENDIAN)
    val n = bb.getInt().toLong & 0xffffffffL
    val n2 = bb.getInt().toLong & 0xffffffffL
    require(n == n2, s".dods array counts disagree: $n vs $n2")
    require(n == expected, s".dods returned $n elements, constraint asked for $expected")
    val out = new Array[Double](n.toInt)
    var i = 0
    typ match {
      case "Float64" => while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
      case "Float32" => while (i < out.length) { out(i) = bb.getFloat().toDouble; i += 1 }
      case "Int32"   => while (i < out.length) { out(i) = bb.getInt().toDouble; i += 1 }
      case "UInt32"  => while (i < out.length) { out(i) = (bb.getInt().toLong & 0xffffffffL).toDouble; i += 1 }
      // XDR promotes 16-bit integers to 4-byte words on the wire
      case "Int16"   => while (i < out.length) { out(i) = bb.getInt().toDouble; i += 1 }
      case "UInt16"  => while (i < out.length) { out(i) = (bb.getInt() & 0xffff).toDouble; i += 1 }
      case "Byte"    => while (i < out.length) { out(i) = (bb.get() & 0xff).toDouble; i += 1 }
      case other =>
        throw new IllegalArgumentException(s"DAP2 array type $other not decodable as numbers")
    }
    out
  }

  // ---- Sequence (DAP2 §7.3.2: the relational construct) ----------------

  /** XDR instance framing: each Sequence instance is preceded by a
    * start-of-instance word, the stream ends with end-of-sequence. */
  private val StartOfInstance = 0x5A000000
  private val EndOfSequence = 0xA5000000

  /** Decode one member value. XDR promotes every integer narrower than 32
    * bits to a 4-byte word (value in the low-order bits); String/Url are
    * counted bytes padded to a 4-byte boundary. */
  private def readSeqValue(bb: ByteBuffer, typ: String): Any = typ match {
    case "Float64" => bb.getDouble()
    case "Float32" => bb.getFloat()
    case "Int32"   => bb.getInt()
    case "UInt32"  => bb.getInt().toLong & 0xffffffffL
    case "Int16"   => bb.getInt()
    case "UInt16"  => bb.getInt() & 0xffff
    case "Byte"    => bb.getInt() & 0xff
    case "String" | "Url" =>
      val len = bb.getInt()
      require(len >= 0 && len <= bb.remaining(),
        s"sequence String length $len exceeds remaining stream")
      val bytes = new Array[Byte](len)
      bb.get(bytes)
      bb.position(bb.position() + ((4 - (len % 4)) % 4)) // XDR pad
      new String(bytes, "UTF-8")
    case other =>
      throw new IllegalArgumentException(s"DAP2 Sequence member type $other not decodable")
  }

  /** Decode a `.dods` Sequence body: the response's OWN constrained DDS
    * (the text before `Data:`) names the projected members and their
    * order — a server-side projection `?seq.a,seq.c` changes both, so the
    * wire text, not the caller's unconstrained idea of the schema, drives
    * the decode. Returns the projected sequence and its rows. */
  private[graft] def parseDodsSequence(body: Array[Byte]): (DapSeq, Seq[Seq[Any]]) = {
    val at = {
      val a = indexOf(body, DataMarker)
      if (a >= 0) a else indexOf(body, DataMarkerCrlf)
    }
    require(at >= 0, "malformed .dods response: no 'Data:' separator")
    val constrained = parseDds(new String(body, 0, at, "US-ASCII"))
    require(constrained.seqs.nonEmpty, ".dods response carries no Sequence")
    require(constrained.seqs.length == 1,
      "multiple Sequences in one .dods response are outside the subset this client speaks")
    val seq = constrained.seqs.head
    val bb = ByteBuffer.wrap(body, at, body.length - at).order(ByteOrder.BIG_ENDIAN)
    val rows = Vector.newBuilder[Seq[Any]]
    var marker = bb.getInt()
    while (marker == StartOfInstance) {
      rows += seq.members.map(m => readSeqValue(bb, m.typ))
      marker = bb.getInt()
    }
    require(marker == EndOfSequence,
      f"sequence stream: unexpected marker 0x$marker%08X (want start 0x5A000000 / end 0xA5000000)")
    (seq, rows.result())
  }

  /** DAP2 type → Spark type for the tabular surface. */
  private def seqSparkType(typ: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    typ match {
      case "Float64"                            => DoubleType
      case "Float32"                            => FloatType
      case "UInt32"                             => LongType
      case "Byte" | "Int16" | "UInt16" | "Int32" => IntegerType
      case "String" | "Url"                     => StringType
      case other =>
        throw new IllegalArgumentException(s"DAP2 Sequence member type $other has no Spark type")
    }
  }

  /** A DAP2 Sequence as a DataFrame — the Spark-native reading of the
    * protocol's relational construct (reference boundary: the xarray path
    * at run/utilities/adcirc_dask_utilities.py:36-44 refuses Sequences;
    * this client speaks them, SURVEY §2.1 S12).
    *
    * `ce` is a DAP constraint expression passed through VERBATIM
    * (`seq.a,seq.b&seq.a>5`) — projection AND selection execute on the
    * server, so the wire carries exactly the surviving fields/instances:
    * pushdown by protocol, not plan rewrite. The decoded schema follows
    * the response's own constrained DDS.
    *
    * Scale shape: a Sequence endpoint is one unseekable stream (no
    * hyperslab addressing), so one fetch decodes it — the right shape for
    * the station/point-obs tables Sequences carry (small next to gridded
    * fields). The rows parallelize into the session default partitioning
    * for whatever joins follow; a corpus of MANY endpoints fans out one
    * task per URL upstream, the same striping [[Ingest]] uses. */
  def sequenceToDataFrame(spark: org.apache.spark.sql.SparkSession, rawUrl: String,
                          ce: Option[String] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.types.StructType
    import org.apache.spark.sql.{Row, types}
    val base = stripForce(rawUrl)
    val query = ce.map { c =>
      "?" + c.replace("[", "%5B").replace("]", "%5D")
        .replace("<", "%3C").replace(">", "%3E").replace(" ", "%20")
    }.getOrElse("")
    val (seq, rows) = parseDodsSequence(fetchBytesRetrying(s"$base.dods$query"))
    val schema = StructType(seq.members.map(m =>
      types.StructField(m.name, seqSparkType(m.typ), nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(Row.fromSeq), math.max(1, rows.length / 10000)),
      schema)
  }
}

/** [[NcFile]] over a DAP2 endpoint: the reference's
  * `xr.open_dataset("…/thredds/dodsC/…/fort.63.nc")` shape, behind the
  * same trait the CDF/HDF5 readers implement — [[Ingest]] is unchanged. */
final class Dap2NcFile(rawUrl: String) extends NcFile {
  import Dap2._

  private val base = Dap2.stripForce(rawUrl)

  private val dds: Dds = parseDds(Dap2.fetchTextRetrying(s"$base.dds"))
  private val das: Map[String, Map[String, String]] =
    try parseDas(Dap2.fetchTextRetrying(s"$base.das"))
    catch {
      // ONLY a definitive "this endpoint has no DAS" reads as empty
      // attributes: HTTP 404, or a DAP Error document whose STRUCTURED
      // code/body says not-found (servers answer missing ancillary docs
      // with an Error body under HTTP 200). Anything else — transient
      // IO/timeouts (after retries) or a backend-failure Error doc —
      // PROPAGATES: swallowing it would silently drop `_FillValue`, and
      // fill sentinels (-99999) would ingest as real values downstream
      // of the mask step. Classification deliberately never touches
      // `getMessage` — the message carries the URL, and a port/path
      // containing "404" must not change ingest semantics.
      case HttpStatusException(404, _, _) => Map.empty
      case e: DapErrorException if e.notFound => Map.empty
    }

  private def v(name: String): DapVar = dds.vars.find(_.name == name)
    .getOrElse(throw new IllegalArgumentException(
      s"no variable '$name' (has: ${dds.vars.map(_.name).mkString(", ")})"))

  /** The unlimited (record/time) dimension: `DODS_EXTRA` when the server
    * declares it (THREDDS does), a dimension named `time` second, else
    * none — and then rank ≥ 2 means (time, node), mirroring the HDF5
    * fallback. */
  private val unlimited: Option[String] =
    das.get("DODS_EXTRA").flatMap(_.get("Unlimited_Dimension"))
      .orElse {
        val dimNames = dds.vars.flatMap(_.dims.map(_.name)).toSet
        if (dimNames.contains("time")) Some("time") else None
      }

  def varNames: Seq[String] = dds.vars.map(_.name)

  def isRecordVar(name: String): Boolean = {
    val dv = v(name)
    unlimited match {
      case Some(u) => dv.dims.headOption.exists(_.name == u)
      case None    => dv.dims.length >= 2
    }
  }

  def numRecs: Int =
    dds.vars.filter(dv => isRecordVar(dv.name))
      .map(_.dims.head.size).maxOption.getOrElse(0)

  private def attrsOf(name: String): Map[String, String] =
    das.getOrElse(name, das.getOrElse(v(name).proj, Map.empty))

  def fillValue(name: String): Option[Double] =
    attrsOf(name).get("_FillValue").orElse(attrsOf(name).get("missing_value"))
      .flatMap(_.toDoubleOption)

  def strAttr(name: String, attr: String): Option[String] =
    attrsOf(name).get(attr).filter(_.nonEmpty)

  private def fetchArray(dv: DapVar, constraint: String, expected: Long): Array[Double] = {
    // brackets are illegal unencoded in a URI query; DAP servers accept
    // the percent-encoded hyperslab (what libdap-based clients send)
    val enc = constraint.replace("[", "%5B").replace("]", "%5D")
    // retried like the metadata fetches: this is the request issued
    // thousands of times (once per record per task), so a single
    // transient 503/socket reset should cost one backoff, not the task
    val body = fetchBytesRetrying(s"$base.dods?$enc")
    parseDodsArray(body, dv.typ, expected)
  }

  def readFixed(name: String): Array[Double] = {
    val dv = v(name)
    fetchArray(dv, dv.proj, dv.dims.map(_.size.toLong).product.max(1L))
  }

  def readRecord(name: String, rec: Int): Array[Double] = {
    val dv = v(name)
    require(dv.dims.nonEmpty, s"'$name' is scalar, not a record variable")
    val hyperslab = s"[$rec:$rec]" +
      dv.dims.drop(1).map(d => s"[0:${d.size - 1}]").mkString
    fetchArray(dv, s"${dv.proj}$hyperslab", dv.dims.drop(1).map(_.size.toLong).product.max(1L))
  }

  def close(): Unit = () // stateless between requests
}
