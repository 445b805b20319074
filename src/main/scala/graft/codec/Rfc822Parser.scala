package graft.codec

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer
import java.security.MessageDigest
import java.sql.Timestamp
import java.time.{LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.{DateTimeFormatter, DateTimeFormatterBuilder}
import java.time.temporal.ChronoField
import java.util.Locale

import scala.collection.mutable

import graft.model.{Attachment, EmailDoc, Mailbox}

/** Pure-Scala RFC-822/MIME email parser.
  *
  * Reimplements the subset of Python's `email` stdlib behavior the
  * reference depends on (ref: message_from_bytes at ingest_enron.py:73 and
  * the downstream field extraction at ingest_enron.py:70-140):
  *
  *  - header block parse with folded continuation lines; duplicate header
  *    names newline-joined under a lowercased key (ingest_enron.py:106-111)
  *  - MIME multipart walk (nested), `text/plain` parts concatenated into
  *    `body` in walk order (ingest_enron.py:84-92)
  *  - parts with a filename become attachment METADATA only
  *    (ingest_enron.py:95-104)
  *  - quoted-printable and base64 transfer decodings
  *  - charset decode with ignore-errors semantics and a declared-charset →
  *    UTF-8 → Latin-1 fallback chain (smart_decode, app/common/utils.py:6-14)
  *  - RFC-2822 address-list parsing, lowercased/trimmed/de-emptied
  *    (parse_addresses, app/common/utils.py:16-23)
  *  - RFC-2822 date parsing: naive → assume UTC, anything unparsable →
  *    None (to_iso_date, app/common/utils.py:25-33)
  *  - dedupe key: Message-ID, else "hash_" + sha256 over a canonical
  *    rendering of (from,to,date,subject,body[:2000])
  *    (ingest_enron.py:113-120). The canonical form is OUR OWN fixed
  *    spec (SURVEY.md §7.4): cross-language hash-byte identity with
  *    Python json.dumps is explicitly a non-goal; dedupe *behavior* is.
  *
  * Everything here is deterministic and JVM-only so it can run inside
  * `mapPartitions` on executors with no driver round-trips.
  */
object Rfc822Parser {

  // ---------------------------------------------------------------- bytes

  private val CRLF = "\r\n"

  /** smart_decode: BOM-aware, declared-charset first, then strict UTF-8,
    * then a statistical 8-bit fallback (which never fails); malformed
    * input is dropped (Python errors="ignore").
    *
    * The fallback stands in for the reference's chardet call
    * (ingest_enron.py:20-32) with a deterministic heuristic instead of
    * a trained model: bytes in the C1 control range 0x80–0x9F are
    * unused control codes in ISO-8859-1 but printable punctuation in
    * windows-1252 (curly quotes, em-dash, €) — real Western mail that
    * fails UTF-8 and carries C1 bytes is what chardet labels
    * windows-1252. Pure latin-1 text decodes identically either way. */
  def smartDecode(bytes: Array[Byte], declared: Option[String] = None): String = {
    if (bytes.isEmpty) return ""
    // a BOM is authoritative: chardet reports the BOM charset before
    // any statistical guess, and a UTF-16/32 body would otherwise fall
    // through strict-UTF-8 into the 8-bit sniffer as NUL-ridden latin-1
    detectBom(bytes) match {
      case Some((cs, skip)) =>
        decodeWith(bytes.drop(skip), cs).getOrElse("")
      case None =>
        declared.flatMap(decodeWith(bytes, _))
          .orElse(decodeStrictUtf8(bytes))
          .getOrElse(decodeWith(bytes, sniff8Bit(bytes)).getOrElse(""))
    }
  }

  /** (charset, bom length) when the buffer opens with a known BOM.
    * UTF-32 forms share a prefix with UTF-16 — longest match first. */
  private[codec] def detectBom(bytes: Array[Byte]): Option[(String, Int)] = {
    def at(i: Int) = bytes(i) & 0xff
    if (bytes.length >= 3 && at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf)
      Some(("UTF-8", 3))
    else if (bytes.length >= 4 &&
        at(0) == 0xff && at(1) == 0xfe && at(2) == 0 && at(3) == 0)
      Some(("UTF-32LE", 4))
    else if (bytes.length >= 4 &&
        at(0) == 0 && at(1) == 0 && at(2) == 0xfe && at(3) == 0xff)
      Some(("UTF-32BE", 4))
    else if (bytes.length >= 2 && at(0) == 0xff && at(1) == 0xfe)
      Some(("UTF-16LE", 2))
    else if (bytes.length >= 2 && at(0) == 0xfe && at(1) == 0xff)
      Some(("UTF-16BE", 2))
    else None
  }

  /** Statistical charset choice for non-UTF-8 8-bit text. */
  private[codec] def sniff8Bit(bytes: Array[Byte]): String = {
    var hasC1 = false
    var i = 0
    while (i < bytes.length && !hasC1) {
      val b = bytes(i) & 0xff
      if (b >= 0x80 && b <= 0x9f) hasC1 = true
      i += 1
    }
    if (hasC1) "windows-1252" else "ISO-8859-1"
  }

  private def decodeStrictUtf8(bytes: Array[Byte]): Option[String] =
    try {
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      Some(dec.decode(ByteBuffer.wrap(bytes)).toString)
    } catch { case _: Exception => None }

  private def decodeWith(bytes: Array[Byte], name: String): Option[String] =
    try {
      val cs = Charset.forName(name.trim)
      val dec = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.IGNORE)
        .onUnmappableCharacter(CodingErrorAction.IGNORE)
      Some(dec.decode(ByteBuffer.wrap(bytes)).toString)
    } catch { case _: Exception => None }

  // -------------------------------------------------------------- headers

  /** An ordered header list (name case preserved for value lookup,
    * matching Python's Message.get semantics of first-match). */
  final case class Headers(entries: Vector[(String, String)]) {
    def get(name: String): Option[String] =
      entries.find(_._1.equalsIgnoreCase(name)).map(_._2)
    def getAll(name: String): Vector[String] =
      entries.filter(_._1.equalsIgnoreCase(name)).map(_._2)
    /** Lowercased-name map, duplicate values "\n"-joined and stripped
      * (ref: ingest_enron.py:106-111). */
    def folded: Map[String, String] =
      entries.groupBy(_._1.toLowerCase(Locale.ROOT))
        .map { case (k, vs) => k -> vs.map(_._2.trim).mkString("\n") }
  }

  /** Split a message into (headers, body-offset). Folded continuation
    * lines (leading SP/HT) are unfolded with a single space. */
  def parseHeaderBlock(text: String): (Headers, Int) = {
    val entries = Vector.newBuilder[(String, String)]
    var curName: String = null
    val curValue = new StringBuilder
    var i = 0
    val n = text.length
    var bodyStart = n

    def flush(): Unit = if (curName != null) {
      entries += curName -> curValue.toString.trim
      curName = null
      curValue.clear()
    }

    var done = false
    while (i < n && !done) {
      val eol = {
        val idx = text.indexOf('\n', i)
        if (idx < 0) n else idx
      }
      val rawLine = text.substring(i, eol)
      val line = if (rawLine.endsWith("\r")) rawLine.dropRight(1) else rawLine
      if (line.isEmpty) {
        // blank line terminates the header block
        flush()
        bodyStart = if (eol < n) eol + 1 else n
        done = true
      } else if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') && curName != null) {
        curValue.append(' ').append(line.trim)
      } else {
        val colon = line.indexOf(':')
        if (colon > 0) {
          flush()
          curName = line.substring(0, colon).trim
          curValue.append(line.substring(colon + 1).trim)
        } else {
          // malformed header line: Python's parser treats this as a defect
          // and starts the body here; do the same
          flush()
          bodyStart = i
          done = true
        }
      }
      i = eol + 1
    }
    if (!done) { flush(); bodyStart = n }
    (Headers(entries.result()), bodyStart)
  }

  // ----------------------------------------------------- MIME param parse

  /** Parse "type/subtype; key=value; key2="value 2"" into
    * (content-type-lowercased, params-lowercased-keys). */
  def parseContentType(value: String): (String, Map[String, String]) = {
    val parts = splitOutsideQuotes(value, ';')
    val ct = parts.headOption.map(_.trim.toLowerCase(Locale.ROOT)).getOrElse("")
    val params = parts.drop(1).flatMap { p =>
      val eq = p.indexOf('=')
      if (eq <= 0) None
      else {
        val k = p.substring(0, eq).trim.toLowerCase(Locale.ROOT)
        var v = p.substring(eq + 1).trim
        if (v.length >= 2 && v.startsWith("\"") && v.endsWith("\""))
          v = v.substring(1, v.length - 1)
        Some(k -> v)
      }
    }.toMap
    (ct, params)
  }

  private def splitOutsideQuotes(s: String, sep: Char): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    s.foreach { c =>
      if (c == '"') { inQ = !inQ; cur.append(c) }
      else if (c == sep && !inQ) { out += cur.toString; cur.clear() }
      else cur.append(c)
    }
    out += cur.toString
    out.result()
  }

  // --------------------------------------------------- transfer decodings

  def decodeQuotedPrintable(s: String): Array[Byte] = {
    val out = mutable.ArrayBuilder.make[Byte]
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 2 < s.length + 1) {
        if (i + 1 < s.length && (s.charAt(i + 1) == '\n' ||
            (s.charAt(i + 1) == '\r' && i + 2 <= s.length))) {
          // soft line break "=\n" or "=\r\n"
          if (s.charAt(i + 1) == '\r' && i + 2 < s.length && s.charAt(i + 2) == '\n') i += 3
          else i += 2
        } else if (i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
          out += Integer.parseInt(s.substring(i + 1, i + 3), 16).toByte
          i += 3
        } else { out += c.toByte; i += 1 }
      } else { out += c.toByte; i += 1 }
    }
    out.result()
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  def decodeBase64(s: String): Array[Byte] =
    try java.util.Base64.getMimeDecoder.decode(s)
    catch { case _: IllegalArgumentException => Array.emptyByteArray }

  // ------------------------------------------------------------ MIME tree

  /** One leaf part after the MIME walk. */
  final case class Part(
      contentType: String,
      params: Map[String, String],
      filename: Option[String],
      payload: Array[Byte])

  /** Depth-first MIME walk (leaf parts only, in document order) —
    * mirrors Python's Message.walk() order used at ingest_enron.py:84. */
  def walkParts(headers: Headers, bodyText: String): Vector[Part] = {
    val (ct, params) = parseContentType(
      headers.get("Content-Type").getOrElse("text/plain"))
    if (ct.startsWith("multipart/")) {
      params.get("boundary") match {
        case Some(b) if b.nonEmpty =>
          splitMultipart(bodyText, b).flatMap { partText =>
            val (ph, off) = parseHeaderBlock(partText)
            walkParts(ph, partText.substring(off))
          }
        case _ =>
          // no boundary → degrade to opaque single part, like Python's
          // defect handling
          Vector(leafPart(headers, ct, params, bodyText))
      }
    } else Vector(leafPart(headers, ct, params, bodyText))
  }

  private def leafPart(headers: Headers, ct: String,
      params: Map[String, String], bodyText: String): Part = {
    val cte = headers.get("Content-Transfer-Encoding")
      .map(_.trim.toLowerCase(Locale.ROOT)).getOrElse("")
    val payload: Array[Byte] = cte match {
      case "base64"           => decodeBase64(bodyText)
      case "quoted-printable" => decodeQuotedPrintable(bodyText)
      case _ => bodyText.getBytes(StandardCharsets.ISO_8859_1)
    }
    val filename = contentDispositionFilename(headers)
      .orElse(params.get("name")).map(_.trim).filter(_.nonEmpty)
    Part(ct, params, filename, payload)
  }

  private def contentDispositionFilename(headers: Headers): Option[String] =
    headers.get("Content-Disposition").flatMap { cd =>
      val (_, params) = parseContentType(cd)
      params.get("filename")
    }

  /** Split a multipart body on its boundary; returns the inner parts
    * (preamble/epilogue dropped). */
  def splitMultipart(body: String, boundary: String): Vector[String] = {
    val delim = "--" + boundary
    val lines = body.split("\n", -1)
    val parts = Vector.newBuilder[Vector[String]]
    var cur: mutable.ArrayBuffer[String] = null
    var i = 0
    var ended = false
    while (i < lines.length && !ended) {
      val line = lines(i)
      val trimmed = if (line.endsWith("\r")) line.dropRight(1) else line
      if (trimmed == delim) {
        if (cur != null) parts += cur.toVector
        cur = mutable.ArrayBuffer.empty[String]
      } else if (trimmed == delim + "--") {
        if (cur != null) parts += cur.toVector
        cur = null
        ended = true
      } else if (cur != null) {
        cur += line
      }
      i += 1
    }
    if (cur != null) parts += cur.toVector
    parts.result().map(_.mkString("\n"))
  }

  // ------------------------------------------------------------ addresses

  /** RFC-2822-ish address-list parse → lowercased, trimmed, de-emptied
    * (ref: parse_addresses app/common/utils.py:16-23, flattening
    * getaddresses at ingest_enron.py:34-47). */
  def parseAddresses(headerValues: Seq[String]): Vector[String] =
    headerValues.iterator.flatMap(splitAddressList).map(extractAddress)
      .map(_.trim.toLowerCase(Locale.ROOT)).filter(_.nonEmpty).toVector

  /** Split on commas that are outside double-quotes and angle brackets. */
  private def splitAddressList(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    var depth = 0
    s.foreach {
      case '"' => inQ = !inQ; cur.append('"')
      case '<' if !inQ => depth += 1; cur.append('<')
      case '>' if !inQ => depth = math.max(0, depth - 1); cur.append('>')
      case ',' if !inQ && depth == 0 => out += cur.toString; cur.clear()
      case c => cur.append(c)
    }
    out += cur.toString
    out.result()
  }

  /** "Display Name <a@b>" → "a@b"; bare addresses pass through;
    * comments "(...)" removed. */
  def extractAddress(token: String): String = {
    val lt = token.indexOf('<')
    val gt = token.lastIndexOf('>')
    val raw =
      if (lt >= 0 && gt > lt) token.substring(lt + 1, gt)
      else token.replaceAll("\\([^)]*\\)", "").replaceAll("\"[^\"]*\"", "")
    raw.trim
  }

  // ----------------------------------------------------------------- date

  // No day-of-week field: Python's parsedate_to_datetime never validates
  // the weekday name against the date (real mail disagrees often), so the
  // leading "EEE, " token is stripped before parsing instead.
  private val rfc2822: DateTimeFormatter = new DateTimeFormatterBuilder()
    .parseCaseInsensitive()
    .parseLenient()
    .appendValue(ChronoField.DAY_OF_MONTH, 1, 2,
      java.time.format.SignStyle.NOT_NEGATIVE)
    .appendPattern(" MMM ")
    .appendValue(ChronoField.YEAR, 2, 4,
      java.time.format.SignStyle.NOT_NEGATIVE)
    .appendPattern(" HH:mm")
    .optionalStart().appendPattern(":ss").optionalEnd()
    .optionalStart().appendPattern(" ").appendOffset("+HHMM", "GMT").optionalEnd()
    .optionalStart().appendPattern(" zzz").optionalEnd()
    .toFormatter(Locale.US)

  /** RFC-2822 Date header → UTC Timestamp; naive → assume UTC; None on
    * any failure (ref: to_iso_date app/common/utils.py:25-33). */
  def parseDate(value: String): Option[Timestamp] = {
    if (value == null) return None
    // strip comments like "(PDT)", the unvalidated weekday prefix, and
    // excess whitespace
    val cleaned = value.replaceAll("\\([^)]*\\)", "").trim
      .replaceAll("^[A-Za-z]{2,9}\\s*,\\s*", "")
      .replaceAll("\\s+", " ")
    if (cleaned.isEmpty) return None
    try {
      val parsed = rfc2822.parseBest(cleaned,
        OffsetDateTime.from(_), LocalDateTime.from(_))
      val utc = parsed match {
        case odt: OffsetDateTime => odt.withOffsetSameInstant(ZoneOffset.UTC)
        case ldt: LocalDateTime  => ldt.atOffset(ZoneOffset.UTC)
      }
      // RFC-2822 obsolete 2-digit years (parsedate_to_datetime semantics):
      // 00-49 → 2000s, 50-99 → 1900s. The formatter parses them literally
      // (year "01" → 1 AD), so window them here.
      val windowed =
        if (utc.getYear < 50) utc.plusYears(2000)
        else if (utc.getYear < 100) utc.plusYears(1900)
        else utc
      Some(Timestamp.from(windowed.toInstant))
    } catch { case _: Exception => None }
  }

  // ----------------------------------------------------------- dedupe key

  /** Canonical content hash. The canonical form is fixed by THIS engine
    * (not Python's json.dumps): fields in fixed order, joined with  ,
    * arrays comma-joined, date in epoch-millis-or-empty, body capped at
    * 2000 chars (cap per ingest_enron.py:119). */
  def contentHash(from: String, to: Seq[String], date: Option[Timestamp],
      subject: String, body: String): String = {
    val canonical = Seq(
      from,
      to.mkString(","),
      date.map(_.getTime.toString).getOrElse(""),
      subject,
      body.take(2000)
    ).mkString(" ")
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(canonical.getBytes(StandardCharsets.UTF_8))
    "hash_" + digest.map("%02x".format(_)).mkString
  }

  // ------------------------------------------------------------ top level

  /** Parse one raw RFC-822 message into an EmailDoc positioned at the
    * given (user, folder, filename) hierarchy slot
    * (ref: parse_email_file ingest_enron.py:70-140). */
  def parse(bytes: Array[Byte], user: String, folder: String,
      filename: String): EmailDoc = {
    // normalize line endings up front: header parse, multipart split and
    // body extraction all operate on "\n"; body text is canonical-\n
    val text = smartDecode(bytes).replace("\r\n", "\n")
    val (headers, bodyOff) = parseHeaderBlock(text)
    val bodyText = text.substring(bodyOff)

    val messageId = headers.get("Message-ID").map(_.trim).getOrElse("")
    val subject = headers.get("Subject").map(_.trim).getOrElse("")
    val from = parseAddresses(headers.getAll("From")).headOption.getOrElse("")
    val to = parseAddresses(headers.getAll("To"))
    val cc = parseAddresses(headers.getAll("Cc"))
    val bcc = parseAddresses(headers.getAll("Bcc"))
    val date = headers.get("Date").flatMap(parseDate)

    val parts = walkParts(headers, bodyText)
    // body (ingest_enron.py:84-92): for a true multipart message, ALL
    // text/plain parts concatenate in walk order — including parts that
    // carry a filename (the reference's body loop has no get_filename
    // check); for a non-multipart message the decoded payload is taken
    // unconditionally, whatever its content type
    val (topCt, topParams) = parseContentType(
      headers.get("Content-Type").getOrElse("text/plain"))
    val isMultipart =
      topCt.startsWith("multipart/") && topParams.get("boundary").exists(_.nonEmpty)
    val body =
      if (isMultipart)
        parts.iterator
          .filter(_.contentType == "text/plain")
          .map(p => smartDecode(p.payload, p.params.get("charset")))
          .mkString("")
      else
        smartDecode(parts.head.payload, parts.head.params.get("charset"))
    val attachments = parts.iterator.flatMap { p =>
      p.filename.map(f => Attachment(f, p.contentType, p.payload.length.toLong))
    }.toVector

    val dedupeKey =
      if (messageId.nonEmpty) messageId
      else contentHash(from, to, date, subject, body)

    EmailDoc(
      dedupe_key = dedupeKey,
      message_id = if (messageId.nonEmpty) Some(messageId) else None,
      date = date,
      from = from,
      to = to, cc = cc, bcc = bcc,
      subject = subject,
      body = body,
      attachments = attachments,
      mailboxes = Vector(Mailbox(user, folder, filename)),
      headers = headers.folded,
      entities = Vector.empty,
      thread_id = None)
  }
}
