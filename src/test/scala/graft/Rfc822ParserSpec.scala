package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.codec.Rfc822Parser
import graft.codec.Rfc822Parser._

/** Branch coverage for the pure-Scala RFC-822/MIME parser, one test per
  * behavior cited in SURVEY.md §2.3 (behavior source = the reference's
  * use of Python's email stdlib at ingest_enron.py:70-140). */
class Rfc822ParserSpec extends AnyFunSuite {

  private def msg(lines: String*): Array[Byte] =
    lines.mkString("\r\n").getBytes(StandardCharsets.UTF_8)

  test("plain singlepart with Message-ID, To/Cc/Bcc lists") {
    val doc = Rfc822Parser.parse(msg(
      "Message-ID: <123.ABC@example.com>",
      "Date: Wed, 15 May 2001 09:26:00 -0700",
      "From: Jeff Allen <Jeff.Allen@Example.COM>",
      "To: kim.b@example.com, Joe Q <joe.q@example.com>",
      "Cc: ann@example.com",
      "Bcc: secret@example.com",
      "Subject:  Meeting notes ",
      "",
      "Body line one.",
      "Body line two."), "allen-j", "inbox", "1_")
    assert(doc.dedupe_key == "<123.ABC@example.com>")
    assert(doc.message_id.contains("<123.ABC@example.com>"))
    assert(doc.from == "jeff.allen@example.com")
    assert(doc.to == Seq("kim.b@example.com", "joe.q@example.com"))
    assert(doc.cc == Seq("ann@example.com"))
    assert(doc.bcc == Seq("secret@example.com"))
    assert(doc.subject == "Meeting notes")
    assert(doc.body == "Body line one.\nBody line two.")
    assert(doc.mailboxes.map(m => (m.user, m.folder, m.filename)) ==
      Seq(("allen-j", "inbox", "1_")))
    // tz-aware date normalized to UTC: 09:26 -0700 = 16:26 UTC
    assert(doc.date.get.toInstant.toString == "2001-05-15T16:26:00Z")
  }

  test("missing Message-ID falls back to stable content hash") {
    val bytes = msg(
      "From: a@x.com", "To: b@x.com", "Subject: s", "", "body")
    val d1 = Rfc822Parser.parse(bytes, "u", "f", "1")
    val d2 = Rfc822Parser.parse(bytes, "u2", "f2", "2")
    assert(d1.message_id.isEmpty)
    assert(d1.dedupe_key.startsWith("hash_"))
    assert(d1.dedupe_key.length == "hash_".length + 64)
    // hash ignores mailbox position → same key from both positions
    assert(d1.dedupe_key == d2.dedupe_key)
    // but differs when content differs
    val d3 = Rfc822Parser.parse(msg(
      "From: a@x.com", "To: b@x.com", "Subject: s", "", "other body"),
      "u", "f", "1")
    assert(d3.dedupe_key != d1.dedupe_key)
  }

  test("multipart: text/plain parts concatenated, attachment metadata only") {
    val doc = Rfc822Parser.parse(msg(
      "Message-ID: <m1@x>",
      "From: a@x.com",
      "Content-Type: multipart/mixed; boundary=\"BOUND\"",
      "",
      "preamble ignored",
      "--BOUND",
      "Content-Type: text/plain",
      "",
      "part one. ",
      "--BOUND",
      "Content-Type: text/html",
      "",
      "<b>ignored html</b>",
      "--BOUND",
      "Content-Type: text/plain",
      "",
      "part two.",
      "--BOUND",
      "Content-Type: application/pdf; name=\"doc.pdf\"",
      "Content-Disposition: attachment; filename=\"doc.pdf\"",
      "Content-Transfer-Encoding: base64",
      "",
      java.util.Base64.getEncoder.encodeToString("PDFBYTES!!".getBytes),
      "--BOUND--",
      "epilogue ignored"), "u", "f", "1")
    assert(doc.body == "part one. part two.")
    assert(doc.attachments.map(a => (a.filename, a.content_type, a.size)) ==
      Seq(("doc.pdf", "application/pdf", 10L)))
  }

  test("nested multipart walk preserves document order") {
    val doc = Rfc822Parser.parse(msg(
      "From: a@x.com",
      "Content-Type: multipart/mixed; boundary=OUTER",
      "",
      "--OUTER",
      "Content-Type: multipart/alternative; boundary=INNER",
      "",
      "--INNER",
      "Content-Type: text/plain",
      "",
      "inner-first",
      "--INNER",
      "Content-Type: text/plain",
      "",
      "inner-second",
      "--INNER--",
      "--OUTER",
      "Content-Type: text/plain",
      "",
      "outer-last",
      "--OUTER--"), "u", "f", "1")
    assert(doc.body == "inner-firstinner-secondouter-last")
  }

  test("duplicate header names newline-joined under lowercased key") {
    val doc = Rfc822Parser.parse(msg(
      "Received: from hostA",
      "Received: from hostB",
      "X-Custom: v1",
      "From: a@x.com",
      "",
      "b"), "u", "f", "1")
    assert(doc.headers("received") == "from hostA\nfrom hostB")
    assert(doc.headers("x-custom") == "v1")
    assert(doc.headers.keySet.forall(k => k == k.toLowerCase))
  }

  test("folded (continuation) header lines unfold with a space") {
    val doc = Rfc822Parser.parse(msg(
      "Subject: part one",
      "\tpart two",
      "From: a@x.com",
      "",
      "b"), "u", "f", "1")
    assert(doc.subject == "part one part two")
  }

  test("naive Date assumes UTC; unparsable Date → None") {
    assert(parseDate("Wed, 15 May 2001 09:26:00").get.toInstant.toString
      == "2001-05-15T09:26:00Z")
    assert(parseDate("15 May 2001 09:26:00 +0000").get.toInstant.toString
      == "2001-05-15T09:26:00Z")
    assert(parseDate("Wed, 15 May 2001 09:26:00 -0700 (PDT)").get
      .toInstant.toString == "2001-05-15T16:26:00Z")
    assert(parseDate("not a date").isEmpty)
    assert(parseDate("").isEmpty)
    assert(parseDate(null).isEmpty)
  }

  test("non-UTF-8 bytes fall back to latin-1 (never fails)") {
    // 0xE9 is é in latin-1, invalid as a UTF-8 lead sequence here
    val bytes = ("From: a@x.com\r\nSubject: café\r\n\r\nrésumé")
      .getBytes(StandardCharsets.ISO_8859_1)
    val doc = Rfc822Parser.parse(bytes, "u", "f", "1")
    assert(doc.subject == "café")
    assert(doc.body == "résumé")
  }

  test("declared charset on a MIME part wins") {
    val body = "grüße".getBytes(StandardCharsets.ISO_8859_1)
    val doc = Rfc822Parser.parse(
      (("From: a@x.com\r\nContent-Type: text/plain; charset=iso-8859-1\r\n" +
        "\r\n").getBytes(StandardCharsets.US_ASCII) ++ body),
      "u", "f", "1")
    assert(doc.body == "grüße")
  }

  test("BOM beats declared charset and the statistical fallback (F1)") {
    // UTF-16LE body with BOM: strict UTF-8 fails and the 8-bit sniffer
    // would produce NUL-ridden latin-1 — the BOM must win
    val utf16 = Array(0xff, 0xfe).map(_.toByte) ++
      "hello naïve".getBytes(StandardCharsets.UTF_16LE)
    assert(Rfc822Parser.smartDecode(utf16) == "hello naïve")
    val utf16be = Array(0xfe, 0xff).map(_.toByte) ++
      "grüße".getBytes(StandardCharsets.UTF_16BE)
    assert(Rfc822Parser.smartDecode(utf16be) == "grüße")
    // UTF-8 BOM is consumed, not leaked into the text
    val utf8bom = Array(0xef, 0xbb, 0xbf).map(_.toByte) ++
      "plain".getBytes(StandardCharsets.UTF_8)
    assert(Rfc822Parser.smartDecode(utf8bom) == "plain")
    // BOM overrides a (wrong) declared charset
    assert(Rfc822Parser.smartDecode(utf16, Some("iso-8859-1")) == "hello naïve")
    // no BOM → declared charset still wins as before
    val latin = "café".getBytes(StandardCharsets.ISO_8859_1)
    assert(Rfc822Parser.smartDecode(latin, Some("iso-8859-1")) == "café")
  }

  test("quoted-printable transfer encoding decodes (incl. soft breaks)") {
    val doc = Rfc822Parser.parse(msg(
      "From: a@x.com",
      "Content-Type: text/plain; charset=utf-8",
      "Content-Transfer-Encoding: quoted-printable",
      "",
      "caf=C3=A9 and a soft=",
      " break"), "u", "f", "1")
    assert(doc.body == "café and a soft break")
  }

  test("address edge cases: quotes, comments, empties dropped") {
    assert(parseAddresses(Seq("\"Allen, Phillip\" <phillip.allen@x.com>, b@x.com"))
      == Seq("phillip.allen@x.com", "b@x.com"))
    assert(parseAddresses(Seq("a@x.com (Home)")) == Seq("a@x.com"))
    assert(parseAddresses(Seq("  ", "")) == Seq())
    assert(parseAddresses(Seq("UPPER@X.COM")) == Seq("upper@x.com"))
  }

  test("empty/missing fields coalesce like the reference") {
    val doc = Rfc822Parser.parse(msg("X-Nothing: y", "", ""), "u", "f", "1")
    assert(doc.from == "")
    assert(doc.to.isEmpty && doc.cc.isEmpty && doc.bcc.isEmpty)
    assert(doc.subject == "")
    assert(doc.date.isEmpty)
    assert(doc.dedupe_key.startsWith("hash_"))
    assert(doc.entities.isEmpty && doc.thread_id.isEmpty)
  }

  test("content hash caps body contribution at 2000 chars") {
    val common = "x" * 2000
    val k1 = contentHash("a@x", Seq("b@x"), None, "s", common + "TAIL-A")
    val k2 = contentHash("a@x", Seq("b@x"), None, "s", common + "TAIL-B")
    val k3 = contentHash("a@x", Seq("b@x"), None, "s", ("x" * 1999) + "Y")
    assert(k1 == k2)     // differences past 2000 chars are invisible
    assert(k1 != k3)     // differences inside the cap are visible
  }
}
