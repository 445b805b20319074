package graft.jobs

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.scalatest.funsuite.AnyFunSuite

/** [[HttpApi.firstFilePart]] byte-level contract (RFC 2046 delimiter
  * matching): a delimiter only counts at a line start, so binary zip
  * payloads that happen to contain the bare boundary byte sequence
  * mid-stream must survive untruncated. */
class MultipartSpec extends AnyFunSuite {

  private val B = "graftTestBoundary"
  private val ctype = s"multipart/form-data; boundary=$B"

  private def wrap(content: Array[Byte]): Array[Byte] = {
    val head = (s"--$B\r\nContent-Disposition: form-data; " +
      "name=\"file\"; filename=\"f.zip\"\r\n" +
      "Content-Type: application/zip\r\n\r\n").getBytes(ISO_8859_1)
    val tail = s"\r\n--$B--\r\n".getBytes(ISO_8859_1)
    head ++ content ++ tail
  }

  test("binary payload containing bare boundary bytes is not truncated") {
    // "--boundary" NOT preceded by CRLF: legal content bytes, and the
    // case the pre-fix matcher truncated into a corrupt archive
    val payload = (s"PK binary x--$B" + "y more bytes")
      .getBytes(ISO_8859_1)
    val got = HttpApi.firstFilePart(ctype, wrap(payload))
    assert(got.isRight, got)
    val (name, bytes) = got.toOption.get
    assert(name == "f.zip")
    assert(bytes.sameElements(payload),
      s"expected ${payload.length} bytes, got ${bytes.length}")
  }

  test("file part found after a non-file part; preamble ignored") {
    val payload = "DATA".getBytes(ISO_8859_1)
    val raw = (s"client preamble\r\n--$B\r\n" +
      "Content-Disposition: form-data; name=\"note\"\r\n\r\nhello\r\n" +
      s"--$B\r\nContent-Disposition: form-data; name=\"file\"; " +
      "filename=\"z.zip\"\r\n\r\n").getBytes(ISO_8859_1) ++
      payload ++ s"\r\n--$B--\r\n".getBytes(ISO_8859_1)
    val got = HttpApi.firstFilePart(ctype, raw)
    assert(got.toOption.exists(p =>
      p._1 == "z.zip" && p._2.sameElements(payload)), got)
  }

  test("terminal-only and delimiter-free bodies are rejected") {
    assert(HttpApi.firstFilePart(ctype,
      s"--$B--\r\n".getBytes(ISO_8859_1)).isLeft)
    assert(HttpApi.firstFilePart(ctype,
      "no delimiters here".getBytes(ISO_8859_1)).isLeft)
    assert(HttpApi.firstFilePart("multipart/form-data",
      wrap("x".getBytes(ISO_8859_1))).isLeft)
  }

  test("property: arbitrary binary payloads round-trip unmangled") {
    // RFC 2046's only content restriction is that the full
    // CRLF-delimiter line must not appear in the payload (the sender
    // chooses the boundary to ensure it); everything else — bare
    // boundary bytes, partial delimiters, CRLFs, NULs, high bytes —
    // must round-trip byte-exact
    val crlfDelim = s"\r\n--$B".getBytes(ISO_8859_1)
    def containsDelim(b: Array[Byte]): Boolean =
      b.indices.exists(i => i + crlfDelim.length <= b.length &&
        crlfDelim.indices.forall(j => b(i + j) == crlfDelim(j)))
    val rnd = new scala.util.Random(7L)
    val fragments = Seq(
      s"--$B".getBytes(ISO_8859_1),          // bare boundary
      s"\r\n--${B.dropRight(1)}".getBytes(ISO_8859_1), // near-delimiter
      "\r\n\r\n".getBytes(ISO_8859_1),
      Array[Byte](0, -1, 13, 10, 45, 45))
    (1 to 200).foreach { _ =>
      val n = rnd.nextInt(400)
      val payload = new Array[Byte](n)
      rnd.nextBytes(payload)
      // splice a hostile fragment at a random offset
      val frag = fragments(rnd.nextInt(fragments.length))
      val at = if (n == 0) 0 else rnd.nextInt(n)
      val spliced = payload.take(at) ++ frag ++ payload.drop(at)
      if (!containsDelim(spliced)) {
        val got = HttpApi.firstFilePart(ctype, wrap(spliced))
        assert(got.toOption.exists(_._2.sameElements(spliced)),
          s"payload of ${spliced.length} bytes mangled")
      }
    }
  }
}
