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
}
