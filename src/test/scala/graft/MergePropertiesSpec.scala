package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.codec.Rfc822Parser

/** Property-based invariants (SURVEY.md §5.2): hash stability, address
  * normalization, transfer-decoding round trips. Uses ScalaCheck
  * generators with a fixed seed (deterministic CI) sampled through a
  * small helper, since only scalatest+scalacheck jars are available. */
class MergePropertiesSpec extends AnyFunSuite {

  private def forAllSamples[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)

  private val byteArray: Gen[Array[Byte]] =
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  test("content hash is deterministic; differences past the cap invisible") {
    forAllSamples(Gen.zip(asciiText, asciiText)) { case (subject, body) =>
      val h1 = Rfc822Parser.contentHash("a@x", Seq("b@x"), None, subject, body)
      val h2 = Rfc822Parser.contentHash("a@x", Seq("b@x"), None, subject, body)
      assert(h1 == h2)
      assert(h1.startsWith("hash_") && h1.length == 69)
      val padded = body.padTo(2000, 'x').mkString
      assert(
        Rfc822Parser.contentHash("a@x", Seq("b@x"), None, subject, padded + "AAA") ==
        Rfc822Parser.contentHash("a@x", Seq("b@x"), None, subject, padded + "BBB"))
    }
  }

  test("parsed addresses are always lowercased, trimmed, non-empty") {
    forAllSamples(Gen.listOf(asciiText)) { headerValues =>
      val out = Rfc822Parser.parseAddresses(headerValues)
      out.foreach { a =>
        assert(a == a.toLowerCase)
        assert(a == a.trim)
        assert(a.nonEmpty)
      }
    }
  }

  test("quoted-printable encoding of arbitrary bytes round-trips") {
    forAllSamples(byteArray) { bytes =>
      val encoded = bytes.map(b => f"=${b & 0xff}%02X").mkString
      assert(Rfc822Parser.decodeQuotedPrintable(encoded).toSeq == bytes.toSeq)
    }
  }

  test("base64 MIME encoding round-trips") {
    forAllSamples(byteArray) { bytes =>
      val enc = java.util.Base64.getMimeEncoder.encodeToString(bytes)
      assert(Rfc822Parser.decodeBase64(enc).toSeq == bytes.toSeq)
    }
  }

  test("full parser never throws on arbitrary byte input (D5 upper bound)") {
    // the quarantine path exists for genuine exceptions, but the parser
    // should handle arbitrary garbage without one (Python's email
    // parser has the same total-function behavior)
    forAllSamples(byteArray, n = 300) { bytes =>
      val doc = Rfc822Parser.parse(bytes, "u", "f", "x")
      assert(doc.dedupe_key.nonEmpty)
      assert(doc.mailboxes.nonEmpty)
    }
  }

  test("smartDecode never throws and is empty only for empty input") {
    forAllSamples(byteArray) { bytes =>
      val s = Rfc822Parser.smartDecode(bytes)
      if (bytes.isEmpty) assert(s.isEmpty)
      assert(s != null)
    }
  }
}
