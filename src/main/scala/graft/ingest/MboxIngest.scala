package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.codec.Rfc822Parser

/** mbox source: one file holds many messages, each introduced by a
  * `From ` envelope line (the other classic email container besides the
  * maildir tree the reference walks — a user switching from the
  * reference brings both). Splitting runs executor-side per file via
  * the binaryFile source, so a directory of mboxes parallelizes by
  * file; the per-message parse is the same Rfc822Parser as everywhere
  * else, and its output merges through the same EmailStore contract.
  *
  * Format notes (mboxo semantics):
  *  - a line starting `From ` begins a new message; the envelope line
  *    itself is not part of the message
  *  - body lines that originally started with `From ` were escaped to
  *    `>From ` by the writer; one level of `>` is stripped from any
  *    `>+From ` line on read
  *  - bytes are split with a Latin-1 decode/encode round-trip, which is
  *    byte-exact, so charset handling still happens in ONE place
  *    (the parser's smartDecode).
  */
object MboxIngest {

  private val envelope = "From "

  /** Split raw mbox text into individual RFC-822 message texts. */
  def splitMbox(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    text.split("\n", -1).foreach { line =>
      val l = if (line.endsWith("\r")) line.dropRight(1) else line
      if (l.startsWith(envelope)) {
        if (cur != null) out += cur.result().stripLineEnd
        cur = new StringBuilder
      } else if (cur != null) {
        val unescaped =
          if (l.dropWhile(_ == '>').startsWith(envelope) && l.startsWith(">"))
            l.substring(1)
          else l
        cur.append(unescaped).append('\n')
      } // preamble before the first envelope line is dropped
    }
    if (cur != null) out += cur.result().stripLineEnd
    out.result()
  }

  /** Scan `baseDir` for `*.mbox` files → one store-schema row per
    * contained message (+ `path`), ready for EmailStore.mergeBatch.
    * Hierarchy mapping: user = file stem, folder = "mbox",
    * filename = message ordinal within the file. */
  def docs(spark: SparkSession, baseDir: String): DataFrame = {
    import spark.implicits._
    val parsed = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.mbox")
      .load(baseDir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val stem = path.substring(path.lastIndexOf('/') + 1)
          .stripSuffix(".mbox")
        val text = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
        splitMbox(text).zipWithIndex.flatMap { case (msg, i) =>
          try {
            val doc = Rfc822Parser.parse(
              msg.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
              stem, "mbox", s"${i}_")
            // zero-padded ordinal: the store's duplicate-key merge is
            // first-writer-wins by LEXICOGRAPHIC (precedence, path)
            // order, and "#10" < "#2" would let a later message win
            Some((f"$path%s#$i%09d", doc))
          } catch { case _: Exception => None }
        }
      }
    parsed.toDF("path", "doc").select(col("path"), col("doc.*"))
  }
}
