package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

import graft.ingest.EmailIngest
import graft.store.EmailStore

/** Ingest throughput benchmark: synthesize an Enron-shaped maildir,
  * then time scan → parse → merge → store (the reference's E3 lifecycle
  * end to end). Prints one JSON line. The comparison target is the
  * reference's synchronous single-process ingester
  * (ingest_enron.py: stdlib email parse + Mongo upsert, published
  * concurrency 1 — see BASELINE.md).
  *
  * Corpus is deterministic (LCG seed), ~25% cross-mailbox duplicates
  * (the merge-heavy realistic case), mixed singlepart/multipart.
  */
object IngestBench {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)

  def synthesize(base: Path, nMessages: Int): Int = {
    val users = (0 until 40).map(i => f"user$i%02d")
    val folders = Seq("inbox", "sent", "deleted_items", "projects")
    val rnd = lcg(42L).map(_ >>> 16)
    var written = 0
    (0 until nMessages).foreach { i =>
      val r1 = rnd.next(); val r2 = rnd.next(); val r3 = rnd.next()
      val from = users((r1 % users.size).toInt)
      val to = users((r2 % users.size).toInt)
      val body =
        (s"Discussion item $i about the ${r3 % 97} forecast.\r\n" * (1 + (r1 % 20).toInt))
      val multipart = i % 7 == 0
      val content =
        if (multipart)
          s"""Message-ID: <bench$i@corp>\r
             |Date: ${1 + (r2 % 28)} Jun 2001 %02d:15:00 -0700\r
             |From: $from@corp.com\r
             |To: $to@corp.com, team@corp.com\r
             |Subject: bench message $i\r
             |Content-Type: multipart/mixed; boundary=B$i\r
             |\r
             |--B$i\r
             |Content-Type: text/plain\r
             |\r
             |$body\r
             |--B$i\r
             |Content-Type: application/octet-stream; name="a$i.dat"\r
             |Content-Disposition: attachment; filename="a$i.dat"\r
             |Content-Transfer-Encoding: base64\r
             |\r
             |${java.util.Base64.getEncoder.encodeToString(body.take(64).getBytes)}\r
             |--B$i--\r
             |""".stripMargin.replace("%02d", f"${(r3 % 24).toInt}%02d")
        else
          s"Message-ID: <bench$i@corp>\r\nDate: ${1 + (r2 % 28)} Jun 2001 10:15:00 -0700\r\n" +
            s"From: $from@corp.com\r\nTo: $to@corp.com\r\nSubject: bench message $i\r\n\r\n$body"
      def write(user: String, folder: String): Unit = {
        val dir = base.resolve(user).resolve(folder)
        Files.createDirectories(dir)
        Files.write(dir.resolve(s"${i}_${user.hashCode & 0xff}_"),
          content.getBytes(StandardCharsets.UTF_8))
        written += 1
      }
      write(from, "sent")
      if (i % 4 == 0) write(to, "inbox") // 25% cross-mailbox duplicates
    }
    written
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("GRAFT_INGEST_N", "20000").toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // GRAFT_INGEST_DIR pins the corpus to a fixed path (and reuses it
    // when already populated): the reference-side harness of the
    // head-to-head must time the SAME files. Reuse is gated on a
    // completion manifest recording n — a crashed partial synthesis or
    // a changed GRAFT_INGEST_N must re-synthesize, never silently
    // benchmark a different corpus than claimed (root-level dotfile:
    // invisible to the depth-3 scan under test).
    val base = sys.env.get("GRAFT_INGEST_DIR") match {
      case Some(p) =>
        val d = java.nio.file.Paths.get(p)
        Files.createDirectories(d)
        d
      case None => Files.createTempDirectory("graft-ingest-bench")
    }
    val manifest = base.resolve(".complete")
    val files = {
      val reusable = Files.exists(manifest) &&
        new String(Files.readAllBytes(manifest), "UTF-8").trim == n.toString
      if (reusable) {
        val s = Files.walk(base)
        try s.filter(p => Files.isRegularFile(p) &&
          !p.getFileName.toString.startsWith(".")).count().toInt
        finally s.close()
      } else {
        graft.Fs.deleteTree(base)
        Files.createDirectories(base)
        val written = synthesize(base, n)
        Files.write(manifest, n.toString.getBytes("UTF-8"))
        written
      }
    }
    val storeDir = Files.createTempDirectory("graft-ingest-bench-store")

    // steady-state measurement: a long-running ingest service amortizes
    // JVM/codegen warmup, so prime both code paths on a tiny slice first
    val warmDir = Files.createTempDirectory("graft-ingest-bench-warm")
    synthesize(warmDir, 200)
    EmailStore.mergeBatch(EmailIngest.docsFromScan(spark,
      EmailIngest.scan(spark, warmDir.toString))).count()

    // phase 1: parse-only throughput (the stage comparable to the
    // reference's stdlib-email parse loop)
    val t1 = System.nanoTime()
    val parsedCount = EmailIngest.ingest(spark, base.toString).count()
    val parseSecs = (System.nanoTime() - t1) / 1e9

    // phase 2: full pipeline — scan → parse → dedup-merge → columnar
    // store write (strictly more work than the reference's parse stage)
    val t0 = System.nanoTime()
    val docs = EmailIngest.docsFromScan(spark,
      EmailIngest.scan(spark, base.toString))
    val store = new EmailStore(spark, storeDir.toString)
    store.upsert(docs)
    val rows = store.read().count()
    val secs = (System.nanoTime() - t0) / 1e9

    println(s"""{"metric":"ingest_throughput","files":$files,""" +
      s""""unique_messages":$rows,"parsed":$parsedCount,""" +
      s""""parse_seconds":${f"$parseSecs%.2f"},""" +
      s""""parse_files_per_sec":${f"${files / parseSecs}%.0f"},""" +
      s""""seconds":${f"$secs%.2f"},""" +
      s""""files_per_sec":${f"${files / secs}%.0f"}}""")
    spark.stop()
  }
}
