package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.codec.Rfc822Parser
import graft.model.ParsedFile

/** Batch ingest of a hierarchical maildir tree (`base/<user>/<folder>/<file>`).
  *
  * Spark-native restatement of the reference's triple-nested sorted walk +
  * per-file parse (ref: ingest_enron.py:164-178 walk, :70-140 parse;
  * Celery fan-out app/orchestrator.py:28-51): the `binaryFile` source
  * lists and reads files partition-parallel on executors, the hierarchy
  * columns are recovered from the file path, and the parse runs inside
  * `mapPartitions` — no driver-side loops anywhere.
  *
  * Error semantics: a file that fails to parse becomes a row with a
  * non-null `error` instead of killing the job (PERMISSIVE-style;
  * ref: try/except at ingest_enron.py:181,205-206 → SURVEY.md §2.7 D5).
  * Ordering: the reference's sorted walk gives "first writer" semantics
  * for duplicate keys; here determinism comes from explicit ordering by
  * `path` in the merge (EmailStore), so scan order is irrelevant.
  */
object EmailIngest {

  /** Base-anchored depth-3 pattern: `<base>/<user>/<folder>/<file>`.
    * The reference walk (ingest_enron.py:164-178) ingests files at
    * exactly depth 3 and skips everything else — a recursive scan with
    * a last-3-segments regex would misattribute deeper files (an
    * intermediate directory becomes "user") and fabricate hierarchy for
    * shallower ones. */
  private[graft] def depth3Pattern(spark: SparkSession, baseDir: String): String = {
    val p = new org.apache.hadoop.fs.Path(baseDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = fs.makeQualified(p).toString.stripSuffix("/")
    "^" + java.util.regex.Pattern.quote(base) + "/([^/]+)/([^/]+)/([^/]+)$"
  }

  private def emptyScan(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("path", StringType), StructField("user", StringType),
        StructField("folder", StringType), StructField("filename", StringType),
        StructField("content", BinaryType))))
  }

  /** S1/S2: depth-3 scan + hierarchy columns anchored at `baseDir`.
    * The glob stops at the FOLDER level (`base/&#42;/&#42;`): globbing all the
    * way to files would enumerate every file as its own root path on
    * the driver (measured 7× slower at 25k files), while ~user×folder
    * directory roots list cheaply and in parallel. The anchored
    * pattern filter then keeps exactly `base/<user>/<folder>/<file>`
    * rows — deeper files (inside nested folders) and shallower ones are
    * dropped, matching the reference's exactly-depth-3 walk
    * (ingest_enron.py:164-178). */
  def scan(spark: SparkSession, baseDir: String): DataFrame = {
    val pat = depth3Pattern(spark, baseDir)
    val df =
      try spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(s"$baseDir/*/*")
      catch {
        // no depth-2 entries at all → empty ingest (the reference's
        // EMPTY short-circuit, app/orchestrator.py:53-56). Match ONLY
        // the path-not-found condition: a permissions failure or bad
        // scheme also surfaces as AnalysisException, and swallowing it
        // would record a successful-looking EMPTY job for data that
        // was silently never ingested.
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          return emptyScan(spark)
      }
    df.filter(col("path").rlike(pat))
      .select(
        col("path"),
        regexp_extract(col("path"), pat, 1).as("user"),
        regexp_extract(col("path"), pat, 2).as("folder"),
        regexp_extract(col("path"), pat, 3).as("filename"),
        col("content"))
  }

  /** S4 + D5: parse each file into an EmailDoc row with error isolation. */
  def parse(spark: SparkSession, scanned: DataFrame): Dataset[ParsedFile] = {
    import spark.implicits._
    scanned
      .select("path", "user", "folder", "filename", "content")
      .as[(String, String, String, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (path, user, folder, filename, content) =>
          try {
            val doc = Rfc822Parser.parse(content, user, folder, filename)
            ParsedFile(path, user, folder, filename, Some(doc), None)
          } catch {
            case e: Exception =>
              ParsedFile(path, user, folder, filename, None,
                Some(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
          }
        }
      }
  }

  /** Full ingest: scan → parse. Rows with `error != null` are quarantine
    * rows; `docs` below gives the clean stream. */
  def ingest(spark: SparkSession, baseDir: String): Dataset[ParsedFile] =
    parse(spark, scan(spark, baseDir))

  /** Successfully parsed documents as store-schema rows (one row per
    * physical file — duplicates by dedupe_key are merged by EmailStore). */
  def docs(spark: SparkSession, parsed: Dataset[ParsedFile]): DataFrame = {
    import spark.implicits._
    parsed.filter(_.doc.isDefined)
      .map(p => (p.path, p.doc.get))
      .toDF("path", "doc")
      .select(col("path"), col("doc.*"))
  }

  /** Flattened per-file row for the fast ingest path — one product
    * encoder, no Option[EmailDoc] nesting, no second projection. */
  case class EmailRow(
      path: String, dedupe_key: String, message_id: Option[String],
      date: Option[java.sql.Timestamp], from: String,
      to: Seq[String], cc: Seq[String], bcc: Seq[String],
      subject: String, body: String,
      attachments: Seq[graft.model.Attachment],
      mailboxes: Seq[graft.model.Mailbox],
      headers: Map[String, String],
      entities: Seq[graft.model.Entity],
      thread_id: Option[String])

  /** Direct path: scan → store-schema rows in ONE mapPartitions with a
    * flat encoder. Steady-state cost matches the typed ParsedFile →
    * flatten route (measured: both ~1.2s/25k files warm); the win is
    * cold-start (single simpler codegen unit, 1.5s vs 3.0s first run).
    * Parse failures are silently dropped here — use
    * `ingest`+`quarantine` when the error stream matters. */
  def docsFromScan(spark: SparkSession, scanned: DataFrame): DataFrame = {
    import spark.implicits._
    scanned
      .select("path", "user", "folder", "filename", "content")
      .as[(String, String, String, String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (path, user, folder, filename, content) =>
          try {
            val d = Rfc822Parser.parse(content, user, folder, filename)
            Some(EmailRow(path, d.dedupe_key, d.message_id, d.date, d.from,
              d.to, d.cc, d.bcc, d.subject, d.body, d.attachments,
              d.mailboxes, d.headers, d.entities, d.thread_id))
          } catch { case _: Exception => None }
        }
      }.toDF()
  }

  /** Quarantined failures (D5): path + error, never kills the job. */
  def quarantine(spark: SparkSession, parsed: Dataset[ParsedFile]): DataFrame = {
    import spark.implicits._
    parsed.filter(_.error.isDefined)
      .map(p => (p.path, p.error.get)).toDF("path", "error")
  }

  /** D8 dry-run: parse everything, write nothing, report counters
    * (ref: ingest_enron.py:154,198-199 + counters :214-216). */
  def dryRun(spark: SparkSession, baseDir: String): (Long, Long) = {
    val parsed = ingest(spark, baseDir).cache()
    try {
      val ok = parsed.filter(_.doc.isDefined).count()
      val failed = parsed.filter(_.error.isDefined).count()
      (ok, failed)
    } finally parsed.unpersist()
  }
}
