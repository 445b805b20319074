package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Attachment metadata — payload intentionally dropped, matching the
  * reference's behavior (ref: ingest_enron.py:95-104 keeps only
  * filename/content_type/size). */
case class Attachment(filename: String, content_type: String, size: Long)

/** A hierarchy position of a message: the same logical email can live in
  * many (user, folder) places and merges into one row with several
  * mailbox entries (ref: ingest_enron.py:133-135, 192). */
case class Mailbox(user: String, folder: String, filename: String)

/** Planned NER output shape (ref: entities index ingest_enron.py:152). */
case class Entity(text: String, `type`: String)

/** One deduplicated email document — the engine's core record type.
  *
  * Field-for-field the document constructed at ingest_enron.py:122-139
  * (byte-level twin parsing_agent.py:49-64), modeled as a fixed Spark
  * schema: the reference's store is schemaless Mongo but every document
  * is built by the same constructor, so nothing is lost going
  * schema-first (SURVEY.md §1.1).
  */
case class EmailDoc(
    dedupe_key: String,
    message_id: Option[String],
    date: Option[Timestamp],
    from: String,
    to: Seq[String],
    cc: Seq[String],
    bcc: Seq[String],
    subject: String,
    body: String,
    attachments: Seq[Attachment],
    mailboxes: Seq[Mailbox],
    headers: Map[String, String],
    entities: Seq[Entity],
    thread_id: Option[String])

object EmailDoc {

  /** The store schema as an explicit StructType (for DataFrame-land and
    * for readers that bypass the Dataset encoder). */
  val schema: StructType = StructType(Seq(
    StructField("dedupe_key", StringType, nullable = false),
    StructField("message_id", StringType, nullable = true),
    StructField("date", TimestampType, nullable = true),
    StructField("from", StringType, nullable = false),
    StructField("to", ArrayType(StringType, containsNull = false)),
    StructField("cc", ArrayType(StringType, containsNull = false)),
    StructField("bcc", ArrayType(StringType, containsNull = false)),
    StructField("subject", StringType, nullable = false),
    StructField("body", StringType, nullable = false),
    StructField("attachments", ArrayType(StructType(Seq(
      StructField("filename", StringType),
      StructField("content_type", StringType),
      StructField("size", LongType))), containsNull = false)),
    StructField("mailboxes", ArrayType(StructType(Seq(
      StructField("user", StringType),
      StructField("folder", StringType),
      StructField("filename", StringType))), containsNull = false)),
    StructField("headers", MapType(StringType, StringType)),
    StructField("entities", ArrayType(StructType(Seq(
      StructField("text", StringType),
      StructField("type", StringType))), containsNull = false)),
    StructField("thread_id", StringType, nullable = true)))
}

/** Per-file parse result before dedup/merge: one row per physical file,
  * carrying its hierarchy position and an error column instead of
  * failing the job (PERMISSIVE-style; ref: per-file try/except at
  * ingest_enron.py:181,205-206 → SURVEY.md §2.7 D5). */
case class ParsedFile(
    path: String,
    user: String,
    folder: String,
    filename: String,
    doc: Option[EmailDoc],
    error: Option[String])
