package graft.jobs

import java.sql.Timestamp
import java.time.Instant
import java.util.UUID

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.EmailIngest
import graft.store.EmailStore

/** Job control-plane (SURVEY.md §1.3/§2.7 D6): the reference's `jobs`
  * collection (app/main.py:22-28) with its state machine
  * QUEUED → PARSING → PARSED, terminal EMPTY
  * (app/orchestrator.py:16,54,58-60), re-expressed as an append-only
  * parquet event log. Current state = latest event per job via a
  * row_number view — point updates become immutable appends, which is
  * the shape that scales (no read-modify-write races, natural audit
  * trail).
  */
class JobTracker(spark: SparkSession, root: String) {
  import spark.implicits._

  private val fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def append(jobId: String, status: String, source: String,
      inputDir: String, fileCount: Long): Unit = {
    val row = Seq((jobId, Timestamp.from(Instant.now()), status, source,
      inputDir, fileCount))
      .toDF("job_id", "event_ts", "status", "source", "input_dir", "file_count")
    row.coalesce(1).write.mode("append").parquet(root)
  }

  /** Insert a job row with status QUEUED (ref: app/main.py:21-28). */
  def create(source: String, inputDir: String): String = {
    val jobId = UUID.randomUUID().toString
    append(jobId, "QUEUED", source, inputDir, -1L)
    jobId
  }

  /** Point status update (ref: app/orchestrator.py:16,54,58-60). */
  def setStatus(jobId: String, status: String, fileCount: Long = -1L): Unit =
    append(jobId, status, "", "", fileCount)

  /** Full event log. */
  def events(): DataFrame =
    if (!fs.exists(new Path(root)))
      Seq.empty[(String, Timestamp, String, String, String, Long)]
        .toDF("job_id", "event_ts", "status", "source", "input_dir", "file_count")
    else spark.read.parquet(root)

  /** Latest-state view: one row per job (S8's read path). `source` and
    * `input_dir` come from the first event, status/file_count from the
    * last. */
  def currentState(): DataFrame = {
    val byJob = Window.partitionBy("job_id")
    // tie-break equal timestamps by STATE-MACHINE rank, not status
    // text: alphabetically QUEUED > PARSING > PARSED, so a lexical
    // tie-break would report a job that started parsing as QUEUED
    // (and the asc window would pick a non-create event's empty
    // source/input_dir). Terminal states outrank PARSING outranks
    // QUEUED; unknown statuses sort last defensively.
    val stateRank = expr(
      """CASE status WHEN 'QUEUED' THEN 0 WHEN 'PARSING' THEN 1
        |  WHEN 'PARSED' THEN 2 WHEN 'EMPTY' THEN 2 ELSE 3 END""".stripMargin)
    val desc = byJob.orderBy(col("event_ts").desc, stateRank.desc)
    val asc = byJob.orderBy(col("event_ts").asc, stateRank.asc)
    events()
      .withColumn("rn", row_number().over(desc))
      .withColumn("first_source", first("source").over(asc))
      .withColumn("first_input_dir", first("input_dir").over(asc))
      .withColumn("max_file_count", max("file_count").over(byJob))
      .filter(col("rn") === 1)
      .select(col("job_id"), col("status"),
        col("first_source").as("source"),
        col("first_input_dir").as("input_dir"),
        col("max_file_count").as("file_count"),
        col("event_ts").as("updated_at"))
  }

  /** Q7: job status point read (ref: app/main.py:33-35). */
  def status(jobId: String): Option[String] =
    currentState().filter(col("job_id") === jobId)
      .select("status").collect().headOption.map(_.getString(0))
}

object JobTracker {

  /** E1/E3 lifecycle end-to-end (SURVEY.md §3): create job → scan →
    * EMPTY short-circuit | PARSING(file_count) → parse+merge into the
    * store → PARSED. Returns the job id. */
  def runIngestJob(spark: SparkSession, tracker: JobTracker,
      store: graft.store.DocStore, inputDir: String,
      source: String = "manual_trigger"): String = {
    val jobId = tracker.create(source, inputDir)
    runPhases(spark, tracker, store, jobId, inputDir)
    jobId
  }

  /** The post-create phases of the lifecycle, runnable on their own so
    * an async front end ([[HttpApi]]) can return the QUEUED job id
    * first and dispatch this afterwards — the split the reference makes
    * between its endpoint insert (app/main.py:22-28) and the Celery
    * task body (app/orchestrator.py:14-60). */
  def runPhases(spark: SparkSession, tracker: JobTracker,
      store: graft.store.DocStore, jobId: String, inputDir: String): Unit = {
    val scanned = EmailIngest.scan(spark, inputDir).cache()
    try {
      val n = scanned.count()
      if (n == 0) {
        tracker.setStatus(jobId, "EMPTY")
      } else {
        tracker.setStatus(jobId, "PARSING", fileCount = n)
        val docs = EmailIngest.docs(spark, EmailIngest.parse(spark, scanned))
        store.upsert(docs)
        tracker.setStatus(jobId, "PARSED", fileCount = n)
      }
    } finally { scanned.unpersist(); () }
  }
}
