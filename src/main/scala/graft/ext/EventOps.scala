package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Event-stream analytics over the `events` table: tumbling/hopping
  * windows, sessionization, JSON property extraction.
  *
  * The events parquet stores TIMESTAMP(NANOS), which Spark 4 only reads
  * as LongType under `spark.sql.legacy.parquet.nanosAsLong=true` (set in
  * Verify/Bench/test sessions). All time arithmetic therefore runs on
  * exact integer microseconds (`ts div 1000`), which DuckDB's
  * `epoch_us(ts)` reproduces bit-for-bit (both truncate ns → µs). These are the
  * batch twins of the Structured Streaming operators in
  * `graft.streaming` — same bucketing arithmetic, so streaming output
  * can be validated against these oracle-checked results.
  *
  * Windows use integer epoch-bucket arithmetic (floor(epoch/width))
  * rather than engine-specific window helpers so the DuckDB twin is
  * exact; epoch carries microseconds as double in both engines.
  */
object EventOps {

  // ----------------------------------------------- e80 tumbling

  /** e80: 5-minute tumbling window counts + value sums per event_type.
    *
    * `value` carries exactly 2 decimals (fixture-verified), so the sum
    * runs on integer cents and divides once at the end — an EXACT
    * result on both engines. `round(sum(double), 2)` is not: Spark
    * rounds the double's shortest decimal rendering, DuckDB rounds in
    * float space, and a true sum landing on a .xx5 boundary flips
    * between them (observed on e81 at sf0.1). */
  def tumblingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("bucket", expr("(ts div 1000) div 300000000"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .groupBy("bucket", "event_type")
      .agg(count(lit(1)).as("n_events"),
        (sum("cents") / 100.0).as("total_value"))
      .withColumn("window_start", timestamp_seconds(col("bucket") * 300))
      .select("window_start", "event_type", "n_events", "total_value")
      .orderBy("window_start", "event_type")

  val tumblingWindowSql: String =
    """SELECT CAST(to_timestamp(bucket * 300) AS TIMESTAMP) AS window_start,
      |  event_type, count(*) AS n_events,
      |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
      |FROM (SELECT epoch_us(ts) // 300000000 AS bucket, *
      |      FROM events)
      |GROUP BY bucket, event_type ORDER BY window_start, event_type""".stripMargin

  // ------------------------------------------------ e81 hopping

  /** e81: 10-minute windows hopping every 5 minutes — each event lands
    * in two windows (explode over the two covering hops). The 4-decimal
    * average is computed by integer half-up rounding of the exact
    * rational sum(cents)·100 / n — see e80 for why float round() can't
    * hash-check here. */
  def hoppingWindow(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("bucket", expr("(ts div 1000) div 300000000"))
      .withColumn("cents", expr("CAST(round(value * 100) AS BIGINT)"))
      .select(col("event_type"), col("cents"),
        explode(array(col("bucket"), col("bucket") - 1)).as("win"))
      .groupBy("win", "event_type")
      .agg(count(lit(1)).as("n_events"),
        expr("((2 * sum(cents) * 100 + count(1)) div (2 * count(1))) / 10000.0D")
          .as("avg_value"))
      .withColumn("window_start", timestamp_seconds(col("win") * 300))
      .select("window_start", "event_type", "n_events", "avg_value")
      .orderBy("window_start", "event_type")

  val hoppingWindowSql: String =
    """SELECT CAST(to_timestamp(win * 300) AS TIMESTAMP) AS window_start,
      |  event_type, count(*) AS n_events,
      |  ((2 * sum(cents) * 100 + count(*)) // (2 * count(*))) / 10000.0
      |    AS avg_value
      |FROM (
      |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
      |    unnest([bucket, bucket - 1]) AS win
      |  FROM (SELECT epoch_us(ts) // 300000000 AS bucket, *
      |        FROM events))
      |GROUP BY win, event_type ORDER BY window_start, event_type""".stripMargin

  // --------------------------------------------- e82 sessionize

  /** e82: gap-based sessionization (30-minute inactivity closes a
    * session) — the canonical stateful-stream op as a batch window
    * program: lag → new-session flag → running sum = session index. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    // all ordering + gap arithmetic on exact integer microseconds:
    // both engines truncate the parquet ns identically, and a float
    // seconds key could order sub-µs ties differently than DuckDB's
    // µs-truncated timestamp. Floats appear only in the final rounding.
    val byUser = Window.partitionBy("user_id").orderBy("tsus", "event_id")
    val sessions = events(s, d)
      .withColumn("tsus", expr("ts div 1000"))
      .withColumn("prev", lag("tsus", 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("tsus") - col("prev") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_idx", sum("new_sess").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // durations/averages via integer half-up rounding of exact µs /
    // count rationals (see e80 — float round() ties flip across engines)
    sessions
      .groupBy("user_id", "sess_idx")
      .agg(count(lit(1)).as("n_events"),
        expr("(2 * (max(tsus) - min(tsus)) + 1000) div 2000").as("dur_ms"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events"),
        expr("((2 * sum(n_events) * 10000 + count(1)) div (2 * count(1)))" +
          " / 10000.0D").as("avg_events_per_session"),
        (max("dur_ms") / 1000.0).as("longest_session_s"))
      .orderBy("user_id")
  }

  val sessionizeSql: String =
    """WITH t AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS tsus,
      |    lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, tsus,
      |    CASE WHEN prev IS NULL OR tsus - prev > 1800000000 THEN 1 ELSE 0 END
      |      AS new_sess
      |  FROM t),
      |sess AS (
      |  SELECT user_id, event_id, tsus,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY tsus, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
      |  FROM flagged),
      |per_session AS (
      |  SELECT user_id, sess_idx, count(*) AS n_events,
      |    (2 * (max(tsus) - min(tsus)) + 1000) // 2000 AS dur_ms
      |  FROM sess GROUP BY user_id, sess_idx)
      |SELECT user_id, count(*) AS n_sessions,
      |  CAST(sum(n_events) AS BIGINT) AS n_events,
      |  ((2 * sum(n_events) * 10000 + count(*)) // (2 * count(*))) / 10000.0
      |    AS avg_events_per_session,
      |  max(dur_ms) / 1000.0 AS longest_session_s
      |FROM per_session GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------- e83 json

  /** e83: JSON property extraction (`props` is a JSON string column)
    * + distribution by value decile. */
  def jsonProps(s: SparkSession, d: String): DataFrame =
    events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn("k_decile", (floor(col("k") / 10) * 10).cast("long"))
      .groupBy("k_decile")
      .agg(count(lit(1)).as("n"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("k_decile")

  val jsonPropsSql: String =
    """SELECT CAST(floor(k / 10) * 10 AS BIGINT) AS k_decile,
      |  count(*) AS n, min(k) AS min_k, max(k) AS max_k
      |FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY 1 ORDER BY k_decile""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e80_tumbling_window" -> tumblingWindow _,
    "e81_hopping_window"  -> hoppingWindow _,
    "e82_sessionize"      -> sessionize _,
    "e83_json_props"      -> jsonProps _,
  )

  val oracleSql: Map[String, String] = Map(
    "e80_tumbling_window" -> tumblingWindowSql,
    "e81_hopping_window"  -> hoppingWindowSql,
    "e82_sessionize"      -> sessionizeSql,
    "e83_json_props"      -> jsonPropsSql,
  )
}
