package graft.query

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.GraphOps

/** Driver-contract entries for the reference's own indexed query
  * surface (SURVEY.md §2.5 Q1–Q6) over the deterministic demo corpus —
  * every entry runs the REAL pipeline (RFC-822 parse → merge → query
  * builders). Email tables are not part of the fixture set, so these
  * are rows-only checks; the same builders are oracle-equivalently
  * exercised by EmailPipelineSpec assertions. */
object EmailOps {

  private def store(s: SparkSession): DataFrame = GraphOps.demoStore(s)

  /** em60 / Q5: mailbox (hierarchy) listing. */
  def byMailbox(s: SparkSession, d: String): DataFrame =
    EmailQueries.byMailbox(store(s), "user0", "inbox")
      .select("dedupe_key", "from", "subject").orderBy("dedupe_key")

  /** em61 / Q3: recipient lookup across to/cc/bcc. */
  def byRecipient(s: SparkSession, d: String): DataFrame =
    EmailQueries.byRecipient(store(s), "team@corp.com", includeCcBcc = true)
      .select("dedupe_key", "from").orderBy("dedupe_key")

  /** em62 / Q2: sender lookup. */
  def bySender(s: SparkSession, d: String): DataFrame =
    EmailQueries.bySender(store(s), "alice@corp.com")
      .select("dedupe_key", "subject").orderBy("dedupe_key")

  /** em63 / Q4: date-range scan. */
  def byDateRange(s: SparkSession, d: String): DataFrame =
    EmailQueries.byDateRange(store(s),
      Timestamp.from(Instant.parse("2001-05-01T00:00:00Z")),
      Timestamp.from(Instant.parse("2001-05-15T00:00:00Z")))
      .select("dedupe_key", "date").orderBy("dedupe_key")

  /** em64: communication-graph edges (§1.5 graph 2). */
  def commEdges(s: SparkSession, d: String): DataFrame =
    EmailQueries.communicationEdges(store(s)).orderBy("src", "dst")

  /** em65: hierarchy rollup (messages per user/folder). */
  def mailboxCounts(s: SparkSession, d: String): DataFrame =
    EmailQueries.mailboxCounts(store(s)).orderBy("user", "folder")

  /** em66 / Q1: point lookup by unique key. */
  def byKey(s: SparkSession, d: String): DataFrame =
    EmailQueries.byKey(store(s), "<m10@corp>")
      .select("dedupe_key", "from", "subject", "date")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "em60_by_mailbox"    -> byMailbox _,
    "em61_by_recipient"  -> byRecipient _,
    "em62_by_sender"     -> bySender _,
    "em63_by_date_range" -> byDateRange _,
    "em64_comm_edges"    -> commEdges _,
    "em65_mailbox_counts" -> mailboxCounts _,
    "em66_by_key"        -> byKey _,
  )
}
