package graft.query

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Typed query surface over the email store — one builder per query
  * shape the reference's secondary indexes promise (SURVEY.md §2.5,
  * indexes declared at ingest_enron.py:144-152).
  *
  * Each is a plain Column predicate so Catalyst pushes it into the
  * parquet scan (equality/range predicates reach PushedFilters; the
  * array/struct predicates at least prune columns). At 100 TB the store
  * would be date-partitioned (Q4 prunes partitions) and optionally
  * bucketed by sender (Q2 co-locates).
  */
object EmailQueries {

  /** Q1: point lookup on the unique key. */
  def byKey(store: DataFrame, key: String): DataFrame =
    store.filter(col("dedupe_key") === key)

  /** Q2: all mail sent by an address ({from:1} index). */
  def bySender(store: DataFrame, addr: String): DataFrame =
    store.filter(col("from") === addr.trim.toLowerCase)

  /** Q3: all mail received by an address — Mongo's multikey index over
    * the `to` array ≙ an array_contains predicate. `cc`/`bcc` variants
    * cover the full recipient surface. */
  def byRecipient(store: DataFrame, addr: String,
      includeCcBcc: Boolean = false): DataFrame = {
    val a = addr.trim.toLowerCase
    val p: Column =
      if (includeCcBcc)
        array_contains(col("to"), a) || array_contains(col("cc"), a) ||
          array_contains(col("bcc"), a)
      else array_contains(col("to"), a)
    store.filter(p)
  }

  /** Q4: date-range scan ({date:1} index). */
  def byDateRange(store: DataFrame, from: Timestamp, until: Timestamp): DataFrame =
    store.filter(col("date") >= lit(from) && col("date") < lit(until))

  /** Q5: mailbox listing — the hierarchy read-path (compound index
    * {mailboxes.user, mailboxes.folder}). */
  def byMailbox(store: DataFrame, user: String, folder: String): DataFrame =
    store.filter(exists(col("mailboxes"),
      m => m.getField("user") === user && m.getField("folder") === folder))

  /** Q6: entity lookup ({entities.text, entities.type} index). */
  def byEntity(store: DataFrame, text: String, entityType: String): DataFrame =
    store.filter(exists(col("entities"),
      e => e.getField("text") === text && e.getField("type") === entityType))

  /** Folder listing rolled up: message counts per (user, folder) —
    * the containment hierarchy aggregated (SURVEY.md §1.5 graph 1). */
  def mailboxCounts(store: DataFrame): DataFrame =
    store
      .select(explode(col("mailboxes")).as("mb"))
      .groupBy(col("mb.user").as("user"), col("mb.folder").as("folder"))
      .agg(count(lit(1)).as("n_messages"))

  /** Communication graph edges: from → each recipient, weighted
    * (SURVEY.md §1.5 graph 2, fields ingest_enron.py:126-129). */
  def communicationEdges(store: DataFrame): DataFrame =
    store
      .select(col("from").as("src"),
        explode(array_union(array_union(col("to"), col("cc")), col("bcc")))
          .as("dst"))
      .filter(col("src") =!= "" && col("dst") =!= "")
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("n_messages"))
}
