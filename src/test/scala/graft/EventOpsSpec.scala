package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.EventOps

/** As-of / range join edge semantics over a hand-built events fixture
  * (ties, band boundaries, bucket crossings — the cases the synthetic
  * corpus only hits by accident). */
class EventOpsSpec extends AnyFunSuite with SparkSpec {

  /** Write a tiny events.parquet (ts in NANOS as long, like the driver
    * fixture under nanosAsLong) and return its directory. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-events").toString
    def ns(us: Long) = us * 1000L
    val rows = Seq(
      // user 1: straightforward prior click
      (1L, ns(1000), 1L, "click", 1.0, "{}"),
      (2L, ns(2000), 1L, "purchase", 1.0, "{}"),
      // user 2: click exactly AT purchase ts (>= includes it, gap 0),
      // plus a same-(user,tsus) duplicate click — max event_id kept
      (3L, ns(5000), 2L, "click", 1.0, "{}"),
      (4L, ns(5000), 2L, "click", 1.0, "{}"),
      (5L, ns(5000), 2L, "purchase", 1.0, "{}"),
      // user 3: purchase BEFORE any click — dropped (inner asof)
      (6L, ns(1000), 3L, "purchase", 1.0, "{}"),
      (7L, ns(2000), 3L, "click", 1.0, "{}"),
      // user 4 range-join cases around error at t=20min:
      (8L, ns(1200000000L), 4L, "error", 1.0, "{}"),
      (9L, ns(600000000L), 4L, "click", 1.0, "{}"),   // exactly -10min: counted
      (10L, ns(1200000000L), 4L, "click", 1.0, "{}"), // exactly at error: excluded
      (11L, ns(630000000L), 4L, "click", 1.0, "{}"),  // -9.5min, previous bucket: counted
      (12L, ns(1199999999L), 4L, "click", 1.0, "{}"), // 1us before: counted
      // user 5: error with no clicks at all → 0
      (13L, ns(1000), 5L, "error", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("asof join: tie at equal ts, dup-click keeper, unmatched dropped") {
    val got = EventOps.asofJoin(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(5))) // (purchase, click, gap)
    assert(got.toSeq == Seq(
      (2L, 1L, 1000L), // user 1: prior click, gap 1000us
      (5L, 4L, 0L)     // user 2: same-ts click, max(event_id)=4 of the dup pair
    ))                 // user 3's purchase absent: no click at-or-before
  }

  test("range join: band boundaries inclusive/exclusive, bucket crossing, zero case") {
    val got = EventOps.rangeJoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // clicks 9 (exactly -10min, >=), 11 (prev bucket), 12 (-1us) count;
    // click 10 at the error instant is excluded (<)
    assert(got == Map(8L -> 3L, 13L -> 0L))
  }
}
