package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-state typed Aggregators — the scale-safe replacement for the
  * "row_number over a handful of partitions" idiom: each partial buffer
  * holds at most k entries, so map-side partial aggregation shrinks
  * every partition to ≤ k rows BEFORE the exchange. A window sort over
  * `partitionBy(q_id)` with 10 query ids instead funnels the entire
  * scored corpus through 10 tasks — correct at fixture scale, a
  * single-task bottleneck at 100 TB.
  *
  * Comparisons use java.lang.Double.compare (the same total order
  * Spark's SortOrder uses, incl. -0.0 < 0.0), so results are
  * bit-identical to the window formulation they replace.
  */
object BoundedAggs {

  /** (score, id) candidate — input AND element type of [[TopKScored]]. */
  case class Scored(score: Double, id: Long)

  /** Buffer/output wrapper (Encoders.product needs a Product). */
  case class ScoredBuf(items: Seq[Scored])

  private val scoredOrd: Ordering[Scored] = (a: Scored, b: Scored) => {
    // score DESC (matching `orderBy(col("cosine").desc, col("c_id"))`),
    // id ASC tiebreak
    val c = java.lang.Double.compare(b.score, a.score)
    if (c != 0) c else java.lang.Long.compare(a.id, b.id)
  }

  /** Top-k by (score DESC, id ASC): the bounded-heap replacement for
    * `row_number().over(Window.partitionBy(key).orderBy(desc))` +
    * `filter(rank <= k)`. Output items are already rank-ordered —
    * posexplode gives (rank-1, candidate). */
  class TopKScored(k: Int) extends Aggregator[Scored, ScoredBuf, ScoredBuf] {
    def zero: ScoredBuf = ScoredBuf(Vector.empty)
    private def trim(xs: Seq[Scored]): Seq[Scored] = {
      val sorted = xs.sorted(scoredOrd)
      if (sorted.size > k) sorted.take(k) else sorted
    }
    def reduce(b: ScoredBuf, x: Scored): ScoredBuf =
      // skip the sort when x can't displace a full buffer's tail
      if (b.items.size >= k && scoredOrd.lteq(b.items.last, x)) b
      else ScoredBuf(trim(b.items :+ x))
    def merge(a: ScoredBuf, b: ScoredBuf): ScoredBuf =
      ScoredBuf(trim(a.items ++ b.items))
    def finish(b: ScoredBuf): ScoredBuf = b
    def bufferEncoder: Encoder[ScoredBuf] = Encoders.product[ScoredBuf]
    def outputEncoder: Encoder[ScoredBuf] = Encoders.product[ScoredBuf]
  }

  /** Buffer/output wrapper for [[BottomKDistinct]]. */
  case class LongsBuf(items: Seq[Long])

  /** k smallest DISTINCT long values — a KMV (k-minimum-values)
    * distinct-count sketch when fed uniform hashes: est ≈ (k-1)·2^60 /
    * kth_min for 60-bit hashes. Exactly `SELECT DISTINCT h ORDER BY h
    * LIMIT k` per group, as one bounded aggregate. */
  class BottomKDistinct(k: Int) extends Aggregator[Long, LongsBuf, LongsBuf] {
    def zero: LongsBuf = LongsBuf(Vector.empty)
    private def insert(xs: Seq[Long], x: Long): Seq[Long] =
      if (xs.size >= k && xs.last <= x) xs // covers duplicates of kept values too
      else if (xs.contains(x)) xs
      else {
        val merged = (xs :+ x).sorted
        if (merged.size > k) merged.take(k) else merged
      }
    def reduce(b: LongsBuf, x: Long): LongsBuf = LongsBuf(insert(b.items, x))
    def merge(a: LongsBuf, b: LongsBuf): LongsBuf =
      LongsBuf(b.items.foldLeft(a.items)(insert))
    def finish(b: LongsBuf): LongsBuf = b
    def bufferEncoder: Encoder[LongsBuf] = Encoders.product[LongsBuf]
    def outputEncoder: Encoder[LongsBuf] = Encoders.product[LongsBuf]
  }
}
