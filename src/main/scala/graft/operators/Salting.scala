package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A hot grouping key concentrates its rows in one reducer; salting
  * splits each key into `numSalts` sub-keys so the heavy partial
  * aggregation spreads over `numSalts` reducers, then a cheap second
  * aggregation (over at most `numSalts` rows per key) merges partials.
  * Complements AQE's skew-join splitting (which handles joins, not
  * aggregations).
  *
  * Only algebraic aggregates decompose this way; the API takes the
  * partial and final expressions explicitly (e.g. sum→sum,
  * count→sum, min→min).
  */
object Salting {

  /** Run `body` with shuffle parallelism sized to `rows` (~50k rows per
    * partition, floored at 1, capped at the session setting), restoring
    * the session value after. Iterative jobs over small-after-filter
    * inputs otherwise pay dozens of near-empty full-width stages; at
    * real scale the formula returns the session parallelism unchanged.
    * Any DataFrame `body` returns must be MATERIALIZED inside it
    * (checkpoint / cache+count) — a lazy plan would execute under the
    * restored setting instead. */
  // withVolumeShuffle mutates SESSION-global state: an overlapping
  // call from another thread would read the shrunken value as its
  // "previous" and restore it permanently, leaving every later query
  // at fixture-sized parallelism. Serialize the save-mutate-restore
  // window instead (the e102 provider-override pattern); bodies are
  // self-contained Spark jobs, so the lock cannot deadlock and
  // callers that need concurrency still parallelize INSIDE a body.
  private val shuffleConfLock = new Object

  def withVolumeShuffle[T](s: org.apache.spark.sql.SparkSession, rows: Long)
      (body: => T): T = shuffleConfLock.synchronized {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    val p = math.max(1L, math.min(prev.toLong, (rows + 49999) / 50000))
    s.conf.set(key, p.toString)
    try body finally s.conf.set(key, prev)
  }

  /** saltedAggregate(df, keys, partial, final):
    * df.groupBy(keys :+ salt).agg(partials) → groupBy(keys).agg(finals).
    *
    * @param partials aggregate columns for phase 1, each aliased
    * @param finals   aggregate columns for phase 2 over the phase-1
    *                 aliases, each aliased to the output name
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], numSalts: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(numSalts)).cast("int"))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Convenience: salted sum+count (covers sum/count/avg shapes). */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      numSalts: Int = 16): DataFrame =
    saltedAggregate(df, keys, numSalts,
      partials = Seq(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt")),
      finals = Seq(sum("__psum").as(s"sum_$valueCol"),
        sum("__pcnt").as("n_rows")))
}
