package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.ext.TextOps.md5Long
import graft.functions.RollingHash64.rolling_hash64

/** Second relational tier: exact percentiles, ordered array aggregation,
  * string-distance joins, and the SQL-text API (temp views + spark.sql
  * with CTEs and subqueries — the same Catalyst plans as the DataFrame
  * API, proving the engine serves both surfaces). */
object Advanced {

  /** q35: exact interpolated percentiles per market segment. Both
    * probabilities are DYADIC (1/2, 7/8) so the interpolation position
    * p·(n−1) is exactly representable and both engines interpolate
    * between the same two order statistics with the same exact weight —
    * 0.9 is not representable in binary and its position can land an
    * ulp apart cross-engine, which round(,4) only narrows to a
    * .00005-boundary coin flip (the q47 dyadic-probability rule). */
  def percentiles(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .groupBy("c_mktsegment")
      .agg(
        round(expr("percentile(c_acctbal, 0.5)"), 4).as("median_bal"),
        round(expr("percentile(c_acctbal, 0.875)"), 4).as("p875_bal"),
        round(min("c_acctbal"), 2).as("min_bal"),
        round(max("c_acctbal"), 2).as("max_bal"))
      .orderBy("c_mktsegment")

  val percentilesSql: String =
    """SELECT c_mktsegment,
      |  round(quantile_cont(c_acctbal, 0.5), 4) AS median_bal,
      |  round(quantile_cont(c_acctbal, 0.875), 4) AS p875_bal,
      |  round(min(c_acctbal), 2) AS min_bal,
      |  round(max(c_acctbal), 2) AS max_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q37: ordered array aggregation — top-3 order totals per status
    * built as a sorted list column, then unrolled to (rank, value) rows.
    * The unroll keeps every output cell scalar so the driver's row
    * compare can canonicalize it (array-typed cells are unhashable in
    * the harness); the aggregation itself still exercises
    * collect_list → array_sort → slice. Rank→value is deterministic
    * because the values are emitted in sorted (desc) order. */
  def arrayAgg(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(slice(reverse(array_sort(collect_list(round(col("o_totalprice"), 2)))),
        1, 3).as("top3_totals"),
        count(lit(1)).as("n"))
      .select(col("o_orderstatus"), col("n"),
        posexplode(col("top3_totals")).as(Seq("pos", "total")))
      .select(col("o_orderstatus"), (col("pos") + 1).cast("bigint").as("rnk"),
        col("total"), col("n"))
      .orderBy("o_orderstatus", "rnk")

  val arrayAggSql: String =
    """WITH ranked AS (
      |  SELECT o_orderstatus, round(o_totalprice, 2) AS total,
      |    row_number() OVER (PARTITION BY o_orderstatus
      |      ORDER BY round(o_totalprice, 2) DESC) AS rnk,
      |    count(*) OVER (PARTITION BY o_orderstatus) AS n
      |  FROM orders)
      |SELECT o_orderstatus, CAST(rnk AS BIGINT) AS rnk, total, n
      |FROM ranked WHERE rnk <= 3
      |ORDER BY o_orderstatus, rnk""".stripMargin

  /** q38: string-similarity self-join — near-identical part names by
    * Levenshtein distance (bounded key range keeps the pair space flat
    * across scale factors). */
  def nameDistance(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).filter(col("p_partkey") < 200)
      .select("p_partkey", "p_name")
    p.toDF("a_key", "a_name")
      .join(p.toDF("b_key", "b_name"), col("a_key") < col("b_key"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")).cast("bigint"))
      .filter(col("dist") <= 4)
      .select("a_key", "b_key", "a_name", "b_name", "dist")
      .orderBy("a_key", "b_key")
  }

  val nameDistanceSql: String =
    """SELECT a.p_partkey a_key, b.p_partkey b_key,
      |  a.p_name a_name, b.p_name b_name,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
      |FROM (SELECT p_partkey, p_name FROM part WHERE p_partkey < 200) a
      |JOIN (SELECT p_partkey, p_name FROM part WHERE p_partkey < 200) b
      |  ON a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 4
      |ORDER BY a_key, b_key""".stripMargin

  /** q39: string-function projection (pad/translate/reverse/position). */
  def stringOps(s: SparkSession, d: String): DataFrame =
    nation(s, d).select(
      col("n_nationkey"),
      lpad(col("n_name"), 12, ".").as("padded"),
      translate(col("n_name"), "_", "-").as("translated"),
      reverse(col("n_name")).as("reversed"),
      instr(col("n_name"), "_").cast("bigint").as("underscore_at"),
      repeat(substring(col("n_name"), 1, 2), 2).as("prefix_twice"),
      length(col("n_name")).cast("bigint").as("name_len"))
      .orderBy("n_nationkey")

  val stringOpsSql: String =
    """SELECT n_nationkey,
      |  lpad(n_name, 12, '.') AS padded,
      |  translate(n_name, '_', '-') AS translated,
      |  reverse(n_name) AS reversed,
      |  CAST(strpos(n_name, '_') AS BIGINT) AS underscore_at,
      |  repeat(substring(n_name, 1, 2), 2) AS prefix_twice,
      |  CAST(length(n_name) AS BIGINT) AS name_len
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** q40: the SQL-text surface — scalar subquery + IN subquery through
    * spark.sql over registered views (same Catalyst plans as the
    * DataFrame API). Threshold 1.8×avg, probed against the fixture:
    * 2×avg clears NOTHING at sf0.01 (the check was vacuous — hash
    * matching on an empty set); 1.8× yields 297 rows at sf0.01 and 34
    * at sf0.001, so the subquery surface is value-checked on a
    * non-trivial result set at both scales. */
  def sqlSubqueries(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("v_orders")
    customer(s, d).createOrReplaceTempView("v_customer")
    s.sql(
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
        |FROM v_orders
        |WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM v_orders)
        |  AND o_custkey IN (SELECT c_custkey FROM v_customer
        |                    WHERE c_mktsegment = 'MACHINERY')
        |ORDER BY o_orderkey""".stripMargin)
  }

  val sqlSubqueriesSql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      |FROM orders
      |WHERE o_totalprice > 1.8 * (SELECT avg(o_totalprice) FROM orders)
      |  AND o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'MACHINERY')
      |ORDER BY o_orderkey""".stripMargin

  /** q41: CTE + window over aggregate — month-over-month revenue delta
    * through the SQL surface. */
  def sqlCteWindows(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("v_orders")
    s.sql(
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS month,
        |    round(sum(o_totalprice), 2) AS revenue
        |  FROM v_orders GROUP BY 1)
        |SELECT month, revenue,
        |  round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS mom_delta
        |FROM monthly ORDER BY month""".stripMargin)
  }

  val sqlCteWindowsSql: String =
    """WITH monthly AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |    round(sum(o_totalprice), 2) AS revenue
      |  FROM orders GROUP BY 1)
      |SELECT month, revenue,
      |  round(revenue - lag(revenue) OVER (ORDER BY month), 2) AS mom_delta
      |FROM monthly ORDER BY month""".stripMargin

  /** t46: document fingerprints through the native codegen'd
    * RollingHash64 Expression. Oracle-checked: DuckDB BIGINT traps on
    * overflow, so the twin emulates the 64-bit wraparound in HUGEINT
    * (fold over code points — the fixture text is pure ASCII, verified,
    * so ord(char) == byte) with mod 2⁶⁴ per step, then maps back to the
    * signed representation. */
  def rollingFingerprint(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      // wsClass, not Java "\\s+": RE2 \s (the oracle's '\s+') excludes
      // \x0B while Java's includes it — share TextOps' oracle-aligned
      // class so \x0B-bearing text fingerprints identically
      rolling_hash64(regexp_replace(trim(lower(col("text"))),
          graft.ext.TextOps.wsClass, " "))
        .as("rolling_fp"))
      .orderBy("doc_id")

  val rollingFingerprintSql: String =
    """SELECT doc_id,
      |  CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
      |            THEN v - 18446744073709551616::HUGEINT
      |            ELSE v END AS BIGINT) AS rolling_fp
      |FROM (
      |  SELECT doc_id, list_reduce(
      |    list_prepend(0::HUGEINT,
      |      list_transform(range(1, length(t) + 1),
      |        i -> ord(substring(t, CAST(i AS INT), 1))::HUGEINT)),
      |    (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS v
      |  FROM (SELECT doc_id,
      |          regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
      |        FROM documents))
      |ORDER BY doc_id""".stripMargin

  /** q47: sketch tier — a KMV (k-minimum-values) distinct-count sketch
    * per segment plus exact quantiles, all oracle-checked:
    *  - KMV: keep the k=8 smallest distinct `md5Long(custkey)` hashes
    *    per group via a bounded-heap typed Aggregator (≤ k rows leave
    *    each map partition — the mergeable-sketch shape HLL serves at
    *    scale, but on a hash family DuckDB reproduces bit-for-bit, so
    *    the estimate itself is hash-checked, not just smoke-tested);
    *    est = (k-1)·2^60 div kth_min, integer division on both engines.
    *  - Quantiles on integer CENTS at dyadic probabilities (.25/.5/.75):
    *    p·(n-1) and the interpolation weights are exact binary
    *    fractions, so Spark's `percentile` and DuckDB's `quantile_cont`
    *    produce bit-identical doubles (0.9 would not — 9(n-1)/10 is not
    *    representable). Values stay in cents, undivided: dividing by
    *    100 would leave the binary grid and re-open round-tie skew. */
  def sketches(s: SparkSession, d: String): DataFrame = {
    val k = 8
    val bottomK = udaf(new graft.functions.BoundedAggs.BottomKDistinct(k),
      Encoders.scalaLong)
    orders(s, d)
      .select(col("o_orderstatus"),
        md5Long(col("o_custkey").cast("string")).as("h"),
        round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
      .groupBy("o_orderstatus")
      .agg(bottomK(col("h")).as("kmv"),
        count_distinct(col("h")).as("exact_custs"),
        expr("percentile(cents, 0.25D)").as("p25_cents"),
        expr("percentile(cents, 0.5D)").as("median_cents"),
        expr("percentile(cents, 0.75D)").as("p75_cents"))
      .withColumn("n_seen", size(col("kmv.items")).cast("long"))
      .withColumn("kmv_est",
        when(col("n_seen") < k, col("n_seen"))
          .otherwise(expr(s"${(k - 1).toLong * (1L << 60)} div element_at(kmv.items, $k)")))
      .select("o_orderstatus", "kmv_est", "exact_custs",
        "p25_cents", "median_cents", "p75_cents")
      .orderBy("o_orderstatus")
  }

  /** DuckDB twin of the KMV sketch: `SELECT DISTINCT hash ORDER BY hash
    * LIMIT k` per group, same integer estimator. */
  val sketchesSql: String =
    """WITH o AS (
      |  SELECT o_orderstatus,
      |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT AS h,
      |    CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
      |  FROM orders),
      |hs AS (SELECT DISTINCT o_orderstatus, h FROM o),
      |ranked AS (
      |  SELECT o_orderstatus, h,
      |    row_number() OVER (PARTITION BY o_orderstatus ORDER BY h) AS rn
      |  FROM hs),
      |kmv AS (
      |  SELECT o_orderstatus, count(*) AS exact_custs,
      |    CASE WHEN count(*) < 8 THEN count(*)
      |         ELSE 8070450532247928832 // max(CASE WHEN rn <= 8 THEN h END)
      |    END AS kmv_est
      |  FROM ranked GROUP BY 1),
      |qs AS (
      |  SELECT o_orderstatus,
      |    quantile_cont(cents, 0.25) AS p25_cents,
      |    quantile_cont(cents, 0.5) AS median_cents,
      |    quantile_cont(cents, 0.75) AS p75_cents
      |  FROM o GROUP BY 1)
      |SELECT o_orderstatus, kmv_est, exact_custs,
      |  p25_cents, median_cents, p75_cents
      |FROM kmv JOIN qs USING (o_orderstatus)
      |ORDER BY o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_sketches"        -> sketches _,
    "q35_percentiles"     -> percentiles _,
    "q37_array_agg"       -> arrayAgg _,
    "q38_name_distance"   -> nameDistance _,
    "q39_string_ops"      -> stringOps _,
    "q40_sql_subqueries"  -> sqlSubqueries _,
    "q41_sql_cte_window"  -> sqlCteWindows _,
    "t46_rolling_fp"      -> rollingFingerprint _,
  )

  val oracleSql: Map[String, String] = Map(
    "q47_sketches"       -> sketchesSql,
    "q35_percentiles"    -> percentilesSql,
    "q37_array_agg"      -> arrayAggSql,
    "q38_name_distance"  -> nameDistanceSql,
    "q39_string_ops"     -> stringOpsSql,
    "q40_sql_subqueries" -> sqlSubqueriesSql,
    "q41_sql_cte_window" -> sqlCteWindowsSql,
    "t46_rolling_fp"     -> rollingFingerprintSql,
  )
}
