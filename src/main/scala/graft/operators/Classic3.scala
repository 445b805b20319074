package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Fifth relational tier — the remaining classic TPC-H query shapes
  * adapted to this schema (no partsupp/shipmode columns in the driver
  * fixtures): cross-nation trade volume (q7), important-parts threshold
  * against a global aggregate (q11), promo revenue ratio (q14), and
  * distinct-count grouping (q16).
  *
  * Scale notes:
  *  - q07 is the one genuinely fact-fact join here (lineitem ⋈ orders ⋈
  *    customer): both big sides shuffle on their join keys once; the
  *    nation/supplier dims are broadcast so the fact rows never
  *    re-shuffle for them.
  *  - q11's global total is a 1-row aggregate broadcast back over the
  *    per-part rollup — the "compare each group to the grand total"
  *    shape without a second scan or a window over all rows.
  *  - Money thresholds/ratios run on exact BIGINT ten-thousandths
  *    (prices are 2-decimal, discounts 2-decimal → volumes 4-decimal
  *    exact), so cross-engine fp summation order can never flip a
  *    boundary row (the round-2 lesson; see graft-spark memory notes).
  */
object Classic3 {

  /** Line revenue in exact integer ten-thousandths (4-decimal volume). */
  private val vol4: org.apache.spark.sql.Column =
    expr("CAST(round(l_extendedprice * (1.0D - l_discount) * 10000) AS BIGINT)")

  // ------------------------------------------------- q07 nation trade

  /** q7-style: revenue shipped between different nations, by supplier
    * nation × customer nation × ship year (1996–1997). */
  def nationTrade(s: SparkSession, d: String): DataFrame = {
    // range predicate on the raw column (not year()) so the filter
    // pushes to the parquet scan and prunes row groups by min/max
    val l = lineitem(s, d).filter(
      col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
    val o = orders(s, d)
    val cu = customer(s, d)
    val su = supplier(s, d)
    val n1 = nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n2 = nation(s, d)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(cu, o("o_custkey") === cu("c_custkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .select(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"), vol4.as("v4"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg((sum("v4") / 10000.0).as("revenue"), count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val nationTradeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |    / 10000.0 AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE year(l_shipdate) IN (1996, 1997) AND n1.n_name <> n2.n_name
      |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // --------------------------------------------- q11 important parts

  /** q11-style: parts whose total revenue exceeds 1.5× the average
    * per-part revenue (as 2·v·n > 3·total in exact integer math) — each
    * group compared against a broadcast 1-row grand total. The
    * multiple-of-average criterion is scale-free: the classic
    * fixed-fraction-of-total cutoff selects everything at one SF and
    * nothing at another. */
  def importantParts(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d).select(col("l_partkey"), vol4.as("v4"))
      .groupBy("l_partkey").agg(sum("v4").as("v4"))
    val total = rev.agg(sum("v4").as("t4"), count(lit(1)).as("np"))
    rev.crossJoin(broadcast(total))
      .filter(col("v4") * col("np") * 2 > col("t4") * 3)
      .select(col("l_partkey"), (col("v4") / 10000.0).as("part_value"))
      .orderBy("l_partkey")
  }

  val importantPartsSql: String =
    """WITH rev AS (
      |  SELECT l_partkey,
      |    sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |      AS v4
      |  FROM lineitem GROUP BY 1),
      |tot AS (SELECT sum(v4) AS t4, count(*) AS np FROM rev)
      |SELECT l_partkey, v4 / 10000.0 AS part_value
      |FROM rev, tot WHERE v4 * np * 2 > t4 * 3
      |ORDER BY l_partkey""".stripMargin

  // ----------------------------------------------- q14 promo revenue

  /** q14-style: monthly share of PROMO-part revenue in 1997 — the ratio
    * of two exact BIGINT sums via integer half-down division (`div` ==
    * DuckDB `//` for positives), so the percentage is bit-stable. */
  def promoRevenue(s: SparkSession, d: String): DataFrame =
    lineitem(s, d).filter(
      col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
      .select(month(col("l_shipdate")).cast("bigint").as("l_month"),
        vol4.as("v4"), (col("p_type") === "PROMO").as("is_promo"))
      .groupBy("l_month")
      .agg(sum(when(col("is_promo"), col("v4")).otherwise(lit(0L))).as("p4"),
        sum("v4").as("t4"), count(lit(1)).as("n_lines"))
      .select(col("l_month"),
        (expr("(p4 * 10000) div t4") / 100.0).as("promo_pct"),
        col("n_lines"))
      .orderBy("l_month")

  val promoRevenueSql: String =
    """WITH m AS (
      |  SELECT CAST(month(l_shipdate) AS BIGINT) AS l_month,
      |    sum(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
      |        ELSE 0 END) AS p4,
      |    sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |      AS t4,
      |    count(*) AS n_lines
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE year(l_shipdate) = 1997
      |  GROUP BY 1)
      |SELECT l_month, ((p4 * 10000) // t4) / 100.0 AS promo_pct, n_lines
      |FROM m ORDER BY l_month""".stripMargin

  // ------------------------------------------ q16 supplier-part count

  /** q16-style: distinct suppliers shipping each (brand, type, size)
    * part family, excluding one brand and large sizes — exact distinct
    * aggregation over the fact table with the part dim broadcast. */
  def supplierCountByPart(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d)
      .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 25)
    lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val supplierCountByPartSql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand <> 'Brand#1' AND p_size <= 25
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // -------------------------------------------- q15 top supplier

  /** q15-style: the supplier(s) with maximum revenue in 1997 Q1 —
    * per-supplier rollup compared against a broadcast 1-row maximum.
    * Revenue stays in exact BIGINT ten-thousandths, so the equality
    * with the max can never be split by fp summation order. */
  def topSupplierByRevenue(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .groupBy("l_suppkey").agg(sum(vol4).as("r4"))
    val maxRev = rev.agg(max("r4").as("m4"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("r4") === col("m4"))
      .join(broadcast(supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("r4") / 10000.0).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val topSupplierByRevenueSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |      AS r4
      |  FROM lineitem
      |  WHERE l_shipdate >= '1997-01-01' AND l_shipdate < '1997-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, r4 / 10000.0 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE r4 = (SELECT max(r4) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // -------------------------------------------- q49 ntile quartiles

  /** q49: ntile quartile bucketing of customers by account balance per
    * market segment — the one window shape the suite didn't exercise.
    * The order runs on exact integer CENTS (round(bal*100) AS BIGINT),
    * not on round(bal, 2) doubles: cross-engine round() on doubles can
    * land on .5 tie boundaries, and the window order key must be
    * bitwise-identical for the bucket boundaries to match. Reported
    * min/max divide the cents once at the end. At 100 TB a global
    * per-segment sort gives way to approximate percentile boundaries +
    * a bucketing join; this exercises the exact window operator. */
  def customerQuartiles(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("cents"), col("c_custkey"))
    customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
      .withColumn("quartile", ntile(4).over(w).cast("bigint"))
      .groupBy("c_mktsegment", "quartile")
      .agg(count(lit(1)).as("n_cust"),
        (min("cents") / 100.0).as("min_bal"),
        (max("cents") / 100.0).as("max_bal"))
      .orderBy("c_mktsegment", "quartile")
  }

  val customerQuartilesSql: String =
    """WITH q AS (
      |  SELECT c_mktsegment,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
      |    CAST(ntile(4) OVER (PARTITION BY c_mktsegment
      |      ORDER BY CAST(round(c_acctbal * 100) AS BIGINT), c_custkey)
      |      AS BIGINT) AS quartile
      |  FROM customer)
      |SELECT c_mktsegment, quartile, count(*) AS n_cust,
      |  min(cents) / 100.0 AS min_bal, max(cents) / 100.0 AS max_bal
      |FROM q GROUP BY 1, 2 ORDER BY c_mktsegment, quartile""".stripMargin

  // --------------------------------------------- q50 dense-rank leaders

  /** q50: per-brand revenue leaders by DENSE rank ≤ 2 — unlike the
    * row_number top-k queries, ties share a rank and every tied part
    * is kept. Ranking runs on exact BIGINT revenue, so the tie set is
    * identical across engines; the output order is then totalized by
    * part key. */
  def brandLeaders(s: SparkSession, d: String): DataFrame = {
    val rev = lineitem(s, d)
      .join(broadcast(part(s, d).select("p_partkey", "p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "l_partkey").agg(sum(vol4).as("r4"))
    val w = Window.partitionBy("p_brand").orderBy(col("r4").desc)
    rev.withColumn("rnk", dense_rank().over(w).cast("bigint"))
      .filter(col("rnk") <= 2)
      .select(col("p_brand"), col("rnk"), col("l_partkey"),
        (col("r4") / 10000.0).as("part_revenue"))
      .orderBy("p_brand", "rnk", "l_partkey")
  }

  val brandLeadersSql: String =
    """WITH rev AS (
      |  SELECT p_brand, l_partkey,
      |    sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
      |      AS r4
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT p_brand, l_partkey, r4, CAST(dense_rank() OVER (
      |    PARTITION BY p_brand ORDER BY r4 DESC) AS BIGINT) AS rnk
      |  FROM rev)
      |SELECT p_brand, rnk, l_partkey, r4 / 10000.0 AS part_revenue
      |FROM ranked WHERE rnk <= 2
      |ORDER BY p_brand, rnk, l_partkey""".stripMargin

  // ---------------------------------------------- q51 moving average

  /** q51: daily order revenue with a 7-day trailing moving average — a
    * time-RANGE window frame (`RANGE BETWEEN 6 PRECEDING AND CURRENT
    * ROW` on the integer epoch-day key), so calendar gaps shorten the
    * window rather than sliding over a fixed row count. The corpus
    * aggregates to one row per day FIRST (map-side partials, one
    * shuffle); the unpartitioned window then runs over the tiny per-day
    * frame (#days rows — bounded by the calendar, not the data volume,
    * so the single-partition window stays trivial at any SF). The
    * average is exact: integer half-up division of the window's cent
    * sum by its day count. */
  def movingAvgRevenue(s: SparkSession, d: String): DataFrame = {
    val daily = orders(s, d)
      .withColumn("day",
        datediff(col("o_orderdate").cast("date"),
          to_date(lit("1970-01-01"))).cast("long"))
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .groupBy("day").agg(sum("cents").as("cents"))
    val w = Window.orderBy("day").rangeBetween(-6, 0)
    daily
      .withColumn("wsum", sum("cents").over(w))
      .withColumn("wn", count(lit(1)).over(w))
      .select(
        timestamp_seconds(col("day") * 86400L).as("order_day"),
        (col("cents") / 100.0).as("revenue"),
        expr("((2 * wsum + wn) div (2 * wn)) / 100.0D").as("ma7_revenue"))
      .orderBy("order_day")
  }

  val movingAvgRevenueSql: String =
    """WITH daily AS (
      |  SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |      AS day,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1),
      |win AS (
      |  SELECT day, cents,
      |    sum(cents) OVER (ORDER BY day
      |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS wsum,
      |    count(*) OVER (ORDER BY day
      |      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS wn
      |  FROM daily)
      |SELECT CAST(to_timestamp(day * 86400) AS TIMESTAMP) AS order_day,
      |  cents / 100.0 AS revenue,
      |  ((2 * wsum + wn) // (2 * wn)) / 100.0 AS ma7_revenue
      |FROM win ORDER BY order_day""".stripMargin

  // ---------------------------------------- q52 month-over-month growth

  /** q52: month-over-month revenue growth in exact ppm — the standard
    * period-comparison report. Growth can be NEGATIVE; both Spark's
    * `div` and DuckDB's `//` truncate toward zero (measured:
    * -7 // 2 = -3 in DuckDB), so the plain integer quotient is
    * cross-engine exact with no adjustment. The monthly frame is
    * calendar-bounded, so the single unpartitioned lag window is a
    * non-issue at any corpus scale (the corpus itself sees one
    * map-side-combining groupBy). */
  def momGrowth(s: SparkSession, d: String): DataFrame = {
    val monthly = orders(s, d)
      .withColumn("month",
        date_trunc("month", col("o_orderdate")).cast("timestamp"))
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .groupBy("month").agg(sum("cents").as("cents"))
    val w = Window.orderBy("month")
    monthly
      .withColumn("prev", lag("cents", 1).over(w))
      .select(
        col("month").as("order_month"),
        (col("cents") / 100.0).as("revenue"),
        expr("((cents - prev) * 1000000) div prev").as("growth_ppm"))
      .orderBy("order_month")
  }

  val momGrowthSql: String =
    """WITH monthly AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1),
      |lagged AS (
      |  SELECT month, cents,
      |    lag(cents) OVER (ORDER BY month) AS prev
      |  FROM monthly)
      |SELECT month AS order_month, cents / 100.0 AS revenue,
      |  CAST((cents - prev) * 1000000 // prev AS BIGINT) AS growth_ppm
      |FROM lagged ORDER BY order_month""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q07_nation_trade"   -> nationTrade _,
    "q11_important_parts" -> importantParts _,
    "q14_promo_revenue"  -> promoRevenue _,
    "q15_top_supplier_rev" -> topSupplierByRevenue _,
    "q16_supplier_parts" -> supplierCountByPart _,
    "q49_cust_quartiles" -> customerQuartiles _,
    "q50_brand_leaders"  -> brandLeaders _,
    "q51_moving_avg"     -> movingAvgRevenue _,
    "q52_mom_growth"     -> momGrowth _,
  )

  val oracleSql: Map[String, String] = Map(
    "q07_nation_trade"   -> nationTradeSql,
    "q11_important_parts" -> importantPartsSql,
    "q14_promo_revenue"  -> promoRevenueSql,
    "q15_top_supplier_rev" -> topSupplierByRevenueSql,
    "q16_supplier_parts" -> supplierCountByPartSql,
    "q49_cust_quartiles" -> customerQuartilesSql,
    "q50_brand_leaders"  -> brandLeadersSql,
    "q51_moving_avg"     -> movingAvgRevenueSql,
    "q52_mom_growth"     -> momGrowthSql,
  )
}
