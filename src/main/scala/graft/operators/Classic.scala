package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables._

/** Third relational tier — the TPC-H query shapes not yet covered:
  * outer-join distributions, correlated scalar subqueries, HAVING+IN,
  * disjunctive pushdown, min_by/max_by, unpivot, and a custom typed
  * Aggregator. */
object Classic {

  /** q13-style: customer order-count distribution (left OUTER join →
    * customers with zero orders appear as count 0). */
  def custOrderDistribution(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val custOrderDistributionSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q17-style: revenue impact of small-quantity lines — correlated
    * scalar aggregate (per-part average) as a broadcast self-join. */
  def smallQuantityRevenue(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val avgQty = l.groupBy(col("l_partkey").as("ap_partkey"))
      .agg((avg("l_quantity") * 0.5).as("half_avg"))
    l.join(broadcast(avgQty), l("l_partkey") === avgQty("ap_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg(round(sum("l_extendedprice") / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val smallQuantityRevenueSql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
      |  count(*) AS n_lines
      |FROM lineitem l
      |WHERE l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
      |                    WHERE l_partkey = l.l_partkey)""".stripMargin

  /** q18-style: large orders — HAVING over a grouped subquery feeding
    * an IN (left-semi on the aggregated key set). */
  def largeOrders(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val big = l.groupBy("l_orderkey")
      .agg(sum("l_quantity").as("total_qty"))
      .filter(col("total_qty") > 150)
    val o = orders(s, d)
    val c = customer(s, d)
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"),
        round(col("total_qty"), 2).as("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  val largeOrdersSql: String =
    """SELECT c_name, o_orderkey, o_orderdate,
      |  round(o_totalprice, 2) AS o_totalprice,
      |  round(total_qty, 2) AS total_qty
      |FROM orders
      |JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem
      |      GROUP BY l_orderkey HAVING sum(l_quantity) > 150) big
      |  ON o_orderkey = big.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** q19-style: disjunctive predicate join (OR of conjunct groups — the
    * shape that stresses predicate pushdown and join planning). */
  def disjunctiveRevenue(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val p = part(s, d)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 35)) ||
        (col("p_type") === "ECONOMY" && col("l_quantity") >= 40))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_lines"))
  }

  val disjunctiveRevenueSql: String =
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 1 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity BETWEEN 10 AND 35)
      |   OR (p_type = 'ECONOMY' AND l_quantity >= 40)""".stripMargin

  /** q22-style: positive-balance customers with no open orders, grouped
    * by a name-derived code (NOT EXISTS + scalar avg subquery). */
  def globalSales(s: SparkSession, d: String): DataFrame = {
    // exact-integer avg threshold: c_acctbal > avg(...) rewritten as
    // cents·n > Σcents (2-decimal balances are exact in cents; BIGINT
    // products are exact in both engines) — a raw fp average differs
    // between Spark's partition-order partial sums and DuckDB's
    // sequential sum by ulps, and a customer on that boundary would
    // flip membership cross-engine (the Classic3 exact-threshold rule)
    val c = customer(s, d)
      .withColumn("cents", expr("CAST(round(c_acctbal * 100) AS BIGINT)"))
    val r = c.filter(col("c_acctbal") > 0)
      .agg(sum("cents").as("s"), count(lit(1)).as("n")).first()
    val (sumCents, n) = (r.getLong(0), r.getLong(1))
    val o = orders(s, d).filter(col("o_orderstatus") === "O")
    c.filter(col("cents") * n > sumCents)
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(substring(col("c_name"), 10, 1).as("code"))
      .agg(count(lit(1)).as("numcust"),
        round(sum("c_acctbal"), 2).as("totacctbal"))
      .orderBy("code")
  }

  val globalSalesSql: String =
    """SELECT substring(c_name, 10, 1) AS code, count(*) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer c
      |WHERE CAST(round(c_acctbal * 100) AS BIGINT)
      |      * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
      |    > (SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT))
      |       FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c.c_custkey
      |                    AND o_orderstatus = 'O')
      |GROUP BY 1 ORDER BY code""".stripMargin

  /** q44: min_by/max_by — per user, the event types at their extreme
    * values, plus first/last event in time. */
  def extremeEvents(s: SparkSession, d: String): DataFrame =
    events(s, d)
      // scalar ordering keys (DuckDB arg_max takes no struct keys):
      // value has 2 decimals -> cents*1e12+event_id is exact and
      // unique while event_id < 1e12 (~a trillion events; the prior
      // 1e7 margin was only fixture-deep — beyond it two distinct
      // (cents, event_id) pairs could collide and the cross-engine
      // arg-max tie-break would be nondeterministic). cents ≤ ~9.2e6
      // keeps the product inside BIGINT — and like the s78 label
      // encoding, the bound is ENFORCED: an out-of-range value or
      // event_id fails loudly instead of silently corrupting the
      // tie-break in both engines. ts is integer nanos (unique at
      // microsecond resolution)
      .withColumn("vkey", expr(
        "CASE WHEN abs(CAST(round(value * 100) AS BIGINT)) > 9200000" +
          "       OR event_id < 0 OR event_id >= 1000000000000" +
          " THEN raise_error(concat('q44: vkey encoding out of range:" +
          " value=', CAST(value AS STRING)," +
          " ' event_id=', CAST(event_id AS STRING)))" +
          " ELSE CAST(round(value * 100) AS BIGINT) * 1000000000000" +
          "      + event_id END"))
      .withColumn("tkey", expr("ts div 1000"))
      .groupBy("user_id")
      .agg(
        max_by(col("event_type"), col("vkey")).as("type_at_max_value"),
        min_by(col("event_type"), col("vkey")).as("type_at_min_value"),
        max_by(col("event_type"), col("tkey")).as("last_type"),
        min_by(col("event_type"), col("tkey")).as("first_type"),
        count(lit(1)).as("n"))
      .orderBy("user_id")

  val extremeEventsSql: String =
    """SELECT user_id,
      |  arg_max(event_type,
      |    CAST(round(value * 100) AS BIGINT) * 1000000000000 + event_id)
      |    AS type_at_max_value,
      |  arg_min(event_type,
      |    CAST(round(value * 100) AS BIGINT) * 1000000000000 + event_id)
      |    AS type_at_min_value,
      |  arg_max(event_type, epoch_us(ts)) AS last_type,
      |  arg_min(event_type, epoch_us(ts)) AS first_type,
      |  count(*) AS n
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q45: unpivot (wide metrics → long form). */
  def unpivotSegmentStats(s: SparkSession, d: String): DataFrame = {
    val wide = customer(s, d)
      .groupBy("c_mktsegment")
      // exact 2-decimal mean over integer cents, half-AWAY-FROM-ZERO to
      // match both engines' round() (acctbal group sums can be negative)
      .agg(expr(
        "CASE WHEN sum(CAST(round(c_acctbal * 100) AS BIGINT)) >= 0" +
          " THEN (2 * sum(CAST(round(c_acctbal * 100) AS BIGINT))" +
          "   + count(1)) div (2 * count(1))" +
          " ELSE -((-2 * sum(CAST(round(c_acctbal * 100) AS BIGINT))" +
          "   + count(1)) div (2 * count(1))) END / 100.0D").as("avg_bal"),
        round(max("c_acctbal"), 2).as("max_bal"),
        round(min("c_acctbal"), 2).as("min_bal"))
    wide.unpivot(Array(col("c_mktsegment")),
      Array(col("avg_bal"), col("max_bal"), col("min_bal")),
      "metric", "value")
      .orderBy("c_mktsegment", "metric")
  }

  val unpivotSegmentStatsSql: String =
    """SELECT c_mktsegment, metric, value FROM (
      |  UNPIVOT (
      |    SELECT c_mktsegment,
      |      CASE WHEN sum(CAST(round(c_acctbal * 100) AS BIGINT)) >= 0
      |        THEN (2 * sum(CAST(round(c_acctbal * 100) AS BIGINT))
      |          + count(*)) // (2 * count(*))
      |        ELSE -((-2 * sum(CAST(round(c_acctbal * 100) AS BIGINT))
      |          + count(*)) // (2 * count(*))) END / 100.0 AS avg_bal,
      |      round(max(c_acctbal), 2) AS max_bal,
      |      round(min(c_acctbal), 2) AS min_bal
      |    FROM customer GROUP BY c_mktsegment)
      |  ON avg_bal, max_bal, min_bal INTO NAME metric VALUE value)
      |ORDER BY c_mktsegment, metric""".stripMargin

  // -------------------------------------------- typed Aggregator

  /** Custom typed Aggregator: sum of squared deviations from zero
    * rendered as (sum, sumsq, n) — the Dataset-typed aggregation tier
    * (Encoders are Catalyst-native; the merge is algebraic so partial
    * aggregation still applies). */
  case class Moments(n: Long, sum: Double, sumsq: Double)

  object MomentsAgg
      extends Aggregator[(String, Double), Moments, (Double, Double, Long)] {
    def zero: Moments = Moments(0L, 0.0, 0.0)
    def reduce(b: Moments, x: (String, Double)): Moments =
      Moments(b.n + 1, b.sum + x._2, b.sumsq + x._2 * x._2)
    def merge(a: Moments, b: Moments): Moments =
      Moments(a.n + b.n, a.sum + b.sum, a.sumsq + b.sumsq)
    def finish(r: Moments): (Double, Double, Long) = (r.sum, r.sumsq, r.n)
    def bufferEncoder = Encoders.product[Moments]
    def outputEncoder = Encoders.tuple(Encoders.scalaDouble,
      Encoders.scalaDouble, Encoders.scalaLong)
  }

  /** q46: typed-Dataset aggregation via a custom Aggregator — sum/sumsq
    * per return flag (rounded for fp-order independence). */
  def typedMoments(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .agg(MomentsAgg.toColumn.name("m"))
      .toDF("l_returnflag", "m")
      .select(col("l_returnflag"),
        round(col("m._1"), 2).as("sum_qty"),
        round(col("m._2"), 2).as("sumsq_qty"),
        col("m._3").as("n"))
      .orderBy("l_returnflag")
  }

  val typedMomentsSql: String =
    """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_quantity * l_quantity), 2) AS sumsq_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q13_cust_distribution" -> custOrderDistribution _,
    "q17_small_qty_revenue" -> smallQuantityRevenue _,
    "q18_large_orders"      -> largeOrders _,
    "q19_disjunctive"       -> disjunctiveRevenue _,
    "q22_global_sales"      -> globalSales _,
    "q44_extreme_events"    -> extremeEvents _,
    "q45_unpivot"           -> unpivotSegmentStats _,
    "q46_typed_moments"     -> typedMoments _,
  )

  val oracleSql: Map[String, String] = Map(
    "q13_cust_distribution" -> custOrderDistributionSql,
    "q17_small_qty_revenue" -> smallQuantityRevenueSql,
    "q18_large_orders"      -> largeOrdersSql,
    "q19_disjunctive"       -> disjunctiveRevenueSql,
    "q22_global_sales"      -> globalSalesSql,
    "q44_extreme_events"    -> extremeEventsSql,
    "q45_unpivot"           -> unpivotSegmentStatsSql,
    "q46_typed_moments"     -> typedMomentsSql,
  )
}
