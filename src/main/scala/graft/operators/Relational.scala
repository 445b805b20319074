package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables._

/** Relational operator surface: scans, filters, projections, hash/broadcast
  * joins, semi/anti joins, aggregations, windows, rollups, set ops, top-k.
  *
  * These re-express the reference's indexed query surface (SURVEY.md §2.5 —
  * point lookups, equality filters, date ranges) and the aggregation/merge
  * tier (§2.4) over the driver's TPC-H-ish fixtures, plus the join/window
  * operators any analytics engine over the same store needs.
  *
  * Scale notes (100 TB design intent):
  *  - Aggregations are plain `groupBy` → Spark plans partial (map-side)
  *    aggregation before the shuffle; no driver-side collection anywhere.
  *  - Dimension tables (region/nation/part/supplier/customer at this ratio)
  *    are broadcast explicitly where the join is star-shaped, so the big
  *    fact table (lineitem) never shuffles for those joins.
  *  - Double-typed aggregates are rounded in BOTH engines (here and the
  *    DuckDB oracle) because fp summation order is nondeterministic across
  *    partitions; rounding makes the comparison well-defined.
  */
object Relational {

  /** Q1-style pricing summary: full-scan aggregation with map-side combine. */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        // 4-decimal means via integer half-up rounding of the exact
        // rational: l_quantity is integer-valued, l_discount 2-decimal
        // (fixture-verified) — float round(avg) flips on .xxxx5 ties
        // across engines (the e81 lesson)
        expr("((2 * sum(CAST(round(l_quantity) AS BIGINT)) * 10000" +
          " + count(1)) div (2 * count(1))) / 10000.0D").as("avg_qty"),
        expr("((2 * sum(CAST(round(l_discount * 100) AS BIGINT)) * 100" +
          " + count(1)) div (2 * count(1))) / 10000.0D").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  ((2 * sum(CAST(round(l_quantity) AS BIGINT)) * 10000
      |    + count(*)) // (2 * count(*))) / 10000.0 AS avg_qty,
      |  ((2 * sum(CAST(round(l_discount * 100) AS BIGINT)) * 100
      |    + count(*)) // (2 * count(*))) / 10000.0 AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q3-style shipping priority: fact-fact join + broadcast dim, top-k. */
  def shippingPriority(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < lit("1998-01-01"))
    val l = lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** Q4-style: EXISTS (left-semi join) + count by priority. */
  def orderPriorityCount(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01") &&
              col("o_orderdate") < lit("1998-01-01"))
    val l = lineitem(s, d).filter(col("l_shipdate") >= lit("1998-06-01"))
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val orderPriorityCountSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate >= TIMESTAMP '1998-06-01 00:00:00')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q5-style: star join region→nation→(customer,supplier)→orders→lineitem.
    * All dims broadcast; lineitem⋈orders is the only shuffle join. */
  def regionRevenue(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val o = orders(s, d)
    val c = customer(s, d)
    val su = supplier(s, d)
    val n = nation(s, d)
    val r = region(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(su),
        l("l_suppkey") === su("s_suppkey") &&
        c("c_nationkey") === su("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("n_name"))
  }

  val regionRevenueSql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Q6-style: pushed-down range filter + single-row aggregate. */
  def revenueForecast(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
              col("l_shipdate") < lit("1998-01-01") &&
              col("l_discount").between(0.02, 0.06) &&
              col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  val revenueForecastSql: String =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.06
      |  AND l_quantity < 24""".stripMargin

  /** Q10-style: returned-item revenue per customer, top 20. */
  def returnedItemRevenue(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d).filter(col("l_returnflag") === "R")
    val o = orders(s, d)
    val c = customer(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_mktsegment")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val returnedItemRevenueSql: String =
    """SELECT c_custkey, c_name, c_mktsegment,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_mktsegment
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Broadcast join fact→dim + aggregation by part brand. */
  def brandQuantity(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val p = part(s, d)
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy("p_brand")
      .agg(
        round(sum("l_quantity"), 2).as("total_qty"),
        // exact 2-decimal mean over integer cents (see pricingSummary)
        expr("((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT))" +
          " + count(1)) div (2 * count(1))) / 100.0D").as("avg_price"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  val brandQuantitySql: String =
    """SELECT p_brand, round(sum(l_quantity), 2) AS total_qty,
      |  ((2 * sum(CAST(round(l_extendedprice * 100) AS BIGINT))
      |    + count(*)) // (2 * count(*))) / 100.0 AS avg_price,
      |  count(*) AS n_lines
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** Window: latest (highest-price, tie → lowest key) order per customer. */
  def topOrderPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey")
  }

  val topOrderPerCustomerSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** Window: running revenue per customer over order date. */
  def runningCustomerRevenue(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(s, d)
      .withColumn("running_total", round(sum("o_totalprice").over(w), 2))
      .select("o_custkey", "o_orderkey", "o_orderdate", "running_total")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  val runningCustomerRevenueSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
      |    AS running_total
      |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  /** Window: lag/lead — gap in days between consecutive orders per customer. */
  def orderGapDays(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .withColumn("prev_date", lag("o_orderdate", 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), col("prev_date")).cast("bigint"))
      .select("o_custkey", "o_orderkey", "gap_days")
      .orderBy("o_custkey", "o_orderkey")
  }

  val orderGapDaysSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(date_diff('day',
      |    lag(o_orderdate) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey),
      |    o_orderdate) AS BIGINT) AS gap_days
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Rollup over region→nation: multi-level aggregates with grouping id. */
  def revenueRollup(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).withColumnRenamed("c_custkey", "o_custkey")
    val n = nation(s, d).withColumnRenamed("n_nationkey", "c_nationkey")
    val r = region(s, d).withColumnRenamed("r_regionkey", "n_regionkey")
    val o = orders(s, d)
    o.join(broadcast(c), Seq("o_custkey"))
      .join(broadcast(n), Seq("c_nationkey"))
      .join(broadcast(r), Seq("n_regionkey"))
      // expr() not col(): Dataset.col attaches __dataset_id metadata that
      // trips DetectAmbiguousSelfJoin when rollup expands grouping sets
      // (Spark 4.1 local repro); unresolved exprs carry no metadata.
      .rollup(expr("r_name"), expr("n_name"))
      .agg(round(sum("o_totalprice"), 2).as("total_revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  val revenueRollupSql: String =
    """SELECT r_name, n_name, round(sum(o_totalprice), 2) AS total_revenue,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  /** Cube over (status, priority): all four grouping sets in one pass —
    * the grouping-sets companion to q24's hierarchical rollup (same
    * expr()-not-col() workaround for DetectAmbiguousSelfJoin). */
  def priorityCube(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(expr("o_orderstatus"), expr("o_orderpriority"))
      .agg(round(sum("o_totalprice"), 2).as("total_revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  val priorityCubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  round(sum(o_totalprice), 2) AS total_revenue,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST,
      |  o_orderpriority ASC NULLS FIRST""".stripMargin

  /** Anti join: customers with no open orders (NOT EXISTS). */
  def customersWithoutOrders(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val customersWithoutOrdersSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Semi join: customers having at least one urgent open order. */
  def customersWithUrgentOrders(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d).filter(col("o_orderpriority") === "1-URGENT" &&
                                col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val customersWithUrgentOrdersSql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |  AND o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** Distinct projection (dedup of a key set). */
  def distinctOpenCustomers(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderstatus") === "O")
      .select("o_custkey").distinct()
      .orderBy("o_custkey")

  val distinctOpenCustomersSql: String =
    """SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY o_custkey""".stripMargin

  /** Time-dimension aggregation: orders per month. */
  def monthlyOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("month")

  val monthlyOrdersSql: String =
    """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** Conditional aggregation (CASE pivot) by order status. */
  def priorityPivot(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy("o_orderstatus")
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L))
          .as("n_urgent"),
        sum(when(col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("n_high"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("n_other"))
      .orderBy("o_orderstatus")

  val priorityPivotSql: String =
    """SELECT o_orderstatus,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS n_other
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Set ops: UNION ∪ INTERSECT ∩ EXCEPT over customer key sets. */
  def setOpsCustomers(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    val auto = c.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select("c_custkey")
    building.union(rich).distinct()
      .intersect(rich.union(auto).distinct())
      .except(auto.intersect(building))
      .orderBy("c_custkey")
  }

  val setOpsCustomersSql: String =
    """SELECT c_custkey FROM (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |  UNION
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |) INTERSECT (
      |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |  UNION
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |) EXCEPT (
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |  INTERSECT
      |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |) ORDER BY c_custkey""".stripMargin

  /** Top-k with ordering on expression. */
  def topParts(s: SparkSession, d: String): DataFrame =
    part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
              round(col("p_retailprice") * (lit(1.0) + lit(0.08)), 2)
                .as("taxed_price"))
      .orderBy(col("taxed_price").desc, col("p_partkey"))
      .limit(15)

  val topPartsSql: String =
    """SELECT p_partkey, p_name, p_brand,
      |  round(p_retailprice * (1 + 0.08), 2) AS taxed_price
      |FROM part ORDER BY taxed_price DESC, p_partkey LIMIT 15""".stripMargin

  /** Scalar-function projection: string + date kitchen-sink over orders. */
  def scalarFunctions(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") < 100)
      .select(
        col("o_orderkey"),
        upper(col("o_orderpriority")).as("prio_upper"),
        lower(col("o_orderstatus")).as("status_lower"),
        substring(col("o_orderpriority"), 1, 1).as("prio_code"),
        length(col("o_orderpriority")).cast("bigint").as("prio_len"),
        concat_ws("|", col("o_orderstatus"), col("o_orderpriority"))
          .as("status_prio"),
        year(col("o_orderdate")).cast("bigint").as("order_year"),
        month(col("o_orderdate")).cast("bigint").as("order_month"),
        dayofmonth(col("o_orderdate")).cast("bigint").as("order_day"),
        round(abs(negate(col("o_totalprice"))), 2).as("abs_price"),
        when(col("o_totalprice") > 200000, "big").otherwise("small")
          .as("size_class"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status_or_open"))
      .orderBy("o_orderkey")

  val scalarFunctionsSql: String =
    """SELECT o_orderkey,
      |  upper(o_orderpriority) AS prio_upper,
      |  lower(o_orderstatus) AS status_lower,
      |  substring(o_orderpriority, 1, 1) AS prio_code,
      |  CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
      |  concat_ws('|', o_orderstatus, o_orderpriority) AS status_prio,
      |  CAST(year(o_orderdate) AS BIGINT) AS order_year,
      |  CAST(month(o_orderdate) AS BIGINT) AS order_month,
      |  CAST(day(o_orderdate) AS BIGINT) AS order_day,
      |  round(abs(-o_totalprice), 2) AS abs_price,
      |  CASE WHEN o_totalprice > 200000 THEN 'big' ELSE 'small' END AS size_class,
      |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open
      |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin

  /** Correlated-aggregate pattern: orders above their customer's
    * average. The `> avg·1.5` threshold is evaluated as exact BIGINT
    * cross-multiplication (cents·n·2 > Σcents·3): a raw fp average
    * differs between Spark's partition-order partial sums and DuckDB's
    * sequential sum by ulps, and an order on that boundary would flip
    * membership cross-engine. */
  def aboveAverageOrders(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
    val perCust = o.groupBy(col("o_custkey").as("ac_custkey"))
      .agg(sum("cents").as("sum_cents"), count(lit(1)).as("n_orders"))
    o.join(broadcast(perCust), o("o_custkey") === perCust("ac_custkey"))
      .filter(col("cents") * col("n_orders") * 2 > col("sum_cents") * 3)
      .select(col("o_orderkey"), col("o_custkey"),
              round(col("o_totalprice"), 2).as("o_totalprice"))
      .orderBy("o_orderkey")
  }

  val aboveAverageOrdersSql: String =
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      |FROM orders o JOIN (
      |  SELECT o_custkey AS ac_custkey,
      |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents,
      |    count(*) AS n_orders
      |  FROM orders GROUP BY o_custkey) a ON o.o_custkey = a.ac_custkey
      |WHERE CAST(round(o_totalprice * 100) AS BIGINT) * n_orders * 2
      |      > sum_cents * 3
      |ORDER BY o_orderkey""".stripMargin

  /** HAVING-style post-aggregation filter: high-volume part/supplier pairs. */
  def highVolumePairs(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_partkey", "l_suppkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"),
           count(lit(1)).as("n_lines"))
      .filter(col("n_lines") >= 3)
      .orderBy("l_partkey", "l_suppkey")

  val highVolumePairsSql: String =
    """SELECT l_partkey, l_suppkey, round(sum(l_quantity), 2) AS total_qty,
      |  count(*) AS n_lines
      |FROM lineitem GROUP BY l_partkey, l_suppkey
      |HAVING count(*) >= 3 ORDER BY l_partkey, l_suppkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"    -> pricingSummary _,
    "q03_shipping_priority"  -> shippingPriority _,
    "q04_order_priority"     -> orderPriorityCount _,
    "q05_region_revenue"     -> regionRevenue _,
    "q06_revenue_forecast"   -> revenueForecast _,
    "q10_returned_revenue"   -> returnedItemRevenue _,
    "q20_brand_quantity"     -> brandQuantity _,
    "q21_top_order_per_cust" -> topOrderPerCustomer _,
    "q22_running_revenue"    -> runningCustomerRevenue _,
    "q23_order_gap_days"     -> orderGapDays _,
    "q24_revenue_rollup"     -> revenueRollup _,
    "q48_priority_cube"      -> priorityCube _,
    "q25_cust_no_orders"     -> customersWithoutOrders _,
    "q26_cust_urgent"        -> customersWithUrgentOrders _,
    "q27_distinct_open"      -> distinctOpenCustomers _,
    "q28_monthly_orders"     -> monthlyOrders _,
    "q29_priority_pivot"     -> priorityPivot _,
    "q30_set_ops"            -> setOpsCustomers _,
    "q31_top_parts"          -> topParts _,
    "q32_scalar_funcs"       -> scalarFunctions _,
    "q33_above_avg_orders"   -> aboveAverageOrders _,
    "q34_high_volume_pairs"  -> highVolumePairs _,
  )

  val oracleSql: Map[String, String] = Map(
    "q01_pricing_summary"    -> pricingSummarySql,
    "q03_shipping_priority"  -> shippingPrioritySql,
    "q04_order_priority"     -> orderPriorityCountSql,
    "q05_region_revenue"     -> regionRevenueSql,
    "q06_revenue_forecast"   -> revenueForecastSql,
    "q10_returned_revenue"   -> returnedItemRevenueSql,
    "q20_brand_quantity"     -> brandQuantitySql,
    "q21_top_order_per_cust" -> topOrderPerCustomerSql,
    "q22_running_revenue"    -> runningCustomerRevenueSql,
    "q23_order_gap_days"     -> orderGapDaysSql,
    "q24_revenue_rollup"     -> revenueRollupSql,
    "q48_priority_cube"      -> priorityCubeSql,
    "q25_cust_no_orders"     -> customersWithoutOrdersSql,
    "q26_cust_urgent"        -> customersWithUrgentOrdersSql,
    "q27_distinct_open"      -> distinctOpenCustomersSql,
    "q28_monthly_orders"     -> monthlyOrdersSql,
    "q29_priority_pivot"     -> priorityPivotSql,
    "q30_set_ops"            -> setOpsCustomersSql,
    "q31_top_parts"          -> topPartsSql,
    "q32_scalar_funcs"       -> scalarFunctionsSql,
    "q33_above_avg_orders"   -> aboveAverageOrdersSql,
    "q34_high_volume_pairs"  -> highVolumePairsSql,
  )
}
