package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._
import graft.ext.SimilarityOps

/** Fourth relational tier: q2/q8/q9-family adaptations (correlated max
  * join-back, market share, per-nation yearly profit) and an ANN
  * quality-evaluation query (recall of the IVF tier against the
  * brute-force ground truth — both engine-computed, so the whole
  * evaluation is oracle-checked). */
object Classic2 {

  /** q2-style: per nation, the supplier(s) holding the maximum account
    * balance — correlated aggregate + join-back. */
  def topSupplierPerNation(s: SparkSession, d: String): DataFrame = {
    val su = supplier(s, d)
    val maxBal = su.groupBy(col("s_nationkey").as("mn_nationkey"))
      .agg(max("s_acctbal").as("max_bal"))
    val n = nation(s, d)
    su.join(broadcast(maxBal),
        su("s_nationkey") === maxBal("mn_nationkey") &&
        su("s_acctbal") === maxBal("max_bal"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .select(col("n_name"), col("s_name"),
        round(col("s_acctbal"), 2).as("s_acctbal"))
      .orderBy("n_name", "s_name")
  }

  val topSupplierPerNationSql: String =
    """SELECT n_name, s_name, round(s_acctbal, 2) AS s_acctbal
      |FROM supplier s JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_acctbal = (SELECT max(s_acctbal) FROM supplier
      |                   WHERE s_nationkey = s.s_nationkey)
      |ORDER BY n_name, s_name""".stripMargin

  /** q8-style: market share — the fraction of yearly ECONOMY-part
    * revenue attributable to suppliers of one nation. */
  def marketShare(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val o = orders(s, d)
    val p = part(s, d).filter(col("p_type") === "ECONOMY")
    val su = supplier(s, d)
    val base = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .select(year(col("o_orderdate")).cast("bigint").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"),
        col("s_nationkey"))
    base.groupBy("o_year")
      .agg(round(
        sum(when(col("s_nationkey") === 7, col("volume")).otherwise(0.0)) /
          sum(col("volume")), 4).as("mkt_share_nation7"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_year")
  }

  val marketShareSql: String =
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  round(sum(CASE WHEN s_nationkey = 7
      |                 THEN l_extendedprice * (1 - l_discount)
      |                 ELSE 0 END)
      |        / sum(l_extendedprice * (1 - l_discount)), 4)
      |    AS mkt_share_nation7,
      |  count(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE p_type = 'ECONOMY'
      |GROUP BY 1 ORDER BY o_year""".stripMargin

  /** q9-style: yearly revenue by supplier nation (profit adaptation:
    * the fixtures carry no supplycost, so the measure is discounted
    * revenue less tax). */
  def nationYearlyProfit(s: SparkSession, d: String): DataFrame = {
    val l = lineitem(s, d)
    val o = orders(s, d)
    val su = supplier(s, d)
    val n = nation(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
        (lit(1.0) - col("l_tax"))), 2).as("net_revenue"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val nationYearlyProfitSql: String =
    """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 - l_tax)), 2)
      |    AS net_revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** s63: ANN quality evaluation — recall@3 of the IVF tier against
    * the brute-force top-3 ground truth, per query vector. Both sides
    * are engine results of already-oracle-checked queries, so the
    * evaluation itself hash-checks too.
    *
    * Measured on the fixture corpus: mean recall@3 ≈ 0.1 — the `label`
    * partition is NOT cosine-coherent (max pairwise cosine 0.51, so
    * true neighbors scatter across clusters) and single-probe IVF
    * misses them. This is the evaluation loop that tells a deployment
    * to raise nprobe or re-cluster; the engine makes the measurement a
    * first-class, oracle-checked query rather than a guess. */
  def ivfRecall(s: SparkSession, d: String): DataFrame =
    recallAt3(s, d, SimilarityOps.ivfKnn(s, d))

  val ivfRecallSql: String = recallAt3Sql(SimilarityOps.ivfKnnSql)

  /** Shared recall@3 evaluation: per query, the fraction of the
    * brute-force top-3 ground truth that `approx` recovered. Both
    * sides are engine results of already-oracle-checked queries, so
    * the evaluation itself hash-checks too. */
  private def recallAt3(s: SparkSession, d: String, approx: DataFrame)
      : DataFrame =
    recallAt3From(
      SimilarityOps.knnBrute(s, d).filter(col("rank") <= 3)
        .select(col("q_id"), col("c_id")),
      approx)

  /** recall@3 of `approx` against an explicit (q_id, c_id) truth set —
    * the truth varies: full-corpus brute for the serving paths,
    * survivors-only brute for the post-delete eval (s98). */
  private def recallAt3From(truth: DataFrame, approx: DataFrame)
      : DataFrame =
    truth.join(approx.select(col("q_id"), col("c_id"))
        .withColumn("hit", lit(1L)), Seq("q_id", "c_id"), "left")
      .groupBy("q_id")
      .agg((sum(coalesce(col("hit"), lit(0L))) / count(lit(1)))
        .as("recall_at_3"))
      .orderBy("q_id")

  /** DuckDB twin of [[recallAt3]], composing the approximate query's
    * own oracle SQL against the brute-force oracle as CTEs. */
  private def recallAt3Sql(approxSql: String): String =
    recallAt3SqlFrom(SimilarityOps.knnBruteSql, approxSql)

  private def recallAt3SqlFrom(truthSql: String, approxSql: String)
      : String = {
    val truth = truthSql.replaceAll("ORDER BY q_id, rank$", "")
    val approx = approxSql.replaceAll("ORDER BY q_id, rank$", "")
    s"""WITH truth AS (SELECT q_id, c_id FROM ($truth) WHERE rank <= 3),
      |approx AS (SELECT q_id, c_id FROM ($approx)),
      |joined AS (
      |  SELECT t.q_id,
      |    CASE WHEN a.c_id IS NOT NULL THEN 1 ELSE 0 END AS hit
      |  FROM truth t LEFT JOIN approx a
      |    ON a.q_id = t.q_id AND a.c_id = t.c_id)
      |SELECT q_id, sum(hit) / count(*) AS recall_at_3
      |FROM joined GROUP BY q_id ORDER BY q_id""".stripMargin
  }

  /** s65: recall@3 of MULTI-PROBE IVF (nprobe=3) against the same
    * ground truth — the measured improvement over s63's single-probe
    * baseline. */
  def ivfMultiprobeRecall(s: SparkSession, d: String): DataFrame =
    recallAt3(s, d, SimilarityOps.ivfMultiprobeKnn(s, d))

  val ivfMultiprobeRecallSql: String =
    recallAt3Sql(SimilarityOps.ivfMultiprobeKnnSql)

  /** s68: recall@3 of the TRAINED k-means IVF (s67) against the brute
    * ground truth — closes the evaluation loop for the learned
    * quantizer the same way s63/s65 close it for label-IVF. */
  def kmeansRecall(s: SparkSession, d: String): DataFrame =
    recallAt3(s, d, SimilarityOps.kmeansIvfKnn(s, d))

  val kmeansRecallSql: String = recallAt3Sql(SimilarityOps.kmeansIvfKnnSql)

  /** s72: recall@3 of the banded-LSH rerank path (s71) against the
    * brute ground truth — closes the evaluation loop for the
    * signature-band index: together with s63/s65/s68 every ANN
    * candidate-generation strategy in the engine carries its own
    * oracle-checked quality measurement. */
  def lshRerankRecall(s: SparkSession, d: String): DataFrame =
    recallAt3(s, d, SimilarityOps.lshRerankKnn(s, d))

  val lshRerankRecallSql: String = recallAt3Sql(SimilarityOps.lshRerankKnnSql)

  /** s74: recall@3 of int8 scalar quantization (s73) against the brute
    * ground truth — quantifies what the 8×-smaller scan gives up, the
    * number a deployment weighs against the s70 PQ and raw tiers. */
  def sqRecall(s: SparkSession, d: String): DataFrame =
    recallAt3(s, d, SimilarityOps.sqKnn(s, d))

  val sqRecallSql: String = recallAt3Sql(SimilarityOps.sqKnnSql)

  /** s76: recall@3 of the composed IVF-PQ path (s75) against the brute
    * ground truth — the end-to-end quality number for the full
    * production index (coarse-cell misses + code-quantization error
    * together), completing the evaluation column of the ANN matrix:
    * every serving path in the engine carries its own oracle-checked
    * recall measurement. */
  def ivfPqRecall(s: SparkSession, d: String): DataFrame =
    recallAt3(s, d, SimilarityOps.ivfPqKnn(s, d))

  val ivfPqRecallSql: String = recallAt3Sql(SimilarityOps.ivfPqKnnSql)

  /** s98: recall@3 of the TOMBSTONED serving (s94) against the exact
    * top-3 over the SURVIVING corpus — the eval a deployment re-runs
    * after a lifecycle mutation. Deletes change the candidate set, so
    * quality must be re-measured against the truth that set implies:
    * scoring against the pre-delete truth would charge the index for
    * not returning vectors it was ordered to forget, and skipping the
    * eval would let a delete that corrupts cell membership ship
    * silently. The truth is s60's brute scan with the cohort filtered
    * INSIDE the candidate scan (the s82 pre-filter discipline), so
    * the eval itself still survives 100 TB. s96/s97's compacted
    * servings are spec-pinned identical to their tombstoned sources,
    * so this one eval covers the whole post-delete lifecycle. */
  def tombstonedRecall(s: SparkSession, d: String): DataFrame =
    recallAt3From(
      SimilarityOps.knnBruteWhere(s, d, "c_id % 13 <> 5")
        .filter(col("rank") <= 3).select(col("q_id"), col("c_id")),
      SimilarityOps.ivfPqTombstoned(s, d))

  val tombstonedRecallSql: String = recallAt3SqlFrom(
    SimilarityOps.knnBruteSqlWhere("c_id % 13 <> 5"),
    SimilarityOps.ivfPqTombstonedSql)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s68_kmeans_recall"    -> kmeansRecall _,
    "q02_top_supplier"     -> topSupplierPerNation _,
    "q08_market_share"     -> marketShare _,
    "q09_nation_profit"    -> nationYearlyProfit _,
    "s63_ivf_recall"       -> ivfRecall _,
    "s65_multiprobe_recall" -> ivfMultiprobeRecall _,
    "s72_lsh_recall"       -> lshRerankRecall _,
    "s74_sq_recall"        -> sqRecall _,
    "s76_ivfpq_recall"     -> ivfPqRecall _,
    "s98_tombstoned_recall" -> tombstonedRecall _,
  )

  val oracleSql: Map[String, String] = Map(
    "q02_top_supplier"     -> topSupplierPerNationSql,
    "q08_market_share"     -> marketShareSql,
    "q09_nation_profit"    -> nationYearlyProfitSql,
    "s63_ivf_recall"       -> ivfRecallSql,
    "s65_multiprobe_recall" -> ivfMultiprobeRecallSql,
    "s68_kmeans_recall"    -> kmeansRecallSql,
    "s72_lsh_recall"       -> lshRerankRecallSql,
    "s74_sq_recall"        -> sqRecallSql,
    "s76_ivfpq_recall"     -> ivfPqRecallSql,
    "s98_tombstoned_recall" -> tombstonedRecallSql,
  )
}
