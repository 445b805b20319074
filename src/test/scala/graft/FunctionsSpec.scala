package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftExtensions, RollingHash64}
import graft.functions.RollingHash64.rolling_hash64

/** Native Expression + SparkSessionExtensions tier. */
class FunctionsSpec extends AnyFunSuite with SparkSpec {

  test("rolling_hash64 matches the reference on both eval paths") {
    import spark.implicits._
    val inputs = Seq("", "a", "abc", "the quick brown fox", "café ñ",
      "x" * 5000)
    val df = inputs.toDF("s")
    // codegen path (projection over a DataFrame)
    val got = df.select(rolling_hash64(col("s"))).collect().map(_.getLong(0))
    val want = inputs.map(s => RollingHash64.reference(s.getBytes("UTF-8")))
    assert(got.toSeq == want)
    // interpreted path (literal fold happens driver-side via eval)
    val lit1 = spark.range(1)
      .select(rolling_hash64(lit("abc"))).collect().head.getLong(0)
    assert(lit1 == RollingHash64.reference("abc".getBytes("UTF-8")))
    // null-safety
    val n = df.select(rolling_hash64(lit(null).cast("string"))).collect()
    assert(n.forall(_.isNullAt(0)))
  }

  test("extensions register the SQL function and the optimizer rule") {
    // force the shared SparkSpec session to materialize FIRST, then
    // build a sibling session (same SparkContext) with extensions:
    // getOrCreate only applies withExtensions when no default session
    // is active, so clear and restore around it
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      // SQL-registered native function
      val viaSql = s2.sql("SELECT rolling_hash64('abc') AS h")
        .collect().head.getLong(0)
      assert(viaSql == RollingHash64.reference("abc".getBytes("UTF-8")))
      // optimizer rule: nested array_distinct over NON-foldable input
      // (constant folding would otherwise hide the rewrite)
      s2.range(3).createOrReplaceTempView("ext_r")
      val plan = s2.sql(
        """SELECT array_distinct(array_distinct(array(id, id))) AS a
          |FROM ext_r""".stripMargin)
        .queryExecution.optimizedPlan
      val n = "array_distinct".r.findAllIn(plan.toString).length
      assert(n == 1, s"rule did not collapse nested array_distinct: $plan")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
