package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Round-16 operators: the mergeable-sketch tier (k80–k84). The oracle
  * gate hash-checks the sketch CONTENTS; these tests pin the algebraic
  * contracts the hash can't express — mergeability (the property that
  * makes a sketch a 100 TB operator: per-batch states combine into the
  * full-corpus state without a rescan), the count-min upper bound, the
  * histogram's bucket-width error bound, and the Bloom filter's
  * no-false-negative arithmetic. */
class Round16Spec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("k80: count-min estimate is an upper bound that is tight without collisions") {
    val rows = Sketches.countMinHeavy(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (t, e) = (r.getAs[Long]("true_cnt"), r.getAs[Long]("cm_est"))
      assert(e >= t, s"CM must never underestimate: ${r}")
    }
    // the probe set is the exact top-10: counts are non-increasing
    val cnts = rows.map(_.getAs[Long]("true_cnt")).toSeq
    assert(cnts == cnts.sorted.reverse)
  }

  test("k80: CM tables merge by cell-wise sum (per-batch == full-corpus)") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(graft.ext.TextOps.tokens(col("text"))).as("tok"))
    val full = Sketches.cmCellsOf(toks.select("tok"))
    val merged = Sketches.cmCellsOf(toks.filter(col("doc_id") % 2 === 0).select("tok"))
      .unionAll(Sketches.cmCellsOf(toks.filter(col("doc_id") % 2 === 1).select("tok")))
      .groupBy("j", "c").agg(sum("v").as("v"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(key(full) == key(merged))
  }

  test("k81: histogram estimate is the bucket lower edge — within one bucket width below exact") {
    val rows = Sketches.histQuantiles(spark, sf).collect()
    assert(rows.length == 9) // 3 statuses x 3 quantiles
    rows.foreach { r =>
      val (est, ex) =
        (r.getAs[Long]("hist_est_cents"), r.getAs[Long]("exact_cents"))
      assert(est <= ex && ex - est < (1L << 20),
        s"estimate must bracket the exact rank value from below: ${r}")
    }
  }

  test("k82: Bloom semi-join has no false negatives; false_pos is the exact overshoot") {
    val rows = Sketches.bloomSemijoin(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (f, c, t, fp) = (r.getAs[Long]("fact_rows"), r.getAs[Long]("cand_rows"),
        r.getAs[Long]("true_rows"), r.getAs[Long]("false_pos"))
      assert(t <= c, s"a true member was filtered out (false negative): ${r}")
      assert(fp == c - t && fp >= 0 && c <= f)
    }
    // the filter must actually prune (EUROPE is 1 of 5 regions)
    val tot = rows.map(_.getAs[Long]("fact_rows")).sum
    val cand = rows.map(_.getAs[Long]("cand_rows")).sum
    assert(cand < tot, "Bloom filter pruned nothing — probe is broken")
  }

  test("k84: HLL registers merge by register-wise max (per-batch == full-corpus)") {
    val h = Tables.orders(spark, sf).select(
      col("o_orderstatus").as("status"), col("o_custkey"),
      graft.ext.TextOps.md5Long(col("o_custkey").cast("string")).as("h"))
    val full = Sketches.hllRegsOf(h.select("status", "h"))
    val merged = Sketches.hllRegsOf(
        h.filter(col("o_custkey") % 2 === 0).select("status", "h"))
      .unionAll(Sketches.hllRegsOf(
        h.filter(col("o_custkey") % 2 === 1).select("status", "h")))
      .groupBy("status", "bucket").agg(max("mr").as("mr"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(key(full) == key(merged))
  }

  test("k83: absorbed census == from-scratch census; segments partition the corpus") {
    val served = Sketches.incrSketchCensus(spark, sf)
    // from-scratch single-pass census over the FULL corpus (what a
    // rescan would compute) — absorb-then-merge must equal it exactly
    val toks = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        explode(graft.ext.TextOps.tokens(col("text"))).as("tok"))
      .select(col("source"), col("doc_id"),
        graft.ext.TextOps.md5Long(col("tok")).as("h"))
    val scratch = toks.groupBy("source")
      .agg(countDistinct(col("h")).as("exact_vocab_chk"),
        count(lit(1)).as("token_cnt_chk"),
        countDistinct(col("doc_id")).as("doc_cnt_chk"))
    val j = served.join(scratch, Seq("source")).collect()
    assert(j.nonEmpty)
    j.foreach { r =>
      assert(r.getAs[Long]("exact_vocab") == r.getAs[Long]("exact_vocab_chk"))
      assert(r.getAs[Long]("token_cnt") == r.getAs[Long]("token_cnt_chk"))
      assert(r.getAs[Long]("doc_cnt") == r.getAs[Long]("doc_cnt_chk"))
      // KMV est from merged segment registers == est over full corpus
      // (merge algebra): with >= 8 distinct hashes the estimate is
      // determined by the global 8th-smallest, which must have
      // survived the segment bottom-8s
      assert(r.getAs[Long]("kmv_vocab_est") > 0)
    }
    // the base segment's stats were computed from base docs ONLY —
    // the absorb appended batch rows instead of rewriting base stats
    val dir = Sketches.censusDir(spark, sf)
    val segs = spark.read.parquet(s"$dir/census")
    val baseTok = segs.filter(col("segment") === "base")
      .agg(sum("token_cnt")).collect()(0).getLong(0)
    val expectBase = toks.filter(col("doc_id") % 5 =!= 4).count()
    assert(baseTok == expectBase,
      "base segment stats must cover exactly the base 4/5 of the corpus")
    val segNames = segs.select("segment").distinct().collect()
      .map(_.getString(0)).toSet
    assert(segNames == Set("base", "batch"))
  }

  test("em75: multi-parent hierarchy — positions exceed distinct messages only above the leaf level") {
    val rows = graft.query.EmailOps.hierarchyCensus(spark, sf).collect()
    val byKey = rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getAs[Long]("n_positions"), r.getAs[Long]("n_messages"))).toMap
    // leaf (user, folder) levels: one position per message there
    rows.filter(r => r.getString(0) != "(all)" && r.getString(1) != "(all)")
      .foreach { r =>
        assert(r.getAs[Long]("n_positions") == r.getAs[Long]("n_messages"),
          s"leaf level must be 1:1: ${r}")
      }
    // the grand total sees the multi-parent forest: every 4th message
    // hangs under TWO positions
    val (gp, gm) = byKey(("(all)", "(all)"))
    assert(gp > gm, "grand total must count positions > distinct messages")
    assert(gp == gm + byKey(("user9", "inbox"))._2,
      "the position excess is exactly the re-delivered copies")
  }

  test("v78: k-anonymity census invariants, and the risky branch genuinely fires both ways") {
    val rows = graft.ingest.Validation.kanonAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nd, nc, nrc, nrd, mn) = (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_classes"), r.getAs[Long]("n_risky_classes"),
        r.getAs[Long]("n_risky_docs"), r.getAs[Long]("min_class_size"))
      assert(nrc <= nc && nrd <= nd && mn >= 1)
      // a risky class holds < 5 docs by definition
      assert(nrd < 5 * nrc + 1)
      // min size below k implies at least one risky class, and vice versa
      assert((mn < 5) == (nrc > 0))
    }
    // discrimination: the fixture has risky classes AND safe classes
    assert(rows.exists(_.getAs[Long]("n_risky_classes") > 0))
    assert(rows.exists(r =>
      r.getAs[Long]("n_classes") > r.getAs[Long]("n_risky_classes")))
  }

  test("k84: zero_regs exposes the small-range regime honestly") {
    val rows = Sketches.hllCensus(spark, sf).collect()
    rows.foreach { r =>
      val z = r.getAs[Long]("zero_regs")
      assert(z >= 0 && z <= 64)
      assert(r.getAs[Long]("hll_est") > 0)
      assert(r.getAs[Long]("exact_custs") > 0)
    }
  }
}
