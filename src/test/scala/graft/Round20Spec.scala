package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{DedupOps, TextOps}
import graft.query.EmailOps

/** Round-20: the round-14 additions — t76 DSIR importance RESAMPLE
  * (md5-coin acceptance + k85-sketch budget cutoff), d74 the windex
  * full LSM fold, em77 the release linkability census, t77 the τ
  * calibration, and the t74 row-local restatement. Pins the properties
  * the shared oracles cannot see: budget adherence within the sketch's
  * strict rank bound, cutoff monotonicity, fold artifact hygiene
  * (tombstones retired, census frozen), Spark-side graph-preservation
  * equality, and the absence of the doc-sized sort-merge join the
  * restatement removed. */
class Round20Spec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------ t76 resample manifest contracts

  test("t76: coin acceptance is the rule, the max-weight doc is certain, and both modes are deterministic") {
    val out = TextOps.dsirResample(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("sampled") ===
        (r.getAs[Long]("coin") < r.getAs[Long]("accept_ppm")),
        s"acceptance must be exactly the coin rule: $r")
      val p = r.getAs[Long]("accept_ppm")
      assert(p >= 0L && p <= 1000000L, s"normalized ppm out of range: $r")
    }
    val wmax = out.map(_.getAs[Long]("w_micro")).max
    out.filter(_.getAs[Long]("w_micro") == wmax).foreach { r =>
      assert(r.getAs[Long]("accept_ppm") === 1000000L &&
        r.getAs[Boolean]("sampled"),
        "the max-weight doc has p = 1 and is always accepted")
    }
    val again = TextOps.dsirResample(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "the manifest is a pure function of the corpus (no RNG state)")
  }

  test("t76: budget adherence — kept ≤ n div 4, under by less than the sketch's strict bound, and the kept set is a weight suffix") {
    val out = TextOps.dsirResample(spark, sf).collect()
    val n = out.length.toLong
    val budget = n / TextOps.dsirBudgetDen
    val kept = out.filter(_.getAs[Boolean]("budget_kept"))
    assert(kept.length <= budget, "the cutoff can never exceed budget")
    // strict bound: Σ over segments of step = ceil(nseg/64) (k85's
    // proven err < Σ steps, so the under-fill is < the same sum)
    val bound = out.groupBy(_.getAs[Long]("doc_id") % TextOps.dsirSketchSegs)
      .map { case (_, docs) => (docs.length + 63) / 64 }.sum
    assert(budget - kept.length < bound,
      s"under-budget by ${budget - kept.length}, sketch bound $bound")
    // monotone: every kept (w, id) strictly dominates every dropped one
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("w_micro"), r.getAs[Long]("doc_id"))
    val dropped = out.filter(!_.getAs[Boolean]("budget_kept"))
    if (kept.nonEmpty && dropped.nonEmpty) {
      val minKept = kept.map(key).min
      val maxDropped = dropped.map(key).max
      assert(Ordering[(Long, Long)].gt(minKept, maxDropped),
        "budget_kept must be exactly the top segment of the weight order")
    }
  }

  test("t76: a corpus smaller than the budget denominator yields a full manifest with budget_kept all false") {
    import spark.implicits._
    // n = 2 < dsirBudgetDen: budget = 0, no item reaches the target
    // rank — the cut must degrade to the MaxValue sentinel, never to
    // an empty frame that would annihilate the manifest (or crash
    // e129's scalar collect)
    val w = Seq((1L, "en", 100L), (2L, "de", -50L))
      .toDF("doc_id", "lang", "w_micro")
    val cut = TextOps.dsirCutFrame(w).collect()
    assert(cut.length === 1, "the cut frame is always exactly one row")
    assert(cut(0).getAs[Long]("cut_w") === Long.MaxValue)
    val wmax = w.agg(max("w_micro").as("__wmax"))
    val out = TextOps.dsirManifestStage(
      w.crossJoin(broadcast(wmax)).crossJoin(broadcast(TextOps.dsirCutFrame(w))),
      col("__wmax"), col("cut_w"), col("cut_uid")).collect()
    assert(out.length === 2, "sampled verdicts survive a zero budget")
    assert(out.forall(!_.getAs[Boolean]("budget_kept")))
    assert(out.exists(_.getAs[Boolean]("sampled")),
      "the max-weight doc still samples with p = 1")
  }

  // --------------------------------------- d74 fold artifact hygiene

  test("d74: the folded artifact retires tombstones and freezes the census (no decrement on delete)") {
    val fold = DedupOps.foldedWindexDir(spark, sf)
    val folded = spark.read.parquet(s"$fold/windex")
    assert(folded.filter(col("base_id") % 10 === 3).count() === 0L,
      "tombstoned base docs must not survive the fold")
    assert(folded.filter(col("base_id") % 10 === 4).count() > 0L,
      "the delta segment's docs must survive the fold (union, not base-only)")
    // frozen-cap: the folded census is the SUM of base + delta, never
    // decremented by the tombstone cohort
    val base = DedupOps.windowIndexDir(spark, sf)
    val delta = DedupOps.windexDeltaDir(spark, sf)
    val expect = spark.read.parquet(s"$base/census")
      .unionByName(spark.read.parquet(s"$delta/census"))
      .groupBy("hw").agg(sum("nd").as("nd"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = spark.read.parquet(s"$fold/census")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect,
      "folded census = base + delta summed (the d71 frozen-cap contract)")
  }

  test("d74: the folded serve is d70's plain one-scan probe — no census merge, no anti-join at serve time") {
    val plan = DedupOps.queries("d74_windex_folded")(spark, sf)
      .queryExecution.executedPlan.toString
    // the serve plan reads the folded windex only: the census parquet
    // and the tombstone sidecar appear at FOLD time, never at serve
    assert(!plan.contains("census"), s"census merge leaked into the serve")
    assert(!plan.contains("tombstones"), "tombstone anti-join at serve")
  }

  // ------------------------------ em77 graph preservation (Spark-side)

  test("em77: the census from RELEASED rows equals em64's census mapped through the pseudonym") {
    val released = EmailOps.queries("em77_pseudo_link_census")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    def pseudo(c: org.apache.spark.sql.Column) =
      concat(lit("p"), substring(md5(concat(lit("pii:"), c)), 1, 8))
    val mapped = graft.query.EmailQueries.communicationEdges(
        graft.query.FixtureCorpus.store(spark, sf))
      .select(pseudo(col("src")).as("src"), pseudo(col("dst")).as("dst"),
        col("n_messages"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(released === mapped,
      "the release preserves every edge and multiplicity under pseudonyms")
  }

  // --------------------------------------------- t77 calibration sanity

  test("t77: the derived τ keeps ≥95% of the reference slice and the order statistics are ordered") {
    val rows = TextOps.pplTauCalibration(spark, sf).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val en = rows("en")
    val n = en.getAs[Long]("n_docs")
    val keep = en.getAs[Long]("n_keep_at_derived")
    assert(keep * 100 >= n * 95,
      "τ = en p95 keeps at least 95% of the reference slice by definition")
    assert(keep < n, "the fixture's en tail must have spread above p95")
    rows.values.foreach { r =>
      assert(r.getAs[Long]("p50_micro") <= r.getAs[Long]("p95_micro"),
        s"order statistics must be ordered: $r")
      assert(r.getAs[Long]("tau_derived") === en.getAs[Long]("p95_micro"),
        "every row carries the same derived τ (the en p95)")
    }
  }

  test("t78: the calibrated filter's verdicts are exactly t75's semantics under t77's derived τ") {
    val tau = TextOps.pplTauCalibration(spark, sf).collect()
      .head.getAs[Long]("tau_derived")
    val out = TextOps.pplFilterCalibrated(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("tau_derived") === tau,
        "the in-query derivation must equal t77's eval row")
      val avgIdx = r.fieldIndex("avg_nlp_micro")
      val expect = !r.isNullAt(avgIdx) && r.getLong(avgIdx) <= tau
      assert(r.getAs[Boolean]("keep") === expect,
        s"keep must be the t75 rule against the derived τ: $r")
    }
    val enRows = out.filter(r => r.getAs[String]("lang") == "en" &&
      !r.isNullAt(r.fieldIndex("avg_nlp_micro")))
    val enKeep = enRows.count(_.getAs[Boolean]("keep"))
    assert(enKeep * 100 >= enRows.length * 95,
      "p95 calibration keeps ≥95% of the reference slice by construction")
  }

  // ------------------- DsirScore64: the codegen'd scorer's hash contract

  test("DsirScore64: the 60-bit md5 truncation matches Spark's own md5/conv on a known bigram") {
    import spark.implicits._
    val expected = spark.range(1)
      .select(conv(substring(md5(lit("dsir:hello world")), 1, 15), 16, 10)
        .cast("long")).head().getLong(0)
    // model[b] = b, so a single-bigram doc's w_micro IS its bucket
    val model = Array.tabulate(256)(_.toLong)
    val out = Seq("hello  World").toDF("text") // tokens() lowercases+splits
      .select(graft.functions.DsirScore64
        .dsir_score64(TextOps.tokens(col("text")), model).as("s"))
      .head().getSeq[Long](0)
    assert(out(0) === 1L, "one bigram")
    assert(out(1) === expected % 256,
      "the byte-level truncation must equal conv(substr(md5, 1, 15))")
  }

  test("DsirScore64: the fold equals the exploded md5Long formula across the fixture corpus") {
    val model = TextOps.dsirModel(spark, sf)
    val lrLit = typedLit(model.toSeq)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val viaExpr = TextOps.dsirWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // the round-13 exploded spelling, reconstructed: bigram explode →
    // md5Long % m → model lookup → per-doc sum
    val t = TextOps.tokens(col("text"))
    val exploded = docs
      .select(col("doc_id"), t.as("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(__toks) - 1),
          |  i -> struct(element_at(__toks, i) AS w1,
          |              element_at(__toks, i + 1) AS w2))""".stripMargin))
        .as("b"))
      .select(col("doc_id"),
        (conv(substring(md5(concat(lit("dsir:"), col("b.w1"), lit(" "),
          col("b.w2"))), 1, 15), 16, 10).cast("long") % 256).as("bucket"))
      .select(col("doc_id"),
        element_at(lrLit, (col("bucket") + 1).cast("int")).as("lrm"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("lrm").as("w"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    exploded.foreach { case (id, nw) =>
      assert(viaExpr(id) === nw, s"doc $id diverges from the formula")
    }
    viaExpr.filterNot(kv => exploded.contains(kv._1)).foreach { case (id, nw) =>
      assert(nw === ((0L, 0L)), s"short doc $id must score (0, 0)")
    }
  }

  // --------------------- t74 restatement: the SMJ is gone from the plan

  test("t74: the restated scoring pass carries no doc-sized sort-merge join") {
    val plan = TextOps.dsirWeights(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "the weights↔documents SMJ was the round-13 1.04-exponent source")
  }
}
