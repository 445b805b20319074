package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operators: partitioned-store small-files compaction
  * (em73) and semantic-cluster representative selection (d62). The
  * oracle gate proves em73's census through a compacted store still
  * matches the synthesis rules and d62's manifest matches the
  * recursive-CTE oracle; these tests pin the mechanics the hash
  * can't express — the per-month file-count contract, idempotence
  * (a compacted store is a no-op for a second pass, byte-identical
  * on disk), multi-group packing when a month's bytes exceed one
  * target file, and d62's membership invariant (the representative
  * is always a member of its own g103 cluster). */
class Round14Spec extends AnyFunSuite with SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Fresh month-partitioned store over the fixture corpus, months
    * spread like em70/em73 so every month partition materializes,
    * then explicitly fragmented (upserts cluster their writes by
    * month since round 16, so the many-small-batches state compaction
    * exists for is planted via the store's rehearsal fragmenter). */
  private def freshStore(): (graft.store.PartitionedEmailStore, String) = {
    val docs = graft.query.FixtureCorpus.parsedDocs(spark, d)
      .withColumn("date",
        expr("timestampadd(MONTH, CAST(doc_id % 12 AS INT), date)"))
      .drop("doc_id")
    val root = java.nio.file.Files
      .createTempDirectory("graft-em73-spec").toString
    val store = new graft.store.PartitionedEmailStore(spark, root + "/store")
    store.upsert(docs)
    store.fragment(8)
    (store, root)
  }

  private def rows(store: graft.store.PartitionedEmailStore) =
    store.read()
      .select(col("dedupe_key"), col("subject"), col("date_month"),
        size(col("mailboxes")).as("n_mailboxes"))
      .collect().map(_.toSeq).toSet

  private def diskState(root: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(root))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath.stripPrefix(root) -> f.length()).toMap
  }

  test("compact packs fragmented months and a second pass is a no-op") {
    val (store, root) = freshStore()
    try {
      val before = store.fileCensus()
      val content = rows(store)
      val plan = store.compact()
      assert(plan.nonEmpty, s"nothing compactable in $before")
      val after = store.fileCensus()
      plan.foreach { p =>
        assert(after(p.month) <= p.want)
        assert(after(p.month) < p.filesBefore)
        assert(before(p.month) == p.filesBefore)
      }
      // months not in the plan were never rewritten
      (before.keySet -- plan.map(_.month).toSet).foreach { m =>
        assert(after(m) == before(m))
      }
      assert(rows(store) == content, "compaction changed store content")
      // idempotence: everything already at its budget → empty plan,
      // and the second pass leaves the tree byte-identical
      val disk = diskState(root)
      assert(store.compact().isEmpty)
      assert(diskState(root) == disk)
    } finally Fs.deleteTree(root)
  }

  test("d62 representative belongs to its cluster; counts match g103") {
    val byComp = graft.graph.GraphOps.semanticComponents(spark, d)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("component")))
      .groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    val reps = graft.ext.DedupOps.semanticRepresentatives(spark, d).collect()
    assert(reps.nonEmpty && reps.size == byComp.size)
    reps.foreach { r =>
      val members = byComp(r.getAs[Long]("component"))
      assert(members.contains(r.getAs[Long]("rep_vec_id")))
      assert(members.size.toLong == r.getAs[Long]("n_members"))
    }
  }

  test("m78 finds a planted near-dup, rejects far pairs, caps hot bands") {
    import spark.implicits._
    import graft.ext.Multimodal.MediaRow
    def payload(seed: Int, flipFrames: Set[Int]): Array[Byte] = {
      val header = Array[Byte]('G', 'F', 'T', '1', 0, 64, 0, 64, 2, 0, 0, 0)
      // constant bytes within a frame, distinct across (seed, frame):
      // frame energy = 64 * base, so the quantized signature is exactly
      // the base sequence; a flipped frame shifts energy by +128 = two
      // quantization steps (always visible), and different seeds share
      // no frame value (7 and 5 are units mod 64, seeds chosen apart)
      val body = Array.tabulate(8 * 64) { i =>
        val f = i / 64
        val base = ((seed * 7 + 5 * f) % 64 + 32).toByte
        if (flipFrames.contains(f)) (base + 2).toByte else base
      }
      header ++ body
    }
    val rows = Seq(
      // near-dup: 2 of 8 frames perturbed -> bands still collide
      // (frames 0-3 untouched), 6 of 8 quantized frames agree
      MediaRow(1L, "audio", payload(5, Set.empty)),
      MediaRow(2L, "audio", payload(5, Set(6, 7))),
      // far pair: same band 0 but 3 perturbed frames -> 5/8, rejected
      MediaRow(3L, "audio", payload(9, Set.empty)),
      MediaRow(4L, "audio", payload(9, Set(5, 6, 7))),
      // same content as media 1 but a DIFFERENT kind: never paired
      MediaRow(5L, "video", payload(5, Set.empty)))
    val out = graft.ext.Multimodal.mediaNearDupOf(rows.toDS())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(("audio", 1L, 2L, 6L)))

    // hot-band cap: 40 identical payloads share every band; the band
    // census drops the band before any pair forms
    val hot = (10L until 50L).map(i => MediaRow(i, "image", payload(1, Set.empty)))
    assert(graft.ext.Multimodal.mediaNearDupOf(hot.toDS()).count() == 0L)
  }

  test("e114 links transitions across micro-batches via last-event state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingOps.TransEvent
    val input = MemoryStream[TransEvent]
    val out = graft.streaming.StreamingOps.transitionStream(input.toDS())
    val q = out.toDF().writeStream.outputMode("append")
      .format("memory").queryName("e114_out").start()
    try {
      val M = 60L * 1000000L // one minute in µs
      // batch 1: user 1 view→click (in-session); user 2 one event
      input.addData(
        TransEvent(1L, 0 * M, 10L, "view"),
        TransEvent(1L, 5 * M, 11L, "click"),
        TransEvent(2L, 0 * M, 20L, "view"))
      q.processAllAvailable()
      // batch 2: user 1's purchase 10 min after batch 1's click (the
      // CROSS-BATCH transition only the persisted state can see);
      // user 2's next event 31 min later — past the session gap, no
      // transition
      input.addData(
        TransEvent(1L, 15 * M, 12L, "purchase"),
        TransEvent(2L, 31 * M, 21L, "click"))
      q.processAllAvailable()
      val got = spark.table("e114_out")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
      assert(got == Seq(("click", "purchase"), ("view", "click")))
      // batch 3: an out-of-order arrival (predates user 1's stored
      // last) must be DROPPED, not linked backwards; a null-typed
      // event is a legal transition TARGET (the batch twin filters
      // only null prev_type) but as the new last it links NOTHING
      // forward
      input.addData(
        TransEvent(1L, 10 * M, 13L, "late"),
        TransEvent(2L, 33 * M, 22L, null),
        TransEvent(2L, 35 * M, 23L, "view"))
      q.processAllAvailable()
      val got2 = spark.table("e114_out")
        .collect().map(r => (Option(r.getString(0)), Option(r.getString(1))))
        .toSeq.sortBy(p => (p._1.getOrElse(""), p._2.getOrElse("")))
      assert(got2 == Seq(
        (Some("click"), None), // user 2: click(31) -> null(33)
        (Some("click"), Some("purchase")),
        (Some("view"), Some("click"))), s"got $got2")
    } finally q.stop()
  }

  test("t70 quarantines a planted contaminated doc; other splits stable") {
    import spark.implicits._
    // doc 0 is benchmark (0 % 97 == 0); the dirty variant of doc 5
    // embeds one of its exact 10-token passages ALIGNED at a passage
    // boundary (10 filler tokens first); docs 7/8 are clean
    val benchText = (1 to 20).map(i => s"b$i").mkString(" ")
    val excerpt = (1 to 10).map(i => s"b$i").mkString(" ")
    val filler = (1 to 10).map(i => s"x$i").mkString(" ")
    def corpus(doc5: String) = Seq(
      (0L, benchText, 10L),
      (5L, doc5, 20L),
      (7L, "clean seven words here nothing shared at all", 30L),
      (8L, "another clean document with its own words", 40L))
      .toDF("doc_id", "text", "n_chars")
    def census(doc5: String): Map[String, (Long, Long)] =
      graft.ext.TextOps.contamSafeSplitOf(corpus(doc5))
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("min_doc_id"))).toMap
    val clean = census(filler + " " + filler)
    val dirty = census(filler + " " + excerpt)
    assert(!clean.contains("quarantined"))
    assert(dirty("quarantined") == (1L, 5L))
    assert(dirty("benchmark") == clean("benchmark"))
    // doc 5 left its home split; every other doc's assignment is
    // untouched (the same salted hash key as t48 — the leakage
    // invariant: quarantine moves docs out, never between splits)
    val moved = clean.collect { case (k, (n, _))
      if dirty.getOrElse(k, (0L, 0L))._1 != n => k }
    assert(moved.size == 1 &&
      clean(moved.head)._1 - dirty.getOrElse(moved.head, (0L, 0L))._1 == 1)
  }

  test("e115 census keeps zero-token docs and matches the batch twin") {
    import spark.implicits._
    // doc 0 is benchmark; doc 5 embeds a boundary-aligned benchmark
    // passage (quarantine); doc 7 is whitespace-only — ZERO tokens, the
    // path the fixture corpus never exercises: the batch twin keeps it
    // (left join on docs), so the stream twin's null-passage row must
    // keep it too, or the census silently loses a doc
    val benchText = (1 to 20).map(i => s"b$i").mkString(" ")
    val excerpt = (1 to 10).map(i => s"b$i").mkString(" ")
    val filler = (1 to 10).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (0L, benchText, 10L),
      (5L, filler + " " + excerpt, 20L),
      (7L, "   \t  ", 30L),
      (8L, "another clean document with its own words", 40L))
      .toDF("doc_id", "text", "n_chars")
    val bench = graft.ext.DedupOps.passageHashes(
        docs.filter($"doc_id" % 97 === 0))
      .select("ph").distinct().withColumn("is_hit", lit(1L))
    val log = graft.streaming.StreamingOps.contamRouteLog(docs, bench)
    // the zero-token doc survives the explode as exactly one hit=0 row
    assert(log.filter($"doc_id" === 7L).collect()
      .map(r => r.getAs[Long]("hit")).toSeq == Seq(0L))
    val stream = graft.streaming.StreamingOps.contamRouteCensus(log)
      .collect().map(_.toSeq).toSeq
    val batch = graft.ext.TextOps.contamSafeSplitOf(docs)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
    assert(stream.map(_.head).contains("quarantined"))
    // all four docs accounted for
    assert(stream.map(_(1).asInstanceOf[Long]).sum == 4L)
  }

  test("t71 applies merges greedily in rank order with char fallback") {
    import spark.implicits._
    // vocab: aaa×3, aaaa×1, ab×1, b×1, x-y×1 → pair counts: aa=9 (2
    // per 'aaa' × freq 3, 3 per 'aaaa'), ab=1, x-=1, -y=1 → ranked
    // alnum merge list [aa, ab]. Hand-applied: aaa→|aa|a (2 — greedy
    // left-to-right, NOT 3), aaaa→|aa|aa (2), ab→|ab (1), b→1,
    // x-y→3 (non-alnum char fallback)
    val docs = Seq(
      ("s1", "aaa aaa ab x-y"),
      ("s2", "aaa b aaaa")).toDF("source", "text")
    val got = graft.ext.TextOps.bpeTokenCountOf(docs)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"),
          r.getAs[Long]("tokens_per_word_ppm"))).toMap
    assert(got("s1") == (4L, 8L, 2000000L))   // 2+2+1+3 BPE tokens
    assert(got("s2") == (3L, 5L, 1666666L))   // 2+1+2; exact div ppm
  }

  test("s94 tombstones delete from serving; sidecar invisible to s80") {
    val before = graft.ext.SimilarityOps.ivfPqKnnServed(spark, d)
      .collect().map(_.toSeq).toSeq
    val del = graft.ext.SimilarityOps.ivfPqTombstoned(spark, d)
      .collect().map(_.toSeq).toSeq
    def cohort(rows: Seq[Seq[Any]]) =
      rows.filter(_(2).asInstanceOf[Long] % 13 == 5)
    // the delete is real: no cohort member survives in the tombstoned
    // serving (and the baseline surfaced at least one, so this isn't
    // vacuously true on the fixture)
    assert(cohort(before).nonEmpty)
    assert(cohort(del).isEmpty)
    // no holes: every query keeps a full (or corpus-bounded) top-k —
    // a displaced cohort member is replaced by the next survivor,
    // so per-query row counts never shrink
    val nBefore = before.groupBy(_.head).view.mapValues(_.size).toMap
    val nDel = del.groupBy(_.head).view.mapValues(_.size).toMap
    assert(nBefore.keySet == nDel.keySet)
    assert(nBefore.forall { case (q, n) => nDel(q) == n })
    // the sidecar is invisible to readers that don't opt in: s80's
    // serving over the SAME artifact is identical after the delete
    val after = graft.ext.SimilarityOps.ivfPqKnnServed(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(after == before)
  }

  test("t71 segmentation matches a symbol-list BPE reference (property)") {
    import spark.implicits._
    // independent reference: greedy BPE over symbol LISTS — each
    // ranked merge fuses only two COMPLETE adjacent symbols in one
    // left-to-right pass. A 2-letter alphabet makes merge
    // interactions dense: e.g. word "aab" under ranked merges
    // [ab, aa] must stay 2 symbols [a, ab] — the prefix-open
    // encoding ("|a|ab" matching search "|a|a") collapsed it to 1,
    // which is exactly the divergence this property pins down.
    def refCount(word: String, merges: Seq[String]): Long = {
      var syms = word.map(_.toString).toVector
      for (m <- merges) {
        val (a, b) = (m.substring(0, 1), m.substring(1, 2))
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += (a + b); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
      }
      syms.length.toLong
    }
    val rnd = new scala.util.Random(20260814)
    def word() = (1 to 1 + rnd.nextInt(6))
      .map(_ => "ab" (rnd.nextInt(2))).mkString
    for (_ <- 1 to 3) {
      val rows = (1 to 30).map(i =>
        ("s" + (i % 2), i.toLong, (1 to 8).map(_ => word()).mkString(" ")))
      val docs = rows.toDF("source", "doc_id", "text")
      // the merge ranking, recomputed independently (t66's ordering)
      val vocab = rows.flatMap(_._3.split(" ")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val merges = vocab.toSeq.filter(_._1.length >= 2)
        .flatMap { case (w, n) =>
          w.sliding(2).map(_ -> n) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        .sortBy { case (p, n) => (-n, p) }.take(20).map(_._1)
      val expected = rows.groupBy(_._1).view.mapValues { rs =>
        val ws = rs.map(_._3.split(" ").length.toLong).sum
        val bpe = rs.flatMap(_._3.split(" "))
          .map(refCount(_, merges)).sum
        (ws, bpe)
      }.toMap
      val got = graft.ext.TextOps.bpeTokenCountOf(docs)
        .collect().map(r => r.getString(0) ->
          (r.getAs[Long]("ws_tokens"), r.getAs[Long]("bpe_tokens"))).toMap
      assert(got == expected)
    }
  }

  test("t72 realizes integer epochs exactly and subsampling consistently") {
    import spark.implicits._
    // engineered plan: src0 holds 100 tokens (2 docs × 50), src3 900
    // (9 docs × 100) → corpus 1000, budget 2000. src0: share 400‰ →
    // target 800 → repeat exactly 8000 (8 full copies, no coin).
    // src3: share 100‰ → target 200 → repeat 222 (pure coin
    // subsample, copies ∈ {0,1})
    val mk50 = (1 to 50).map(i => s"w$i").mkString(" ")
    val mk100 = (1 to 100).map(i => s"v$i").mkString(" ")
    val docs = (
      (1 to 2).map(i => ("src0", i.toLong, mk50)) ++
      (10 to 18).map(i => ("src3", i.toLong, mk100))
    ).toDF("source", "doc_id", "text")
    def run() = graft.ext.TextOps.mixtureRealizeOf(docs)
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    val out = run()
    // integer-epoch source: exact fill, every doc selected
    assert(out("src0") ==
      Seq(2L, 2L, 16L, 800L, 800L, 1000000L))
    // subsampled source: copies == selected docs (base 0), realized
    // bookkeeping internally consistent, nobody copied twice
    val Seq(n3, sel3, cp3, tok3, tgt3, fill3) =
      out("src3").map(_.asInstanceOf[Long])
    assert(n3 == 9L && tgt3 == 200L)
    assert(sel3 == cp3 && sel3 <= n3)
    assert(tok3 == 100L * sel3)
    assert(fill3 == tok3 * 1000000L / 200L)
    // the coin is deterministic: a rerun realizes the same manifest
    assert(run() == out)
  }

  test("multi-group packing honors want > 1 without row loss") {
    val (store, root) = freshStore()
    try {
      val content = rows(store)
      // pick a per-month byte budget of about half the biggest month,
      // so its want lands at 2+ and the packer must split groups
      val monthBytes = diskState(root).toSeq
        .flatMap { case (p, len) =>
          "date_month=([^/]+)/".r.findFirstMatchIn(p)
            .map(m => m.group(1) -> len) }
        .groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).sum }
      val target = math.max(1L, monthBytes.values.max / 2)
      val plan = store.compact(targetBytes = target)
      assert(plan.exists(_.want > 1),
        s"budget $target produced no multi-group month: $plan")
      val after = store.fileCensus()
      plan.foreach(p => assert(after(p.month) <= p.want))
      assert(rows(store) == content)
    } finally Fs.deleteTree(root)
  }
}
