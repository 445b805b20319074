package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — prints a full per-query detail line (also written
  * to `BENCH_DETAIL.json`) followed by ONE compact headline JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{slowest 20},
  * "sf":...}` sized to survive a bounded tail capture of stdout.
  *
  * Noise-proofing (round-3 lesson: a contended sandbox recorded a 6.4×
  * "regression" on byte-identical code):
  *  - queries run in sorted-name order so per-query diffs across rounds
  *    are attributable (a Map's hash order scrambled attribution);
  *  - the shared caches (dedup frames, k-means model, fixture corpus
  *    store) are pre-built as separately-timed `cache_*` line items
  *    instead of being charged to whichever query touches a registry
  *    first;
  *  - each query records the MEDIAN of 3 consecutive runs, so one noisy
  *    scheduling window cannot fail the gate;
  *  - a scalar-baseline sanity probe (q32 median < 2 s) marks the JSON
  *    `"contended":true` and warns on stderr instead of silently
  *    recording garbage timings.
  */
object Bench {

  /** Median of 3 timed runs of `f`; -1.0 if any run throws. */
  private def median3(f: () => Unit): Double = {
    var failed = false
    val times = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      try f() catch { case _: Throwable => failed = true }
      (System.nanoTime() - t0) / 1e9
    }
    if (failed) -1.0 else times.sorted.apply(1)
  }

  /** (elapsed, succeeded) — a throwing cache warm must surface in the
    * JSON (its cost re-smears onto whichever query rebuilds the cache),
    * not vanish into a quiet catch. */
  private def timeOnce(f: () => Unit): (Double, Boolean) = {
    val t0 = System.nanoTime()
    val ok = try { f(); true } catch { case _: Throwable => false }
    ((System.nanoTime() - t0) / 1e9, ok)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/parquet paths once so first-run JIT and
    // reader init are not charged to whichever query runs first
    // (observed ±3s of pure warmup noise on a trivial query)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    // shared caches, each its own line item (timed once: they are
    // idempotent no-ops on re-entry, so a median would measure nothing)
    val cacheRuns: Seq[(String, (Double, Boolean))] = Seq(
      "cache_dedup_frames" ->
        timeOnce(() => graft.ext.DedupOps.warm(spark, sfDir)),
      "cache_kmeans_model" ->
        timeOnce(() => graft.ext.SimilarityOps.warm(spark, sfDir)),
      "cache_graph_edges" ->
        timeOnce(() => graft.graph.GraphOps.warm(spark, sfDir)),
      "cache_fixture_corpus" ->
        timeOnce(() => { graft.query.FixtureCorpus.store(spark, sfDir).count(); () }))
    // a FAILED warm's elapsed is dropped from the line items entirely:
    // its cost re-lands on whichever query rebuilds the cache, so
    // keeping it would double-count (and contradict the "excluded from
    // total" warning below)
    val cacheTimes: Seq[(String, Double)] =
      cacheRuns.collect { case (k, (t, true)) => k -> t }
    val queryTimes: Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        name -> median3(() => { fn(spark, sfDir).count(); () })
      }
    val contended = queryTimes.toMap.get("q32_scalar_funcs").exists(_ > 2.0)
    if (contended)
      System.err.println("[bench] WARNING: q32 scalar baseline exceeded 2s " +
        "median — machine is contended, timings unreliable")
    // a crashed query records -1 and is excluded from the total, which
    // would otherwise make the headline SMALLER — surface every such
    // name top-level so the gate can't mistake a crash for a speedup
    val failed = cacheRuns.collect { case (k, (_, false)) => k } ++
      queryTimes.collect { case (k, t) if t < 0 => k }
    if (failed.nonEmpty)
      System.err.println("[bench] WARNING: failed (excluded from total): " +
        failed.mkString(", "))
    val all = cacheTimes ++ queryTimes
    // ms precision: enough for a wall-clock gate, and it keeps the
    // detail line (100+ entries) from bloating past capture buffers.
    // Locale.ROOT: a comma-decimal default locale would render 61,234
    // and silently break both JSON lines.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = all.map(_._2).filter(_ >= 0).sum
    // Full per-query detail: one line WITHOUT the "metric" key (so
    // headline parsers never pick it up) + a repo file for diffing
    // rounds. The harness that records bench output keeps only the LAST
    // ~2000 chars of stdout — a single 4 KB line was front-truncated
    // into unparseable fragments every round (BENCH_r0{1..4}.json all
    // show "parsed": null), so the headline line below is kept compact
    // and printed last.
    val qsAll = all.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val detail =
      s"""{"detail":"per_query_seconds","runs":3,"contended":$contended,"failed":$failedJson,"queries":$qsAll,"sf":"$sfDir"}"""
    println(detail)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      (detail + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // Compact headline: total + the slowest entries only, sized to
    // survive a 2000-char tail capture intact.
    val qsTop = all.sortBy(-_._2).take(20)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","runs":3,"contended":$contended,"failed":$failedJson,"queries":$qsTop,"sf":"$sfDir"}""")
    graft.ext.DedupOps.clearCaches()
    graft.ext.SimilarityOps.clearCaches()
    graft.graph.GraphOps.clearCaches()
    graft.query.FixtureCorpus.clear()
    spark.stop()
  }
}
