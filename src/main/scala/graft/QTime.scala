package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time named driver-contract queries (median of 3) against
  * SPARK_GRAFT_SF_DIR after running the standard cache warms — a
  * single-query bench loop for optimization work, so iterating on one
  * operator doesn't require the full 160-query suite.
  *
  * Usage: sbt "runMain graft.QTime g94_pagerank g97_personalized_pr"
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val w = t {
      graft.ext.DedupOps.warm(spark, sfDir)
      graft.ext.SimilarityOps.warm(spark, sfDir)
      graft.graph.GraphOps.warm(spark, sfDir)
      graft.query.FixtureCorpus.store(spark, sfDir).count()
    }
    println(f"[qtime] warm ${w}%.2f s")
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"[qtime] unknown query: $name")
        case Some(q) =>
          val ts = (1 to 3).map(_ => t { q(spark, sfDir).count() }).sorted
          println(f"[qtime] $name median ${ts(1)}%.3f s (runs: " +
            ts.map(x => f"$x%.3f").mkString(", ") + ")")
      }
    }
    spark.stop()
  }
}
