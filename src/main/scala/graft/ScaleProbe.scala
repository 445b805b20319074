package graft

/** Ad-hoc component profiler for the scale rehearsal: times the dedup
  * warm's constituent frames separately so a super-linear total can be
  * attributed to the right stage. Dev tool, not a driver entry. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/tmp/graft-sf1")
    val spark = Sessions.local()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("jaccardPairs (d51 exact join)") {
      graft.ext.DedupOps.jaccardPairs(spark, d).count()
    }
    graft.ext.DedupOps.clearCaches()
    time("simhash") { graft.ext.DedupOps.simhash(spark, d).count() }
    graft.ext.DedupOps.clearCaches()
    time("minhashLsh (d52)") {
      graft.ext.DedupOps.minhashLsh(spark, d).count()
    }
    graft.ext.DedupOps.clearCaches()
    spark.stop()
  }
}
