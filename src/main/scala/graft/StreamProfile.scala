package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev main: per-batch duration breakdown for the streaming twins —
  * run one query 3× and print each micro-batch's durationMs map
  * (triggerExecution, queryPlanning, walCommit, addBatch, …) plus the
  * wall total, to attribute the tier's fixed per-drain overhead.
  * Usage: runMain graft.StreamProfile [queryName] [sfDir]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("e84_stream_tumbling")
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[profile] started ${e.id}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        println(s"[profile] batch=${e.progress.batchId}" +
          s" rows=${e.progress.numInputRows}" +
          s" durationMs=${e.progress.durationMs}")
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val fn = SparkEntry.queries(name)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      fn(spark, d).count()
      println(f"[profile] RUN$i total=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
