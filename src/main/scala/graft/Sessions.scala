package graft
import org.apache.spark.sql.SparkSession

/** The one local-session builder shared by every main (Bench, Verify,
  * and the dev tools). Each main used to hand-roll this block and they
  * drifted (one omitted the UTC pin) — a timed dev run could then plan
  * under a different session environment than the bench it reproduces.
  * Config changes needed for parity (legacy flags, timezone) go HERE,
  * once.
  */
object Sessions {
  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      logLevel: String = "WARN"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(logLevel)
    spark
  }
}
