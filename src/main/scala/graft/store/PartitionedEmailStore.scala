package graft.store

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Month-partitioned email store with partition-scoped upsert — the
  * 100 TB write path.
  *
  * The snapshot [[EmailStore]] re-reads and rewrites the full store per
  * batch, which is correct but O(store) per upsert. Here rows live
  * under `date_month=yyyy-MM/` (nulls under `date_month=unknown`,
  * layout per [[Partitioning]]) and an upsert rewrites ONLY the
  * affected months via dynamic partition overwrite; untouched months'
  * files are never rewritten (spec-asserted). This mirrors the
  * reference's upsert contract — only matched documents change
  * (parsing_agent.py:67-86) — at partition granularity.
  *
  * Affected months = months carried by the batch ∪ months already
  * holding any of the batch's dedupe_keys. The second set requires a
  * key→month probe of the store, but it is a 2-column column-pruned
  * scan (dedupe_key + the partition value), ~1% of store bytes — the
  * price of global key uniqueness without a secondary index. With one,
  * e.g. a bucketed key index, the probe becomes a pruned lookup; at
  * fixture scale the scan is the right simplicity/scale trade.
  */
class PartitionedEmailStore(spark: SparkSession, root: String)
    extends DocStore {

  private val monthCol =
    coalesce(date_format(col("date"), "yyyy-MM"), lit("unknown"))

  private val fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  def isEmpty: Boolean =
    !fs.exists(new Path(root)) || fs.listStatus(new Path(root)).isEmpty

  /** Full store (store schema + the `date_month` partition column,
    * kept so month predicates prune at planning time). */
  def read(): DataFrame = spark.read.parquet(root)

  /** Month-pruned date-range scan (Q4 read path). */
  def readDateRange(from: java.sql.Timestamp,
      until: java.sql.Timestamp): DataFrame =
    Partitioning.readDateRange(spark, root, from, until)

  /** Upsert a batch (store schema + `path` column) rewriting only the
    * affected `date_month` partitions. */
  def upsert(batch: DataFrame): Unit = {
    val compact = EmailStore.mergeBatch(batch).cache()
    try {
      if (isEmpty) {
        write(compact)
      } else {
        val batchKeys = compact.select("dedupe_key")
        // months already holding any batch key (2-column pruned probe)
        val keyMonths = read().select(col("dedupe_key"), col("date_month"))
          .join(batchKeys, Seq("dedupe_key"), "left_semi")
          .select("date_month").distinct()
        // months the batch itself lands in
        val batchMonths = compact.select(monthCol.as("date_month")).distinct()
        val affected = keyMonths.union(batchMonths).distinct()
          .collect().map(_.getString(0))
        val existing = read()
          .filter(col("date_month").isin(affected.toSeq: _*))
          .drop("date_month")
        val merged = EmailStore.merge(existing,
          compact.withColumn("path", lit("")))
        write(merged)
      }
    } finally { compact.unpersist(); () }
  }

  /** Dynamic partition overwrite: only partitions present in `df` are
    * replaced; everything else is left byte-identical on disk. */
  private def write(df: DataFrame): Unit =
    df.withColumn("date_month", monthCol)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("date_month")
      .parquet(root)
}
