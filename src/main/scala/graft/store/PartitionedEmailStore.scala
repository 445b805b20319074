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
  * holding any of the batch's dedupe_keys. The second set is answered
  * by a hash-bucketed (dedupe_key → date_month) [[KeyIndex]] kept at
  * `<root>_keyidx`: the probe reads only the batch's bucket dirs
  * (planning-time partition pruning), never the store — the secondary
  * index that makes global key uniqueness affordable when the store is
  * 100 TB and a batch touches a handful of months. The index is
  * maintained incrementally (touched buckets only) after each upsert,
  * and bootstrap-built from a one-time 2-column store scan for stores
  * that predate it.
  */
class PartitionedEmailStore(spark: SparkSession, root: String)
    extends DocStore {

  /** Bucket-pruned key→month probe; sibling path so store reads never
    * pick up index files. */
  private[graft] val index = new KeyIndex(spark, root + "_keyidx")

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
        index.rebuild(read().select(col("dedupe_key"), col("date_month")))
      } else {
        val batchKeys = compact.select("dedupe_key").cache()
        try {
          // one-time bootstrap for stores created before the index
          if (!index.exists)
            index.rebuild(read().select(col("dedupe_key"), col("date_month")))
          // months already holding any batch key: bucket-pruned index
          // probe — reads the batch's kb dirs, not the store
          val keyMonths = index.monthsFor(batchKeys)
          // months the batch itself lands in
          val batchMonths = compact.select(monthCol.as("date_month")).distinct()
          val affected = keyMonths.union(batchMonths).distinct()
            .collect().map(_.getString(0))
          val existing = read()
            .filter(col("date_month").isin(affected.toSeq: _*))
            .drop("date_month")
          // materialize BEFORE the overwrite: `merged` lazily reads the
          // same parquet path write() then rewrites, and a speculative/
          // retried task re-reading an affected-month file after the
          // commit deleted it would drop or duplicate store rows (the
          // KeyIndex.refresh hazard, applied to the store itself)
          val merged = EmailStore.merge(existing,
            compact.withColumn("path", lit(""))).localCheckpoint()
          // distrust the index across the store mutation: a crash
          // between write(merged) and index.refresh must leave
          // exists=false (bootstrap rebuild) rather than a trusted
          // index missing the batch's months
          index.invalidate()
          write(merged)
          // refresh the batch keys' index entries from what is now on
          // disk (merge may keep an existing row's month, not the batch's)
          val entries = read()
            .filter(col("date_month").isin(affected.toSeq: _*))
            .join(batchKeys, Seq("dedupe_key"), "left_semi")
            .select("dedupe_key", "date_month")
          index.refresh(batchKeys, entries)
        } finally { batchKeys.unpersist(); () }
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
