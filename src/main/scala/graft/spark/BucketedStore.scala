package graft.spark

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Subject-bucketed publication of the canonical triple table — the storage
  * half of the co-located-join story.
  *
  * Every post-construction consumer of the canonical table keys by subject:
  * the `possible_fields_missing` gates aggregate per subj, the archive /
  * external-directory dispatches self-join the subject's Archive, project
  * and Name subsets, incremental merges re-group on (subj, pred), and the
  * check stage folds per subject. Stored as plain parquet each of those
  * pays a full shuffle of the graph per run. Published through
  * `bucketBy(n, "subj")` the scan itself reports
  * `HashPartitioning(subj, n)`, which satisfies ClusteredDistribution for
  * any key list CONTAINING subj — so subj-keyed aggregates run single-stage
  * and equi-joins between two tables bucketed at the same count (or the
  * table's own subsets) need no exchange on either side. At 100 TB that
  * converts the dominant per-enrichment-round cost from "shuffle the
  * graph" to "read the graph".
  *
  * `sortBy("subj")` additionally orders rows inside each bucket file so
  * sort-merge consumers sort runs, not partitions. Size `buckets` for the
  * TARGET deployment: aim for bucket files in the 128 MB–1 GB range at the
  * stored scale (a 100 TB canonical table wants tens of thousands of
  * buckets, not `DefaultBuckets`) — too few buckets caps downstream
  * parallelism because one task reads one bucket.
  *
  * The table registers in the session catalog with an EXTERNAL path, so
  * the parquet lives where the caller says (object store / HDFS in
  * production) and a fresh session re-registers it by calling
  * `publishBySubj` again or `CREATE TABLE ... USING parquet CLUSTERED BY`
  * over the same path.
  */
object BucketedStore {

  /** Publishes `df` as a subj-bucketed, per-bucket-sorted external parquet
    * table, replacing any previous registration of `table`.
    */
  def publishBySubj(df: DataFrame, table: String, path: String,
                    buckets: Int = KgJob.DefaultBuckets): Unit = {
    val spark = df.sparkSession
    // saveAsTable(Overwrite) refuses to change an existing table's bucket
    // spec or location; dropping first makes publish idempotent across
    // sessions and bucket-count changes (external: the drop leaves files,
    // the Overwrite write replaces them)
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write.format("parquet").mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, "subj")
      .sortBy("subj")
      .saveAsTable(table)
  }

  /** The bucketed scan — `outputPartitioning = HashPartitioning(subj, n)`
    * as long as `spark.sql.sources.bucketing.enabled` stays at its default.
    */
  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
