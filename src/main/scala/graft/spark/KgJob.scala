package graft.spark

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The full production-shaped job: pages → triples / nodes / edges / lineage
  * tables, written in ONE input pass as bucket-partitioned parquet with a
  * commit manifest so a restarted run resumes without re-emitting committed
  * partitions (north rule).
  *
  * Layout under `outDir`:
  *   triples/bucket=N/…parquet     nodes/…  edges/…  lineage/…
  *   _manifest/bucket_N            (one marker file per committed bucket)
  */
object KgJob {

  val DefaultBuckets = 16

  /** Manifest I/O goes through the Hadoop FileSystem API, not java.nio: on a
    * real cluster the commit markers must live on the JOB's filesystem
    * (HDFS / object store) next to the tables, or resume breaks the moment a
    * driver is replaced. Locally `file:` resolves to the same paths as
    * before.
    */
  private def fs(outDir: String, conf: Configuration): FileSystem =
    new Path(outDir).getFileSystem(conf)

  def manifestDir(outDir: String): Path = new Path(outDir, "_manifest")

  def committedBuckets(outDir: String,
                       conf: Configuration = new Configuration()): Seq[Int] = {
    val f = fs(outDir, conf)
    val dir = manifestDir(outDir)
    if (!f.exists(dir)) return Nil
    f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("bucket_") => s.stripPrefix("bucket_").toInt }
      .sorted
  }

  /** Runs (or resumes) the KG construction job. Returns the number of
    * buckets processed in this invocation.
    *
    * ONE pass over the input regardless of bucket count: completed buckets
    * are filtered out up front, the bucket column is derived from each
    * triple's subject after extraction, and all five tables land via
    * `partitionBy("bucket")` with dynamic partition overwrite (only the
    * re-run buckets' directories are replaced — committed buckets are never
    * touched, so a resume never re-emits). Lineage and metrics follow the
    * same per-bucket protocol, so a resumed run cannot duplicate their rows.
    *
    * Durability granularity is the INVOCATION: commit markers land after the
    * invocation's writes finish, so a mid-run crash redoes this invocation's
    * buckets (task-level atomicity comes from the file committer; dynamic
    * overwrite makes the redo idempotent). To bound that loss window on very
    * long runs, cap `maxBucketsPerRun` and loop — each invocation still
    * scans the input once, over only the still-uncommitted subjects.
    */
  def run(
      spark: SparkSession,
      pages: DataFrame,
      outDir: String,
      buckets: Int = DefaultBuckets,
      maxBucketsPerRun: Int = Int.MaxValue,
      iterationLimit: Int = graft.pipeline.Summarize.DefaultIterationLimit
  ): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val f = fs(outDir, conf)
    f.mkdirs(manifestDir(outDir))
    val done = committedBuckets(outDir, conf).toSet
    val todo = (0 until buckets).filterNot(done).take(maxBucketsPerRun)
    if (todo.isEmpty) return 0

    val remaining =
      if (todo.size == buckets) pages
      else KgEngine.resumeFilter(pages, ((0 until buckets).toSet -- todo).toSeq, buckets)

    def write(df: DataFrame, table: String): Unit =
      df.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(s"$outDir/$table")

    // triples: the heavy pass — extracted once (with the per-subject error
    // channel riding as marker rows), bucketed by subject hash
    val all = KgEngine.extractCanonicalWithStats(spark, remaining, iterationLimit).toDF()
      .withColumn("bucket", KgEngine.bucketOf(F.col("subj"), buckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = all.where(F.col("pred") =!= KgEngine.StatsPred)
    try {
      write(canon, "triples")
      // edges/nodes derive from the cached triples, not a fresh input scan —
      // through the ONE engine definition of edge/node (KgEngine)
      val e = KgEngine.edgesDf(canon, carry = Seq("bucket"))
      write(e, "edges")
      write(KgEngine.nodesDf(e, carry = Seq("bucket")), "nodes")

      // per-bucket lineage: input pages and candidate pages from a pruned
      // url-only scan (pure Catalyst string expressions — KgEngine.subjCol /
      // candidateUrlCol — no ScalaUDF, the whole pass stays inside
      // whole-stage codegen), plus the per-subject error channel (provider
      // errors + known-bad drops) aggregated from the cached stats markers —
      // SURVEY §1.3's lineage(partition_id, input_rows, emitted,
      // dropped_bad, errors), keyed by bucket
      val statsByBucket = all.where(F.col("pred") === KgEngine.StatsPred)
        .groupBy("bucket")
        .agg(F.sum(F.col("obj").cast("long")).as("errors"),
          F.sum(F.col("obj_json").cast("long")).as("dropped_bad"))
      val lin = remaining.select(F.col("url"))
        .withColumn("bucket", KgEngine.bucketOf(KgEngine.subjCol(F.col("url")), buckets))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).as("input_rows"),
          F.sum(KgEngine.candidateUrlCol(F.col("url")).cast("long")).as("emitted"))
        .join(statsByBucket, Seq("bucket"), "left")
        .select(F.col("bucket"), F.col("input_rows"), F.col("emitted"),
          F.coalesce(F.col("dropped_bad"), F.lit(0L)).as("dropped_bad"),
          F.coalesce(F.col("errors"), F.lit(0L)).as("errors"))
      write(lin, "lineage")

      // per-bucket output metrics from the cached triples (north rule:
      // lineage + metrics rows per partition)
      val met = canon.groupBy("bucket")
        .agg(F.count(F.lit(1)).as("n_triples"),
          F.countDistinct("subj").as("n_subjects"),
          F.max("certainty").as("max_certainty"))
      write(met, "metrics")

      // dynamic partition overwrite only replaces partitions PRESENT in this
      // run's output: a todo bucket that produced zero rows for some table
      // this time would silently keep that table's stale partition files
      // from a crashed earlier attempt whose input differed. Delete the
      // absent todo partitions explicitly before committing. Presence is
      // per table family: edges/nodes can be empty for a bucket whose
      // triples aren't (no URL-typed preds); all three derive from the
      // cached canon, so these are cheap re-aggregations, not input scans.
      def bucketsOf(df: DataFrame): Set[Int] =
        df.select("bucket").distinct().collect().map(_.getInt(0)).toSet
      val stale: Seq[(String, Set[Int])] = {
        val canonPresent = bucketsOf(canon)
        val ePresent = bucketsOf(e)
        Seq("triples" -> canonPresent, "metrics" -> canonPresent,
          "edges" -> ePresent, "nodes" -> ePresent,
          "lineage" -> bucketsOf(lin))
      }
      for ((table, present) <- stale; b <- todo.filterNot(present))
        f.delete(new Path(s"$outDir/$table/bucket=$b"), true)
    } finally all.unpersist()

    // commit markers: a bucket is durable once all five tables landed
    todo.foreach(b =>
      f.create(new Path(manifestDir(outDir), s"bucket_$b"), true).close())
    todo.size
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/graft_kg_out")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = SynthPages.fromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val n = run(spark, pages, outDir)
    val total = spark.read.parquet(s"$outDir/triples").count()
    println(s"""{"buckets_processed":$n,"committed":${committedBuckets(outDir).size},"triples":$total}""")
    spark.stop()
  }
}
