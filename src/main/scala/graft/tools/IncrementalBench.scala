package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import graft.spark.{Incremental, SynthPages}

/** Measures the incremental-maintenance advantage: after a recrawl in which
  * only ~1% of subjects changed content, compare
  *
  *   full_rebuild      — what the non-incremental pipeline does: extract the
  *                       entire new crawl and publish a fresh store pair
  *                       (Incremental.initStore over the full recrawl);
  *   inc_full_recrawl  — fold the SAME full recrawl into the existing store
  *                       (updateStore): the capture merge still scans
  *                       everything once, but only changed subjects
  *                       re-extract;
  *   inc_changed_only  — the pre-filtered delta (just the changed pages), the
  *                       shape a diffing crawler hands the pipeline.
  *
  * plus the merge-on-read log legs (appendDelta on both delta shapes).
  *
  * Corpus = SPARK_GRAFT_SCALE × the sf documents table through SynthPages
  * (same family as ScalingBench); churn = subjects with
  * doc_id % SPARK_GRAFT_CHURN_MOD == 0 (default 100 → 1%). Buckets default
  * to 256 = the session's shuffle partitioning — below that the bucketed
  * anchoring turns off and every incremental leg silently pays a full
  * store shuffle (see BucketedStore). Emits one JSON line; wall numbers
  * need a quiet window like every bench on this VM.
  */
object IncrementalBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "50").toInt
    // churn = subjects with doc_id % mod == 0; mod=100 → 1%, mod=10 → 10%
    val churnMod = sys.env.getOrElse("SPARK_GRAFT_CHURN_MOD", "100").toInt
    val base = sys.env.getOrElse("SPARK_GRAFT_CORPUS_DIR", "/tmp") +
      s"/graft_incbench_m$churnMod"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 256)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.sql.warehouse.dir", s"$base/warehouse")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp"))
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = SynthPages.replicate(
      spark.read.parquet(s"$sfDir/documents.parquet"), scale)
    val live = SynthPages.fromDocuments(docs)
    val m = F.pmod(
      F.regexp_extract(F.col("url"), "proj(\\d+)/", 1).cast("long"), F.lit(churnMod))
    def corrupt(p: DataFrame) = p
      .withColumn("warc_ts", F.col("warc_ts") - F.expr("INTERVAL 7 DAYS"))
      .withColumn("text", F.concat(F.col("text"), F.lit("\nOLD CONTENT")))

    // materialize crawls to parquet so every measured job starts at a scan
    def mat(df: DataFrame, name: String): DataFrame = {
      val p = s"$base/$name.parquet"
      if (!new java.io.File(p).exists()) df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    // yesterday's crawl: 1% of subjects carry week-old content
    val baseCrawl = mat(
      live.where(m =!= 0).unionByName(corrupt(live.where(m === 0))), "basecrawl")
    // today's recrawl: everything again, the 1% now at live content
    val fullRecrawl = mat(live, "fullrecrawl")
    val changedOnly = mat(live.where(m === 0), "changedonly")
    val pages = fullRecrawl.count()

    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // existing store (untimed setup for the incremental legs). Buckets must
    // be ≥ spark.sql.shuffle.partitions or EnsureRequirements prefers the
    // larger partitioning and reshuffles BOTH join sides — the bucketed
    // anchoring silently turns off (DisableUnnecessaryBucketedScan) and the
    // append pays a full store shuffle it exists to avoid.
    val buckets = sys.env.getOrElse("SPARK_GRAFT_BUCKETS", "256").toInt
    Incremental.initStore(spark, baseCrawl, "ib_caps", "ib_tri", s"$base/store",
      buckets)
    val warm = sys.env.getOrElse("SPARK_GRAFT_WARMUPS", "1").toInt
    for (_ <- 0 until warm) { // JIT the extract + merge paths once
      Incremental.updateStore(spark, changedOnly, "ib_caps", "ib_tri", s"$base/store", buckets)
      Incremental.initStore(spark, changedOnly, "ib_w_caps", "ib_w_tri", s"$base/w", buckets)
    }

    val tFull = time(Incremental.initStore(
      spark, fullRecrawl, "ib_full_caps", "ib_full_tri", s"$base/full", buckets))
    val tIncFull = time(Incremental.updateStore(
      spark, fullRecrawl, "ib_caps", "ib_tri", s"$base/store", buckets))
    val tIncChanged = time(Incremental.updateStore(
      spark, changedOnly, "ib_caps", "ib_tri", s"$base/store", buckets))

    // merge-on-read log mode: per-batch cost O(churn) — base tables are
    // scanned by the lookup join, never rewritten
    Incremental.initLogs(spark, s"$base/clog", s"$base/tlog")
    Incremental.appendDelta(spark, changedOnly, "ib_caps",
      s"$base/clog", s"$base/tlog", batch = 1) // JIT/warm the append path
    Incremental.initLogs(spark, s"$base/clog", s"$base/tlog")
    val tLogFull = time(Incremental.appendDelta(spark, fullRecrawl, "ib_caps",
      s"$base/clog", s"$base/tlog", batch = 1))
    Incremental.initLogs(spark, s"$base/clog2", s"$base/tlog2")
    val tLogChanged = time(Incremental.appendDelta(spark, changedOnly, "ib_caps",
      s"$base/clog2", s"$base/tlog2", batch = 1))

    // all four maintenance paths must agree with the rebuild (untimed sanity)
    val nFull = spark.table("ib_full_tri").count()
    val nInc = spark.table("ib_tri_next").count()
    val nLog = Incremental.currentTriples(
      spark.table("ib_tri"), Incremental.readLog(spark, s"$base/tlog")).count()
    require(nFull == nInc && nFull == nLog,
      s"triple counts diverged: rebuild=$nFull eager=$nInc log=$nLog")

    println(
      f"""{"metric":"incremental_update","pages":$pages,""" +
      f""""churn_pct":${100.0 / churnMod}%.1f,""" +
      f""""full_rebuild_sec":$tFull%.2f,"inc_full_recrawl_sec":$tIncFull%.2f,""" +
      f""""inc_changed_only_sec":$tIncChanged%.2f,""" +
      f""""log_full_recrawl_sec":$tLogFull%.2f,""" +
      f""""log_changed_only_sec":$tLogChanged%.2f,""" +
      f""""speedup_log_full_recrawl":${tFull / tLogFull}%.2f,""" +
      f""""speedup_log_changed_only":${tFull / tLogChanged}%.2f,"triples":$nFull}""")
    spark.stop()
  }
}
