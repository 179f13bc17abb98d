package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query seconds plus the KG throughput
  * (pages/sec over the synthesized page corpus).
  */
object Bench {

  /** Headline subset: the KG pipeline plus one representative per operator
    * family (join, agg, window, dedup, ANN, text). The long tail is covered
    * by Verify.
    */
  val headline: List[String] = List(
    "kg_canonical", "kg_raw_triples", "q1_agg", "q2_join_broadcast",
    "q4_star_join", "q6_sessions", "dedup_exact", "dedup_minhash",
    "ann_lsh", "doc_token_stats", "doc_langid", "multimodal_decode")

  def runAll(spark: SparkSession, sfDir: String): (Map[String, Double], Double) = {
    val qs = SparkEntry.queries
    val results = headline.map { name =>
      val t0 = System.nanoTime()
      try qs(name)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap

    // pages/sec on the KG pipeline: 2 pages per document
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val pages = 2.0 * nDocs
    val pagesPerSec = pages / math.max(results("kg_canonical"), 1e-9)
    (results, pagesPerSec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (results, pagesPerSec) = runAll(spark, sfDir)
    val qs = results.toList.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.values.sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pages_per_sec":$pagesPerSec%.1f}""")
    spark.stop()
  }
}

/** Two-parallelism scaling evidence (the sandbox proxy for the N vs 4N
  * executor criterion, BASELINE.md): runs the KG pipeline at local[8] and
  * local[32] on the same input and reports throughput at both plus the
  * scaling efficiency (pages/sec at 32 cores) / (4 × pages/sec at 8 cores).
  */
object ScalingBench {
  def timeKg(cores: Int, sfDir: String): (Double, Long) = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val pages = graft.spark.SynthPages.fromDocuments(docs)
      // warm-up (JIT + page cache), then measured run
      graft.spark.KgEngine.extractCanonical(spark, pages).count()
      val t0 = System.nanoTime()
      val n = graft.spark.KgEngine.extractCanonical(spark, pages).count()
      ((System.nanoTime() - t0) / 1e9, n)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nDocs = {
      val s = SparkSession.builder().master("local[2]")
        .config("spark.ui.enabled", "false").getOrCreate()
      try s.read.parquet(s"$sfDir/documents.parquet").count()
      finally s.stop()
    }
    val pages = 2.0 * nDocs
    val (t8, _) = timeKg(8, sfDir)
    val (t32, n32) = timeKg(32, sfDir)
    val pps8 = pages / t8
    val pps32 = pages / t32
    val eff = pps32 / (4.0 * pps8)
    println(
      f"""{"metric":"scaling","sf":"$sfDir","pages":${pages.toLong},"triples":$n32,"t_8":$t8%.3f,"t_32":$t32%.3f,"pages_per_sec_8":$pps8%.1f,"pages_per_sec_32":$pps32%.1f,"efficiency_8_to_32":$eff%.3f}""")
  }
}
