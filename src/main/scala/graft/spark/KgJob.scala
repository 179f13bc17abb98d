package graft.spark

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, functions => F}
import java.nio.file.{Files, Paths}

/** The full production-shaped job: pages → triples / nodes / edges / lineage
  * tables, written bucket-by-bucket with a commit manifest so a restarted
  * run resumes without re-emitting committed partitions (north rule).
  *
  * Layout under `outDir`:
  *   triples/bucket=N/…parquet     nodes/…  edges/…  lineage/…
  *   _manifest/bucket_N            (one marker file per committed bucket)
  */
object KgJob {

  val DefaultBuckets = 16

  def manifestDir(outDir: String): java.nio.file.Path =
    Paths.get(outDir, "_manifest")

  def committedBuckets(outDir: String): Seq[Int] = {
    val dir = manifestDir(outDir)
    if (!Files.isDirectory(dir)) return Nil
    import scala.jdk.CollectionConverters._
    Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("bucket_") => s.stripPrefix("bucket_").toInt }
      .toSeq.sorted
  }

  /** Runs (or resumes) the KG construction job. Returns the number of
    * buckets processed in this invocation.
    */
  def run(
      spark: SparkSession,
      pages: DataFrame,
      outDir: String,
      buckets: Int = DefaultBuckets
  ): Int = {
    Files.createDirectories(manifestDir(outDir))
    val done = committedBuckets(outDir).toSet
    val todo = (0 until buckets).filterNot(done)

    // lineage once per run over the full input (cheap: url column only)
    KgEngine.lineage(spark, pages).toDF()
      .write.mode(SaveMode.Append).parquet(s"$outDir/lineage")

    val subjCol = F.udf((url: String) =>
      KgEngine.splitSubject(url).map(_._1).getOrElse("")).apply(F.col("url"))

    for (b <- todo) {
      val slice = pages.where(KgEngine.bucketOf(subjCol, buckets) === b)
      val canon = KgEngine.extractCanonical(spark, slice)
      canon.toDF().withColumn("bucket", F.lit(b))
        .write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/triples/bucket=$b")
      KgEngine.edges(canon)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/edges/bucket=$b")
      KgEngine.nodes(canon)
        .write.mode(SaveMode.Overwrite).parquet(s"$outDir/nodes/bucket=$b")
      // commit marker: bucket is durable once all three tables landed
      Files.write(manifestDir(outDir).resolve(s"bucket_$b"), Array.emptyByteArray)
    }
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
