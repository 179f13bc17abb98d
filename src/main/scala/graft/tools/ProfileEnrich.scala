package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.spark.{KgEngine, SynthPages}

/** Dev profiling harness for the enrichment plan (not part of the driver
  * contract): times the composition stages separately to attribute
  * kg_full_enrich wall time.
  */
object ProfileEnrich {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 256)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def canon = KgEngine.extractCanonical(spark, SynthPages.fromDocuments(docs))
    val registry = docs.select(F.col("doc_id").cast("long")).as[Long]
      .flatMap { id =>
        val subj = "https://replay.invalid/proj" + id + "/"
        graft.registry.RegistryParsers
          .parsePypi(graft.spark.SynthRegistry.pypi(id, "9.9.9"))
          .getOrElse(Nil)
          .map(d => (subj, d.field, graft.spark.Model.objForms(d.value)._1))
      }.toDF("subj", "pred", "obj")
    val fetched = docs.select(
      F.concat(F.lit("https://proj"), F.col("doc_id"), F.lit(".example.com/")).as("url"),
      F.concat(F.lit("<html><a href=\"https://github.com/org"),
        F.pmod(F.col("doc_id"), F.lit(97)), F.lit("/proj"), F.col("doc_id"),
        F.lit("\">GitHub</a></html>")).as("html"))
    val hp = F.concat(F.lit("https://proj"), F.col("doc_id"), F.lit(".example.com/"))
    val probes = docs.where(F.pmod(F.col("doc_id"), F.lit(8)).isin(0, 6))
      .select(hp.as("url"),
        F.when(F.pmod(F.col("doc_id"), F.lit(8)) === 0, "invalid")
          .otherwise("valid").as("status"),
        hp.as("canonical_url"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // warmup
    canon.count()
    time("extract_only")(canon.count())
    time("enrich_no_extrapolate")(KgEngine.enrichAll(canon, registry, Seq("Version"), 1,
      fetched, probes, extrapolateEnriched = false).count())
    time("enrich_full")(KgEngine.enrichAll(canon, registry, Seq("Version"), 1,
      fetched, probes).count())
    time("enrich_full_2nd")(KgEngine.enrichAll(canon, registry, Seq("Version"), 1,
      fetched, probes).count())
    // exchange-barrier variant: one repartition(subj) above the extraction
    // makes every consumer reuse that exchange instead of re-running the
    // group pass
    val barrier = canon.toDF().repartition(F.col("subj"))
      .as[graft.spark.Model.CanonTriple]
    time("enrich_full_barrier")(KgEngine.enrichAll(barrier, registry, Seq("Version"), 1,
      fetched, probes).count())
    time("enrich_full_barrier_2nd")(KgEngine.enrichAll(barrier, registry, Seq("Version"), 1,
      fetched, probes).count())
    spark.stop()
  }
}
