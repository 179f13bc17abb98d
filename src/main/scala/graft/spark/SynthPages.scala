package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}

/** Deterministic Common-Crawl-style pages synthesized from the driver's
  * `documents` table (BASELINE.json input_hint): each document becomes one
  * project with a package.json manifest and a plain-text README. Everything
  * is a pure function of doc_id, so a DuckDB oracle can reconstruct the
  * expected canonical triples exactly — the correctness gate for the whole
  * extract→merge→extrapolate→fix pipeline at any scale factor.
  */
object SynthPages {

  val FixedTs = "2026-07-23 00:00:00"

  /** documents(doc_id, text, ...) → pages(url, warc_ts, html, text, lang).
    * The input is typically one small parquet file (a single scan split);
    * repartitioning first spreads the narrow extract stage across cores the
    * way a real multi-file 100 TB scan would be.
    */
  def fromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._

    val par = spark.sparkContext.defaultParallelism * 2
    val base0 = documents.select(
      F.col("doc_id").cast("long"),
      F.col("text"),
      F.col("lang"))
    val base =
      if (base0.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism) base0
      else base0.repartition(par)

    val pkgJson = base.select(
      F.concat(F.lit("https://replay.invalid/proj"), F.col("doc_id"),
        F.lit("/package.json")).as("url"),
      F.concat(
        F.lit("{\"name\":\"proj"), F.col("doc_id"),
        F.lit("\",\"version\":\"1."), F.pmod(F.col("doc_id"), F.lit(10L)),
        F.lit(".0\",\"description\":\"Tool number "), F.col("doc_id"),
        F.lit(".\",\"homepage\":\"https://proj"), F.col("doc_id"),
        F.lit(".example.com/\",\"repository\":\"https://github.com/org"),
        F.pmod(F.col("doc_id"), F.lit(97L)),
        F.lit("/proj"), F.col("doc_id"), F.lit("\"}")
      ).as("text"),
      F.col("lang"))

    val readme = base.select(
      F.concat(F.lit("https://replay.invalid/proj"), F.col("doc_id"),
        F.lit("/README")).as("url"),
      F.col("text"),
      F.col("lang"))

    pkgJson.unionByName(readme)
      .withColumn("warc_ts", F.to_timestamp(F.lit(FixedTs)))
      .withColumn("html", F.col("text").cast("binary"))
      .select("url", "warc_ts", "html", "text", "lang")
  }

  /** Deterministically replicates the documents table `factor`× with fresh
    * doc_ids — the knob that turns the small driver tables into a
    * compute-bound corpus for scaling runs.
    */
  def replicate(documents: DataFrame, factor: Int): DataFrame = {
    val spark = documents.sparkSession
    val n = documents.count()
    // the partitioned range drives generation so every core produces its own
    // slice; the small documents table rides along as a broadcast
    val reps = spark.range(0L, factor.toLong, 1L,
      spark.sparkContext.defaultParallelism * 2).toDF("rep")
    reps.crossJoin(F.broadcast(documents))
      .withColumn("doc_id", F.col("doc_id") + F.col("rep") * F.lit(n))
      .drop("rep")
      .select(documents.columns.map(F.col).toSeq: _*)
  }
}
