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

  /** documents(doc_id, text, ...) → pages(url, warc_ts, html, text, lang). */
  def fromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._

    val base = documents.select(
      F.col("doc_id").cast("long"),
      F.col("text"),
      F.col("lang"))

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
}
