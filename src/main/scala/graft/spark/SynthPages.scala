package graft.spark

import org.apache.spark.sql.{Column, DataFrame, functions => F}

/** Deterministic Common-Crawl-style pages synthesized from the driver's
  * `documents` table (BASELINE.json input_hint). Each document becomes one
  * project with a manifest (format chosen by doc_id % 4: package.json,
  * Cargo.toml, poetry pyproject.toml, or hpack package.yaml) plus a
  * plain-text README. Everything is a pure function of doc_id, so a DuckDB
  * oracle reconstructs the expected canonical triples exactly — the
  * correctness gate for the whole extract→merge→extrapolate→fix pipeline at
  * any scale factor, across four parser families.
  */
object SynthPages {

  val FixedTs = "2026-07-23 00:00:00"

  private def c(parts: Any*): Column =
    F.concat(parts.map {
      case col: Column => col
      case s: String   => F.lit(s)
    }: _*)

  /** documents(doc_id, text, ...) → pages(url, warc_ts, html, text, lang).
    * The input is typically one small parquet file (a single scan split);
    * repartitioning first spreads the narrow extract stage across cores the
    * way a real multi-file 100 TB scan would be.
    */
  def fromDocuments(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession

    val par = spark.sparkContext.defaultParallelism * 2
    val base0 = documents.select(
      F.col("doc_id").cast("long"),
      F.col("text"),
      F.col("lang"))
    val base =
      if (base0.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism) base0
      else base0.repartition(par)

    val id = F.col("doc_id")
    val flavor = F.pmod(id, F.lit(4L))
    val name = c("proj", id)
    val version = c("1.", F.pmod(id, F.lit(10L)), ".0")
    val summary = c("Tool number ", id, ".")
    val homepage = c("https://proj", id, ".example.com/")
    val ghRepo = c("https://github.com/org", F.pmod(id, F.lit(97L)), "/proj", id)
    val glRepo = c("https://gitlab.com/org", F.pmod(id, F.lit(97L)), "/proj", id)
    val docsUrl = c("https://docs.example.com/proj", id)

    val manifestRelpath = F.when(flavor === 0, "package.json")
      .when(flavor === 1, "Cargo.toml")
      .when(flavor === 2, "pyproject.toml")
      .otherwise("package.yaml")

    val manifestContent = F.when(flavor === 0,
        c("{\"name\":\"", name, "\",\"version\":\"", version,
          "\",\"description\":\"", summary, "\",\"homepage\":\"", homepage,
          "\",\"license\":\"MIT\",\"repository\":\"", ghRepo, "\"}"))
      .when(flavor === 1,
        c("[package]\nname = \"", name, "\"\nversion = \"", version,
          "\"\ndescription = \"", summary, "\"\nhomepage = \"", homepage,
          "\"\nlicense = \"MIT\"\nrepository = \"", ghRepo, "\"\n"))
      .when(flavor === 2,
        c("[tool.poetry]\nname = \"", name, "\"\nversion = \"", version,
          "\"\ndescription = \"", summary, "\"\nlicense = \"MIT\"\nhomepage = \"",
          homepage, "\"\ndocumentation = \"", docsUrl,
          "\"\nrepository = \"", glRepo, "\"\n"))
      .otherwise(
        c("name: ", name, "\nversion: ", version, "\nsynopsis: ", summary,
          "\nlicense: MIT\ngithub: org", F.pmod(id, F.lit(97L)), "/proj", id, "\n"))

    val manifest = base.select(
      c("https://replay.invalid/", name, "/", manifestRelpath).as("url"),
      manifestContent.as("text"),
      F.col("lang"))

    val readme = base.select(
      c("https://replay.invalid/", name, "/README").as("url"),
      F.col("text"),
      F.col("lang"))

    manifest.unionByName(readme)
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
