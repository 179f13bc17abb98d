package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.spark.{KgJob, KgStreaming, SynthPages}

/** End-to-end job semantics: bucket-manifest resume and the streaming
  * variant.
  */
class KgJobSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshDir(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  test("KgJob resumes from the bucket manifest without re-emitting") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where("doc_id < 100")
    val pages = SynthPages.fromDocuments(docs)
    val out = freshDir("kgjob")

    // per-flavor canonical triple counts over doc_id % 8 (see SynthPages):
    // 12 full cycles of 77 + docs 96..99 (flavors 0-3)
    val expectedTriples = 12 * (11 + 11 + 11 + 10 + 10 + 9 + 6 + 10) + (11 + 11 + 11 + 10)

    val first = KgJob.run(spark, pages, out, buckets = 8)
    assert(first == 8)
    val triples1 = spark.read.parquet(s"$out/triples").count()
    assert(triples1 == expectedTriples)

    // simulate a restart after partial completion: drop two commit markers
    // and their outputs
    for (b <- Seq(3, 5)) {
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(out, "_manifest", s"bucket_$b"))
    }
    val second = KgJob.run(spark, pages, out, buckets = 8)
    assert(second == 2) // only the uncommitted buckets re-ran
    assert(KgJob.committedBuckets(out).size == 8)
    val triples2 = spark.read.parquet(s"$out/triples").count()
    assert(triples2 == expectedTriples) // overwrite per bucket → no duplicates
    // resume must not duplicate lineage either (per-bucket lineage protocol):
    // every input page accounted for exactly once
    val lineage = spark.read.parquet(s"$out/lineage")
      .agg(org.apache.spark.sql.functions.sum("input_rows")).first.getLong(0)
    assert(lineage == pages.count())
    // per-bucket metrics reconcile with the triples table
    val metrics = spark.read.parquet(s"$out/metrics")
      .agg(org.apache.spark.sql.functions.sum("n_triples")).first.getLong(0)
    assert(metrics == expectedTriples)
    // stats markers never leak into the triples table
    assert(spark.read.parquet(s"$out/triples")
      .where(s"pred = '${graft.spark.KgEngine.StatsPred}'").count() == 0)
  }

  test("lineage carries the per-subject error channel (dropped_bad, errors)") {
    import org.apache.spark.sql.{functions => F}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where("doc_id < 40")
    val base = SynthPages.fromDocuments(docs)
    // give doc 7 a meson.build (provider error offline) and a known-bad
    // .git/config upstream remote (dropped pre-merge)
    import spark.implicits._
    val extra = Seq(
      ("https://replay.invalid/proj7/meson.build", "project('x', 'c')\n"),
      ("https://replay.invalid/proj7/.git/config",
       "[remote \"upstream\"]\n\turl = https://anongit.kde.org/proj7.git\n"))
      .toDF("url", "text")
      .withColumn("warc_ts", F.to_timestamp(F.lit(SynthPages.FixedTs)))
      .withColumn("html", F.col("text").cast("binary"))
      .withColumn("lang", F.lit("en"))
      .select("url", "warc_ts", "html", "text", "lang")
    val out = freshDir("kgjob_errs")
    KgJob.run(spark, base.unionByName(extra), out, buckets = 4)
    val lin = spark.read.parquet(s"$out/lineage")
    assert(lin.columns.toSet ==
      Set("bucket", "input_rows", "emitted", "dropped_bad", "errors"))
    val row = lin.agg(F.sum("errors"), F.sum("dropped_bad")).first
    assert(row.getLong(0) == 1L, s"errors: $row")      // the meson failure
    assert(row.getLong(1) == 1L, s"dropped: $row")     // the anongit repo
    // clean buckets report zeroes, not nulls
    assert(lin.where("errors IS NULL OR dropped_bad IS NULL").count() == 0)
  }

  test("extrapolation limit overruns surface on the lineage error channel") {
    import org.apache.spark.sql.{functions => F}
    import spark.implicits._
    // a subject whose extrapolation chain (Homepage → Repository →
    // Repository-Browse) needs a confirming second sweep: converges under
    // the default limit, exceeds iterationLimit = 1 — the synthetic
    // non-convergent vector for ProviderError::ExtrapolationLimitExceeded
    // (extrapolate.rs:524-528)
    val pages = Seq(
      ("https://replay.invalid/cyclic/package.json",
       """{"name": "cyclic", "homepage": "https://github.com/o/cyclic"}"""))
      .toDF("url", "text")
      .withColumn("warc_ts", F.to_timestamp(F.lit(SynthPages.FixedTs)))
      .withColumn("html", F.col("text").cast("binary"))
      .withColumn("lang", F.lit("en"))
      .select("url", "warc_ts", "html", "text", "lang")
    val clean = freshDir("kgjob_xlim_ok")
    KgJob.run(spark, pages, clean, buckets = 2)
    assert(spark.read.parquet(s"$clean/lineage")
      .agg(F.sum("errors")).first.getLong(0) == 0L)
    val capped = freshDir("kgjob_xlim")
    KgJob.run(spark, pages, capped, buckets = 2, iterationLimit = 1)
    assert(spark.read.parquet(s"$capped/lineage")
      .agg(F.sum("errors")).first.getLong(0) == 1L)
    // mutate-then-Err: iteration 1's derivations are kept in the triples
    assert(spark.read.parquet(s"$capped/triples")
      .where("pred = 'Repository'").count() == 1L)
  }

  test("maxBucketsPerRun bounds the loss window; looping completes the job") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where("doc_id < 64")
    val pages = SynthPages.fromDocuments(docs)
    val out = freshDir("kgjob_capped")
    val counts = Iterator.continually(
      KgJob.run(spark, pages, out, buckets = 8, maxBucketsPerRun = 3))
      .takeWhile(_ > 0).toList
    assert(counts == List(3, 3, 2))
    assert(KgJob.committedBuckets(out).size == 8)
    val triples = spark.read.parquet(s"$out/triples").count()
    assert(triples == 8 * (11 + 11 + 11 + 10 + 10 + 9 + 6 + 10))
  }

  test("a re-run bucket whose input became empty drops its stale partitions") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where("doc_id < 64")
    val pages = SynthPages.fromDocuments(docs)
    val out = freshDir("kgjob_stale")
    KgJob.run(spark, pages, out, buckets = 8)
    // pick a bucket that actually has triples, uncommit it, and re-run with
    // that bucket's subjects REMOVED from the input (e.g. the source purged
    // them between attempts)
    val b = spark.read.parquet(s"$out/triples")
      .select("bucket").distinct().collect().map(_.getInt(0)).min
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(out, "_manifest", s"bucket_$b"))
    val purged = graft.spark.KgEngine.resumeFilter(pages, Seq(b), 8)
    KgJob.run(spark, purged, out, buckets = 8)
    assert(KgJob.committedBuckets(out).size == 8)
    // dynamic overwrite alone would have kept the crashed attempt's files;
    // the explicit cleanup must have removed every table's stale partition
    for (table <- Seq("triples", "edges", "nodes", "lineage", "metrics"))
      assert(!new java.io.File(s"$out/$table/bucket=$b").exists(),
        s"stale $table partition for bucket=$b survived")
    // and the remaining data is intact (no other bucket was touched)
    val remaining = spark.read.parquet(s"$out/triples")
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    assert(!remaining.contains(b) && remaining.nonEmpty)
  }

  test("streaming variant produces the same triples as batch") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where("doc_id < 48")
    val pages = SynthPages.fromDocuments(docs)
    val in = freshDir("kgstream_in")
    val outDir = freshDir("kgstream_out")
    val ckpt = freshDir("kgstream_ckpt")
    // the streaming contract (KgStreaming doc): a subject's pages co-arrive
    // within a capture — deliver them co-located, as a crawl stream would
    pages.repartition(4, org.apache.spark.sql.functions.expr(
        "substring_index(url, '/', 4)"))
      .write.mode("overwrite").parquet(in)

    val schema = spark.read.parquet(in).schema
    val q = KgStreaming.start(spark, in, outDir, ckpt, schema)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .select("subj", "pred", "obj").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val batch = graft.spark.KgEngine.extractCanonical(spark, pages).toDF()
      .select("subj", "pred", "obj").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(streamed == batch)
    assert(streamed.size == 6 * (11 + 11 + 11 + 10 + 10 + 9 + 6 + 10))

    // --- recrawl: a later capture re-delivers proj0's README with new text.
    // The checkpoint resumes (only the new file is processed), the new
    // observations append, and compaction keeps: the recrawled Description
    // (equal certainty -> newest batch wins) but the original manifest-
    // derived facts (higher certainty than the recrawl's path-Name).
    import spark.implicits._
    Seq(("https://replay.invalid/proj0/README", "recrawled body"))
      .toDF("url", "text")
      .withColumn("warc_ts", org.apache.spark.sql.functions
        .to_timestamp(org.apache.spark.sql.functions.lit("2026-08-01 00:00:00")))
      .withColumn("html", org.apache.spark.sql.functions.col("text").cast("binary"))
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .select("url", "warc_ts", "html", "text", "lang")
      .write.mode("append").parquet(in)
    val q2 = KgStreaming.start(spark, in, outDir, ckpt, schema)
    q2.awaitTermination(120000)

    val compacted = KgStreaming.compactLog(spark, outDir)
      .where("subj = 'https://replay.invalid/proj0/'")
      .collect().map(r => r.getString(1) -> (r.getString(2), r.getInt(4))).toMap
    assert(compacted("Description")._1 == "recrawled body\n") // newest batch won the tie
    assert(compacted("Name") == ("proj0", 3))                 // manifest certainty retained
    // one row per (subj, pred) after compaction
    val dupes = KgStreaming.compactLog(spark, outDir)
      .groupBy("subj", "pred").count().where("count > 1").count()
    assert(dupes == 0)
  }

  test("streaming enrichment log compacts to the one-shot enrichAll result") {
    import spark.implicits._
    import org.apache.spark.sql.{functions => F}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where("doc_id < 48")
    val pages = SynthPages.fromDocuments(docs)
    val canonDir = freshDir("enrich_canon")
    val regDir = freshDir("enrich_reg")
    val logDir = freshDir("enrich_log")
    val ckpt = freshDir("enrich_ckpt")
    graft.spark.KgEngine.extractCanonical(spark, pages).toDF()
      .write.mode("overwrite").parquet(canonDir)

    // the registry arrives in two microbatches (disjoint subject halves);
    // maxFilesPerTrigger=1 forces one batch per file
    def regRows(lo: Int, hi: Int) = docs
      .where(F.col("doc_id") >= lo && F.col("doc_id") < hi)
      .select(
        F.concat(F.lit("https://replay.invalid/proj"), F.col("doc_id"), F.lit("/")).as("subj"),
        F.lit("Version").as("pred"), F.lit("9.9.9").as("obj"),
        F.lit("").as("obj_json"))
    regRows(0, 24).coalesce(1).write.mode("append").parquet(regDir)
    regRows(24, 48).coalesce(1).write.mode("append").parquet(regDir)

    val q = KgStreaming.enrichLogStream(spark, canonDir, regDir, logDir, ckpt,
      supportedFields = Seq("Version"), maxCertainty = 1)
    q.awaitTermination(120000)

    val compacted = KgStreaming.compactEnrichment(spark, canonDir, logDir)
      .collect().map(t => (t.subj, t.pred, t.obj, t.certainty)).toSet
    val emptyFetched = docs.where(F.lit(false)).select(
      F.lit("").as("url"), F.lit("").as("html"))
    val emptyProbes = docs.where(F.lit(false)).select(
      F.lit("").as("url"), F.lit("").as("status"), F.lit("").as("canonical_url"))
    val oneShot = graft.spark.KgEngine.enrichAll(
        spark.read.parquet(canonDir).as[graft.spark.Model.CanonTriple],
        regRows(0, 48).drop("obj_json"),
        supportedFields = Seq("Version"), maxCertainty = 1,
        fetched = emptyFetched, probes = emptyProbes)
      .collect().map(t => (t.subj, t.pred, t.obj, t.certainty)).toSet
    assert(compacted == oneShot)
    // the gate held: only the version-less cabal flavor gained the registry
    // value, and the stream saw it arrive incrementally
    val gained = compacted.collect {
      case (s, "Version", "9.9.9", c) => (s, c)
    }
    assert(gained.nonEmpty && gained.forall(_._2 == 1))
    assert(gained.size == (0 until 48).count(_ % 8 == 5))
  }
}
