package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.spark.{BucketedStore, Incremental, KgEngine, SynthPages}

/** Incremental KG maintenance: fold a delta crawl into the subj-bucketed
  * capture/triple store pair, re-extracting ONLY subjects whose winning
  * captures changed — result provably equal to the full rebuild, with the
  * merge join never reshuffling the store side.
  */
class IncrementalSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse_spec_inc")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").where("doc_id < 60")
  private lazy val live = SynthPages.fromDocuments(docs)

  private def docMod(of: Int): org.apache.spark.sql.Column =
    F.pmod(F.regexp_extract(F.col("url"), "proj(\\d+)/", 1).cast("long"), F.lit(of))

  // the store tables carry subj, not url
  private def subjMod(of: Int): org.apache.spark.sql.Column =
    F.pmod(F.regexp_extract(F.col("subj"), "proj(\\d+)/", 1).cast("long"), F.lit(of))

  /** A corrupted recapture `days` older than the live one. */
  private def corrupt(pages: DataFrame, days: Int): DataFrame = pages
    .withColumn("warc_ts", F.col("warc_ts") - F.expr(s"INTERVAL $days DAYS"))
    .withColumn("text", F.concat(F.col("text"), F.lit("\nSTALE RECRAWL GARBAGE")))

  // base crawl: %10==0 subjects absent entirely; %10==5 present but stale-corrupted
  private lazy val basePages = live.where(docMod(10) =!= 0 && docMod(10) =!= 5)
    .unionByName(corrupt(live.where(docMod(10) === 5), days = 7))
  // delta recrawl: the %10∈{0,5} live pages, plus an even STALER corrupted
  // recapture of %10==1 (a no-op loser) and a ts-refresh of %10==2 with
  // IDENTICAL content (winner ts advances, content does not change)
  private lazy val deltaPages = live.where(docMod(10) === 0 || docMod(10) === 5)
    .unionByName(corrupt(live.where(docMod(10) === 1), days = 14))
    .unionByName(live.where(docMod(10) === 2)
      .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 DAYS")))

  private val key = Seq("subj", "pred", "obj", "obj_json", "certainty", "origin")
  private def canonSet(df: DataFrame): DataFrame = df.select(key.map(F.col): _*)

  private def assertSame(a: DataFrame, b: DataFrame, hint: String): Unit = {
    assert(canonSet(a).except(canonSet(b)).isEmpty &&
           canonSet(b).except(canonSet(a)).isEmpty, hint)
    assert(a.count() == b.count(), s"$hint (row count)")
  }

  test("captureWinners + extractFromCaptures == extractCanonical under recrawl floods") {
    // three captures per page: live, week-older corrupted, exact duplicate —
    // the kg_canonical_dup corpus shape
    val flood = live
      .unionByName(corrupt(live, days = 7))
      .unionByName(live)
    val viaWinners = Incremental.extractFromCaptures(
      Incremental.captureWinners(spark, flood)).toDF()
    assertSame(viaWinners, KgEngine.extractCanonical(spark, flood).toDF(),
      "relational winners must reproduce the fold's duplicate-capture pick")
    assertSame(viaWinners, KgEngine.extractCanonical(spark, live).toDF(),
      "the newest capture must win per (subj, relpath)")
  }

  test("incremental update == full rebuild over everything ever crawled") {
    Incremental.initStore(spark, basePages, "inc_caps", "inc_tri",
      "/tmp/graft_inc_spec/s1", buckets = 8)
    // the stored triples ARE the base-crawl extraction
    assertSame(BucketedStore.read(spark, "inc_tri"),
      KgEngine.extractCanonical(spark, basePages).toDF(),
      "initStore triples == extractCanonical(base)")

    val updated = Incremental.updateStore(spark, deltaPages,
      "inc_caps", "inc_tri", "/tmp/graft_inc_spec/s1", buckets = 8)
    // full rebuild over base ∪ delta — and because every winner converges to
    // the live capture, also == the clean-corpus extraction
    assertSame(updated,
      KgEngine.extractCanonical(spark, basePages.unionByName(deltaPages)).toDF(),
      "incremental must equal the full rebuild")
    assertSame(updated, KgEngine.extractCanonical(spark, live).toDF(),
      "merged winners must converge to the live corpus")
  }

  test("only genuinely changed subjects re-extract; ts refreshes and stale recaptures do not") {
    Incremental.initStore(spark, basePages, "inc_caps2", "inc_tri2",
      "/tmp/graft_inc_spec/s2", buckets = 8)
    Incremental.updateStore(spark, deltaPages,
      "inc_caps2", "inc_tri2", "/tmp/graft_inc_spec/s2", buckets = 8)
    val changed = BucketedStore.read(spark, "inc_caps2_next")
      .where(F.col("changed"))
      .select(subjMod(10).as("m")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(changed == Set(0L, 5L),
      s"changed subjects must be exactly the new (%10==0) and content-changed " +
      s"(%10==5) ones — stale recaptures (1) and same-content ts refreshes (2) " +
      s"must not re-extract; got $changed")
    // the ts refresh IS recorded in the store (a later capture between the
    // two timestamps must keep losing)
    val m2ts = BucketedStore.read(spark, "inc_caps2_next")
      .where(subjMod(10) === 2).agg(F.min("ts"), F.min("changed")).collect()(0)
    val baseTs = BucketedStore.read(spark, "inc_caps2")
      .where(subjMod(10) === 2).agg(F.max("ts")).collect()(0).getLong(0)
    assert(m2ts.getLong(0) == baseTs + 86400L * 1000,
      "a same-content newer capture must refresh the stored winner's ts")
    assert(!m2ts.getBoolean(1), "…without marking the subject changed")
  }

  test("a no-op delta changes nothing and re-extracts nothing") {
    Incremental.initStore(spark, live, "inc_caps3", "inc_tri3",
      "/tmp/graft_inc_spec/s3", buckets = 8)
    val updated = Incremental.updateStore(spark, corrupt(live, days = 30),
      "inc_caps3", "inc_tri3", "/tmp/graft_inc_spec/s3", buckets = 8)
    assert(BucketedStore.read(spark, "inc_caps3_next")
      .where(F.col("changed")).isEmpty, "all-stale delta → zero changed rows")
    assertSame(updated, BucketedStore.read(spark, "inc_tri3"),
      "all-stale delta → triples pass through unchanged")
  }

  test("the capture-merge join never reshuffles the store side") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Incremental.initStore(spark, basePages, "inc_caps4", "inc_tri4",
        "/tmp/graft_inc_spec/s4", buckets = 8)
      val merged = Incremental.mergeCaptures(
        BucketedStore.read(spark, "inc_caps4"),
        Incremental.captureWinners(spark, deltaPages))
      val plan = merged.queryExecution.executedPlan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, "the delta side must still shuffle to the store's buckets")
      val storeScansUnderShuffles = shuffles.flatMap(_.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("s4/captures")) => s
      })
      assert(storeScansUnderShuffles.isEmpty,
        s"the bucketed store must anchor the join — no exchange above its scan:\n$plan")
      // and the bucketed scan IS in the plan (the join really consumes it)
      val storeScans = plan.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("s4/captures")) => s
      }
      assert(storeScans.nonEmpty && storeScans.forall(_.bucketedScan),
        s"store side must be the bucketed scan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
