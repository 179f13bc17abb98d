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

  private lazy val spark: SparkSession = {
    // stale stores/logs from an earlier run would leak into this one
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File("/tmp/graft_inc_spec"))
    // in the full-suite JVM getOrCreate returns another suite's session, so
    // every conf this spec depends on is (re)set per test scope, not here
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse_spec_inc")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Plan-shape scope: AQE off, broadcast off (forces the real SMJ paths on
    * this tiny corpus), subset co-partitioning on (the production setting —
    * Verify/Bench sessions set it; the shared suite JVM may not have).
    */
  private def withStablePlans[A](body: => A): A = {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevCp = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try body
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", prevCp)
    }
  }

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

  test("log mode: two appended batches ⊕ base == full rebuild (incl. a re-changed subject)") {
    val root = "/tmp/graft_inc_spec/log1"
    Incremental.initStore(spark, basePages, "lg_caps", "lg_tri", root, buckets = 8)
    Incremental.initLogs(spark, s"$root/clog", s"$root/tlog")
    // batch 1: today's delta (new %10==0 subjects, changed %10==5, stale
    // %10==1 recaptures) PLUS a NEWER corrupted version of %10==7 (negative
    // days = a capture 2 days ahead of base) — it must replace and
    // re-extract to garbage triples in this batch
    val batch1 = deltaPages.unionByName(
      corrupt(live.where(docMod(10) === 7), days = -2))
    Incremental.appendDelta(spark, batch1, "lg_caps",
      s"$root/clog", s"$root/tlog", batch = 1)
    // batch 2: %10==7 re-changes to the live content (3 days ahead, beating
    // batch 1's +2d) — the latest batch's re-extraction must win the view
    val batch2 = live.where(docMod(10) === 7)
      .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 3 DAYS"))
    Incremental.appendDelta(spark, batch2, "lg_caps",
      s"$root/clog", s"$root/tlog", batch = 2)

    val view = Incremental.currentTriples(
      BucketedStore.read(spark, "lg_tri"),
      Incremental.readLog(spark, s"$root/tlog"))
    assertSame(view,
      KgEngine.extractCanonical(spark,
        basePages.unionByName(batch1).unionByName(batch2)).toDF(),
      "base ⊕ log view must equal the full rebuild over all batches")
    // %10==7 really did change TWICE: both batches logged triples for it
    val tlog = Incremental.readLog(spark, s"$root/tlog")
    val m7batches = tlog.where(subjMod(10) === 7).select("batch").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(m7batches == Set(1, 2),
      s"the re-changed subject must re-extract in BOTH batches, got $m7batches")
    // and the capture view equals the winners of everything ever crawled
    val capView = Incremental.currentCaptures(
      BucketedStore.read(spark, "lg_caps"),
      Incremental.readLog(spark, s"$root/clog"))
    val allWinners = Incremental.captureWinners(spark,
      basePages.unionByName(batch1).unionByName(batch2))
    assert(capView.select("subj", "relpath", "ts", "md5")
      .except(allWinners.select("subj", "relpath", "ts", "md5")).isEmpty &&
      capView.count() == allWinners.count(),
      "capture view must equal the one-shot winners")

    // compaction folds the logs into fresh bucketed tables; the view of the
    // compacted state (with its fresh empty logs) is unchanged
    Incremental.compact(spark, "lg_caps", "lg_tri",
      s"$root/clog", s"$root/tlog", "lg_caps_c", "lg_tri_c", s"$root/c")
    assertSame(
      Incremental.currentTriples(
        BucketedStore.read(spark, "lg_tri_c"),
        Incremental.readLog(spark, s"$root/c/tlog")),
      view, "compaction must not change the view")
    // and a further batch appends against the compacted base
    Incremental.appendDelta(spark,
      corrupt(live.where(docMod(10) === 3), days = -3), // NEWER corrupt content
      "lg_caps_c", s"$root/c/clog", s"$root/c/tlog", batch = 1)
    val after = Incremental.currentTriples(
      BucketedStore.read(spark, "lg_tri_c"),
      Incremental.readLog(spark, s"$root/c/tlog"))
    assertSame(after,
      KgEngine.extractCanonical(spark,
        basePages.unionByName(batch1).unionByName(batch2)
          .unionByName(corrupt(live.where(docMod(10) === 3), days = -3))).toDF(),
      "post-compaction appends must keep matching the full rebuild")
  }

  test("merging is associative: sequential folds == one-shot winners") {
    // three crawl generations of the same corpus with distinct (ts, text)
    val gen1 = corrupt(live, days = 14)
    val gen2 = corrupt(live, days = 7).where(docMod(3) =!= 0) // partial recrawl
    val gen3 = live.where(docMod(2) === 0)                    // another partial
    val all = gen1.unionByName(gen2).unionByName(gen3)
    val sequential = Incremental.mergeCaptures(
      Incremental.mergeCaptures(
        Incremental.captureWinners(spark, gen1),
        Incremental.captureWinners(spark, gen2)).drop("changed"),
      Incremental.captureWinners(spark, gen3)).drop("changed")
    val oneShot = Incremental.captureWinners(spark, all)
    val k = Seq("subj", "relpath", "ts", "md5")
    assert(sequential.select(k.map(F.col): _*)
      .except(oneShot.select(k.map(F.col): _*)).isEmpty &&
      sequential.count() == oneShot.count(),
      "fold order must be unobservable")
  }

  test("log mode: re-running a failed batch with the same id is lossless") {
    val root = "/tmp/graft_inc_spec/retry"
    Incremental.initStore(spark, basePages, "rt_caps", "rt_tri", root, buckets = 8)
    Incremental.initLogs(spark, s"$root/clog", s"$root/tlog")
    Incremental.appendDelta(spark, deltaPages, "rt_caps",
      s"$root/clog", s"$root/tlog", batch = 1)
    val expected = Incremental.currentTriples(
      BucketedStore.read(spark, "rt_tri"),
      Incremental.readLog(spark, s"$root/tlog")).collect().toSet

    // crash scenario A: batch 1 fully written, the driver dies before
    // acknowledging — the retry must overwrite batch=1 with IDENTICAL rows
    // (a naive retry would read its own rows as already-current and write
    // an empty batch, losing the delta)
    Incremental.appendDelta(spark, deltaPages, "rt_caps",
      s"$root/clog", s"$root/tlog", batch = 1)
    assert(Incremental.currentTriples(
      BucketedStore.read(spark, "rt_tri"),
      Incremental.readLog(spark, s"$root/tlog")).collect().toSet == expected,
      "full re-run of the same batch must be a no-op")

    // crash scenario B: the capture log committed but the triple log did not
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(s"$root/tlog/batch=1"))
    Incremental.appendDelta(spark, deltaPages, "rt_caps",
      s"$root/clog", s"$root/tlog", batch = 1)
    assert(Incremental.currentTriples(
      BucketedStore.read(spark, "rt_tri"),
      Incremental.readLog(spark, s"$root/tlog")).collect().toSet == expected,
      "retry after a partial (captures-only) batch must restore the view")
  }

  test("streamed delta ingestion == batch appendDelta == full rebuild") {
    val root = "/tmp/graft_inc_spec/stream"
    Incremental.initStore(spark, basePages, "st_caps", "st_tri", root, buckets = 8)
    Incremental.initLogs(spark, s"$root/clog", s"$root/tlog")
    // the delta crawl arrives as TWO files → two microbatches (1 file each)
    deltaPages.where(docMod(2) === 0).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/in/d0")
    deltaPages.where(docMod(2) === 1).coalesce(1)
      .write.mode("overwrite").parquet(s"$root/in/d1")
    // one flat stream dir of page files
    val in = s"$root/stream_in"
    new java.io.File(in).mkdirs()
    for (d <- Seq("d0", "d1");
         f <- new java.io.File(s"$root/in/$d").listFiles()
           if f.getName.endsWith(".parquet")) {
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(in, s"${d}_${f.getName}").toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val q = graft.spark.KgStreaming.pageDeltaStream(spark, in,
      "st_caps", s"$root/clog", s"$root/tlog", s"$root/ckpt",
      spark.read.parquet(s"$root/in/d0").schema, maxFilesPerTrigger = 1)
    q.awaitTermination()
    // batch 0 is the rowless init marker; both microbatches must have
    // appended their own rows (the delta split puts live captures in each)
    val batches = Incremental.readLog(spark, s"$root/clog")
      .select("batch").distinct().collect().map(_.getInt(0)).toSet
    assert(batches == Set(1, 2),
      s"each microbatch must append under its own id, got $batches")
    assertSame(
      Incremental.currentTriples(
        BucketedStore.read(spark, "st_tri"),
        Incremental.readLog(spark, s"$root/tlog")),
      KgEngine.extractCanonical(spark,
        basePages.unionByName(deltaPages)).toDF(),
      "streamed ingestion must equal the full rebuild")
  }

  test("log mode: a tombstoned subject's base rows do not resurrect") {
    import spark.implicits._
    val baseTri = Seq(
      ("https://replay.invalid/projA/", "Name", "projA", "", 3, "m"),
      ("https://replay.invalid/projB/", "Name", "projB", "", 3, "m"))
      .toDF("subj", "pred", "obj", "obj_json", "certainty", "origin")
    // projA re-extracted to NOTHING in batch 1 → only its tombstone is logged
    val tlog = Seq(
      ("https://replay.invalid/projA/", Incremental.TombstonePred, "", "", -1, "", 1))
      .toDF("subj", "pred", "obj", "obj_json", "certainty", "origin", "batch")
    val view = Incremental.currentTriples(baseTri, tlog)
    assert(view.collect().map(_.getString(0)).toSet ==
      Set("https://replay.invalid/projB/"),
      "projA must be shadowed by its tombstone, projB untouched")
    assert(view.where(F.col("pred") === Incremental.TombstonePred).isEmpty,
      "tombstones never surface in the view")
  }

  private def assertBaseNotShuffled(df: org.apache.spark.sql.DataFrame,
                                    path: String, what: String): Unit = {
    val plan = df.queryExecution.executedPlan
    val underShuffle = plan.collect { case e: ShuffleExchangeExec => e }
      .flatMap(_.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(path)) => s
      })
    assert(underShuffle.isEmpty, s"$what must not shuffle the base side:\n$plan")
  }

  test("log mode: base tables are scanned, never shuffled") {
    val root = "/tmp/graft_inc_spec/log2"
    Incremental.initStore(spark, basePages, "lg2_caps", "lg2_tri", root, buckets = 8)
    Incremental.initLogs(spark, s"$root/clog", s"$root/tlog")
    Incremental.appendDelta(spark, deltaPages, "lg2_caps",
      s"$root/clog", s"$root/tlog", batch = 1)

    // the batch's replacing-rows lookup: with broadcast off the join is
    // forced to sort-merge — the bucketed base scan must anchor it
    withStablePlans {
      assertBaseNotShuffled(
        Incremental.replacingRows(
          BucketedStore.read(spark, "lg2_caps"),
          Incremental.readLog(spark, s"$root/clog"),
          Incremental.captureWinners(spark, deltaPages)),
        "log2/captures", "replacingRows")
    }
    // the read views anti-join the SMALL log key sets — those broadcast
    // (default threshold), leaving the base scan exchange-free
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      assertBaseNotShuffled(
        Incremental.currentTriples(BucketedStore.read(spark, "lg2_tri"),
          Incremental.readLog(spark, s"$root/tlog")),
        "log2/triples", "currentTriples")
      assertBaseNotShuffled(
        Incremental.currentCaptures(BucketedStore.read(spark, "lg2_caps"),
          Incremental.readLog(spark, s"$root/clog")),
        "log2/captures", "currentCaptures")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("the capture-merge join never reshuffles the store side") {
    withStablePlans {
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
    }
  }
}
