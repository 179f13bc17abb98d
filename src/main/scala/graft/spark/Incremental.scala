package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}

import graft.pipeline.Summarize
import Model.CanonTriple

/** Incremental KG maintenance — the delta-crawl path a 100 TB deployment
  * actually runs. The reference is a per-project CLI that recomputes one
  * checkout per invocation (/root/reference/src/lib.rs:3871-3920); at crawl
  * scale a weekly recrawl re-delivers every page but only ~1% CHANGE, and
  * re-extracting the other 99% is the dominant (and avoidable) CPU cost.
  *
  * State = two subj-bucketed tables (BucketedStore):
  *   - `captures(subj, relpath, ts, md5, text, changed)` — the winning
  *     capture per (subj, relpath) under the engine's duplicate-capture
  *     rule (max (warc_ts, md5(content)); KgEngine.dedupCaptures). This IS
  *     the extraction input: canonical triples are a pure per-subject
  *     function of it, so it is the exact state needed for incremental
  *     equivalence. `changed` records whether the LAST batch replaced the
  *     row's content (batch lineage; every row starts true on init).
  *   - `triples(subj, pred, obj, obj_json, certainty, origin)` — the
  *     canonical output for those captures.
  *
  * A delta batch folds in with:
  *   1. delta pages → per-(subj, relpath) winners (`captureWinners`, one
  *      delta-sized aggregate);
  *   2. ONE full-outer merge join against the capture store on
  *      (subj, relpath). The store side is bucketed by subj, whose
  *      HashPartitioning satisfies the (subj, relpath) clustering, so the
  *      join shuffles ONLY the delta (plan-asserted in IncrementalSpec) —
  *      at 100 TB the store is read, never reshuffled;
  *   3. a delta row replaces the stored winner iff the store has no row or
  *      (ts, md5) orders above it — the same total order dedupCaptures
  *      applies within a batch, so fold order is unobservable;
  *   4. subjects with at least one CONTENT change (new relpath or new md5;
  *      a newer capture with identical bytes refreshes ts without marking
  *      the subject) re-extract from their merged capture set — work
  *      proportional to the churn, not the corpus. Everything else passes
  *      its stored triples through untouched via a changed-subject
  *      anti-join.
  *
  * The result is provably the full rebuild: merged winners == the winners
  * of (all pages ever seen), extraction is per-subject pure, and untouched
  * subjects' winners are untouched. `kg_incremental` pins that equivalence
  * against the same DuckDB oracle as `kg_canonical`.
  */
object Incremental {

  /** The winning capture per (subj, relpath) of one batch — the relational
    * twin of `KgEngine.dedupCaptures` (max_by over (warc_ts, md5(content));
    * lexicographic struct order == the fold's ts-then-hash rule). Columnar
    * end to end: candidates filter before the aggregate, page bodies hash
    * map-side, and partial aggregation collapses recrawl floods before the
    * exchange.
    */
  def captureWinners(spark: SparkSession, pages: DataFrame): DataFrame = {
    import spark.implicits._
    KgEngine.candidateRows(spark, pages)
      .toDF("subj", "relpath", "ts", "text")
      .withColumn("md5", F.md5(F.col("text")))
      .groupBy("subj", "relpath")
      .agg(F.max_by(
        F.struct(F.col("ts"), F.col("md5"), F.col("text")),
        F.struct(F.col("ts"), F.col("md5"))).as("w"))
      .select(
        F.col("subj"), F.col("relpath"),
        F.col("w.ts").as("ts"), F.col("w.md5").as("md5"),
        F.col("w.text").as("text"))
  }

  /** Canonical triples from a winners table — `KgEngine.extractCanonical`
    * with the duplicate-capture pick already done (winners hold exactly one
    * row per (subj, relpath), so the group pass is a straight fill).
    * Identical output to extractCanonical over the originating pages
    * (asserted on every golden fixture corpus in IncrementalSpec).
    */
  def extractFromCaptures(captures: DataFrame): Dataset[CanonTriple] = {
    val spark = captures.sparkSession
    import spark.implicits._
    captures.select("subj", "relpath", "text")
      .as[(String, String, String)]
      .groupByKey(_._1)
      .flatMapGroups { (subj, it) =>
        val files = it.map { case (_, relpath, text) => relpath -> text }.toMap
        val (metadata, _) = Summarize.summarize(files, KgEngine.subjBasename(subj))
        metadata.iterator.map(KgEngine.datumToTriple(subj))
      }
  }

  /** Merge a delta's winners into the capture store: the ONE join of the
    * incremental path. Output schema = store schema + `changed` (this
    * batch replaced the row's content). Join keys (subj, relpath) are
    * satisfied by the store's HashPartitioning(subj) — only `deltaWinners`
    * shuffles.
    */
  def mergeCaptures(storeCaptures: DataFrame, deltaWinners: DataFrame): DataFrame = {
    val s = storeCaptures.select(
      F.col("subj"), F.col("relpath"),
      F.col("ts").as("s_ts"), F.col("md5").as("s_md5"), F.col("text").as("s_text"))
    val d = deltaWinners.select(
      F.col("subj"), F.col("relpath"),
      F.col("ts").as("d_ts"), F.col("md5").as("d_md5"), F.col("text").as("d_text"))
    // the delta capture replaces the stored winner iff the store has none
    // or the delta orders strictly above it under (ts, md5) — the same
    // total order dedupCaptures uses, so merge(merge(a,b),c) == winners(a∪b∪c)
    val replaces = F.col("s_ts").isNull ||
      (F.col("d_ts").isNotNull &&
        F.struct(F.col("d_ts"), F.col("d_md5")) >
          F.struct(F.col("s_ts"), F.col("s_md5")))
    s.join(d, Seq("subj", "relpath"), "full_outer")
      .select(
        F.col("subj"), F.col("relpath"),
        F.when(replaces, F.col("d_ts")).otherwise(F.col("s_ts")).as("ts"),
        F.when(replaces, F.col("d_md5")).otherwise(F.col("s_md5")).as("md5"),
        F.when(replaces, F.col("d_text")).otherwise(F.col("s_text")).as("text"),
        // a newer capture with IDENTICAL bytes refreshes ts but is not a
        // content change — the subject must not re-extract for it
        (replaces && (F.col("s_md5").isNull || F.col("d_md5") =!= F.col("s_md5")))
          .as("changed"))
  }

  /** Initialize the store pair from a first crawl batch and publish both
    * tables subj-bucketed. Triples derive from the SAME winners table that
    * is stored, so the pair cannot be inconsistent by construction.
    */
  def initStore(
      spark: SparkSession, pages: DataFrame,
      capturesTable: String, triplesTable: String,
      path: String, buckets: Int = KgJob.DefaultBuckets): Unit = {
    val winners = captureWinners(spark, pages)
      .withColumn("changed", F.lit(true))
    BucketedStore.publishBySubj(winners, capturesTable, s"$path/captures", buckets)
    val caps = BucketedStore.read(spark, capturesTable)
    BucketedStore.publishBySubj(
      extractFromCaptures(caps).toDF(), triplesTable, s"$path/triples", buckets)
  }

  /** Fold one delta batch into the store pair EAGERLY: merge-and-publish the
    * new capture table first — re-reading it makes the re-extraction branch
    * consume the bucketed scan instead of recomputing the merge join per
    * downstream branch — then re-extract ONLY changed subjects and publish
    * the new triple table as stored-passthrough ∪ re-extraction. Returns the
    * new triple table's bucketed scan.
    *
    * Eager mode rewrites O(store) per batch — the rebuild's cost class.
    * With the store sized right (buckets ≥ shuffle partitions, one file
    * per bucket — see BucketedStore) IncrementalBench measures it modestly
    * ahead of a full rebuild (9.98 vs 11.80 s at 1.19M pages / 1% churn:
    * extraction is churn-only but both tables still rewrite); per-batch
    * production maintenance should use `appendDelta` + `currentTriples`
    * (O(churn), 2.9-5.5× vs the rebuild) with `compact` on a slow cadence.
    * This eager form is the one-shot/compaction-grade fold.
    *
    * The changed-subject set is delta-bounded; its semi/anti joins are left
    * to Catalyst/AQE (broadcast when small — the 1%-churn common case —
    * shuffle-hash when a delta is genuinely huge), same policy as the
    * probe-table guard in `KgEngine.applyUrlProbes`.
    */
  def updateStore(
      spark: SparkSession, deltaPages: DataFrame,
      capturesTable: String, triplesTable: String,
      path: String, buckets: Int = KgJob.DefaultBuckets): DataFrame = {
    val storeCaps = BucketedStore.read(spark, capturesTable)
    val storeTriples = BucketedStore.read(spark, triplesTable)
    // the new tables publish under *_next names/paths (snapshot rotation,
    // not in-place overwrite): the lazy passthrough plan still reads the
    // CURRENT triple table while the new one writes, so a killed batch
    // leaves the current snapshot intact — same crash story as KgJob's
    // bucket manifest
    val merged = mergeCaptures(storeCaps, captureWinners(spark, deltaPages))
    val nextCaps = s"${capturesTable}_next"
    BucketedStore.publishBySubj(merged, nextCaps, s"$path/captures_next", buckets)
    val caps2 = BucketedStore.read(spark, nextCaps)

    val changedSubjects = caps2.where(F.col("changed")).select("subj").distinct()
    val reextracted = extractFromCaptures(
      caps2.join(changedSubjects, Seq("subj"), "left_semi"))
    val passthrough = storeTriples.join(changedSubjects, Seq("subj"), "left_anti")
    val nextTriples = s"${triplesTable}_next"
    BucketedStore.publishBySubj(
      passthrough.unionByName(reextracted.toDF()), nextTriples,
      s"$path/triples_next", buckets)
    BucketedStore.read(spark, nextTriples)
  }

  // ---------- merge-on-read delta log (the per-batch O(churn) path) ----------
  //
  // `updateStore` rewrites both stores per batch — correct, but measurement
  // (IncrementalBench) shows the rewrite I/O swamps the extraction savings
  // when churn is low: the thing incremental maintenance must NOT do per
  // batch is touch O(store). The log mode is the LSM answer: a batch
  // APPENDS (a) the capture rows that replaced a current winner and (b) the
  // re-extracted triples of content-changed subjects, each under
  // `<log>/batch=N` (per-batch directory overwrite → idempotent retry, the
  // same crash story as KgJob's bucket commit). The current graph is a VIEW:
  // base rows whose key never appears in the log, plus the latest-batch log
  // rows — base tables are scanned, never rewritten or shuffled
  // (broadcast anti-joins against the small log; plan-asserted). `compact`
  // folds the log back into fresh bucketed base tables at the caller's
  // cadence, amortizing the O(store) rewrite over many batches.

  /** Marker predicate for a changed subject whose re-extraction produced no
    * triples: without it the subject's latest batch would be invisible to
    * `currentTriples` and its STALE base rows would resurrect. Same
    * space-prefixed convention as `KgEngine.StatsPred`.
    */
  val TombstonePred: String = " tomb"

  private def clogSchema = "subj string, relpath string, ts long, md5 string, " +
    "text string, changed boolean"
  private def tlogSchema = "subj string, pred string, obj string, " +
    "obj_json string, certainty int, origin string"

  /** Create empty logs (one empty batch=0 directory each) so log reads never
    * face a missing path. TRUNCATES first: a per-batch overwrite only
    * replaces its own directory, so initializing on top of an old log would
    * otherwise leave stale batch=N directories visible to the view.
    */
  def initLogs(spark: SparkSession, clogPath: String, tlogPath: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    Seq(clogPath, tlogPath).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val fs = hp.getFileSystem(conf)
      if (fs.exists(hp)) fs.delete(hp, true)
    }
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(clogSchema))
      .write.mode("overwrite").parquet(s"$clogPath/batch=0")
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(tlogSchema))
      .write.mode("overwrite").parquet(s"$tlogPath/batch=0")
  }

  /** Read a log; `batch` materializes from the partition directories. */
  def readLog(spark: SparkSession, logPath: String): DataFrame =
    spark.read.parquet(logPath)

  /** The latest logged capture per (subj, relpath) — by construction each
    * logged row replaced the then-current winner, so the latest batch's row
    * IS the key's current winner whenever the key is logged at all.
    */
  private def latestLogCaptures(clog: DataFrame): DataFrame =
    clog.groupBy("subj", "relpath")
      .agg(F.max_by(
        F.struct(F.col("ts"), F.col("md5"), F.col("text")), F.col("batch")).as("w"))
      .select(F.col("subj"), F.col("relpath"),
        F.col("w.ts").as("ts"), F.col("w.md5").as("md5"), F.col("w.text").as("text"))

  /** Current winning captures = base ⊕ log. The base side is a pure scan:
    * the log's key set broadcasts into an anti-join above it.
    */
  def currentCaptures(baseCaptures: DataFrame, clog: DataFrame): DataFrame =
    baseCaptures.select("subj", "relpath", "ts", "md5", "text")
      .join(clog.select("subj", "relpath").distinct(),
        Seq("subj", "relpath"), "left_anti")
      .unionByName(latestLogCaptures(clog))

  /** Current canonical triples = base ⊕ log. A subject appearing in the
    * triple log is served ONLY by its latest batch (a re-extraction replaces
    * the subject's whole row set — predicates may disappear); all other
    * subjects read from base untouched.
    */
  def currentTriples(baseTriples: DataFrame, tlog: DataFrame): DataFrame = {
    val latestBatch = tlog.groupBy(F.col("subj").as("ls")).agg(F.max("batch").as("lb"))
    val latest = tlog
      .join(latestBatch,
        F.col("subj") === F.col("ls") && F.col("batch") === F.col("lb"))
      .select("subj", "pred", "obj", "obj_json", "certainty", "origin")
      .where(F.col("pred") =!= TombstonePred)
    baseTriples
      .join(tlog.select("subj").distinct(), Seq("subj"), "left_anti")
      .unionByName(latest)
  }

  /** Append one delta batch to the logs — per-batch cost O(churn):
    *   1. delta winners look up their current stored winner with TWO
    *      delta-anchored joins (base captures: bucketed scan, no store-side
    *      exchange; capture log: broadcast) — never the unioned view, whose
    *      union would break the store's partitioning;
    *   2. rows ordering above the current winner under (ts, md5) append to
    *      the capture log (content changes flagged, ts refreshes logged
    *      unflagged — future merges must see them);
    *   3. content-changed subjects re-extract from their CURRENT merged
    *      capture set (base semi-join + log semi-join + this batch's rows,
    *      per-key argmax) and append to the triple log, with a tombstone row
    *      per changed subject so an extraction that yields nothing still
    *      shadows the subject's base rows.
    *
    * Base tables are only scanned. The batch id must exceed all previous
    * ones (the caller's crawl counter); re-running a failed batch with the
    * same id overwrites its own directories and nothing else.
    */
  def appendDelta(
      spark: SparkSession, deltaPages: DataFrame,
      capturesTable: String, clogPath: String, tlogPath: String,
      batch: Int): Unit = {
    require(batch > 0, "batch 0 is the empty init batch")
    val baseCaps = BucketedStore.read(spark, capturesTable)
    // STRICTLY earlier batches only: a crashed batch leaves its own
    // directories behind, and a retry that read its own half-written rows
    // would see the delta as already-current, overwrite batch=N as empty,
    // and lose the batch. Filtering to batch < N makes the retry recompute
    // the identical rows no matter what the failed attempt persisted.
    val clog = readLog(spark, clogPath).where(F.col("batch") < batch)
    replacingRows(baseCaps, clog, captureWinners(spark, deltaPages))
      .write.mode("overwrite").parquet(s"$clogPath/batch=$batch")

    val clog2 = readLog(spark, clogPath) // now includes this batch
      .where(F.col("batch") <= batch)    // and never anything later
    val changedSubjs = clog2
      .where(F.col("batch") === batch && F.col("changed"))
      .select("subj").distinct()
    val changedCaps = currentCaptures(baseCaps, clog2)
      .join(changedSubjs, Seq("subj"), "left_semi")
    val triples = extractFromCaptures(changedCaps).toDF()
    val tombstones = changedSubjs.select(
      F.col("subj"), F.lit(TombstonePred).as("pred"), F.lit("").as("obj"),
      F.lit("").as("obj_json"), F.lit(-1).as("certainty"), F.lit("").as("origin"))
    triples.unionByName(tombstones)
      .write.mode("overwrite").parquet(s"$tlogPath/batch=$batch")
  }

  /** The delta winners that replace the CURRENT winner of their key — the
    * batch's capture-log rows. Two delta-anchored lookups, not one against
    * the unioned view: the base join consumes the bucketed scan directly
    * (no store-side exchange, plan-asserted) and the log join broadcasts.
    */
  private[graft] def replacingRows(
      baseCaps: DataFrame, clog: DataFrame, dw: DataFrame): DataFrame = {
    val b = baseCaps.select(F.col("subj"), F.col("relpath"),
      F.col("ts").as("b_ts"), F.col("md5").as("b_md5"))
    val l = latestLogCaptures(clog).select(F.col("subj"), F.col("relpath"),
      F.col("ts").as("l_ts"), F.col("md5").as("l_md5"))
    val cur = dw.join(b, Seq("subj", "relpath"), "left_outer")
      .join(l, Seq("subj", "relpath"), "left_outer")
      // the log row, when present, IS the current winner (each logged row
      // replaced the then-current one, so log entries are monotone)
      .withColumn("c_ts", F.coalesce(F.col("l_ts"), F.col("b_ts")))
      .withColumn("c_md5", F.coalesce(F.col("l_md5"), F.col("b_md5")))
    val replaces = F.col("c_ts").isNull ||
      F.struct(F.col("ts"), F.col("md5")) > F.struct(F.col("c_ts"), F.col("c_md5"))
    cur.where(replaces)
      .select(F.col("subj"), F.col("relpath"), F.col("ts"), F.col("md5"),
        F.col("text"),
        (F.col("c_md5").isNull || F.col("md5") =!= F.col("c_md5")).as("changed"))
  }

  /** Per-batch maintenance lineage from the logs alone (no base scan):
    * (batch, replaced_captures, changed_captures, changed_subjects,
    * appended_triples) — the observability row a production batch reports
    * next to KgJob's bucket lineage. Tombstones don't count as triples;
    * batch 0 (the empty init marker) is excluded.
    */
  def batchStats(clog: DataFrame, tlog: DataFrame): DataFrame = {
    val caps = clog.where(F.col("batch") > 0).groupBy("batch").agg(
      F.count(F.lit(1)).as("replaced_captures"),
      F.count_if(F.col("changed")).as("changed_captures"))
    val tris = tlog.where(F.col("batch") > 0).groupBy("batch").agg(
      F.count_if(F.col("pred") === TombstonePred).as("changed_subjects"),
      F.count_if(F.col("pred") =!= TombstonePred).as("appended_triples"))
    caps.join(tris, Seq("batch"), "full_outer").na.fill(0)
  }

  /** Fold the logs into fresh bucketed base tables (published under the
    * given names) and re-initialize the logs — the amortized O(store) pass.
    */
  def compact(
      spark: SparkSession,
      capturesTable: String, triplesTable: String,
      clogPath: String, tlogPath: String,
      outCapturesTable: String, outTriplesTable: String, outPath: String,
      buckets: Int = KgJob.DefaultBuckets): Unit = {
    val caps = currentCaptures(BucketedStore.read(spark, capturesTable),
      readLog(spark, clogPath)).withColumn("changed", F.lit(false))
    BucketedStore.publishBySubj(caps, outCapturesTable,
      s"$outPath/captures", buckets)
    val tri = currentTriples(BucketedStore.read(spark, triplesTable),
      readLog(spark, tlogPath))
    BucketedStore.publishBySubj(tri, outTriplesTable, s"$outPath/triples", buckets)
    initLogs(spark, s"$outPath/clog", s"$outPath/tlog")
  }
}
