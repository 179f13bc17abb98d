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

  /** Fold one delta batch into the store pair (production composition):
    * merge-and-publish the new capture table FIRST — it must be written
    * anyway, and re-reading it makes the re-extraction branch consume the
    * bucketed scan instead of recomputing the merge join per downstream
    * branch — then re-extract ONLY changed subjects and publish the new
    * triple table as stored-passthrough ∪ re-extraction. Returns the new
    * triple table's bucketed scan.
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
}
