package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, functions => F}
import graft.core._
import graft.pipeline.Summarize
import Model._

/** The Spark-native knowledge-graph construction engine.
  *
  * Plan shape (scale rationale):
  *
  * {{{
  * pages (url, warc_ts, html, text, lang)           -- 100 TB scan
  *  └─ filter isCandidate(relpath)                  -- narrow; drops the bulk
  *  └─ project (subj, relpath, text)                -- column pruning: html
  *                                                      and non-candidate text
  *                                                      never shuffle
  *  └─ groupByKey(subj) . flatMapGroups(summarize)  -- SHUFFLE #1 (small):
  *        extract → certainty merge → extrapolation  -- fixpoint is per-key
  *        fixpoint → URL fixes                       -- local state, no driver
  *                                                      loop, no re-shuffles
  *  └─ triples / nodes / edges / lineage sinks
  * }}}
  *
  * The one mandatory shuffle carries only candidate metadata/README files
  * (KBs per subject). The per-(subj,pred) canonicalization for already-
  * extracted triple streams is also exposed as a pure Catalyst aggregate
  * (`canonicalize`, max_by over a (certainty, arrival) struct — the lattice
  * argmax of SURVEY §2.4).
  */
object KgEngine {

  /** Mirrors find_guessers' candidate patterns (src/lib.rs:3083-3440): a page
    * participates in extraction iff its relpath matches one of these.
    */
  def isCandidate(relpath: String): Boolean = {
    if (relpath.isEmpty) return false
    val base = relpath.substring(relpath.lastIndexOf('/') + 1)
    val lc = base.toLowerCase
    if (staticNames.contains(relpath)) return true
    if (relpath == "debian/source/format") return true // is_native context
    if (relpath.startsWith("debian/patches/") && relpath.endsWith(".patch")) return true
    if (securityNames.contains(relpath)) return true
    // egg-info / dist-info
    relpath.split('/') match {
      case Array(d, "PKG-INFO") if d.endsWith(".egg-info")  => return true
      case Array(d, "METADATA") if d.endsWith(".dist-info") => return true
      case Array(_, "DESCRIPTION")                          => return true
      case _                                                =>
    }
    if (relpath.contains('/')) return false
    if (base == "setup.py") return true
    if (base.endsWith(".gemspec") || base.endsWith(".doap") ||
        (base.endsWith(".xml") && base.startsWith("doap_XML_")) ||
        base.endsWith(".metainfo.xml") || base.endsWith(".cabal") ||
        base.endsWith(".nuspec") || base.endsWith(".opam")) return true
    if ((lc.startsWith("readme") || lc.startsWith("hacking") ||
         lc.startsWith("contributing")) && !base.endsWith("~")) {
      val dot = base.lastIndexOf('.')
      val ext = if (dot <= 0) "" else base.substring(dot + 1).toLowerCase
      return ext != "html" && ext != "pdf" && ext != "xml"
    }
    false
  }

  private val staticNames: Set[String] = Set(
    "debian/watch", "debian/control", "debian/changelog", "debian/rules",
    "PKG-INFO", "package.json", "composer.json", "package.xml", "package.yaml",
    "dist.ini", "debian/copyright", "META.json", "MYMETA.json", "META.yml",
    "MYMETA.yml", "configure", "DESCRIPTION", "Cargo.toml", "pom.xml",
    ".git/config", "debian/get-orig-source.sh", "pyproject.toml", "setup.cfg",
    "go.mod", "Makefile.PL", "wscript", "AUTHORS", "INSTALL", "pubspec.yaml",
    "pubspec.yml", "meson.build", "metadata.json", ".travis.yml")

  private val securityNames: Set[String] =
    Set("SECURITY.md", ".github/SECURITY.md", "docs/SECURITY.md")

  /** Splits a page url into (subj, relpath): subj = scheme://host/seg1/,
    * relpath = the rest (the replay.invalid convention of FIXTURES.md §1).
    */
  def splitSubject(url: String): Option[(String, String)] = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return None
    val hostStart = schemeEnd + 3
    val hostEnd = url.indexOf('/', hostStart)
    if (hostEnd < 0) return None
    val projEnd = url.indexOf('/', hostEnd + 1)
    if (projEnd < 0) return None
    Some((url.substring(0, projEnd + 1), url.substring(projEnd + 1)))
  }

  private[graft] def subjBasename(subj: String): String = {
    val t = subj.reverse.dropWhile(_ == '/').reverse
    t.substring(t.lastIndexOf('/') + 1)
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString
  }

  /** Narrow pre-shuffle stage shared by the grouped paths: candidate pages
    * as (subj, relpath, warc_ts_millis, text). Only candidates survive, so
    * `html` and the non-candidate bulk never reach the exchange.
    */
  private[spark] def candidateRows(spark: SparkSession, pages: DataFrame)
      : Dataset[(String, String, Long, String)] = {
    import spark.implicits._
    // a null warc_ts (real crawls have captures with missing timestamps) must
    // deterministically LOSE the duplicate-capture pick, not fail the task:
    // coalesce to Long.MinValue before the non-nullable decode
    pages
      .select(F.col("url"),
        F.coalesce(F.unix_millis(F.col("warc_ts")), F.lit(Long.MinValue)),
        F.col("text"))
      .as[(String, Long, String)]
      .flatMap { case (url, ts, text) =>
        if (text == null) None
        else splitSubject(url).filter(sr => isCandidate(sr._2))
          .map { case (s, r) => (s, r, ts, text) }
      }
  }

  /** Deterministic duplicate-capture pick: a real crawl recrawls pages, so
    * one batch can hold several captures of the same (subj, relpath). The
    * winner per relpath is the capture with max (warc_ts, md5(content)) — the
    * newest capture, content-hash tie-broken — independent of shuffle
    * iteration order. The reference never faces this (it reads a checkout),
    * so the rule is this engine's own, applied identically in every variant.
    * The hash is only computed on an actual timestamp collision.
    */
  /** Mutable per-relpath best capture. A small class (not a tuple) so the
    * timestamp stays an unboxed primitive field and the winner updates in
    * place — the boxed (Long, String)-valued map variant measured ~12%
    * extra reduce-stage CPU at 2.4M pages.
    */
  private final class BestCapture(var ts: Long, var text: String) {
    var md5: String = null // computed lazily, only on a timestamp collision
    def md5OrCompute(): String = {
      if (md5 == null) md5 = md5Hex(text)
      md5
    }
  }

  private def dedupCaptures(it: Iterator[(String, String, Long, String)])
      : scala.collection.Map[String, String] = {
    // ONE incremental fold, never materializing the capture stream: task
    // memory is O(distinct files), not O(captures) — a recrawl-heavy
    // subject (one hot project recrawled 10^5×, the exact skew a real crawl
    // has) streams through instead of inflating the group buffer. The
    // no-duplicate common case costs one map fill, same as before the fold.
    val best = new scala.collection.mutable.HashMap[String, BestCapture]()
    it.foreach { case (_, relpath, t, text) =>
      best.get(relpath) match {
        case None => best(relpath) = new BestCapture(t, text)
        case Some(b) =>
          // max (warc_ts, md5(content)) wins, hashes only on a ts collision
          if (t > b.ts) { b.ts = t; b.text = text; b.md5 = null }
          else if (t == b.ts && text != b.text) {
            val h = md5Hex(text)
            if (h > b.md5OrCompute()) { b.text = text; b.md5 = h }
          }
      }
    }
    best.map { case (relpath, b) => (relpath, b.text) }
  }

  /** pages → canonical triples: the flagship KG construction job. */
  def extractCanonical(spark: SparkSession, pages: DataFrame): Dataset[CanonTriple] = {
    import spark.implicits._
    candidateRows(spark, pages)
      .groupByKey(_._1)
      .flatMapGroups { (subj, it) =>
        val files = dedupCaptures(it)
        val (metadata, _) = Summarize.summarize(files, subjBasename(subj))
        metadata.iterator.map { dt =>
          val (obj, objJson) = objForms(dt.value)
          CanonTriple(subj, dt.field, obj, objJson,
            dt.certainty.getOrElse(-1), dt.origin.getOrElse(""))
        }
      }
  }

  /** Marker predicate for per-subject extraction-stats rows (same
    * leading-space convention as the probe carriers — cannot collide with a
    * real field name). obj = provider-error count, obj_json = known-bad drop
    * count, both as decimal strings.
    */
  val StatsPred: String = " stats"

  /** pages → canonical triples + per-subject extraction stats in the SAME
    * single pass: subjects whose extraction produced provider errors (e.g.
    * meson's offline introspection failure) or dropped known-bad datums emit
    * one extra `StatsPred` marker row — the per-subject error channel the
    * reference logs and drops (lib.rs:3905-3913), as data. Clean subjects
    * emit nothing extra, so the common case costs nothing. Split the stream
    * with `splitStats`; KgJob persists it once and feeds both the triples
    * table and the lineage error columns. ALWAYS split before composing
    * with the enrichment operators — the space-prefixed predicate space is
    * reserved for engine markers and enrichment treats such rows as its
    * own (they do not survive the fused check pass).
    */
  def extractCanonicalWithStats(
      spark: SparkSession, pages: DataFrame,
      iterationLimit: Int = Summarize.DefaultIterationLimit): Dataset[CanonTriple] = {
    import spark.implicits._
    candidateRows(spark, pages)
      .groupByKey(_._1)
      .flatMapGroups { (subj, it) =>
        val files = dedupCaptures(it)
        val (metadata, errors, droppedBad) =
          Summarize.summarizeWithStats(files, subjBasename(subj),
            iterationLimit = iterationLimit)
        val triples = metadata.iterator.map { dt =>
          val (obj, objJson) = objForms(dt.value)
          CanonTriple(subj, dt.field, obj, objJson,
            dt.certainty.getOrElse(-1), dt.origin.getOrElse(""))
        }
        if (errors.isEmpty && droppedBad == 0L) triples
        else triples ++ Iterator.single(CanonTriple(
          subj, StatsPred, errors.size.toString, droppedBad.toString, -1, ""))
      }
  }

  /** Splits an `extractCanonicalWithStats` stream into the real triples and
    * a (subj, errors, dropped_bad) stats table.
    */
  def splitStats(all: Dataset[CanonTriple]): (Dataset[CanonTriple], DataFrame) = {
    import all.sparkSession.implicits._
    val df = all.toDF()
    val triples = df.where(F.col("pred") =!= StatsPred).as[CanonTriple]
    val stats = df.where(F.col("pred") === StatsPred)
      .select(F.col("subj"),
        F.col("obj").cast("long").as("errors"),
        F.col("obj_json").cast("long").as("dropped_bad"))
    (triples, stats)
  }

  /** pages → per-subject rendered sink (YAML / codemeta / DOAP) in ONE
    * exchange: the renderer runs inside the extraction group on the true
    * typed datums, so sink jobs never re-shuffle the triples by subject a
    * second time (at crawl scale the render pass would otherwise double the
    * heavy shuffle).
    */
  def extractAndRender(
      spark: SparkSession,
      pages: DataFrame,
      render: List[graft.core.Datum] => String
  ): Dataset[(String, String)] = {
    import spark.implicits._
    candidateRows(spark, pages)
      .groupByKey(_._1)
      .mapGroups { (subj, it) =>
        val files = dedupCaptures(it)
        val (metadata, _) = Summarize.summarize(files, subjBasename(subj))
        (subj, render(metadata))
      }
  }

  /** Two-phase variant: per-row pre-extraction in the narrow stage, so the
    * one shuffle carries extracted datums (~100s of bytes) instead of file
    * bodies — at crawl scale this cuts exchange volume by the README/page
    * size ratio. Only debian artifacts (which need sibling context: watch
    * templating, source/format) ship raw content, and those are tiny.
    * Semantically identical to `extractCanonical` (equivalence-tested on
    * every reference fixture and the synthetic corpus).
    *
    * Tradeoff, measured: on the synthetic corpus (where the README-derived
    * Description datum carries the whole page text) the datum rows are as
    * large as the files and the JSON codec only adds CPU — `grouped` wins
    * (487k vs 374k pages/s at 32 cores). On a real crawl, where a page is
    * 10-100× its extract, this path shrinks the exchange by that factor and
    * becomes the right default. Both stay available and tested.
    */
  def extractCanonicalPreExtract(spark: SparkSession, pages: DataFrame): Dataset[CanonTriple] = {
    import spark.implicits._
    pages
      .select(F.col("url"),
        F.coalesce(F.unix_millis(F.col("warc_ts")), F.lit(Long.MinValue)),
        F.col("text"))
      .as[(String, Long, String)]
      .flatMap { case (url, ts, text) =>
        if (text == null) Iterator.empty
        else splitSubject(url) match {
          case Some((subj, relpath)) if isCandidate(relpath) =>
            // the duplicate-capture winner must match the grouped variant's
            // (max warc_ts, md5 tie-break), so the content hash is computed
            // here — post-shuffle only the extracted datums remain
            val chash = md5Hex(text)
            if (relpath.startsWith("debian/"))
              Iterator.single(ExtractRow(subj, relpath, "x", text, ts, chash))
            else {
              val gs = graft.pipeline.Summarize.fileGuessers(relpath)
              if (gs.isEmpty) Iterator.single(ExtractRow(subj, relpath, "m", "", ts, chash))
              else gs.iterator.map { case (id, fn) =>
                val datums = fn(text).getOrElse(Nil)
                ExtractRow(subj, relpath, s"d:$id", datumsToJson(datums), ts, chash)
              }
            }
          case _ => Iterator.empty
        }
      }
      .groupByKey(_.subj)
      .flatMapGroups { (subj, it) =>
        // incremental winner fold, never materializing the capture stream:
        // per relpath keep the current winning capture key (max ts, then max
        // content hash) and ONLY that capture's rows — a losing capture's
        // rows are dropped as they stream past, so task memory is O(winner
        // rows), not O(captures × guessers)
        val winner = scala.collection.mutable.HashMap
          .empty[String, (Long, String, scala.collection.mutable.ArrayBuffer[ExtractRow])]
        it.foreach { row =>
          winner.get(row.relpath) match {
            case None =>
              winner(row.relpath) =
                (row.ts, row.chash, scala.collection.mutable.ArrayBuffer(row))
            case Some((ts0, h0, buf)) =>
              if (row.ts > ts0 || (row.ts == ts0 && row.chash > h0)) {
                buf.clear(); buf += row
                winner(row.relpath) = (row.ts, row.chash, buf)
              } else if (row.ts == ts0 && row.chash == h0) buf += row
          }
        }
        val deferred = Map.newBuilder[String, String]
        val pre = Map.newBuilder[(String, String), List[graft.core.Datum]]
        val relpaths = Set.newBuilder[String]
        winner.foreach { case (relpath, (_, _, buf)) =>
          relpaths += relpath
          buf.foreach { row =>
            row.kind match {
              case "x" => deferred += (row.relpath -> row.payload)
              case "m" => ()
              case d if d.startsWith("d:") =>
                pre += ((row.relpath, d.stripPrefix("d:")) -> datumsFromJson(row.payload))
              case _ => ()
            }
          }
        }
        val metadata = graft.pipeline.Summarize.assemble(
          deferred.result(), relpaths.result(), pre.result(), subjBasename(subj))
        metadata.iterator.map { dt =>
          val (obj, objJson) = objForms(dt.value)
          CanonTriple(subj, dt.field, obj, objJson,
            dt.certainty.getOrElse(-1), dt.origin.getOrElse(""))
        }
      }
  }

  /** pages → raw (pre-merge) triples: the scan-mode surface. `guesser_rank`
    * and `seq` encode arrival order deterministically so canonicalize() can
    * reproduce first-wins ties without relying on execution order.
    */
  def extractRaw(spark: SparkSession, pages: DataFrame): Dataset[RawTriple] = {
    import spark.implicits._
    candidateRows(spark, pages)
      .groupByKey(_._1)
      .flatMapGroups { (subj, it) =>
        val files = dedupCaptures(it)
        val raw = Summarize.extractRaw(files, subjBasename(subj))
        raw.iterator.zipWithIndex.map { case (dt, i) =>
          val (obj, objJson) = objForms(dt.value)
          RawTriple(subj, dt.field, obj, objJson,
            dt.certainty.getOrElse(-1), dt.origin.getOrElse(""), 0, i)
        }
      }
  }

  /** The certainty-lattice canonicalization as a pure Catalyst aggregate:
    * one row per (subj, pred); highest certainty wins; ties resolve to
    * first arrival (lowest guesser_rank, seq) — max_by over a struct whose
    * ordering is (certainty, -rank, -seq). Map-side partial aggregation and
    * AQE handle skew; no custom Aggregator needed (SURVEY §2.4).
    */
  def canonicalize(raw: Dataset[RawTriple]): DataFrame = {
    raw.groupBy("subj", "pred")
      .agg(F.max_by(
        F.struct("obj", "obj_json", "certainty", "origin"),
        F.struct(
          F.col("certainty"),
          F.negate(F.col("guesser_rank")),
          F.negate(F.col("seq")))).as("best"))
      .select(
        F.col("subj"), F.col("pred"),
        F.col("best.obj").as("obj"),
        F.col("best.obj_json").as("obj_json"),
        F.col("best.certainty").as("certainty"),
        F.col("best.origin").as("origin"))
  }

  /** Graph materialization: URL-typed objects become edges; subjects and URL
    * objects become nodes (SURVEY §1.3). The DataFrame forms take `carry`
    * columns (e.g. the job's bucket) so production jobs share ONE definition
    * of what an edge/node is — the predicate must never fork between the
    * driver-verified queries and KgJob's tables.
    */
  def edgesDf(triples: DataFrame, carry: Seq[String] = Nil): DataFrame =
    triples
      .where(F.col("pred").isin(Fields.urlTyped.toSeq.map(x => x: Any): _*) &&
             F.col("obj").startsWith("http"))
      .select(Seq(
        F.col("subj").as("src"), F.col("pred"),
        F.col("obj").as("dst"), F.col("certainty")) ++ carry.map(F.col): _*)

  def edges(canon: Dataset[CanonTriple]): DataFrame = edgesDf(canon.toDF())

  def nodesDf(e: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val subjects = e.select(
      Seq(F.col("src").as("id"), F.lit("subject").as("kind")) ++ carry.map(F.col): _*)
    val objects = e.select(
      Seq(F.col("dst").as("id"), F.lit("url").as("kind")) ++ carry.map(F.col): _*)
    subjects.unionByName(objects)
      .groupBy((carry :+ "id").map(F.col): _*)
      .agg(F.min("kind").as("kind"))
      .select(Seq(F.col("id"), F.col("kind")) ++ carry.map(F.col): _*)
  }

  def nodes(canon: Dataset[CanonTriple]): DataFrame = nodesDf(edges(canon))

  /** Per-partition lineage row: (partition_id, input_rows, emitted). */
  final case class LineageRow(partition_id: Int, input_rows: Long, emitted: Long)

  def lineage(spark: SparkSession, pages: DataFrame): Dataset[LineageRow] = {
    import spark.implicits._
    pages.select(F.col("url")).as[String].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var n = 0L
      var emitted = 0L
      it.foreach { url =>
        n += 1
        if (splitSubject(url).exists(sr => isCandidate(sr._2))) emitted += 1
      }
      Iterator.single(LineageRow(pid, n, emitted))
    }
  }

  /** Entity linking against a registry that fits in executor memory: a plain
    * broadcast hash join. A broadcast join has no key-based shuffle, so it is
    * skew-immune by construction — no salting needed (or possible).
    */
  def linkEntities(
      mentions: DataFrame,   // (subj, term)
      registry: DataFrame    // (term, entity_id)
  ): DataFrame =
    mentions.join(F.broadcast(registry), Seq("term"), "inner")

  /** Entity linking when the registry is too big to broadcast: a salted
    * SHUFFLE hash join. The registry side is replicated `salt` times, the
    * probe side picks a deterministic salt per row, so a hot term's probe
    * rows spread across `salt` reducers instead of piling onto one. This is
    * the skew pattern that matters at crawl scale, where a handful of terms
    * ("the", a trending entity) dominate the mention stream.
    */
  def linkEntitiesShuffleSalted(
      mentions: DataFrame,   // (subj, term)
      registry: DataFrame,   // (term, entity_id)
      salt: Int = 8
  ): DataFrame = {
    val salted = registry
      .withColumn("salt", F.explode(F.array((0 until salt).map(F.lit): _*)))
      .hint("shuffle_hash")  // keep AQE from downgrading the demo to broadcast
    val probe = mentions
      .withColumn("salt", F.pmod(F.xxhash64(F.col("subj")), F.lit(salt)).cast("int"))
    probe.join(salted, Seq("term", "salt"), "inner")
      .drop("salt")
  }

  /** Fuzzy entity linking: mention terms match registry aliases by character
    * 3-gram Jaccard ≥ threshold. Blocking = the classic entity-resolution
    * gram join (a candidate pair must share at least one 3-gram), so the
    * verify step runs on candidates only — never the term×alias cross
    * product. The registry/gram side broadcasts; for a registry too large to
    * broadcast the same shape runs as a shuffle join on `gram`, and the
    * MinHash banding of TrainingOps.minhashBands slots in as the coarser
    * blocker. All arithmetic is exact (int gram-set sizes, one double
    * division), so the operator is relationally oracle-checkable.
    */
  def linkEntitiesFuzzy(
      terms: DataFrame,     // (term)
      registry: DataFrame,  // (alias, entity_id)
      threshold: Double = 0.5
  ): DataFrame = {
    def grams(col: String) = F.array_distinct(F.expr(
      s"transform(sequence(1, length($col) - 2), i -> substring($col, i, 3))"))
    val t = terms.where(F.length(F.col("term")) >= 3)
      .withColumn("tg", grams("term"))
    val r = registry.where(F.length(F.col("alias")) >= 3)
      .withColumn("ag", grams("alias"))
    val rGrams = r.select(F.col("alias"), F.explode(F.col("ag")).as("gram")).distinct()
    val cand = t.select(F.col("term"), F.explode(F.col("tg")).as("gram"))
      .join(F.broadcast(rGrams), Seq("gram"))
      .select("term", "alias").distinct()
    cand
      .join(t.select("term", "tg"), Seq("term"))
      .join(F.broadcast(r.select("alias", "ag", "entity_id")), Seq("alias"))
      .withColumn("inter", F.size(F.array_intersect(F.col("tg"), F.col("ag"))))
      .withColumn("uni", F.size(F.array_union(F.col("tg"), F.col("ag"))))
      .withColumn("jaccard", F.col("inter").cast("double") / F.col("uni"))
      .where(F.col("jaccard") >= threshold)
      .select("term", "entity_id", "jaccard")
  }

  /** Distributed `extend_from_external_guesser` (src/lib.rs:2299-2324): the
    * per-subject "possible_fields_missing" gate becomes an ANTI-JOIN — the
    * registry's datums are kept only for subjects where some supported field
    * is still absent or below Certain, then merged through the usual lattice
    * (existing data of equal or higher certainty wins, so `maxCertainty`-
    * capped registry rows can only fill gaps). At crawl scale the gate is
    * what keeps the enrichment join proportional to the incomplete subjects
    * rather than the whole graph.
    */
  def enrichFromRegistry(
      canon: Dataset[CanonTriple],
      registry: DataFrame,            // (subj, pred, obj[, obj_json])
      supportedFields: Seq[String],
      maxCertainty: Int
  ): Dataset[CanonTriple] = {
    import canon.sparkSession.implicits._
    val cd = canon.toDF()
    canonicalize(canonAsRaw(cd)
        .unionByName(gatedRegistryRaw(cd, registry, supportedFields, maxCertainty))
        .as[RawTriple])
      .as[CanonTriple]
  }

  /** The completeness gate + registry projection shared by
    * `enrichFromRegistry`, `enrichAll`, and `KgStreaming.enrichLogStream` —
    * ONE definition, so batch and streamed enrichment can never fork
    * semantics: registry rows survive only for subjects where some supported
    * field is still below Certain (the anti-join that keeps the work
    * proportional to the incomplete subjects); structured payloads keep
    * their obj_json when the registry table carries the column.
    */
  private[spark] def gatedRegistryRaw(
      cd: DataFrame,
      registry: DataFrame,
      supportedFields: Seq[String],
      maxCertainty: Int,
      seq: org.apache.spark.sql.Column = F.lit(0)
  ): DataFrame = {
    val fieldList = supportedFields.map(x => x: Any)
    val complete = cd
      .where(F.col("pred").isin(fieldList: _*) &&
             F.col("certainty") === Certainty.Certain)
      .groupBy("subj").agg(F.countDistinct("pred").as("n_certain"))
      .where(F.col("n_certain") === supportedFields.size)
      .select("subj")
    val regJson =
      if (registry.columns.contains("obj_json")) F.col("obj_json")
      else F.lit("")
    registry
      .where(F.col("pred").isin(fieldList: _*))
      .join(complete, Seq("subj"), "left_anti")
      .select(
        F.col("subj"), F.col("pred"), F.col("obj"), regJson.as("obj_json"),
        F.lit(maxCertainty).as("certainty"),
        F.lit("external-registry").as("origin"),
        F.lit(1).as("guesser_rank"), seq.as("seq"))
  }

  /** A provider branch of the extend stage's archive dispatch
    * (/root/reference/src/lib.rs:3555-3650): subjects route to a provider by
    * their OWN Archive field; `projectField` names the payload key;
    * `supportedFields` drive the per-provider `possible_fields_missing`
    * gate; items enter the lattice at the provider's max certainty —
    * `Certainty.Certain` for the ThirdPartyRepository providers
    * (haskell.rs:216, rust.rs:512, php.rs:122), or the Archive datum's own
    * certainty for SourceForge (lib.rs:3567-3576 passes `sf_certainty`).
    */
  final case class ArchiveProvider(
      archive: String,
      projectField: String,
      parserKind: String,
      supportedFields: Seq[String],
      certaintyFromArchive: Boolean)

  val archiveProviders: Seq[ArchiveProvider] = Seq(
    ArchiveProvider("SourceForge", "SourceForge-Project", "sourceforge",
      Seq("Homepage", "Name", "Repository", "Bug-Database"),
      certaintyFromArchive = true),                       // lib.rs:3556-3576
    ArchiveProvider("Hackage", "Hackage-Package", "hackage",
      Seq("Homepage", "Name", "Repository", "Maintainer", "Copyright",
        "License", "Bug-Database"),
      certaintyFromArchive = false),                      // lib.rs:3578-3600
    ArchiveProvider("crates.io", "Cargo-Crate", "crates",
      Seq("Homepage", "Name", "Repository", "Version", "Summary"),
      certaintyFromArchive = false),                      // lib.rs:3602-3626
    ArchiveProvider("Pecl", "Pecl-Package", "pecl",
      Seq("Homepage", "Repository", "Bug-Database"),
      certaintyFromArchive = false))                      // lib.rs:3628-3650

  /** Archive-dispatch registry enrichment — the composed form of the extend
    * stage's provider branches: a payload side table keyed by
    * `(archive, project)` (the natural shape of a crawled registry-API
    * snapshot) routes each subject through `RegistryParsers` BY ITS OWN
    * derived Archive / *-Project fields (e.g. the ones `extendSfArchive`
    * derives), behind each provider's `possible_fields_missing` anti-join
    * gate. Parsed datums enter the one lattice argmax exactly like the
    * subject-keyed registry stream (rank 1, emission-order seq, existing
    * data wins ties), so a payload can only fill gaps below the provider's
    * certainty. SourceForge consults the subject's Name as the subproject
    * filter, exactly like `SourceForge::extend_metadata` (lib.rs:2363-2372).
    *
    * Plan shape: per provider, the keyed-subject side is the tiny
    * Archive-field subset of `canon` (pruned scans of a stored table); the
    * payload join shuffles on (archive, project) — proportional to the
    * incomplete subjects of that provider, never the whole graph. Parsing
    * runs post-join, so only consulted payloads are ever parsed.
    */
  def enrichFromArchive(
      canon: Dataset[CanonTriple],
      payloads: DataFrame              // (archive, project, payload)
  ): Dataset[CanonTriple] = {
    val spark = canon.sparkSession
    import spark.implicits._
    val cd = canon.toDF()
    val names = cd.where(F.col("pred") === "Name")
      .select(F.col("subj"), F.col("obj").as("name"))
    // ONE canon-wide pass feeds every provider's possible_fields_missing
    // gate (lib.rs:2284-2297: consult only while some supported field is
    // absent or below Certain): aggregate each subject's set of
    // union-supported fields held at Certain once; each branch filters
    // ABOVE the (subj) exchange, so the four gate subtrees canonicalize
    // identically and ReuseExchange runs the canon scan + shuffle once
    // (plan-asserted in ArchiveDispatchSpec).
    val unionFields = archiveProviders.flatMap(_.supportedFields).distinct
    val certainSets = cd
      .where(F.col("pred").isin(unionFields.map(x => x: Any): _*) &&
             F.col("certainty") === Certainty.Certain)
      .groupBy("subj").agg(F.collect_set("pred").as("certain_preds"))
    val raws: Seq[DataFrame] = archiveProviders.map { p =>
      val arch = cd
        .where(F.col("pred") === "Archive" && F.col("obj") === p.archive)
        .select(F.col("subj"), F.col("certainty").as("arch_cert"))
      val proj = cd.where(F.col("pred") === p.projectField)
        .select(F.col("subj"), F.col("obj").as("project"))
      val complete = certainSets
        .where(F.size(F.array_intersect(F.col("certain_preds"),
          F.lit(p.supportedFields.toArray))) === p.supportedFields.size)
        .select("subj")
      val keyed = arch.join(proj, Seq("subj"))
        .join(complete, Seq("subj"), "left_anti")
        .join(names, Seq("subj"), "left")
      val prov = p // stable reference for the closure
      keyed
        .join(payloads.where(F.col("archive") === p.archive)
          .select(F.col("project"), F.col("payload")), Seq("project"))
        .select(F.col("subj"), F.col("project"), F.col("name"),
          F.col("arch_cert"), F.col("payload"))
        .as[(String, String, String, Int, String)]
        .flatMap { case (subj, project, name, archCert, payload) =>
          val parsed = prov.parserKind match {
            case "sourceforge" => graft.registry.RegistryParsers
              .parseSfJson(payload, project, Option(name)).getOrElse(Nil)
            case kind => graft.registry.RegistryParsers
              .parse(kind, payload).getOrElse(Nil)
          }
          // extend_from_external_guesser overrides each item's certainty
          // with the provider cap (lib.rs:2314-2321)
          val cert = if (prov.certaintyFromArchive) archCert else Certainty.Certain
          parsed.iterator.zipWithIndex.map { case (d, i) =>
            val (obj, objJson) = objForms(d.value)
            (subj, d.field, obj, objJson, cert, i)
          }
        }
        .toDF("subj", "pred", "obj", "obj_json", "certainty", "seq")
        .select(F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_json"),
          F.col("certainty"), F.lit("external-registry").as("origin"),
          F.lit(1).as("guesser_rank"), F.col("seq"))
    }
    canonicalize(
      raws.foldLeft(canonAsRaw(cd))(_.unionByName(_)).as[RawTriple])
      .as[CanonTriple]
  }

  /** A provider of the extend stage's EXTERNAL-DIRECTORY dispatch
    * (/root/reference/src/lib.rs:3652-3694): all four providers are keyed
    * by the subject's DEBIAN source package name (the reference reads it
    * straight from debian/control) and capped at the provider's maximum
    * certainty — Possible for Launchpad (lib.rs:3745-3746), AUR
    * (arch.rs:189-195) and Gobo (gobo.rs:160-166), Confident for Repology
    * (lib.rs:3768-3770). A provider is consulted only when its cap can meet
    * `minimum_certainty` (lib.rs:3749-3752, 3717-3720, 3772-3775).
    */
  final case class ExternalDirectoryProvider(
      directory: String,
      supportedFields: Seq[String],
      maxCertainty: Int)

  /** Reference consultation order (lib.rs:3663-3692) — encoded into
    * `guesser_rank` so an earlier provider's value wins certainty ties in
    * the lattice argmax, exactly like the reference's sequential
    * insert-only-if-more-certain updates.
    */
  val externalDirectoryProviders: Seq[ExternalDirectoryProvider] = Seq(
    ExternalDirectoryProvider("launchpad",
      Seq("Homepage", "Repository", "Name", "Download"), Certainty.Possible),
    ExternalDirectoryProvider("aur",
      Seq("Homepage", "Repository"), Certainty.Possible),
    ExternalDirectoryProvider("gobo",
      Seq("Homepage", "Repository"), Certainty.Possible),
    ExternalDirectoryProvider("repology",
      Seq("Homepage", "License", "Summary", "Download"), Certainty.Confident))

  /** The debian/control Source package name — the routing key of the
    * external-directory dispatch (lib.rs:3655-3661: a relaxed parse of
    * debian/control; a missing or unparseable file routes nowhere).
    */
  def debianSourceName(content: String): Option[String] =
    graft.extract.Parsers.parseDeb822(content)
      .flatMap(graft.extract.Parsers.deb822Get(_, "Source"))
      .headOption

  /** External-directory enrichment — the composed form of the extend
    * stage's `consult_external_directory` branch (lib.rs:3652-3694): each
    * subject's Debian source-package name (from its OWN debian/control —
    * `sources` is (subj, package), typically derived with
    * `debianSourceName`) routes through Launchpad, AUR, GoboLinux, and
    * Repology IN ORDER, each behind its `possible_fields_missing` anti-join
    * gate and skipped entirely when its certainty cap cannot meet
    * `minimumCertainty`. Parsed datums enter the one lattice argmax at the
    * provider cap (extend_from_external_guesser overrides item certainty,
    * lib.rs:2318-2320), with the provider's position as `guesser_rank`, so
    * an earlier directory's value beats a later one at equal certainty and
    * existing data (rank 0) beats both. Gobo payloads are the Recipe and
    * Resources/Description files concatenated — the two line dialects are
    * disjoint, so routing one blob through both parsers reproduces
    * `guess_from_gobo`'s datum concatenation (gobo.rs:73-133).
    *
    * Unlike the archive dispatch (which fans a subject to exactly one
    * provider), every debian-keyed subject consults every open directory;
    * plan-wise each branch still joins only that provider's payload
    * partition against the incomplete-subject subset, shuffling on
    * `package` — never the whole graph.
    *
    * Both gates are data, not config: the reference runs this branch only
    * under `net_access && consult_external_directory` (golden tests run it
    * off), so `consult = false` returns the canon unchanged.
    */
  def enrichFromExternalDirectory(
      canon: Dataset[CanonTriple],
      sources: DataFrame,              // (subj, package)
      payloads: DataFrame,             // (directory, package, payload)
      minimumCertainty: Int = Certainty.Possible,
      consult: Boolean = true
  ): Dataset[CanonTriple] = {
    if (!consult) return canon
    val spark = canon.sparkSession
    import spark.implicits._
    val cd = canon.toDF()
    // ONE canon-wide pass feeds every provider's possible_fields_missing
    // gate (lib.rs:2284-2297: consult only while some supported field is
    // absent or below Certain): the per-subject set of union-supported
    // fields held at Certain aggregates once, and each branch filters
    // ABOVE the (subj) exchange — identical exchange subtrees, so Catalyst
    // ReuseExchange runs the canon scan + shuffle once for all four
    // directories instead of once per branch (plan-asserted). At 100 TB
    // the gate is the only canon-wide work in this operator; everything
    // else joins the debian-keyed subject subset.
    val unionFields = externalDirectoryProviders.flatMap(_.supportedFields).distinct
    val certainSets = cd
      .where(F.col("pred").isin(unionFields.map(x => x: Any): _*) &&
             F.col("certainty") === Certainty.Certain)
      .groupBy("subj").agg(F.collect_set("pred").as("certain_preds"))
    val raws: Seq[DataFrame] = externalDirectoryProviders.zipWithIndex
      .filter { case (p, _) => p.maxCertainty >= minimumCertainty }
      .map { case (p, idx) =>
        val complete = certainSets
          .where(F.size(F.array_intersect(F.col("certain_preds"),
            F.lit(p.supportedFields.toArray))) === p.supportedFields.size)
          .select("subj")
        val keyed = sources.select(F.col("subj"), F.col("package"))
          .join(complete, Seq("subj"), "left_anti")
        val prov = p // stable reference for the closure
        keyed
          .join(payloads.where(F.col("directory") === p.directory)
            .select(F.col("package"), F.col("payload")), Seq("package"))
          .select(F.col("subj"), F.col("payload"))
          .as[(String, String)]
          .flatMap { case (subj, payload) =>
            val parsed = prov.directory match {
              case "gobo" =>
                graft.registry.RegistryParsers
                  .parse("gobo-recipe", payload).getOrElse(Nil) ++
                graft.registry.RegistryParsers
                  .parse("gobo-description", payload).getOrElse(Nil)
              case kind => graft.registry.RegistryParsers
                .parse(kind, payload).getOrElse(Nil)
            }
            parsed.iterator.zipWithIndex.map { case (d, i) =>
              val (obj, objJson) = objForms(d.value)
              (subj, d.field, obj, objJson, prov.maxCertainty, i)
            }
          }
          .toDF("subj", "pred", "obj", "obj_json", "certainty", "seq")
          .select(F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_json"),
            F.col("certainty"), F.lit("external-directory").as("origin"),
            F.lit(1 + idx).as("guesser_rank"), F.col("seq"))
      }
    canonicalize(
      raws.foldLeft(canonAsRaw(cd))(_.unionByName(_)).as[RawTriple])
      .as[CanonTriple]
  }

  /** Homepage-scrape enrichment — extrapolation rule 14 in its crawl-scale
    * form (/root/reference/src/homepage.rs:7-56): the reference fetches each
    * subject's Homepage and harvests Repository / Bug-Database links from the
    * page; offline the fetches arrive as a side table of already-crawled
    * homepages (url, html). The join keys on the Homepage triple's object, so
    * only subjects that HAVE a homepage consult the corpus; harvested datums
    * enter the lattice at Possible and can only fill gaps.
    */
  /** The scrape side shared by `enrichFromHomepages` and `enrichAll`: the
    * canonical Homepage triples join the fetched corpus (only matched pages
    * are ever parsed), and each page's datums are numbered in EMISSION order
    * (`seq`) — canonicalize negates seq, so at equal certainty the
    * first-in-document link wins, matching the reference's insert-first-wins
    * merge (a page with both a 'GitHub' and a 'repository' anchor must not
    * be shuffle-order dependent).
    */
  private def scrapedDatums(
      spark: SparkSession,
      homepages: DataFrame,            // (subj, url)
      fetched: DataFrame
  ): DataFrame = {
    import spark.implicits._
    homepages
      .join(fetched, Seq("url"))
      .select(F.col("subj"), F.col("url"), F.col("html"))
      .as[(String, String, String)]
      .flatMap { case (subj, url, html) =>
        if (html == null) Iterator.empty
        else graft.extract.Homepage.guessFromPage(html, url)
          .iterator.zipWithIndex.map { case (d, i) =>
            val (obj, objJson) = objForms(d.value)
            (subj, d.field, obj, objJson, i)
          }
      }
      .toDF("subj", "pred", "obj", "obj_json", "seq")
  }

  def enrichFromHomepages(
      canon: Dataset[CanonTriple],
      fetched: DataFrame               // (url, html) crawled homepage corpus
  ): Dataset[CanonTriple] = {
    val spark = canon.sparkSession
    import spark.implicits._
    val cd = canon.toDF()
    val homepages = cd.where(F.col("pred") === "Homepage")
      .select(F.col("subj"), F.col("obj").as("url"))
    canonicalize(canonAsRaw(cd)
        .unionByName(scrapeAsRaw(scrapedDatums(spark, homepages, fetched), rank = 1))
        .as[RawTriple])
      .as[CanonTriple]
  }

  /** Scraped homepage datums as a raw stream: Possible certainty, the given
    * tie rank, document-order seq.
    */
  private def scrapeAsRaw(scraped: DataFrame, rank: Int): DataFrame =
    scraped.select(
      F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_json"),
      F.lit(Certainty.Possible).as("certainty"),
      F.lit("homepage-scrape").as("origin"),
      F.lit(rank).as("guesser_rank"), F.col("seq"))

  /** Post-enrichment extrapolation — the reference lifecycle runs the
    * extrapolation fixpoint AFTER external enrichment
    * (`extend_upstream_metadata` ends by calling `extrapolate_fields`,
    * /root/reference/src/lib.rs:3695 → src/extrapolate.rs:511), so a
    * Repository gained from a registry or homepage scrape derives
    * Repository-Browse / Bug-Database / Bug-Submit / Name exactly like an
    * extracted one. Relationally: extraction already left every subject at
    * the extrapolation fixpoint and the rules are deterministic, so only
    * subjects that actually GAINED data (identified by the enrichment
    * origins) can change. The gate is applied IN-GROUP of a single
    * groupByKey(subj) pass: a group with no enriched-origin row passes its
    * rows through untouched (an iterator hand-off — no datum decoding, no
    * fixpoint), so the extrapolation CPU stays proportional to the enriched
    * subjects while the plan stays ONE linear pass. (A broadcast semi/anti
    * split would gate the SHUFFLE too, but it consumes the upstream table
    * twice — per-branch column pruning then defeats exchange reuse and the
    * heaviest aggregate re-executes per branch, the exact pathology
    * `enrichAll` exists to remove. The one subject-regroup here is over the
    * already-canonicalized triple table, orders of magnitude below the page
    * scan.) The per-subject fixpoint is the same pure `Summarize.extrapolate`
    * the extractor runs (src/extrapolate.rs:427-618 rule set), fed through
    * the typed obj/obj_json round-trip.
    */
  private def tripleToDatum(t: CanonTriple): graft.core.Datum =
    graft.core.Datum(
      t.pred, valueFromForms(t.obj, t.obj_json),
      if (t.certainty < 0) None else Some(t.certainty),
      if (t.origin.isEmpty) None else Some(t.origin))

  private[spark] def datumToTriple(subj: String)(d: graft.core.Datum): CanonTriple = {
    val (obj, objJson) = objForms(d.value)
    CanonTriple(subj, d.field, obj, objJson,
      d.certainty.getOrElse(-1), d.origin.getOrElse(""))
  }

  /** The offline extend tail over one subject's canonical rows, in lifecycle
    * order: the SF-archive head (lib.rs:3521-3554) sees enrichment-gained
    * URL fields before the extrapolation fixpoint. ONE definition shared by
    * `extrapolatePost` and `enrichAll`'s fused pass, so the two can never
    * drift.
    */
  private def extendTail(
      rows: Array[CanonTriple]
  ): scala.collection.mutable.ArrayBuffer[graft.core.Datum] = {
    val md = scala.collection.mutable.ArrayBuffer.from(
      rows.map(tripleToDatum).sortBy(_.field))
    Summarize.extendSfArchive(md)
    // extend_upstream_metadata propagates ExtrapolationLimitExceeded with
    // `?` (lib.rs:3695) — the enrichment job fails, it is not logged-and-
    // dropped like guesser errors, so a non-convergent subject fails the
    // task here too
    Summarize.extrapolate(md).foreach(e =>
      throw new IllegalStateException(e))
    md
  }

  /** The canonical table re-expressed as a raw stream (rank 0, seq 0 — the
    * existing data that wins every tie against enrichment streams).
    */
  private[spark] def canonAsRaw(cd: DataFrame): DataFrame =
    cd.select(
      F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_json"),
      F.col("certainty"), F.col("origin"),
      F.lit(0).as("guesser_rank"), F.lit(0).as("seq"))

  def extrapolatePost(
      canon: Dataset[CanonTriple],
      enrichedOrigins: Seq[String]
  ): Dataset[CanonTriple] = {
    import canon.sparkSession.implicits._
    val origins = enrichedOrigins.toSet
    canon.groupByKey(_.subj).flatMapGroups { (subj, it) =>
      val rows = it.toArray
      if (!rows.exists(r => origins.contains(r.origin))) rows.iterator
      else extendTail(rows).sortBy(_.field).iterator.map(datumToTriple(subj))
    }
  }

  /** The full enrichment lifecycle in the reference's order — extend
    * (external registry + homepage scrape), extrapolate, check — with ONE
    * full-table lattice aggregate: all raw datum streams union BEFORE
    * `canonicalize`, instead of re-aggregating the whole triple table per
    * stage (the staged `enrichFromRegistry → enrichFromHomepages →
    * applyUrlProbes` chain shuffles the full table three times; at crawl
    * scale that triples the heaviest exchange). Stage precedence at equal
    * certainty is preserved through `guesser_rank` (existing 0 < registry 1 <
    * scrape 2) — the same tie order the staged chain produces, so the two
    * forms are result-identical.
    *
    * The scrape side joins the POST-REGISTRY-MERGE canonical homepage per
    * subject (existing rows vs gated registry rows through the same lattice
    * tie rules, as a subj-only argmax on the tiny Homepage subset) — a
    * homepage first learned from the registry in this batch is scraped in
    * this SAME batch, exactly like the staged chain, without re-aggregating
    * the full stream.
    *
    * Probe verdicts never touch the driver: the collapsed probe/screenshot
    * tables JOIN (on url) against the candidate-url set of each subject —
    * its checked-field objs, the per-datum extrapolation closure of every
    * url-typed obj (all url-producing extrapolation rules are single-source,
    * so the union of per-datum closures covers every url the in-group
    * fixpoint can derive; over-approximation only adds carriers that are
    * never looked up), and the members of Likely Screenshots lists — and the
    * matches ride the ONE subject exchange as marker rows consumed by the
    * group pass. A probe fleet covering 10^9 urls stays distributed end to
    * end; the per-subject carrier count is bounded by the subject's own url
    * count. The candidate side re-reads `merged` (its lattice exchange is
    * reused — only the final argmax re-runs over the checked-pred subset).
    *
    * The `canon` input is referenced multiple times (existing stream,
    * homepage side, completeness gate). In production that input is a STORED
    * triple table (KgJob's output), so each reference is a pruned parquet
    * scan; if you pass a live extraction pipeline instead, persist it first
    * or accept re-execution — the one full-width exchange guarantee is about
    * the enrichment itself, not the caller's upstream.
    */
  def enrichAll(
      canon: Dataset[CanonTriple],
      registry: DataFrame,             // (subj, pred, obj[, obj_json])
      supportedFields: Seq[String],
      maxCertainty: Int,
      fetched: DataFrame,              // (url, html) crawled homepage corpus
      probes: DataFrame,               // (url, status, canonical_url)
      screenshotProbes: Option[DataFrame] = None,
      extrapolateEnriched: Boolean = true
  ): Dataset[CanonTriple] = {
    val spark = canon.sparkSession
    import spark.implicits._
    val cd = canon.toDF()
    val regRaw = gatedRegistryRaw(cd, registry, supportedFields, maxCertainty)
    // same-batch scrape source: the homepage the staged chain would scrape
    // is the post-registry-merge winner. Single-pred argmax → groupBy(subj)
    // only, so the full-stream union exchange below stays the unique
    // (subj, pred) lattice shuffle.
    val hpRaw = canonAsRaw(cd).where(F.col("pred") === "Homepage")
      .unionByName(regRaw.where(F.col("pred") === "Homepage"))
    val homepages = hpRaw.groupBy("subj")
      .agg(F.max_by(F.col("obj"), F.struct(
        F.col("certainty"),
        F.negate(F.col("guesser_rank")),
        F.negate(F.col("seq")))).as("url"))
    val scrapeRaw = scrapeAsRaw(scrapedDatums(spark, homepages, fetched), rank = 2)
    val rawAll0 = canonAsRaw(cd).unionByName(regRaw).unionByName(scrapeRaw)
    if (!extrapolateEnriched)
      return applyUrlProbes(
        canonicalize(rawAll0.as[RawTriple]).as[CanonTriple],
        probes, screenshotProbes)
    // the union feeds BOTH the lattice argmax and the candidate-url branch;
    // an explicit repartition on the aggregate's own keys REPLACES the
    // aggregate's shuffle (the requirement is already satisfied, so no
    // extra exchange appears) and turns the union into shared map output —
    // the candidate branch reads the reused exchange instead of re-running
    // the union's upstream (registry gate, homepage argmax, scrape parse,
    // and the caller's canon pipeline when it is not a stored table)
    val rawAll = rawAll0.repartition(F.col("subj"), F.col("pred"))
    val merged = canonicalize(rawAll.as[RawTriple]).as[CanonTriple]
    // extrapolate + check FUSED into one subject-grouped pass over the merged
    // table: the relational applyUrlProbes' browse-sync branch consumes its
    // input twice (per-branch pruning then re-executes the canonicalize), so
    // the checked path here runs the PURE Checks.applyProbes in-group — full
    // reference parity (browse sync, Screenshots tri-state). Probe verdicts
    // arrive as carrier rows (see Scaladoc); groups with nothing enriched
    // and no carried verdict pass through as a plain iterator hand-off.
    val probes1 = collapseProbes(probes)
    val shots1 = screenshotProbes.map(collapseShots)
    val haveShots = screenshotProbes.isDefined
    // candidate urls come from the PRE-aggregate raw stream: its values are
    // a superset of the lattice winners', so the closure still covers every
    // in-group lookup. Consuming FULL RawTriple rows (not a pruned
    // projection) keeps this branch's exchange subtree canonically identical
    // to the lattice branch's, so ReuseExchange shares the one shuffle —
    // a narrower select here pushes a different projection below the
    // exchange and silently doubles the union's upstream execution
    val cands = rawAll.as[RawTriple]
      .flatMap(r => probeCandidateUrls(r.subj, r.pred, r.obj, r.obj_json, r.certainty))
      .toDF("subj", "url")
    val pCarrier = cands.join(probes1, Seq("url"))
      .select(F.col("subj"), F.lit(ProbeCarrierPred).as("pred"),
        F.col("url").as("obj"), F.col("canonical_url").as("obj_json"),
        F.lit(-1).as("certainty"), F.col("status").as("origin"))
    val sCarrier = shots1.map(s1 => cands.join(s1, Seq("url"))
      .select(F.col("subj"), F.lit(ShotCarrierPred).as("pred"),
        F.col("url").as("obj"), F.lit("").as("obj_json"),
        F.col("live").cast("int").as("certainty"), F.lit("").as("origin")))
    val withCarriers = sCarrier
      .foldLeft(merged.toDF().unionByName(pCarrier))(_.unionByName(_))
      .as[CanonTriple]
    val origins = Set("external-registry", "homepage-scrape")
    withCarriers.groupByKey(_.subj).flatMapGroups { (subj, it) =>
      val all = it.toArray
      val (carriers, rows) =
        if (all.exists(r => r.pred.nonEmpty && r.pred.charAt(0) == CarrierMark))
          all.partition(r => r.pred.nonEmpty && r.pred.charAt(0) == CarrierMark)
        else (Array.empty[CanonTriple], all)
      val enriched = rows.exists(r => origins.contains(r.origin))
      // a Likely Screenshots list is re-verified whenever a screenshot fleet
      // ran AT ALL — an entirely-unprobed list still demotes (tri-state)
      val probed = carriers.nonEmpty ||
        (haveShots && rows.exists(r =>
          r.pred == "Screenshots" && r.certainty == Certainty.Likely))
      if (!enriched && !probed) rows.iterator
      else {
        val pm: Map[String, (String, String)] = carriers.iterator
          .filter(_.pred == ProbeCarrierPred)
          .map(c => c.obj -> (c.origin, c.obj_json)).toMap
        val sm: Map[String, Boolean] = carriers.iterator
          .filter(_.pred == ShotCarrierPred)
          .map(c => c.obj -> (c.certainty == 1)).toMap
        val md =
          if (enriched) extendTail(rows) // extend → extrapolate, shared defn
          else scala.collection.mutable.ArrayBuffer.from(
            rows.map(tripleToDatum).sortBy(_.field))
        val checkedMd =
          if (probed) {
            val lookup: (String, String) => graft.pipeline.Checks.Outcome =
              (_, url) => pm.get(url) match {
                case Some(("valid", canonical)) =>
                  graft.pipeline.Checks.Valid(canonical)
                case Some(("invalid", _)) => graft.pipeline.Checks.Invalid
                case _ => graft.pipeline.Checks.Unverifiable
              }
            if (haveShots)
              graft.pipeline.Checks.applyProbes(md.toList, lookup, url => sm.get(url))
            else
              // no screenshot fleet ran: Screenshots lists stay untouched —
              // treating "no fleet" as "all inconclusive" would empty every
              // Likely list (matches applyUrlProbes with screenshotProbes
              // = None)
              graft.pipeline.Checks.applyProbesNoScreenshots(md.toList, lookup)
          } else md.toList
        checkedMd.sortBy(_.field).iterator.map(datumToTriple(subj))
      }
    }
  }

  // carrier rows ride the subject exchange next to real triples; the
  // leading-space prefix cannot collide with a real predicate (field names
  // are drawn from the reference's fixed vocabulary, none space-prefixed)
  private val CarrierMark: Char = '\u0000'
  private[spark] val ProbeCarrierPred: String = "\u0000probe"
  private[spark] val ShotCarrierPred: String = "\u0000shot"

  private val checkedFields: Set[String] = Set(
    "Repository", "Homepage", "Repository-Browse", "Bug-Database", "Bug-Submit")

  private lazy val closureStartFields: Set[String] =
    checkedFields ++ graft.pipeline.Summarize.singletonRuleSourceFields

  /** Every url the in-group check could look up for this row's subject: the
    * obj itself (checked fields), the checked-field values reachable from
    * this ONE datum through the single-source extrapolation rules (covers
    * urls first derived by the in-group fixpoint — a BFS over the actual
    * rule callbacks, far cheaper than running the full fixpoint machinery
    * per row), and the members of a Likely Screenshots list.
    */
  private[spark] def probeCandidateUrls(
      subj: String, pred: String, obj: String, objJson: String,
      certainty: Int): Iterator[(String, String)] =
    if (pred == "Screenshots") {
      if (certainty != Certainty.Likely) Iterator.empty
      else valueFromForms(obj, objJson) match {
        case graft.core.UStrings(us) => us.iterator.map(u => (subj, u))
        case _                       => Iterator.empty
      }
    } else if (closureStartFields.contains(pred)) {
      val seen = scala.collection.mutable.LinkedHashSet((pred, obj))
      var frontier: List[(String, String)] = (pred, obj) :: Nil
      var depth = 0
      while (frontier.nonEmpty && depth < 8) { // field graph is shallow;
        depth += 1                             // depth guards value cycles
        frontier = frontier
          .flatMap { case (f, u) =>
            graft.pipeline.Summarize.singletonUrlDerivations(f, u) }
          .filter(seen.add)
      }
      seen.iterator
        .collect { case (f, u) if checkedFields.contains(f) => u }
        .distinct
        .map(u => (subj, u))
    } else Iterator.empty

  /** One row per url, deterministically: the lexicographically largest
    * (status, canonical) wins — 'valid' beats 'unverifiable' beats
    * 'invalid', so a url that ever probed valid stays valid. (A probe table
    * SHOULD be unique per url, but a retrying probe fleet can emit
    * conflicting rows; joining them raw would duplicate triples.)
    */
  private[spark] def collapseProbes(probes: DataFrame): DataFrame =
    probes.groupBy("url")
      .agg(F.max_by(F.struct("status", "canonical_url"),
        F.struct("status", "canonical_url")).as("b"))
      .select(F.col("url"), F.col("b.status").as("status"),
        F.col("b.canonical_url").as("canonical_url"))

  /** One verdict per screenshot url: any live verdict beats a dead one; a
    * NULL live value is no verdict at all (the url stays unprobed rather
    * than crashing the aggregate or reading as dead).
    */
  private[spark] def collapseShots(sp: DataFrame): DataFrame =
    sp.where(F.col("live").isNotNull)
      .groupBy("url").agg(F.max("live").as("live"))

  /** URL-probe promotion in its relational form — the per-field rules of
    * `check_upstream_metadata` (/root/reference/src/lib.rs:3991-4156) joined
    * against a probe-status side table (url, status, canonical_url), status ∈
    * valid | invalid | unverifiable:
    *   - valid:   object replaced by the canonical URL; Repository promotes
    *     only Confident → Certain, the other URL fields promote ≥ Likely →
    *     Certain
    *   - invalid: the triple is deleted
    *   - unverifiable (or unprobed): untouched
    *   - Repository-Browse certainty sync (lib.rs:4007-4023): when a
    *     Repository probed valid, the browse URL derived from its canonical
    *     form, if equal to the subject's Repository-Browse object, syncs
    *     that browse datum's certainty to the repository's — one extra
    *     broadcast join on the valid-repository subset, batched into the
    *     same pass
    *   - Screenshots tri-state (lib.rs:4129-4155), when `screenshotProbes`
    *     (url, live:boolean) is given: a Likely Screenshots list keeps its
    *     live URLs, drops dead ones, and promotes to Certain unless any URL
    *     went unprobed/inconclusive (→ falls back to Likely). Runs on the
    *     tiny Screenshots subset only.
    * Exactly the semantics of the pure `Checks.applyProbes`, table-scaled.
    *
    * The browse-sync side re-reads the input filtered to valid-probed
    * repositories — a pruned scan when the input is a stored table (the
    * intended use); composing over a live pipeline re-executes it, which is
    * why `enrichAll` runs these rules in its fused group pass instead of
    * through this operator.
    */
  def applyUrlProbes(
      canon: Dataset[CanonTriple],
      probes: DataFrame,
      screenshotProbes: Option[DataFrame] = None,
      broadcastProbes: Option[Boolean] = None
  ): Dataset[CanonTriple] = {
    import canon.sparkSession.implicits._
    val checked = Seq("Repository", "Homepage", "Repository-Browse",
      "Bug-Database", "Bug-Submit")
    val cd = canon.toDF()
    val probes1 = collapseProbes(probes)
    // size-guarded dissemination: probe fleets usually emit compact tables
    // (→ broadcast), but a fleet-scale verdict table must shuffle-join on
    // url instead of being replicated to every executor. Default None
    // leaves the choice to Catalyst/AQE's autoBroadcastJoinThreshold —
    // the engine's own size statistics, not a hard-coded hint — so the
    // operator cannot be misused by handing it a huge probe table.
    val p = broadcastProbes match {
      case Some(true)  => F.broadcast(probes1)
      case Some(false) => probes1.hint("shuffle_hash")
      case None        => probes1
    }
    // pre-replacement rows (original obj kept — the sync comparison below
    // must see the ORIGINAL browse object, exactly like the pure twin which
    // syncs before the browse field's own probe is applied)
    val joined = cd.join(p,
        cd("obj") === probes1("url") &&
        cd("pred").isin(checked.map(x => x: Any): _*), "left")
      .where(F.col("status").isNull || F.col("status") =!= "invalid")
      .select(F.col("subj"), F.col("pred"), cd("obj").as("obj"),
        F.col("obj_json"), F.col("certainty"), F.col("origin"),
        F.col("status"), F.col("canonical_url"))
    // browse-certainty sync source: derive the browse URL only on the
    // valid-Repository subset (tiny), carrying the repository's
    // POST-promotion certainty, and broadcast it back. The derivation is a
    // native expression (graft.functions.BrowseUrlFromRepo), not a ScalaUDF.
    graft.functions.BrowseUrlFromRepo.register(canon.sparkSession)
    val sync = joined
      .where(F.col("pred") === "Repository" && F.col("status") === "valid")
      .select(F.col("subj"),
        F.expr("browse_url_from_repo(canonical_url)").as("_derived"),
        F.when(F.col("certainty") === Certainty.Confident, Certainty.Certain)
          .otherwise(F.col("certainty")).as("_repo_cert"))
      .where(F.col("_derived").isNotNull)
    // reference order per row: (1) sync the browse certainty, (2) apply the
    // row's own probe — canonical replacement + promotion over the SYNCED
    // certainty (lib.rs:4007-4023 runs before the per-field loop :4039-4128)
    val cert1 = F.when(F.col("pred") === "Repository-Browse" &&
        F.col("obj") === F.col("_derived"), F.col("_repo_cert"))
      .otherwise(F.col("certainty"))
    // the sync table is one row per valid-probed Repository SUBJECT — it
    // scales with the probe fleet, the same axis the broadcastProbes guard
    // exists for, so it follows the same choice: forced broadcast only for
    // the explicitly-small fleet, shuffle_hash for the explicitly-large
    // one, and Catalyst/AQE's own size statistics by default (a hard-coded
    // F.broadcast here was the round-6 escape-hatch scale hazard)
    val syncSized = broadcastProbes match {
      case Some(true)  => F.broadcast(sync)
      case Some(false) => sync.hint("shuffle_hash")
      case None        => sync
    }
    val synced = joined.join(syncSized, Seq("subj"), "left")
      .select(
        F.col("subj"), F.col("pred"),
        F.when(F.col("status") === "valid", F.col("canonical_url"))
          .otherwise(F.col("obj")).as("obj"),
        F.col("obj_json"),
        F.when(F.col("status") === "valid",
            F.when(F.col("pred") === "Repository",
                F.when(cert1 === Certainty.Confident,
                  Certainty.Certain).otherwise(cert1))
              .otherwise(
                F.when(cert1 >= Certainty.Likely,
                  Certainty.Certain).otherwise(cert1)))
          .otherwise(cert1).as("certainty"),
        F.col("origin"))
    screenshotProbes match {
      case None => synced.as[CanonTriple]
      case Some(sp) =>
        // only a Likely Screenshots LIST is re-verified; everything else —
        // including a row whose obj_json fails to parse as a string array —
        // passes through untouched, exactly like the pure twin's UStrings
        // pattern match
        val parsed = F.from_json(F.col("obj_json"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType))
        // coalesce: a NULL obj_json (e.g. triples read back from externally
        // written parquet with a nullable column) must make the predicate
        // FALSE, not SQL NULL — a null predicate fails both where(isShot)
        // and where(!isShot) and would silently delete the row
        val isShot = F.coalesce(
          F.col("pred") === "Screenshots" &&
          F.col("certainty") === Certainty.Likely &&
          F.col("obj_json").startsWith("[") && parsed.isNotNull,
          F.lit(false))
        // duplicate probe rows for one url collapse deterministically:
        // any `live` verdict beats a dead one (max over boolean)
        val spb = F.broadcast(collapseShots(sp))
        // posexplode_OUTER: an EMPTY list must keep its subject (one null
        // row) — plain posexplode would silently delete the whole datum
        val exploded = synced.where(isShot)
          .select(F.col("subj"), F.col("pred"), F.col("origin"),
            F.posexplode_outer(parsed).as(Seq("pos", "u")))
        val reverified = exploded
          .join(spb, exploded("u") === spb("url"), "left")
          .groupBy("subj", "pred", "origin")
          .agg(
            F.to_json(F.transform(
              F.array_sort(F.collect_list(F.when(F.col("live") === true,
                F.struct(F.col("pos"), F.col("u"))))),
              x => x("u"))).as("obj_json"),
            // inconclusive = a REAL url with no probe verdict; the empty
            // list's null placeholder row is vacuously conclusive
            F.max((F.col("u").isNotNull && F.col("live").isNull).cast("int"))
              .as("_inconclusive"))
          .select(F.col("subj"), F.col("pred"), F.lit("").as("obj"),
            F.col("obj_json"),
            F.when(F.col("_inconclusive") === 1, Certainty.Likely)
              .otherwise(Certainty.Certain).as("certainty"),
            F.col("origin"))
        synced.where(!isShot).unionByName(reverified).as[CanonTriple]
    }
  }

  /** Resume manifest: subjects hash into `buckets`; completed buckets are
    * recorded in a manifest table, and a restarted job anti-joins them away
    * without re-emitting committed partitions (north rule).
    *
    * The bucket hash is the first 15 hex chars (60 bits) of md5(subj) — an
    * engine-neutral function any SQL engine reproduces
    * (`CAST('0x'||substring(md5(subj),1,15) AS UBIGINT) % buckets`), so the
    * resume partitioning itself is oracle-checkable.
    */
  def bucketOf(subjCol: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column =
    F.pmod(
      F.conv(F.substring(F.md5(subjCol), 1, 15), 16, 10).cast("long"),
      F.lit(buckets.toLong)).cast("int")

  def resumeFilter(
      pages: DataFrame,
      completedBuckets: Seq[Int],
      buckets: Int
  ): DataFrame =
    pages.where(!bucketOf(subjCol(F.col("url")), buckets)
      .isin(completedBuckets.map(x => x: Any): _*))

  // ---------- Catalyst forms of splitSubject / isCandidate ----------
  // The resume filter and KgJob's lineage pass run these per input row at
  // crawl scale; a ScalaUDF there breaks whole-stage codegen and blocks
  // filter pushdown, so the url algebra is expressed as codegen'd string
  // expressions. Equivalence with the Scala functions is property-tested
  // (SubjectExprSpec) over fixture relpaths and adversarial synthetic urls.

  /** `splitSubject(url)._1` as an expression: the minimal prefix
    * scheme://host/seg1/ ("" when the url has no subject, matching None).
    */
  def subjCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.regexp_extract(url, "(?s)^(.*?://[^/]*/[^/]*/)", 1)

  /** `isCandidate(relpath)` as an expression. The multi-segment patterns
    * tolerate trailing slashes exactly like the Scala `split('/')` (which
    * drops trailing empty segments).
    */
  def isCandidateCol(relpath: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val base = F.substring_index(relpath, "/", -1)
    val lcb = F.lower(base)
    val topLevel = !relpath.contains("/")
    // extension after the LAST dot, "" when dotless or the dot leads
    // (lastIndexOf('.') <= 0), matching the Scala ext computation
    val ext = F.lower(F.regexp_extract(base, "^.+\\.([^.]*)$", 1))
    val readmeLike =
      (lcb.startsWith("readme") || lcb.startsWith("hacking") ||
        lcb.startsWith("contributing")) &&
      !base.endsWith("~") && !ext.isin("html", "pdf", "xml")
    relpath.isin(staticNames.toSeq: _*) ||
    relpath === "debian/source/format" ||
    (relpath.startsWith("debian/patches/") && relpath.endsWith(".patch")) ||
    relpath.isin(securityNames.toSeq: _*) ||
    relpath.rlike("^[^/]*\\.egg-info/PKG-INFO/*$") ||
    relpath.rlike("^[^/]*\\.dist-info/METADATA/*$") ||
    relpath.rlike("^[^/]*/DESCRIPTION/*$") ||
    (topLevel && (
      base === "setup.py" ||
      base.endsWith(".gemspec") || base.endsWith(".doap") ||
      (base.endsWith(".xml") && base.startsWith("doap_XML_")) ||
      base.endsWith(".metainfo.xml") || base.endsWith(".cabal") ||
      base.endsWith(".nuspec") || base.endsWith(".opam") ||
      readmeLike))
  }

  /** `splitSubject(url).exists(sr => isCandidate(sr._2))` as an expression
    * (the per-url candidate test over raw page urls).
    */
  def candidateUrlCol(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val subj = subjCol(url)
    val relpath = url.substr(F.length(subj) + 1, F.length(url))
    subj =!= "" && isCandidateCol(relpath)
  }
}
