package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main. Runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query seconds plus the KG throughput
  * (pages/sec over the synthesized page corpus).
  */
object Bench {

  /** Headline subset: the KG pipeline plus one representative per operator
    * family (join, agg, window, dedup, ANN, text). The long tail is covered
    * by Verify.
    */
  val headline: List[String] = List(
    "kg_canonical", "kg_raw_triples", "q1_agg", "q2_join_broadcast",
    "q4_star_join", "q6_sessions", "dedup_exact", "dedup_minhash",
    "ann_lsh", "doc_token_stats", "doc_langid", "multimodal_decode",
    "kg_registry_payloads", "kg_full_enrich")
  // dedup_pipeline stays out of the headline on purpose: its bench time
  // would be dominated by materializing the ~5·10⁷-pair flood OUTPUT (the
  // irreducible pair-list contract), not by the exact-first composition
  // the operator exists for — DedupPipelineSpec's candidate-count bound is
  // the scale evidence, and the driver's correctness run covers the query.
  // The kg_incremental* queries also stay out: they publish catalog tables
  // and log directories as side effects (a maintenance job, not a query),
  // and their performance story is measured by graft.tools.IncrementalBench
  // (BASELINE.md round 6), not by a one-shot headline timing.

  def runAll(spark: SparkSession, sfDir: String): (Map[String, Double], Double) = {
    val qs = SparkEntry.queries
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try qs(name)(spark, sfDir).count()
      catch { case e: Throwable => System.err.println(s"[bench] $name: $e"); -1L }
      (System.nanoTime() - t0) / 1e9
    }
    // one untimed warm-up of the KG pipeline at the smallest SF before any
    // timed run: kg_canonical is the first headline query, and without this
    // its committed number is a cold-JIT artifact (~2-4× its steady state)
    // rather than a property of the plan
    try qs("kg_canonical")(spark, "/root/testdata/sf0.001").count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    // two runs per query, report the min: a single co-tenant burst on the
    // shared VM must not poison the committed artifact (one 21.8 s outlier
    // on a 1.5 s query did exactly that in a previous round)
    val results = headline.map { name => name -> math.min(once(name), once(name)) }.toMap

    // pages/sec on the KG pipeline from a warm re-run (the first run above
    // pays one-time JIT/session costs); 2 pages per document except the
    // 5-file debian flavor (doc_id % 8 = 4)
    val pages = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("sum(CASE WHEN doc_id % 8 = 4 THEN 5 ELSE 2 END)")
      .first.getLong(0).toDouble
    val t0 = System.nanoTime()
    qs("kg_canonical")(spark, sfDir).count()
    val warm = (System.nanoTime() - t0) / 1e9
    val pagesPerSec = pages / math.max(math.min(results("kg_canonical"), warm), 1e-9)
    (results + ("kg_canonical_warm" -> warm), pagesPerSec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // reduce tasks ≫ cores + a small AQE advisory so the last wave's
      // stragglers don't dominate (see ScalingBench profile notes)
      .config("spark.sql.shuffle.partitions", cpus.toInt * 8)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // subset co-partitioning for the bucketed stores (see Verify/Incremental)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (results, pagesPerSec) = runAll(spark, sfDir)
    val qs = results.toList.sortBy(_._1)
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.values.sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pages_per_sec":$pagesPerSec%.1f}"""
    println(line)
    // the stdout line drowns in sbt log noise, so the driver's BENCH artifact
    // has carried parsed=null every round — also write it to a file the
    // harness (or a human) can read directly
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"[bench] write $out: $e") }
    spark.stop()
  }
}

/** Two-parallelism scaling evidence (the sandbox proxy for the N vs 4N
  * executor criterion, BASELINE.md): runs the KG pipeline at local[8] and
  * local[32] on the same input and reports throughput at both plus the
  * scaling efficiency (pages/sec at 32 cores) / (4 × pages/sec at 8 cores).
  */
object ScalingBench {
  /** (wall seconds, triples, cpu seconds summed over stages, gc seconds). The
    * CPU sum is the co-tenancy-robust scaling signal on a shared VM: if
    * cpuSum(4N cores) ≈ cpuSum(N cores) the algorithm adds no coordination
    * work with parallelism and the remaining wall-clock gap is machine
    * contention, not the plan.
    */
  /** When SPARK_GRAFT_MASTER points at a standalone master
    * (spark://host:port), `cores` becomes spark.cores.max and the job runs on
    * SEPARATE executor JVMs (SPARK_GRAFT_EXEC_CORES cores each, default 8) —
    * the multi-executor regime of the north rule: distinct heaps, GC, and
    * netty shuffle fetch instead of one shared JVM. 8 vs 32 cores.max against
    * 4 × 8-core workers = 1 executor vs 4 executors on the same input.
    * Requires SPARK_GRAFT_JAR (sbt package output) so executors can load the
    * engine classes.
    */
  def timeKg(cores: Int, sfDir: String): (Double, Long, Double, Double) = {
    val master = sys.env.get("SPARK_GRAFT_MASTER")
    val b0 = SparkSession.builder()
      .master(master.getOrElse(s"local[$cores]"))
      .appName(s"graft-scaling-$cores")
    val b1 = master.fold(b0) { _ =>
      val withJar = sys.env.get("SPARK_GRAFT_JAR").fold(b0)(j => b0.config("spark.jars", j))
      withJar
        .config("spark.cores.max", cores)
        .config("spark.executor.cores", sys.env.getOrElse("SPARK_GRAFT_EXEC_CORES", "8"))
        .config("spark.executor.memory", sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "16g"))
        .config("spark.executor.extraJavaOptions",
          sys.env.getOrElse("SPARK_GRAFT_EXEC_JAVA_OPTS", "-XX:+UseG1GC"))
    }
    val spark = b1
      // many small reduce tasks (≫ cores) so task waves pack tightly;
      // AQE would otherwise coalesce to ~1 wave + remainder (stragglers).
      // SPARK_GRAFT_FIXED_PARTITIONS pins ONE task count across configs —
      // the cluster-faithful comparison (a real job keeps its partitioning
      // while executors scale), which also keeps per-task constant costs
      // identical between the N and 4N measurements
      .config("spark.sql.shuffle.partitions",
        sys.env.get("SPARK_GRAFT_FIXED_PARTITIONS").map(_.toInt).getOrElse(cores * 8))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp"))
      // small advisory + scan splits: the reduce stage must land MANY more
      // tasks than cores or the last wave's stragglers dominate wall time
      // (profiled: AQE's 8m advisory coalesced to 1.2 waves at 32 cores —
      // stage cpuSum is flat from 8→32 cores, so packing IS the ceiling)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "2m"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION", "32m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val profile = sys.env.contains("SPARK_GRAFT_PROFILE")
    // listener-bus thread appends, driver thread drains: a concurrent queue
    // (not a bare ArrayBuffer) + a stability poll instead of a fixed sleep,
    // so late-posted stage completions can't silently under-count cpuSum/gc
    // and skew cpu_work_invariance
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        // executorCpuTime is the true on-CPU nanosecond counter — unlike
        // executorRunTime (task wall), it is not inflated by co-tenant
        // steal or scheduler wait, so it isolates the plan's work
        stages.add((si.stageId, si.numTasks,
          si.taskMetrics.executorCpuTime / 1000000L,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.taskMetrics.jvmGCTime))
      }
    })
    // stage-completion events are posted asynchronously (the listener bus is
    // not publicly drainable): poll until the completed-stage set stops
    // growing (two consecutive stable reads), bounded at ~3 s. Runs BEFORE
    // the clear too — a warm-up stage's late event landing after clear()
    // would inflate the measured cpuSum (the head-side twin of the tail-side
    // under-count)
    def quiesce(): Unit = {
      var stable = 0
      var last = -1
      var waited = 0
      while (stable < 2 && waited < 3000) {
        Thread.sleep(100); waited += 100
        val size = stages.size()
        if (size == last) stable += 1 else { stable = 0; last = size }
      }
    }
    try {
      val pages = spark.read.parquet(ScalingBench.corpusPath(sfDir))
      def job() = sys.env.getOrElse("SPARK_GRAFT_MODE", "grouped") match {
        case "pre" => graft.spark.KgEngine.extractCanonicalPreExtract(spark, pages)
        case _     => graft.spark.KgEngine.extractCanonical(spark, pages)
      }
      // warm-up (JIT + page cache), then one measured run (the caller
      // interleaves rounds and takes the per-config best). In cluster mode
      // every app starts FRESH executor JVMs and each executor only sees
      // 1/N of a warm-up pass, so multi-executor runs need more of them
      // (SPARK_GRAFT_WARMUPS) for JIT parity with the single-executor config
      val warms = sys.env.getOrElse("SPARK_GRAFT_WARMUPS", "1").toInt
      (0 until warms).foreach(_ => job().count())
      quiesce()
      stages.clear()
      val t0 = System.nanoTime()
      val n = job().count()
      val wall = (System.nanoTime() - t0) / 1e9
      quiesce()
      import scala.jdk.CollectionConverters._
      val snap = stages.asScala.toList
      if (profile) snap.foreach { case (id, nt, run, dur, gc) =>
        System.err.println(
          f"[profile c=$cores] stage $id%3d tasks=$nt%4d cpuSum=${run / 1000.0}%8.2fs wall=${dur / 1000.0}%7.2fs gc=${gc / 1000.0}%6.2fs")
      }
      val cpu = snap.map(_._3).sum / 1000.0
      val gc = snap.map(_._5).sum / 1000.0
      (wall, n, cpu, gc)
    } finally spark.stop()
  }

  def corpusPath(sfDir: String): String = {
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "20").toInt
    sys.env.getOrElse("SPARK_GRAFT_CORPUS_DIR", "/tmp") +
      s"/graft_pages_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}_x$factor.parquet"
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE", "20").toInt
    // materialize the synthetic corpus once; the measured job reads it from
    // storage like a real crawl scan would
    val pages = {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/tmp"))
        .getOrCreate()
      try {
        val path = corpusPath(sfDir)
        if (!new java.io.File(path).exists()) {
          val docs = graft.spark.SynthPages.replicate(
            s.read.parquet(s"$sfDir/documents.parquet"), factor)
          graft.spark.SynthPages.fromDocuments(docs)
            .write.mode("overwrite").parquet(path)
        }
        s.read.parquet(path).count().toDouble
      } finally s.stop()
    }
    val configs = sys.env.getOrElse("SPARK_GRAFT_CORES", "2,8,32")
      .split(",").map(_.trim.toInt).toList
    // saturate the JIT before any measured configuration (one shared JVM)
    timeKg(configs.max, sfDir)
    // interleave rounds so drift (page cache, JIT, cgroup noise) cancels;
    // efficiency is computed within a round (paired measurements) and the
    // best round wins, so a noisy spike can't mix into the ratio
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val perRound = scala.collection.mutable.ArrayBuffer.empty[Map[Int, Double]]
    val cpuRound = scala.collection.mutable.ArrayBuffer.empty[Map[Int, Double]]
    var triples = 0L
    for (_ <- 0 until rounds) {
      val results = configs.map { c =>
        val (t, n, cpu, gc) = timeKg(c, sfDir)
        triples = n
        (c, t, cpu, gc)
      }
      val m = results.map(r => r._1 -> r._2).toMap
      perRound.append(m)
      cpuRound.append(results.map(r => r._1 -> r._3).toMap)
      System.err.println(s"[scaling] round: $m cpu: ${results.map(r => r._1 -> f"${r._3}%.1f/gc=${r._4}%.1f").toMap}")
    }
    def roundEff(m: Map[Int, Double], lo: Int, hi: Int): Double =
      (pages / m(hi)) / ((hi.toDouble / lo) * (pages / m(lo)))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    // every efficiency is computed WITHIN a round (paired measurements, so a
    // co-tenant burst can't mix into a ratio across configs); the headline
    // claim is the MEDIAN across rounds — a gate met only by best-round
    // selection on a shared VM is weak evidence — with the best round also
    // reported for comparability with earlier rounds
    val bestRound = perRound.minBy(_.values.sum)
    val best = bestRound
    val pps = configs.map(c => c -> pages / best(c)).toMap
    val times = configs.map(c => f""""t_$c":${best(c)}%.3f""").mkString(",")
    val rates = configs.map(c => f""""pages_per_sec_$c":${pps(c)}%.1f""").mkString(",")
    // adjacent pairs, PLUS the full min→max span when 3+ configs ran — the
    // north rule's N vs 4N criterion is the full span's MEDIAN, not the
    // best adjacent step
    val pairs = configs.sliding(2).collect { case List(lo, hi) => (lo, hi) }.toList ++
      (if (configs.size > 2) List((configs.min, configs.max)) else Nil)
    val effs = pairs.map { case (lo, hi) =>
        val series = perRound.map(m => roundEff(m, lo, hi)).toSeq
        // cpu-work invariance: median over rounds of cpuSum(N)/cpuSum(4N) —
        // ~1.0 means parallelism adds no coordination work and any
        // wall-clock efficiency shortfall is shared-VM contention
        val cpuInv = median(cpuRound.map(m => m(lo) / m(hi)).toSeq)
        f""""efficiency_${lo}_to_${hi}_median":${median(series)}%.3f""" + "," +
        f""""efficiency_${lo}_to_${hi}_best":${roundEff(best, lo, hi)}%.3f""" + "," +
        f""""efficiency_${lo}_to_${hi}_max":${series.max}%.3f""" + "," +
        f""""cpu_work_invariance_${lo}_to_$hi":$cpuInv%.3f"""
    }.mkString(",")
    val cpuMed = configs.map(c =>
      f""""cpu_sec_$c":${median(cpuRound.map(_(c)).toSeq)}%.1f""").mkString(",")
    println(
      s"""{"metric":"scaling","sf":"$sfDir","rounds":$rounds,"pages":${pages.toLong},"triples":$triples,$times,$rates,$cpuMed,$effs}""")
  }
}
