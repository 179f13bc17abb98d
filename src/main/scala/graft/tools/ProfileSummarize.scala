package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}
import graft.spark.SynthPages

/** Dev profiling harness (not part of the driver contract): collects the
  * synthetic page corpus locally and times `Summarize.summarize` (and
  * `extractRaw`) single-threaded over every subject — isolates per-subject
  * extraction CPU from all Spark overheads. Run with JFR via GRAFT_JVM_OPTS
  * for method-level attribution.
  */
object ProfileSummarize {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = SynthPages.fromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet"))
      .select(F.col("url"), F.col("text"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    spark.stop()

    // group per subject like the engine does
    val bySubj = pages.groupBy { case (url, _) =>
      graft.spark.KgEngine.splitSubject(url).map(_._1).getOrElse("")
    }.map { case (subj, rows) =>
      val files = rows.flatMap { case (url, text) =>
        graft.spark.KgEngine.splitSubject(url).map { case (_, rp) => rp -> text }
      }.toMap
      (subj, files)
    }.toArray
    println(s"[summarize-profile] subjects=${bySubj.length}")

    // the engine's own basename rule — one definition, cannot drift
    def basename(subj: String) = graft.spark.KgEngine.subjBasename(subj)

    def timeIt(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[summarize-profile] $label%-18s ${dt}%7.3f s  (${dt * 1e6 / bySubj.length}%8.1f us/subj)")
    }

    val reps = sys.env.getOrElse("PROFILE_REPS", "5").toInt
    for (r <- 0 until reps) {
      timeIt(s"extractRaw#$r") {
        bySubj.foreach { case (s, files) =>
          graft.pipeline.Summarize.extractRaw(files, basename(s))
        }
      }
      timeIt(s"summarize#$r") {
        bySubj.foreach { case (s, files) =>
          graft.pipeline.Summarize.summarize(files, basename(s))
        }
      }
    }
  }
}
