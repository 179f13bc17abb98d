package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** CLI-parity entry point — the reference's `guess-upstream-metadata`
  * surface (/root/reference/src/bin/guess-upstream-metadata.rs): walk a
  * project directory, run the full offline pipeline, print the canonical
  * metadata as YAML. A user of the reference CLI can point this at the same
  * checkout and get the same fields.
  */
object GuessMain {

  /** Largest file worth reading: no extraction artifact is bigger, and a
    * real checkout can contain arbitrarily large blobs.
    */
  private val MaxFileBytes = 5L * 1024 * 1024

  def collectFiles(dir: Path): Map[String, String] = {
    val stream = Files.walk(dir)
    try stream.iterator().asScala
      .filter(Files.isRegularFile(_))
      .flatMap { p =>
        val rel = dir.relativize(p).toString
        // skip VCS internals (except .git/config, a real artifact) and
        // oversized blobs; invalid UTF-8 decodes lossily, which the
        // extractors tolerate (non-text files match no artifact name)
        val vcsInternal =
          (rel.startsWith(".git/") && rel != ".git/config") ||
          rel.startsWith(".hg/") || rel.startsWith(".svn/")
        if (vcsInternal || Files.size(p) > MaxFileBytes) None
        else Some(rel -> new String(Files.readAllBytes(p), "UTF-8"))
      }
      .toMap
    finally stream.close()
  }

  def run(dir: Path): String = {
    val files = collectFiles(dir)
    val (metadata, _) = graft.pipeline.Summarize.summarize(
      files, dir.toAbsolutePath.normalize.getFileName.toString)
    graft.pipeline.Sinks.toYaml(metadata)
  }

  def main(args: Array[String]): Unit =
    print(run(Paths.get(args.headOption.getOrElse("."))))
}
