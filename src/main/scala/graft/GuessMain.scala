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

  def collectFiles(dir: Path): Map[String, String] =
    Files.walk(dir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .flatMap { p =>
        val rel = dir.relativize(p).toString
        try Some(rel -> new String(Files.readAllBytes(p), "UTF-8"))
        catch { case _: Exception => None } // unreadable/binary: skip
      }
      .toMap

  def run(dir: Path): String = {
    val files = collectFiles(dir)
    val (metadata, _) = graft.pipeline.Summarize.summarize(
      files, dir.toAbsolutePath.normalize.getFileName.toString)
    graft.pipeline.Sinks.toYaml(metadata)
  }

  def main(args: Array[String]): Unit =
    print(run(Paths.get(args.headOption.getOrElse("."))))
}
