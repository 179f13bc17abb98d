package graft

import graft.core._
import graft.pipeline.Summarize
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Shared golden-fixture replay machinery: a fixture directory is one
  * subject, its files are artifact rows, and `expected.yaml` holds the
  * expected canonical metadata (structural compare). Used by FixtureSpec
  * (the 43 reference fixtures) and LocalFixtureSpec (repo-local fixtures
  * for operators the reference ships no testdata for).
  */
object FixtureReplay {

  final case class Tally(tp: Int, fp: Int, fn: Int, failures: List[String]) {
    def +(o: Tally): Tally = Tally(tp + o.tp, fp + o.fp, fn + o.fn, failures ++ o.failures)
    def precision: Double = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
  }

  def loadFiles(dir: Path): Map[String, String] =
    Files.walk(dir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => dir.relativize(p).toString -> new String(Files.readAllBytes(p), "UTF-8"))
      .filter { case (rel, _) => rel != "expected.yaml" && rel != "required-features" }
      .toMap

  // ---- expected.yaml loader with !Person tags ----

  def parseExpected(yamlText: String): Map[String, Any] = {
    import org.yaml.snakeyaml._
    import org.yaml.snakeyaml.constructor._
    import org.yaml.snakeyaml.nodes._

    class ExpectedConstructor extends SafeConstructor(new LoaderOptions) {
      this.yamlConstructors.put(new Tag("!Person"), new AbstractConstruct {
        override def construct(node: Node): AnyRef = {
          val m = constructMapping(node.asInstanceOf[MappingNode])
          val jm = new java.util.LinkedHashMap[Any, Any]()
          jm.put("__tag__", "Person")
          jm.putAll(m.asInstanceOf[java.util.Map[Any, Any]])
          jm
        }
      })
    }
    val yaml = new Yaml(new ExpectedConstructor)
    val loaded = yaml.load[Any](yamlText)
    normalize(loaded).asInstanceOf[Map[String, Any]]
  }

  /** Normalizes java structures to Scala; scalars to strings where sensible. */
  private def normalize(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      val sm = m.asScala.map { case (k, vv) => (k.toString, normalize(vv)) }.toMap
      if (sm.get("__tag__").contains("Person"))
        ("Person", sm.get("name"), sm.get("email"), sm.get("url"))
      else sm
    case l: java.util.List[_] => l.asScala.map(normalize).toList
    case s: String            => s
    case n: java.lang.Number  => n.toString
    case b: java.lang.Boolean => b.toString
    case null                 => null
    case o                    => o.toString
  }

  private def personValue(p: Person): Any =
    ("Person", p.name, p.email, p.url)

  def datumValue(dt: Datum): Any = dt.value match {
    case UStr(s)      => s
    case UPersons(ps) => ps.map(personValue)
    case UPerson(p)   => personValue(p)
    case UStrings(ss) => ss
    case UInt(i)      => i.toString
  }

  /** Replays one fixture directory through the local pipeline and compares
    * field-by-field against its expected.yaml.
    */
  def replay(dir: Path): Tally = {
    val name = dir.getFileName.toString
    val files = loadFiles(dir)
    val expected = parseExpected(new String(
      Files.readAllBytes(dir.resolve("expected.yaml")), "UTF-8"))
    val (actualList, _) = Summarize.summarize(files, name)
    val actual = actualList.map(dt => dt.field -> datumValue(dt)).toMap

    var tp = 0; var fp = 0; var fn = 0
    val failures = List.newBuilder[String]
    for (f <- (expected.keySet ++ actual.keySet).toList.sorted) {
      (expected.get(f), actual.get(f)) match {
        case (Some(e), Some(a)) if e == a => tp += 1
        case (Some(e), Some(a)) =>
          fp += 1; fn += 1
          failures += s"$name/$f: expected ${render(e)} got ${render(a)}"
        case (Some(e), None) =>
          fn += 1; failures += s"$name/$f: MISSING expected ${render(e)}"
        case (None, Some(a)) =>
          fp += 1; failures += s"$name/$f: SPURIOUS ${render(a)}"
        case _ =>
      }
    }
    Tally(tp, fp, fn, failures.result())
  }

  def fixtureDirs(root: Path): List[Path] =
    Files.list(root).iterator().asScala
      .filter(Files.isDirectory(_)).toList.sortBy(_.getFileName.toString)

  private def render(v: Any): String = {
    val s = v.toString
    if (s.length > 120) s.take(120) + "…" else s
  }
}
