package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.pipeline.Summarize
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Golden-fixture replay: every directory under /root/reference/testdata is
  * one subject; its files become artifact rows; the pipeline's canonical
  * metadata must match expected.yaml (structural compare). Reports
  * triple-level precision/recall (BASELINE.md target ≥0.95/≥0.95).
  */
class FixtureSpec extends AnyFunSuite {

  private val testdataDir = Paths.get("/root/reference/testdata")

  // Threshold ratcheted up as implementation progresses; final target 0.95.
  private val PrecisionFloor = 0.95
  private val RecallFloor = 0.95

  private def loadFiles(dir: Path): Map[String, String] = {
    val base = dir
    Files.walk(dir).iterator().asScala
      .filter(Files.isRegularFile(_))
      .map(p => base.relativize(p).toString -> new String(Files.readAllBytes(p), "UTF-8"))
      .filter { case (rel, _) => rel != "expected.yaml" && rel != "required-features" }
      .toMap
  }

  // ---- expected.yaml loader with !Person tags ----

  private def parseExpected(yamlText: String): Map[String, Any] = {
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

  private def datumValue(dt: Datum): Any = dt.value match {
    case UStr(s)      => s
    case UPersons(ps) => ps.map(personValue)
    case UPerson(p)   => personValue(p)
    case UStrings(ss) => ss
    case UInt(i)      => i.toString
  }

  test("golden fixture replay: triple P/R vs reference expected.yaml") {
    val dirs = Files.list(testdataDir).iterator().asScala
      .filter(Files.isDirectory(_)).toList.sortBy(_.getFileName.toString)

    var tp = 0
    var fp = 0
    var fn = 0
    val failures = List.newBuilder[String]

    for (dir <- dirs) {
      val name = dir.getFileName.toString
      val files = loadFiles(dir)
      val expectedText = new String(
        Files.readAllBytes(dir.resolve("expected.yaml")), "UTF-8")
      val expected = parseExpected(expectedText)
      val (actualList, _) = Summarize.summarize(files, name)
      val actual = actualList.map(dt => dt.field -> datumValue(dt)).toMap

      val allFields = expected.keySet ++ actual.keySet
      var fixtureOk = true
      for (f <- allFields.toList.sorted) {
        (expected.get(f), actual.get(f)) match {
          case (Some(e), Some(a)) if e == a => tp += 1
          case (Some(e), Some(a)) =>
            fp += 1; fn += 1; fixtureOk = false
            failures += s"$name/$f: expected ${render(e)} got ${render(a)}"
          case (Some(e), None) =>
            fn += 1; fixtureOk = false
            failures += s"$name/$f: MISSING expected ${render(e)}"
          case (None, Some(a)) =>
            fp += 1; fixtureOk = false
            failures += s"$name/$f: SPURIOUS ${render(a)}"
          case _ =>
        }
      }
      if (fixtureOk) info(s"PASS $name")
    }

    val precision = if (tp + fp == 0) 1.0 else tp.toDouble / (tp + fp)
    val recall = if (tp + fn == 0) 1.0 else tp.toDouble / (tp + fn)
    info(f"triples: tp=$tp fp=$fp fn=$fn precision=$precision%.4f recall=$recall%.4f")
    failures.result().foreach(f => info(s"DIFF $f"))

    // Persist the report for the driver/judge
    val report =
      f"""{"tp":$tp,"fp":$fp,"fn":$fn,"precision":$precision%.4f,"recall":$recall%.4f}"""
    Files.writeString(Paths.get("target/fixture_pr.json"), report)

    assert(precision >= PrecisionFloor,
      f"precision $precision%.4f below floor $PrecisionFloor")
    assert(recall >= RecallFloor, f"recall $recall%.4f below floor $RecallFloor")
  }

  private def render(v: Any): String = {
    val s = v.toString
    if (s.length > 120) s.take(120) + "…" else s
  }
}
