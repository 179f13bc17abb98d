package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Paths

/** Repo-local golden fixtures for operators the reference ships no testdata
  * for (POD READMEs, DebianITP changelog entries). Same replay machinery and
  * compare as FixtureSpec; every fixture must match exactly.
  */
class LocalFixtureSpec extends AnyFunSuite {

  private val fixturesDir = Paths.get("src/test/resources/fixtures")

  test("local fixture replay is exact") {
    val tallies = FixtureReplay.fixtureDirs(fixturesDir).map { dir =>
      val t = FixtureReplay.replay(dir)
      if (t.failures.isEmpty) info(s"PASS ${dir.getFileName}")
      t.failures.foreach(f => info(s"DIFF $f"))
      t
    }
    val total = tallies.reduce(_ + _)
    assert(total.fp == 0 && total.fn == 0, total.failures.mkString("; "))
  }
}
