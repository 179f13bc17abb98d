package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.extract.Extractors

/** Reference inline test vectors ported per provider (beyond the golden
  * fixture corpus): autoconf quoting edges (autoconf.rs tests), cabal
  * sectioning (haskell.rs test_parse_cabal_lines), setup.cfg dynamic-version
  * skip and setup.py static parse (python.rs tests).
  */
class ProviderVectorsSpec extends AnyFunSuite {

  private def fields(r: Either[String, List[Datum]]): Map[String, String] =
    r.toOption.get.flatMap(d => d.str.map(d.field -> _)).toMap

  test("configure: quoting edge cases (autoconf.rs tests)") {
    // a lone single quote must not panic and yields nothing
    assert(Extractors.configure("configure", "PACKAGE_NAME='\n").toOption.get.isEmpty)
    // empty quoted value skipped
    assert(Extractors.configure("configure", "PACKAGE_NAME=''\n").toOption.get.isEmpty)
    // invalid bugreport URL skipped
    assert(Extractors.configure("configure", "PACKAGE_BUGREPORT='not a valid url'\n")
      .toOption.get.isEmpty)
    // properly quoted value extracted
    val ok = Extractors.configure("configure", "PACKAGE_NAME='my-package'\n").toOption.get
    assert(ok == List(Datum("Name", UStr("my-package"), Some(Certainty.Certain),
      Some("configure"))))
  }

  test("cabal: sectioned field parse (haskell.rs test_parse_cabal_lines content)") {
    val content =
      """Name:          foo
        |Version:    0.0
        |License: BSD3
        |Author: John Doe
        |Maintainer: John Doe <joe@example.com>
        |Cabal-Version: >= 1.10
        |Homepage: https://example.com
        |
        |Executable program1
        |  Build-Depends:  HUnit
        |  Main-Is:       Main.hs
        |
        |source-repository head
        |  type: git
        |  location: https://github.com/example/blah
        |""".stripMargin
    val out = Extractors.cabal("foo.cabal", content).toOption.get
    val f = fields(Right(out))
    assert(f("Name") == "foo")
    assert(!f.contains("Version")) // the reference's cabal provider emits no Version
    assert(f("License") == "BSD3")
    assert(f("Homepage") == "https://example.com")
    assert(f("Repository") == "https://github.com/example/blah")
    val author = out.find(_.field == "Author").get.value
    assert(author == UPersons(List(Person(Some("John Doe")))))
    val maint = out.find(_.field == "Maintainer").get.value
    assert(maint == UPerson(Person(Some("John Doe"), Some("joe@example.com"))))
    // executable-section fields never leak into metadata
    assert(!out.exists(d => d.str.exists(_.contains("Main.hs"))))
  }

  test("setup.cfg: attr: version directive skipped, static version kept (python.rs tests)") {
    val dynamic = Extractors.setupCfg("setup.cfg",
      "[metadata]\nname = aiohttp-openmetrics\nversion = attr:aiohttp_openmetrics.__version__\n")
      .toOption.get
    assert(!dynamic.exists(_.field == "Version"),
      "attr: version directive should not be reported as a version")
    assert(dynamic.exists(_.field == "Name"))

    val static0 = Extractors.setupCfg("setup.cfg",
      "[metadata]\nname = mypackage\nversion = 1.2.3\n").toOption.get
    assert(static0.find(_.field == "Version").flatMap(_.str).contains("1.2.3"))
  }

  test("setup.py: static kwargs parse (python.rs test_setup_py_parsed_basic)") {
    val content =
      """from setuptools import setup
        |setup(
        |    name='mypackage',
        |    version='1.2.3',
        |    description='A test package',
        |    url='https://example.com/mypackage',
        |)
        |""".stripMargin
    val out = Extractors.setupPy("setup.py", content).toOption.get
    assert(out.find(_.field == "Name").flatMap(_.str).contains("mypackage"))
    assert(out.find(_.field == "Version").flatMap(_.str).contains("1.2.3"))
  }

  test("META.yml: resources with wrong YAML types are skipped (perl.rs vector)") {
    val yml = """---
name: Test-Module
resources:
  bugtracker: 123
  homepage: true
  repository:
    - not
    - a
    - string
"""
    val ds = Extractors.metaYml("META.yml", yml).toOption.get
    assert(ds.exists(d => d.field == "Name" && d.str.contains("Test-Module")))
    assert(!ds.exists(_.field == "Bug-Database"))
    assert(!ds.exists(_.field == "Homepage"))
    assert(!ds.exists(_.field == "Repository"))
  }

  test("gemspec: array where a string is expected is skipped (ruby.rs vector)") {
    val spec = """Gem::Specification.new do |s|
  s.name = ['not', 'a', 'string']
  s.version = '1.0'
  s.authors = ['Alice', 'Bob']
end
"""
    val ds = Extractors.gemspec("test.gemspec", spec).toOption.get
    assert(!ds.exists(_.field == "Name"))
    assert(ds.exists(d => d.field == "Version" && d.str.contains("1.0")))
    assert(ds.exists(_.field == "Author"))
  }

  test("cabal: invalid repository URL dropped, name kept (haskell.rs test_invalid_repo_url)") {
    val lines = """Name: foo

source-repository head
  type: git
  location: not a valid url at all
"""
    val ds = Extractors.cabal("foo.cabal", lines).toOption.get
    assert(!ds.exists(_.field == "Repository"))
    assert(ds.exists(d => d.field == "Name" && d.str.contains("foo")))
  }
}
