package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.extract.Homepage
import graft.pipeline.Checks

/** Homepage-scrape (homepage.rs test_guess_from_page) and
  * check_upstream_metadata promotion vectors (lib.rs:3991-4156).
  */
class ChecksHomepageSpec extends AnyFunSuite {

  test("guess_from_page: the reference's inline vector") {
    val base = "https://example.com"
    val text = """
            <html>
                <body>
                    <a href="https://github.com/owner/repo">GitHub</a>
                    <a href="https://git.samba.org/samba.org">repository</a>

                    And here is a link with an aria-label:
                    <a href="https://bugs.debian.org/123" aria-label="bug tracker">Debian bug tracker</a>
                </body>
            </html>
        """
    val got = Homepage.guessFromPage(text, base)
      .map(d => (d.field, d.str.get, d.certainty.get, d.origin.get))
    assert(got == List(
      ("Repository", "https://github.com/owner/repo", Certainty.Possible, base),
      ("Repository", "https://git.samba.org/samba.org", Certainty.Possible, base),
      ("Bug-Database", "https://bugs.debian.org/123", Certainty.Possible, base)))
  }

  test("guess_from_page: relative hrefs resolve against the base") {
    val got = Homepage.guessFromPage(
      """<a href="/code">repository</a><a href="bugs/">bug tracker</a>""",
      "https://example.com/proj/index.html")
    assert(got.map(_.str.get) == List(
      "https://example.com/code", "https://example.com/proj/bugs/"))
  }

  private def d(f: String, v: String, c: Int) = Datum(f, UStr(v), Some(c), None)

  test("Repository: valid canonicalizes, Confident promotes, browse syncs") {
    val md = List(
      d("Repository", "http://github.com/o/r", Certainty.Confident),
      d("Repository-Browse", "https://github.com/o/r", Certainty.Possible))
    val out = Checks.applyProbes(md, {
      case ("Repository", "http://github.com/o/r") => Checks.Valid("https://github.com/o/r.git")
      case _ => Checks.Unverifiable
    })
    val repo = out.find(_.field == "Repository").get
    assert(repo.str.contains("https://github.com/o/r.git"))
    assert(repo.certainty.contains(Certainty.Certain))
    // derived browse url of the canonical repo equals the held browse value →
    // the browse certainty syncs to the repository's
    val browse = out.find(_.field == "Repository-Browse").get
    assert(browse.certainty.contains(Certainty.Certain))
  }

  test("Repository: Likely is NOT promoted on valid (only Confident is)") {
    val out = Checks.applyProbes(
      List(d("Repository", "https://github.com/o/r", Certainty.Likely)),
      { case _ => Checks.Valid("https://github.com/o/r") })
    assert(out.head.certainty.contains(Certainty.Likely))
  }

  test("Homepage/Bug-Database: valid promotes >= Likely to Certain; invalid deletes") {
    val md = List(
      d("Homepage", "https://a.example.com/", Certainty.Likely),
      d("Bug-Database", "https://b.example.com/bugs", Certainty.Possible),
      d("Bug-Submit", "https://c.example.com/new", Certainty.Confident))
    val out = Checks.applyProbes(md, {
      case ("Homepage", u)     => Checks.Valid(u)
      case ("Bug-Database", u) => Checks.Valid(u)
      case ("Bug-Submit", _)   => Checks.Invalid
      case _                   => Checks.Unverifiable
    })
    assert(out.find(_.field == "Homepage").get.certainty.contains(Certainty.Certain))
    // Possible stays Possible even on a valid probe
    assert(out.find(_.field == "Bug-Database").get.certainty.contains(Certainty.Possible))
    assert(!out.exists(_.field == "Bug-Submit"))
  }

  test("unprobed and non-URL values are untouched") {
    val md = List(
      d("Homepage", "not a url", Certainty.Likely),
      d("Name", "proj", Certainty.Certain))
    val out = Checks.applyProbes(md, { case _ => Checks.Invalid })
    assert(out == md) // Homepage doesn't parse as URL → its probe never runs
  }

  test("Screenshots: Likely list keeps live, drops dead, inconclusive demotes") {
    val md = List(Datum("Screenshots",
      UStrings(List("https://x/1.png", "https://x/2.png", "https://x/3.png")),
      Some(Certainty.Likely), None))
    val out = Checks.applyProbes(md, (_, _) => Checks.Unverifiable, {
      case "https://x/1.png" => Some(true)
      case "https://x/2.png" => Some(false)
      case _                 => None
    })
    assert(out.head.value == UStrings(List("https://x/1.png")))
    assert(out.head.certainty.contains(Certainty.Likely)) // one inconclusive
    // all-conclusive case promotes to Certain
    val out2 = Checks.applyProbes(md, (_, _) => Checks.Unverifiable,
      u => Some(u != "https://x/2.png"))
    assert(out2.head.value == UStrings(List("https://x/1.png", "https://x/3.png")))
    assert(out2.head.certainty.contains(Certainty.Certain))
  }

  test("Certain screenshots are not re-verified") {
    val md = List(Datum("Screenshots", UStrings(List("https://x/1.png")),
      Some(Certainty.Certain), None))
    val out = Checks.applyProbes(md, (_, _) => Checks.Unverifiable, _ => Some(false))
    assert(out == md)
  }

  // extend-stage SourceForge derivation (lib.rs:3521-3554)

  private def sfRun(ds: Datum*): List[Datum] = {
    val md = scala.collection.mutable.ArrayBuffer.from(ds)
    graft.pipeline.Summarize.extendSfArchive(md)
    md.toList
  }

  test("SF derivation: project-page and host forms, Likely cap, origin") {
    val out = sfRun(Datum("Homepage",
      UStr("https://sourceforge.net/projects/gtab/"), Some(Certainty.Certain), Some("f")))
    assert(out.map(x => (x.field, x.str.get, x.certainty.get, x.origin.get)) == List(
      ("Homepage", "https://sourceforge.net/projects/gtab/", 3, "f"),
      ("Archive", "SourceForge", Certainty.Likely, "derived from Homepage"),
      ("SourceForge-Project", "gtab", Certainty.Likely, "derived from Homepage")))
    // host form (the reference regex with its unescaped dots)
    val out2 = sfRun(d("Homepage", "http://zsh.sourceforge.net/", Certainty.Likely))
    assert(out2.exists(x => x.field == "SourceForge-Project" && x.str.contains("zsh")))
    // certainty below Likely passes through the min()
    val out3 = sfRun(
      Datum("Homepage", UStr("http://zsh.sourceforge.net/"), Some(Certainty.Possible), None))
    assert(out3.find(_.field == "Archive").get.certainty.contains(Certainty.Possible))
  }

  test("SF derivation: reference field order and break-on-first") {
    // Homepage is non-SF, Repository matches → derived from Repository; a
    // later matching Download is never consulted (break)
    val out = sfRun(
      d("Homepage", "https://example.com/", Certainty.Certain),
      d("Repository", "https://sourceforge.net/p/gtab/code", Certainty.Certain),
      d("Download", "https://sourceforge.net/projects/other/files", Certainty.Certain))
    assert(out.find(_.field == "SourceForge-Project").get.str.contains("gtab"))
    assert(out.find(_.field == "Archive").get.origin.contains("derived from Repository"))
  }

  test("SF derivation inserts unconditionally (replaces an existing Archive)") {
    val out = sfRun(
      d("Archive", "CRAN", Certainty.Certain),
      d("Homepage", "https://sourceforge.net/projects/gtab/", Certainty.Certain))
    assert(out.count(_.field == "Archive") == 1)
    assert(out.find(_.field == "Archive").get.str.contains("SourceForge"))
  }

  test("SF derivation runs inside the per-subject summarize (extend stage)") {
    val files = Map("package.json" ->
      """{"name":"gtab","homepage":"https://sourceforge.net/projects/gtab/"}""")
    val (md, _) = graft.pipeline.Summarize.summarize(files, "gtab")
    assert(md.exists(x => x.field == "Archive" && x.str.contains("SourceForge")))
    assert(md.exists(x => x.field == "SourceForge-Project" && x.str.contains("gtab")))
    val a = md.find(_.field == "Archive").get
    assert(a.certainty.contains(Certainty.Likely))
    assert(a.origin.contains("derived from Homepage"))
  }

  test("SF derivation: no URL field matches → untouched") {
    val md = List(
      d("Homepage", "https://example.com/", Certainty.Certain),
      d("Repository", "https://github.com/o/r", Certainty.Certain))
    assert(sfRun(md: _*) == md)
  }
}
