package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.urls._

/** Test vectors ported from the reference's inline tests:
  * /root/reference/src/vcs.rs:643-724,1381-1846, src/vcs_command.rs:91-152,
  * src/lib.rs:4233-4478.
  */
class UrlAlgebraSpec extends AnyFunSuite {

  private def url(s: String): UrlLite = UrlLite.parse(s).get

  test("UrlLite basic serialization") {
    assert(url("https://github.com").toString == "https://github.com/")
    assert(url("https://github.com/foo/bar").toString == "https://github.com/foo/bar")
    assert(url("git+ssh://git@foo/blah").toString == "git+ssh://git@foo/blah")
    assert(url("lp:test-package").path == "test-package")
    assert(UrlLite.parse("user/repo").isEmpty)
    assert(UrlLite.parse("git@github.com:foo/bar").isEmpty)
    assert(url("https://github.com:443/x").toString == "https://github.com/x")
    assert(url("http://example.com:8080/x").toString == "http://example.com:8080/x")
  }

  test("UrlLite join") {
    assert(url("https://github.com").join("jelmer/blah").get.toString ==
      "https://github.com/jelmer/blah")
    assert(url("https://github.com").join("jelmer/dulwich/tree/HEAD/foo").get.toString ==
      "https://github.com/jelmer/dulwich/tree/HEAD/foo")
  }

  test("plausible_url") {
    assert(!Vcs.plausibleUrl("the"))
    assert(!Vcs.plausibleUrl("1"))
    assert(Vcs.plausibleUrl("git@foo:blah"))
    assert(Vcs.plausibleUrl("git+ssh://git@foo/blah"))
    assert(Vcs.plausibleUrl("https://foo/blah"))
  }

  test("is_gitlab_site") {
    assert(Vcs.isGitlabSite("gitlab.com"))
    assert(Vcs.isGitlabSite("gitlab.example.com"))
    assert(Vcs.isGitlabSite("salsa.debian.org"))
    assert(!Vcs.isGitlabSite("github.com"))
    assert(!Vcs.isGitlabSite("foo.example.com"))
  }

  test("canonical_git_repo_url") {
    assert(Vcs.canonicalGitRepoUrl(url("https://github.com/jelmer/example"))
      .map(_.toString).contains("https://github.com/jelmer/example.git"))
    assert(Vcs.canonicalGitRepoUrl(url("https://salsa.debian.org/jelmer/example"))
      .map(_.toString).contains("https://salsa.debian.org/jelmer/example.git"))
    assert(Vcs.canonicalGitRepoUrl(url("https://salsa.debian.org/jelmer/example.git")).isEmpty)
  }

  test("find_public_repo_url") {
    assert(Vcs.findPublicRepoUrl("ssh://git@github.com/jelmer/example")
      .contains("https://github.com/jelmer/example"))
    assert(Vcs.findPublicRepoUrl("https://github.com/jelmer/example")
      .contains("https://github.com/jelmer/example"))
    assert(Vcs.findPublicRepoUrl("git@github.com:jelmer/example")
      .contains("https://github.com/jelmer/example"))
    assert(Vcs.findPublicRepoUrl("ssh://salsa.debian.org/jelmer/example")
      .contains("https://salsa.debian.org/jelmer/example"))
    assert(Vcs.findPublicRepoUrl("https://salsa.debian.org/jelmer/example")
      .contains("https://salsa.debian.org/jelmer/example"))
  }

  test("guess_repo_from_url") {
    def guess(s: String): Option[String] =
      Vcs.guessRepoFromUrl(url(s))

    assert(guess("https://github.com/jelmer/blah").contains("https://github.com/jelmer/blah"))
    assert(guess("https://github.com/jelmer/blah/blob/README")
      .contains("https://github.com/jelmer/blah"))
    assert(guess("https://github.com/jelmer").isEmpty)
    assert(guess("https://www.jelmer.uk/").isEmpty)
    assert(guess("http://code.launchpad.net/blah").contains("http://code.launchpad.net/blah"))
    assert(guess("http://launchpad.net/bzr/+download").contains("https://code.launchpad.net/bzr"))
    assert(guess("https://git.savannah.gnu.org/git/auctex.git")
      .contains("https://git.savannah.gnu.org/git/auctex.git"))
    assert(guess("https://git.savannah.gnu.org/blah/auctex.git").isEmpty)
    assert(guess("https://bitbucket.org/fenics-project/dolfin/downloads/")
      .contains("https://bitbucket.org/fenics-project/dolfin"))
    assert(guess("https://travis-ci.org/jelmer/dulwich")
      .contains("https://github.com/jelmer/dulwich"))
    assert(guess("https://coveralls.io/r/jelmer/dulwich")
      .contains("https://github.com/jelmer/dulwich"))
    assert(guess("https://gitlab.com/jelmer/dulwich")
      .contains("https://gitlab.com/jelmer/dulwich"))
    assert(guess("https://gitlab.com/jelmer/dulwich/tags")
      .contains("https://gitlab.com/jelmer/dulwich"))
  }

  test("browse_url_from_repo_url") {
    def browse(u: String, branch: Option[String] = None, subpath: Option[String] = None) =
      Vcs.browseUrlFromRepoUrl(Vcs.VcsLocation(url(u), branch, subpath)).map(_.toString)

    assert(browse("https://github.com/jelmer/dulwich").contains("https://github.com/jelmer/dulwich"))
    assert(browse("https://github.com/jelmer/dulwich.git").contains("https://github.com/jelmer/dulwich"))
    assert(browse("https://github.com/jelmer/dulwich.git", branch = Some("foo"))
      .contains("https://github.com/jelmer/dulwich/tree/foo"))
    assert(browse("https://github.com/jelmer/dulwich.git", subpath = Some("foo"))
      .contains("https://github.com/jelmer/dulwich/tree/HEAD/foo"))
  }

  test("fixup_git_url") {
    assert(Vcs.fixupGitUrl("https://github.com:jelmer/dulwich") == "https://github.com/jelmer/dulwich")
    assert(Vcs.fixupGitUrl("git://github.com/jelmer/dulwich") == "https://github.com/jelmer/dulwich")
    assert(Vcs.fixupGitUrl("https://github.com/jelmer/dulwich") == "https://github.com/jelmer/dulwich")
    assert(Vcs.fixupGitUrl("git://salsa.debian.org/jelmer/dulwich") == "https://salsa.debian.org/jelmer/dulwich")
    assert(Vcs.fixupGitUrl("https://salsa.debian.org/cgit/jelmer/dulwich") == "https://salsa.debian.org/jelmer/dulwich")
    assert(Vcs.fixupGitUrl("https://salsa.debian.org//salve/auctex.git") == "https://salsa.debian.org/salve/auctex.git")
    assert(Vcs.fixupGitUrl("https://salsa.debian.org:/mckinstry/lcov.git") == "https://salsa.debian.org/mckinstry/lcov.git")
    assert(Vcs.fixupGitUrl("git://git@github.com:RPi-Distro/pgzero.git") == "https://github.com/RPi-Distro/pgzero.git")
    assert(Vcs.fixupGitUrl("https://git@salsa.debian.org:debian-astro-team/pyavm.git") == "https://salsa.debian.org/debian-astro-team/pyavm.git")
    assert(Vcs.fixupGitUrl("git://anongit.freedesktop.org/xorg/xserver") == "https://gitlab.freedesktop.org/xorg/xserver")
    assert(Vcs.fixupGitUrl("git://anongit.freedesktop.org/git/xorg/lib/libSM") == "https://gitlab.freedesktop.org/xorg/lib/libSM")
    assert(Vcs.fixupGitUrl("git://anongit.kde.org/kdev-php.git") == "https://anongit.kde.org/kdev-php.git")
    assert(Vcs.fixupGitUrl("https://git.gnome.org/browse/alacarte") == "https://gitlab.gnome.org/GNOME/alacarte")
  }

  test("fixup_git_location") {
    def fixLoc(s: String): String = {
      val loc = Vcs.locationFromStr(s).get
      Vcs.unsplitVcsUrl(Vcs.fixupGitLocation(loc))
    }
    assert(fixLoc("https://github.com:jelmer/dulwich -b blah") == "https://github.com/jelmer/dulwich -b blah")
    assert(fixLoc("https://salsa.debian.org/jelmer/dulwich/tree/master") == "https://salsa.debian.org/jelmer/dulwich -b master")
    assert(fixLoc("https://github.com/blah/blah/tree/master") == "https://github.com/blah/blah -b master")
  }

  test("sanitize_url") {
    assert(Vcs.sanitizeUrl(":extssh:_anoncvs@anoncvs.example.org:/cvs") ==
      ":extssh:_anoncvs@anoncvs.example.org:/cvs")
    assert(Vcs.sanitizeUrl("not a valid url at all") == "not a valid url at all")
    assert(Vcs.sanitizeUrl("https://github.com/jelmer/example") ==
      "https://github.com/jelmer/example.git")
    assert(Vcs.sanitizeUrl("http://github.com/jackmoore/autosize.git") ==
      "https://github.com/jackmoore/autosize.git")
  }

  test("find_secure_repo_url lp") {
    assert(Vcs.findSecureRepoUrl(url("lp:test-package")).map(_.toString)
      .contains("https://code.launchpad.net/test-package"))
    assert(Vcs.findSecureRepoUrl(url("lp:ubuntu/test-package")).map(_.toString)
      .contains("https://code.launchpad.net/ubuntu/test-package"))
  }

  test("vcs command parsing") {
    assert(VcsCommand.urlFromGitCloneCommand("git clone https://github.com/foo/bar foo")
      .contains("https://github.com/foo/bar"))
    assert(VcsCommand.urlFromGitCloneCommand("git clone https://github.com/jelmer/blah")
      .contains("https://github.com/jelmer/blah"))
    assert(VcsCommand.urlFromGitCloneCommand("git clone https://github.com/jelmer/blah target")
      .contains("https://github.com/jelmer/blah"))
    assert(VcsCommand.urlFromGitCloneCommand("git clone -b foo https://github.com/jelmer/blah target")
      .contains("https://github.com/jelmer/blah"))
    assert(VcsCommand.urlFromGitCloneCommand("git ls-tree").isEmpty)
    assert(VcsCommand.urlFromFossilCloneCommand("fossil clone https://example.com/repo/blah blah.fossil")
      .contains("https://example.com/repo/blah"))
  }

  test("forge algebra github") {
    assert(Forges.GitHub.bugDatabaseUrlFromRepoUrl(url("https://github.com/jackmoore/autosize.git"))
      .map(_.toString).contains("https://github.com/jackmoore/autosize/issues"))
    assert(Forges.GitHub.bugSubmitUrlFromBugDatabaseUrl(url("https://github.com/jackmoore/autosize/issues"))
      .map(_.toString).contains("https://github.com/jackmoore/autosize/issues/new"))
    assert(Forges.GitHub.bugDatabaseUrlFromBugSubmitUrl(url("https://github.com/jackmoore/autosize/issues/new"))
      .map(_.toString).contains("https://github.com/jackmoore/autosize/issues"))
  }

  test("person parsing") {
    assert(Person.parse("Somebody <somebody@example.com>") ==
      Person(Some("Somebody"), Some("somebody@example.com"), None))
    assert(Person.parse("Jelmer Vernooij") == Person(Some("Jelmer Vernooij"), None, None))
    assert(Person.parse("jelmer@jelmer.uk") == Person(None, Some("jelmer@jelmer.uk"), None))
    assert(Person.parse("Name <email@x.org> (https://example.com)") ==
      Person(Some("Name"), Some("email@x.org"), Some("https://example.com")))
    assert(Person.parse("somebody at example.com") ==
      Person(None, Some("somebody@example.com"), None))
  }

  test("merge update_from_guesses first-wins on ties") {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Datum]
    Merge.updateFromGuesses(buf, List(
      Datum("Name", UStr("GNU Autoconf"), Some(Certainty.Certain), None),
      Datum("Name", UStr("autoconf"), Some(Certainty.Certain), None)
    ))
    assert(buf.toList == List(Datum("Name", UStr("GNU Autoconf"), Some(Certainty.Certain), None)))
    Merge.updateFromGuesses(buf, List(
      Datum("Name", UStr("autoconf2"), Some(Certainty.Certain), None)
    ))
    assert(buf.head.str.contains("GNU Autoconf"))
  }

  test("known_bad_guess") {
    assert(KnownBad.isBad(Datum("Homepage", UStr("https://pypi.org/project/foo"), None, None)))
    assert(KnownBad.isBad(Datum("Repository", UStr("https://anongit.kde.org/x"), None, None)))
    assert(KnownBad.isBad(Datum("Name", UStr("package"), None, None)))
    assert(KnownBad.isBad(Datum("Version", UStr("unknown"), None, None)))
    assert(!KnownBad.isBad(Datum("Name", UStr("dulwich"), None, None)))
    assert(KnownBad.isBad(Datum("Repository", UStr("https://x.org/${foo}"), None, None)))
  }

  test("lib.rs forge vectors (src/lib.rs:4257-4462)") {
    def u(x: String) = UrlLite.parse(x).get
    // bug_database_url_from_bug_submit_url
    assert(Forges.bugDatabaseUrlFromBugSubmitUrl(u("https://bugs.launchpad.net/bugs/+filebug"))
      .map(_.toString).contains("https://bugs.launchpad.net/bugs"))
    assert(Forges.bugDatabaseUrlFromBugSubmitUrl(u("https://github.com/dulwich/dulwich/issues/new"))
      .map(_.toString).contains("https://github.com/dulwich/dulwich/issues"))
    assert(Forges.bugDatabaseUrlFromBugSubmitUrl(u("https://sourceforge.net/p/dulwich/bugs/new"))
      .map(_.toString).contains("https://sourceforge.net/p/dulwich/bugs"))
    // github bug_database_url_from_repo_url
    assert(Forges.GitHub.bugDatabaseUrlFromRepoUrl(u("https://github.com/dulwich/dulwich.git"))
      .map(_.toString).contains("https://github.com/dulwich/dulwich/issues"))
    assert(Forges.GitHub.bugDatabaseUrlFromRepoUrl(u("ssh://git@github.com/dulwich/dulwich.git"))
      .map(_.toString).contains("https://github.com/dulwich/dulwich/issues"))
    assert(Forges.GitHub.bugDatabaseUrlFromRepoUrl(u("git://github.com/dulwich/dulwich"))
      .map(_.toString).contains("https://github.com/dulwich/dulwich/issues"))
    assert(Forges.GitHub.bugDatabaseUrlFromRepoUrl(u("https://github.com/dulwich")).isEmpty)
    // bug_database_from_issue_url
    assert(Forges.GitHub.bugDatabaseFromIssueUrl(u("https://github.com/dulwich/dulwich/issues/123"))
      .map(_.toString).contains("https://github.com/dulwich/dulwich/issues"))
    assert(Forges.GitHub.bugDatabaseFromIssueUrl(u("https://github.com/dulwich/dulwich")).isEmpty)
    // repo_url_from_merge_request_url
    assert(Forges.GitHub.repoUrlFromMergeRequestUrl(u("https://github.com/dulwich/dulwich/pull/123"))
      .map(_.toString).contains("https://github.com/dulwich/dulwich"))
    assert(Forges.GitHub.repoUrlFromMergeRequestUrl(u("https://github.com/dulwich/dulwich/issues/123")).isEmpty)
    // pecl extraction
    assert(Forges.extractPeclPackageName("https://pecl.php.net/package/redis").contains("redis"))
    assert(Forges.extractPeclPackageName("https://pecl.php.net/package/xdebug/2.9.0").contains("xdebug/2.9.0"))
    assert(Forges.extractPeclPackageName("https://example.com/something").isEmpty)
  }

  test("person vectors (src/lib.rs:4286-4321)") {
    assert(Person.parse("Foo Bar <foo@example.com>") ==
      Person(Some("Foo Bar"), Some("foo@example.com"), None))
    assert(Person.parse("Foo Bar") == Person(Some("Foo Bar"), None, None))
    assert(Person.parse("foo@example.com") == Person(None, Some("foo@example.com"), None))
    assert(Person.parse("<foo@example.com>") ==
      Person(Some(""), Some("foo@example.com"), None))
  }

  test("metadata_from_url sourceforge") {
    val ds = Forges.metadataFromUrl("https://sourceforge.net/projects/gtab/", None)
    assert(ds.exists(d => d.field == "SourceForge-Project" && d.str.contains("gtab")))
    assert(ds.exists(d => d.field == "Archive" && d.str.contains("SourceForge")))
  }
}
