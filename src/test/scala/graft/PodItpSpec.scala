package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.extract.Extractors

/** Unit vectors for guess_from_pod (/root/reference/src/providers/perl.rs:15-79)
  * and find_itp (debian.rs:363-370), derived from a close read of the
  * reference (it ships no inline tests for either). The POD vectors pin the
  * reference's two quirks: section lines concatenate without newlines, and
  * markup stripping only fires on a literal backslash before '<'.
  */
class PodItpSpec extends AnyFunSuite {

  private def pod(s: String): List[Datum] =
    Extractors.pod("README.pod", s).toOption.get

  test("NAME with ' - ' yields Name + Summary at Confident") {
    val ds = pod("=head1 NAME\n\nFoo::Bar - does things\n")
    assert(ds.map(d => (d.field, d.value, d.certainty)) == List(
      ("Name", UStr("Foo::Bar"), Some(Certainty.Confident)),
      ("Summary", UStr("does things"), Some(Certainty.Confident))))
  }

  test("NAME without ' - ' yields Name only when it has no space") {
    assert(pod("=head1 NAME\n\nFoo::Bar\n")
      .map(d => (d.field, d.value)) == List(("Name", UStr("Foo::Bar"))))
    // a spaced line without " - " yields nothing (perl.rs:69)
    assert(pod("=head1 NAME\n\nFoo Bar baz\n").isEmpty)
  }

  test("DESCRIPTION at Certain; lines concatenate without newlines (perl.rs:29)") {
    val ds = pod("=head1 DESCRIPTION\n\nline one\nline two\n")
    assert(ds == List(Datum("Description", UStr("line oneline two"),
      Some(Certainty.Certain), Some("README.pod"))))
  }

  test("markup strips only with a literal backslash before '<' (perl.rs:37-45)") {
    val ds = pod("=head1 DESCRIPTION\n\nB\\<bold> and C<code> and L\\<x|y\\> and L\\<z\\>\n")
    assert(ds.head.str.contains("bold and C<code> and y and z"))
  }

  test("sections key by uppercase header; duplicate header resets (perl.rs:25)") {
    val ds = pod("=head1 Name\n\nfoo\n=head1 NAME\n\nbar\n")
    assert(ds.map(d => (d.field, d.value)) == List(("Name", UStr("bar"))))
  }

  test("find_itp matches the initial-release change line") {
    assert(Extractors.findItp(List("* New upstream release",
      "* Initial release. (Closes: #123456)")) == Some(123456))
    assert(Extractors.findItp(List("* Initial release. Closes: #7")) == Some(7))
    assert(Extractors.findItp(List("* Initial packaging")) == None)
  }

  test("metadata_from_itp_bug_body matches the reference inline vector (debian.rs:185-240)") {
    val body =
      """Package: wnpp
        |Severity: wishlist
        |Owner: Jelmer Vernooij <jelmer@debian.org>
        |Debbugs-Cc: debian-devel@lists.debian.org
        |
        |* Package name    : setuptools-gettext
        |  Version         : 0.0.1
        |  Upstream Author : Breezy Team <breezy-core@googlegroups.com>
        |* URL             : https://github.com/jelmer/setuptools-gettext
        |* License         : GPL
        |  Programming Lang: Python
        |  Description     : Compile .po files into .mo files
        |
        |This extension for setuptools compiles gettext .po files
        |found in the source directory into .mo files and installs them.
        |
        |""".stripMargin
    val ds = Extractors.metadataFromItpBugBody(None, body).toOption.get
    assert(ds.map(d => (d.field, d.value, d.certainty)) == List(
      ("Name", UStr("setuptools-gettext"), Some(Certainty.Confident)),
      ("Version", UStr("0.0.1"), Some(Certainty.Possible)),
      ("Author", UPersons(List(Person(Some("Breezy Team"),
        Some("breezy-core@googlegroups.com"), None))), Some(Certainty.Confident)),
      ("Homepage", UStr("https://github.com/jelmer/setuptools-gettext"), Some(Certainty.Confident)),
      ("License", UStr("GPL"), Some(Certainty.Confident)),
      ("Summary", UStr("Compile .po files into .mo files"), Some(Certainty.Confident)),
      ("Description", UStr("This extension for setuptools compiles gettext .po files\nfound in the source directory into .mo files and installs them.\n"),
        Some(Certainty.Likely))))
  }

  test("debianChangelog emits Debian-ITP at Certain") {
    val cl = "foo (2.0-1) unstable; urgency=low\n\n  * Initial release. (Closes: #42)\n\n -- A <a@b.c>  Mon, 05 Jan 2026 10:00:00 +0000\n"
    val ds = Extractors.debianChangelog("debian/changelog", cl).toOption.get
    assert(ds.contains(Datum("Debian-ITP", UInt(42),
      Some(Certainty.Certain), Some("debian/changelog"))))
  }
}
