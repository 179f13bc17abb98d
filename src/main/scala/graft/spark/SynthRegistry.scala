package graft.spark

/** Deterministic registry-API payloads synthesized per doc_id — the
  * side-table analogue of SynthPages: what a crawl of the package-registry
  * APIs (pypi/npm/crates/metacpan/rubygems) would land as parquet. Every
  * payload is a pure function of doc_id, so the parse output has an exact
  * DuckDB oracle. Shapes mirror the reference's canned JSON testdata under
  * /root/reference/src/testdata.
  */
object SynthRegistry {

  val kinds: Vector[String] = Vector("pypi", "npm", "crates", "cpan", "rubygems")

  def kindOf(id: Long): String = kinds((id % 5).toInt)

  private def v(id: Long): String = "1." + (id % 10) + ".0"
  private def gh(id: Long): String =
    "https://github.com/org" + (id % 97) + "/proj" + id

  def pypi(id: Long, version: String): String =
    s"""{"info":{"name":"proj$id","version":"$version","summary":"Tool number $id.",""" +
    s""""description":"Desc $id","home_page":"https://proj$id.example.com/",""" +
    s""""license":"MIT","author":"Dev $id","author_email":"dev$id@example.com",""" +
    s""""keywords":"alpha, beta","project_urls":{"GitHub":"${gh(id)}",""" +
    s""""Bug Tracker":"${gh(id)}/issues"}},"urls":[""" +
    s"""{"packagetype":"sdist","url":"https://files.example.com/proj$id.tar.gz"},""" +
    s"""{"packagetype":"bdist_wheel","url":"https://files.example.com/proj$id.whl"}]}"""

  def npm(id: Long): String =
    s"""{"name":"proj$id","description":"left pad $id",""" +
    s""""homepage":"https://proj$id.example.com/",""" +
    s""""author":{"name":"Dev $id","email":"dev$id@example.com"},""" +
    s""""repository":{"type":"git","url":"git+${gh(id)}.git"},""" +
    s""""bugs":{"url":"${gh(id)}/issues"},"license":"MIT","keywords":["pad","fmt"],""" +
    s""""dist-tags":{"latest":"${v(id)}"},"versions":{"${v(id)}":{"version":"${v(id)}",""" +
    s""""dist":{"tarball":"https://registry.example.com/proj$id.tgz"}}}}"""

  def crates(id: Long): String =
    s"""{"crate":{"name":"proj$id","homepage":"https://proj$id.example.com/",""" +
    s""""repository":"${gh(id)}","description":"Tool number $id.",""" +
    s""""license":"MIT","newest_version":"${v(id)}"}}"""

  def cpan(id: Long): String =
    s"""{"name":"proj$id","version":"${v(id)}",""" +
    s""""download_url":"https://cpan.example.com/proj$id.tar.gz","author":"DEV$id"}"""

  def rubygems(id: Long): String =
    s"""{"name":"proj$id","version":"${v(id)}","authors":"Dev $id",""" +
    s""""project_uri":"https://rubygems.example.com/gems/proj$id",""" +
    s""""homepage_uri":"https://proj$id.example.com/","source_code_uri":"${gh(id)}",""" +
    s""""bug_tracker_uri":"${gh(id)}/issues",""" +
    s""""documentation_uri":"https://docs.example.com/proj$id","licenses":["MIT"]}"""

  /** SourceForge REST projectinfo payload (the shape of
    * /root/reference/src/testdata's sf JSON vectors, sourceforge.rs:181-231):
    * one git tool whose anonymous-https clone url is deterministic, plus
    * external_homepage and preferred_support_url.
    */
  def sf(id: Long): String =
    s"""{"name":"Proj $id","external_homepage":"https://proj$id.sf.example.com/",""" +
    s""""preferred_support_url":"https://sourceforge.net/p/proj$id/bugs/",""" +
    s""""tools":[{"name":"git","mount_label":"proj$id","url":"/p/proj$id/code/",""" +
    s""""clone_url_https_anon":"https://git.code.sf.net/p/proj$id/code"}]}"""

  /** External-directory payloads (the `consult_external_directory` branch,
    * lib.rs:3652-3694), one per directory, keyed by the Debian source
    * package name `pkg{id}`. Values are pure functions of id so the
    * dispatch composition has an exact DuckDB oracle.
    */
  def launchpadDir(id: Long): String =
    s"""{"homepage_url":"https://lp.example.com/h$id","display_name":"LpName$id",""" +
    s""""wiki_url":"https://lp.example.com/w$id","summary":"Lp summary $id",""" +
    s""""download_url":"https://lp.example.com/d$id"}"""

  def aurDir(id: Long): String =
    s"url=('https://aur.example.com/h$id')\n" +
    s"source=('https://aur.example.com/r$id.git')\n"

  /** Recipe `url=` line and Resources/Description `[Field]` lines in one
    * blob — the two gobo dialects are line-disjoint (gobo.rs:73-133).
    */
  def goboDir(id: Long): String =
    s"url=https://gobo.example.com/h$id\n[Name] GoboName$id\n"

  def repologyDir(id: Long): String =
    s"""[{"name":"pkg$id","status":"newest",""" +
    s""""www":["https://repology.example.org/h$id"],"licenses":["MIT-${id % 3}"],""" +
    s""""summary":"Repology summary $id",""" +
    s""""downloads":["https://repology.example.org/d$id"]}]"""

  def payload(id: Long): String = kindOf(id) match {
    case "pypi"     => pypi(id, v(id))
    case "npm"      => npm(id)
    case "crates"   => crates(id)
    case "cpan"     => cpan(id)
    case "rubygems" => rubygems(id)
  }
}
