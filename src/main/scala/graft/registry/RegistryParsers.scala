package graft.registry

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.core._
import graft.core.Certainty.{Certain => CERTAIN}

/** Pure registry-payload → datums parsers — the offline core of the
  * reference's network providers. The reference unit-tests exactly these
  * parses against canned API payloads in src/testdata/; here they run as
  * columnar functions over registry-snapshot side tables (a crawl of the
  * registry APIs landed as parquet), feeding `KgEngine.enrichFromRegistry`.
  *
  * Ports (payload shape and emission order are the reference's; fetching is
  * out of scope by golden config):
  *   - PyPI JSON:        /root/reference/src/providers/python.rs:1128-1376
  *   - npm registry:     /root/reference/src/providers/node.rs:64-275
  *   - crates.io API:    /root/reference/src/providers/rust.rs:230-325
  *   - MetaCPAN release: /root/reference/src/providers/perl.rs:295-575
  *   - RubyGems API:     /root/reference/src/providers/ruby.rs:161-307
  *   - SourceForge REST: /root/reference/src/forges/sourceforge.rs:19-146
  *   - PECL page HTML:   /root/reference/src/providers/php.rs:42-97
  *
  * Every parser returns Left(reason) on malformed payloads (the reference
  * surfaces serde errors as ProviderError::ParseError) so a registry-snapshot
  * job can route bad rows to a quarantine column instead of failing a task.
  */
object RegistryParsers {

  private val mapper = new ObjectMapper()

  private def str(n: JsonNode, f: String): Option[String] = {
    val v = n.get(f)
    if (v == null || v.isNull) None
    else if (v.isTextual) Some(v.asText) else None
  }

  private def req(n: JsonNode, f: String, what: String): Either[String, String] =
    str(n, f).toRight(s"$what: missing field $f")

  private def parseJson(payload: String, what: String): Either[String, JsonNode] =
    try {
      val n = mapper.readTree(payload)
      if (n != null && n.isObject) Right(n) else Left(s"$what: not a JSON object")
    } catch { case e: Exception => Left(s"$what: ${e.getMessage}") }

  private def datum(field: String, v: UValue, certainty: Option[Int],
                    origin: Option[String] = None): Datum =
    Datum(field, v, certainty, origin)

  // ---------- PyPI (python.rs:1281-1376) ----------

  /** `parse_python_project_urls` (python.rs:326-374). The reference consumes
    * a HashMap (arbitrary iteration order); this port iterates sorted by
    * url_type so the emission is deterministic — a requirement for the
    * oracle-checked Spark surface, and a superset guarantee of the
    * reference's (order-insensitive) semantics.
    */
  def parsePythonProjectUrls(urls: Seq[(String, String)], origin: String): List[Datum] =
    urls.sortBy(_._1).toList.flatMap { case (urlType, url) =>
      val field = urlType match {
        case "GitHub" | "Repository" | "Source Code" | "Source" => Some("Repository")
        case "Bug Tracker" | "Bug Reports"                      => Some("Bug-Database")
        case "Documentation"                                    => Some("Documentation")
        case "Funding"                                          => Some("Funding")
        case "Homepage"                                         => Some("Homepage")
        case _                                                  => None
      }
      field.map(f => datum(f, UStr(url), Some(CERTAIN), Some(origin)))
    }

  /** PyPI project JSON → datums (TryInto<UpstreamMetadata> for PypiProject,
    * python.rs:1281-1376): Author, Description, Homepage, License, Name,
    * Maintainer, Version, Keywords, project_urls, sdist Download, Summary —
    * all Certain.
    */
  def parsePypi(payload: String): Either[String, List[Datum]] =
    parseJson(payload, "pypi").flatMap { root =>
      val info = root.get("info")
      if (info == null || !info.isObject) Left("pypi: missing info object")
      else for {
        name <- req(info, "name", "pypi")
        version <- req(info, "version", "pypi")
        description <- req(info, "description", "pypi")
        summary <- req(info, "summary", "pypi")
      } yield {
        val out = List.newBuilder[Datum]
        str(info, "author").foreach { a =>
          out += datum("Author",
            UPersons(List(Person(Some(a), str(info, "author_email")))), Some(CERTAIN))
        }
        out += datum("Description", UStr(description), Some(CERTAIN))
        str(info, "home_page").foreach(h =>
          out += datum("Homepage", UStr(h), Some(CERTAIN)))
        str(info, "license").foreach(l =>
          out += datum("License", UStr(l), Some(CERTAIN)))
        out += datum("Name", UStr(name), Some(CERTAIN))
        str(info, "maintainer").foreach { m =>
          out += datum("Maintainer",
            UPerson(Person(Some(m), str(info, "maintainer_email"))), Some(CERTAIN))
        }
        out += datum("Version", UStr(version), Some(CERTAIN))
        str(info, "keywords").foreach { ks =>
          out += datum("Keywords",
            UStrings(ks.split(',').map(_.trim).toList), Some(CERTAIN))
        }
        val projectUrls = Option(info.get("project_urls")).filter(_.isObject)
          .map { pu =>
            val b = List.newBuilder[(String, String)]
            pu.properties().forEach(e =>
              if (e.getValue.isTextual) b += (e.getKey -> e.getValue.asText))
            b.result()
          }.getOrElse(Nil)
        out ++= parsePythonProjectUrls(projectUrls, "pypi")
        Option(root.get("urls")).filter(_.isArray).foreach { urls =>
          urls.forEach { u =>
            if (str(u, "packagetype").contains("sdist"))
              str(u, "url").foreach(d =>
                out += datum("Download", UStr(d), Some(CERTAIN)))
          }
        }
        out += datum("Summary", UStr(summary), Some(CERTAIN))
        out.result()
      }
    }

  // ---------- npm (node.rs:179-275) ----------

  private def npmPerson(n: JsonNode): Option[Person] =
    for { name <- str(n, "name"); email <- str(n, "email") }
      yield Person(Some(name), Some(email))

  /** npm registry package JSON → datums. The reference attaches NO certainty
    * to npm datums (node.rs:186-270) — they arrive as None and the merge
    * lattice ranks them below every explicit level.
    */
  def parseNpm(payload: String): Either[String, List[Datum]] =
    parseJson(payload, "npm").flatMap { root =>
      for {
        name <- req(root, "name", "npm")
        description <- req(root, "description", "npm")
      } yield {
        val out = List.newBuilder[Datum]
        out += datum("Name", UStr(name), None)
        out += datum("Description", UStr(description), None)
        str(root, "homepage").foreach(h => out += datum("Homepage", UStr(h), None))
        Option(root.get("author")).filter(_.isObject).flatMap(npmPerson).foreach(p =>
          out += datum("Author", UPersons(List(p)), None))
        Option(root.get("repository")).filter(_.isObject)
          .flatMap(r => str(r, "url"))
          .foreach(u => out += datum("Repository", UStr(u), None))
        Option(root.get("bugs")).filter(_.isObject)
          .flatMap(b => str(b, "url"))
          .foreach(u => out += datum("Bug-Database", UStr(u), None))
        str(root, "license").foreach(l => out += datum("License", UStr(l), None))
        Option(root.get("keywords")).filter(_.isArray).foreach { ks =>
          val b = List.newBuilder[String]
          ks.forEach(k => if (k.isTextual) b += k.asText)
          out += datum("Keywords", UStrings(b.result()), None)
        }
        for {
          tags <- Option(root.get("dist-tags")).filter(_.isObject)
          latest <- str(tags, "latest")
          versions <- Option(root.get("versions")).filter(_.isObject)
          vdata <- Option(versions.get(latest)).filter(_.isObject)
        } {
          str(vdata, "version").foreach(v => out += datum("Version", UStr(v), None))
          Option(vdata.get("dist")).filter(_.isObject)
            .flatMap(d => str(d, "tarball"))
            .foreach(t => out += datum("Download", UStr(t), None))
        }
        out.result()
      }
    }

  // ---------- crates.io (rust.rs:272-325) ----------

  def parseCrates(payload: String): Either[String, List[Datum]] =
    parseJson(payload, "crates").flatMap { root =>
      val c = root.get("crate")
      if (c == null || !c.isObject) Left("crates: missing crate object")
      else for {
        name <- req(c, "name", "crates")
        version <- req(c, "newest_version", "crates")
      } yield {
        val out = List.newBuilder[Datum]
        out += datum("Name", UStr(name), Some(CERTAIN))
        str(c, "homepage").foreach(h => out += datum("Homepage", UStr(h), Some(CERTAIN)))
        str(c, "repository").foreach(r => out += datum("Repository", UStr(r), Some(CERTAIN)))
        str(c, "description").foreach(d => out += datum("Summary", UStr(d), Some(CERTAIN)))
        str(c, "license").foreach(l => out += datum("License", UStr(l), Some(CERTAIN)))
        out += datum("Version", UStr(version), Some(CERTAIN))
        out.result()
      }
    }

  // ---------- MetaCPAN (perl.rs:295-575) ----------

  def parseCpan(payload: String): Either[String, List[Datum]] =
    parseJson(payload, "cpan").flatMap { root =>
      for {
        name <- req(root, "name", "cpan")
        version <- req(root, "version", "cpan")
        downloadUrl <- req(root, "download_url", "cpan")
        author <- req(root, "author", "cpan")
      } yield List(
        datum("Name", UStr(name), Some(CERTAIN)),
        datum("Version", UStr(version), Some(CERTAIN)),
        datum("Homepage", UStr(downloadUrl), Some(CERTAIN)),
        datum("Download", UStr(downloadUrl), Some(CERTAIN)),
        datum("Author", UPersons(List(Person.parse(author))), Some(CERTAIN)))
    }

  // ---------- RubyGems (ruby.rs:213-307) ----------

  def parseRubygem(payload: String): Either[String, List[Datum]] =
    parseJson(payload, "rubygems").flatMap { root =>
      for {
        name <- req(root, "name", "rubygems")
        version <- req(root, "version", "rubygems")
        authors <- req(root, "authors", "rubygems")
        projectUri <- req(root, "project_uri", "rubygems")
      } yield {
        val out = List.newBuilder[Datum]
        out += datum("Name", UStr(name), Some(CERTAIN))
        out += datum("Version", UStr(version), Some(CERTAIN))
        out += datum("Author", UPersons(List(Person.parse(authors))), Some(CERTAIN))
        out += datum("Homepage",
          UStr(str(root, "homepage_uri").getOrElse(projectUri)), Some(CERTAIN))
        str(root, "wiki_uri").foreach(u => out += datum("Wiki", UStr(u), Some(CERTAIN)))
        str(root, "mailing_list_uri").foreach(u =>
          out += datum("MailingList", UStr(u), Some(CERTAIN)))
        str(root, "bug_tracker_uri").foreach(u =>
          out += datum("Bug-Database", UStr(u), Some(CERTAIN)))
        str(root, "funding_uri").foreach(u => out += datum("Funding", UStr(u), Some(CERTAIN)))
        str(root, "source_code_uri").foreach(u =>
          out += datum("Repository", UStr(u), Some(CERTAIN)))
        val licenses = {
          val b = List.newBuilder[String]
          Option(root.get("licenses")).filter(_.isArray)
            .foreach(_.forEach(l => if (l.isTextual) b += l.asText))
          b.result()
        }
        out += datum("License", UStr(licenses.mkString(", ")), Some(CERTAIN))
        str(root, "documentation_uri").foreach(u =>
          out += datum("Documentation", UStr(u), Some(CERTAIN)))
        str(root, "changelog_uri").foreach(u =>
          out += datum("Changelog", UStr(u), Some(CERTAIN)))
        out.result()
      }
    }

  // ---------- SourceForge REST (sourceforge.rs:19-146) ----------

  /** `parse_sf_json`, offline form: the reference's canonical-URL probe for
    * preferred_support_url is network-only, and its failure branch keeps the
    * raw URL — exactly the offline behavior (sourceforge.rs:37-47).
    */
  def parseSfJson(payload: String, project: String,
                  subproject: Option[String]): Either[String, List[Datum]] =
    parseJson(payload, "sourceforge").map { root =>
      val out = List.newBuilder[Datum]
      str(root, "name").foreach(n => out += datum("Name", UStr(n), Some(CERTAIN)))
      str(root, "external_homepage").foreach(h =>
        out += datum("Homepage", UStr(h), Some(CERTAIN)))
      str(root, "preferred_support_url").filter(_.nonEmpty).foreach(u =>
        out += datum("Bug-Database", UStr(u), Some(CERTAIN)))

      val vcsNames = Set("hg", "git", "svn", "cvs", "bzr")
      var tools: List[(String, Option[String], JsonNode)] =
        Option(root.get("tools")).filter(_.isArray).map { ts =>
          val b = List.newBuilder[(String, Option[String], JsonNode)]
          ts.forEach { t =>
            val nm = str(t, "name").getOrElse("")
            if (vcsNames.contains(nm)) b += ((nm, str(t, "mount_label"), t))
          }
          b.result()
        }.getOrElse(Nil)

      // drop web/homepage mounts — only tools whose url ends in '/' are
      // inspected (the reference's strip_suffix('/') gate)
      if (tools.size > 1) tools = tools.filter { case (_, _, t) =>
        str(t, "url") match {
          case Some(u) if u.endsWith("/") =>
            val last = u.dropRight(1).split('/').lastOption.getOrElse("")
            !Set("www", "web", "homepage").contains(last)
          case _ => true
        }
      }
      if (tools.size > 1 && subproject.isDefined) {
        val filtered = tools.filter(_._2 == subproject)
        if (filtered.nonEmpty) tools = filtered
      }
      if (tools.exists(_._1 == "cvs")) tools = tools.filterNot(_._1 == "cvs")

      if (tools.size == 1) {
        val (kind, _, data) = tools.head
        kind match {
          case "git" | "svn" =>
            str(data, "clone_url_https_anon").foreach(u =>
              out += datum("Repository", UStr(u), Some(CERTAIN)))
          case "hg" =>
            str(data, "clone_url_ro").foreach(u =>
              out += datum("Repository", UStr(u), Some(CERTAIN)))
          case "cvs" =>
            val module = str(data, "url").map(_.stripSuffix("/"))
              .map { u => val segs = u.split('/'); if (segs.length >= 2) segs(segs.length - 2) else "" }
              .getOrElse("")
            out += datum("Repository",
              UStr(s"cvs+pserver://anonymous@$project.cvs.sourceforge.net/cvsroot/$module"),
              Some(CERTAIN))
          case _ => () // bzr: unimplemented in the reference too
        }
      }
      out.result()
    }

  // ---------- PECL package page (php.rs:42-97) ----------

  import graft.extract.MiniHtml
  import graft.extract.MiniHtml.{HElem, HNode, HText}

  private def textOf(n: HNode): String = n match {
    case HText(d)     => d
    case e: HElem     => e.children.map(textOf).mkString
  }

  private def walk(n: HNode)(f: HElem => Unit): Unit = n match {
    case e: HElem => f(e); e.children.foreach(walk(_)(f))
    case _        =>
  }

  private def firstAnchorContaining(root: HElem, needle: String): Option[String] = {
    var found: Option[String] = None
    walk(root) { e =>
      if (found.isEmpty && e.tag == "a" && textOf(e).contains(needle))
        found = e.attrs.get("href")
    }
    found
  }

  /** `guess_from_pecl_page`: Browse Source → Repository-Browse, Package Bugs
    * → Bug-Database, the Homepage table row's first link → Homepage. Emitted
    * in that order; malformed or empty pages yield Nil (php.rs:136-150).
    */
  def parsePeclPage(html: String): List[Datum] = {
    val root = MiniHtml.parse(html)
    val out = List.newBuilder[Datum]
    firstAnchorContaining(root, "Browse Source").foreach(h =>
      out += datum("Repository-Browse", UStr(h), Some(CERTAIN)))
    firstAnchorContaining(root, "Package Bugs").foreach(h =>
      out += datum("Bug-Database", UStr(h), Some(CERTAIN)))
    // th containing "Homepage" → its row's first td link
    var homepage: Option[String] = None
    walk(root) { row =>
      if (homepage.isEmpty &&
          row.children.exists {
            case th: HElem => th.tag == "th" && textOf(th).contains("Homepage")
            case _         => false
          }) {
        row.children.foreach {
          case td: HElem if td.tag == "td" && homepage.isEmpty =>
            walk(td) { a =>
              if (homepage.isEmpty && a.tag == "a") homepage = a.attrs.get("href")
            }
          case _ =>
        }
      }
    }
    homepage.foreach(h => out += datum("Homepage", UStr(h), Some(CERTAIN)))
    out.result()
  }

  /** Dispatch by registry kind — the one entry point the Spark side binds. */
  def parse(kind: String, payload: String): Either[String, List[Datum]] = kind match {
    case "pypi"     => parsePypi(payload)
    case "npm"      => parseNpm(payload)
    case "crates"   => parseCrates(payload)
    case "cpan"     => parseCpan(payload)
    case "rubygems" => parseRubygem(payload)
    case "pecl"     => Right(parsePeclPage(payload))
    case other      => Left(s"unknown registry kind: $other")
  }
}
