package graft.extract

import graft.core._
import graft.urls._
import Parsers._

/** Per-artifact-kind extractors: pure functions content → datums, ported from
  * the modules under /root/reference/src/providers. Each returns
  * Either[error, datums]; an
  * error drops the whole guesser's output (reference logs-and-drops,
  * src/lib.rs:3905-3913). `origin` is the artifact's relpath.
  */
object Extractors {
  import Certainty._

  private def d(field: String, v: UValue, c: Int, origin: String): Datum =
    Datum(field, v, Some(c), Some(origin))

  type Result = Either[String, List[Datum]]

  // ---------- package.json (src/providers/package_json.rs:9-230) ----------

  def packageJson(origin: String, content: String): Result =
    parseJson(content).flatMap { root =>
      if (!root.isObject) return Left("package.json is not an object")
      val out = List.newBuilder[Datum]
      for ((field, value) <- sortedFields(root)) field match {
        case "name"        => jstr(value).foreach(s => out += d("Name", UStr(s), Certain, origin))
        case "homepage"    => jstr(value).foreach(s => out += d("Homepage", UStr(s), Certain, origin))
        case "description" => jstr(value).foreach(s => out += d("Summary", UStr(s), Certain, origin))
        case "license"     => jstr(value).foreach(s => out += d("License", UStr(s), Certain, origin))
        case "demo"        => jstr(value).foreach(s => out += d("Demo", UStr(s), Certain, origin))
        case "version"     => jstr(value).foreach(s => out += d("Version", UStr(s), Certain, origin))
        case "repository" =>
          val repoUrl: Option[String] =
            if (value.isTextual) Some(value.asText)
            else if (value.isObject) Option(value.get("url")).flatMap(jstr)
            else None
          repoUrl.foreach { ru =>
            UrlLite.parse(ru) match {
              case Some(u) if u.scheme == "github" =>
                out += d("Repository", UStr(s"https://github.com/${u.path}"), Likely, origin)
              case Some(u) =>
                out += d("Repository", UStr(u.toString), Certain, origin)
              case None =>
                // RelativeUrlWithoutBase: default to github
                out += d("Repository", UStr(s"https://github.com/$ru"), Likely, origin)
            }
          }
        case "bugs" =>
          if (value.isTextual)
            out += d("Bug-Database", UStr(value.asText), Certain, origin)
          else if (value.isObject)
            Option(value.get("email")).flatMap(jstr).foreach(e =>
              out += d("Bug-Database", UStr(s"mailto:$e"), Certain, origin))
        case "keywords" =>
          if (value.isArray) {
            val ks = List.newBuilder[String]
            value.forEach(k => if (k.isTextual) ks += k.asText)
            out += d("Keywords", UStrings(ks.result()), Certain, origin)
          }
        case "author" =>
          if (value.isObject) {
            val p = Person(
              name = Option(value.get("name")).flatMap(jstr),
              email = Option(value.get("email")).flatMap(jstr),
              url = Option(value.get("url")).flatMap(jstr))
            out += d("Author", UPersons(List(p)), Confident, origin)
          } else if (value.isTextual) {
            out += d("Author", UPersons(List(Person.parse(value.asText))), Confident, origin)
          }
        case _ => ()
      }
      Right(out.result())
    }

  // ---------- composer.json (src/providers/composer_json.rs) ----------

  def composerJson(origin: String, content: String): Result =
    parseJson(content).flatMap { root =>
      if (!root.isObject) return Left("Failed to parse composer.json")
      val out = List.newBuilder[Datum]
      for ((field, value) <- sortedFields(root)) field match {
        case "name"        => jstr(value).foreach(s => out += d("Name", UStr(s), Certain, origin))
        case "homepage"    => jstr(value).foreach(s => out += d("Homepage", UStr(s), Certain, origin))
        case "description" => jstr(value).foreach(s => out += d("Summary", UStr(s), Certain, origin))
        case "license"     => jstr(value).foreach(s => out += d("License", UStr(s), Certain, origin))
        case "version"     => jstr(value).foreach(s => out += d("Version", UStr(s), Certain, origin))
        case "keywords" =>
          if (value.isArray) {
            val ks = List.newBuilder[String]
            value.forEach(k => if (k.isTextual) ks += k.asText)
            out += d("Keywords", UStrings(ks.result()), Certain, origin)
          }
        case _ => ()
      }
      Right(out.result())
    }

  // ---------- metadata.json / Puppet (src/providers/metadata_json.rs) ----------

  def metadataJson(origin: String, content: String): Result =
    parseJson(content).flatMap { root =>
      if (!root.isObject) return Left("metadata.json is not an object")
      val out = List.newBuilder[Datum]
      for ((field, value) <- sortedFields(root)) field match {
        case "description" => jstr(value).foreach(s => out += d("Description", UStr(s), Certain, origin))
        case "name"        => jstr(value).foreach(s => out += d("Name", UStr(s), Certain, origin))
        case "version"     => jstr(value).foreach(s => out += d("Version", UStr(s), Certain, origin))
        case "url"         => jstr(value).foreach(s => out += d("Homepage", UStr(s), Certain, origin))
        case "license"     => jstr(value).foreach(s => out += d("License", UStr(s), Certain, origin))
        case "source" =>
          if (value.isTextual)
            out += d("Repository", UStr(value.asText), Certain, origin)
          else if (value.isArray) {
            val strs = List.newBuilder[String]
            value.forEach(v => if (v.isTextual) strs += v.asText)
            val ss = strs.result()
            if (ss.length >= 2) {
              Parsers.cvsToUrl(ss.head).foreach { base =>
                out += d("Repository", UStr(s"$base#${ss(1)}"), Certain, origin)
              }
            }
          }
        case "summary"    => jstr(value).foreach(s => out += d("Summary", UStr(s), Certain, origin))
        case "issues_url" => jstr(value).foreach(s => out += d("Bug-Database", UStr(s), Certain, origin))
        case "project_page" => jstr(value).foreach(s => out += d("Homepage", UStr(s), Likely, origin))
        case "author" =>
          if (value.isTextual)
            out += d("Author", UPersons(List(Person.parse(value.asText))), Likely, origin)
          else if (value.isArray) {
            var ok = true
            val ps = List.newBuilder[Person]
            value.forEach { v =>
              if (v.isTextual) ps += Person.parse(v.asText) else ok = false
            }
            if (ok) out += d("Author", UPersons(ps.result()), Likely, origin)
          }
        case _ => ()
      }
      Right(out.result())
    }

  // ---------- Perl META.json (src/providers/perl.rs:222-314) ----------

  def metaJson(origin: String, content: String): Result =
    parseJson(content).flatMap { root =>
      if (!root.isObject) return Left("META.json is not an object")
      val out = List.newBuilder[Datum]
      Option(root.get("name")).flatMap(jstr).foreach(s => out += d("Name", UStr(s), Certain, origin))
      Option(root.get("version")).flatMap(jstr).foreach { v =>
        out += d("Version", UStr(v.stripPrefix("v")), Certain, origin)
      }
      Option(root.get("abstract")).flatMap(jstr).foreach(s => out += d("Summary", UStr(s), Certain, origin))
      Option(root.get("resources")).filter(_.isObject).foreach { res =>
        Option(res.get("bugtracker")).filter(_.isObject)
          .flatMap(b => Option(b.get("web")).flatMap(jstr))
          .foreach(s => out += d("Bug-Database", UStr(s), Certain, origin))
        Option(res.get("homepage")).flatMap(jstr)
          .foreach(s => out += d("Homepage", UStr(s), Certain, origin))
        Option(res.get("repository")).filter(_.isObject).foreach { repo =>
          Option(repo.get("url")).flatMap(jstr)
            .foreach(s => out += d("Repository", UStr(s), Certain, origin))
          Option(repo.get("web")).flatMap(jstr)
            .foreach(s => out += d("Repository-Browse", UStr(s), Certain, origin))
        }
      }
      Right(out.result())
    }

  // ---------- Perl META.yml (src/providers/perl.rs:320-411) ----------

  def metaYml(origin: String, content: String): Result =
    parseYaml(content).map { data =>
      val out = List.newBuilder[Datum]
      yGet(data, "name").flatMap(yStr).foreach(s => out += d("Name", UStr(s), Certain, origin))
      yGet(data, "license").flatMap(yStr).foreach(s => out += d("License", UStr(s), Certain, origin))
      yGet(data, "version").flatMap(yStr).foreach(s => out += d("Version", UStr(s), Certain, origin))
      yGet(data, "resources").foreach { res =>
        yGet(res, "bugtracker").flatMap(yStr).foreach(s => out += d("Bug-Database", UStr(s), Certain, origin))
        yGet(res, "homepage").flatMap(yStr).foreach(s => out += d("Homepage", UStr(s), Certain, origin))
        yGet(res, "repository").foreach { repo =>
          yGet(repo, "url").flatMap(yStr) match {
            case Some(u) => out += d("Repository", UStr(u), Certain, origin)
            case None =>
              yStr(repo).foreach(u => out += d("Repository", UStr(u), Certain, origin))
          }
        }
      }
      out.result()
    }

  // ---------- dist.ini (src/providers/perl.rs:120-219) ----------

  def distIni(origin: String, content: String): Result =
    parseIni(content).map { sections =>
      val global = sections.getOrElse("", Nil).toMap
      val meta = sections.getOrElse("MetaResources", Nil).toMap
      val out = List.newBuilder[Datum]
      global.get("name").foreach(s => out += d("Name", UStr(s), Certain, origin))
      global.get("version").foreach(s => out += d("Version", UStr(s), Certain, origin))
      global.get("abstract").foreach(s => out += d("Summary", UStr(s), Certain, origin))
      meta.get("bugtracker.web").foreach(s => out += d("Bug-Database", UStr(s), Certain, origin))
      meta.get("repository.url").foreach(s => out += d("Repository", UStr(s), Certain, origin))
      global.get("license").foreach(s => out += d("License", UStr(s), Certain, origin))
      (global.get("copyright_year"), global.get("copyright_holder")) match {
        case (Some(y), Some(h)) => out += d("Copyright", UStr(s"$y $h"), Certain, origin)
        case _                  =>
      }
      out.result()
    }

  // ---------- Makefile.PL (src/providers/perl.rs:414-450) ----------

  private val MakefileNameRe = java.util.regex.Pattern.compile("name '([^'\"]+)';$")
  private val MakefileRepoRe = java.util.regex.Pattern.compile("repository '([^'\"]+)';$")

  def makefilePl(origin: String, content: String): Result = {
    val out = List.newBuilder[Datum]
    for (line <- content.split("\n", -1)) {
      val m1 = MakefileNameRe.matcher(line)
      if (m1.find()) out += d("Name", UStr(m1.group(1)), Confident, origin)
      val m2 = MakefileRepoRe.matcher(line)
      if (m2.find()) out += d("Repository", UStr(m2.group(1)), Confident, origin)
    }
    Right(out.result())
  }

  // ---------- POD (src/providers/perl.rs:15-79) ----------

  /** guess_from_pod: `=head1` sections → Name/Summary (from NAME) and
    * Description (from DESCRIPTION). Faithful to the reference including two
    * quirks: section bodies accumulate lines concatenated WITHOUT newlines
    * (perl.rs:29 `push_str(line)`), and the markup-strip patterns only match
    * when a literal backslash precedes the angle bracket (perl.rs:37-45 —
    * the raw strings escape the backslash, not the bracket, so plain
    * `B<bold>` is left intact while `B\<bold>` is stripped).
    */
  def pod(origin: String, content: String): Result = {
    val byHeader = scala.collection.mutable.HashMap.empty[String, StringBuilder]
    var inHeader: Option[String] = None
    for (line <- content.linesIterator) {
      if (line.startsWith("=head1 ")) {
        // trim_start_matches removes every leading repetition of the pattern
        var h = line
        while (h.startsWith("=head1 ")) h = h.substring("=head1 ".length)
        inHeader = Some(h)
        byHeader(h.toUpperCase) = new StringBuilder
      } else inHeader.foreach { h =>
        byHeader.get(h.toUpperCase).foreach(_.append(line))
      }
    }
    val out = List.newBuilder[Datum]
    byHeader.get("DESCRIPTION").foreach { sb =>
      var desc = sb.toString.dropWhile(_ == '\n')
      desc = desc.replaceAll("[FXZSCBI]\\\\<([^>]+)>", "$1")
      desc = desc.replaceAll("L\\\\<([^\\|]+)\\|([^\\\\>]+)\\\\>", "$2")
      desc = desc.replaceAll("L\\\\<([^\\\\>]+)\\\\>", "$1")
      out += d("Description", UStr(desc), Certain, origin)
    }
    byHeader.get("NAME").foreach { sb =>
      sb.toString.trim.linesIterator.toSeq.headOption.foreach { line =>
        val idx = line.indexOf(" - ")
        if (idx >= 0) {
          out += d("Name", UStr(line.substring(0, idx).trim), Confident, origin)
          out += d("Summary", UStr(line.substring(idx + 3).trim), Confident, origin)
        } else if (!line.contains(' '))
          out += d("Name", UStr(line.trim), Confident, origin)
      }
    }
    Right(out.result())
  }

  // ---------- Cargo.toml (src/providers/rust.rs:10-105) ----------

  def cargoToml(origin: String, content: String): Result =
    parseToml(content).flatMap { root =>
      val pkg = tGet(root, "package") match {
        case Some(t: TTable) => t
        case _               => return Right(Nil)
      }
      def s(key: String): Option[String] = tGet(pkg, key).flatMap(tStr)
      val out = List.newBuilder[Datum]
      val name = s("name").getOrElse(return Left("Cargo.toml missing package name"))
      out += d("Name", UStr(name), Certain, origin)
      out += d("Cargo-Crate", UStr(name), Certain, origin)
      s("description").foreach(v => out += d("Summary", UStr(v), Certain, origin))
      s("homepage").foreach(v => out += d("Homepage", UStr(v), Certain, origin))
      s("license").foreach(v => out += d("License", UStr(v), Certain, origin))
      s("repository").foreach(v => out += d("Repository", UStr(v), Certain, origin))
      out += d("Version", UStr(s("version").getOrElse("0.0.0")), Certain, origin)
      tGet(pkg, "authors") match {
        case Some(TArr(items)) if items.nonEmpty =>
          val ps = items.flatMap(tStr).map(Person.parse)
          if (ps.nonEmpty) out += d("Author", UPersons(ps), Certain, origin)
        case _ =>
      }
      Right(out.result())
    }

  // ---------- pyproject.toml (src/providers/python.rs:124-324) ----------

  def pyprojectToml(origin: String, content: String): Result =
    parseToml(content).map { root =>
      val out = List.newBuilder[Datum]

      tGet(root, "project") match {
        case Some(proj: TTable) =>
          tGet(proj, "name").flatMap(tStr).foreach(n => out += d("Name", UStr(n), Certain, origin))
          tGet(proj, "version").flatMap(tStr).foreach(v => out += d("Version", UStr(v), Certain, origin))
          // License::Spdx = plain string form
          tGet(proj, "license").foreach {
            case TStr(l) => out += d("License", UStr(l), Certain, origin)
            case _       => ()
          }
          def contacts(key: String): List[Person] = tGet(proj, key) match {
            case Some(TArr(items)) =>
              items.collect { case TTable(e) =>
                Person(
                  name = e.get("name").flatMap(tStr),
                  email = e.get("email").flatMap(tStr))
              }
            case _ => Nil
          }
          tGet(proj, "authors").foreach { _ =>
            out += d("Author", UPersons(contacts("authors")), Certain, origin)
          }
          val maints = contacts("maintainers")
          if (maints.nonEmpty) {
            val c = if (maints.length == 1) Certain else Possible
            out += d("Maintainer", UPerson(maints.head), c, origin)
          }
          tGet(proj, "keywords") match {
            case Some(TArr(items)) =>
              out += d("Keywords", UStrings(items.flatMap(tStr)), Certain, origin)
            case _ =>
          }
          tGet(proj, "urls") match {
            case Some(TTable(urls)) =>
              out ++= projectUrls(urls.toList.flatMap { case (k, v) => tStr(v).map(k -> _) }, origin)
            case _ =>
          }
          tGet(proj, "classifiers") match {
            case Some(TArr(items)) =>
              out ++= pythonClassifiers(items.flatMap(tStr), origin)
            case _ =>
          }
        case _ =>
      }

      tGet(root, "tool", "poetry") match {
        case Some(poetry: TTable) =>
          def s(key: String): Option[String] = tGet(poetry, key).flatMap(tStr)
          s("version").foreach(v => out += d("Version", UStr(v), Certain, origin))
          s("description").foreach(v => out += d("Summary", UStr(v), Certain, origin))
          s("license").foreach(v => out += d("License", UStr(v), Certain, origin))
          s("repository").foreach(v => out += d("Repository", UStr(v), Certain, origin))
          s("name").foreach(v => out += d("Name", UStr(v), Certain, origin))
          tGet(poetry, "urls") match {
            case Some(TTable(urls)) =>
              out ++= projectUrls(urls.toList.flatMap { case (k, v) => tStr(v).map(k -> _) }, origin)
            case _ =>
          }
          tGet(poetry, "keywords") match {
            case Some(TArr(items)) =>
              out += d("Keywords", UStrings(items.flatMap(tStr)), Certain, origin)
            case _ =>
          }
          tGet(poetry, "authors") match {
            case Some(TArr(items)) =>
              out += d("Author", UPersons(items.flatMap(tStr).map(Person.parse)), Certain, origin)
            case _ =>
          }
          s("homepage").foreach(v => out += d("Homepage", UStr(v), Certain, origin))
          s("documentation").foreach(v => out += d("Documentation", UStr(v), Certain, origin))
        case _ =>
      }

      out.result()
    }

  /** parse_python_project_urls (src/providers/python.rs:326-374) */
  def projectUrls(urls: List[(String, String)], origin: String): List[Datum] =
    urls.flatMap { case (urlType, url) =>
      urlType match {
        case "GitHub" | "Repository" | "Source Code" | "Source" =>
          Some(d("Repository", UStr(url), Certain, origin))
        case "Bug Tracker" | "Bug Reports" =>
          Some(d("Bug-Database", UStr(url), Certain, origin))
        case "Documentation" => Some(d("Documentation", UStr(url), Certain, origin))
        case "Funding"       => Some(d("Funding", UStr(url), Certain, origin))
        case "Homepage"      => Some(d("Homepage", UStr(url), Certain, origin))
        case _               => None
      }
    }

  /** parse_python_classifiers (src/providers/python.rs:1095-1124) */
  def pythonClassifiers(classifiers: List[String], origin: String): List[Datum] =
    classifiers.flatMap { c =>
      val parts = c.split(" :: ", -1)
      if (parts.length >= 3 && parts(0) == "License" && parts(1) == "OSI Approved")
        Some(d("License", UStr(parts(2)), Certain, origin))
      else None
    }

  /** parse_python_url (src/providers/python.rs:442-464) */
  def parsePythonUrl(url: String, origin: String): List[Datum] =
    UrlLite.parse(url) match {
      case None => Nil
      case Some(u) =>
        Vcs.guessRepoFromUrl(u) match {
          case Some(repo) => List(Datum("Repository", UStr(repo), Some(Likely), None))
          case None       => List(Datum("Homepage", UStr(url), Some(Likely), None))
        }
    }

  // ---------- setup.cfg (src/providers/python.rs:468-622) ----------

  def setupCfg(origin: String, content: String): Result =
    parseIni(content).map { sections =>
      val metadata = sections.getOrElse("metadata", Nil)
      val metaMap = metadata.toMap
      val out = List.newBuilder[Datum]
      for ((field, value) <- metadata) field match {
        case "name" => out += d("Name", UStr(value), Certain, origin)
        case "version" =>
          if (!value.startsWith("attr:") && !value.startsWith("file:"))
            out += d("Version", UStr(value), Certain, origin)
        case "url"                       => out ++= parsePythonUrl(value, origin)
        case "description" | "summary"   => out += d("Summary", UStr(value), Certain, origin)
        case "long_description"          => () // reference bug: never parsed (strip_prefix(value))
        case "maintainer" =>
          out += d("Maintainer", UPerson(Person(
            name = Some(value),
            email = metaMap.get("maintainer_email").orElse(metaMap.get("maintainer-email"))
          )), Certain, origin)
        case "author" =>
          out += d("Author", UPersons(List(Person(
            name = Some(value),
            email = metaMap.get("author_email").orElse(metaMap.get("author-email"))
          ))), Certain, origin)
        case "project_urls" =>
          val urls = value.split("\n").toList.flatMap { s =>
            if (s.isEmpty) None
            else s.split("=", 2) match {
              case Array(k, v) => Some((k, v))
              case _           => None
            }
          }
          out ++= projectUrls(urls, origin)
        case "license"   => out += d("License", UStr(value), Certain, origin)
        case "home-page" => out += d("Homepage", UStr(value), Certain, origin)
        case _           => ()
      }
      out.result()
    }

  // ---------- setup.py static AST subset (src/providers/python.rs:790-1093) --

  def setupPy(origin: String, content: String): Result = {
    SetupPyParser.parse(content).map { kwargs =>
      val out = List.newBuilder[Datum]
      var longDescription: Option[(String, Option[String])] = None
      var urls: List[String] = Nil
      for ((key, value) <- kwargs) key match {
        case "name" =>
          value.asString.foreach(v => out += d("Name", UStr(v), Certain, origin))
        case "version" =>
          value.asString.foreach(v => out += d("Version", UStr(v), Certain, origin))
        case "description" =>
          value.asString.foreach(v => out += d("Summary", UStr(v), Certain, origin))
        case "long_description" =>
          value.asString.foreach { v =>
            val ct = kwargs.collectFirst {
              case ("long_description_content_type", cv) => cv.asString
            }.flatten
            longDescription = Some((v, ct))
          }
        case "license" =>
          value.asString.foreach(v => out += d("License", UStr(v), Certain, origin))
        case "download_url" =>
          value.asString.foreach(v => out += d("Download", UStr(v), Certain, origin))
        case "url" =>
          value.asString.foreach(v => urls = urls :+ v)
        case "project_urls" =>
          value.asDict.foreach(m => out ++= projectUrls(m, origin))
        case "maintainer" =>
          value.asString.foreach { v =>
            val email = kwargs.collectFirst { case ("maintainer_email", ev) => ev.asString }.flatten
            out += d("Maintainer", UPerson(Person(name = Some(v), email = email)), Certain, origin)
          }
        case "author" =>
          value.asString match {
            case Some(v) =>
              val email = kwargs.collectFirst { case ("author_email", ev) => ev.asString }.flatten
              out += d("Author", UPersons(List(Person(name = Some(v), email = email))), Certain, origin)
            case None =>
              value.asStringList.foreach { names =>
                val emails = kwargs.collectFirst { case ("author_email", ev) => ev.asStringList }
                  .flatten.getOrElse(Nil)
                val persons = names.zipAll(emails.map(Option(_)).take(names.length), "", None)
                  .takeWhile(_._1.nonEmpty)
                  .map { case (n, e) => Person(name = Some(n), email = e) }
                out += d("Author", UPersons(persons), Certain, origin)
              }
          }
        case "keywords" =>
          value.asStringList.foreach(ks => out += d("Keywords", UStrings(ks), Certain, origin))
        case "classifiers" =>
          value.asStringList.foreach(cs => out ++= pythonClassifiers(cs, origin))
        case _ => ()
      }
      val extra = List.newBuilder[Datum]
      longDescription.foreach { case (desc, ct) =>
        extra ++= PythonLongDescription.parse(desc, ct)
      }
      urls.foreach(u => extra ++= parsePythonUrl(u, origin))
      out.result() ++ extra.result()
    }
  }

  // ---------- PKG-INFO / METADATA (src/providers/python.rs:15-120) ----------

  def pkgInfo(origin: String, content: String): Result = {
    // RFC-822 style headers followed by optional body (long description)
    val (headers, body) = {
      val idx = content.indexOf("\n\n")
      if (idx < 0) (content, "")
      else (content.substring(0, idx), content.substring(idx + 2))
    }
    val fields = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var lastIdx = -1
    for (line <- headers.split("\n", -1)) {
      if ((line.startsWith(" ") || line.startsWith("\t")) && lastIdx >= 0) {
        val (k, v) = fields(lastIdx)
        fields(lastIdx) = (k, v + "\n" + line.trim)
      } else line.split(":", 2) match {
        case Array(k, v) => fields.append((k.trim, v.trim)); lastIdx = fields.length - 1
        case _           =>
      }
    }
    def get(k: String): Option[String] = fields.collectFirst { case (key, v) if key == k => v }
    def getAll(k: String): List[String] = fields.collect { case (key, v) if key == k => v }.toList

    val out = List.newBuilder[Datum]
    val name = get("Name").getOrElse(return Left("PKG-INFO missing Name"))
    out += d("Name", UStr(name), Certain, origin)
    val version = get("Version").getOrElse(return Left("PKG-INFO missing Version"))
    out += d("Version", UStr(version), Certain, origin)
    get("Home-page").foreach(h => out += d("Homepage", UStr(h), Certain, origin))
    get("Summary").foreach(s => out += d("Summary", UStr(s), Certain, origin))
    val description = get("Description").map(_ + "\n").orElse {
      if (body.trim.nonEmpty) Some(body) else None
    }
    description.foreach { desc =>
      out ++= PythonLongDescription.parse(desc, get("Description-Content-Type"))
    }
    out ++= projectUrls(
      getAll("Project-URL").flatMap { v =>
        v.split(", ", 2) match {
          case Array(k, u) => Some((k, u))
          case _           => None
        }
      }, origin)
    val author = get("Author")
    val authorEmail = get("Author-email")
    if (author.isDefined || authorEmail.isDefined)
      out += d("Author", UPersons(List(Person(name = author, email = authorEmail))), Certain, origin)
    val maintainer = get("Maintainer")
    val maintainerEmail = get("Maintainer-email")
    if (maintainer.isDefined || maintainerEmail.isDefined)
      out += d("Maintainer", UPerson(Person(name = maintainer, email = maintainerEmail)), Certain, origin)
    get("License").foreach(l => out += d("License", UStr(l), Certain, origin))
    get("Keywords").foreach(k =>
      out += d("Keywords", UStrings(k.split(", ").toList), Certain, origin))
    get("Download-URL").foreach(u => out += d("Download", UStr(u), Certain, origin))
    Right(out.result())
  }

  // ---------- configure (src/providers/autoconf.rs:20-153) ----------

  def configure(origin: String, content: String): Result = {
    val out = List.newBuilder[Datum]
    def isEmail(v: String): Boolean = v.contains('@') || v.contains(" (at) ")
    for (line <- content.split("\n", -1)) {
      val idx = line.indexOf('=')
      if (idx >= 0) {
        val key = line.substring(0, idx).trim
        var value = line.substring(idx + 1).trim
        if (!key.contains(' ') && !value.contains('$')) {
          var skip = false
          if (value.startsWith("'") && value.endsWith("'")) {
            if (value.length >= 2) {
              value = value.substring(1, value.length - 1)
              if (value.isEmpty) skip = true
            } else skip = true
          }
          if (!skip) key match {
            case "PACKAGE_NAME" | "PACKAGE_TARNAME" =>
              out += d("Name", UStr(value), Certain, origin)
            case "PACKAGE_VERSION" =>
              out += d("Version", UStr(value), Certain, origin)
            case "PACKAGE_BUGREPORT" =>
              val certainty: Option[Int] =
                if (value == "BUG-REPORT-ADDRESS") None
                else if (isEmail(value)) Some(Possible)
                else if (value.contains("mailing list")) Some(Possible)
                else UrlLite.parse(value) match {
                  case None => None // parse failure: continue
                  case Some(u) =>
                    if (u.path.reverse.dropWhile(_ == '/').nonEmpty) Some(Certain)
                    else Some(Possible)
                }
              certainty.foreach(c => out += d("Bug-Submit", UStr(value), c, origin))
            case "PACKAGE_URL" =>
              out += d("Homepage", UStr(value), Certain, origin)
            case _ => ()
          }
        }
      }
    }
    Right(out.result())
  }

  // ---------- R DESCRIPTION (src/providers/r.rs:13-132) ----------

  def rDescription(origin: String, content: String): Result = {
    val paras = parseDeb822(content)
    if (paras.isEmpty) return Left("empty DESCRIPTION")
    val para = paras.head
    def get(k: String): Option[String] = deb822Get(para, k)

    val out = List.newBuilder[Datum]
    val name = get("Package").getOrElse(return Left("DESCRIPTION missing Package"))
    out += d("Name", UStr(name), Certain, origin)
    get("Repository").foreach(a => out += d("Archive", UStr(a), Certain, origin))
    get("BugReports").foreach(b => out += d("Bug-Database", UStr(b), Certain, origin))
    val version = get("Version").getOrElse(return Left("DESCRIPTION missing Version"))
    out += d("Version", UStr(version.replace('-', '.')), Certain, origin)
    val license = get("License").getOrElse(return Left("DESCRIPTION missing License"))
    out += d("License", UStr(license), Certain, origin)
    val title = get("Title").getOrElse(return Left("DESCRIPTION missing Title"))
    out += d("Summary", UStr(title), Certain, origin)
    get("Description").foreach { desc =>
      val lines = desc.split("\n", -1).toList
      val reflowed = lines match {
        case first :: rest =>
          val dedented = dedent(rest)
          (first +: dedented).mkString("\n")
        case Nil => desc
      }
      out += d("Description", UStr(reflowed), Certain, origin)
    }
    val maintainer = get("Maintainer").orElse(maintainerFromAuthorsR(get("Authors@R")))
    maintainer.foreach { m =>
      out += d("Maintainer", UPerson(Person.parse(m)), Certain, origin)
    }
    get("URL").foreach { urlField =>
      val entries = parseRUrlList(urlField)
      if (entries.length == 1)
        out += d("Homepage", UStr(entries.head._1), Possible, origin)
      for ((url, label) <- entries) {
        UrlLite.parse(url).foreach { u =>
          u.host match {
            case Some(h) =>
              if (h == "bioconductor.org")
                out += d("Archive", UStr("Bioconductor"), Confident, origin)
              val lbl = label.map(_.toLowerCase)
              if (lbl.contains("devel") || lbl.contains("repository"))
                out += d("Repository", UStr(url), Certain, origin)
              else if (lbl.contains("homepage"))
                out += d("Homepage", UStr(url), Certain, origin)
              else
                Vcs.guessRepoFromUrl(u).foreach(r =>
                  out += d("Repository", UStr(r), Certain, origin))
            case None => ()
          }
        }
      }
    }
    Right(out.result())
  }

  private def dedent(lines: List[String]): List[String] = {
    val nonEmpty = lines.filter(_.trim.nonEmpty)
    if (nonEmpty.isEmpty) return lines
    val indent = nonEmpty.map(_.takeWhile(c => c == ' ' || c == '\t').length).min
    lines.map(l => if (l.length >= indent) l.substring(indent) else l.trim)
  }

  /** Select the 'cre' (creator/maintainer) person from an Authors@R field. */
  private def maintainerFromAuthorsR(authorsR: Option[String]): Option[String] = {
    val text = authorsR.getOrElse(return None)
    val personRe = java.util.regex.Pattern.compile(
      "person\\s*\\(((?:[^()\"]|\"[^\"]*\"|\\([^()]*\\))*)\\)",
      java.util.regex.Pattern.DOTALL)
    val m = personRe.matcher(text)
    while (m.find()) {
      val args = m.group(1)
      if (args.contains("\"cre\"") || args.contains("'cre'")) {
        def kw(name: String): Option[String] = {
          val r = java.util.regex.Pattern.compile(name + "\\s*=\\s*\"([^\"]*)\"").matcher(args)
          if (r.find()) Some(r.group(1)) else None
        }
        val given = kw("given")
        val family = kw("family")
        val email = kw("email")
        val name = (given, family) match {
          case (Some(g), Some(f)) => Some(s"$g $f")
          case (Some(g), None)    => Some(g)
          case (None, Some(f))    => Some(f)
          case _                  => None
        }
        (name, email) match {
          case (Some(n), Some(e)) => return Some(s"$n <$e>")
          case (Some(n), None)    => return Some(n)
          case (None, Some(e))    => return Some(e)
          case _                  => return None
        }
      }
    }
    None
  }

  /** URL field: whitespace/comma separated URLs, each optionally followed by
    * a parenthesized label (possibly multi-word).
    */
  private def parseRUrlList(field: String): List[(String, Option[String])] = {
    val entries = List.newBuilder[(String, Option[String])]
    val tokens = field.split("[,\\s]+").filter(_.nonEmpty).toList
    var i = 0
    while (i < tokens.length) {
      val tok = tokens(i)
      if (tok.startsWith("(")) {
        // accumulate label tokens until closing paren; attach to previous
        val labelParts = scala.collection.mutable.ArrayBuffer.empty[String]
        var done = false
        while (i < tokens.length && !done) {
          labelParts.append(tokens(i))
          if (tokens(i).endsWith(")")) done = true
          i += 1
        }
        val label = labelParts.mkString(" ").stripPrefix("(").stripSuffix(")")
        val all = entries.result()
        if (all.nonEmpty) {
          entries.clear()
          entries ++= all.init
          entries += ((all.last._1, Some(label)))
        }
      } else {
        entries += ((tok, None))
        i += 1
      }
    }
    entries.result()
  }

  // ---------- gemspec (src/providers/ruby.rs:12-131) ----------

  def gemspec(origin: String, content: String): Result = {
    sealed trait GemValue
    case class GemStr(s: String) extends GemValue
    case class GemArr(items: List[GemValue]) extends GemValue

    def parseValue(value: String): Option[GemValue] = {
      val trimmed = value.trim
      if ((trimmed.startsWith("\"") && trimmed.endsWith("\"") && trimmed.length >= 2) ||
          (trimmed.startsWith("'") && trimmed.endsWith("'") && trimmed.length >= 2)) {
        Some(GemStr(trimmed.substring(1, trimmed.length - 1)))
      } else if (trimmed.startsWith("\"") || trimmed.startsWith("'.freeze")) {
        Some(GemStr(trimmed.substring(1)))
      } else if (trimmed.startsWith("[") && trimmed.endsWith("]")) {
        val inner = trimmed.substring(1, trimmed.length - 1)
        val parts = inner.split(",").toList.map(parseValue)
        if (parts.forall(_.isDefined)) Some(GemArr(parts.map(_.get))) else None
      } else None
    }

    val out = List.newBuilder[Datum]
    for (line <- content.split("\n", -1)) {
      if (!line.startsWith("#") && line.trim.nonEmpty &&
          line != "Gem::Specification.new do |s|\n" && line != "end\n") {
        if (line.startsWith("  s.")) {
          val rest = line.substring(4)
          rest.split("=", 2) match {
            case Array(key0, rawval) =>
              val key = key0.trim
              parseValue(rawval.trim) match {
                case Some(v) =>
                  key match {
                    case "name" | "version" | "homepage" | "summary" | "description" | "license" =>
                      v match {
                        case GemStr(s) =>
                          val field = key match {
                            case "name"        => "Name"
                            case "version"     => "Version"
                            case "homepage"    => "Homepage"
                            case "summary"     => "Summary"
                            case "description" => "Description"
                            case "license"     => "License"
                          }
                          out += d(field, UStr(s), Certain, origin)
                        case _ => ()
                      }
                    case "authors" =>
                      v match {
                        case GemArr(items) =>
                          val ps = items.collect { case GemStr(s) => Person.parse(s) }
                          if (ps.nonEmpty) out += d("Author", UPersons(ps), Certain, origin)
                        case _ => ()
                      }
                    case _ => ()
                  }
                case None => ()
              }
            case _ => ()
          }
        }
      }
    }
    Right(out.result())
  }

  // ---------- cabal (src/providers/haskell.rs:9-145) ----------

  def cabal(origin: String, content: String): Result = {
    // parse_cabal_lines
    var section: Option[String] = None
    val parsed = List.newBuilder[(Option[String], String, String)]
    for (line <- content.split("\n", -1)) {
      if (line.replaceAll("^\\s+", "").startsWith("--")) ()
      else if (line.trim.isEmpty) section = None
      else {
        line.split(":", 2) match {
          case Array(field0, value) =>
            val field = field0.toLowerCase
            if (section.isEmpty && !field.startsWith(" ")) {
              parsed += ((None, field.trim, value.trim))
            } else if (field.startsWith(" ")) {
              parsed += ((section, field.trim.toLowerCase, value.trim))
            }
          case _ =>
            if (!line.startsWith(" ")) section = Some(line.trim.toLowerCase)
        }
      }
    }

    var repoUrl: Option[String] = None
    var repoBranch: Option[String] = None
    var repoSubpath: Option[String] = None
    val out = List.newBuilder[Datum]

    for ((sec, key, value) <- parsed.result()) (sec, key) match {
      case (None, "homepage")    => out += d("Homepage", UStr(value), Certain, origin)
      case (None, "bug-reports") => out += d("Bug-Database", UStr(value), Certain, origin)
      case (None, "name")        => out += d("Name", UStr(value), Certain, origin)
      case (None, "maintainer") =>
        out += d("Maintainer", UPerson(Person.parse(value)), Certain, origin)
      case (None, "copyright") => out += d("Copyright", UStr(value), Certain, origin)
      case (None, "license")   => out += d("License", UStr(value), Certain, origin)
      case (None, "author") =>
        out += d("Author", UPersons(List(Person.parse(value))), Certain, origin)
      case (None, "synopsis") => out += d("Summary", UStr(value), Certain, origin)
      case (Some("source-repository head"), "location") => repoUrl = Some(value)
      case (Some("source-repository head"), "branch")   => repoBranch = Some(value)
      case (Some("source-repository head"), "subdir")   => repoSubpath = Some(value)
      case _ => ()
    }

    repoUrl.foreach { ru =>
      UrlLite.parse(ru).foreach { u =>
        out += d("Repository",
          UStr(Vcs.unsplitVcsUrl(Vcs.VcsLocation(u, repoBranch, repoSubpath))),
          Certain, origin)
      }
    }
    Right(out.result())
  }

  // ---------- pom.xml (src/providers/maven.rs:11-201) ----------

  def pomXml(origin: String, content: String): Result =
    Xmls.parse(content).map { root =>
      val out = List.newBuilder[Datum]
      if (root.label == "project") {
        val nameText = Xmls.childText(root, "name")
        nameText match {
          case Some(name) =>
            if (!name.contains('$')) out += d("Name", UStr(name), Certain, origin)
          case None =>
            Xmls.childText(root, "artifactId").foreach(a =>
              out += d("Name", UStr(a), Possible, origin))
        }
        Xmls.childText(root, "description").foreach(s =>
          out += d("Summary", UStr(s), Certain, origin))
        Xmls.childText(root, "version").foreach { v =>
          if (!v.contains('$')) out += d("Version", UStr(v), Certain, origin)
        }
        Xmls.child(root, "licenses").foreach { licenses =>
          for (lic <- Xmls.children(licenses, "license"))
            Xmls.childText(lic, "name").foreach(n =>
              out += d("License", UStr(n), Certain, origin))
        }
        for (scm <- Xmls.children(root, "scm")) {
          Xmls.childText(scm, "url").foreach { url =>
            if (url.startsWith("scm:") && url.count(_ == ':') >= 3) {
              val browseUrl = url.split(":", 3)(2)
              if (Vcs.plausibleBrowseUrl(browseUrl))
                out += d("Repository-Browse", UStr(browseUrl), Certain, origin)
            } else {
              out += d("Repository-Browse", UStr(url), Certain, origin)
            }
          }
          Xmls.childText(scm, "connection").foreach { conn =>
            val parts = conn.split(":", 3)
            if (parts.length == 3 && parts(0) == "scm")
              out += d("Repository", UStr(parts(2)), Certain, origin)
          }
        }
        for (im <- Xmls.children(root, "issueManagement"))
          Xmls.childText(im, "url").foreach(u =>
            out += d("Bug-Database", UStr(u), Certain, origin))
        Xmls.childText(root, "url").foreach { u =>
          if (!u.startsWith("scm:")) out += d("Homepage", UStr(u), Certain, origin)
        }
      }
      out.result()
    }

  // ---------- .git/config (src/providers/git.rs:6-42) ----------

  def gitConfig(origin: String, content: String, trustPackage: Boolean): Result = {
    // minimal gitconfig parse: [remote "name"] url = ...
    var section = ""
    var urls = Map.empty[String, String]
    for (line <- content.split("\n", -1)) {
      val t = line.trim
      if (t.startsWith("[")) section = t.stripPrefix("[").stripSuffix("]").trim
      else if (t.startsWith("url") && t.contains('=')) {
        val v = t.split("=", 2)(1).trim
        val m = java.util.regex.Pattern.compile("remote \"([^\"]+)\"").matcher(section)
        if (m.matches()) urls += (m.group(1) -> v)
      }
    }
    val out = List.newBuilder[Datum]
    urls.get("upstream").foreach { u =>
      if (!u.startsWith("../")) out += d("Repository", UStr(u), Likely, origin)
    }
    if (!trustPackage) urls.get("origin").foreach { u =>
      if (!u.startsWith("../")) out += d("Repository", UStr(u), Possible, origin)
    }
    Right(out.result())
  }

  // ---------- go.mod (src/providers/go.rs:12-38) ----------

  def goMod(origin: String, content: String): Result = {
    val out = List.newBuilder[Datum]
    for (line <- content.split("\n", -1)) {
      if (line.startsWith("module ")) {
        line.trim.split(" ", 2) match {
          case Array(_, modname) => out += d("Name", UStr(modname), Certain, origin)
          case _                 =>
        }
      }
    }
    Right(out.result())
  }

  // ---------- wscript (src/providers/waf.rs) ----------

  private val AppnameRe = java.util.regex.Pattern.compile("APPNAME = ['\"](.*)['\"]")
  private val VersionRe = java.util.regex.Pattern.compile("VERSION = ['\"](.*)['\"]")

  def wscript(origin: String, content: String): Result = {
    val out = List.newBuilder[Datum]
    for (line <- content.split("\n", -1)) {
      val m1 = AppnameRe.matcher(line)
      if (m1.find()) out += d("Name", UStr(m1.group(1)), Confident, origin)
      val m2 = VersionRe.matcher(line)
      if (m2.find()) out += d("Version", UStr(m2.group(1)), Confident, origin)
    }
    Right(out.result())
  }

  // ---------- meson.build (src/providers/meson.rs:6-48) ----------

  /** The reference does NOT parse meson.build itself: it shells out to
    * `meson introspect --projectinfo` and, when meson is not installed
    * (every offline/container run, including this sandbox), returns
    * `ProviderError::Other("meson not installed; ...")` (meson.rs:15-19).
    * The faithful offline behavior is therefore an ERROR — logged and
    * dropped from the datum stream by the caller, but visible on the
    * per-subject error channel (lib.rs:3905-3913) that the lineage table
    * records. No regex fallback exists in the reference.
    */
  def mesonBuild(origin: String, content: String): Result =
    Left("meson not installed; skipping meson.build introspection")

  // ---------- pubspec.yaml (src/providers/pubspec.rs) ----------

  def pubspecYaml(origin: String, content: String): Result =
    parseYaml(content).map { data =>
      val out = List.newBuilder[Datum]
      yGet(data, "name").flatMap(yStr).foreach(s => out += d("Name", UStr(s), Certain, origin))
      yGet(data, "description").flatMap(yStr).foreach(s => out += d("Description", UStr(s), Certain, origin))
      yGet(data, "version").flatMap(yStr).foreach(s => out += d("Version", UStr(s), Certain, origin))
      yGet(data, "homepage").flatMap(yStr).foreach(s => out += d("Homepage", UStr(s), Certain, origin))
      yGet(data, "repository").flatMap(yStr).foreach(s => out += d("Repository", UStr(s), Certain, origin))
      yGet(data, "documentation").flatMap(yStr).foreach(s => out += d("Documentation", UStr(s), Certain, origin))
      yGet(data, "issue_tracker").flatMap(yStr).foreach(s => out += d("Bug-Database", UStr(s), Certain, origin))
      out.result()
    }

  // ---------- package.yaml / hpack (src/providers/package_yaml.rs) ----------

  def packageYaml(origin: String, content: String): Result =
    parseYaml(content).map { data =>
      val out = List.newBuilder[Datum]
      yGet(data, "name").flatMap(yStr).foreach(s => out += d("Name", UStr(s), Certain, origin))
      yGet(data, "version").flatMap(yStr).foreach(s => out += d("Version", UStr(s), Certain, origin))
      yGet(data, "author").flatMap(yStr).foreach { a =>
        val ps = a.split(",").toList.map(Person.parse)
        out += d("Author", UPersons(ps), Certain, origin)
      }
      yGet(data, "maintainer").flatMap(yStr).foreach { m =>
        val ps = m.split(",").toList.map(Person.parse)
        ps.lastOption.foreach(p => out += d("Maintainer", UPerson(p), Certain, origin))
      }
      yGet(data, "homepage").flatMap(yStr).foreach(s => out += d("Homepage", UStr(s), Certain, origin))
      yGet(data, "description").flatMap(yStr).foreach { s =>
        if (!s.startsWith("Please see the README"))
          out += d("Description", UStr(s), Confident, origin)
      }
      yGet(data, "synopsis").flatMap(yStr).foreach(s => out += d("Summary", UStr(s), Confident, origin))
      yGet(data, "license").flatMap(yStr).foreach(s => out += d("License", UStr(s), Certain, origin))
      yGet(data, "github").flatMap(yStr).foreach(g =>
        out += d("Repository", UStr(s"https://github.com/$g"), Certain, origin))
      yGet(data, "repository").flatMap(yStr).foreach(s => out += d("Repository", UStr(s), Certain, origin))
      out.result()
    }

  // ---------- .travis.yml (src/lib.rs:2209-2234) ----------

  def travisYml(origin: String, content: String): Result =
    parseYaml(content).map { data =>
      yGet(data, "go_import_path").flatMap(yStr) match {
        case Some(p) => List(d("Go-Import-Path", UStr(p), Certain, origin))
        case None    => Nil
      }
    }

  // ---------- AUTHORS (src/providers/authors.rs) ----------

  def authorsFile(origin: String, content: String): Result = {
    val authors = List.newBuilder[Person]
    for (line <- content.split("\n", -1)) {
      var m = line.trim
      var skip = false
      if (m.isEmpty) skip = true
      else if (m.startsWith("arch-tag: ")) skip = true
      else if (m.endsWith(":")) skip = true
      else if (m.startsWith("$Id")) skip = true
      if (!skip) {
        if (m.startsWith("*") || m.startsWith("-")) m = m.substring(1).trim
        if (m.length < 3) skip = true
        else if (m.endsWith(".")) skip = true
        else {
          if (m.contains(" for ")) m = m.split(" for ", -1)(0)
          if (!m.headOption.exists(_.isLetter)) skip = true
          else if (!m.contains('<') && line.startsWith("\t")) skip = true
          else if (m.contains('<') || m.count(_ == ' ') < 5) {
            authors += Person.parse(m)
            skip = true // handled
          }
        }
      }
    }
    Right(List(d("Author", UPersons(authors.result()), Likely, origin)))
  }

  // ---------- SECURITY.md (src/providers/security_md.rs) ----------

  def securityMd(name: String, origin: String): Result =
    Right(List(d("Security-MD", UStr(name), Certain, origin)))

  // ---------- INSTALL (src/providers/mod.rs:69-163) ----------

  private val BacktickCloneRe =
    java.util.regex.Pattern.compile("[\"'`](git clone.*)[\"`']")
  private val ProjectReStr = "([^/]+)/([^/?.()\"#>\\s]*[^-/?.()\"#>\\s])"
  private val GithubGitRe =
    java.util.regex.Pattern.compile("https://github.com/" + ProjectReStr + "/(.git)?")
  private val GithubRe =
    java.util.regex.Pattern.compile("https://github.com/" + ProjectReStr)
  private val GitSchemeRe = java.util.regex.Pattern.compile("git://([^ ]+)")
  private val HttpsRe =
    java.util.regex.Pattern.compile("https://([^]/]+)/([^]\\s()\"#]+)")

  def installFile(origin: String, content: String): Result = {
    val out = List.newBuilder[Datum]
    val urls = List.newBuilder[String]
    val lines = content.split("\n", -1)
    var i = 0
    while (i < lines.length) {
      val oline = lines(i)
      val line = oline.trim
      var cmdline = line.stripPrefix("$").trim
      if (cmdline.startsWith("git clone ") || cmdline.startsWith("fossil clone ")) {
        while (cmdline.endsWith("\\") && i + 1 < lines.length) {
          i += 1
          cmdline = (cmdline + lines(i).trim).trim
        }
        val url =
          if (cmdline.startsWith("git clone ")) VcsCommand.urlFromGitCloneCommand(cmdline)
          else VcsCommand.urlFromFossilCloneCommand(cmdline)
        url.foreach(urls += _)
      }
      val bm = BacktickCloneRe.matcher(line)
      while (bm.find()) {
        VcsCommand.urlFromGitCloneCommand(bm.group(0)).foreach(urls += _)
      }
      val gm = GithubGitRe.matcher(line)
      while (gm.find()) {
        out += d("Repository", UStr(gm.group(0).reverse.dropWhile(_ == '.').reverse), Possible, origin)
      }
      val g2 = GithubRe.matcher(line)
      if (g2.find()) {
        out += d("Repository", UStr(g2.group(0).reverse.dropWhile(_ == '.').reverse), Possible, origin)
      }
      val g3 = GitSchemeRe.matcher(line)
      if (g3.find()) {
        out += d("Repository", UStr(g3.group(0).reverse.dropWhile(_ == '.').reverse), Possible, origin)
      }
      val hm = HttpsRe.matcher(line)
      while (hm.find()) {
        val url = hm.group(0).reverse.dropWhile(_ == '.').reverse.trim
        UrlLite.parse(url).foreach { u =>
          u.host.foreach { host =>
            if (Vcs.isGitlabSite(host)) {
              Vcs.guessRepoFromUrl(u).foreach(r =>
                out += d("Repository", UStr(r), Possible, origin))
            }
          }
        }
      }
      i += 1
    }
    Right(out.result())
  }

  // ---------- metainfo (src/providers/metainfo.rs) ----------

  def metainfo(origin: String, content: String): Result =
    Xmls.parse(content).map { root =>
      val out = List.newBuilder[Datum]
      for (child <- root.child if child.isInstanceOf[scala.xml.Elem]) {
        val el = child.asInstanceOf[scala.xml.Elem]
        el.label match {
          case "id" =>
            Xmls.text(el).foreach(t => out += d("Name", UStr(t), Certain, origin))
          case "project_license" =>
            Xmls.text(el).foreach(t => out += d("License", UStr(t), Certain, origin))
          case "url" =>
            val urltype = el.attribute("type").map(_.text)
            if (urltype.contains("homepage"))
              Xmls.text(el).foreach(t => out += d("Homepage", UStr(t), Certain, origin))
            else if (urltype.contains("bugtracker"))
              Xmls.text(el).foreach(t => out += d("Bug-Database", UStr(t), Certain, origin))
          case "description" =>
            Xmls.text(el).foreach(t => out += d("Description", UStr(t), Certain, origin))
          case "summary" =>
            Xmls.text(el).foreach(t => out += d("Summary", UStr(t), Certain, origin))
          case "name" =>
            Xmls.text(el).foreach(t => out += d("Name", UStr(t), Certain, origin))
          case _ => ()
        }
      }
      out.result()
    }

  // ---------- DOAP (src/providers/doap.rs) ----------

  def doap(origin: String, content: String): Result =
    Xmls.parse(content).flatMap { doc =>
      val DOAP = "http://usefulinc.com/ns/doap#"
      val root =
        if (doc.label == "RDF")
          doc.child.collectFirst { case e: scala.xml.Elem => e }.getOrElse(doc)
        else doc
      if (root.label != "Project" || root.namespace != DOAP)
        return Left(s"Doap file does not have DOAP project as root, but ${root.label}")

      def resource(el: scala.xml.Elem): Option[String] =
        el.attributes.collectFirst {
          case a if a.key == "resource" => a.value.text
        }
      def lang(el: scala.xml.Elem): Option[String] =
        el.attributes.collectFirst { case a if a.key == "lang" => a.value.text }

      val out = List.newBuilder[Datum]
      val screenshots = List.newBuilder[String]
      val maintainers = List.newBuilder[Person]

      for (child <- root.child if child.isInstanceOf[scala.xml.Elem]) {
        val el = child.asInstanceOf[scala.xml.Elem]
        val isDoap = el.namespace == DOAP
        (isDoap, el.label) match {
          case (true, "name") =>
            Xmls.text(el).foreach(t => out += d("Name", UStr(t), Certain, origin))
          case (true, "shortname") | (true, "short-name") =>
            Xmls.text(el).foreach(t => out += d("Name", UStr(t), Certain, origin))
          case (true, "bug-database") =>
            resource(el).foreach(u => out += d("Bug-Database", UStr(u), Certain, origin))
          case (true, "homepage") =>
            resource(el).foreach(u => out += d("Homepage", UStr(u), Certain, origin))
          case (true, "download-page") =>
            resource(el).foreach(u => out += d("Download", UStr(u), Certain, origin))
          case (true, "shortdesc") =>
            if (lang(el).contains("en"))
              Xmls.text(el).foreach(t => out += d("Summary", UStr(t), Certain, origin))
          case (true, "description") =>
            if (lang(el).contains("en"))
              Xmls.text(el).foreach(t => out += d("Description", UStr(t), Certain, origin))
          case (true, "repository") =>
            for (repo <- el.child if repo.isInstanceOf[scala.xml.Elem]) {
              val r = repo.asInstanceOf[scala.xml.Elem]
              if (r.label == "SVNRepository" || r.label == "GitRepository") {
                Xmls.child(r, "location").flatMap(resource).foreach(u =>
                  out += d("Repository", UStr(u), Certain, origin))
                Xmls.child(r, "browse").flatMap(resource).foreach(u =>
                  out += d("Repository-Browse", UStr(u), Certain, origin))
              }
            }
          case (_, "screenshot") | (true, "screenshots") =>
            resource(el).foreach(screenshots += _)
          case (true, "wiki") =>
            resource(el).foreach(u => out += d("Wiki", UStr(u), Certain, origin))
          case (true, "maintainer") =>
            for (p <- el.child if p.isInstanceOf[scala.xml.Elem]) {
              val pe = p.asInstanceOf[scala.xml.Elem]
              if (pe.label == "Person") {
                val name = Xmls.child(pe, "name").flatMap(Xmls.textRaw)
                val email = Xmls.child(pe, "mbox").flatMap(Xmls.textRaw)
                val url = Xmls.child(pe, "mbox").flatMap(resource)
                maintainers += Person(name, email, url)
              }
            }
          case (true, "mailing-list") =>
            resource(el).foreach(u => out += d("MailingList", UStr(u), Certain, origin))
          case _ => ()
        }
      }

      val ms = maintainers.result()
      if (ms.length == 1) out += d("Maintainer", UPerson(ms.head), Certain, origin)
      else ms.foreach(m => out += d("Maintainer", UPerson(m), Possible, origin))

      Right(out.result())
    }

  // ---------- nuspec (src/providers/nuspec.rs) ----------

  def nuspec(origin: String, content: String): Result =
    Xmls.parse(content).flatMap { root =>
      if (root.label != "package")
        return Left(s"Expected 'package' root tag, got ${root.label}")
      val metadata = Xmls.child(root, "metadata")
        .getOrElse(return Left("Unable to find metadata tag"))
      val out = List.newBuilder[Datum]
      Xmls.childText(metadata, "version").foreach(v => out += d("Version", UStr(v), Certain, origin))
      Xmls.childText(metadata, "description").foreach(v => out += d("Description", UStr(v), Certain, origin))
      Xmls.childText(metadata, "authors").foreach { a =>
        out += d("Author", UPersons(a.split(",").toList.map(Person.parse)), Certain, origin)
      }
      Xmls.childText(metadata, "projectUrl").foreach { pu =>
        UrlLite.parse(pu).flatMap(Vcs.guessRepoFromUrl).foreach(r =>
          out += d("Repository", UStr(r), Confident, origin))
        out += d("Homepage", UStr(pu), Certain, origin)
      }
      Xmls.childText(metadata, "license").foreach(v => out += d("License", UStr(v), Certain, origin))
      Xmls.childText(metadata, "copyright").foreach(v => out += d("Copyright", UStr(v), Certain, origin))
      Xmls.childText(metadata, "title").foreach(v => out += d("Name", UStr(v), Likely, origin))
      Xmls.childText(metadata, "summary").foreach(v => out += d("Summary", UStr(v), Likely, origin))
      Xmls.child(metadata, "repository").foreach { repo =>
        repo.attribute("url").map(_.text).foreach { ru =>
          UrlLite.parse(ru).foreach { u =>
            val branch = repo.attribute("branch").map(_.text)
            out += d("Repository",
              UStr(Vcs.unsplitVcsUrl(Vcs.VcsLocation(u, branch, None))), Certain, origin)
          }
        }
      }
      Right(out.result())
    }

  // ---------- opam (src/providers/ocaml.rs) ----------

  def opam(origin: String, content: String): Result = {
    OpamParser.parse(content).map { items =>
      val out = List.newBuilder[Datum]
      for (item <- items) item match {
        case OpamParser.Variable(name, value) =>
          (name, value) match {
            case ("maintainer", OpamParser.OStr(s)) =>
              out += d("Maintainer", UPerson(Person.parse(s)), Confident, origin)
            case ("license", OpamParser.OStr(s)) =>
              out += d("License", UStr(s), Confident, origin)
            case ("homepage", OpamParser.OStr(s)) =>
              out += d("Homepage", UStr(s), Confident, origin)
            case ("bug-reports", OpamParser.OStr(s)) =>
              out += d("Bug-Database", UStr(s), Confident, origin)
            case ("synopsis", OpamParser.OStr(s)) =>
              out += d("Summary", UStr(s), Confident, origin)
            case ("description", OpamParser.OStr(s)) =>
              out += d("Description", UStr(s), Confident, origin)
            case ("doc", OpamParser.OStr(s)) =>
              out += d("Documentation", UStr(s), Confident, origin)
            case ("version", OpamParser.OStr(s)) =>
              out += d("Version", UStr(s), Confident, origin)
            case ("dev-repo", OpamParser.OStr(s)) =>
              out += d("Repository", UStr(s), Confident, origin)
            case ("authors", OpamParser.OStr(s)) =>
              out += d("Author", UPersons(List(Person.parse(s))), Confident, origin)
            case ("authors", OpamParser.OList(items2)) =>
              val ps = items2.collect { case OpamParser.OStr(s) => Person.parse(s) }
              out += d("Author", UPersons(ps), Confident, origin)
            case _ => ()
          }
        case _ => ()
      }
      out.result()
    }
  }

  // ---------- PEAR / ROS package.xml (src/providers/package_xml.rs) ----------

  def packageXml(origin: String, content: String): Result =
    Xmls.parse(content).flatMap { root =>
      if (root.label != "package")
        return Left(s"Expected 'package' root tag, got ${root.label}")
      val out = List.newBuilder[Datum]
      val leads = List.newBuilder[scala.xml.Elem]
      val maintainers = List.newBuilder[scala.xml.Elem]
      val authors = List.newBuilder[scala.xml.Elem]

      for (child <- root.child if child.isInstanceOf[scala.xml.Elem]) {
        val el = child.asInstanceOf[scala.xml.Elem]
        el.label match {
          case "name" =>
            Xmls.text(el).foreach(t => out += d("Name", UStr(t), Certain, origin))
          case "summary" =>
            Xmls.text(el).foreach(t => out += d("Summary", UStr(t), Certain, origin))
          case "description" =>
            Xmls.text(el).foreach(t => out += d("Description", UStr(t), Certain, origin))
          case "version" =>
            Xmls.child(el, "release").flatMap(Xmls.text).foreach(t =>
              out += d("Version", UStr(t), Certain, origin))
          case "license" =>
            Xmls.text(el).foreach(t => out += d("License", UStr(t), Certain, origin))
          case "url" =>
            el.attribute("type").map(_.text) match {
              case Some("repository") =>
                Xmls.text(el).foreach(t => out += d("Repository", UStr(t), Certain, origin))
              case Some("bugtracker") =>
                Xmls.text(el).foreach(t => out += d("Bug-Database", UStr(t), Certain, origin))
              case _ => ()
            }
          case "lead"       => leads += el
          case "maintainer" => maintainers += el
          case "author"     => authors += el
          case _            => ()
        }
      }

      for (lead <- leads.result().take(1)) {
        val name = Xmls.child(lead, "name").flatMap(Xmls.text)
        val email = Xmls.child(lead, "email").flatMap(Xmls.text)
        val active = Xmls.child(lead, "active").flatMap(Xmls.text)
        if (!active.exists(_ != "yes")) {
          out += d("Maintainer", UPerson(Person(name, email)), Confident, origin)
        }
      }
      val ms = maintainers.result()
      if (ms.length == 1) {
        val name = Xmls.text(ms.head)
        val email = ms.head.attribute("email").map(_.text)
        out += d("Maintainer", UPerson(Person(name, email)), Confident, origin)
      }
      val as = authors.result()
      if (as.nonEmpty) {
        val persons = as.flatMap { a =>
          Xmls.text(a).map(n => Person(Some(n), a.attribute("email").map(_.text)))
        }
        if (persons.nonEmpty) out += d("Author", UPersons(persons), Confident, origin)
      }
      Right(out.result())
    }

  // ---------- debian/* (src/providers/debian.rs) ----------

  def debianWatch(origin: String, content: String, packageName: String): Result = {
    val out = List.newBuilder[Datum]
    for ((url, mode) <- parseWatch(content, packageName)) {
      mode match {
        case "git" | "svn" =>
          // reference serializes via url::Url, normalizing the string
          val normalized = UrlLite.parse(url).map(_.toString).getOrElse(url)
          out += d("Repository", UStr(normalized), Confident, origin)
        case _ =>
          UrlLite.parse(url).foreach { u =>
            if (u.scheme == "http" || u.scheme == "https")
              Vcs.guessRepoFromUrl(u).foreach(r =>
                out += d("Repository", UStr(r), Confident, origin))
          }
      }
      out ++= Forges.metadataFromUrl(url, Some(origin))
    }
    Right(out.result())
  }

  def debianControl(origin: String, content: String, isNative: Option[Boolean]): Result = {
    val paras = parseDeb822(content)
    val source = paras.find(p => deb822Get(p, "Source").isDefined)
      .getOrElse(return Right(Nil))
    val out = List.newBuilder[Datum]
    deb822Get(source, "Homepage").foreach(h => out += d("Homepage", UStr(h), Certain, origin))
    deb822Get(source, "XS-Go-Import-Path").foreach { gip =>
      out += d("Go-Import-Path", UStr(gip), Certain, origin)
      out += d("Repository", UStr(s"https://$gip"), Likely, origin)
    }
    if (isNative.contains(true)) {
      deb822Get(source, "Vcs-Git").foreach(v => out += d("Repository", UStr(v), Certain, origin))
      deb822Get(source, "Vcs-Browser").foreach(v =>
        out += d("Repository-Browse", UStr(v), Certain, origin))
    }
    val binaries = paras.filter(p => deb822Get(p, "Package").isDefined)
    val certainty =
      if (binaries.length == 1 && isNative.contains(true)) Certain
      else if (binaries.length > 1 && isNative.contains(true)) Possible
      else if (binaries.length == 1 && isNative.contains(false)) Confident
      else Likely
    for (binary <- binaries) {
      deb822Get(binary, "Description").foreach { desc =>
        val lines = desc.split("\n", -1).toList
        var summary = lines.head
        var descLines = lines.tail
        if (descLines.nonEmpty && descLines.last.startsWith("This package contains")) {
          summary = summary.split(" - ", -1).head
          descLines = descLines.init
        }
        if (summary.nonEmpty) out += d("Summary", UStr(summary), certainty, origin)
        if (descLines.nonEmpty)
          out += d("Description", UStr(descLines.mkString("\n")), certainty, origin)
      }
    }
    Right(out.result())
  }

  def debianChangelog(origin: String, content: String): Result = {
    parseChangelogFirstEntry(content).map { case (pkg, version, changes) =>
      val out = List.newBuilder[Datum]
      out += d("Name", UStr(pkg), Confident, origin)
      version.foreach(v => out += d("Version", UStr(upstreamVersion(v)), Confident, origin))
      // find_itp over change lines (src/providers/debian.rs:349-370); the
      // subsequent ITP bug-body fetch is network-only and stays out of scope
      findItp(changes).foreach(n => out += d("Debian-ITP", UInt(n), Certain, origin))
      out.result()
    }
  }

  /** metadata_from_itp_bug_body (src/providers/debian.rs:68-183): parses the
    * pseudo-header block of a Debian ITP bug report plus the free-form
    * description that follows. Pure text→datums — only the bug FETCH is
    * network (out of scope); exposed for callers that already hold the body.
    */
  def metadataFromItpBugBody(origin: Option[String], body: String): Result = {
    // mirror Rust split_terminator: drop a single trailing empty piece
    val all = body.split("\n", -1)
    val lines = (if (all.nonEmpty && all.last.isEmpty) all.dropRight(1) else all).iterator
    def nextOpt(): Option[String] = if (lines.hasNext) Some(lines.next()) else None

    // skip the bug-metadata block (severity, owner, …) up to a blank line
    var cur = nextOpt()
    while (cur.exists(l => l.trim.nonEmpty)) cur = nextOpt()
    if (cur.isDefined) cur = nextOpt()
    // skip fully-empty lines before the pseudo-header block
    while (cur.exists(_.isEmpty)) cur = nextOpt()

    val out = List.newBuilder[Datum]
    var done = false
    while (!done && cur.isDefined) {
      val line = cur.get.dropWhile(_ == '*').replaceAll("^\\s+", "")
      if (line.isEmpty) done = true
      else {
        line.split(":", 2) match {
          case Array(key0, value0) =>
            val key = key0.trim
            val value = value0.trim
            key match {
              case "Package name" => out += Datum("Name", UStr(value), Some(Confident), origin)
              case "Version"      => out += Datum("Version", UStr(value), Some(Possible), origin)
              case "Upstream Author" if value.nonEmpty =>
                out += Datum("Author", UPersons(List(Person.parse(value))), Some(Confident), origin)
              case "URL"         => out += Datum("Homepage", UStr(value), Some(Confident), origin)
              case "License"     => out += Datum("License", UStr(value), Some(Confident), origin)
              case "Description" => out += Datum("Summary", UStr(value), Some(Confident), origin)
              case _             => () // unknown pseudo-header: ignored
            }
          case _ => () // non-field line: ignored
        }
        cur = nextOpt()
      }
    }

    val rest = List.newBuilder[String]
    var stop = false
    while (!stop && lines.hasNext) {
      val l = lines.next()
      if (l.trim == "-- System Information:") stop = true else rest += l
    }
    out += Datum("Description", UStr(rest.result().mkString("\n")), Some(Likely), origin)
    Right(out.result())
  }

  private val ItpRe = java.util.regex.Pattern
    .compile("\\* Initial release. \\(?Closes: #(\\d+)\\)?")

  /** find_itp (src/providers/debian.rs:363-370): first change line announcing
    * the initial release yields the ITP bug number.
    */
  def findItp(changes: List[String]): Option[Int] =
    changes.iterator.map(ItpRe.matcher)
      .collectFirst { case m if m.find() => m.group(1).toInt }

  def debianRules(origin: String, content: String): Result = {
    val out = List.newBuilder[Datum]
    for (line <- content.split("\n", -1)) {
      val t = line.trim
      val eq = t.indexOf('=')
      if (eq > 0) {
        val key = t.substring(0, eq).stripSuffix(":").stripSuffix("?").trim
        val value = t.substring(eq + 1).trim
        if (key == "DEB_UPSTREAM_GIT") out += d("Repository", UStr(value), Likely, origin)
        else if (key == "DEB_UPSTREAM_URL") out += d("Download", UStr(value), Likely, origin)
      }
    }
    Right(out.result())
  }

  def debianCopyright(origin: String, content: String): Result = {
    val out = List.newBuilder[Datum]
    val urls = List.newBuilder[String]
    val machineReadable = content.linesIterator.toList.headOption
      .exists(_.startsWith("Format:"))

    if (machineReadable) {
      val paras = parseDeb822(content)
      val header = paras.headOption.getOrElse(return Right(Nil))
      deb822Get(header, "Upstream-Name").foreach { n =>
        val c = if (n.contains(' ')) Confident else Certain
        out += d("Name", UStr(n), c, origin)
      }
      deb822Get(header, "Upstream-Contact").foreach(c =>
        out += d("Contact", UStr(c), Possible, origin))
      deb822Get(header, "Source").foreach { source =>
        if (source.contains(' '))
          urls ++= source.split("[ \n,]").filter(_.nonEmpty)
        else urls += source
        val m = java.util.regex.Pattern.compile("(http|https)://([^ ,]+)").matcher(source)
        while (m.find()) urls += m.group(0)
      }
      deb822Get(header, "X-Upstream-Bugs").foreach(b =>
        out += d("Bug-Database", UStr(b), Certain, origin))
      deb822Get(header, "X-Source-Downloaded-From").foreach { s =>
        UrlLite.parse(s).foreach(u => urls += u.toString)
        out += d("Download", UStr(s), Certain, origin)
      }
      // all "License:" first-lines across License/Files paragraphs
      val licenses = paras.flatMap(p => deb822Get(p, "License"))
        .map(_.split("\n", 2)(0).trim).filter(_.nonEmpty).toSet
      if (licenses.size == 1)
        out += d("License", UStr(licenses.head), Certain, origin)
    } else {
      for (line <- content.split("\n", -1)) {
        if (line.startsWith("Upstream-Name: "))
          out += d("Name", UStr(line.stripPrefix("Upstream-Name: ")), Possible, origin)
        val m = java.util.regex.Pattern
          .compile(".* was downloaded from ([^\\s]+)").matcher(line)
        if (m.matches()) {
          urls += m.group(1)
          out += d("Download", UStr(m.group(1)), Possible, origin)
        }
      }
    }
    for (url <- urls.result()) {
      UrlLite.parse(url).foreach { u =>
        Vcs.guessRepoFromUrl(u).foreach(r =>
          out += d("Repository", UStr(r), Confident, origin))
      }
      out ++= Forges.metadataFromUrl(url, Some(origin))
    }
    Right(out.result())
  }

  def debianPatch(origin: String, content: String): Result = {
    val out = List.newBuilder[Datum]
    for (line <- content.split("\n", -1)) {
      if (line.startsWith("Forwarded: ")) {
        val fwd = line.split(":", 2)(1).trim
        UrlLite.parse(fwd).foreach { u =>
          Forges.bugDatabaseFromIssueUrl(u).foreach(b =>
            out += d("Bug-Database", UStr(b.toString), Possible, origin))
          Forges.repoUrlFromMergeRequestUrl(u).foreach(r =>
            out += d("Repository", UStr(r.toString), Possible, origin))
        }
      }
    }
    Right(out.result())
  }

  def getOrigSource(origin: String, content: String): Result = {
    val out = List.newBuilder[Datum]
    for (line <- content.split("\n", -1)) {
      VcsCommand.urlFromVcsCommand(line).foreach { url =>
        val c = if (url.contains('$')) Possible else Likely
        out += d("Repository", UStr(url), c, origin)
      }
    }
    Right(out.result())
  }

  // ---------- guess_from_path (src/lib.rs:2630-2662) ----------

  private val PathNameRe = java.util.regex.Pattern.compile("(.*)-([0-9.]+)")

  def fromPath(basename: String): List[Datum] = {
    val m = PathNameRe.matcher(basename)
    if (m.find()) {
      List(
        Datum("Name", UStr(m.group(1)), Some(Possible), Some(".")),
        Datum("Version", UStr(m.group(2)), Some(Possible), Some(".")))
    } else {
      List(Datum("Name", UStr(basename), Some(Possible), Some(".")))
    }
  }
}

/** Minimal XML helpers over scala-xml matching xmltree semantics. */
object Xmls {
  def parse(content: String): Either[String, scala.xml.Elem] =
    try Right(scala.xml.XML.loadString(content))
    catch { case e: Exception => Left(e.getMessage) }

  def child(el: scala.xml.Node, name: String): Option[scala.xml.Elem] =
    el.child.collectFirst { case e: scala.xml.Elem if e.label == name => e }

  def children(el: scala.xml.Node, name: String): List[scala.xml.Elem] =
    el.child.collect { case e: scala.xml.Elem if e.label == name => e }.toList

  /** xmltree get_text: concatenated direct text/CDATA children; None if the
    * result is empty.
    */
  def text(el: scala.xml.Node): Option[String] = {
    val sb = new StringBuilder
    el.child.foreach {
      case t: scala.xml.Text   => sb.append(t.data)
      case t: scala.xml.PCData => sb.append(t.data)
      case a: scala.xml.Atom[_] => sb.append(a.text)
      case _                   => ()
    }
    val s = sb.toString
    if (s.isEmpty) None else Some(s)
  }

  def textRaw(el: scala.xml.Node): Option[String] = text(el)

  def childText(el: scala.xml.Node, name: String): Option[String] =
    child(el, name).flatMap(text)
}
