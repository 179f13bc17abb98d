package graft.extract

import graft.core._
import graft.urls._
import MiniHtml._

/** README text-extraction pipeline — the byte-identity-critical core.
  * Port of /root/reference/src/readme.rs.
  */
object Readme {
  import Certainty._
  import java.util.regex.Pattern

  private val MS = Pattern.MULTILINE | Pattern.DOTALL

  private def re(p: String): Pattern = Pattern.compile(p, MS)

  private val SeeForMore = re("^See .* for more (details|information)\\.")
  private val SeeForInstructions = re("^See .* for instructions")
  private val PleaseRefer = re("^Please refer .*\\.")
  private val LicensedUnder = re("^It is licensed under (.*)")
  private val LicenseColon = re("^License: (.*)")
  private val HomepageColon = re("^(Home page|homepage_url|Main website|Website|Homepage): (.*)")
  private val MoreDocs = re("^More documentation .* at http.*")
  private val DocsAt = re("^Documentation (can be found|is hosted|is available) (at|on) ([^ ]+)")
  private val DocsFor = re("^Documentation for (.*)\\s+(can\\s+be\\s+found|is\\s+hosted)\\s+(at|on)\\s+([^ ]+)")
  private val DocsFound = re("^Documentation[, ].*found.*(at|on).*\\.")
  private val SeeUrl = re("^See (http.*|gopkg.in.*|github.com.*)")
  private val AvailableOn = re("^Available on (.*)")
  private val FreelyDistributable = re("^This software is freely distributable under the (.*) license.*")
  private val HostedAt = re("^This .* is hosted at .*")
  private val DevelopedBy = re("^This code has been developed by .*")
  private val BugsReportedBy = re("^Bugs should be reported by .*")
  private val BugTrackerAt = re("^The bug tracker can be found at (http[^ ]+[^.])")
  private val CopyrightRe = re("^Copyright (\\(c\\) |)(.*)")
  private val YouInstall = re("^You install .*")
  private val FreeSoftware = re("^This .* is free software; .*")
  private val ReportBugs = re("^Please report any bugs(.*) to <(.*)>")
  private val ShareAndEnjoy = re("^Share and Enjoy")
  private val ForFurther = re("^For further information, .*")
  private val FurtherInfo = re("^Further information .*")
  private val ChangelogFound = re("^A detailed ChangeLog can be found.*:\\s+(http.*)")

  private def datum(field: String, v: UValue, c: Int): Datum =
    Datum(field, v, Some(c), None)

  /** skip_paragraph (src/readme.rs:12-198): ordered rules that both filter
    * boilerplate paragraphs and harvest side-channel metadata.
    */
  def skipParagraph(para: String): (Boolean, List[Datum]) = {
    val ret = List.newBuilder[Datum]
    if (para.contains("See ") && SeeForMore.matcher(para).find()) return (true, Nil)
    if (para.contains("See ") && SeeForInstructions.matcher(para).find()) return (true, Nil)
    if (para.contains("Please refer") && PleaseRefer.matcher(para).find()) return (true, Nil)
    if (para.contains("It is licensed under")) {
      val m = LicensedUnder.matcher(para)
      if (m.find()) {
        ret += datum("License", UStr(m.group(1)), Possible)
        return (true, ret.result())
      }
    }
    if (para.contains("License: ")) {
      val m = LicenseColon.matcher(para)
      if (m.find()) {
        ret += datum("License", UStr(m.group(1)), Likely)
        return (true, ret.result())
      }
    }
    if (para.contains("Home page: ") || para.contains("homepage_url: ") ||
        para.contains("Main website: ") || para.contains("Website: ") ||
        para.contains("Homepage: ")) {
      val m = HomepageColon.matcher(para)
      if (m.find()) {
        var url = m.group(2)
        if (url.startsWith("<") && url.endsWith(">")) url = url.substring(1, url.length - 1)
        ret += datum("Homepage", UStr(url), Likely)
        return (true, ret.result())
      }
    }
    if (para.contains("More documentation") && MoreDocs.matcher(para).find()) return (true, Nil)
    if (para.contains("Documentation ")) {
      val m = DocsAt.matcher(para)
      if (m.find()) {
        ret += datum("Documentation", UStr(m.group(3)), Likely)
        return (true, ret.result())
      }
    }
    if (para.contains("Documentation for ")) {
      val m = DocsFor.matcher(para)
      if (m.find()) {
        ret += datum("Name", UStr(m.group(1)), Possible)
        ret += datum("Documentation", UStr(m.group(4)), Likely)
        return (true, ret.result())
      }
    }
    if (para.contains("Documentation") && DocsFound.matcher(para).find()) return (true, Nil)
    if (para.contains("See ") && SeeUrl.matcher(para).find()) return (true, Nil)
    if (para.contains("Available on ") && AvailableOn.matcher(para).find()) return (true, Nil)
    if (para.contains("This software is freely distributable under the ")) {
      val m = FreelyDistributable.matcher(para)
      if (m.find()) {
        ret += datum("License", UStr(m.group(1)), Likely)
        return (true, ret.result())
      }
    }
    if (para.contains(" is hosted at ") && HostedAt.matcher(para).find()) return (true, Nil)
    if (para.contains("This code has been developed by ") && DevelopedBy.matcher(para).find()) return (true, Nil)
    if (para.startsWith("Download and install using:")) return (true, Nil)
    if (para.contains("Bugs should be reported by ") && BugsReportedBy.matcher(para).find()) return (true, Nil)
    if (para.contains("The bug tracker can be found at ")) {
      val m = BugTrackerAt.matcher(para)
      if (m.find()) {
        ret += datum("Bug-Database", UStr(m.group(1)), Likely)
        return (true, ret.result())
      }
    }
    if (para.contains("Copyright ")) {
      val m = CopyrightRe.matcher(para)
      if (m.find()) {
        ret += datum("Copyright", UStr(m.group(2)), Possible)
        return (true, ret.result())
      }
    }
    if (para.contains("You install ") && YouInstall.matcher(para).find()) return (true, Nil)
    if (para.contains(" is free software; ") && FreeSoftware.matcher(para).find()) return (true, Nil)
    if (para.contains("Please report any bugs")) {
      val m = ReportBugs.matcher(para)
      if (m.find()) {
        ret += datum("Bug-Database", UStr(m.group(2)), Possible)
        return (true, ret.result())
      }
    }
    if (para.contains("Share and Enjoy") && ShareAndEnjoy.matcher(para).find()) return (true, Nil)
    locally {
      val nl = para.indexOf('\n')
      val first = (if (nl < 0) para else para.substring(0, nl)).trim
      if (first == "perl Makefile.PL" || first == "make" || first == "./configure")
        return (true, Nil)
    }
    if (para.contains("For further information, ") && ForFurther.matcher(para).find()) return (true, Nil)
    if (para.contains("Further information ") && FurtherInfo.matcher(para).find()) return (true, Nil)
    if (para.contains("A detailed ChangeLog can be found")) {
      val m = ChangelogFound.matcher(para)
      if (m.find()) {
        ret += datum("Changelog", UStr(m.group(1)), Possible)
        return (true, ret.result())
      }
    }
    (false, Nil)
  }

  /** parse_first_header_text (src/readme.rs:452-472) */
  def parseFirstHeaderText(text: String): (Option[String], Option[String], Option[String]) = {
    def fullMatch(p: String): Option[java.util.regex.Matcher] = {
      val m = Pattern.compile(p).matcher(text)
      if (m.matches()) Some(m) else None
    }
    fullMatch("([A-Za-z]+) ([0-9.]+)").foreach(m => return (Some(m.group(1)), None, Some(m.group(2))))
    fullMatch("([A-Za-z]+): (.+)").foreach(m => return (Some(m.group(1)), Some(m.group(2)), None))
    fullMatch("([A-Za-z]+) - (.+)").foreach(m => return (Some(m.group(1)), Some(m.group(2)), None))
    fullMatch("([A-Za-z]+) -- (.+)").foreach(m => return (Some(m.group(1)), Some(m.group(2)), None))
    locally {
      val m = Pattern.compile("^([A-Za-z]+) version ([^ ]+)").matcher(text)
      if (m.find()) return (Some(m.group(1)), None, Some(m.group(2)))
    }
    (None, None, None)
  }

  /** description_from_readme_plain (src/readme.rs:491-574) */
  def descriptionFromReadmePlain(text: String): (Option[String], List[Datum]) = {
    var lines = text.split("\n", -1).toList
    // split_terminator: drop trailing empty from final newline
    if (lines.nonEmpty && lines.last.isEmpty) lines = lines.init
    val metadata = List.newBuilder[Datum]

    if (lines.isEmpty) return (None, Nil)

    if (lines.head.trim.nonEmpty && lines.length > 1 &&
        (lines(1).isEmpty || !lines(1).headOption.exists(_.isLetterOrDigit))) {
      val (name, summary, version) = parseFirstHeaderText(lines.head)
      name.foreach(n => metadata += datum("Name", UStr(n), Likely))
      version.foreach(v => metadata += datum("Version", UStr(v), Likely))
      summary.foreach(s => metadata += datum("Summary", UStr(s), Likely))
      if (name.isDefined || version.isDefined || summary.isDefined) lines = lines.tail
    }

    while (lines.nonEmpty && lines.head.trim.forall(_ == '-')) lines = lines.tail

    val paras = List.newBuilder[List[String]]
    var cur = List.newBuilder[String]
    var curNonEmpty = false
    for (line <- lines) {
      if (line.trim.isEmpty) {
        if (curNonEmpty) { paras += cur.result(); cur = List.newBuilder; curNonEmpty = false }
      } else { cur += line; curNonEmpty = true }
    }
    if (curNonEmpty) paras += cur.result()

    var output = List.newBuilder[String]
    var count = 0
    for (para <- paras.result() if para.nonEmpty) {
      val joined = para.mkString("\n")
      val (skip, extra) = skipParagraph(joined)
      metadata ++= extra
      if (!skip) { output += (joined + "\n"); count += 1 }
    }
    val outList0 = output.result()
    val description =
      if (count > 30) None
      else {
        var outList = outList0
        while (outList.nonEmpty && outList.last.trim.isEmpty) outList = outList.init
        Some(outList.mkString("\n"))
      }
    (description, metadata.result())
  }

  // ---------- HTML walk (src/readme.rs:576-1083) ----------

  private def ulIsFieldList(el: HElem): Boolean = {
    val names = Set("Issues", "Home", "Documentation", "License")
    val FieldRe = Pattern.compile("([A-Za-z]+)\\s*:.*")
    findAll(el, "li").forall { li =>
      val m = FieldRe.matcher(render(li).trim)
      if (m.matches()) names.contains(m.group(1)) else false
    }
  }

  private def parseField(name: String, body: Either[HElem, String]): List[Datum] = {
    def getLink: Option[String] = body match {
      case Left(node) =>
        findAll(node, "a").headOption.flatMap(_.attrs.get("href"))
          .orElse(if (node.tag == "a") node.attrs.get("href") else None)
          .orElse {
            val t = render(node)
            if (node.children.forall(_.isInstanceOf[HText]) && UrlLite.parse(t).isDefined)
              Some(t)
            else None
          }
      case Right(text) => UrlLite.parse(text).map(_ => text)
    }
    name match {
      case "Homepage" | "Home" =>
        getLink.map(l => datum("Homepage", UStr(l), Confident)).toList
      case "Issues" =>
        getLink.map(l => datum("Bug-Database", UStr(l), Confident)).toList
      case "Documentation" =>
        getLink.map(l => datum("Documentation", UStr(l), Confident)).toList
      case "License" =>
        List(datum("License", UStr(body.fold(render, identity)), Confident))
      case _ => Nil
    }
  }

  private def iterUlFieldList(el: HElem): List[(String, Either[HElem, String])] =
    findAll(el, "li").toList.flatMap { li =>
      val children = li.children
      if (children.length == 2 && children(0).isInstanceOf[HText]) {
        val name = children(0).asInstanceOf[HText].data.trim.reverse.dropWhile(_ == ':').reverse
        children(1) match {
          case e: HElem  => Some((name, Left(e)))
          case HText(t)  => Some((name, Right(t)))
        }
      } else if (children.length == 1) {
        children(0) match {
          case HText(t) =>
            t.split(":", 2) match {
              case Array(n, v) => Some((n.trim, Right(v.trim.dropWhile(_ == ':'))))
              case _           => None
            }
          case _ => None
        }
      } else None
    }

  private def parseUlFieldList(el: HElem): List[Datum] =
    iterUlFieldList(el).flatMap { case (n, b) => parseField(n, b) }

  private def parseFirstHeader(el: HElem): List[Datum] = {
    val metadata = List.newBuilder[Datum]
    val text = render(el)
    val (name0, summary, version) = parseFirstHeaderText(text)
    name0.foreach { name =>
      if (name.toLowerCase.contains("installation"))
        metadata += datum("Name", UStr(name), Possible)
      else
        metadata += datum("Name", UStr(name), Likely)
      val stripped = if (name.startsWith("About ")) name.stripPrefix("About ") else name
      metadata += datum("Name", UStr(stripped), Likely)
    }
    summary.foreach(s => metadata += datum("Summary", UStr(s), Likely))
    version.foreach(v => metadata += datum("Version", UStr(v), Likely))
    metadata.result()
  }

  private val SemiHeaderRe = Pattern.compile("([a-z-A-Z0-9]+) - ([^\\.]+)")

  private def isSemiHeader(el: HElem): Boolean = {
    if (el.tag != "p") return false
    val text = render(el)
    if (text == "INSTALLATION") return true
    if (text.contains('\n')) return false
    SemiHeaderRe.matcher(text).find()
  }

  private def skipParagraphBlock(para: HElem): (Boolean, List[Datum]) = {
    val (skip, extra0) = skipParagraph(render(para))
    if (skip) return (true, extra0)
    val extra = List.newBuilder[Datum]
    extra ++= extra0

    for (child <- para.children) {
      val skipText = child match {
        case HText(t) => t.trim.isEmpty
        case _        => false
      }
      if (!skipText) child match {
        case a: HElem if a.tag == "a" =>
          val name: Option[String] = para.children.headOption.flatMap {
            case HText(t)                      => Some(t)
            case img: HElem if img.tag == "img" => img.attrs.get("alt")
            case _                             => None
          }
          name.foreach {
            case "CRAN" | "CRAN_Status_Badge" | "CRAN_Logs_Badge" =>
              extra += datum("Archive", UStr("CRAN"), Confident)
            case "Gitter" =>
              a.attrs.get("href").foreach { href =>
                UrlLite.parse(href).foreach { u =>
                  extra += datum("Repository",
                    UStr(s"https://github.com/${u.path.dropWhile(_ == '/')}"), Confident)
                }
              }
            case "Build Status" =>
              a.attrs.get("href").foreach { href =>
                UrlLite.parse(href).foreach { u =>
                  if (u.host.contains("travis-ci.org"))
                    extra += datum("Repository",
                      UStr(s"https://github.com/${u.path.dropWhile(_ == '/')}"), Confident)
                }
              }
            case "Documentation" =>
              a.attrs.get("href").foreach(h => extra += datum("Documentation", UStr(h), Confident))
            case "API Docs" =>
              a.attrs.get("href").foreach(h => extra += datum("API-Documentation", UStr(h), Confident))
            case "Downloads" =>
              a.attrs.get("href").foreach(h => extra += datum("Download", UStr(h), Confident))
            case "crates.io" =>
              a.attrs.get("href").foreach { h =>
                if (h.startsWith("https://crates.io/crates/"))
                  extra += datum("Cargo-Crate", UStr(h.split('/').last), Confident)
              }
            case n =>
              val m = Pattern.compile("(.*) License").matcher(n)
              if (m.matches())
                extra += datum("License", UStr(m.group(1)), Likely)
          }
        case _ => ()
      }
    }

    if (render(para).isEmpty) (true, extra.result())
    else (false, Nil)
  }

  private def extractParagraphs(
      children: Iterable[HNode],
      paragraphs: scala.collection.mutable.ArrayBuffer[String],
      metadata: scala.collection.mutable.ArrayBuffer[Datum]
  ): Unit = {
    val it = children.iterator
    var break = false
    while (it.hasNext && !break) {
      val child = it.next()
      child match {
        case e: HElem if e.tag == "div" =>
          extractParagraphs(e.children, paragraphs, metadata)
          if (paragraphs.nonEmpty &&
              e.attrs.get("class").exists(_.split(' ').contains("section")))
            break = true
        case e: HElem if e.tag == "section" =>
          extractParagraphs(e.children, paragraphs, metadata)
          if (paragraphs.nonEmpty) break = true
        case e: HElem if e.tag == "p" =>
          if (isSemiHeader(e)) {
            if (paragraphs.isEmpty) {
              metadata ++= parseFirstHeader(e)
            } else break = true
          } else {
            val (skip, extra) = skipParagraphBlock(e)
            metadata ++= extra
            if (skip) {
              if (paragraphs.nonEmpty) break = true
            } else {
              val text = render(e)
              if (text.trim.nonEmpty) paragraphs.append(text + "\n")
            }
          }
        case e: HElem if e.tag == "pre" =>
          paragraphs.append(render(e))
        case e: HElem if e.tag == "ul" && paragraphs.nonEmpty =>
          if (ulIsFieldList(e)) metadata ++= parseUlFieldList(e)
          else paragraphs.append(
            findAll(e, "li").map(li => s"* ${render(li)}\n").mkString(""))
        case e: HElem if e.tag.startsWith("h") && e.tag.length == 2 &&
            e.tag.charAt(1).isDigit =>
          if (paragraphs.isEmpty) {
            if (!Set("About", "Introduction", "Overview", "Documentation")
                  .contains(render(e).trim))
              metadata ++= parseFirstHeader(e)
          } else break = true
        case _ => ()
      }
    }
  }

  /** description_from_basic_soup (src/readme.rs:1028-1075) */
  def descriptionFromBody(body: HElem): (Option[String], List[Datum]) = {
    val metadata = scala.collection.mutable.ArrayBuffer.empty[Datum]

    var children = body.children.toList
    var dropping = true
    while (dropping && children.nonEmpty) {
      children.head match {
        case e: HElem if e.tag.startsWith("h") && e.tag.length == 2 &&
            e.tag.charAt(1).isDigit =>
          metadata ++= parseFirstHeader(e)
          children = children.tail
        case HText(_) => children = children.tail
        case _        => dropping = false
      }
    }

    // table.field-list anywhere in the document
    findAll(body, "table")
      .find(_.attrs.get("class").exists(_.split(' ').contains("field-list")))
      .foreach(t => metadata ++= parseUlFieldList(t))

    val paragraphs = scala.collection.mutable.ArrayBuffer.empty[String]
    extractParagraphs(children, paragraphs, metadata)

    if (paragraphs.isEmpty) (None, metadata.toList)
    else if (paragraphs.length < 6) (Some(paragraphs.mkString("\n")), metadata.toList)
    else (None, metadata.toList)
  }

  def descriptionFromReadmeHtml(html: String): (Option[String], List[Datum]) =
    descriptionFromBody(MiniHtml.parse(html))

  /** description_from_readme_md (src/readme.rs:250-259) */
  def descriptionFromReadmeMd(text: String): (Option[String], List[Datum]) =
    descriptionFromReadmeHtml(Markdown.toHtml(text))

  /** description_from_readme_rst (src/readme.rs:201-247) */
  def descriptionFromReadmeRst(text: String): Either[String, (Option[String], List[Datum])] = {
    val fields = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var inField = false
    val FieldRe = Pattern.compile("^:([^:]+): (.*)")
    val kept = List.newBuilder[String]
    for (line <- text.split("\n", -1)) {
      if ((line.startsWith(" ") || line.startsWith("\t")) && inField) {
        val (k, v) = fields(fields.length - 1)
        fields(fields.length - 1) = (k, v + line.trim)
      } else {
        inField = false
        val m = FieldRe.matcher(line)
        if (m.matches()) {
          fields.append((m.group(1), m.group(2)))
          inField = true
        } else if (line != "----") {
          kept += line
        }
      }
    }
    val filtered = kept.result().mkString("\n") + "\n"

    Rst.toHtml(filtered).map { html =>
      val (description, md0) = descriptionFromReadmeHtml(html)
      val md = md0 ++ fields.toList.flatMap { case (f, v) => parseField(f, Right(v)) }
      (description, md)
    }
  }

  // ---------- guess_from_readme (src/readme.rs:262-449) ----------

  private val BacktickClone = Pattern.compile("[\"'`](git clone.*)[\"`']")
  private val SvnCo = Pattern.compile("(\\$ )?(svn co .*)")
  private val ProjectReStr = "([^/]+)/([^/?.()\"#>\\s]*[^-,/?.()\"#>\\s])"
  private val TravisRe = Pattern.compile("https://travis-ci.org/" + ProjectReStr)
  private val CoverallsRe = Pattern.compile("https://coveralls.io/r/" + ProjectReStr)
  private val GithubIssuesRe = Pattern.compile("https://github.com/([^/]+)/([^/]+)/issues")
  private val GithubGitRe = Pattern.compile("https://github.com/" + ProjectReStr + "/(.git)?")
  private val GithubRe = Pattern.compile("https://github.com/" + ProjectReStr)
  private val GitSchemeRe = Pattern.compile("git://([^ ]+)")

  /** Returns the datums; `ext` is the lowercase filename extension ("" for
    * none), `origin` the relpath.
    */
  def guessFromReadme(origin: String, ext: Option[String], content: String)
      : Either[String, List[Datum]] = {
    val urls = scala.collection.mutable.ArrayBuffer.empty[UrlLite]
    val ret = scala.collection.mutable.ArrayBuffer.empty[Datum]

    val rawLines = content.split("\n", -1)
    var li = 0
    while (li < rawLines.length) {
      val line = rawLines(li).trim
      var cmdline = line.stripPrefix("$").trim
      if (cmdline.startsWith("git clone ") || cmdline.startsWith("fossil clone ") ||
          cmdline.startsWith("hg clone ") || cmdline.startsWith("bzr co ") ||
          cmdline.startsWith("bzr branch ")) {
        while (cmdline.endsWith("\\") && li + 1 < rawLines.length) {
          li += 1
          cmdline = s"$cmdline ${rawLines(li).trim}"
        }
        VcsCommand.urlFromVcsCommand(cmdline).foreach { u =>
          UrlLite.parse(u).foreach(urls.append)
        }
      }
      if (line.contains("git clone")) {
        val m = BacktickClone.matcher(line)
        while (m.find()) {
          VcsCommand.urlFromGitCloneCommand(m.group(1)).foreach { u =>
            UrlLite.parse(u).foreach(urls.append)
          }
        }
      }
      if (line.contains("svn co ")) {
        val m = SvnCo.matcher(line)
        while (m.find()) {
          VcsCommand.urlFromSvnCoCommand(m.group(2)).foreach { u =>
            UrlLite.parse(u).foreach(urls.append)
          }
        }
      }
      if (line.contains("https://travis-ci.org/")) {
        val m = TravisRe.matcher(line)
        while (m.find())
          ret.append(datumO(origin, "Repository",
            s"https://github.com/${m.group(1)}/${m.group(2)}", Possible))
      }
      if (line.contains("https://coveralls.io/r/")) {
        val m = CoverallsRe.matcher(line)
        while (m.find())
          ret.append(datumO(origin, "Repository",
            s"https://github.com/${m.group(1)}/${m.group(2)}", Possible))
      }
      if (line.contains("https://github.com/")) {
        val m = GithubIssuesRe.matcher(line)
        while (m.find())
          ret.append(datumO(origin, "Bug-Database", m.group(0), Possible))
      }
      if (line.contains("https://github.com/")) {
        val m = GithubGitRe.matcher(line)
        while (m.find())
          ret.append(datumO(origin, "Repository",
            m.group(0).reverse.dropWhile(_ == '.').reverse, Possible))
      }
      if (line.contains("https://github.com/")) {
        val m = GithubRe.matcher(line)
        if (m.find())
          ret.append(datumO(origin, "Repository",
            m.group(0).reverse.dropWhile(_ == '.').reverse, Possible))
      }
      if (line.contains("git://")) {
        val m = GitSchemeRe.matcher(line)
        if (m.find())
          ret.append(datumO(origin, "Repository",
            m.group(0).reverse.dropWhile(_ == '.').reverse, Possible))
      }
      li += 1
    }

    val parsed: Either[String, (Option[String], List[Datum])] = ext match {
      case Some("md")  => Right(descriptionFromReadmeMd(content))
      case Some("rst") => descriptionFromReadmeRst(content)
      case None        => Right(descriptionFromReadmePlain(content))
      // README.pod routes to the POD provider (src/readme.rs:412-419):
      // no description extraction, datums carry their own certainty
      case Some("pod") => Extractors.pod(origin, content).map(md => (None, md))
      case Some(_)     => Right((None, Nil))
    }

    parsed.map { case (description, extraMetadata) =>
      description.foreach(dd =>
        ret.append(Datum("Description", UStr(dd), Some(Possible), Some(origin))))
      ret.appendAll(extraMetadata)

      // stable sort: ssh URLs last; first wins
      val sorted = urls.toList.sortBy(u => if (u.scheme.contains("ssh")) 1 else 0)
      sorted.headOption.foreach(u =>
        ret.append(Datum("Repository", UStr(u.toString), Some(Possible), Some(origin))))
      ret.toList
    }
  }

  private def datumO(origin: String, field: String, v: String, c: Int): Datum =
    Datum(field, UStr(v), Some(c), Some(origin))
}
