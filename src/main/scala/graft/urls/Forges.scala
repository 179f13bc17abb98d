package graft.urls

import graft.core.{Certainty, Datum, UStr}

/** Per-forge URL algebra: bug-submit ↔ bug-database ↔ repo ↔ issue/MR URL
  * derivations. Port of the offline parts of the `Forge` impls in
  * /root/reference/src/lib.rs:1748-2546 plus the URL→package-name extractors
  * (src/lib.rs:2549-2608, src/forges/sourceforge.rs:163-175).
  */
object Forges {
  import UrlLite.{withPathSegments, toHttpsUrl}

  sealed trait Forge {
    def repositoryBrowseCanBeHomepage: Boolean
    def bugDatabaseUrlFromBugSubmitUrl(u: UrlLite): Option[UrlLite] = None
    def bugSubmitUrlFromBugDatabaseUrl(u: UrlLite): Option[UrlLite] = None
    def bugDatabaseFromIssueUrl(u: UrlLite): Option[UrlLite] = None
    def bugDatabaseUrlFromRepoUrl(u: UrlLite): Option[UrlLite] = None
    def repoUrlFromMergeRequestUrl(u: UrlLite): Option[UrlLite] = None
  }

  /** GitHub (src/lib.rs:1824-1990) */
  object GitHub extends Forge {
    def repositoryBrowseCanBeHomepage = true

    override def bugDatabaseUrlFromBugSubmitUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None)
      if (segs.length != 3 && segs.length != 4) return None
      if (segs(2) != "issues") return None
      toHttpsUrl(u).flatMap(h => withPathSegments(h, segs.take(3)))
    }

    override def bugSubmitUrlFromBugDatabaseUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None)
      if (segs.length != 3 || segs(2) != "issues") return None
      toHttpsUrl(u).map(h => h.withPathSegments(segs.take(3) :+ "new"))
    }

    override def bugDatabaseFromIssueUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None)
      if (segs.length < 4 || segs(2) != "issues" || segs(3).toIntOption.isEmpty)
        return None
      toHttpsUrl(u).flatMap(h => withPathSegments(h, segs.take(3)))
    }

    override def bugDatabaseUrlFromRepoUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None).take(2)
      if (segs.length < 2) return None
      val repo = segs(1).stripSuffix(".git")
      toHttpsUrl(u).flatMap(h => withPathSegments(h, Seq(segs(0), repo, "issues")))
    }

    override def repoUrlFromMergeRequestUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None)
      if (segs.length < 4 || segs(2) != "pull" || segs(3).toIntOption.isEmpty)
        return None
      toHttpsUrl(u).flatMap(h => withPathSegments(h, segs.take(2)))
    }
  }

  /** GitLab (src/lib.rs:2014-2206) */
  object GitLab extends Forge {
    def repositoryBrowseCanBeHomepage = true

    override def bugDatabaseUrlFromBugSubmitUrl(u: UrlLite): Option[UrlLite] = {
      var segs = u.pathSegments.getOrElse(return None)
      if (segs.length < 2) return None
      if (segs(segs.length - 2) != "issues") return None
      if (segs.last != "new") segs = segs.dropRight(1)
      withPathSegments(u, segs.take(segs.length - 3))
    }

    override def bugSubmitUrlFromBugDatabaseUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None)
      if (segs.length < 2) return None
      if (segs.last != "issues") return None
      Some(u.withPathSegments(segs :+ "new"))
    }

    override def bugDatabaseFromIssueUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None)
      if (segs.length < 2 || segs(segs.length - 2) != "issues" ||
          segs.last.toIntOption.isEmpty) return None
      withPathSegments(u, segs.dropRight(1))
    }

    override def bugDatabaseUrlFromRepoUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None)
      val last = segs.lastOption.getOrElse(return None)
      val newSegs = segs.dropRight(1) :+ last.stripSuffix(".git") :+ "issues"
      Some(u.withPathSegments(newSegs))
    }

    override def repoUrlFromMergeRequestUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None)
      if (segs.length < 3 || segs(segs.length - 2) != "merge_requests" ||
          segs.last.toIntOption.isEmpty) return None
      withPathSegments(u, segs.dropRight(2))
    }
  }

  /** SourceForge (src/lib.rs:2342-2384) */
  object SourceForge extends Forge {
    def repositoryBrowseCanBeHomepage = false

    override def bugDatabaseUrlFromBugSubmitUrl(u: UrlLite): Option[UrlLite] = {
      val segs = u.pathSegments.getOrElse(return None)
      if (segs.length < 3) return None
      if (segs(0) != "p" || segs(2) != "bugs") return None
      withPathSegments(u, Seq("p", segs(1), "bugs"))
    }
  }

  /** Launchpad (src/lib.rs:2402-2431) */
  object Launchpad extends Forge {
    def repositoryBrowseCanBeHomepage = false

    override def bugDatabaseUrlFromBugSubmitUrl(u: UrlLite): Option[UrlLite] = {
      if (!u.host.contains("bugs.launchpad.net")) return None
      val segs = u.pathSegments.getOrElse(return None)
      val project = segs.headOption.getOrElse(return None)
      withPathSegments(u, Seq(project))
    }

    override def bugSubmitUrlFromBugDatabaseUrl(u: UrlLite): Option[UrlLite] = {
      if (!u.host.contains("bugs.launchpad.net")) return None
      val segs = u.pathSegments.getOrElse(return None)
      val project = segs.headOption.getOrElse(return None)
      withPathSegments(u, Seq(project, "+filebug"))
    }
  }

  /** find_forge (src/lib.rs:2434-2452), offline. */
  def findForge(u: UrlLite): Option[Forge] = {
    val host = u.host.getOrElse(return None)
    if (host == "sourceforge.net") Some(SourceForge)
    else if (host.endsWith(".launchpad.net")) Some(Launchpad)
    else if (host == "github.com") Some(GitHub)
    else if (Vcs.isGitlabSite(host)) Some(GitLab)
    else None
  }

  def bugSubmitUrlFromBugDatabaseUrl(u: UrlLite): Option[UrlLite] =
    findForge(u).flatMap(_.bugSubmitUrlFromBugDatabaseUrl(u))

  def bugDatabaseUrlFromBugSubmitUrl(u: UrlLite): Option[UrlLite] =
    findForge(u).flatMap(_.bugDatabaseUrlFromBugSubmitUrl(u))

  def guessBugDatabaseUrlFromRepoUrl(u: UrlLite): Option[UrlLite] =
    findForge(u).flatMap(_.bugDatabaseUrlFromRepoUrl(u))

  def repoUrlFromMergeRequestUrl(u: UrlLite): Option[UrlLite] =
    findForge(u).flatMap(_.repoUrlFromMergeRequestUrl(u))

  def bugDatabaseFromIssueUrl(u: UrlLite): Option[UrlLite] =
    findForge(u).flatMap(_.bugDatabaseFromIssueUrl(u))

  // ---- URL → package-name extractors ----

  private val PeclRe =
    java.util.regex.Pattern.compile("https?://pecl\\.php\\.net/package/(.*)")
  private val HackageRe =
    java.util.regex.Pattern.compile("https?://hackage\\.haskell\\.org/package/([^/]+)/.*")
  private val SfProjectsRe =
    java.util.regex.Pattern.compile("https?://sourceforge\\.net/(projects|p)/([^/]+)")
  private val SfHostRe =
    java.util.regex.Pattern.compile("https?://(.*).(sf|sourceforge).(net|io)/.*")

  def extractPeclPackageName(url: String): Option[String] = {
    val m = PeclRe.matcher(url)
    if (m.find() && m.start() == 0) Some(m.group(1)) else None
  }

  def extractHackagePackage(url: String): Option[String] = {
    val m = HackageRe.matcher(url)
    if (m.find() && m.start() == 0) Some(m.group(1)) else None
  }

  def extractSfProjectName(url: String): Option[String] = {
    val m1 = SfProjectsRe.matcher(url)
    if (m1.find()) return Some(m1.group(2))
    val m2 = SfHostRe.matcher(url)
    if (m2.find()) return Some(m2.group(1))
    None
  }

  /** metadata_from_url (src/lib.rs:2567-2608) */
  def metadataFromUrl(url: String, origin: Option[String]): List[Datum] = {
    val out = List.newBuilder[Datum]
    extractSfProjectName(url).foreach { p =>
      out += Datum("SourceForge-Project", UStr(p), Some(Certainty.Certain), origin)
      out += Datum("Archive", UStr("SourceForge"), Some(Certainty.Certain), origin)
    }
    extractPeclPackageName(url).foreach { p =>
      out += Datum("Pecl-Package", UStr(p), Some(Certainty.Certain), origin)
      out += Datum("Archive", UStr("Pecl"), Some(Certainty.Certain), origin)
    }
    extractHackagePackage(url).foreach { p =>
      out += Datum("Haskell-Package", UStr(p), Some(Certainty.Certain), origin)
      out += Datum("Archive", UStr("Hackage"), Some(Certainty.Certain), origin)
    }
    out.result()
  }
}
