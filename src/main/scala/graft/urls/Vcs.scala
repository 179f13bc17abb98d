package graft.urls

/** VCS URL algebra — sanitizers, fixers, repo inference, browse-URL
  * derivation. Port of /root/reference/src/vcs.rs with net access hardwired
  * off (the golden-test configuration, /root/reference/build.rs:50).
  *
  * All functions are pure string/URL surgery, usable from Catalyst UDFs and
  * inside Dataset flatMap extractors. Regexes are compiled once per JVM
  * (executor) via object initialization.
  */
object Vcs {
  import UrlLite.{withPathSegments, toHttpsUrl}

  val KnownGitlabSites: Set[String] =
    Set("salsa.debian.org", "invent.kde.org", "0xacab.org")

  val SecureSchemes: Set[String] =
    Set("https", "git+ssh", "bzr+ssh", "hg+ssh", "ssh", "svn+ssh")

  val KnownHostingSites: Set[String] =
    Set("code.launchpad.net", "github.com", "launchpad.net", "git.openstack.org")

  /** vcs.rs:27-29 */
  def plausibleUrl(url: String): Boolean = url.contains(':')

  /** vcs.rs:83-90 */
  def plausibleBrowseUrl(url: String): Boolean =
    UrlLite.parse(url).exists(u => u.scheme == "https" || u.scheme == "http")

  /** vcs.rs:351-365 (net probe disabled) */
  def isGitlabSite(hostname: String): Boolean =
    KnownGitlabSites.contains(hostname) || hostname.startsWith("gitlab.")

  /** vcs.rs:35-45 */
  def dropVcsInScheme(u: UrlLite): Option[UrlLite] = u.scheme match {
    case "git+http" | "git+https" => u.deriveWithScheme(u.scheme.stripPrefix("git+"))
    case "hg+http" | "hg+https"   => u.deriveWithScheme(u.scheme.stripPrefix("hg+"))
    case "bzr+lp" | "bzr+http"    => u.deriveWithScheme(u.scheme.stripPrefix("bzr+"))
    case _                        => None
  }

  /** vcs.rs:48-68: `URL [-b branch] [subpath]` codec. */
  def splitVcsUrl(location: String): (String, Option[String], Option[String]) = {
    var url = location
    var subpath: Option[String] = None
    var branch: Option[String] = None
    val i1 = url.indexOf('[')
    if (i1 >= 0) {
      val i2 = url.indexOf(']')
      if (i2 >= 0) {
        subpath = Some(url.substring(i1 + 1, i2))
        url = url.substring(0, i1)
      }
    }
    val ib = url.indexOf(" -b ")
    if (ib >= 0) {
      branch = Some(url.substring(ib + 4))
      url = url.substring(0, ib)
    }
    (url, branch, subpath)
  }

  final case class VcsLocation(url: UrlLite, branch: Option[String], subpath: Option[String])

  /** vcs.rs:71-80 */
  def unsplitVcsUrl(loc: VcsLocation): String = {
    var s = loc.url.toString
    loc.branch.foreach(b => s = s"$s -b $b")
    loc.subpath.foreach(p => s = s"$s [$p]")
    s
  }

  // ---- individual URL fixers (vcs.rs:1098-1279) ----

  private val PathInPortRe =
    java.util.regex.Pattern.compile("^([^:]+)://([^:]+):([^/]+)(/.*)$")

  def fixPathInPort(url: String): Option[String] = {
    val m = PathInPortRe.matcher(url)
    if (!m.matches()) return None
    val (scheme, host, port, rest) = (m.group(1), m.group(2), m.group(3), m.group(4))
    if (port.endsWith("]")) return None
    val isPort = port.nonEmpty && port.forall(_.isDigit) &&
      port.toLongOption.exists(_ <= 65535L)
    if (isPort) Some(s"$scheme://$host:$port$rest")
    else Some(s"$scheme://$host/$port$rest")
  }

  def fixGitlabScheme(url: String): Option[String] =
    UrlLite.parse(url).flatMap { u =>
      u.host.filter(isGitlabSite).flatMap(_ => u.deriveWithScheme("https").map(_.toString))
    }

  def fixGithubScheme(url: String): Option[String] =
    UrlLite.parse(url).flatMap { u =>
      if (u.host.contains("github.com")) u.deriveWithScheme("https").map(_.toString)
      else None
    }

  def fixSalsaCgitUrl(url: String): Option[String] =
    UrlLite.parse(url).flatMap { u =>
      if (u.host.contains("salsa.debian.org") && u.path.startsWith("/cgit/"))
        Some(u.setPath(u.path.stripPrefix("/cgit")).toString)
      else None
    }

  def fixDoubleSlash(url: String): Option[String] =
    UrlLite.parse(url).flatMap { u =>
      if (u.path.startsWith("//")) Some(u.setPath(u.path.stripPrefix("/")).toString)
      else None
    }

  def fixExtraColon(url: String): Option[String] =
    UrlLite.parse(url).flatMap { u =>
      if (u.path.startsWith("/:")) Some(u.copy(path = "/" + u.path.stripPrefix("/:")).toString)
      else None
    }

  def dropGitUsername(url: String): Option[String] =
    UrlLite.parse(url).flatMap { u =>
      val host = u.host.getOrElse(return None)
      if (!Set("github.com", "salsa.debian.org", "gitlab.com").contains(host)) return None
      if (!Set("git", "http", "https").contains(u.scheme)) return None
      if (u.username == "git") Some(u.setUsername("").toString) else None
    }

  def fixFreedesktopOrgUrl(url: String): Option[String] =
    UrlLite.parse(url).flatMap { u =>
      if (u.host.contains("anongit.freedesktop.org")) {
        val suffix = if (u.path.startsWith("/git/")) Some(u.path.stripPrefix("/git")) else None
        u.deriveWithScheme("https").map { h =>
          val h2 = suffix.map(h.setPath).getOrElse(h)
          h2.setHost("gitlab.freedesktop.org").toString
        }
      } else None
    }

  def fixKdeAnongitUrl(url: String): Option[String] =
    UrlLite.parse(url).flatMap { u =>
      if (u.host.contains("anongit.kde.org")) u.deriveWithScheme("https").map(_.toString)
      else None
    }

  def fixGitGnomeOrgUrl(url: String): Option[String] =
    UrlLite.parse(url).flatMap { u =>
      if (u.host.contains("git.gnome.org")) {
        var segs = u.pathSegments.getOrElse(Vector.empty)
        if (segs.headOption.contains("browse")) segs = segs.tail
        u.deriveWithScheme("https").map { h =>
          h.setHost("gitlab.gnome.org").setPath("GNOME/" + segs.mkString("/")).toString
        }
      } else None
    }

  /** fix_gitlab_tree_in_url (vcs.rs:1147-1163) */
  def fixGitlabTreeInUrl(loc: VcsLocation): Option[VcsLocation] = {
    val host = loc.url.host.getOrElse(return None)
    if (!isGitlabSite(host)) return None
    val segs = loc.url.pathSegments.getOrElse(return None)
    val p = segs.indexOf("tree")
    if (p < 0) return None
    val branch = segs.drop(p + 1).mkString("/")
    Some(VcsLocation(
      loc.url.setPath(segs.take(p).mkString("/")),
      Some(branch),
      loc.subpath
    ))
  }

  /** fix_branch_argument (vcs.rs:1217-1237), github only. */
  def fixBranchArgument(loc: VcsLocation): Option[VcsLocation] = {
    if (!loc.url.host.contains("github.com")) return None
    val segs = loc.url.pathSegments.getOrElse(return None)
    if (segs.length > 2 && segs(2) == "tree") {
      Some(VcsLocation(
        loc.url.setPath(segs.take(2).mkString("/")),
        Some(segs.drop(3).mkString("/")),
        loc.subpath
      ))
    } else None
  }

  /** fixup_git_location (vcs.rs:1287-1299) */
  def fixupGitLocation(loc0: VcsLocation): VcsLocation = {
    var loc = loc0
    loc = fixGitlabTreeInUrl(loc).getOrElse(loc)
    loc = fixBranchArgument(loc).getOrElse(loc)
    loc
  }

  /** fixup_git_url (vcs.rs:1307-1327) */
  def fixupGitUrl(url0: String): String = {
    var url = url0
    url = fixPathInPort(url).getOrElse(url)
    url = fixGitlabScheme(url).getOrElse(url)
    url = fixGithubScheme(url).getOrElse(url)
    url = fixSalsaCgitUrl(url).getOrElse(url)
    url = fixDoubleSlash(url).getOrElse(url)
    url = fixExtraColon(url).getOrElse(url)
    url = dropGitUsername(url).getOrElse(url)
    url = fixFreedesktopOrgUrl(url).getOrElse(url)
    url = fixKdeAnongitUrl(url).getOrElse(url)
    url = fixGitGnomeOrgUrl(url).getOrElse(url)
    url
  }

  /** VcsLocation::from_str (vcs.rs:1059-1067) */
  def locationFromStr(s: String): Option[VcsLocation] = {
    val (url0, branch, subpath) = splitVcsUrl(s)
    val url = fixupGitUrl(url0)
    UrlLite.parse(url).map(VcsLocation(_, branch, subpath))
  }

  /** fixup_rcp_style_git_repo_url (breezy rcp → ssh URL; vcs.rs:933-939).
    * "user@host:path" or "host:path" (host contains a dot, path not
    * absolute) becomes "ssh://[user@]host/path".
    */
  private val RcpRe =
    java.util.regex.Pattern.compile("^(?:([^@:/]+)@)?([A-Za-z0-9._\\-]+):(.*)$")

  def fixupRcpStyleGitRepoUrl(url: String): Option[UrlLite] = {
    if (UrlLite.parse(url).exists(u => !u.cannotBeBase)) return None
    val m = RcpRe.matcher(url)
    if (!m.matches()) return None
    val user = Option(m.group(1))
    val host = m.group(2)
    val path = m.group(3)
    if (!host.contains('.')) return None
    if (path.startsWith("/")) return None
    val userPart = user.map(_ + "@").getOrElse("")
    UrlLite.parse(s"ssh://$userPart$host/$path")
  }

  /** find_public_repo_url (vcs.rs:866-930) */
  def findPublicRepoUrl(repoUrl: String): Option[String] = {
    val parsed = UrlLite.parse(repoUrl) match {
      case Some(p) if !p.cannotBeBase => p
      case _ =>
        if (repoUrl.contains(':')) {
          val m = java.util.regex.Pattern
            .compile("^(?:([^@:/]+)@)?([^/:]+):(.*)$")
            .matcher(repoUrl)
          if (m.matches()) {
            val host = m.group(2)
            val path = m.group(3)
            if (host == "github.com" || isGitlabSite(host))
              return Some(s"https://$host/$path")
          }
        }
        return None
    }

    parsed.host match {
      case Some("github.com") =>
        if (Set("https", "http", "git").contains(parsed.scheme)) Some(repoUrl)
        else UrlLite.parse("https://github.com").flatMap(_.join(parsed.path)).map(_.toString)
      case Some(h) if isGitlabSite(h) =>
        if (Set("https", "http").contains(parsed.scheme)) Some(repoUrl)
        else if (parsed.scheme == "ssh") Some(s"https://$h${parsed.path}")
        else None
      case Some(h @ ("code.launchpad.net" | "bazaar.launchpad.net" | "git.launchpad.net")) =>
        if (parsed.scheme.startsWith("http") || parsed.scheme == "lp") Some(repoUrl)
        else if (Set("ssh", "bzr+ssh").contains(parsed.scheme)) Some(s"https://$h${parsed.path}")
        else None
      case _ => None
    }
  }

  /** canonical_git_repo_url (vcs.rs:727-738) */
  def canonicalGitRepoUrl(u: UrlLite): Option[UrlLite] =
    u.host.flatMap { h =>
      if ((isGitlabSite(h) || h == "github.com") && !u.path.endsWith(".git"))
        Some(u.copy(path = u.path + ".git"))
      else None
    }

  /** find_secure_repo_url (vcs.rs:973-1043), net access off. */
  def findSecureRepoUrl(u0: UrlLite): Option[UrlLite] = {
    var u = u0
    if (SecureSchemes.contains(u.scheme)) return Some(u)

    u.host.foreach { h =>
      if (isGitlabSite(h) || Set(
            "github.com", "git.launchpad.net", "bazaar.launchpad.net", "code.launchpad.net"
          ).contains(h)) {
        u = u.deriveWithScheme("https").getOrElse(u)
      }
    }

    if (u.scheme == "lp") {
      val originalPath = u.path
      u = u.deriveWithScheme("https").getOrElse(u)
      u = u.setHost("code.launchpad.net")
      if (!originalPath.startsWith("/")) u = u.setPath("/" + originalPath)
    }

    u.host match {
      case Some(h) if h == "git.savannah.gnu.org" || h == "git.sv.gnu.org" =>
        if (u.scheme == "http") u = u.deriveWithScheme("https").getOrElse(u)
        else {
          u = u.deriveWithScheme("https").getOrElse(u)
          u = u.setPath("/git" + u.path)
        }
      case Some(_) => ()
      case None    => return None
    }

    if (SecureSchemes.contains(u.scheme)) Some(u) else None
  }

  /** version_in_tags (vcs.rs:145-170): does a tag list plausibly contain a
    * release for `version`? Pure part of the repository version-probe (the
    * probe itself is network-only).
    */
  def versionInTags(version: String, tagNames: Seq[String]): Boolean = {
    if (tagNames.contains(version)) return true
    if (tagNames.contains(s"v$version")) return true
    if (tagNames.contains(s"release/$version")) return true
    val underscored = version.replace('.', '_')
    if (tagNames.contains(underscored)) return true
    tagNames.exists { t =>
      t.endsWith(s"_$version") || t.endsWith(s"-$version") ||
      t.endsWith(s"_$underscored")
    }
  }

  /** guess_repo_from_url (vcs.rs:402-641), net access off. */
  def guessRepoFromUrl(u: UrlLite): Option[String] = {
    val segs: Vector[String] = u.pathSegments.getOrElse(Vector.empty)
    u.host match {
      case None => None
      case Some("github.com") =>
        if (segs.length < 2) None
        else withPathSegments(u, segs.take(2)).map(_.toString)
      case Some("travis-ci.org") =>
        if (segs.length < 2) None
        else Some(s"https://github.com/${segs(0)}/${segs(1)}")
      case Some("coveralls.io") =>
        if (segs.length < 3 || segs(0) != "r") None
        else Some(s"https://github.com/${segs(1)}/${segs(2)}")
      case Some("launchpad.net") =>
        UrlLite.parse(s"https://code.launchpad.net/${segs.headOption.getOrElse("")}")
          .map(_.toString)
      case Some("git.savannah.gnu.org") =>
        if (segs.length < 2 || segs(0) != "git") None else Some(u.toString)
      case Some("freedesktop.org") | Some("www.freedesktop.org") =>
        if (segs.length >= 2 && segs(0) == "software")
          Some(s"https://github.com/freedesktop/${segs(1)}")
        else if (segs.length >= 3 && segs(0) == "wiki" && segs(1) == "Software")
          Some(s"https://github.com/freedesktop/${segs(2)}")
        else None
      case Some("download.gnome.org") =>
        if (segs.length < 2 || segs(0) != "sources") None
        else Some(s"https://gitlab.gnome.org/GNOME/${segs(1)}.git")
      case Some("download.kde.org") =>
        if (segs.length < 2 || (segs(0) != "stable" && segs(0) != "unstable")) None
        else Some(s"https://invent.kde.org/${segs(1)}")
      case Some("ftp.gnome.org") =>
        if (segs.length >= 4 && segs(0) == "pub" && segs(1) == "GNOME" && segs(2) == "sources")
          Some(s"https://gitlab.gnome.org/GNOME/${segs(3)}.git")
        else None
      case Some("sourceforge.net") =>
        if (segs.length >= 4 && segs(0) == "p" && segs(3) == "ci")
          Some(s"https://sourceforge.net/p/${segs(1)}/${segs(2)}")
        else None
      case Some("www.apache.org") =>
        if (segs.length >= 2 && segs(0) == "dist")
          Some(s"https://svn.apache.org/repos/asf/${segs(1)}")
        else None
      case Some("bitbucket.org") =>
        if (segs.length < 2) None
        else withPathSegments(u, segs.take(2)).map(_.toString)
      case Some("ftp.gnu.org") =>
        if (segs.length < 2 || segs(0) != "gnu") None
        else Some(s"https://git.savannah.gnu.org/git/${segs(1)}")
      case Some("download.savannah.gnu.org") =>
        if (segs.length < 2 || segs(0) != "releases") None
        else Some(s"https://git.savannah.gnu.org/git/${segs(1)}")
      case Some(h) if isGitlabSite(h) =>
        if (segs.isEmpty) return None
        val projSegs =
          if (segs.contains("-")) segs.take(segs.indexWhere(_.contains('-')))
          else if (segs.contains("tags")) segs.take(segs.indexOf("tags"))
          else if (segs.contains("blob")) segs.take(segs.indexOf("blob"))
          else segs
        withPathSegments(u, projSegs).map(_.toString)
      case Some("git.php.net") =>
        if (segs.headOption.contains("repository")) Some(u.toString)
        else if (segs.isEmpty) {
          val qs = u.query.getOrElse("").split('&').flatMap { kv =>
            kv.split("=", 2) match {
              case Array(k, v) => Some(k -> v)
              case _           => None
            }
          }.toMap
          qs.get("p").flatMap(p =>
            UrlLite.parse(s"https://git.php.net/repository/?$p").map(_.toString))
        } else None
      case Some(h) if KnownHostingSites.contains(h) => Some(u.toString)
      case Some(h) if h.startsWith("svn.")          => Some(u.toString)
      case _                                        => None
    }
  }

  /** browse_url_from_repo_url (vcs.rs:741-863), net access off. */
  def browseUrlFromRepoUrl(loc: VcsLocation): Option[UrlLite] = {
    val u = loc.url
    u.host match {
      case Some("github.com") =>
        var path = u.pathSegments.getOrElse(return None).take(3).mkString("/")
        if (path.endsWith(".git")) path = path.substring(0, path.length - 4)
        if (loc.subpath.isDefined || loc.branch.isDefined)
          path += s"/tree/${loc.branch.getOrElse("HEAD")}"
        loc.subpath.foreach(sp => path += s"/$sp")
        UrlLite.parse("https://github.com").flatMap(_.join(path))
      case Some("gopkg.in") =>
        val els = u.pathSegments.getOrElse(return None).take(3).toArray
        if (els.length != 2) return None
        // NOTE: reference indexes els[2] after checking len()==2 — the gopkg
        // branch can never fire without panicking on a 2-element path; treat
        // as unreachable and return None (matches observable behavior).
        None
      case Some("code.launchpad.net") | Some("launchpad.net") =>
        loc.subpath match {
          case Some(sp) =>
            UrlLite.parse(s"https://bazaar.launchpad.net${u.path}/view/head:$sp")
          case None =>
            UrlLite.parse(s"https://code.launchpad.net${u.path}")
        }
      case Some("svn.apache.org") =>
        val segs = u.pathSegments.getOrElse(Vector.empty)
        if (segs.length >= 2 && segs(0) == "repos" && segs(1) == "asf") {
          var els = segs.drop(1).toVector
          els = els.updated(0, "viewvc")
          loc.subpath.foreach(sp => els = els :+ sp)
          UrlLite.parse(s"https://svn.apache.org${els.mkString("/")}")
        } else None
      case Some(h) if h == "git.savannah.gnu.org" || h == "git.sv.gnu.org" =>
        var els = u.pathSegments.getOrElse(return None).toVector
        if (u.scheme == "https" && els.headOption.contains("git")) els = els.tail
        els = "cgit" +: els
        loc.subpath.foreach { sp => els = els :+ "tree" :+ sp }
        UrlLite.parse(s"https://git.savannah.gnu.org${els.mkString("/")}")
      case Some(h) if isGitlabSite(h) =>
        var path = u.path
        if (path.endsWith(".git")) path = path.substring(0, path.length - 4)
        loc.subpath.foreach(sp => path += s"/-/blob/HEAD/$sp")
        UrlLite.parse(s"https://$h$path")
      case _ => None
    }
  }

  /** sanitize_url (vcs.rs:1349-1379): the ordered sanitizer chain. */
  def sanitizeUrl(url0: String): String = {
    var url = url0

    // 1. drop VCS-in-scheme prefixes
    UrlLite.parse(url).flatMap(dropVcsInScheme).foreach(u => url = u.toString)
    // 2. split/fixup git location; keep only the URL
    locationFromStr(url).map(fixupGitLocation).foreach(l => url = l.url.toString)
    // 3. rcp-style → ssh URL
    fixupRcpStyleGitRepoUrl(url).foreach(u => url = u.toString)
    // 4. public URL
    findPublicRepoUrl(url).foreach(s => url = s)
    // 5. canonical .git suffix
    UrlLite.parse(url).flatMap(canonicalGitRepoUrl).foreach(u => url = u.toString)
    // 6. secure scheme
    UrlLite.parse(url).flatMap(findSecureRepoUrl).foreach(u => url = u.toString)

    url
  }
}
