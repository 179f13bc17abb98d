package graft.urls

/** Minimal WHATWG-style URL value, covering exactly the behaviors of the
  * `url` crate that the reference's URL algebra depends on
  * (/root/reference/src/vcs.rs, src/lib.rs:1728-1746):
  *
  *   - special schemes (http/https/ws/wss/ftp/file) get a host and a
  *     never-empty path; default ports are dropped; `to_string` of
  *     "https://github.com" is "https://github.com/".
  *   - non-special schemes with "//" keep an authority (git+ssh://...).
  *   - "lp:project" style URLs are opaque (cannot-be-a-base): host None,
  *     path = "project".
  *   - strings without a scheme fail to parse (RelativeUrlWithoutBase).
  *
  * Immutable; mutators return copies. toString round-trips the canonical
  * serialization the reference emits into its YAML output.
  */
final case class UrlLite(
    scheme: String,
    username: String,
    host: Option[String],
    port: Option[Int],
    path: String,
    query: Option[String],
    fragment: Option[String],
    cannotBeBase: Boolean
) {
  import UrlLite._

  def isSpecial: Boolean = specialSchemes.contains(scheme)

  def pathSegments: Option[Vector[String]] =
    if (cannotBeBase) None
    else Some {
      val p = if (path.startsWith("/")) path.substring(1) else path
      // split preserving trailing empty segment ("/a/" -> ["a", ""])
      p.split("/", -1).toVector
    }

  def withPathSegments(segments: Seq[String]): UrlLite =
    copy(path = "/" + segments.mkString("/"))

  def setPath(p: String): UrlLite = {
    val p2 = if (p.startsWith("/")) p else "/" + p
    copy(path = if (host.isDefined || isSpecial) p2 else p)
  }

  def setHost(h: String): UrlLite = copy(host = Some(h))

  def setUsername(u: String): UrlLite = copy(username = u)

  /** `derive_with_scheme` (src/vcs.rs:1092-1096): textual scheme replacement
    * followed by a re-parse, reproducing WHATWG re-interpretation (e.g.
    * "lp:x" -> "https:x" parses to host "x").
    */
  def deriveWithScheme(newScheme: String): Option[UrlLite] =
    UrlLite.parse(newScheme + toString.substring(scheme.length))

  /** WHATWG join with a relative reference (subset: schemeless inputs). */
  def join(input: String): Option[UrlLite] = {
    if (input.isEmpty) return Some(this)
    if (SchemeRe.matcher(input).find()) return UrlLite.parse(input)
    if (cannotBeBase) return None
    if (input.startsWith("//")) return UrlLite.parse(scheme + ":" + input)
    val (pq, frag) = splitOnce(input, '#')
    val (pathPart, q) = splitOnce(pq, '?')
    val newPath =
      if (pathPart.isEmpty) path
      else if (pathPart.startsWith("/")) pathPart
      else {
        val base = path.substring(0, path.lastIndexOf('/') + 1)
        base + pathPart
      }
    Some(copy(
      path = normalizeDots(newPath),
      query = q,
      fragment = frag
    ))
  }

  override def toString: String = {
    val sb = new StringBuilder(scheme).append(':')
    host match {
      case Some(h) =>
        sb.append("//")
        if (username.nonEmpty) sb.append(username).append('@')
        sb.append(h)
        port.foreach(p => sb.append(':').append(p))
      case None =>
        if (!cannotBeBase && path.startsWith("/")) () // path-absolute, no //
    }
    sb.append(path)
    query.foreach(q => sb.append('?').append(q))
    fragment.foreach(f => sb.append('#').append(f))
    sb.toString
  }
}

object UrlLite {
  private[urls] val specialSchemes: Map[String, Option[Int]] = Map(
    "http" -> Some(80),
    "https" -> Some(443),
    "ws" -> Some(80),
    "wss" -> Some(443),
    "ftp" -> Some(21),
    "file" -> None
  )

  private val SchemeRe =
    java.util.regex.Pattern.compile("^[a-zA-Z][a-zA-Z0-9+.\\-]*:")

  private def splitOnce(s: String, c: Char): (String, Option[String]) = {
    val i = s.indexOf(c)
    if (i < 0) (s, None) else (s.substring(0, i), Some(s.substring(i + 1)))
  }

  private[urls] def normalizeDots(path: String): String = {
    if (!path.contains("/.")) return path
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = path.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "." => if (i == segs.length - 1) out.append("")
        case ".." =>
          if (out.nonEmpty && out.last.nonEmpty) out.remove(out.length - 1)
          if (i == segs.length - 1) out.append("")
        case s => out.append(s)
      }
      i += 1
    }
    val joined = out.mkString("/")
    if (path.startsWith("/") && !joined.startsWith("/")) "/" + joined else joined
  }

  private def isPathEscape(c: Char): Boolean = c match {
    case ' ' | '"' | '<' | '>' | '`' | '{' | '}' => true
    case _ => false
  }

  private def encodePath(p: String): String = {
    var i = 0
    var needs = false
    while (i < p.length && !needs) { if (isPathEscape(p.charAt(i))) needs = true; i += 1 }
    if (!needs) p
    else p.flatMap(c => if (isPathEscape(c)) f"%%${c.toInt}%02X" else c.toString)
  }

  private def isForbiddenHostChar(c: Char): Boolean = c match {
    case ' ' | '#' | '/' | ':' | '?' | '@' | '[' | ']' | '\\' | '<' | '>' | '^' | '|' | '"' | '%' => true
    case _ => false
  }

  /** Parse; None corresponds to a Rust `Url::parse` Err. */
  def parse(input0: String): Option[UrlLite] = {
    // WHATWG: strip leading/trailing C0+space, remove tabs and newlines.
    var input = input0.dropWhile(_ <= ' ').reverse.dropWhile(_ <= ' ').reverse
    if (input.exists(c => c == '\t' || c == '\n' || c == '\r'))
      input = input.filterNot(c => c == '\t' || c == '\n' || c == '\r')

    val m = SchemeRe.matcher(input)
    if (!m.find()) return None // RelativeUrlWithoutBase
    val scheme = input.substring(0, m.end() - 1).toLowerCase
    var rest = input.substring(m.end())
    val special = specialSchemes.contains(scheme)

    if (rest.startsWith("//") || (special && rest.startsWith("/"))) {
      // authority follows (special schemes tolerate any number of slashes)
      rest = rest.dropWhile(_ == '/')
      parseWithAuthority(scheme, rest, special)
    } else if (special) {
      // "https:foo/bar" == "https://foo/bar"
      parseWithAuthority(scheme, rest, special)
    } else if (rest.startsWith("/")) {
      // path-absolute, no host
      val (pq, frag) = splitOnce(rest, '#')
      val (p, q) = splitOnce(pq, '?')
      Some(UrlLite(scheme, "", None, None, encodePath(p), q, frag, cannotBeBase = false))
    } else {
      // opaque (cannot-be-a-base): lp:project, mailto:addr, github:user/repo
      val (pq, frag) = splitOnce(rest, '#')
      val (p, q) = splitOnce(pq, '?')
      Some(UrlLite(scheme, "", None, None, p, q, frag, cannotBeBase = true))
    }
  }

  private def parseWithAuthority(
      scheme: String,
      rest0: String,
      special: Boolean
  ): Option[UrlLite] = {
    var rest = rest0
    if (special && rest.contains('\\')) rest = rest.replace('\\', '/')
    val authEnd = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val (auth, tail) =
      if (authEnd < 0) (rest, "") else (rest.substring(0, authEnd), rest.substring(authEnd))

    val atIdx = auth.lastIndexOf('@')
    val (userinfo, hostport) =
      if (atIdx < 0) ("", auth) else (auth.substring(0, atIdx), auth.substring(atIdx + 1))
    val username = splitOnce(userinfo, ':')._1

    val (hostRaw, portStr) =
      if (hostport.startsWith("[")) {
        val close = hostport.indexOf(']')
        if (close < 0) return None
        val h = hostport.substring(0, close + 1)
        val after = hostport.substring(close + 1)
        if (after.startsWith(":")) (h, Some(after.substring(1)))
        else if (after.isEmpty) (h, None)
        else return None
      } else {
        val (h, p) = splitOnce(hostport, ':')
        (h, p)
      }

    if (hostRaw.isEmpty && special) return None
    val host = hostRaw.toLowerCase
    if (!host.startsWith("[") && host.exists(isForbiddenHostChar)) return None

    val port: Option[Int] = portStr match {
      case None => None
      case Some("") => None
      case Some(p) =>
        if (!p.forall(_.isDigit) || p.length > 5) return None
        val v = p.toInt
        if (v > 65535) return None
        if (special && specialSchemes(scheme).contains(v)) None else Some(v)
    }

    val (pq, frag) = splitOnce(tail, '#')
    val (p0, q) = splitOnce(pq, '?')
    val p1 = if (p0.isEmpty && (special || host.nonEmpty)) {
      if (special) "/" else ""
    } else p0
    val path = encodePath(normalizeDots(p1))

    Some(UrlLite(
      scheme, username,
      if (host.isEmpty) None else Some(host),
      port, path, q, frag,
      cannotBeBase = false
    ))
  }

  /** `with_path_segments` (src/lib.rs:1728-1735). */
  def withPathSegments(u: UrlLite, segments: Seq[String]): Option[UrlLite] =
    if (u.cannotBeBase) None else Some(u.withPathSegments(segments))

  /** `to_https_url` (src/lib.rs:1742-1746): rebuild from host/port/path,
    * dropping userinfo, query and fragment.
    */
  def toHttpsUrl(u: UrlLite): Option[UrlLite] = {
    val h = u.host.getOrElse(return None)
    val port = u.port.map(p => s":$p").getOrElse("")
    parse(s"https://$h$port${u.path}")
  }
}
