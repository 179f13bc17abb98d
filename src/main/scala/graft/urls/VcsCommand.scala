package graft.urls

/** Extracting repository URLs from shell command lines like
  * `git clone <url>` / `fossil clone <url>` / `svn co <url>`.
  * Port of /root/reference/src/vcs_command.rs (cvs needs breezy's cvsroot
  * conversion and is out of scope offline).
  */
object VcsCommand {

  /** POSIX-ish shlex split (shlex crate semantics, subset). Returns None on
    * unterminated quotes/escapes.
    */
  def shlexSplit(s: String): Option[List[String]] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var inWord = false
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      c match {
        case ' ' | '\t' | '\n' =>
          if (inWord) { out += cur.toString; cur.clear(); inWord = false }
          i += 1
        case '\'' =>
          inWord = true
          i += 1
          val close = s.indexOf('\'', i)
          if (close < 0) return None
          cur.append(s.substring(i, close))
          i = close + 1
        case '"' =>
          inWord = true
          i += 1
          while (i < n && s.charAt(i) != '"') {
            if (s.charAt(i) == '\\' && i + 1 < n &&
                (s.charAt(i + 1) == '"' || s.charAt(i + 1) == '\\' || s.charAt(i + 1) == '$' || s.charAt(i + 1) == '`')) {
              cur.append(s.charAt(i + 1)); i += 2
            } else { cur.append(s.charAt(i)); i += 1 }
          }
          if (i >= n) return None
          i += 1
        case '\\' =>
          if (i + 1 >= n) return None
          inWord = true
          cur.append(s.charAt(i + 1))
          i += 2
        case _ =>
          inWord = true
          cur.append(c)
          i += 1
      }
    }
    if (inWord) out += cur.toString
    Some(out.result())
  }

  private def parseCommand(command: String): Option[List[String]] = {
    if (command.endsWith("\\")) return None
    shlexSplit(command).map(_.filter(_.trim.nonEmpty)).filter(_.nonEmpty)
  }

  /** url_from_git_clone_command (vcs_command.rs:57-89) */
  def urlFromGitCloneCommand(command: String): Option[String] =
    urlFromCloneCommand(command, "git", stripParamArgs = true)

  /** url_from_fossil_clone_command (vcs_command.rs:118-144) */
  def urlFromFossilCloneCommand(command: String): Option[String] =
    urlFromCloneCommand(command, "fossil", stripParamArgs = false)

  private def urlFromCloneCommand(
      command: String,
      tool: String,
      stripParamArgs: Boolean
  ): Option[String] = {
    val args0 = parseCommand(command).getOrElse(return None)
    if (args0.length < 2 || args0.head != tool || args0(1) != "clone") return None
    val args = scala.collection.mutable.ArrayBuffer.from(args0.drop(2))
    var i = 0
    while (i < args.length) {
      if (!args(i).startsWith("-")) {
        i += 1
      } else if (args(i).contains('=')) {
        args.remove(i)
      } else if (stripParamArgs &&
                 (args(i) == "-b" || args(i) == "--depth" || args(i) == "--branch")) {
        args.remove(i)
        if (i < args.length) args.remove(i)
      } else {
        args.remove(i)
      }
    }
    val url =
      if (args.length > 2) args(2)
      else args.headOption.getOrElse("")
    if (Vcs.plausibleUrl(url)) Some(url) else None
  }

  /** url_from_svn_co_command (vcs_command.rs:198-209) */
  def urlFromSvnCoCommand(command: String): Option[String] = {
    val args = parseCommand(command).getOrElse(return None)
    if (args.length < 2 || args(0) != "svn" || args(1) != "co") return None
    val schemes = List("svn+ssh", "http", "https", "svn")
    args.find(a => schemes.exists(s => a.startsWith(s + "://")))
  }

  /** url_from_vcs_command (vcs_command.rs:38-53), cvs excluded offline. */
  def urlFromVcsCommand(command: String): Option[String] =
    urlFromGitCloneCommand(command)
      .orElse(urlFromFossilCloneCommand(command))
      .orElse(urlFromSvnCoCommand(command))
}
