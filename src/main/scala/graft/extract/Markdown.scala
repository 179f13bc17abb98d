package graft.extract

/** Markdown → HTML converter reproducing the pulldown-cmark output shapes the
  * README walk observes (paragraph/list/heading/code structure, text nodes
  * including soft line breaks and the "\n" text nodes around block elements).
  * Only the constructs exercised by the reference's fixtures are needed;
  * unknown constructs degrade to paragraphs.
  */
object Markdown {

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def escapeAttr(s: String): String =
    escape(s).replace("\"", "&quot;")

  def toHtml(text: String): String = {
    val out = new StringBuilder
    val defRe = java.util.regex.Pattern.compile(
      "^ {0,3}\\[([^\\]]+)\\]:\\s*(\\S+)\\s*(?:\"[^\"]*\")?\\s*$")
    val defs = scala.collection.mutable.Map.empty[String, String]
    val kept = List.newBuilder[String]
    for (l <- text.split("\n", -1)) {
      val m = defRe.matcher(l)
      if (m.matches()) defs(m.group(1).toLowerCase) = m.group(2)
      else kept += l
    }
    linkDefs.set(defs.toMap)
    try renderBlocks(kept.result(), out, topLevel = true)
    finally linkDefs.remove()
    out.toString
  }

  private val linkDefs = new ThreadLocal[Map[String, String]] {
    override def initialValue(): Map[String, String] = Map.empty
  }

  private val BulletRe = java.util.regex.Pattern.compile("^( {0,3})([-*+])( +)(.*)$")
  private val OrderedRe = java.util.regex.Pattern.compile("^( {0,3})(\\d{1,9})([.)])( +)(.*)$")
  private val AtxRe = java.util.regex.Pattern.compile("^( {0,3})(#{1,6})(?: +(.*?))?(?: +#+ *)?$")
  private val FenceRe = java.util.regex.Pattern.compile("^( {0,3})(```+|~~~+)\\s*(\\S*)\\s*$")
  private val SetextRe = java.util.regex.Pattern.compile("^( {0,3})(=+|-+)\\s*$")
  private val HrRe = java.util.regex.Pattern.compile("^ {0,3}((\\* *){3,}|(- *){3,}|(_ *){3,})$")

  private def isBlank(l: String): Boolean = l.trim.isEmpty

  private def renderBlocks(lines0: List[String], out: StringBuilder, topLevel: Boolean): Unit = {
    var lines = lines0
    while (lines.nonEmpty) {
      val line = lines.head
      if (isBlank(line)) {
        lines = lines.tail
      } else {
        val atx = AtxRe.matcher(line)
        val fence = FenceRe.matcher(line)
        val bullet = BulletRe.matcher(line)
        val ordered = OrderedRe.matcher(line)
        if (atx.matches()) {
          val level = atx.group(2).length
          val content = Option(atx.group(3)).getOrElse("")
          out.append(s"<h$level>${inline(content.trim)}</h$level>\n")
          lines = lines.tail
        } else if (fence.matches()) {
          val marker = fence.group(2)
          val lang = fence.group(3)
          lines = lines.tail
          val code = new StringBuilder
          while (lines.nonEmpty && !lines.head.trim.startsWith(marker.take(3))) {
            code.append(lines.head).append("\n")
            lines = lines.tail
          }
          if (lines.nonEmpty) lines = lines.tail
          val cls = if (lang.nonEmpty) s""" class="language-$lang"""" else ""
          out.append(s"<pre><code$cls>${escape(code.toString)}</code></pre>\n")
        } else if (HrRe.matcher(line).matches() && !bullet.matches()) {
          out.append("<hr />\n")
          lines = lines.tail
        } else if (line.startsWith("    ") && line.trim.nonEmpty) {
          // indented code block
          val code = new StringBuilder
          var cont = true
          while (lines.nonEmpty && cont) {
            if (lines.head.startsWith("    ")) {
              code.append(lines.head.substring(4)).append("\n")
              lines = lines.tail
            } else if (isBlank(lines.head) &&
                       lines.tail.headOption.exists(_.startsWith("    "))) {
              code.append("\n")
              lines = lines.tail
            } else cont = false
          }
          out.append(s"<pre><code>${escape(code.toString)}</code></pre>\n")
        } else if (bullet.matches() || ordered.matches()) {
          lines = renderList(lines, out)
        } else if (line.trim.startsWith(">")) {
          val quoted = List.newBuilder[String]
          while (lines.nonEmpty && lines.head.trim.startsWith(">")) {
            quoted += lines.head.trim.stripPrefix(">").stripPrefix(" ")
            lines = lines.tail
          }
          out.append("<blockquote>\n")
          renderBlocks(quoted.result(), out, topLevel = false)
          out.append("</blockquote>\n")
        } else if (line.trim.startsWith("<") &&
                   java.util.regex.Pattern.matches("^ {0,3}</?[a-zA-Z][^>]*>.*", line)) {
          // raw HTML block: pass through until blank line
          while (lines.nonEmpty && !isBlank(lines.head)) {
            out.append(lines.head).append("\n")
            lines = lines.tail
          }
        } else {
          // paragraph, watching for setext underline
          val para = List.newBuilder[String]
          var done = false
          para += line.trim
          lines = lines.tail
          while (lines.nonEmpty && !done) {
            val l = lines.head
            val setext = SetextRe.matcher(l)
            if (isBlank(l)) done = true
            else if (setext.matches()) {
              val level = if (setext.group(2).startsWith("=")) 1 else 2
              val content = para.result().mkString("\n")
              out.append(s"<h$level>${inline(content)}</h$level>\n")
              lines = lines.tail
              para.clear()
              done = true
            } else if (AtxRe.matcher(l).matches() || FenceRe.matcher(l).matches() ||
                       BulletRe.matcher(l).matches() || OrderedRe.matcher(l).matches()) {
              done = true
            } else {
              para += l.trim
              lines = lines.tail
            }
          }
          val remaining = para.result()
          if (remaining.nonEmpty)
            out.append(s"<p>${remaining.map(inline).mkString("\n")}</p>\n")
        }
      }
    }
  }

  /** Renders a (possibly loose) list; returns remaining lines. */
  private def renderList(lines0: List[String], out: StringBuilder): List[String] = {
    var lines = lines0
    // gather items: each item = marker line + continuation lines (indented)
    val items = scala.collection.mutable.ArrayBuffer.empty[List[String]]
    var loose = false
    var pendingBlank = false
    var inList = true
    var cur: List[String] = Nil

    def flushItem(): Unit = if (cur.nonEmpty) { items.append(cur.reverse); cur = Nil }

    while (lines.nonEmpty && inList) {
      val line = lines.head
      val bullet = BulletRe.matcher(line)
      val ordered = OrderedRe.matcher(line)
      if (bullet.matches()) {
        flushItem()
        if (pendingBlank && items.nonEmpty) loose = true
        pendingBlank = false
        cur = List(bullet.group(4))
        lines = lines.tail
      } else if (ordered.matches()) {
        flushItem()
        if (pendingBlank && items.nonEmpty) loose = true
        pendingBlank = false
        cur = List(ordered.group(5))
        lines = lines.tail
      } else if (isBlank(line)) {
        pendingBlank = true
        lines = lines.tail
        // blank then non-indented non-bullet → list ends
        lines.headOption match {
          case Some(next)
              if !isBlank(next) && !next.startsWith("  ") &&
                !BulletRe.matcher(next).matches() && !OrderedRe.matcher(next).matches() =>
            inList = false
          case None => inList = false
          case _    => ()
        }
      } else if (line.startsWith("  ")) {
        if (pendingBlank) { loose = true; cur = "" :: cur }
        pendingBlank = false
        cur = line.trim :: cur
        lines = lines.tail
      } else {
        // lazy continuation of the item paragraph
        if (pendingBlank) inList = false
        else {
          cur = line.trim :: cur
          lines = lines.tail
        }
      }
    }
    flushItem()

    out.append("<ul>\n")
    for (item <- items) {
      if (loose) {
        out.append("<li>\n")
        // item content: paragraphs split on blank lines
        val paras = scala.collection.mutable.ArrayBuffer.empty[List[String]]
        var p = List.newBuilder[String]; var nonEmpty = false
        for (l <- item) {
          if (l.isEmpty) { if (nonEmpty) { paras.append(p.result()); p = List.newBuilder; nonEmpty = false } }
          else { p += l; nonEmpty = true }
        }
        if (nonEmpty) paras.append(p.result())
        for (para <- paras)
          out.append(s"<p>${para.map(inline).mkString("\n")}</p>\n")
        out.append("</li>\n")
      } else {
        out.append(s"<li>${item.filter(_.nonEmpty).map(inline).mkString("\n")}</li>\n")
      }
    }
    out.append("</ul>\n")
    lines
  }

  // ---------- inline rendering ----------

  private val LinkRe =
    java.util.regex.Pattern.compile("\\[([^\\]]*)\\]\\(([^)\\s]*)(?:\\s+\"[^\"]*\")?\\)")
  private val ImgRe =
    java.util.regex.Pattern.compile("!\\[([^\\]]*)\\]\\(([^)\\s]*)(?:\\s+\"[^\"]*\")?\\)")
  private val AutolinkRe =
    java.util.regex.Pattern.compile("<(https?://[^>\\s]+)>")
  private val CodeRe = java.util.regex.Pattern.compile("`([^`]+)`")
  private val StrongRe =
    java.util.regex.Pattern.compile("\\*\\*([^*]+)\\*\\*")
  private val EmRe = java.util.regex.Pattern.compile("\\*([^*]+)\\*")

  def inline(s0: String): String = {
    // protect code spans first
    val sb = new StringBuilder
    var s = s0
    var i = 0
    val codeParts = scala.collection.mutable.ArrayBuffer.empty[String]
    val cm = CodeRe.matcher(s)
    var last = 0
    while (cm.find()) {
      sb.append(inlineNoCode(s.substring(last, cm.start())))
      sb.append(s"<code>${escape(cm.group(1))}</code>")
      last = cm.end()
    }
    sb.append(inlineNoCode(s.substring(last)))
    sb.toString
  }

  private def inlineNoCode(s0: String): String = {
    var s = s0
    // raw HTML inline tags pass through; escape everything else
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') {
        val auto = AutolinkRe.matcher(s.substring(i))
        val tagEnd = s.indexOf('>', i)
        if (auto.lookingAt()) {
          val url = auto.group(1)
          sb.append(s"""<a href="${escapeAttr(url)}">${escape(url)}</a>""")
          i += auto.end()
        } else if (tagEnd > i &&
                   java.util.regex.Pattern.matches("</?[a-zA-Z][a-zA-Z0-9]*(\\s[^>]*)?/?>",
                     s.substring(i, tagEnd + 1))) {
          sb.append(s.substring(i, tagEnd + 1))
          i = tagEnd + 1
        } else {
          sb.append("&lt;")
          i += 1
        }
      } else if (c == '!' && i + 1 < s.length && s.charAt(i + 1) == '[') {
        parseBracketed(s, i + 1) match {
          case Some((inner, url, next)) =>
            sb.append(s"""<img src="${escapeAttr(url)}" alt="${escapeAttr(plainText(inner))}" />""")
            i = next
          case None => sb.append('!'); i += 1
        }
      } else if (c == '[') {
        parseBracketed(s, i) match {
          case Some((inner, url, next)) =>
            sb.append(s"""<a href="${escapeAttr(url)}">${inlineBasic(inner)}</a>""")
            i = next
          case None =>
            parseReference(s, i) match {
              case Some((inner, url, next)) =>
                sb.append(s"""<a href="${escapeAttr(url)}">${inlineBasic(inner)}</a>""")
                i = next
              case None => sb.append('['); i += 1
            }
        }
      } else if (c == '*') {
        val strong = StrongRe.matcher(s.substring(i))
        val em = EmRe.matcher(s.substring(i))
        if (strong.lookingAt()) {
          sb.append(s"<strong>${inlineBasic(strong.group(1))}</strong>")
          i += strong.end()
        } else if (em.lookingAt()) {
          sb.append(s"<em>${inlineBasic(em.group(1))}</em>")
          i += em.end()
        } else { sb.append('*'); i += 1 }
      } else if (c == '&') {
        // keep existing entities, escape bare ampersands
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10 &&
            s.substring(i + 1, semi).matches("#?[a-zA-Z0-9]+")) {
          sb.append(s.substring(i, semi + 1))
          i = semi + 1
        } else { sb.append("&amp;"); i += 1 }
      } else if (c == '\\' && i + 1 < s.length && "\\`*_{}[]()#+-.!<>".contains(s.charAt(i + 1))) {
        sb.append(escape(s.charAt(i + 1).toString))
        i += 2
      } else {
        sb.append(escape(c.toString))
        i += 1
      }
    }
    sb.toString
  }

  private def inlineBasic(s: String): String = inlineNoCode(s)

  /** Parses `[...](url)` starting at the '[' at index `start`, with nesting
    * (link text may contain a full image `![alt](src)`). Returns
    * (innerText, url, indexAfter).
    */
  private def parseBracketed(s: String, start: Int): Option[(String, String, Int)] = {
    if (start >= s.length || s.charAt(start) != '[') return None
    var depth = 0
    var i = start
    var close = -1
    while (i < s.length && close < 0) {
      s.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) close = i
        case _   =>
      }
      i += 1
    }
    if (close < 0) return None
    if (close + 1 >= s.length || s.charAt(close + 1) != '(') return None
    var pdepth = 0
    var j = close + 1
    var pclose = -1
    while (j < s.length && pclose < 0) {
      s.charAt(j) match {
        case '(' => pdepth += 1
        case ')' => pdepth -= 1; if (pdepth == 0) pclose = j
        case _   =>
      }
      j += 1
    }
    if (pclose < 0) return None
    val inner = s.substring(start + 1, close)
    var url = s.substring(close + 2, pclose).trim
    // strip optional title
    val sp = url.indexOf(' ')
    if (sp > 0 && url.substring(sp).trim.startsWith("\"")) url = url.substring(0, sp)
    Some((inner, url, pclose + 1))
  }

  /** Reference-style links: [text][], [text][label], [text] — resolved
    * against collected definitions; unresolved stays literal (pulldown-cmark
    * semantics).
    */
  private def parseReference(s: String, start: Int): Option[(String, String, Int)] = {
    if (start >= s.length || s.charAt(start) != '[') return None
    val close = s.indexOf(']', start + 1)
    if (close < 0) return None
    val inner = s.substring(start + 1, close)
    if (inner.contains('[')) return None
    val defs = linkDefs.get()
    var next = close + 1
    var label = inner
    if (next < s.length && s.charAt(next) == '[') {
      val close2 = s.indexOf(']', next + 1)
      if (close2 < 0) return None
      val ref = s.substring(next + 1, close2)
      if (ref.nonEmpty) label = ref
      next = close2 + 1
    }
    defs.get(label.toLowerCase).map(url => (inner, url, next))
  }

  /** Plain text of inline markdown (for img alt attributes). */
  private def plainText(s: String): String = {
    var t = s
    val im = ImgRe.matcher(t)
    t = im.replaceAll("$1")
    val lm = LinkRe.matcher(t)
    t = lm.replaceAll("$1")
    t.replace("**", "").replace("`", "")
  }
}
