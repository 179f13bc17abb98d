package graft.extract

/** reStructuredText → HTML, reproducing the rust-rst (rst_parser +
  * rst_renderer) subset behavior the reference observes
  * (/root/reference/src/readme.rs:1085-1094), as calibrated against the
  * reference's readme fixtures:
  *
  *   - paragraph source lines are joined with a single space, lines kept raw
  *     (cbor2: 2-space-indented lines keep their indent in the text);
  *   - image directives silently consume their :target:/:alt: option block
  *     (indented ≥3), but ERROR on other options (the reference's
  *     `.. image:: foo.png\n   :align: center` must fail,
  *     src/readme.rs:1116-1119);
  *   - a 2-space-indented block after a directive is NOT an option block; it
  *     renders as a paragraph of raw joined lines (cbor2);
  *   - substitution definitions (.. |x| ...) are consumed silently and |x|
  *     references render as empty text (django-ical);
  *   - trailing `_` reference markers are stripped from words (aiozipkin).
  */
object Rst {

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val adornmentChars = "=-`:'\"~^_*+#<>.".toSet

  private def isAdornment(l: String): Boolean =
    l.length >= 2 && l.forall(_ == l.head) && adornmentChars.contains(l.head)

  private def slug(title: String): String =
    title.toLowerCase.replaceAll("[^a-z0-9]+", "-").replaceAll("^-+|-+$", "")

  private def indentOf(l: String): Int = l.takeWhile(_ == ' ').length

  private val imageOptionAllowed = Set("target", "alt")

  def toHtml(text: String): Either[String, String] = {
    val out = new StringBuilder
    var lines = text.split("\n", -1).toList
    var openSections = 0
    val levels = scala.collection.mutable.LinkedHashMap.empty[Char, Int]

    def closeSections(to: Int): Unit = {
      while (openSections > to) {
        out.append("</section>\n")
        openSections -= 1
      }
    }

    def emitQuotedBlock(): Unit = {
      // lines indented 1-2 after a directive → paragraph of raw joined lines
      val block = scala.collection.mutable.ArrayBuffer.empty[String]
      while (lines.nonEmpty && lines.head.trim.nonEmpty &&
             indentOf(lines.head) >= 1 && indentOf(lines.head) <= 2 &&
             !lines.head.trim.startsWith(".. ")) {
        block.append(lines.head)
        lines = lines.tail
      }
      if (block.nonEmpty)
        out.append(s"<p>${inline(block.mkString(" "))}</p>\n")
    }

    try {
      while (lines.nonEmpty) {
        val line = lines.head
        if (line.trim.isEmpty) { lines = lines.tail }
        else if (line.startsWith(".. ") || line == "..") {
          val body = line.stripPrefix("..").trim
          val DirectiveRe = java.util.regex.Pattern.compile("^([A-Za-z][A-Za-z0-9_-]*)::\\s*(.*)$")
          val SubstRe = java.util.regex.Pattern.compile("^\\|([^|]+)\\|\\s+(.*)$")
          val dm = DirectiveRe.matcher(body)
          val sm = SubstRe.matcher(body)
          if (sm.matches()) {
            // substitution definition: consume directive + option block silently
            lines = lines.tail
            while (lines.nonEmpty && (lines.head.trim.isEmpty && lines.tail.headOption.exists(l =>
                     indentOf(l) >= 3 && l.trim.nonEmpty) || indentOf(lines.head) >= 3 && lines.head.trim.nonEmpty))
              lines = lines.tail
          } else if (dm.matches()) {
            val dname = dm.group(1)
            lines = lines.tail
            // option block: indented >=3, lines starting with ':'
            val options = scala.collection.mutable.ArrayBuffer.empty[String]
            val content = scala.collection.mutable.ArrayBuffer.empty[String]
            var consuming = true
            while (consuming && lines.nonEmpty) {
              val l = lines.head
              if (l.trim.isEmpty) {
                // blank: directive content may continue if next is indented >=3
                if (lines.tail.headOption.exists(x => x.trim.nonEmpty && indentOf(x) >= 3)) {
                  content.append("")
                  lines = lines.tail
                } else consuming = false
              } else if (indentOf(l) >= 3) {
                val t = l.trim
                if (t.startsWith(":") && content.isEmpty) {
                  val OptRe = java.util.regex.Pattern.compile("^:([^:]+):.*$")
                  val om = OptRe.matcher(t)
                  if (om.matches()) options.append(om.group(1))
                }
                else content.append(t)
                lines = lines.tail
              } else consuming = false
            }
            dname match {
              case "image" =>
                if (!options.forall(imageOptionAllowed.contains))
                  return Left(s"RST parse error: image option not supported: ${options.mkString(",")}")
              // image renders no text
              case "code" | "code-block" | "sourcecode" =>
                out.append("<pre><code>")
                out.append(escape(content.mkString("\n")))
                out.append("\n</code></pre>\n")
              case "contents" | "toctree" | "include" =>
                return Left(s"RST parse error: unsupported directive $dname")
              case "note" | "warning" | "tip" | "important" =>
                // admonition: content becomes a paragraph
                if (content.nonEmpty)
                  out.append(s"<p>${inline(content.filter(_.nonEmpty).mkString(" "))}</p>\n")
              case _ =>
                return Left(s"RST parse error: unknown directive $dname")
            }
            // a 1-2-space-indented block following the directive is a quoted
            // block, not directive content
            if (lines.nonEmpty && lines.head.trim.nonEmpty &&
                indentOf(lines.head) >= 1 && indentOf(lines.head) <= 2)
              emitQuotedBlock()
          } else if (body.startsWith("_")) {
            lines = lines.tail // hyperlink target
          } else {
            // comment: skip line + indented continuation
            lines = lines.tail
            while (lines.nonEmpty && lines.head.trim.nonEmpty && indentOf(lines.head) >= 1)
              lines = lines.tail
          }
        } else if (lines.tail.headOption.exists(u => isAdornment(u.trim) && u.trim.length >= 2 &&
                   line.trim.nonEmpty && !isAdornment(line.trim) && indentOf(line) == 0 &&
                   u.trim.length >= line.trim.length)) {
          val title = line.trim
          val style = lines.tail.head.trim.head
          val level = levels.getOrElseUpdate(style, levels.size + 1)
          closeSections(level - 1)
          out.append(s"""<section id="${slug(title)}">\n""")
          openSections += 1
          out.append(s"<h$level>${inline(title)}</h$level>\n")
          lines = lines.tail.tail
        } else if (isAdornment(line.trim) && line.trim.length >= 2 &&
                   lines.tail.headOption.exists(t => t.trim.nonEmpty && !isAdornment(t.trim)) &&
                   lines.tail.tail.headOption.exists(l => isAdornment(l.trim) &&
                     l.trim.headOption == line.trim.headOption)) {
          // over+underlined title
          val title = lines.tail.head.trim
          val style = line.trim.head
          val level = levels.getOrElseUpdate(style, levels.size + 1)
          closeSections(level - 1)
          out.append(s"""<section id="${slug(title)}">\n""")
          openSections += 1
          out.append(s"<h$level>${inline(title)}</h$level>\n")
          lines = lines.tail.tail.tail
        } else if (line.trim.matches("^[-*+] .*") && indentOf(line) == 0) {
          // bullet list
          val items = scala.collection.mutable.ArrayBuffer.empty[List[String]]
          var cur = List.newBuilder[String]
          var started = false
          var blankPending = false
          var loose = false
          var inList = true
          while (lines.nonEmpty && inList) {
            val l = lines.head
            if (l.trim.matches("^[-*+] .*") && indentOf(l) == 0) {
              if (started) items.append(cur.result())
              cur = List.newBuilder
              cur += l.trim.substring(2)
              started = true
              if (blankPending && items.nonEmpty) loose = true
              blankPending = false
              lines = lines.tail
            } else if (l.trim.isEmpty) {
              blankPending = true
              lines = lines.tail
              if (!lines.headOption.exists(x =>
                    (x.trim.matches("^[-*+] .*") && indentOf(x) == 0) || indentOf(x) >= 2))
                inList = false
            } else if (indentOf(l) >= 2) {
              if (blankPending) { loose = true; cur += "" }
              blankPending = false
              cur += l.trim
              lines = lines.tail
            } else inList = false
          }
          if (started) items.append(cur.result())
          out.append("<ul>\n")
          for (item <- items) {
            if (loose) {
              out.append("<li>")
              val paras = scala.collection.mutable.ArrayBuffer.empty[List[String]]
              var p = List.newBuilder[String]; var ne = false
              for (l <- item) {
                if (l.isEmpty) { if (ne) { paras.append(p.result()); p = List.newBuilder; ne = false } }
                else { p += l; ne = true }
              }
              if (ne) paras.append(p.result())
              for (para <- paras) out.append(s"<p>${inline(para.mkString(" "))}</p>")
              out.append("</li>\n")
            } else {
              out.append(s"<li>${inline(item.mkString(" "))}</li>\n")
            }
          }
          out.append("</ul>\n")
        } else {
          // paragraph; may end with "::" opening a literal block
          val para = List.newBuilder[String]
          var done = false
          var count = 0
          while (lines.nonEmpty && !done) {
            val l = lines.head
            if (l.trim.isEmpty) done = true
            else if (count > 0 && isAdornment(l.trim) && l.trim.length >= 2) {
              // underline directly after one para line: it's a section; undo
              done = true
            } else if (count > 0 && lines.tail.headOption.exists(u =>
                         isAdornment(u.trim) && u.trim.length >= l.trim.length && !isAdornment(l.trim))) {
              // next line is a section title; stop paragraph here
              done = true
            } else {
              para += l
              count += 1
              lines = lines.tail
            }
          }
          var paraLines = para.result()
          var paraText = paraLines.mkString(" ")
          var literalFollows = false
          if (paraText.endsWith("::")) {
            literalFollows = true
            paraText = paraText.dropRight(2)
            if (paraText.endsWith(" ")) paraText = paraText.stripSuffix(" ")
            else if (paraText.nonEmpty) paraText += ":"
          }
          if (paraText.trim.nonEmpty)
            out.append(s"<p>${inline(paraText)}</p>\n")
          if (literalFollows) {
            while (lines.nonEmpty && lines.head.trim.isEmpty) lines = lines.tail
            val lit = scala.collection.mutable.ArrayBuffer.empty[String]
            var more = true
            while (lines.nonEmpty && more) {
              val l = lines.head
              if (l.trim.isEmpty) {
                // blank line inside block only if more indented content follows
                if (lines.tail.headOption.exists(x =>
                      x.trim.nonEmpty && (indentOf(x) >= 1 || x.startsWith("\t")))) {
                  lit.append(l)
                  lines = lines.tail
                } else more = false
              } else if (indentOf(l) >= 1 || l.startsWith("\t")) {
                lit.append(l)
                lines = lines.tail
              } else more = false
            }
            var l2 = lit.toList
            while (l2.nonEmpty && l2.last.trim.isEmpty) l2 = l2.init
            if (l2.nonEmpty) {
              val indent = l2.filter(_.trim.nonEmpty).map(indentOf).min
              out.append("<pre><code>")
              out.append(escape(l2.map(l => if (l.length >= indent) l.substring(indent) else l)
                .mkString("\n")))
              out.append("\n</code></pre>\n")
            }
          }
        }
      }
      closeSections(0)
      Right(out.toString)
    } catch {
      case e: Exception => Left(s"RST parse error: ${e.getMessage}")
    }
  }

  /** Inline rst. */
  def inline(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '`' && i + 1 < s.length && s.charAt(i + 1) == '`') {
        val end = s.indexOf("``", i + 2)
        if (end > 0) {
          sb.append(s"<code>${escape(s.substring(i + 2, end))}</code>")
          i = end + 2
        } else { sb.append("`"); i += 1 }
      } else if (c == ':') {
        val m = java.util.regex.Pattern
          .compile("^:([A-Za-z][A-Za-z0-9_+:.-]*):`([^`]*)`").matcher(s.substring(i))
        if (m.lookingAt()) {
          sb.append(escape(":" + m.group(1) + ":"))
          sb.append(s"<code>${escape(m.group(2))}</code>")
          i += m.end()
        } else { sb.append(':'); i += 1 }
      } else if (c == '`') {
        val end = s.indexOf('`', i + 1)
        if (end > 0) {
          val innerRaw = s.substring(i + 1, end)
          val trailing = if (end + 1 < s.length) s.charAt(end + 1) else ' '
          val LinkRe = java.util.regex.Pattern.compile("^(.*?)\\s*<([^<>]+)>$",
            java.util.regex.Pattern.DOTALL)
          val lm = LinkRe.matcher(innerRaw)
          if (trailing == '_' && lm.matches()) {
            sb.append(s"""<a href="${escape(lm.group(2))}">${escape(lm.group(1))}</a>""")
            i = end + 2
          } else if (trailing == '_') {
            // named reference `text`_ → link text only
            sb.append(s"<cite>${escape(innerRaw)}</cite>")
            i = end + 2
          } else {
            sb.append(s"<cite>${escape(innerRaw)}</cite>")
            i = end + 1
          }
        } else { sb.append('`'); i += 1 }
      } else if (c == '*' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        val end = s.indexOf("**", i + 2)
        if (end > 0) {
          sb.append(s"<strong>${escape(s.substring(i + 2, end))}</strong>")
          i = end + 2
        } else { sb.append('*'); i += 1 }
      } else if (c == '*') {
        val end = s.indexOf('*', i + 1)
        if (end > 0) {
          sb.append(s"<em>${escape(s.substring(i + 1, end))}</em>")
          i = end + 1
        } else { sb.append('*'); i += 1 }
      } else if (c == '|') {
        // substitution reference: renders as nothing (image substitution)
        val end = s.indexOf('|', i + 1)
        if (end > 0 && end - i <= 40 && !s.substring(i + 1, end).contains(' ')) {
          i = end + 1
          if (i < s.length && s.charAt(i) == '_') i += 1
        } else { sb.append('|'); i += 1 }
      } else if (c == '_' &&
                 i > 0 && (s.charAt(i - 1).isLetterOrDigit) &&
                 (i + 1 >= s.length || !s.charAt(i + 1).isLetterOrDigit && s.charAt(i + 1) != '_')) {
        // trailing reference marker on a word: dropped
        i += 1
      } else {
        sb.append(escape(c.toString))
        i += 1
      }
    }
    sb.toString
  }
}
