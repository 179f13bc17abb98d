package graft.extract

import graft.core._

/** Python `setup.py` static parsing: the AST-subset reader for constant
  * kwargs (mirrors /root/reference/src/providers/python.rs:790-1093, which
  * uses CPython's ast module restricted to Constant/List/Tuple/Set/Dict).
  */
object SetupPyParser {

  sealed trait PyV {
    def asString: Option[String] = this match {
      case PyStr(s) => Some(s)
      case _        => None
    }
    def asStringList: Option[List[String]] = this match {
      case PyList(items) =>
        val strs = items.map(_.asString)
        if (strs.forall(_.isDefined)) Some(strs.map(_.get)) else None
      case _ => None
    }
    def asDict: Option[List[(String, String)]] = this match {
      case PyDict(entries) => Some(entries)
      case _               => None
    }
  }
  final case class PyStr(s: String) extends PyV
  final case class PyList(items: List[PyV]) extends PyV
  final case class PyDict(entries: List[(String, String)]) extends PyV
  case object PyOpaque extends PyV

  /** Finds top-level `setup(...)`/`main(...)` calls and extracts constant
    * kwargs in source order.
    */
  def parse(code: String): Either[String, List[(String, PyV)]] = {
    try {
      val out = List.newBuilder[(String, PyV)]
      val CallRe = java.util.regex.Pattern.compile(
        "(?m)^(?:\\w+\\s*=\\s*)?(setup|main)\\s*\\(")
      val m = CallRe.matcher(code)
      while (m.find()) {
        val argsStart = m.end()
        val argsEnd = findBalanced(code, argsStart - 1)
        if (argsEnd > argsStart) {
          val args = code.substring(argsStart, argsEnd)
          for (part <- splitTopLevel(args, ',')) {
            val t = part.trim
            val eq = findTopLevelEq(t)
            if (eq > 0) {
              val key = t.substring(0, eq).trim
              if (key.matches("[A-Za-z_][A-Za-z0-9_]*")) {
                val value = parseValue(t.substring(eq + 1).trim)
                out += ((key, value))
              }
            }
          }
        }
      }
      Right(out.result())
    } catch { case e: Exception => Left(e.getMessage) }
  }

  private def findBalanced(s: String, openIdx: Int): Int = {
    var depth = 0
    var i = openIdx
    var quote: Char = 0
    var triple = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == '\\') i += 1
        else if (triple && s.startsWith(quote.toString * 3, i)) { quote = 0; triple = false; i += 2 }
        else if (!triple && c == quote) quote = 0
      } else c match {
        case '\'' | '"' =>
          if (s.startsWith(c.toString * 3, i)) { quote = c; triple = true; i += 2 }
          else quote = c
        case '#' =>
          val nl = s.indexOf('\n', i)
          i = if (nl < 0) s.length else nl
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String, sep: Char): List[String] = {
    val out = List.newBuilder[String]
    var depth = 0
    var quote: Char = 0
    var triple = false
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (c == '\\' && i + 1 < s.length) { cur.append(s.charAt(i + 1)); i += 1 }
        else if (triple && s.startsWith(quote.toString * 3, i)) {
          cur.append(s.substring(i + 1, i + 3)); quote = 0; triple = false; i += 2
        }
        else if (!triple && c == quote) quote = 0
      } else c match {
        case '\'' | '"' =>
          cur.append(c)
          if (s.startsWith(c.toString * 3, i)) {
            cur.append(s.substring(i + 1, i + 3)); quote = c; triple = true; i += 2
          } else quote = c
        case '#' =>
          val nl = s.indexOf('\n', i)
          i = (if (nl < 0) s.length else nl) - 1
        case '(' | '[' | '{' => depth += 1; cur.append(c)
        case ')' | ']' | '}' => depth -= 1; cur.append(c)
        case x if x == sep && depth == 0 => out += cur.toString; cur.clear()
        case x => cur.append(x)
      }
      i += 1
    }
    out += cur.toString
    out.result()
  }

  private def findTopLevelEq(s: String): Int = {
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == '\\') i += 1 else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"'       => quote = c
        case '(' | '[' | '{'  => depth += 1
        case ')' | ']' | '}'  => depth -= 1
        case '=' if depth == 0 =>
          // not ==, <=, >=, !=
          val prev = if (i > 0) s.charAt(i - 1) else ' '
          val next = if (i + 1 < s.length) s.charAt(i + 1) else ' '
          if (next != '=' && prev != '=' && prev != '<' && prev != '>' && prev != '!')
            return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  def parseValue(v0: String): PyV = {
    val v = v0.trim
    parseStringLit(v) match {
      case Some(s) => return PyStr(s)
      case None    =>
    }
    if ((v.startsWith("[") && v.endsWith("]")) ||
        (v.startsWith("(") && v.endsWith(")"))) {
      val inner = v.substring(1, v.length - 1)
      val items = splitTopLevel(inner, ',').map(_.trim).filter(_.nonEmpty).map(parseValue)
      if (items.forall(_ != PyOpaque) && items.forall(!_.isInstanceOf[PyDict]))
        return PyList(items)
      return PyOpaque
    }
    if (v.startsWith("{") && v.endsWith("}")) {
      val inner = v.substring(1, v.length - 1)
      val entries = List.newBuilder[(String, String)]
      var ok = true
      for (part <- splitTopLevel(inner, ',').map(_.trim).filter(_.nonEmpty)) {
        val ci = findTopLevelColon(part)
        if (ci < 0) { /* set literal element */
          if (parseStringLit(part).isEmpty) ok = false
        } else {
          (parseStringLit(part.substring(0, ci).trim),
           parseStringLit(part.substring(ci + 1).trim)) match {
            case (Some(k), Some(value)) => entries += ((k, value))
            case _                      => ok = false
          }
        }
      }
      if (!ok) return PyOpaque
      val es = entries.result()
      if (es.nonEmpty) return PyDict(es)
      // set of strings
      val items = splitTopLevel(inner, ',').map(_.trim).filter(_.nonEmpty)
        .flatMap(parseStringLit)
      return PyList(items.map(PyStr.apply))
    }
    PyOpaque
  }

  private def findTopLevelColon(s: String): Int = {
    var depth = 0; var quote: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == '\\') i += 1 else if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"'      => quote = c
        case '(' | '[' | '{' => depth += 1
        case ')' | ']' | '}' => depth -= 1
        case ':' if depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  def parseStringLit(v: String): Option[String] = {
    def one(s: String): Option[(String, Int)] = {
      if (s.length >= 6 && (s.startsWith("\"\"\"") || s.startsWith("'''"))) {
        val q = s.substring(0, 3)
        val end = s.indexOf(q, 3)
        if (end < 0) None else Some((unescape(s.substring(3, end)), end + 3))
      } else if (s.length >= 2 && (s.startsWith("\"") || s.startsWith("'"))) {
        val q = s.charAt(0)
        var i = 1
        val sb = new StringBuilder
        while (i < s.length && s.charAt(i) != q) {
          if (s.charAt(i) == '\\' && i + 1 < s.length) {
            sb.append(unescapeChar(s.charAt(i + 1)))
            i += 2
          } else { sb.append(s.charAt(i)); i += 1 }
        }
        if (i >= s.length) None else Some((sb.toString, i + 1))
      } else None
    }
    // adjacent string literal concatenation
    var rest = v.trim
    val sb = new StringBuilder
    var matched = false
    while (rest.nonEmpty) {
      one(rest) match {
        case Some((s, consumed)) =>
          matched = true
          sb.append(s)
          rest = rest.substring(consumed).trim
        case None =>
          return if (matched && rest.isEmpty) Some(sb.toString) else None
      }
    }
    if (matched) Some(sb.toString) else None
  }

  private def unescape(s: String): String = {
    if (!s.contains('\\')) return s
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        sb.append(unescapeChar(s.charAt(i + 1))); i += 2
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private def unescapeChar(c: Char): String = c match {
    case 'n'  => "\n"
    case 't'  => "\t"
    case 'r'  => "\r"
    case '\n' => ""
    case o    => o.toString
  }
}

/** parse_python_long_description (src/providers/python.rs:376-439) */
object PythonLongDescription {
  import Certainty._

  def parse(longDescription: String, contentType0: Option[String]): List[Datum] = {
    if (longDescription.isEmpty) return Nil
    var contentType = contentType0.getOrElse("text/plain").split(';')(0)
    if (longDescription.contains("-*-restructuredtext-*-"))
      contentType = "text/restructured-text"

    contentType match {
      case "text/plain" =>
        val lines = longDescription.split("\n", -1)
        if (lines.length > 30) Nil
        else List(Datum("Description", UStr(longDescription), Some(Possible), None))
      case "text/restructured-text" | "text/x-rst" =>
        Readme.descriptionFromReadmeRst(longDescription) match {
          case Left(_) => throw new RuntimeException("rst parse failure")
          case Right((desc, extra)) =>
            desc.map(dd => Datum("Description", UStr(dd), Some(Possible), None)).toList ++ extra
        }
      case "text/markdown" =>
        val (desc, extra) = Readme.descriptionFromReadmeMd(longDescription)
        desc.map(dd => Datum("Description", UStr(dd), Some(Possible), None)).toList ++ extra
      case _ => Nil
    }
  }
}

/** Minimal opam file parser: `key: value` with string/list values. */
object OpamParser {
  sealed trait OVal
  final case class OStr(s: String) extends OVal
  final case class OList(items: List[OVal]) extends OVal
  case object OOther extends OVal

  sealed trait Item
  final case class Variable(name: String, value: OVal) extends Item
  final case class Section(name: String) extends Item

  def parse(content: String): Either[String, List[Item]] = {
    try {
      val out = List.newBuilder[Item]
      val lines = content.split("\n", -1)
      var i = 0
      while (i < lines.length) {
        val line = lines(i).trim
        if (line.isEmpty || line.startsWith("#")) i += 1
        else {
          val ci = line.indexOf(':')
          if (ci > 0 && !line.substring(0, ci).contains(' ')) {
            val key = line.substring(0, ci).trim
            var rest = line.substring(ci + 1).trim
            // multi-line string or list
            var guard = 0
            while (guard < 500 && !valueComplete(rest) && i + 1 < lines.length) {
              i += 1
              rest = rest + "\n" + lines(i)
              guard += 1
            }
            out += Variable(key, parseValue(rest.trim))
            i += 1
          } else i += 1
        }
      }
      Right(out.result())
    } catch { case e: Exception => Left(e.getMessage) }
  }

  private def valueComplete(s0: String): Boolean = {
    val s = s0.trim
    if (s.isEmpty) false
    else if (s.startsWith("\"\"\"")) s.length >= 6 && s.endsWith("\"\"\"")
    else if (s.startsWith("\"")) {
      // complete when ends with unescaped quote
      var i = 1
      var closed = false
      while (i < s.length && !closed) {
        if (s.charAt(i) == '\\') i += 1
        else if (s.charAt(i) == '"') closed = true
        i += 1
      }
      closed
    } else if (s.startsWith("[")) s.count(_ == '[') <= s.count(_ == ']')
    else true
  }

  def parseValue(s0: String): OVal = {
    val s = s0.trim
    if (s.startsWith("\"\"\"") && s.endsWith("\"\"\"") && s.length >= 6)
      OStr(s.substring(3, s.length - 3))
    else if (s.startsWith("\"")) {
      val sb = new StringBuilder
      var i = 1
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n')
            case 't' => sb.append('\t')
            case c   => sb.append(c)
          }
          i += 2
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      OStr(sb.toString)
    } else if (s.startsWith("[") && s.endsWith("]")) {
      val inner = s.substring(1, s.length - 1)
      // split on whitespace outside quotes
      val items = List.newBuilder[OVal]
      var i = 0
      while (i < inner.length) {
        val c = inner.charAt(i)
        if (c == '"') {
          var j = i + 1
          val sb = new StringBuilder
          while (j < inner.length && inner.charAt(j) != '"') {
            if (inner.charAt(j) == '\\' && j + 1 < inner.length) {
              sb.append(inner.charAt(j + 1)); j += 2
            } else { sb.append(inner.charAt(j)); j += 1 }
          }
          items += OStr(sb.toString)
          i = j + 1
        } else i += 1
      }
      OList(items.result())
    } else OOther
  }
}
