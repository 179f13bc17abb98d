package graft.pipeline

import graft.core._

/** Output renderers — the reference's sink formats (§2.8):
  *   - YAML per subject (guess-upstream-metadata's default output,
  *     /root/reference/src/lib.rs:1518-1532, bin/guess-upstream-metadata.rs:151-155)
  *   - codemeta JSON (schema.org SoftwareSourceCode,
  *     /root/reference/src/bin/autocodemeta.rs:9-160)
  * Production tables (triples/nodes/edges/lineage) are written as parquet by
  * the Spark layer; these renderers serve the per-subject API surface.
  */
object Sinks {

  // ---------- YAML ----------

  private def needsQuoting(s: String): Boolean = {
    if (s.isEmpty) return true
    if (s.contains('\n')) return false // rendered as block scalar instead
    val first = s.head
    if (" \t".contains(s.last) || " \t".contains(first)) return true
    if ("!&*-?|>%@`\"'#{}[],".contains(first)) return true
    if (s.contains(": ") || s.endsWith(":") || s.contains(" #")) return true
    // plain scalars that YAML would re-type
    if (s.matches("[-+]?[0-9]+") || s.matches("[-+]?[0-9]*\\.[0-9]+([eE][-+]?[0-9]+)?")) return true
    if (Set("true", "false", "null", "~", "yes", "no", "on", "off",
            "True", "False", "Null", "Yes", "No", "On", "Off").contains(s)) return true
    false
  }

  private def scalar(s: String, indent: String): String = {
    if (s.contains('\n')) {
      // block literal; strip/keep indicator by trailing newline
      val (body, indicator) =
        if (s.endsWith("\n")) (s.dropRight(1), "|") else (s, "|-")
      val ind = indent + "  "
      indicator + "\n" + body.split("\n", -1).map(l =>
        if (l.isEmpty) "" else ind + l).mkString("\n")
    } else if (needsQuoting(s)) {
      "'" + s.replace("'", "''") + "'"
    } else s
  }

  private def person(p: Person, indent: String): String = {
    val entries = List(
      p.name.map(n => s"name: ${scalar(n, indent)}"),
      p.email.map(e => s"email: ${scalar(e, indent)}"),
      p.url.map(u => s"url: ${scalar(u, indent)}")).flatten
    if (entries.isEmpty) "!Person {}"
    else "!Person\n" + entries.map(e => indent + "  " + e).mkString("\n")
  }

  /** Renders one subject's canonical metadata as a YAML mapping keyed by
    * field (already sorted upstream).
    */
  def toYaml(metadata: List[Datum]): String = {
    val sb = new StringBuilder
    for (dt <- metadata) {
      sb.append(dt.field).append(":")
      dt.value match {
        case UStr(s)  => sb.append(' ').append(scalar(s, "")).append('\n')
        case UInt(i)  => sb.append(' ').append(i).append('\n')
        case UPerson(p) => sb.append(' ').append(person(p, "")).append('\n')
        case UStrings(ss) =>
          sb.append('\n')
          ss.foreach(s => sb.append("- ").append(scalar(s, "")).append('\n'))
        case UPersons(ps) =>
          sb.append('\n')
          ps.foreach { p =>
            sb.append("- ").append(person(p, "  ")).append('\n')
          }
      }
    }
    sb.toString
  }

  // ---------- codemeta JSON (autocodemeta.rs field mapping) ----------

  import com.fasterxml.jackson.databind.ObjectMapper

  private val mapper = new ObjectMapper()

  def toCodemeta(metadata: List[Datum]): String = {
    val root = mapper.createObjectNode()
    root.put("@context", "https://doi.org/10.5063/schema/codemeta-2.0")
    root.put("@type", "SoftwareSourceCode")
    def get(f: String): Option[Datum] = metadata.find(_.field == f)
    get("Name").flatMap(_.str).foreach(root.put("name", _))
    get("Version").flatMap(_.str).foreach(root.put("version", _))
    get("Summary").flatMap(_.str).foreach(root.put("description", _))
    get("Homepage").flatMap(_.str).foreach(root.put("url", _))
    get("Repository").flatMap(_.str).foreach(root.put("codeRepository", _))
    get("Bug-Database").flatMap(_.str).foreach(root.put("issueTracker", _))
    get("License").flatMap(_.str).foreach(root.put("license", _))
    get("Keywords").foreach {
      _.value match {
        case UStrings(ks) =>
          val a = root.putArray("keywords"); ks.foreach(a.add)
        case _ =>
      }
    }
    get("Author").foreach {
      _.value match {
        case UPersons(ps) =>
          val a = root.putArray("author")
          ps.foreach { p =>
            val o = mapper.createObjectNode()
            o.put("@type", "Person")
            p.name.foreach(o.put("name", _))
            p.email.foreach(o.put("email", _))
            p.url.foreach(o.put("url", _))
            a.add(o)
          }
        case _ =>
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }
}
