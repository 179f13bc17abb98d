package graft.core

/** Core data model of the knowledge-graph construction engine.
  *
  * Re-expresses the reference's provenance-tagged datum model
  * (/root/reference/src/lib.rs:61-722) as plain Scala values that are cheap to
  * ship through Spark encoders:
  *
  *   - Certainty (src/lib.rs:61-75): a 4-level totally ordered confidence
  *     lattice, encoded as Int 0..3 so the lattice join is integer `max` and
  *     the merge aggregate stays Catalyst-friendly.
  *   - Person (src/lib.rs:197-206, parser 336-428).
  *   - UValue: the payload of a datum. The reference uses a 39-variant tagged
  *     union (src/lib.rs:442-711); here predicates are *data* (field name
  *     strings) and payloads are a small closed set of shapes.
  *   - Datum: UpstreamDatumWithMetadata (src/lib.rs:713-722) = one
  *     provenance-tagged triple once a subject is attached.
  */
object Certainty {
  val Possible = 0
  val Likely = 1
  val Confident = 2
  val Certain = 3

  def show(c: Int): String = c match {
    case 0 => "possible"
    case 1 => "likely"
    case 2 => "confident"
    case 3 => "certain"
    case _ => throw new IllegalArgumentException(s"bad certainty $c")
  }

  def parse(s: String): Int = s match {
    case "possible"  => 0
    case "likely"    => 1
    case "confident" => 2
    case "certain"   => 3
    case _ => throw new IllegalArgumentException(s"unknown certainty: $s")
  }

  /** Ordering on Option[Certainty]: None sorts below Some(Possible), matching
    * Rust's `Option<Certainty>` derive(Ord) (src/lib.rs:2276).
    */
  def rank(c: Option[Int]): Int = c.getOrElse(-1)
}

final case class Person(
    name: Option[String] = None,
    email: Option[String] = None,
    url: Option[String] = None
) {
  /** Display form (src/lib.rs:323-334). */
  def show: String = {
    val sb = new StringBuilder(name.getOrElse(""))
    email.foreach(e => sb.append(" <").append(e).append(">"))
    url.foreach(u => sb.append(" (").append(u).append(")"))
    sb.toString
  }
}

object Person {
  /** `parseaddr` (src/lib.rs:418-428): regex search, trimmed groups. */
  private val AddrRe = java.util.regex.Pattern.compile("(.*?)\\s*<([^<>]+)>")

  def parseaddr(text: String): Option[(String, String)] = {
    val m = AddrRe.matcher(text)
    if (m.find()) Some((m.group(1).trim, m.group(2).trim)) else None
  }

  /** `Person::from(&str)` (src/lib.rs:336-403), ported branch-for-branch. */
  def parse(text0: String): Person = {
    val text = text0
      .replace(" at ", "@")
      .replace(" -at- ", "@")
      .replace(" -dot- ", ".")
      .replace("[AT]", "@")

    if (text.contains('(') && text.endsWith(")")) {
      val inner = text.substring(0, text.length - 1)
      val idx = inner.indexOf('(')
      if (idx >= 0) {
        val p1 = inner.substring(0, idx)
        val p2 = inner.substring(idx + 1)
        if (p2.startsWith("https://") || p2.startsWith("http://")) {
          parseaddr(p1) match {
            case Some((n, e)) => Person(Some(n), Some(e), Some(p2))
            case None         => Person(name = Some(p1), url = Some(p2))
          }
        } else if (p2.contains('@')) {
          Person(name = Some(p1), email = Some(p2))
        } else {
          Person(name = Some(text))
        }
      } else {
        Person(name = Some(text))
      }
    } else if (text.contains('<')) {
      parseaddr(text) match {
        case Some((n, e)) => Person(name = Some(n), email = Some(e))
        case None         => Person(name = Some(text))
      }
    } else if (text.contains('@') && !text.contains(' ')) {
      Person(email = Some(text))
    } else {
      Person(name = Some(text))
    }
  }
}

/** Datum payloads. The closed shape set of the reference's enum:
  * String (most), Vec<Person> (Author), Person (Maintainer), Vec<String>
  * (Keywords, Screenshots), i32 (DebianITP). Registry is unused offline.
  */
sealed trait UValue {
  def asStr: Option[String] = this match {
    case UStr(s) => Some(s)
    case _       => None
  }
}
final case class UStr(s: String) extends UValue
final case class UPersons(ps: List[Person]) extends UValue
final case class UPerson(p: Person) extends UValue
final case class UStrings(ss: List[String]) extends UValue
final case class UInt(i: Int) extends UValue

/** UpstreamDatumWithMetadata: one (pred, value) with provenance. */
final case class Datum(
    field: String,
    value: UValue,
    certainty: Option[Int],
    origin: Option[String]
) {
  def str: Option[String] = value.asStr
}

object Fields {
  /** Fields whose string payload is URL-typed (to_url, src/lib.rs:822-865). */
  val urlTyped: Set[String] = Set(
    "Homepage", "Repository", "Repository-Browse", "Bug-Database",
    "Bug-Submit", "Cargo-Crate", "Documentation", "API-Documentation",
    "Download", "Wiki", "MailingList", "SourceForge-Project", "Archive",
    "Demo", "Funding", "Changelog", "Webservice", "FAQ"
  )
}

object KnownBad {
  /** `known_bad_url` (src/lib.rs:724-729). */
  private def knownBadUrl(v: String): Boolean = v.contains("${")

  /** `UpstreamDatum::known_bad_guess` (src/lib.rs:876-977). */
  def isBad(d: Datum): Boolean = d.field match {
    case "Bug-Database" | "Bug-Submit" =>
      val s = d.str.getOrElse(return false)
      if (knownBadUrl(s)) return true
      graft.urls.UrlLite.parse(s) match {
        case None => false
        case Some(u) =>
          u.host.contains("bugzilla.gnome.org") ||
          u.host.contains("bugs.freedesktop.org") ||
          u.path.endsWith("/sign_in")
      }
    case "Repository" =>
      val s = d.str.getOrElse(return false)
      if (knownBadUrl(s)) return true
      graft.urls.UrlLite.parse(s) match {
        case None => false
        case Some(u) =>
          u.host.contains("anongit.kde.org") ||
          u.host.contains("git.gitorious.org") ||
          u.path.endsWith("/sign_in")
      }
    case "Homepage" =>
      val s = d.str.getOrElse(return false)
      graft.urls.UrlLite.parse(s) match {
        case None    => false
        case Some(u) => u.host.contains("pypi.org") || u.host.contains("rubygems.org")
      }
    case "Repository-Browse" =>
      val s = d.str.getOrElse(return false)
      if (knownBadUrl(s)) return true
      graft.urls.UrlLite.parse(s) match {
        case None => false
        case Some(u) =>
          u.host.contains("cgit.kde.org") || u.path.endsWith("/sign_in")
      }
    case "Author" =>
      d.value match {
        case UPersons(ps) =>
          ps.exists(_.name.exists { n =>
            val lc = n.toLowerCase
            lc.contains("unknown") || lc.contains("maintainer") || lc.contains("contributor")
          })
        case _ => false
      }
    case "Name" =>
      d.str.exists { s =>
        val lc = s.toLowerCase
        lc.contains("unknown") || lc == "package"
      }
    case "Version" =>
      d.str.exists { s =>
        val lc = s.toLowerCase
        lc == "devel" || lc == "unknown"
      }
    case _ => false
  }
}

/** The certainty-lattice merge: at most one datum per field; replace iff the
  * new certainty is STRICTLY greater (ties keep first arrival, so input order
  * is semantics). Port of `update_from_guesses` (src/lib.rs:2269-2282).
  */
object Merge {
  /** Applies new items in order; returns the changed (accepted) items. */
  def updateFromGuesses(
      metadata: scala.collection.mutable.ArrayBuffer[Datum],
      newItems: IterableOnce[Datum]
  ): List[Datum] = {
    val changed = List.newBuilder[Datum]
    newItems.iterator.foreach { d =>
      val idx = metadata.indexWhere(_.field == d.field)
      if (idx < 0) {
        metadata.append(d)
        changed += d
      } else if (Certainty.rank(d.certainty) > Certainty.rank(metadata(idx).certainty)) {
        metadata(idx) = d
        changed += d
      }
    }
    changed.result()
  }

  /** possible_fields_missing (src/lib.rs:2284-2297): true when any of
    * `fields` is absent or held at less than Certain — the gate that decides
    * whether an external registry is worth consulting at all.
    */
  def possibleFieldsMissing(metadata: Seq[Datum], fields: Seq[String]): Boolean =
    fields.exists { f =>
      metadata.find(_.field == f) match {
        case Some(dt) => !dt.certainty.contains(Certainty.Certain)
        case None     => true
      }
    }

  /** extend_from_external_guesser (src/lib.rs:2299-2324): consult `newItems`
    * only when a supported field is still missing/uncertain; accepted items
    * carry `maxCertainty` and merge through the usual lattice (existing
    * data of equal or higher certainty always wins).
    */
  def extendFromExternalGuesser(
      metadata: scala.collection.mutable.ArrayBuffer[Datum],
      maxCertainty: Int,
      supportedFields: Seq[String],
      newItems: () => List[(String, UValue)]
  ): List[Datum] = {
    if (!possibleFieldsMissing(metadata.toSeq, supportedFields)) return Nil
    updateFromGuesses(metadata,
      newItems().map { case (f, v) => Datum(f, v, Some(maxCertainty), None) })
  }
}
