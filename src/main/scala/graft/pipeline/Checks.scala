package graft.pipeline

import graft.core._
import graft.urls.{UrlLite, Vcs}
import scala.collection.mutable.ArrayBuffer

/** `check_upstream_metadata` promotion semantics
  * (/root/reference/src/lib.rs:3991-4156) as a PURE function over probe
  * outcomes: the reference interleaves the certainty-promotion/deletion rules
  * with live URL probes; here the probes arrive as a side table (url →
  * outcome) and only the decision logic runs — the exact split a crawl-scale
  * job needs (probe fleet writes a status table, this stage joins it).
  *
  * Rules, field by field (reference order):
  *   - Repository (lib.rs:3997-4037): valid → replace with the canonical
  *     URL and promote Confident → Certain (Likely is NOT promoted — the
  *     repository checker is held to a higher bar); then, if the browse URL
  *     derived from the canonical repo equals the current Repository-Browse
  *     value, the browse datum's certainty is synced to the repository's.
  *     invalid → delete. unverifiable/rate-limited → leave untouched.
  *   - Homepage (4039-4060), Repository-Browse (4061-4082),
  *     Bug-Database (4083-4105), Bug-Submit (4106-4128): valid → canonical
  *     URL + promote (certainty ≥ Likely → Certain); invalid → delete.
  *   - Screenshots (4129-4155): only when held at Likely — assume Certain,
  *     drop URLs probed dead, keep the live ones, and fall back to Likely if
  *     any probe was inconclusive.
  *
  * Non-URL values skip their check (to_url fails → reference logs and moves
  * on).
  */
object Checks {

  sealed trait Outcome
  /** Probe succeeded; `canonical` is the redirect-followed canonical URL. */
  final case class Valid(canonical: String) extends Outcome
  /** Probe proved the URL wrong (404/410/parse failure). */
  case object Invalid extends Outcome
  /** Probe could not decide (timeout, rate-limit, 5xx). */
  case object Unverifiable extends Outcome

  private def isUrl(d: Datum): Boolean =
    Fields.urlTyped.contains(d.field) && d.str.exists(s => UrlLite.parse(s).isDefined)

  /** Applies probe outcomes to canonical metadata. `probe(field, url)` is
    * the outcome table lookup (default Unverifiable = leave untouched);
    * `screenshotProbe(url)` mirrors verify_screenshots' tri-state. NOTE:
    * passing a screenshotProbe means screenshot probing RAN — a lookup
    * returning None is an inconclusive probe (url dropped, list demoted to
    * Likely, lib.rs:4137-4150). When no screenshot fleet ran at all, use
    * `applyProbesNoScreenshots`, which leaves Screenshots lists untouched —
    * conflating "no fleet" with "all probes inconclusive" silently empties
    * every Likely list.
    */
  def applyProbes(
      metadata: List[Datum],
      probe: (String, String) => Outcome,
      screenshotProbe: String => Option[Boolean] = _ => None
  ): List[Datum] =
    applyProbesImpl(metadata, probe, Some(screenshotProbe))

  /** URL-field checks only — for batches where no screenshot probe fleet
    * ran (Screenshots datums pass through untouched, like the relational
    * `applyUrlProbes` with `screenshotProbes = None`).
    */
  def applyProbesNoScreenshots(
      metadata: List[Datum],
      probe: (String, String) => Outcome
  ): List[Datum] =
    applyProbesImpl(metadata, probe, None)

  private def applyProbesImpl(
      metadata: List[Datum],
      probe: (String, String) => Outcome,
      screenshotProbe: Option[String => Option[Boolean]]
  ): List[Datum] = {
    val md = ArrayBuffer.from(metadata)

    def idx(f: String): Int = md.indexWhere(_.field == f)

    // Repository: canonicalize, Confident→Certain, sync Repository-Browse
    val ri = idx("Repository")
    if (ri >= 0 && isUrl(md(ri))) {
      probe("Repository", md(ri).str.get) match {
        case Valid(canonical) =>
          var repo = md(ri).copy(value = UStr(canonical))
          if (repo.certainty.contains(Certainty.Confident))
            repo = repo.copy(certainty = Some(Certainty.Certain))
          md(ri) = repo
          for (u <- UrlLite.parse(canonical);
               derived <- Vcs.browseUrlFromRepoUrl(Vcs.VcsLocation(u, None, None))) {
            val bi = idx("Repository-Browse")
            if (bi >= 0 && md(bi).str.contains(derived.toString))
              md(bi) = md(bi).copy(certainty = repo.certainty)
          }
        case Invalid      => md.remove(ri)
        case Unverifiable => ()
      }
    }

    // Homepage / Repository-Browse / Bug-Database / Bug-Submit: promote ≥
    // Likely to Certain on valid, delete on invalid
    for (field <- List("Homepage", "Repository-Browse", "Bug-Database", "Bug-Submit")) {
      val i = idx(field)
      if (i >= 0 && isUrl(md(i))) {
        probe(field, md(i).str.get) match {
          case Valid(canonical) =>
            var d = md(i).copy(value = UStr(canonical))
            if (Certainty.rank(d.certainty) >= Certainty.Likely)
              d = d.copy(certainty = Some(Certainty.Certain))
            md(i) = d
          case Invalid      => md.remove(i)
          case Unverifiable => ()
        }
      }
    }

    // Screenshots: only a Likely list is re-verified, and only when a
    // screenshot probe fleet actually ran
    for (shotProbe <- screenshotProbe) {
      val si = idx("Screenshots")
      if (si >= 0 && md(si).certainty.contains(Certainty.Likely)) {
        md(si).value match {
          case UStrings(urls) =>
            // only live URLs survive; an inconclusive probe also drops its
            // URL but demotes the whole list back to Likely (lib.rs:4137-4150)
            var cert = Certainty.Certain
            val kept = urls.filter { u =>
              shotProbe(u) match {
                case Some(ok) => ok
                case None     => cert = Certainty.Likely; false
              }
            }
            md(si) = md(si).copy(value = UStrings(kept), certainty = Some(cert))
          case _ => ()
        }
      }
    }

    md.toList
  }
}
