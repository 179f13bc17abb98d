package graft.extract

import graft.core._
import graft.extract.MiniHtml.{HElem, HNode, HText}

/** Homepage-scrape metadata — the pure core of the reference's
  * `guess_from_homepage` (/root/reference/src/homepage.rs:7-56): given the
  * FETCHED page content (the crawl is the fetched-homepage corpus), walk the
  * anchor tags and harvest Repository / Bug-Database links by their visible
  * label or aria-label, each at Possible certainty with the page URL as
  * origin. This powers extrapolation rule 14, inert offline in the reference
  * because it fetches; here it runs as a join against a fetched-pages side
  * table (KgEngine.enrichFromHomepages).
  */
object Homepage {

  private def textOf(n: HNode): String = n match {
    case HText(d) => d
    case e: HElem => e.children.map(textOf).mkString
  }

  private def walk(n: HNode)(f: HElem => Unit): Unit = n match {
    case e: HElem => f(e); e.children.foreach(walk(_)(f))
    case _        =>
  }

  /** RFC-3986-lite href resolution against a base URL: absolute hrefs pass
    * through; scheme-relative take the base scheme; root-relative take the
    * base origin; the rest resolve against the base path's directory.
    * (The reference delegates to url::Url::join.)
    */
  def resolve(base: String, href: String): String = {
    if (href.isEmpty) return base
    if (href.matches("^[a-zA-Z][a-zA-Z0-9+.-]*:.*")) return href
    val schemeEnd = base.indexOf("://")
    if (schemeEnd < 0) return href
    val scheme = base.substring(0, schemeEnd)
    if (href.startsWith("//")) return scheme + ":" + href
    val hostStart = schemeEnd + 3
    val pathStart = base.indexOf('/', hostStart)
    val origin = if (pathStart < 0) base else base.substring(0, pathStart)
    if (href.startsWith("/")) return origin + href
    val basePath = if (pathStart < 0) "/" else base.substring(pathStart)
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    origin + dir + href
  }

  /** `guess_from_page` (homepage.rs:17-55): for each <a href>, check the
    * aria-label first, then the trimmed element text; each matching label
    * emits one datum, in document order.
    */
  def guessFromPage(text: String, baseHref: String): List[Datum] = {
    val root = MiniHtml.parse(text)
    val out = List.newBuilder[Datum]
    val origin = Some(baseHref)
    walk(root) { e =>
      if (e.tag == "a") {
        e.attrs.get("href").foreach { href =>
          val labels = List(e.attrs.get("aria-label"), Some(textOf(e).trim)).flatten
          labels.foreach { label =>
            label.toLowerCase match {
              case "github" | "git" | "repository" | "github repository" =>
                out += Datum("Repository", UStr(resolve(baseHref, href)),
                  Some(Certainty.Possible), origin)
              case "github bug tracking" | "bug tracker" =>
                out += Datum("Bug-Database", UStr(resolve(baseHref, href)),
                  Some(Certainty.Possible), origin)
              case _ => ()
            }
          }
        }
      }
    }
    out.result()
  }
}
