package graft.pipeline

import graft.core._
import graft.urls._
import graft.extract._
import scala.collection.mutable.ArrayBuffer

/** Per-subject summarization: the reference's `get_upstream_info` semantics
  * (/root/reference/src/lib.rs:3896-3923) under the golden-test configuration
  * (trust=true, net=false, external=false, check=false).
  *
  * A subject is a project: a bag of (relpath, content) artifacts. This whole
  * function is pure and runs inside a Dataset groupByKey(subj).mapGroups —
  * per-key state is ≤39 fields, so the extrapolation fixpoint never crosses
  * subjects and needs no driver-side loop.
  */
object Summarize {
  import Certainty._

  final case class Artifact(relpath: String, content: String)

  /** One guesser = registry-ordered unit of extraction
    * (find_guessers, src/lib.rs:3083-3440).
    */
  private def guessers(
      files: Map[String, String],
      subjectBasename: String,
      envRepositoryUrl: Option[String]
  ): List[() => Either[String, List[Datum]]] = {
    val out = List.newBuilder[() => Either[String, List[Datum]]]
    def has(p: String): Boolean = files.contains(p)
    def content(p: String): String = files(p)

    // package name for debian/watch templating (read_entries,
    // src/providers/debian.rs:728-768)
    lazy val debianPackageName: String =
      files.get("debian/changelog")
        .flatMap(c => Parsers.parseChangelogFirstEntry(c).toOption.map(_._1))
        .orElse(files.get("debian/control").flatMap { c =>
          Parsers.parseDeb822(c).flatMap(p => Parsers.deb822Get(p, "Source")).headOption
        })
        .getOrElse("")

    // debian_is_native (src/providers/debian.rs:819-844)
    lazy val isNative: Option[Boolean] =
      files.get("debian/source/format") match {
        case Some(f) => Some(f.trim == "3.0 (native)")
        case None =>
          files.get("debian/changelog").flatMap { c =>
            Parsers.parseChangelogFirstEntry(c).toOption.flatMap {
              case (_, Some(v), _) => Some(Parsers.debianRevision(v).isEmpty)
              case _               => None
            }
          }
      }

    // --- OLD_STATIC_GUESSERS in registry order (src/lib.rs:2939-3081) ---
    if (has("debian/watch"))
      out += (() => Extractors.debianWatch("debian/watch", content("debian/watch"), debianPackageName))
    if (has("debian/control"))
      out += (() => Extractors.debianControl("debian/control", content("debian/control"), isNative))
    if (has("debian/changelog"))
      out += (() => Extractors.debianChangelog("debian/changelog", content("debian/changelog")))
    if (has("debian/rules"))
      out += (() => Extractors.debianRules("debian/rules", content("debian/rules")))
    if (has("PKG-INFO"))
      out += (() => Extractors.pkgInfo("PKG-INFO", content("PKG-INFO")))
    if (has("package.json"))
      out += (() => Extractors.packageJson("package.json", content("package.json")))
    if (has("composer.json"))
      out += (() => Extractors.composerJson("composer.json", content("composer.json")))
    if (has("package.xml"))
      out += (() => Extractors.packageXml("package.xml", content("package.xml")))
    if (has("package.yaml"))
      out += (() => Extractors.packageYaml("package.yaml", content("package.yaml")))
    if (has("dist.ini"))
      out += (() => Extractors.distIni("dist.ini", content("dist.ini")))
    if (has("debian/copyright"))
      out += (() => Extractors.debianCopyright("debian/copyright", content("debian/copyright")))
    for (p <- List("META.json", "MYMETA.json") if has(p))
      out += (() => Extractors.metaJson(p, content(p)))
    for (p <- List("META.yml", "MYMETA.yml") if has(p))
      out += (() => Extractors.metaYml(p, content(p)))
    if (has("configure"))
      out += (() => Extractors.configure("configure", content("configure")))
    if (has("DESCRIPTION"))
      out += (() => Extractors.rDescription("DESCRIPTION", content("DESCRIPTION")))
    if (has("Cargo.toml"))
      out += (() => Extractors.cargoToml("Cargo.toml", content("Cargo.toml")))
    if (has("pom.xml"))
      out += (() => Extractors.pomXml("pom.xml", content("pom.xml")))
    if (has(".git/config"))
      out += (() => Extractors.gitConfig(".git/config", content(".git/config"), trustPackage = true))
    if (has("debian/get-orig-source.sh"))
      out += (() => Extractors.getOrigSource("debian/get-orig-source.sh", content("debian/get-orig-source.sh")))
    if (has("pyproject.toml"))
      out += (() => Extractors.pyprojectToml("pyproject.toml", content("pyproject.toml")))
    if (has("setup.cfg"))
      out += (() => Extractors.setupCfg("setup.cfg", content("setup.cfg")))
    if (has("go.mod"))
      out += (() => Extractors.goMod("go.mod", content("go.mod")))
    if (has("Makefile.PL"))
      out += (() => Extractors.makefilePl("Makefile.PL", content("Makefile.PL")))
    if (has("wscript"))
      out += (() => Extractors.wscript("wscript", content("wscript")))
    if (has("AUTHORS"))
      out += (() => Extractors.authorsFile("AUTHORS", content("AUTHORS")))
    if (has("INSTALL"))
      out += (() => Extractors.installFile("INSTALL", content("INSTALL")))
    for (p <- List("pubspec.yaml", "pubspec.yml") if has(p))
      out += (() => Extractors.pubspecYaml(p, content(p)))
    // meson.build: reference shells out to `meson introspect`, which is not
    // available offline → guesser errors and is dropped. Nothing to emit.
    if (has("metadata.json"))
      out += (() => Extractors.metadataJson("metadata.json", content("metadata.json")))
    if (has(".travis.yml"))
      out += (() => Extractors.travisYml(".travis.yml", content(".travis.yml")))

    // --- SECURITY.md in three locations (src/lib.rs:3099-3113) ---
    for (name <- List("SECURITY.md", ".github/SECURITY.md", "docs/SECURITY.md") if has(name))
      out += (() => Extractors.securityMd(name, name))

    // --- egg-info / dist-info (src/lib.rs:3115-3144) ---
    val topLevel = files.keys.filterNot(_.contains('/')).toList.sorted
    var foundPkgInfo = has("PKG-INFO")
    val eggInfos = files.keys.filter(p =>
      p.split('/') match {
        case Array(dir, "PKG-INFO") if dir.endsWith(".egg-info") => true
        case Array(dir, "METADATA") if dir.endsWith(".dist-info") => true
        case _ => false
      }).toList.sorted
    for (p <- eggInfos) {
      out += (() => Extractors.pkgInfo(p, content(p)))
      foundPkgInfo = true
    }

    // --- setup.py if no PKG-INFO (src/lib.rs:3146-3157) ---
    if (!foundPkgInfo && has("setup.py"))
      out += (() => Extractors.setupPy("setup.py", content("setup.py")))

    // --- gemspecs, all (src/lib.rs:3159-3173) ---
    for (p <- topLevel if p.endsWith(".gemspec"))
      out += (() => Extractors.gemspec(p, content(p)))

    // --- R subdir DESCRIPTION (src/lib.rs:3176-3195) ---
    for (p <- files.keys.toList.sorted if p.endsWith("/DESCRIPTION") && p.count(_ == '/') == 1)
      out += (() => Extractors.rDescription(p, content(p)))

    // --- exactly-one rules: doap / metainfo / cabal (src/lib.rs:3197-3292) ---
    def exactlyOne(pred: String => Boolean)(mk: String => () => Either[String, List[Datum]]): Unit = {
      val matches = topLevel.filter(pred)
      if (matches.length == 1) out += mk(matches.head)
    }
    exactlyOne(p => p.endsWith(".doap") || (p.endsWith(".xml") && p.startsWith("doap_XML_")))(
      p => () => Extractors.doap(p, content(p)))
    exactlyOne(_.endsWith(".metainfo.xml"))(p => () => Extractors.metainfo(p, content(p)))
    exactlyOne(_.endsWith(".cabal"))(p => () => Extractors.cabal(p, content(p)))

    // --- README family, all (src/lib.rs:3294-3335) ---
    val readmes = topLevel.filter { p =>
      val lc = p.toLowerCase
      (lc.startsWith("readme") || lc.startsWith("hacking") || lc.startsWith("contributing")) &&
        !p.endsWith("~") && {
          val ext = extensionOf(p)
          !ext.contains("html") && !ext.contains("pdf") && !ext.contains("xml")
        }
    }
    for (p <- readmes) {
      out += (() => Readme.guessFromReadme(p, extensionOf(p), content(p)))
    }

    // --- single nuspec / opam (src/lib.rs:3337-3401) ---
    exactlyOne(_.endsWith(".nuspec"))(p => () => Extractors.nuspec(p, content(p)))
    exactlyOne(_.endsWith(".opam"))(p => () => Extractors.opam(p, content(p)))

    // --- debian patches (src/lib.rs:3403-3430) ---
    for (p <- files.keys.toList.sorted
         if p.startsWith("debian/patches/") && p.endsWith(".patch"))
      out += (() => Extractors.debianPatch(p, content(p)))

    // --- environment guesser (UPSTREAM_BRANCH_URL, src/lib.rs:2237-2248),
    //     then path fallback (src/lib.rs:3432-3437)
    envRepositoryUrl.foreach { url =>
      out += (() => Right(List(
        Datum("Repository", UStr(url), Some(Certain), Some("environment")))))
    }
    out += (() => Right(Extractors.fromPath(subjectBasename)))

    out.result()
  }

  private def extensionOf(p: String): Option[String] = {
    val base = p.substring(p.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    if (dot <= 0) None else Some(base.substring(dot + 1).toLowerCase)
  }

  /** Full per-subject run: extract → filter bad → merge → extrapolate →
    * fix → sort. Returns (metadata, errors).
    */
  def summarize(
      files: Map[String, String],
      subjectBasename: String,
      envRepositoryUrl: Option[String] = None
  ): (List[Datum], List[String]) = {
    val errors = List.newBuilder[String]
    val raw = ArrayBuffer.empty[Datum]
    for (g <- guessers(files, subjectBasename, envRepositoryUrl)) {
      g() match {
        case Right(ds) => raw ++= ds
        case Left(e)   => errors += e
      }
    }

    val metadata = ArrayBuffer.empty[Datum]
    Merge.updateFromGuesses(metadata, raw.iterator.filterNot(KnownBad.isBad))

    extrapolate(metadata)
    fixMetadata(metadata)

    (metadata.sortBy(_.field).toList, errors.result())
  }

  /** Raw extraction only — the scan-mode surface (raw_triples). */
  def extractRaw(
      files: Map[String, String],
      subjectBasename: String,
      envRepositoryUrl: Option[String] = None
  ): List[Datum] = {
    val raw = ArrayBuffer.empty[Datum]
    for (g <- guessers(files, subjectBasename, envRepositoryUrl)) {
      g() match {
        case Right(ds) => raw ++= ds
        case Left(_)   =>
      }
    }
    raw.toList
  }

  // ---------- extrapolation fixpoint (src/extrapolate.rs) ----------

  private final case class Rule(
      fromFields: List[String],
      toFields: List[String],
      cb: ArrayBuffer[Datum] => List[Datum]
  )

  private def get(md: ArrayBuffer[Datum], field: String): Option[Datum] =
    md.find(_.field == field)

  /** Rust `min(cert, Some(cap)).unwrap_or(cap)`: None caps to `cap`. */
  private def capped(c: Option[Int], cap: Int): Int =
    c.map(v => math.min(v, cap)).getOrElse(cap)

  private def urlOf(dt: Datum): Option[UrlLite] =
    if (!Fields.urlTyped.contains(dt.field)) None
    else dt.str.flatMap(UrlLite.parse)

  private val rules: List[Rule] = List(
    Rule(List("Homepage"), List("Repository"), { md =>
      val hp = get(md, "Homepage").get
      urlOf(hp).flatMap(Vcs.guessRepoFromUrl) match {
        case Some(repo) =>
          List(Datum("Repository", UStr(repo),
            Some(capped(hp.certainty, Likely)), hp.origin))
        case None => Nil
      }
    }),
    Rule(List("Repository-Browse"), List("Homepage"), { md =>
      val br = get(md, "Repository-Browse").get
      urlOf(br) match {
        case Some(u) =>
          Forges.findForge(u) match {
            case Some(f) if f.repositoryBrowseCanBeHomepage =>
              List(Datum("Homepage", UStr(br.str.get),
                Some(capped(br.certainty, Possible)), br.origin))
            case _ => Nil
          }
        case None => Nil
      }
    }),
    Rule(List("Bugs-Database"), List("Bug-Database"), { md =>
      val old = get(md, "Bugs-Database").get
      List(Datum("Bug-Database", UStr(old.str.get), old.certainty, old.origin))
    }),
    Rule(List("Bug-Database"), List("Repository"), { md =>
      val old = get(md, "Bug-Database").get
      urlOf(old).flatMap(Vcs.guessRepoFromUrl) match {
        case Some(repo) =>
          List(Datum("Repository", UStr(repo),
            Some(capped(old.certainty, Likely)), old.origin))
        case None => Nil
      }
    }),
    Rule(List("Repository"), List("Repository-Browse"), { md =>
      val old = get(md, "Repository").get
      urlOf(old).flatMap(u =>
        Vcs.browseUrlFromRepoUrl(Vcs.VcsLocation(u, None, None))) match {
        case Some(b) =>
          List(Datum("Repository-Browse", UStr(b.toString), old.certainty, old.origin))
        case None => Nil
      }
    }),
    Rule(List("Repository-Browse"), List("Repository"), { md =>
      val old = get(md, "Repository-Browse").get
      urlOf(old).flatMap(Vcs.guessRepoFromUrl) match {
        case Some(repo) =>
          List(Datum("Repository", UStr(repo), old.certainty, old.origin))
        case None => Nil
      }
    }),
    Rule(List("Repository"), List("Bug-Database"), { md =>
      val old = get(md, "Repository").get
      urlOf(old).flatMap(Forges.guessBugDatabaseUrlFromRepoUrl) match {
        case Some(b) =>
          List(Datum("Bug-Database", UStr(b.toString),
            Some(capped(old.certainty, Likely)), old.origin))
        case None => Nil
      }
    }),
    Rule(List("Bug-Database"), List("Bug-Submit"), { md =>
      val old = get(md, "Bug-Database").get
      urlOf(old).flatMap(Forges.bugSubmitUrlFromBugDatabaseUrl) match {
        case Some(b) =>
          List(Datum("Bug-Submit", UStr(b.toString), old.certainty, old.origin))
        case None => Nil
      }
    }),
    Rule(List("Bug-Submit"), List("Bug-Database"), { md =>
      val old = get(md, "Bug-Submit").get
      urlOf(old).flatMap(Forges.bugDatabaseUrlFromBugSubmitUrl) match {
        case Some(b) =>
          List(Datum("Bug-Database", UStr(b.toString), old.certainty, old.origin))
        case None => Nil
      }
    }),
    Rule(List("Download"), List("Repository"), { md =>
      val old = get(md, "Download").get
      urlOf(old).flatMap(Vcs.guessRepoFromUrl) match {
        case Some(repo) =>
          List(Datum("Repository", UStr(repo),
            Some(capped(old.certainty, Likely)), old.origin))
        case None => Nil
      }
    }),
    Rule(List("Repository"), List("Name"), { md =>
      val old = get(md, "Repository").get
      urlOf(old).flatMap(Vcs.guessRepoFromUrl) match {
        case Some(repo) =>
          UrlLite.parse(repo).flatMap(_.pathSegments.flatMap(_.lastOption)) match {
            case Some(last) =>
              val name = last.stripSuffix(".git")
              if (name.nonEmpty)
                List(Datum("Name", UStr(name),
                  Some(capped(old.certainty, Likely)), old.origin))
              else Nil
            case None => Nil
          }
        case None => Nil
      }
    }),
    Rule(List("Repository", "Security-MD"), List("Security-Contact"), { md =>
      val repo = get(md, "Repository").get
      val sec = get(md, "Security-MD").get
      urlOf(repo).flatMap(u =>
        Vcs.browseUrlFromRepoUrl(Vcs.VcsLocation(u, None, sec.str))) match {
        case Some(b) =>
          val c = math.min(Certainty.rank(repo.certainty), Certainty.rank(sec.certainty))
          List(Datum("Security-Contact", UStr(b.toString),
            if (c < 0) None else Some(c), repo.origin))
        case None => Nil
      }
    }),
    Rule(List("Maintainer"), List("Contact"), { md =>
      val m = get(md, "Maintainer").get
      m.value match {
        case UPerson(p) => List(Datum("Contact", UStr(p.show), m.certainty, m.origin))
        case _          => Nil
      }
    })
    // rule 14 (Homepage → homepage scrape) is network-only: inert offline
  )

  /** extrapolate_fields (src/extrapolate.rs:511-618) */
  def extrapolate(md: ArrayBuffer[Datum]): Unit = {
    var changed = true
    var iterations = 0
    while (changed) {
      changed = false
      iterations += 1
      if (iterations > 10)
        return // reference raises; single-subject data converges well before
      for (rule <- rules) {
        val fromValues = rule.fromFields.map(f => get(md, f))
        if (fromValues.forall(_.isDefined)) {
          val fromCertainty = fromValues.map(v => Certainty.rank(v.get.certainty)).min
          val oldToValues = rule.toFields.flatMap(f => get(md, f).map(f -> _)).toMap
          val allCovered = rule.toFields.forall(f =>
            oldToValues.get(f).exists(v => Certainty.rank(v.certainty) >= fromCertainty))
          if (!allCovered) {
            val extra = rule.cb(md)
            val changes = Merge.updateFromGuesses(md, extra)
            if (changes.nonEmpty) changed = true
          }
        }
      }
    }
  }

  /** fix_upstream_metadata (src/lib.rs:3790-3805) */
  def fixMetadata(md: ArrayBuffer[Datum]): Unit = {
    val repoIdx = md.indexWhere(_.field == "Repository")
    if (repoIdx >= 0) {
      md(repoIdx).str.foreach { r =>
        md(repoIdx) = md(repoIdx).copy(value = UStr(Vcs.sanitizeUrl(r)))
      }
    }
    val sumIdx = md.indexWhere(_.field == "Summary")
    if (sumIdx >= 0) {
      md(sumIdx).str.foreach { s0 =>
        val s1 = s0.indexOf(". ") match {
          case -1 => s0
          case i  => s0.substring(0, i)
        }
        val s2 = s1.reverse.dropWhile(_.isWhitespace).dropWhile(_ == '.').reverse
        md(sumIdx) = md(sumIdx).copy(value = UStr(s2))
      }
    }
  }
}
