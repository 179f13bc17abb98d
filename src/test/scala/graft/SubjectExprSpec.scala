package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.spark.{KgEngine, SynthPages}

/** The Catalyst expression forms of splitSubject / isCandidate
  * (KgEngine.subjCol / candidateUrlCol) must agree with the Scala functions
  * on every url — they feed the resume filter and KgJob's lineage counts, so
  * a silent divergence would corrupt resume bucketing at crawl scale. This
  * differential test sweeps the candidate-pattern space plus adversarial
  * edges (trailing slashes, empty segments, missing schemes, case, '~').
  */
class SubjectExprSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val relpaths: Seq[String] = Seq(
    // static registry names + near-misses
    "debian/watch", "debian/control", "debian/changelog", "debian/rules",
    "PKG-INFO", "package.json", "composer.json", "package.xml", "package.yaml",
    "dist.ini", "debian/copyright", "META.json", "MYMETA.json", "META.yml",
    "MYMETA.yml", "configure", "DESCRIPTION", "Cargo.toml", "pom.xml",
    ".git/config", "debian/get-orig-source.sh", "pyproject.toml", "setup.cfg",
    "go.mod", "Makefile.PL", "wscript", "AUTHORS", "INSTALL", "pubspec.yaml",
    "pubspec.yml", "meson.build", "metadata.json", ".travis.yml",
    "package.json5", "xpackage.json", "sub/package.json", "cargo.toml",
    // security
    "SECURITY.md", ".github/SECURITY.md", "docs/SECURITY.md", "sub/SECURITY.md",
    "security.md",
    // debian special
    "debian/source/format", "debian/patches/fix.patch", "debian/patches/fix.diff",
    "debian/patches/sub/fix.patch", "debian/patches/", "debian/source/format/x",
    // egg-info / dist-info / R DESCRIPTION
    "foo.egg-info/PKG-INFO", ".egg-info/PKG-INFO", "foo.egg-info/PKG-INFO/",
    "a/foo.egg-info/PKG-INFO", "foo.egg-infox/PKG-INFO", "foo.egg-info/PKG-INFO2",
    "bar.dist-info/METADATA", "bar.dist-info/METADATA/", "bar.distinfo/METADATA",
    "pkg/DESCRIPTION", "/DESCRIPTION", "pkg/DESCRIPTION/", "a/b/DESCRIPTION",
    "pkg/DESCRIPTIONS",
    // top-level single-file guessers
    "setup.py", "sub/setup.py", "foo.gemspec", "foo.doap", "doap_XML_foo.xml",
    "other.xml", "foo.metainfo.xml", "foo.cabal", "foo.nuspec", "foo.opam",
    "a/foo.gemspec", "foo.gemspecx",
    // README family
    "README", "README.md", "readme.rst", "ReadMe.txt", "README.html",
    "README.pdf", "README.xml", "README.md~", "READMEextra", "HACKING",
    "CONTRIBUTING.md", "contributing.html", ".readme", "README.",
    "README.tar.html", "sub/README.md",
    // misc
    "", "index.html", "src/main.rs", "a//b", "a/b/c/d")

  private val urls: Seq[String] =
    relpaths.map(r => s"https://replay.invalid/proj1/$r") ++ Seq(
      // subject-less / degenerate urls
      "https://replay.invalid", "https://replay.invalid/", "https://replay.invalid/p",
      "nohost", "http//x/y/z", "://host/p/README", "a/b://c/d/README.md",
      "https:///p/README", "https://h//README", "scheme://h/p/",
      "https://h/p/READ ME", "https://h/p/x://y/")

  test("subjCol and candidateUrlCol agree with the Scala url algebra on every vector") {
    import spark.implicits._
    val df = urls.toDF("url")
      .withColumn("subj_expr", KgEngine.subjCol(F.col("url")))
      .withColumn("cand_expr", KgEngine.candidateUrlCol(F.col("url")))
    val rows = df.collect()
    assert(rows.length == urls.length)
    rows.foreach { row =>
      val url = row.getString(0)
      val expectedSubj = KgEngine.splitSubject(url).map(_._1).getOrElse("")
      val expectedCand = KgEngine.splitSubject(url).exists(sr => KgEngine.isCandidate(sr._2))
      assert(row.getString(1) == expectedSubj,
        s"subjCol($url) = ${row.getString(1)}, scala = $expectedSubj")
      assert(row.getBoolean(2) == expectedCand,
        s"candidateUrlCol($url) = ${row.getBoolean(2)}, scala = $expectedCand")
    }
  }

  test("resume filter and lineage-style plans contain no ScalaUDF") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where("doc_id < 32")
    val pages = SynthPages.fromDocuments(docs)
    val resumePlan = KgEngine.resumeFilter(pages, Seq(0, 1), 8)
      .queryExecution.executedPlan.toString
    assert(!resumePlan.contains("ScalaUDF"), s"resume plan has a UDF:\n$resumePlan")
    val lineageStyle = pages.select(F.col("url"))
      .withColumn("bucket", KgEngine.bucketOf(KgEngine.subjCol(F.col("url")), 8))
      .groupBy("bucket")
      .agg(F.count(F.lit(1)).as("input_rows"),
        F.sum(KgEngine.candidateUrlCol(F.col("url")).cast("long")).as("emitted"))
    val linPlan = lineageStyle.queryExecution.executedPlan.toString
    assert(!linPlan.contains("ScalaUDF"), s"lineage plan has a UDF:\n$linPlan")
    // and the counts must match the Scala-side truth
    val expected = pages.select("url").collect().map(_.getString(0))
      .count(u => KgEngine.splitSubject(u).exists(sr => KgEngine.isCandidate(sr._2)))
    val got = lineageStyle.agg(F.sum("emitted")).first.getLong(0)
    assert(got == expected)
  }
}
