package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.spark.{KgEngine, SynthPages, TrainingOps}

/** Spark-side smoke and equivalence tests on a local session. */
class SparkSmokeSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("Catalyst canonicalize == local first-wins certainty merge") {
    import spark.implicits._
    val pages = SynthPages.fromDocuments(docs.where("doc_id < 50"))
    val raw = KgEngine.extractRaw(spark, pages)
    val viaAgg = KgEngine.canonicalize(raw)
      .select("subj", "pred", "obj", "certainty")
      .as[(String, String, String, Int)].collect().toSet

    // local re-merge per subject from the same raw rows
    val rawRows = raw.collect()
    val local = rawRows.groupBy(_.subj).flatMap { case (subj, rows) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[graft.core.Datum]
      graft.core.Merge.updateFromGuesses(buf,
        rows.sortBy(r => (r.guesser_rank, r.seq)).iterator.map(r =>
          graft.core.Datum(r.pred, graft.core.UStr(r.obj),
            if (r.certainty < 0) None else Some(r.certainty), None)))
      buf.map(d => (subj, d.field, d.str.getOrElse(""), d.certainty.getOrElse(-1)))
    }.toSet
    assert(viaAgg == local)
  }

  test("pre-extract variant == grouped variant on the 8-flavor synth corpus") {
    // flavor 4 routes debian sibling files through the deferred ("x") path;
    // the two engines must agree on every flavor, not just reference fixtures
    import spark.implicits._
    val pages = SynthPages.fromDocuments(docs.where("doc_id < 64"))
    def key(t: graft.spark.Model.CanonTriple) =
      (t.subj, t.pred, t.obj, t.certainty, t.origin)
    val grouped = KgEngine.extractCanonical(spark, pages).collect().map(key).toSet
    val pre = KgEngine.extractCanonicalPreExtract(spark, pages).collect().map(key).toSet
    assert(pre == grouped)
  }

  test("resume buckets partition subjects disjointly and completely") {
    val pages = SynthPages.fromDocuments(docs.where("doc_id < 100"))
    val all = KgEngine.extractCanonical(spark, pages).count()
    val part1 = KgEngine.extractCanonical(spark,
      KgEngine.resumeFilter(pages, Seq(0, 1, 2, 3), 8)).count()
    val part2 = KgEngine.extractCanonical(spark,
      KgEngine.resumeFilter(pages, Seq(4, 5, 6, 7), 8)).count()
    assert(part1 + part2 == all)
    assert(part1 > 0 && part2 > 0)
  }

  test("broadcast linking and salted shuffle linking == plain join") {
    import spark.implicits._
    val mentions = Seq(("s1", "spark"), ("s2", "join"), ("s2", "spark"), ("s3", "merge"))
      .toDF("subj", "term")
    val registry = Seq(("spark", "e1"), ("join", "e2")).toDF("term", "entity_id")
    val plain = mentions.join(registry, "term")
      .select("subj", "term", "entity_id")
      .as[(String, String, String)].collect().toSet
    val broadcasted = KgEngine.linkEntities(mentions, registry)
      .select("subj", "term", "entity_id")
      .as[(String, String, String)].collect().toSet
    assert(broadcasted == plain)
    val shuffled = KgEngine.linkEntitiesShuffleSalted(mentions, registry, salt = 4)
      .select("subj", "term", "entity_id")
      .as[(String, String, String)].collect().toSet
    assert(shuffled == plain)
    // the salted path must actually shuffle — a broadcast there would make
    // the salt a no-op (round-1 verdict)
    val plan = KgEngine.linkEntitiesShuffleSalted(mentions, registry, salt = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), plan)
  }

  test("lineage accounts for every input page") {
    val pages = SynthPages.fromDocuments(docs.where("doc_id < 100"))
    val total = pages.count()
    val rows = KgEngine.lineage(spark, pages).collect()
    assert(rows.map(_.input_rows).sum == total)
    assert(rows.map(_.emitted).sum == total) // both synth artifacts are candidates
  }

  test("environment guesser seeds a Certain Repository") {
    val (md, _) = graft.pipeline.Summarize.summarize(
      Map.empty, "proj", envRepositoryUrl = Some("https://github.com/x/y"))
    val repo = md.find(_.field == "Repository")
    assert(repo.exists(_.str.contains("https://github.com/x/y.git")))
    assert(repo.exists(_.certainty.contains(graft.core.Certainty.Certain)))
  }

  test("yaml sink round-trips through snakeyaml") {
    import graft.core._
    val md = List(
      Datum("Author", UPersons(List(
        Person(Some("Jack Moore"), Some("hello@jacklmoore.com"), Some("http://x")),
        Person(Some("Other"), None, None))), Some(3), None),
      Datum("Description", UStr("Line one.\nLine two.\n"), Some(1), None),
      Datum("Keywords", UStrings(List("a", "b: c", "3")), Some(3), None),
      Datum("Maintainer", UPerson(Person(Some("M"), Some("m@x.org"), None)), Some(3), None),
      Datum("Name", UStr("proj"), Some(3), None),
      Datum("Version", UStr("1.0"), Some(3), None))
    val yaml = graft.pipeline.Sinks.toYaml(md)
    val loader = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(
        new org.yaml.snakeyaml.LoaderOptions()) {
        this.yamlConstructors.put(new org.yaml.snakeyaml.nodes.Tag("!Person"),
          new org.yaml.snakeyaml.constructor.AbstractConstruct {
            override def construct(node: org.yaml.snakeyaml.nodes.Node): AnyRef =
              constructMapping(node.asInstanceOf[org.yaml.snakeyaml.nodes.MappingNode])
          })
      })
    val parsed = loader.load[java.util.Map[String, Object]](yaml)
    assert(parsed.get("Name") == "proj")
    assert(parsed.get("Version") == "1.0")
    assert(parsed.get("Description") == "Line one.\nLine two.\n")
    val kw = parsed.get("Keywords").asInstanceOf[java.util.List[Object]]
    assert(kw.get(1) == "b: c" && kw.get(2) == "3")
    val authors = parsed.get("Author").asInstanceOf[java.util.List[Object]]
    assert(authors.size == 2)
    assert(authors.get(0).asInstanceOf[java.util.Map[String, Object]].get("email")
      == "hello@jacklmoore.com")
    assert(graft.pipeline.Sinks.toCodemeta(md).contains("\"name\" : \"proj\""))
  }

  test("nodes/edges materialization") {
    val pages = SynthPages.fromDocuments(docs.where("doc_id < 20"))
    val canon = KgEngine.extractCanonical(spark, pages)
    val e = KgEngine.edges(canon)
    val n = KgEngine.nodes(canon)
    // url-typed preds per flavor (doc_id % 8): 2 full cycles + flavors 0-3
    assert(e.count() == 2 * (5 + 5 + 6 + 5 + 5 + 5 + 1 + 5) + (5 + 5 + 6 + 5))
    assert(n.count() > 20)
  }

  test("sanitize_url is idempotent (property)") {
    import org.scalacheck.Gen
    val hostGen = Gen.oneOf("github.com", "gitlab.com", "salsa.debian.org",
      "example.com", "git.sv.gnu.org", "code.launchpad.net")
    val schemeGen = Gen.oneOf("http", "https", "git", "ssh", "git+https", "lp")
    // non-empty segments: the reference's fix_double_slash strips one
    // leading slash per pass, so degenerate `///` inputs are legitimately
    // non-idempotent in the reference too (vcs.rs:1165-1179)
    val segGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
    val pathGen = Gen.listOfN(2, segGen).map(_.mkString("/"))
    val urlGen = for {
      s <- schemeGen; h <- hostGen; p <- pathGen
      suffix <- Gen.oneOf("", ".git", "/tree/main", "/issues")
    } yield s"$s://$h/$p$suffix"
    val prop = org.scalacheck.Prop.forAll(urlGen) { u =>
      val once = graft.urls.Vcs.sanitizeUrl(u)
      graft.urls.Vcs.sanitizeUrl(once) == once
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }
}
