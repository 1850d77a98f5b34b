package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.rdf._

/** Targeted replays of issue files whose pytest bodies use parameterized
  * templates, `%`/`+` fixture composition, subprocess determinism checks or
  * programmatic graph construction that the generic extractor in
  * [[IssueCorpus]] cannot resolve. Fixture text is still pulled from the
  * reference tree at test time wherever it exists as an inline block; each
  * test reproduces the python test's own assertions. */
class IssueTargetedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/reference/test/issues"

  def blocksOf(name: String): Map[String, String] =
    IssueCorpus.parseFile(s"$dir/$name").blocks
  def fileText(name: String): String =
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/$name")), "UTF-8")

  test("test_076: SPARQLRules derive hasDepth 3 only when rules iterate") {
    val b = blocksOf("test_076.py")
    val data = TurtleParser.parseGraph(b("data_file_text"), "file:///d.ttl", "d")
    val shapes = TurtleParser.parseGraph(b("shacl_file_text"), "file:///s.ttl", "s")
    val base = RdfsInference.expand(spark, TriplesDF.fromMemGraph(spark, data))
    def hasDepth3(iterate: Boolean): Boolean = {
      val expanded = RulesEngine.expand(spark, base, shapes, iterateRules = iterate)
      val g = MemGraph(TriplesDF.collectTriples(expanded))
      g.contains(Iri("http://example.com#europeanWildcat"),
        Iri("http://example.com/issue/076#hasDepth"), Lit("3", XSD.integer))
    }
    assert(hasDepth3(iterate = true))
    assert(!hasDepth3(iterate = false))
  }

  test("test_116: xsd:string vs rdf:langString datatype distinction (4 cases)") {
    val b = blocksOf("test_116.py")
    val text = fileText("test_116.py")
    val suffix = """data_file_(\w+) = data_file_base \+ \"\"\"(.*?)\"\"\"""".r
      .findAllMatchIn(text).map(m => m.group(1) -> m.group(2)).toMap
    val shapesStr = b("shacl_file_base").replace("%s", "xsd:string")
    val shapesLang = b("shacl_file_base").replace("%s", "rdf:langString")
    def run(shacl: String, dataSuffix: String): Boolean =
      Validator.validateGraph(spark,
        TurtleParser.parseGraph(b("data_file_base") + dataSuffix, "file:///d.ttl", "d"),
        Some(TurtleParser.parseGraph(shacl, "file:///s.ttl", "s"))).conforms
    assert(!run(shapesStr, suffix("plain_literal"))) // test_116_1
    assert(run(shapesStr, suffix("string"))) // test_116_2
    assert(run(shapesLang, suffix("plain_literal"))) // test_116_3
    assert(!run(shapesLang, suffix("string"))) // test_116_4
  }

  test("test_126: allowed severities flip conformance; both shapes still report") {
    val b = blocksOf("test_126.py")
    val g = TurtleParser.parseGraph(b("mixed_file_text"), "file:///m.ttl", "m")
    val ex = "http://example.org/ns#"
    def run(opts: ValidationOptions): Validator.Outcome =
      Validator.validateGraph(spark, g, None, opts)
    for ((opts, expectConforms) <- Seq(
        (ValidationOptions(), false),
        (ValidationOptions(allowInfos = true), false),
        (ValidationOptions(allowWarnings = true), true))) {
      val out = run(opts)
      assert(out.conforms == expectConforms, s"opts=$opts")
      assert(out.reportGraph.subjects(SH.sourceShape, Iri(ex + "myProperty-datatype")).nonEmpty)
      assert(out.reportGraph.subjects(SH.sourceShape, Iri(ex + "myProperty-maxLength")).nonEmpty)
    }
  }

  test("test_141: numeric-heavy fixtures validate without error (turtle + json-ld)") {
    val b = blocksOf("test_141.py")
    // test_141(): turtle pair, inference=rdfs — must complete
    val out = Validator.validateGraph(spark,
      TurtleParser.parseGraph(b("data_file"), "file:///d.ttl", "d"),
      Some(TurtleParser.parseGraph(b("shacl_file"), "file:///s.ttl", "s")),
      ValidationOptions(inference = "rdfs"))
    assert(out.reportText.nonEmpty)
    // test_141_worst_case(): json-ld pair — must complete
    val out2 = Validator.validateGraph(spark,
      JsonLd.parseGraph(b("my_json"), bnodePrefix = "d"),
      Some(JsonLd.parseGraph(b("shapes_json"), bnodePrefix = "s")))
    assert(out2.reportText.nonEmpty)
  }

  test("test_142: validation with an ont_graph completes") {
    val b = blocksOf("test_142.py")
    val out = Validator.validateGraph(spark,
      TurtleParser.parseGraph(b("data_file"), "file:///d.ttl", "d"),
      Some(TurtleParser.parseGraph(b("shacl_file"), "file:///s.ttl", "s")),
      ontGraph = Some(TurtleParser.parseGraph(b("ont_file"), "file:///o.ttl", "o")))
    assert(out.reportText.nonEmpty)
  }

  test("test_160: targetSubjectsOf vs inversePath report thing-b-1 as focus/value") {
    val b = blocksOf("test_160.py")
    val data = TurtleParser.parseGraph(b("data_ontology_file_text"), "file:///d.ttl", "d")
    val expectNode = Iri("http://example.org/kb/thing-b-1")
    def run(shaclVar: String, prop: Iri): Unit = {
      val out = Validator.validateGraph(spark, data,
        Some(TurtleParser.parseGraph(b(shaclVar), "file:///s.ttl", "s")))
      assert(!out.conforms, shaclVar)
      val computed = out.reportGraph.subjectObjects(prop).map(_._2).toSet
      assert(computed == Set[Node](expectNode), s"$shaclVar $prop -> $computed")
    }
    run("shacl_file_1_text", SH.focusNode)
    run("shacl_file_2_text", SH.value)
  }

  test("test_298: use_shapes selects PersonShape+NameProperty; conforms") {
    // the python test builds the graphs programmatically via JSON-LD dicts;
    // this is the same content as Turtle
    val ex = "http://example.org/"
    val shapes = TurtleParser.parseGraph(
      s"""@prefix ex: <$ex> .
         |@prefix sh: <http://www.w3.org/ns/shacl#> .
         |ex:PersonShape a sh:NodeShape ;
         |  sh:targetClass ex:Person ;
         |  sh:property ex:NameProperty, ex:AgeProperty .
         |ex:NameProperty sh:path ex:name ; sh:minCount 1 .
         |ex:AgeProperty sh:path ex:age ; sh:minInclusive 18 .
         |""".stripMargin, "file:///s.ttl", "s")
    val data = TurtleParser.parseGraph(
      s"""@prefix ex: <$ex> .
         |ex:person1 a ex:Person ; ex:name "John Doe" ; ex:age 25 .
         |""".stripMargin, "file:///d.ttl", "d")
    val out = Validator.validateGraph(spark, data, Some(shapes),
      ValidationOptions(useShapes = Some(Set(ex + "PersonShape", ex + "NameProperty"))))
    assert(out.conforms)
    assert(out.reportText.contains("Validation Report"))
  }

  test("test_304: report text is deterministic across runs") {
    val b = blocksOf("test_304.py")
    def once(): String = Validator.validateGraph(spark,
      TurtleParser.parseGraph(b("DATA_TTL"), "file:///d.ttl", "d"),
      Some(TurtleParser.parseGraph(b("SHAPES_TTL"), "file:///s.ttl", "s"))).reportText
    val a = once(); val c = once()
    assert(a.contains("Results ("))
    assert(a == c)
  }
}
