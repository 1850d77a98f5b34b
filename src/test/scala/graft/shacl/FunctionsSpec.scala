package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.rdf._

/** sh:SPARQLFunction bodies beyond the compiled single-BIND subset: full
  * SELECT bodies with real WHERE clauses and sh:ask bodies, evaluated
  * set-oriented through SparqlFrame (the reference evaluates each call via
  * rdflib, shacl_function.py:283-326). */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val ex = "http://ex.org/"

  val prelude =
    s"""@prefix ex: <$ex> .
       |@prefix sh: <http://www.w3.org/ns/shacl#> .
       |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
       |@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
       |""".stripMargin

  val data = prelude +
    """ex:alice a ex:Person ; ex:parent ex:p1 .
      |ex:p1 ex:name "Good" .
      |ex:bob a ex:Person ; ex:parent ex:p2 .
      |ex:p2 ex:name "Bad" .
      |ex:carol a ex:Person .
      |""".stripMargin

  def validate(shapesTtl: String): Validator.Outcome =
    Validator.validateGraph(spark,
      TurtleParser.parseGraph(data, "http://test/d"),
      Some(TurtleParser.parseGraph(prelude + shapesTtl, "http://test/s")))

  test("SELECT function body with a BGP WHERE clause evaluates per call") {
    val out = validate(
      """ex:parentName a sh:SPARQLFunction ;
        |  sh:parameter [ sh:path ex:person ] ;
        |  sh:returnType xsd:string ;
        |  sh:select "SELECT ?result WHERE { $person ex:parent ?p . ?p ex:name ?result . }" .
        |ex:PersonShape a sh:NodeShape ;
        |  sh:targetClass ex:Person ;
        |  sh:sparql [
        |    sh:message "parent is Bad" ;
        |    sh:select "SELECT $this WHERE { FILTER (ex:parentName($this) = \"Bad\") }" ;
        |  ] .
        |""".stripMargin)
    assert(!out.conforms)
    assert(out.results.size == 1)
    assert(out.results.head.focus == Iri(ex + "bob"))
  }

  test("sh:ask function body: boolean per argument tuple, false on no match") {
    val out = validate(
      """ex:hasParent a sh:SPARQLFunction ;
        |  sh:parameter [ sh:path ex:person ] ;
        |  sh:returnType xsd:boolean ;
        |  sh:ask "ASK { $person ex:parent ?p . }" .
        |ex:PersonShape a sh:NodeShape ;
        |  sh:targetClass ex:Person ;
        |  sh:sparql [
        |    sh:message "orphan" ;
        |    sh:select "SELECT $this WHERE { FILTER (!ex:hasParent($this)) }" ;
        |  ] .
        |""".stripMargin)
    assert(!out.conforms)
    assert(out.results.map(_.focus).toSet == Set(Iri(ex + "carol")))
  }

  test("full-bodied function in a TripleRule: one result per argument tuple") {
    val dataG = TurtleParser.parseGraph(prelude +
      """ex:kid a ex:Person ; ex:parent ex:p1, ex:p2 .
        |ex:p1 ex:name "N1" . ex:p2 ex:name "N2" .
        |""".stripMargin, "http://test/d2")
    val shapesG = TurtleParser.parseGraph(prelude +
      """ex:nameOf a sh:SPARQLFunction ;
        |  sh:parameter [ sh:path ex:person ] ;
        |  sh:select "SELECT ?result WHERE { $person ex:name ?result . }" .
        |ex:R a sh:NodeShape ; sh:targetClass ex:Person ;
        |  sh:rule [ a sh:TripleRule ;
        |    sh:subject sh:this ;
        |    sh:predicate ex:alias ;
        |    sh:object [ ex:nameOf ( [ sh:path ex:parent ] ) ] ;
        |  ] .
        |""".stripMargin, "http://test/s2")
    val expanded = RulesEngine.expand(spark,
      TriplesDF.fromMemGraph(spark, dataG), shapesG)
    val g = MemGraph(TriplesDF.collectTriples(expanded))
    // two parents -> two argument tuples -> two derived aliases (a
    // per-focus collapse would emit only one, nondeterministically)
    assert(g.contains(Iri(ex + "kid"), Iri(ex + "alias"), Lit("N1")))
    assert(g.contains(Iri(ex + "kid"), Iri(ex + "alias"), Lit("N2")))
  }

  test("full-bodied function inside BIND feeds downstream comparison") {
    val out = validate(
      """ex:parentName a sh:SPARQLFunction ;
        |  sh:parameter [ sh:path ex:person ] ;
        |  sh:select "SELECT ?result WHERE { $person ex:parent ?p . ?p ex:name ?result . }" .
        |ex:PersonShape a sh:NodeShape ;
        |  sh:targetClass ex:Person ;
        |  sh:sparql [
        |    sh:message "bad parent via BIND" ;
        |    sh:select "SELECT $this WHERE { BIND (ex:parentName($this) AS ?pn) FILTER (STRLEN(?pn) = 3) }" ;
        |  ] .
        |""".stripMargin)
    assert(!out.conforms)
    assert(out.results.map(_.focus).toSet == Set(Iri(ex + "bob")))
  }
}
