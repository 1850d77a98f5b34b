package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.rdf._

class RulesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def expandTtl(ttl: String, iterate: Boolean = false, rdfs: Boolean = false): MemGraph = {
    val g = TurtleParser.parseGraph(ttl, "http://test/")
    var df = TriplesDF.fromMemGraph(spark, g)
    if (rdfs) df = RdfsInference.expand(spark, df)
    val out = RulesEngine.expand(spark, df, g, iterateRules = iterate)
    MemGraph(TriplesDF.collectTriples(out))
  }

  val prefixes =
    """@prefix sh: <http://www.w3.org/ns/shacl#> .
      |@prefix ex: <http://ex.org/> .
      |@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |""".stripMargin

  test("TripleRule: constant + path expressions with condition") {
    val g = expandTtl(prefixes +
      """ex:a a ex:Person ; ex:first "Jo" .
        |ex:b a ex:Person .
        |ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
        |  sh:rule [ a sh:TripleRule ;
        |    sh:subject sh:this ; sh:predicate ex:name ;
        |    sh:object [ sh:path ex:first ] ;
        |    sh:condition ex:HasFirst ] .
        |ex:HasFirst a sh:NodeShape ;
        |  sh:property [ sh:path ex:first ; sh:minCount 1 ] .
        |""".stripMargin)
    assert(g.contains(Iri("http://ex.org/a"), Iri("http://ex.org/name"), Lit("Jo")))
    // ex:b fails the condition -> no triple
    assert(g.objects(Iri("http://ex.org/b"), Iri("http://ex.org/name")).isEmpty)
  }

  test("TripleRule: union and intersection expressions") {
    val g = expandTtl(prefixes +
      """ex:x a ex:T ; ex:p ex:v1 ; ex:q ex:v1 , ex:v2 .
        |ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        |  sh:rule [ a sh:TripleRule ;
        |    sh:subject sh:this ; sh:predicate ex:both ;
        |    sh:object [ sh:intersection ( [ sh:path ex:p ] [ sh:path ex:q ] ) ] ] ;
        |  sh:rule [ a sh:TripleRule ;
        |    sh:subject sh:this ; sh:predicate ex:any ;
        |    sh:object [ sh:union ( [ sh:path ex:p ] [ sh:path ex:q ] ) ] ] .
        |""".stripMargin)
    val x = Iri("http://ex.org/x")
    assert(g.objects(x, Iri("http://ex.org/both")).toSet == Set(Iri("http://ex.org/v1")))
    assert(g.objects(x, Iri("http://ex.org/any")).toSet ==
      Set(Iri("http://ex.org/v1"), Iri("http://ex.org/v2")))
  }

  test("TripleRule: iterate to fixpoint computes transitive closure") {
    val g = expandTtl(prefixes +
      """ex:a ex:next ex:b . ex:b ex:next ex:c . ex:c ex:next ex:d .
        |ex:S a sh:NodeShape ; sh:targetSubjectsOf ex:next ;
        |  sh:rule [ a sh:TripleRule ;
        |    sh:subject sh:this ; sh:predicate ex:reach ;
        |    sh:object [ sh:path ( ex:next [ sh:zeroOrOnePath ex:reach ] ) ] ] .
        |""".stripMargin, iterate = true)
    val a = Iri("http://ex.org/a")
    assert(g.objects(a, Iri("http://ex.org/reach")).toSet ==
      Set(Iri("http://ex.org/b"), Iri("http://ex.org/c"), Iri("http://ex.org/d")))
  }

  for ((sub, name) <- Seq(
    ("triple", "schema2person"), ("triple", "rectangle"), ("triple", "square"),
    ("triple", "functions-permutations"),
    ("sparql", "rectangle"), ("sparql", "classify-square")))
  test(s"DASH InferencingTestCase: rules/$sub/$name") {
    val file = s"/root/reference/test/resources/dash_tests/rules/$sub/$name.test.ttl"
    val g = TurtleParser.parseFile(file)
    var df = TriplesDF.fromMemGraph(spark, g)
    df = RdfsInference.expand(spark, df)
    val out = RulesEngine.expand(spark, df, g)
    val expanded = MemGraph(TriplesDF.collectTriples(out))
    val DASH = "http://datashapes.org/dash#"
    val cases = g.subjects(RDF.ty, Iri(DASH + "InferencingTestCase")).toList
    assert(cases.nonEmpty)
    val failures = cases.flatMap { c =>
      g.objects(c, Iri(DASH + "expectedResult")).toList.flatMap { er =>
        val s = g.value(er, RDF.subject).get
        val p = g.value(er, RDF.predicate).get.asInstanceOf[Iri]
        val o = g.value(er, RDF.objectP).get
        val found = o match {
          case l: Lit => expanded.objects(s, p).exists {
            case l2: Lit => l2 == l || LitCompare.valueEq(l, l2)
            case _ => false
          }
          case b: BNode => expanded.objects(s, p).exists {
            case b2: BNode => ReportCompare.compareBlank(g, b, expanded, b2)
            case _ => false
          }
          case other => expanded.contains(s, p, other)
        }
        if (found) None else Some(s"missing: $s $p $o")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
