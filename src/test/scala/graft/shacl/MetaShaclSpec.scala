package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.rdf._

/** Meta-SHACL: shapes graphs validate against the reference's bundled
  * shacl-shacl.ttl (run through this engine — closure paths, xone, node
  * shapes over the shapes metamodel are a real stress test). */
class MetaShaclSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val shsh = "/root/reference/pyshacl/assets/shacl-shacl.ttl"

  test("a well-formed shapes graph conforms to shacl-shacl") {
    val sg = TurtleParser.parseGraph(
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |@prefix ex: <http://ex.org/> .
        |ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        |  sh:property [ sh:path ex:p ; sh:minCount 1 ; sh:datatype xsd:string ] ;
        |  sh:xone ( [ sh:class ex:A ] [ sh:class ex:B ] ) .
        |""".stripMargin, "http://test/")
    MetaShacl.check(spark, sg, shsh) // must not throw
  }

  test("a malformed shapes graph is rejected with the reference's error") {
    // sh:nodeKind with a value outside the enumeration violates
    // shsh:NodeKindShape (sh:in); literal sh:path violates shsh:PathShape
    val bad = TurtleParser.parseGraph(
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |@prefix ex: <http://ex.org/> .
        |ex:S a sh:NodeShape ; sh:targetClass ex:T ;
        |  sh:nodeKind ex:NotAKind .
        |""".stripMargin, "http://test/")
    val e = intercept[ReportableError](MetaShacl.check(spark, bad, shsh))
    assert(e.getMessage.contains("MetaSHACL"))
  }

  test("the KG pipeline's own shapes pass meta-SHACL") {
    val sg = TurtleParser.parseGraph(graft.kg.KgPipeline.shapesTtl, "http://graft.dev/shapes")
    MetaShacl.check(spark, sg, shsh)
  }
}
