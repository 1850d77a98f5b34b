package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.rdf._
import graft.tools.ShaclCli

/** CLI flag surface + the focus-node filter and use_shapes shape selection
  * (reference: validator.py:237-255 use_shapes, shape.py:670-684 focus). */
class ShaclCliSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val ex = "http://ex.org/"

  test("parseArgs: value flags are not positionals; sets and formats parse") {
    val a = ShaclCli.parseArgs(Array(
      "data.ttl", "shapes.ttl", "--inference", "owlrl", "--ttl",
      "--focus", s"${ex}a,${ex}b", "--use-shapes", s"${ex}S1",
      "-e", "ontology.ttl", "-m", "shsh.ttl", "--imports", "-o", "rep.txt"))
    assert(a.pos == List("data.ttl", "shapes.ttl"))
    assert(a.opts.inference == "owlrl")
    assert(a.fmt == "turtle")
    assert(a.opts.focusNodes.contains(Set(ex + "a", ex + "b")))
    assert(a.opts.useShapes.contains(Set(ex + "S1")))
    assert(a.ontFile.contains("ontology.ttl"))
    assert(a.metashacl.contains("shsh.ttl") && a.imports)
    assert(a.output.contains("rep.txt"))
    val b = ShaclCli.parseArgs(Array("d.ttl", "-f", "table"))
    assert(b.pos == List("d.ttl") && b.fmt == "table" && b.ontFile.isEmpty &&
      b.metashacl.isEmpty && !b.imports)
    intercept[IllegalArgumentException](ShaclCli.parseArgs(Array("d.ttl", "-f", "trix")))
  }

  test("nt and table report formats render") {
    val out = Validator.validateGraph(spark, data, Some(shapes))
    val nt = ShaclCli.ntriples(out.reportGraph)
    assert(nt.contains("<http://www.w3.org/ns/shacl#conforms>"))
    assert(nt.linesIterator.forall(l => l.isEmpty || l.endsWith(" .")))
    val tbl = ShaclCli.table(out)
    assert(tbl.contains("Conforms") && tbl.contains("false"))
    // columns clip at 25 chars like pySHACL's _col_widther
    assert(tbl.contains("Focus Node") && tbl.contains("MinCountConstraintCompone"))
  }

  val data = TurtleParser.parseGraph(
    s"""@prefix ex: <$ex> .
       |ex:a a ex:Person .
       |ex:b a ex:Person .
       |ex:c a ex:Person ; ex:age "x" .
       |""".stripMargin, "http://t/d")

  val shapes = TurtleParser.parseGraph(
    s"""@prefix ex: <$ex> .
       |@prefix sh: <http://www.w3.org/ns/shacl#> .
       |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
       |ex:S1 a sh:NodeShape ; sh:targetClass ex:Person ;
       |  sh:property [ sh:path ex:name ; sh:minCount 1 ] .
       |ex:S2 a sh:NodeShape ; sh:targetClass ex:Person ;
       |  sh:property [ sh:path ex:age ; sh:datatype xsd:integer ] .
       |""".stripMargin, "http://t/s")

  test("table renders the shape's actual severity, not a hardcoded Violation") {
    val warnShapes = TurtleParser.parseGraph(
      s"""@prefix ex: <$ex> .
         |@prefix sh: <http://www.w3.org/ns/shacl#> .
         |ex:W a sh:NodeShape ; sh:targetClass ex:Person ; sh:severity sh:Warning ;
         |  sh:property [ sh:path ex:name ; sh:minCount 1 ; sh:severity sh:Warning ] .
         |""".stripMargin, "http://t/w")
    val out = Validator.validateGraph(spark, data, Some(warnShapes))
    assert(!out.conforms && out.results.nonEmpty)
    val tbl = ShaclCli.table(out)
    assert(tbl.contains("Warning"))
    assert(!tbl.contains("| Violation"))
  }

  test("focus filter restricts validation to the named focus nodes") {
    val all = Validator.validateGraph(spark, data, Some(shapes))
    assert(all.results.map(_.focus).toSet ==
      Set(Iri(ex + "a"), Iri(ex + "b"), Iri(ex + "c"))) // minCount x3 + datatype on c
    assert(all.results.size == 4)
    val focused = Validator.validateGraph(spark, data, Some(shapes),
      ValidationOptions(focusNodes = Some(Set(ex + "b"))))
    assert(!focused.conforms)
    assert(focused.results.map(_.focus).toSet == Set(Iri(ex + "b")))
  }

  test("validateGraph frees its checkpointed RDDs (engine close)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Validator.validateGraph(spark, data, Some(shapes))
    assert(out.results.nonEmpty)
    // the engine localCheckpoints value-node frames + memoized sub-shapes;
    // close() (called by validateGraph) must return the session to baseline
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"validation leaked ${after - before} persistent RDDs")
  }

  test("use_shapes selects only the named shapes") {
    val onlyS2 = Validator.validateGraph(spark, data, Some(shapes),
      ValidationOptions(useShapes = Some(Set(ex + "S2"))))
    assert(!onlyS2.conforms)
    assert(onlyS2.results.size == 1)
    assert(onlyS2.results.head.focus == Iri(ex + "c"))
    assert(onlyS2.results.head.component == SH.DatatypeConstraintComponent)
    // selecting a shape with no violations conforms
    val none = Validator.validateGraph(spark, data, Some(shapes),
      ValidationOptions(useShapes = Some(Set(ex + "NoSuch"))))
    assert(none.conforms)
  }
}
