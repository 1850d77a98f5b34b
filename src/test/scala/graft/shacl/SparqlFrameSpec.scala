package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.rdf._

/** Direct SparqlFrame coverage for algebra the conformance corpora don't
  * exercise: OPTIONAL (left join + unbound vars), UNION with differing
  * variable sets, BIND, and bound()/COALESCE over maybe-null columns. */
class SparqlFrameSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val ex = "http://ex.org/"

  val data =
    s"""@prefix ex: <$ex> .
       |ex:a ex:name "A" ; ex:nick "Ace" .
       |ex:b ex:name "B" .
       |ex:c ex:alias "C-alias" .
       |""".stripMargin

  def run(q: String): Seq[Map[String, Node]] = {
    val T = TriplesDF.fromMemGraph(spark, TurtleParser.parseGraph(data, "http://test/"))
    val frame = new SparqlFrame(spark, T, PathEval.step(T, _, _), Map.empty, None)
    val sel = Sparql.parseQuery(q, Map("ex" -> ex)).asInstanceOf[Sparql.SqSelect]
    val res = frame.evalSelect(sel, frame.unitSeed)
    frame.collect(res, res.vars.filterNot(_.startsWith("__")).toSeq.sorted)
  }

  test("OPTIONAL leaves unmatched rows with unbound vars; COALESCE fills") {
    val rows = run(
      """SELECT ?s ?nick (COALESCE(?nick, "none") AS ?label)
        |WHERE { ?s ex:name ?n . OPTIONAL { ?s ex:nick ?nick . } }
        |ORDER BY ?s""".stripMargin)
    assert(rows.size == 2)
    val a = rows.find(_("s") == Iri(ex + "a")).get
    val b = rows.find(_("s") == Iri(ex + "b")).get
    assert(a("nick") == Lit("Ace") && a("label") == Lit("Ace"))
    assert(!b.contains("nick")) // unbound
    assert(b("label") == Lit("none"))
  }

  test("FILTER bound() over an OPTIONAL var") {
    val rows = run(
      """SELECT ?s WHERE { ?s ex:name ?n . OPTIONAL { ?s ex:nick ?nick . }
        |FILTER (!bound(?nick)) }""".stripMargin)
    assert(rows.map(_("s")) == Seq(Iri(ex + "b")))
  }

  test("UNION branches with different variable sets align on null") {
    val rows = run(
      """SELECT ?s ?n ?al WHERE {
        |  { ?s ex:name ?n . } UNION { ?s ex:alias ?al . }
        |}""".stripMargin)
    assert(rows.size == 3)
    val c = rows.find(_("s") == Iri(ex + "c")).get
    assert(c("al") == Lit("C-alias") && !c.contains("n"))
    assert(rows.count(_.contains("n")) == 2)
  }

  test("BIND introduces a computed var usable downstream") {
    val rows = run(
      """SELECT ?s ?len WHERE {
        |  ?s ex:name ?n . BIND (STRLEN(?n) AS ?len) . FILTER (?len = 1)
        |}""".stripMargin)
    assert(rows.size == 2 && rows.forall(_("len") == Lit("1", XSD.integer)))
  }
}
