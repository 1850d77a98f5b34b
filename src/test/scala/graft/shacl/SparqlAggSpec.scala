package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.rdf._

/** SPARQL aggregates (GROUP BY / HAVING / COUNT / SUM / MIN / MAX) through
  * the DataFrame frontend — the most common real-world sh:sparql idiom:
  * `GROUP BY $this HAVING (COUNT(?x) > n)`. */
class SparqlAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val ex = "http://ex.org/"

  def triples(ttl: String): org.apache.spark.sql.DataFrame =
    TriplesDF.fromMemGraph(spark, TurtleParser.parseGraph(ttl, "http://test/"))

  val data =
    s"""@prefix ex: <$ex> .
       |ex:a ex:score 1 ; ex:score 2 ; ex:score 3 .
       |ex:b ex:score 10 .
       |ex:c ex:score 4 ; ex:score 5 .
       |""".stripMargin

  def run(q: String, seedless: Boolean = true): Seq[Map[String, Node]] = {
    val T = triples(data)
    val frame = new SparqlFrame(spark, T, PathEval.step(T, _, _), Map.empty, None)
    val sel = Sparql.parseQuery(q, Map("ex" -> ex)).asInstanceOf[Sparql.SqSelect]
    val res = frame.evalSelect(sel, frame.unitSeed)
    frame.collect(res, res.vars.filterNot(_.startsWith("__")).toSeq.sorted)
  }

  test("COUNT with GROUP BY and HAVING") {
    val rows = run(
      """SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s ex:score ?v . }
        |GROUP BY ?s HAVING (COUNT(?v) >= 2) ORDER BY ?s""".stripMargin)
    assert(rows.map(r => (r("s"), r("n"))) == Seq(
      (Iri(ex + "a"), Lit("3", XSD.integer)),
      (Iri(ex + "c"), Lit("2", XSD.integer))))
  }

  test("SUM / MIN / MAX / COUNT DISTINCT") {
    val rows = run(
      """SELECT (SUM(?v) AS ?total) (MIN(?v) AS ?lo) (MAX(?v) AS ?hi)
        |       (COUNT(DISTINCT ?v) AS ?kinds)
        |WHERE { ?s ex:score ?v . }""".stripMargin)
    assert(rows.size == 1)
    val r = rows.head
    assert(r("total") == Lit("25", XSD.integer))
    assert(r("lo") == Lit("1", XSD.integer))
    assert(r("hi") == Lit("10", XSD.integer))
    assert(r("kinds") == Lit("6", XSD.integer)) // 1,2,3,4,5,10
  }

  test("sh:sparql constraint with GROUP BY $this HAVING(COUNT)") {
    val g = TurtleParser.parseGraph(
      s"""@prefix sh: <http://www.w3.org/ns/shacl#> .
         |@prefix ex: <$ex> .
         |$data
         |ex:a a ex:T . ex:b a ex:T . ex:c a ex:T .
         |ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         |  sh:sparql [
         |    sh:message "too many scores" ;
         |    sh:select ""\"
         |      SELECT $$this WHERE { $$this <${ex}score> ?v . }
         |      GROUP BY $$this HAVING (COUNT(?v) > 2)
         |    ""\" ;
         |  ] .
         |""".stripMargin, "http://test/")
    val out = Validator.validateGraph(spark, g, Some(g))
    assert(!out.conforms)
    assert(out.results.map(_.focus) == Seq(Iri(ex + "a"))) // 3 scores > 2
  }
}
