package graft.rdf

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QuadsSpec extends AnyFunSuite {

  test("TriG writer round-trips through the TriG parser") {
    val quads = Seq(
      Quad(Iri("http://ex/a"), Iri("http://ex/p"), Lit("say \"hi\"\nline2"), None),
      Quad(Iri("http://ex/a"), Iri("http://ex/p"), Lit("fr-val", "", "fr"),
        Some(Iri("http://ex/g1"))),
      Quad(BNode("b1"), Iri("http://ex/p"), Lit("42", XSD.integer),
        Some(Iri("http://ex/g2"))))
    val text = TrigWriter.write(quads)
    val back = TrigParser.parseGraphQuads(text, "http://base/", "b")
    def key(q: Quad) = (q.s match { case BNode(_) => "_:" case n => n.key },
      q.p.value, q.o, q.g.map(_.value))
    assert(back.map(key).toSet == quads.map(key).toSet)
  }

  test("distributed N-Triples/N-Quads writers round-trip through the readers") {
    val spark = graft.TestSpark.spark
    val quads = QuadsDF.fromQuads(spark, Seq(
      Quad(Iri("http://ex/a"), Iri("http://ex/p"), Lit("x\t\"y\""), None),
      Quad(Iri("http://ex/a"), Iri("http://ex/q"), Iri("http://ex/b"),
        Some(Iri("http://ex/g1"))),
      Quad(BNode("n1"), Iri("http://ex/p"), Lit("chat", "", "fr"),
        Some(Iri("http://ex/g1")))))
    val dir = java.nio.file.Files.createTempDirectory("ntout")
    TriplesDF.writeNTriples(QuadsDF.defaultUnion(quads), s"$dir/nt")
    val backT = TriplesDF.readNTriples(spark, s"$dir/nt")
    assert(backT.count() == 3)
    // literal content survives escaping (value column compare)
    import org.apache.spark.sql.functions.col
    assert(backT.filter(col("o")("v") === "x\t\"y\"").count() == 1)
    TriplesDF.writeNQuads(quads, s"$dir/nq")
    val backQ = TriplesDF.readNQuads(spark, s"$dir/nq")
    assert(backQ.count() == 3)
    assert(QuadsDF.graphNames(backQ) == Seq("http://ex/g1"))
  }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val trig =
    """@prefix ex: <http://ex.org/> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |ex:meta ex:generatedAt "2012-04-09T00:00:00"^^xsd:dateTime .
      |ex:g1 {
      |  ex:a a ex:Person ; ex:name "Alice" ; ex:score 1.5 .
      |}
      |GRAPH <http://ex.org/g2> {
      |  ex:b a ex:Person ; ex:name "" .
      |}
      |""".stripMargin

  test("TriG parses named graphs + default graph; default union feeds validation") {
    val quads = TrigParser.parseGraphQuads(trig, "http://test/")
    def I(l: String) = Iri("http://ex.org/" + l)
    assert(quads.exists(q => q.s == I("meta") && q.g.isEmpty))
    assert(quads.exists(q => q.s == I("a") && q.g.contains(I("g1"))))
    assert(quads.exists(q => q.s == I("b") && q.g.contains(I("g2"))))
    assert(quads.exists(q => q.o == Lit("1.5", XSD.ns + "decimal"))) // dot-in-decimal survives
    val df = QuadsDF.fromQuads(spark, quads)
    assert(QuadsDF.graphNames(df) == Seq("http://ex.org/g1", "http://ex.org/g2"))
    assert(QuadsDF.graph(df, Some("http://ex.org/g1")).count() == 3)
    assert(QuadsDF.defaultUnion(df).count() == quads.size)

    // validate the dataset as a union (issue test_026's shape of check)
    val shapes = TurtleParser.parseGraph(
      """@prefix sh: <http://www.w3.org/ns/shacl#> .
        |@prefix ex: <http://ex.org/> .
        |ex:S a sh:NodeShape ; sh:targetClass ex:Person ;
        |  sh:property [ sh:path ex:name ; sh:minLength 1 ] .
        |""".stripMargin, "http://test/s")
    val out = graft.shacl.Validator.validateFrame(spark, QuadsDF.defaultUnion(df),
      shapes, dataCbd = _ => Nil)
    assert(!out.conforms) // ex:b has the empty name, found across graphs
    assert(out.results.map(_.focus) == Seq(Iri("http://ex.org/b")))
  }

  test("regex dialect translation: named groups, backrefs, \\Z") {
    assert(RegexDialect.pythonToJava("(?P<y>\\d{4})-(?P=y)\\Z") ==
      "(?<y>\\d{4})-\\k<y>\\z")
    // escapes and char classes are untouched
    assert(RegexDialect.pythonToJava("^\\d{3}-[\\]Z(?P]\\\\Z$") == "^\\d{3}-[\\]Z(?P]\\\\Z$")
    assert("2024-2024".matches(RegexDialect.pythonToJava("(?P<y>\\d{4})-(?P=y)")))
  }

  test("distributed N-Quads scan: 3- and 4-term lines, default + named graphs") {
    val nq =
      """<http://ex/s1> <http://ex/p> "plain lit with <angle> and . dot" .
        |<http://ex/s2> <http://ex/p> <http://ex/o> <http://ex/g1> .
        |# comment
        |<http://ex/s3> <http://ex/p> "42"^^<http://www.w3.org/2001/XMLSchema#integer> <http://ex/g1> .
        |_:b1 <http://ex/p> _:b2 _:g2 .
        |""".stripMargin
    val f = java.nio.file.Files.createTempFile("quads", ".nq")
    java.nio.file.Files.writeString(f, nq)
    val df = TriplesDF.readNQuads(spark, f.toString)
    assert(df.count() == 4)
    val byG = df.groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(byG("") == 1 && byG("http://ex/g1") == 2 && byG("_:g2") == 1)
    assert(df.filter($"g" === "").select($"o"("v")).as[String].collect()(0)
      .contains("<angle> and . dot"))
  }

  test("locked write context: inference lands in its own named graph") {
    val quads = QuadsDF.fromQuads(spark, Seq(
      Quad(Iri("e:a"), Iri("p:type"), Iri("e:T"), Some(Iri("g:data")))))
    val derived = TriplesDF.fromTriples(spark, Seq(
      Triple(Iri("e:a"), Iri("p:type"), Iri("e:Super")),
      Triple(Iri("e:a"), Iri("p:type"), Iri("e:T")))) // already known: stays out
    val out = QuadsDF.expandInto(quads, derived, "urn:pyshacl:inference")
    val inf = QuadsDF.graph(out, Some("urn:pyshacl:inference"))
    assert(inf.count() == 1)
    assert(QuadsDF.defaultUnion(out).count() == 2)
    assert(QuadsDF.graph(out, Some("g:data")).count() == 1)
  }
}
