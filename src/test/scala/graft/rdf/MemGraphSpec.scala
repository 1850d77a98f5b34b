package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

class MemGraphSpec extends AnyFunSuite {
  test("remove deletes matching triples from all indexes") {
    val g = new MemGraph
    val s = BNode("r"); val p = Iri("http://p"); val p2 = Iri("http://q")
    g.add(s, p, Lit("m1")); g.add(s, p, Lit("m2")); g.add(s, p2, Lit("x"))
    g.remove(Some(s), Some(p), None)
    assert(g.objects(s, p).isEmpty)
    assert(g.objects(s, p2).toList == List(Lit("x")))
    assert(g.predicates(s).toSet == Set(p2))
    assert(g.size == 1)
  }
}

class TurtleWriterSpec extends AnyFunSuite {
  test("turtle writer round-trips through the parser") {
    val ttl =
      """@prefix ex: <http://ex.org/> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |ex:a a ex:T ; ex:p 5, "x"@en, "y"^^xsd:token, 2.5, true ; ex:q _:b1 .
        |_:b1 ex:r ex:a .
        |""".stripMargin
    val g = TurtleParser.parseGraph(ttl, "http://base/")
    val out = TurtleWriter.write(g, TurtleWriter.defaultPrefixes + ("ex" -> "http://ex.org/"))
    val g2 = TurtleParser.parseGraph(out, "http://base/")
    assert(g.toSeq.toSet == g2.toSeq.toSet, s"round-trip mismatch:\n$out")
    assert(out.contains("ex:a"))
  }
}
