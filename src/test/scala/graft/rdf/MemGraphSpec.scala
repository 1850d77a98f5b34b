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
