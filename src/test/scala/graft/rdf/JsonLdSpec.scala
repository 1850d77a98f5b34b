package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

class JsonLdSpec extends AnyFunSuite {

  test("JsonLdWriter expanded form round-trips through the reader") {
    val g = new MemGraph
    val ex = "http://ex.org/"
    g.add(Iri(ex + "a"), RDF.ty, Iri(ex + "Person"))
    g.add(Iri(ex + "a"), Iri(ex + "name"), Lit("Al \"The\" Bee\n2"))
    g.add(Iri(ex + "a"), Iri(ex + "age"), Lit("42", XSD.integer))
    g.add(Iri(ex + "a"), Iri(ex + "label"), Lit("chat", "", "fr"))
    g.add(Iri(ex + "a"), Iri(ex + "knows"), Iri(ex + "b"))
    val back = JsonLd.parseGraph(JsonLdWriter.write(g), "rt")
    assert(back.triples().toSet == g.triples().toSet)
  }

  test("JsonLdWriter preserves bnode structure (ids re-scoped by reader)") {
    val g = new MemGraph
    g.add(BNode("x"), Iri("http://ex/p"), Lit("v"))
    g.add(Iri("http://ex/s"), Iri("http://ex/q"), BNode("x"))
    val back = JsonLd.parseGraph(JsonLdWriter.write(g), "rt")
    assert(back.triples().size == 2)
    // the same bnode label resolves to ONE node on both mention sites
    val bs = back.triples().toSeq.collect { case Triple(b: BNode, _, _) => b } ++
      back.triples().toSeq.collect { case Triple(_, _, b: BNode) => b }
    assert(bs.distinct.size == 1)
  }

  test("@vocab, @type, plain values (issue 009 shape)") {
    val g = JsonLd.parseGraph(
      """{
        |  "@context": { "@vocab": "http://example.com/ex#" },
        |  "@type": "Parent",
        |  "name": "Father",
        |  "dummy": "Dummy value"
        |}""".stripMargin)
    val ex = "http://example.com/ex#"
    val subj = g.subjects(RDF.ty, Iri(ex + "Parent")).toList
    assert(subj.size == 1)
    assert(g.objects(subj.head, Iri(ex + "name")).toList == List(Lit("Father")))
    assert(g.objects(subj.head, Iri(ex + "dummy")).toList == List(Lit("Dummy value")))
  }

  test("term definitions, @type:@id coercion, typed values, @graph (issue 026 shape)") {
    val quads = JsonLd.parseQuads(
      """{
        |  "@context": {
        |    "generatedAt": {"@id": "http://www.w3.org/ns/prov#generatedAtTime",
        |                    "@type": "http://www.w3.org/2001/XMLSchema#dateTime"},
        |    "Person": "http://xmlns.com/foaf/0.1/Person",
        |    "name": "http://xmlns.com/foaf/0.1/name",
        |    "knows": {"@id": "http://xmlns.com/foaf/0.1/knows", "@type": "@id"}
        |  },
        |  "@id": "http://example.org/foaf-graph",
        |  "generatedAt": "2012-04-09T00:00:00",
        |  "@graph": [
        |    {"@id": "http://a.org/#me", "@type": "Person", "name": "Manu",
        |     "knows": "http://b.org/#me"},
        |    {"@id": "http://b.org/#me", "@type": "Person", "name": ""}
        |  ]
        |}""".stripMargin)
    val foaf = "http://xmlns.com/foaf/0.1/"
    assert(quads.contains(Quad(Iri("http://example.org/foaf-graph"),
      Iri("http://www.w3.org/ns/prov#generatedAtTime"),
      Lit("2012-04-09T00:00:00", XSD.dateTime), None)))
    val gname = Some(Iri("http://example.org/foaf-graph"))
    assert(quads.contains(Quad(Iri("http://a.org/#me"), RDF.ty, Iri(foaf + "Person"), gname)))
    assert(quads.contains(Quad(Iri("http://a.org/#me"), Iri(foaf + "knows"),
      Iri("http://b.org/#me"), gname))) // @type:@id coercion -> IRI object
    assert(quads.contains(Quad(Iri("http://b.org/#me"), Iri(foaf + "name"), Lit(""), gname)))
  }

  test("@value with @type keeps the datatype; numbers/booleans type themselves (issue 286 shape)") {
    val gx = "https://registry.example/trustframework#"
    val g = JsonLd.parseGraph(
      s"""{
         |  "@context": {"gx": "$gx", "xsd": "http://www.w3.org/2001/XMLSchema#"},
         |  "@type": "gx:License",
         |  "gx:license": {"@value": "EPL-2.0", "@type": "xsd:string"},
         |  "gx:count": 25,
         |  "gx:score": 1.5,
         |  "gx:flag": true
         |}""".stripMargin)
    val subj = g.subjects(RDF.ty, Iri(gx + "License")).toList.head
    assert(g.objects(subj, Iri(gx + "license")).toList ==
      List(Lit("EPL-2.0", XSD.string)))
    assert(g.objects(subj, Iri(gx + "count")).toList == List(Lit("25", XSD.integer)))
    assert(g.objects(subj, Iri(gx + "score")).toList == List(Lit("1.5", XSD.double)))
    assert(g.objects(subj, Iri(gx + "flag")).toList == List(Lit("true", XSD.boolean)))
  }

  test("remote @context raises (zero egress)") {
    intercept[JsonLd.JsonLdError](
      JsonLd.parseGraph("""{"@context": "http://schema.org", "name": "x"}"""))
  }
}
