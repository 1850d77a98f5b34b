package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

class RdfXmlSpec extends AnyFunSuite {

  test("RdfXmlWriter round-trips through the reader") {
    val g = new MemGraph
    val ex = "http://ex.org/"
    g.add(Iri(ex + "a"), RDF.ty, Iri(ex + "Person"))
    g.add(Iri(ex + "a"), Iri(ex + "name"), Lit("Al <&> \"Bee\""))
    g.add(Iri(ex + "a"), Iri(ex + "age"), Lit("42", XSD.integer))
    g.add(Iri(ex + "a"), Iri(ex + "label"), Lit("chat", "", "fr"))
    g.add(Iri(ex + "a"), Iri(ex + "knows"), BNode("b1"))
    g.add(BNode("b1"), Iri(ex + "name"), Lit("Cee"))
    val xml = RdfXmlWriter.write(g)
    val back = RdfXml.parseGraph(xml, "", "rt")
    assert(back.triples().size == g.triples().size)
    assert(back.contains(Iri(ex + "a"), Iri(ex + "name"), Lit("Al <&> \"Bee\"")))
    assert(back.contains(Iri(ex + "a"), Iri(ex + "age"), Lit("42", XSD.integer)))
    assert(back.contains(Iri(ex + "a"), Iri(ex + "label"), Lit("chat", "", "fr")))
    // bnode link structure survives (ids may be re-scoped by the reader)
    val linked = back.triples(Some(Iri(ex + "a")), Some(Iri(ex + "knows"))).toList
    assert(linked.size == 1)
    val bn = linked.head.o
    assert(back.contains(bn, Iri(ex + "name"), Lit("Cee")))
  }
  val ex = "http://ex.org/"

  test("typed nodes, rdf:about/resource, nested nodes, datatyped + lang literals") {
    val g = RdfXml.parseGraph(
      s"""<?xml version="1.0"?>
         |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         |         xmlns:ex="$ex">
         |  <ex:Person rdf:about="${ex}alice" ex:nick="Al">
         |    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">30</ex:age>
         |    <ex:label xml:lang="en">Alice</ex:label>
         |    <ex:knows rdf:resource="${ex}bob"/>
         |    <ex:address>
         |      <rdf:Description>
         |        <ex:city>Berlin</ex:city>
         |      </rdf:Description>
         |    </ex:address>
         |  </ex:Person>
         |</rdf:RDF>""".stripMargin)
    val alice = Iri(ex + "alice")
    assert(g.contains(alice, RDF.ty, Iri(ex + "Person")))
    assert(g.contains(alice, Iri(ex + "nick"), Lit("Al")))
    assert(g.contains(alice, Iri(ex + "age"), Lit("30", XSD.integer)))
    assert(g.contains(alice, Iri(ex + "label"), Lit("Alice", "", "en")))
    assert(g.contains(alice, Iri(ex + "knows"), Iri(ex + "bob")))
    val addr = g.objects(alice, Iri(ex + "address")).toList
    assert(addr.size == 1)
    assert(g.objects(addr.head, Iri(ex + "city")).toList == List(Lit("Berlin")))
  }

  test("parseType Resource/Collection and rdf:li containers") {
    val g = RdfXml.parseGraph(
      s"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         |         xmlns:ex="$ex">
         |  <rdf:Description rdf:about="${ex}s">
         |    <ex:props rdf:parseType="Resource">
         |      <ex:a>1</ex:a>
         |    </ex:props>
         |    <ex:list rdf:parseType="Collection">
         |      <rdf:Description rdf:about="${ex}x"/>
         |      <rdf:Description rdf:about="${ex}y"/>
         |    </ex:list>
         |    <ex:bag>
         |      <rdf:Bag>
         |        <rdf:li>one</rdf:li>
         |        <rdf:li>two</rdf:li>
         |      </rdf:Bag>
         |    </ex:bag>
         |  </rdf:Description>
         |</rdf:RDF>""".stripMargin)
    val s = Iri(ex + "s")
    val anon = g.objects(s, Iri(ex + "props")).toList.head
    assert(g.objects(anon, Iri(ex + "a")).toList == List(Lit("1")))
    val lst = g.objects(s, Iri(ex + "list")).toList.head
    assert(g.items(lst) == List(Iri(ex + "x"), Iri(ex + "y")))
    val bag = g.objects(s, Iri(ex + "bag")).toList.head
    assert(g.objects(bag, Iri(RDF.ns + "_1")).toList == List(Lit("one")))
    assert(g.objects(bag, Iri(RDF.ns + "_2")).toList == List(Lit("two")))
  }

  test("the parsed graph validates like its Turtle equivalent") {
    val spark = graft.TestSpark.spark
    val xml = RdfXml.parseGraph(
      s"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         |         xmlns:ex="$ex">
         |  <ex:T rdf:about="${ex}bad"/>
         |  <ex:T rdf:about="${ex}good"><ex:p>x</ex:p></ex:T>
         |</rdf:RDF>""".stripMargin)
    val shapes = TurtleParser.parseGraph(
      s"""@prefix sh: <http://www.w3.org/ns/shacl#> .
         |@prefix ex: <$ex> .
         |ex:S a sh:NodeShape ; sh:targetClass ex:T ;
         |  sh:property [ sh:path ex:p ; sh:minCount 1 ] .
         |""".stripMargin, "http://test/")
    val out = graft.shacl.Validator.validateGraph(spark, xml, Some(shapes))
    assert(!out.conforms)
    assert(out.results.map(_.focus) == Seq(Iri(ex + "bad")))
  }
}
