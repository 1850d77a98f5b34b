package graft.rdf

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Hextuples (.hext) reader — NDJSON format from rdflib's hext plugin
  * (reference format table: rdfutil/load.py:386). */
class HextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val doc =
    """["http://ex.org/a", "http://ex.org/p", "http://ex.org/b", "globalId", "", ""]
      |["http://ex.org/a", "http://ex.org/name", "Alice", "http://www.w3.org/2001/XMLSchema#string", "", ""]
      |["http://ex.org/a", "http://ex.org/label", "chat", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr", ""]
      |["http://ex.org/a", "http://ex.org/age", "42", "http://www.w3.org/2001/XMLSchema#integer", "", ""]
      |["_:n1", "http://ex.org/p", "_:n2", "localId", "", ""]
      |["http://ex.org/g1s", "http://ex.org/p", "in-g1", "http://www.w3.org/2001/XMLSchema#string", "", "http://ex.org/g1"]
      |""".stripMargin

  test("parseQuads maps all term kinds and graph labels") {
    val qs = Hext.parseQuads(doc, "hx")
    assert(qs.size == 6)
    val ex = "http://ex.org/"
    assert(qs(0) == Quad(Iri(ex + "a"), Iri(ex + "p"), Iri(ex + "b"), None))
    assert(qs(1).o == Lit("Alice")) // xsd:string collapses to plain
    assert(qs(2).o == Lit("chat", "", "fr"))
    assert(qs(3).o == Lit("42", XSD.integer))
    assert(qs(4).s == BNode("hx-n1") && qs(4).o == BNode("hx-n2"))
    assert(qs(5).g.contains(Iri(ex + "g1")))
  }

  test("GraphLoader sniffs hext content and honors the .hext extension") {
    val g = GraphLoader.parseContent(doc, "file:///t.hext")
    assert(g.contains(Iri("http://ex.org/a"), Iri("http://ex.org/name"), Lit("Alice")))
    val f = java.nio.file.Files.createTempFile("graft", ".hext")
    java.nio.file.Files.write(f, doc.getBytes("UTF-8"))
    val g2 = GraphLoader.parseFile(f.toString)
    assert(g2.contains(Iri("http://ex.org/a"), Iri("http://ex.org/age"), Lit("42", XSD.integer)))
    java.nio.file.Files.delete(f)
  }

  test("bnode graph labels skolemize per file; sniffing tolerates whitespace") {
    val line = """["http://ex.org/s", "http://ex.org/p", "v", "http://www.w3.org/2001/XMLSchema#string", "", "_:g1"]"""
    val q = Hext.parseQuads(line, "hx").head
    assert(q.g.contains(Iri("urn:graft:bnode-graph:hx-g1")))
    val spaced = """[ "http://ex.org/a", "http://ex.org/name", "Alice", "http://www.w3.org/2001/XMLSchema#string", "", "" ]"""
    val g = GraphLoader.parseContent(spaced, "file:///x")
    assert(g.contains(Iri("http://ex.org/a"), Iri("http://ex.org/name"), Lit("Alice")))
  }

  test("readHext scans distributed and feeds the quads layer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hext")
    val f = dir.resolve("part.hext")
    java.nio.file.Files.write(f, doc.getBytes("UTF-8"))
    val quads = Hext.readHext(spark, f.toString)
    assert(quads.count() == 6)
    assert(QuadsDF.graphNames(quads) == Seq("http://ex.org/g1"))
    assert(QuadsDF.defaultUnion(quads).count() == 6)
    java.nio.file.Files.delete(f); java.nio.file.Files.delete(dir)
  }
}
