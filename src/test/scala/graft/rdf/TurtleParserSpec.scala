package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

class TurtleParserSpec extends AnyFunSuite {
  val sht = "/root/reference/test/resources/sht_tests"

  test("parses minInclusive-001 fixture") {
    val g = TurtleParser.parseFile(s"$sht/core/node/minInclusive-001.ttl")
    assert(g.size > 10)
    val sh = "http://www.w3.org/ns/shacl#"
    val shape = Iri("http://datashapes.org/sh/tests/core/node/minInclusive-001.test#TestShape")
    val targets = g.objects(shape, Iri(sh + "targetNode")).toSet
    assert(targets == Set(Lit("7", XSD.integer), Lit("8", XSD.integer), Lit("9", XSD.integer)))
    val minInc = g.value(shape, Iri(sh + "minInclusive"))
    assert(minInc.contains(Lit("8", XSD.integer)))
    // manifest entries list
    val mf = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
    val manifest = g.subjects(RDF.ty, Iri(mf + "Manifest")).toList
    assert(manifest.size == 1)
    val entries = g.value(manifest.head, Iri(mf + "entries")).get
    assert(g.items(entries).size == 1)
  }

  test("parses every ttl in the SHT core corpus") {
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$sht/core"))
      .iterator().asScala.filter(_.toString.endsWith(".ttl")).toList
    assert(files.nonEmpty)
    val failures = files.flatMap { f =>
      try { TurtleParser.parseFile(f.toString); None }
      catch { case e: Throwable => Some(s"$f: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("parses every ttl in the DASH corpus") {
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(
        java.nio.file.Paths.get("/root/reference/test/resources/dash_tests"))
      .iterator().asScala.filter(_.toString.endsWith(".ttl")).toList
    val failures = files.flatMap { f =>
      try { TurtleParser.parseFile(f.toString); None }
      catch { case e: Throwable => Some(s"$f: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("strings, lists, bnodes, langs, escapes") {
    val ttl =
      """@prefix ex: <http://ex.org/> .
        |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        |ex:a ex:p "hi\nthere", 'single', '''long
        |string''', "tést"@fr-CA, "1.5"^^xsd:double ;
        |  ex:q ( 1 2.5 -3e2 true ex:b [ ex:inner "x" ] ) ;
        |  ex:r _:b1 .
        |_:b1 ex:s ex:a .
        |""".stripMargin
    val g = TurtleParser.parseGraph(ttl, "http://base/")
    val p = Iri("http://ex.org/p")
    val objs = g.objects(Iri("http://ex.org/a"), p).toSet
    assert(objs.contains(Lit("hi\nthere")))
    assert(objs.contains(Lit("single")))
    assert(objs.contains(Lit("long\nstring")))
    assert(objs.contains(Lit("tést", "", "fr-CA")))
    assert(objs.contains(Lit("1.5", XSD.double)))
    val lst = g.items(g.value(Iri("http://ex.org/a"), Iri("http://ex.org/q")).get)
    assert(lst.take(4) == List(Lit("1", XSD.integer), Lit("2.5", XSD.decimal),
      Lit("-3e2", XSD.double), Lit("true", XSD.boolean)))
    assert(lst(4) == Iri("http://ex.org/b"))
  }

  test("relative IRI resolution") {
    val ttl = """<> <p:x> <other> . <#frag> <p:x> </abs> ."""
    val g = TurtleParser.parseGraph(ttl, "file:///dir/sub/f.ttl")
    assert(g.contains(Iri("file:///dir/sub/f.ttl"), Iri("p:x"), Iri("file:///dir/sub/other")))
    assert(g.contains(Iri("file:///dir/sub/f.ttl#frag"), Iri("p:x"), Iri("file:///abs")))
  }

  test("xsd lexical + literal compare kernels") {
    assert(XsdLexical.isValid("07", XSD.integer))
    assert(!XsdLexical.isValid("7.5", XSD.integer))
    assert(!XsdLexical.isValid("yes", XSD.boolean))
    assert(XsdLexical.isValid("2020-01-01", XSD.date))
    assert(!XsdLexical.isValid("2020-13-01", XSD.date))
    assert(LitCompare.compare(Lit("7", XSD.integer), Lit("7.0", XSD.decimal)).contains(0))
    assert(LitCompare.compare(Lit("7", XSD.integer), Lit("8", XSD.integer)).contains(-1))
    assert(LitCompare.compare(Lit("7", XSD.integer), Lit("x")).isEmpty)
    assert(LitCompare.compare(Lit("a"), Lit("b")).contains(-1))
    assert(LitCompare.compare(
      Lit("2020-01-01T00:00:00Z", XSD.dateTime), Lit("2020-01-01T01:00:00+02:00", XSD.dateTime))
      .exists(_ > 0))
  }
}
