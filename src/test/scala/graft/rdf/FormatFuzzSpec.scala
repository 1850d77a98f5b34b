package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

/** Robustness fuzz for the remaining hand-rolled readers (TriG segmentizer,
  * JSON-LD, RDF/XML): truncations and single-char mutations must TERMINATE
  * with an ordinary exception at worst — never hang a driver/executor,
  * overflow the stack, or exhaust memory. (Exact error-type contracts live
  * with each parser's own spec; termination is the property a fuzzer buys.) */
class FormatFuzzSpec extends AnyFunSuite {

  private def survives(run: () => Unit, what: String, doc: String): Unit =
    try { run(); () }
    catch {
      case _: Exception => () // parse-level failures are fine
      case e: Throwable => // StackOverflowError, OOM: real robustness bugs
        fail(s"$what blew up with ${e.getClass.getName}\ndoc: ${doc.take(100)}")
    }

  private val trigDoc =
    """@prefix ex: <http://ex.org/> .
      |ex:d ex:p "default" .
      |GRAPH ex:g1 { ex:a ex:name "A" ; ex:says '''brace } in { string''' . }
      |ex:g2 { ex:b ex:name "B#notcomment" . } # real comment
      |{ ex:anon ex:p 3.5 . }
      |""".stripMargin

  private val jsonldDoc =
    """{ "@context": { "ex": "http://ex.org/", "name": "ex:name" },
      |  "@graph": [
      |    { "@id": "ex:a", "name": { "@value": "Ann", "@language": "en" },
      |      "ex:age": { "@value": "31", "@type": "http://www.w3.org/2001/XMLSchema#integer" },
      |      "ex:knows": { "@id": "ex:b" } } ] }""".stripMargin

  private val rdfxmlDoc =
    """<?xml version="1.0"?>
      |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      |         xmlns:ex="http://ex.org/">
      |  <rdf:Description rdf:about="http://ex.org/a">
      |    <ex:name xml:lang="en">Ann &amp; co</ex:name>
      |    <ex:knows rdf:resource="http://ex.org/b"/>
      |    <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">31</ex:age>
      |  </rdf:Description>
      |</rdf:RDF>""".stripMargin

  test("base documents parse") {
    assert(TrigParser.parseGraphQuads(trigDoc, "http://t/").size >= 5)
    assert(JsonLd.parseGraph(jsonldDoc).triples().size >= 3)
    assert(RdfXml.parseGraph(rdfxmlDoc).triples().size >= 3)
  }

  test("TriG truncations and mutations terminate") {
    for (len <- 0 until trigDoc.length)
      survives(() => TrigParser.parseGraphQuads(trigDoc.substring(0, len), "http://t/"),
        "TriG truncation", trigDoc.substring(0, len))
    for (i <- trigDoc.indices by 3; c <- Array('{', '}', '"', '\'', '#', '<', '.'))
      survives(() => TrigParser.parseGraphQuads(trigDoc.updated(i, c), "http://t/"),
        "TriG mutation", trigDoc.updated(i, c))
  }

  test("JSON-LD truncations and mutations terminate") {
    for (len <- 0 until jsonldDoc.length)
      survives(() => JsonLd.parseGraph(jsonldDoc.substring(0, len)),
        "JSON-LD truncation", jsonldDoc.substring(0, len))
    for (i <- jsonldDoc.indices by 3; c <- Array('{', '}', '[', ']', '"', ':', ','))
      survives(() => JsonLd.parseGraph(jsonldDoc.updated(i, c)),
        "JSON-LD mutation", jsonldDoc.updated(i, c))
  }

  test("RDF/XML truncations and mutations terminate") {
    for (len <- 0 until rdfxmlDoc.length)
      survives(() => RdfXml.parseGraph(rdfxmlDoc.substring(0, len)),
        "RDF/XML truncation", rdfxmlDoc.substring(0, len))
    for (i <- rdfxmlDoc.indices by 3; c <- Array('<', '>', '/', '"', '&', '='))
      survives(() => RdfXml.parseGraph(rdfxmlDoc.updated(i, c)),
        "RDF/XML mutation", rdfxmlDoc.updated(i, c))
  }
}
