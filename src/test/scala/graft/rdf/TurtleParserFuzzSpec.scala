package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

/** Turtle parser robustness: truncations and single-char mutations of a
  * document exercising the full surface (prefixes, lists, anonymous
  * bnodes, collections, numeric/boolean/typed/lang literals, long
  * strings, comments) must parse or raise a clean parse-level error —
  * never hang or leak unexpected exception types. */
class TurtleParserFuzzSpec extends AnyFunSuite {

  private val base =
    """@prefix ex: <http://ex.org/> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |@base <http://base.org/> .
      |ex:a a ex:Person ; ex:name "Ann" , "Annie"@en ;
      |  ex:age "31"^^xsd:integer ; ex:score 3.5 ; ex:ok true .
      |ex:b ex:knows [ ex:name "Anon" ; ex:tags ( ex:x ex:y 3 ) ] .
      |_:b1 ex:says '''multi
      |line "quoted" #notacomment''' ; ex:rel <relative/path> . # comment
      |ex:c ex:esc "tab\tnl\nq\"bs\\" .
      |""".stripMargin

  private def tryParse(doc: String): Unit =
    try { TurtleParser.parseGraph(doc, "http://test/"); () }
    catch {
      case _: IllegalArgumentException => () // the parser's declared error
      case e: Throwable =>
        fail(s"unexpected ${e.getClass.getName}: ${e.getMessage}\ndoc: ${doc.take(120)}")
    }

  test("the full-surface document itself parses") {
    val g = TurtleParser.parseGraph(base, "http://test/")
    assert(g.triples().size >= 12)
  }

  test("every truncation terminates with a clean outcome") {
    for (len <- 0 until base.length) tryParse(base.substring(0, len))
  }

  test("single-char mutations terminate with a clean outcome") {
    val weird = Array('.', ';', ',', '[', ']', '(', ')', '<', '>', '"',
      '\'', '@', '#', '^', '_', ':', ' ')
    for (i <- base.indices by 3; c <- weird)
      tryParse(base.updated(i, c))
  }
}
