package graft.rdf

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based serializer/parser round-trips: for arbitrary graphs of
  * IRI/literal terms (quotes, backslashes, control chars, unicode, lang
  * tags, numeric datatypes), parse(write(g)) must reproduce the exact
  * triple set through both the Turtle and N-Triples paths. Deterministic
  * seeds keep failures reproducible (no scalatestplus bridge in the
  * offline cache, so generators drive a plain loop). BNodes are exercised
  * by the example-based specs — labels legitimately rename across a
  * parse, so set equality does not apply to them. */
class RoundTripPropSpec extends AnyFunSuite {

  private val safeSeg: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(12).mkString)

  private val genIri: Gen[Iri] = safeSeg.map(s => Iri("http://ex.org/" + s))

  private val weirdChar: Gen[Char] =
    Gen.oneOf('"', '\\', '\n', '\t', '\r', '\'', ' ', '#', '<', '>', '{',
      'é', 'ß', '中', '∀')

  private val genLex: Gen[String] =
    Gen.listOf(Gen.frequency(4 -> Gen.alphaNumChar, 2 -> weirdChar))
      .map(_.take(40).mkString)

  private val genLit: Gen[Lit] = Gen.oneOf(
    genLex.map(Lit(_)),
    Gen.choose(-1000000L, 1000000L).map(n => Lit(n.toString, XSD.integer)),
    Gen.oneOf(true, false).map(b => Lit(b.toString, XSD.boolean)),
    genLex.map(l => Lit(l, "http://ex.org/customDt")),
    for { l <- genLex; t <- Gen.oneOf("en", "fr", "de-ch") } yield Lit(l, lang = t))

  private val genTriple: Gen[Triple] = for {
    s <- genIri
    p <- genIri
    o <- Gen.frequency(1 -> genIri, 3 -> genLit)
  } yield Triple(s, p, o)

  private val genGraph: Gen[List[Triple]] =
    Gen.listOf(genTriple).map(_.take(30))

  private def sample(seed: Long): List[Triple] =
    genGraph.apply(Gen.Parameters.default.withSize(25), Seed(seed))
      .getOrElse(Nil)

  private def mem(ts: Seq[Triple]): MemGraph = {
    val g = new MemGraph
    ts.foreach(t => g.add(t.s, t.p, t.o))
    g
  }

  test("Turtle writer -> parser reproduces arbitrary IRI/literal graphs") {
    for (seed <- 1L to 150L) {
      val g = mem(sample(seed))
      val back = TurtleParser.parseGraph(TurtleWriter.write(g), "http://test/")
      assert(back.triples().toSet == g.triples().toSet,
        s"Turtle round-trip diverged for seed $seed")
    }
  }

  test("N-Triples writer -> parser reproduces arbitrary IRI/literal graphs") {
    for (seed <- 1L to 150L) {
      val g = mem(sample(seed))
      val nt = g.triples().toSeq
        .map(t => s"${NTriplesWriter.node(t.s)} ${NTriplesWriter.node(t.p)} ${NTriplesWriter.node(t.o)} .")
        .mkString("\n")
      val back = TurtleParser.parseGraph(nt, "http://test/")
      assert(back.triples().toSet == g.triples().toSet,
        s"N-Triples round-trip diverged for seed $seed")
    }
  }
}
