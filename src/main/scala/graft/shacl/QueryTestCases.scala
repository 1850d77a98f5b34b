package graft.shacl

import graft.rdf._
import graft.rdf.Json._
import org.apache.spark.sql.SparkSession

/** dash:QueryTestCase runner — the reference's evaluate_query_testcase
  * (/root/reference/pyshacl/validator_conformance.py:260-400): run the
  * sh:select query over the graph and compare against the
  * dash:expectedResult SPARQL-Results-JSON literal (vars as a set, rows as
  * an ordered list, term-equal bindings). */
object QueryTestCases {

  final class QueryTestError(msg: String) extends RuntimeException(msg)

  // ------------------------------------------- SPARQL Results JSON decode
  final case class Expected(vars: Set[String], rows: List[Map[String, Node]])

  def parseExpected(json: String): Expected = {
    val root = Json.parse(json) match {
      case o: JObj => o
      case _ => throw new QueryTestError("expected JSON object")
    }
    val vars = root.m.get("head") match {
      case Some(JObj(h)) => h.get("vars") match {
        case Some(JArr(vs)) => vs.collect { case JStr(v) => v }.toSet
        case _ => throw new QueryTestError("missing head.vars")
      }
      case _ => throw new QueryTestError("missing head")
    }
    val rows = root.m.get("results") match {
      case Some(JObj(r)) => r.get("bindings") match {
        case Some(JArr(bs)) => bs.map {
          case JObj(b) => b.map { case (k, v) => k -> bindingToNode(v) }
          case _ => throw new QueryTestError("binding must be an object")
        }
        case _ => throw new QueryTestError("missing results.bindings")
      }
      case _ => throw new QueryTestError("missing results")
    }
    Expected(vars, rows)
  }

  private def bindingToNode(j: J): Node = j match {
    case JObj(m) =>
      def s(k: String): Option[String] = m.get(k).collect { case JStr(x) => x }
      (s("type"), s("value")) match {
        case (Some("uri"), Some(v)) => Iri(v)
        case (Some("bnode"), Some(v)) => BNode(v)
        case (Some("literal") | Some("typed-literal"), Some(v)) =>
          Lit(v, s("datatype").getOrElse(""), s("xml:lang").getOrElse(""))
        case _ => throw new QueryTestError(s"bad binding $m")
      }
    case _ => throw new QueryTestError("binding value must be an object")
  }

  // ----------------------------------------------------------- evaluate
  /** Run one dash:QueryTestCase; returns (matches, detail). Throws on
    * invalid query / malformed JSON (the fixture set expects that). */
  def evaluate(spark: SparkSession, g: MemGraph, docPrefixes: Map[String, String],
               tc: Node): (Boolean, String) = {
    val select = g.value(tc, SH.select) match {
      case Some(Lit(lex, _, _)) => lex
      case _ => throw new QueryTestError(s"QueryTestCase $tc missing sh:select property.")
    }
    val expectedJson = g.value(tc, Iri(ShtSuite.DASHNS + "expectedResult")) match {
      case Some(Lit(lex, _, _)) => lex
      case _ => throw new QueryTestError(s"QueryTestCase $tc missing dash:expectedResult property.")
    }
    val expected = parseExpected(expectedJson)
    // rdflib injects the document's own namespace bindings into queries;
    // sh:declare prefixes stack on top (extract_query_and_expected_result)
    val prefixes = docPrefixes ++ Sparql.collectPrefixes(g, tc)
    val q = Sparql.parseQuery(select, prefixes) match {
      case s: Sparql.SqSelect => s
      case _ => throw new QueryTestError("QueryTestCase sh:select must be a SELECT query")
    }
    val T = TriplesDF.fromMemGraph(spark, g)
    val frame = new SparqlFrame(spark, T, PathEval.step(T, _, _), Map.empty, None)
    val res = frame.evalSelect(q, frame.unitSeed)
    val vars = res.vars.filterNot(_.startsWith("__")).toSeq.sorted
    if (vars.toSet != expected.vars)
      return (false, s"SPARQL result variable lists differ: expected " +
        s"${expected.vars.mkString(", ")}, got ${vars.mkString(", ")}.")
    val rows = frame.collect(res, vars)
    if (rows.size != expected.rows.size)
      return (false, s"SPARQL result length mismatch: expected ${expected.rows.size}, got ${rows.size}.")
    val mismatch = rows.zip(expected.rows).zipWithIndex.collectFirst {
      case ((a, e), i) if !rowEq(a, e) => s"row $i differs: actual $a vs expected $e"
    }
    mismatch match {
      case Some(m) => (false, m)
      case None => (true, "")
    }
  }

  private def rowEq(a: Map[String, Node], e: Map[String, Node]): Boolean =
    a.keySet == e.keySet && a.forall { case (k, v) =>
      e(k) == v || ((v, e(k)) match {
        case (l1: Lit, l2: Lit) => LitCompare.valueEq(l1, l2)
        case _ => false
      })
    }
}

/** Standalone property-path stepping over a triples frame (SparqlFrame
  * needs one outside a ValidationEngine, e.g. for query test cases). */
object PathEval {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._
  import PathIR._

  def step(T: DataFrame, frontier: DataFrame, path: PathIR,
           maxDepth: Int = 100): DataFrame = path match {
    case PPred(p) =>
      val t = T.filter(col("p") === p).select(col("s").as("_s"), col("o").as("_o"))
      frontier.join(t, frontier("v") === t("_s")).select(frontier("f"), t("_o").as("v"))
    case PInv(PPred(p)) =>
      val t = T.filter(col("p") === p).select(col("s").as("_s"), col("o").as("_o"))
      frontier.join(t, frontier("v") === t("_o")).select(frontier("f"), t("_s").as("v"))
    case PInv(inner) =>
      // evaluate the INVERSE of inner (invert(PInv(x)) would reduce back to
      // x for non-normalized composites — silently forward)
      step(T, frontier, PathIR.invert(inner), maxDepth)
    case PSeq(parts) => parts.foldLeft(frontier)(step(T, _, _, maxDepth))
    case PAlt(alts) => alts.map(step(T, frontier, _, maxDepth)).reduce(_ unionByName _).distinct()
    case PZeroOrOne(inner) => frontier.unionByName(step(T, frontier, inner, maxDepth)).distinct()
    case PZeroOrMore(inner) => kleene(T, frontier, inner, maxDepth)
    case POneOrMore(inner) => kleene(T, step(T, frontier, inner, maxDepth).distinct(), inner, maxDepth)
    case PNegSet(fwd, inv) =>
      // negated property set (SPARQL §9.1): forward edges excluding the
      // non-^ members, inverse edges excluding the ^ members
      def notIn(ex: List[String]) =
        if (ex.isEmpty) T else T.filter(!col("p").isin(ex: _*))
      val legs = fwd.map { ex =>
        val t = notIn(ex).select(col("s").as("_s"), col("o").as("_o"))
        frontier.join(t, frontier("v") === t("_s")).select(frontier("f"), t("_o").as("v"))
      }.toSeq ++ inv.map { ex =>
        val t = notIn(ex).select(col("s").as("_s"), col("o").as("_o"))
        frontier.join(t, frontier("v") === t("_o")).select(frontier("f"), t("_s").as("v"))
      }.toSeq
      if (legs.isEmpty) frontier.limit(0) else legs.reduce(_ unionByName _).distinct()
  }

  private def kleene(T: DataFrame, seed: DataFrame, inner: PathIR,
                     maxDepth: Int): DataFrame = {
    var all = seed.distinct().localCheckpoint()
    var frontier = all
    var n = all.count()
    var iter = 0
    while (n > 0 && iter < maxDepth) {
      val next = step(T, frontier, inner, maxDepth).distinct().except(all).localCheckpoint()
      n = next.count()
      if (n > 0) all = all.unionByName(next).localCheckpoint()
      frontier = next
      iter += 1
    }
    // an incomplete closure must not silently pass as complete (the Engine
    // kleene throws the same way; a silent cap returns wrong path answers
    // for >maxDepth-hop chains with no signal)
    if (n > 0)
      throw new ReportableError(
        s"SPARQL path closure exceeded $maxDepth iterations with a non-empty " +
          "frontier; pass a larger maxDepth (ValidationOptions.maxPathDepth) " +
          "for deeper graphs.")
    all
  }
}

/** [[PathEval]] over a QUADS frame: the frontier carries (f, v, g) and
  * every step joins on the graph column too, so one evaluation — including
  * the closure fixpoint — walks every named graph simultaneously, scoped
  * per graph. This is what lets GRAPH ?g { ?s ex:p+ ?o } compile to a
  * single fixed-size plan instead of a per-graph driver loop (SparqlFrame
  * evalQuadGroup): at a million per-document graphs the fixpoint is still
  * one distributed join per round. */
object PathEvalQuads {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._
  import PathIR._

  /** Q: quads (s,p,o,g); frontier: (f, v, g). */
  def step(Q: DataFrame, frontier: DataFrame, path: PathIR,
           maxDepth: Int = 100): DataFrame = path match {
    case PPred(p) =>
      val t = Q.filter(col("p") === p)
        .select(col("s").as("_s"), col("o").as("_o"), col("g").as("_g"))
      frontier.join(t, frontier("v") === t("_s") && frontier("g") === t("_g"))
        .select(frontier("f"), t("_o").as("v"), frontier("g"))
    case PInv(PPred(p)) =>
      val t = Q.filter(col("p") === p)
        .select(col("s").as("_s"), col("o").as("_o"), col("g").as("_g"))
      frontier.join(t, frontier("v") === t("_o") && frontier("g") === t("_g"))
        .select(frontier("f"), t("_s").as("v"), frontier("g"))
    case PInv(inner) =>
      step(Q, frontier, PathIR.invert(inner), maxDepth)
    case PSeq(parts) => parts.foldLeft(frontier)(step(Q, _, _, maxDepth))
    case PAlt(alts) => alts.map(step(Q, frontier, _, maxDepth)).reduce(_ unionByName _).distinct()
    case PZeroOrOne(inner) => frontier.unionByName(step(Q, frontier, inner, maxDepth)).distinct()
    case PZeroOrMore(inner) => kleene(Q, frontier, inner, maxDepth)
    case POneOrMore(inner) => kleene(Q, step(Q, frontier, inner, maxDepth).distinct(), inner, maxDepth)
    case PNegSet(fwd, inv) =>
      def notIn(ex: List[String]) =
        if (ex.isEmpty) Q else Q.filter(!col("p").isin(ex: _*))
      val legs = fwd.map { ex =>
        val t = notIn(ex).select(col("s").as("_s"), col("o").as("_o"), col("g").as("_g"))
        frontier.join(t, frontier("v") === t("_s") && frontier("g") === t("_g"))
          .select(frontier("f"), t("_o").as("v"), frontier("g"))
      }.toSeq ++ inv.map { ex =>
        val t = notIn(ex).select(col("s").as("_s"), col("o").as("_o"), col("g").as("_g"))
        frontier.join(t, frontier("v") === t("_o") && frontier("g") === t("_g"))
          .select(frontier("f"), t("_s").as("v"), frontier("g"))
      }.toSeq
      if (legs.isEmpty) frontier.limit(0) else legs.reduce(_ unionByName _).distinct()
  }

  private def kleene(Q: DataFrame, seed: DataFrame, inner: PathIR,
                     maxDepth: Int): DataFrame = {
    var all = seed.distinct().localCheckpoint()
    var frontier = all
    var n = all.count()
    var iter = 0
    while (n > 0 && iter < maxDepth) {
      val next = step(Q, frontier, inner, maxDepth).distinct().except(all).localCheckpoint()
      n = next.count()
      if (n > 0) all = all.unionByName(next).localCheckpoint()
      frontier = next
      iter += 1
    }
    if (n > 0)
      throw new ReportableError(
        s"SPARQL path closure (GRAPH ?g) exceeded $maxDepth iterations with " +
          "a non-empty frontier; pass a larger maxDepth " +
          "(ValidationOptions.maxPathDepth) for deeper graphs.")
    all
  }
}
