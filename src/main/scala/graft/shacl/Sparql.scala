package graft.shacl

import graft.rdf._

/** SPARQL frontend for SHACL-SPARQL: the subset the reference executes via
  * rdflib for sh:sparql constraints, SPARQL constraint components, SPARQL
  * targets, SPARQLRules and SHACLFunctions
  * (/root/reference/pyshacl/constraints/sparql/sparql_based_constraints.py,
  * /root/reference/pyshacl/helper/sparql_query_helper.py:227-320).
  *
  * This file holds the AST, the recursive-descent parser and the SHACL
  * pre-binding legality checks. Compilation to DataFrame plans lives in
  * [[SparqlFrame]]. The parser is original code (not a port): pySHACL
  * delegates parsing to rdflib's pyparsing grammar; here queries compile
  * once into set-oriented Spark plans evaluated for *all* focus nodes in
  * one pass instead of once per focus.
  */
object Sparql {

  /** SHACL "validation failure" — the reference's ValidationFailure: the
    * whole validation run aborts and reports a failure (not a violation). */
  final class ValidationFailure(msg: String) extends RuntimeException(msg)

  final class ParseError(msg: String) extends RuntimeException(msg)

  // ----------------------------------------------------------------- AST
  sealed trait SqTerm
  final case class TVar(name: String) extends SqTerm
  final case class TConst(n: Node) extends SqTerm

  sealed trait SqPred
  final case class PredIri(iri: String) extends SqPred
  final case class PredVar(name: String) extends SqPred
  /** `$PATH` placeholder: bound to the enclosing shape's sh:path at compile
    * time (sparql_query_helper.py:300-309 substitutes the rendered path). */
  case object PredShapePath extends SqPred
  /** SPARQL property path in predicate position (seq / alt / inverse /
    * closure), e.g. `rdf:rest/rdf:first`. */
  final case class PredPath(path: PathIR) extends SqPred

  sealed trait SqExpr
  final case class EVar(name: String) extends SqExpr
  final case class EConst(n: Node) extends SqExpr
  final case class ECall(fn: String, args: List[SqExpr]) extends SqExpr
  final case class EFnIri(iri: String, args: List[SqExpr]) extends SqExpr
  final case class EBin(op: String, l: SqExpr, r: SqExpr) extends SqExpr
  final case class ENot(e: SqExpr) extends SqExpr
  final case class ENeg(e: SqExpr) extends SqExpr
  final case class EExists(g: SqGroup, negated: Boolean) extends SqExpr
  /** Aggregate call (COUNT/SUM/MIN/MAX/AVG/SAMPLE/GROUP_CONCAT); arg None =
    * COUNT(*); sep = GROUP_CONCAT's SEPARATOR (default " " per SPARQL 1.1). */
  final case class EAgg(fn: String, distinct: Boolean, arg: Option[SqExpr],
                        sep: Option[String] = None) extends SqExpr

  sealed trait SqElem
  final case class SqTriple(s: SqTerm, p: SqPred, o: SqTerm) extends SqElem
  final case class SqFilter(e: SqExpr) extends SqElem
  final case class SqBind(e: SqExpr, v: String) extends SqElem
  final case class SqOptional(g: SqGroup) extends SqElem
  /** one or more groups joined by UNION; a single element means plain group */
  final case class SqUnion(branches: List[SqGroup]) extends SqElem
  final case class SqSubSelect(sel: SqSelect) extends SqElem
  final case class SqGraphPat(name: SqTerm, g: SqGroup) extends SqElem
  /** Inline data block: `VALUES (?x ?y) { (v1 v2) (UNDEF v3) }`; None =
    * UNDEF. Legal in targets / dash:QueryTestCase queries — constraint
    * queries reject VALUES earlier via [[checkPreBinding]], matching the
    * reference's pre-binding rules (sparql_query_helper.py:227-320). */
  final case class SqValues(vs: List[String], rows: List[List[Option[Node]]]) extends SqElem
  /** SPARQL MINUS (§8.3): remove lhs solutions compatible with some rhs
    * solution on a non-empty shared domain. Legal outside constraints;
    * constraint queries reject MINUS earlier via [[checkPreBinding]]. */
  final case class SqMinus(g: SqGroup) extends SqElem

  final case class SqGroup(elems: List[SqElem])

  sealed trait SqProj
  final case class PVar(name: String) extends SqProj
  final case class PExpr(e: SqExpr, as: String) extends SqProj
  case object PStar extends SqProj

  sealed trait SqQuery
  final case class SqSelect(distinct: Boolean, proj: List[SqProj], where: SqGroup,
                            orderBy: List[(SqExpr, Boolean)], limit: Option[Int],
                            groupBy: List[String] = Nil,
                            having: Option[SqExpr] = None,
                            offset: Option[Int] = None) extends SqQuery
  final case class SqAsk(where: SqGroup) extends SqQuery
  final case class SqConstruct(template: List[SqTriple], where: SqGroup) extends SqQuery

  // ------------------------------------------------- pre-binding legality
  /** Mirrors SPARQLQueryHelper.check_invalid_sparql
    * (sparql_query_helper.py:227-320): MINUS/VALUES/SERVICE are illegal in
    * SHACL-SPARQL; nested SELECTs must re-project every potentially
    * pre-bound variable; AS must not rebind a pre-bound variable. Raises
    * [[ValidationFailure]] like the reference (aborts the whole run). */
  def checkPreBinding(query: String, valueBound: Boolean, extraVars: Set[String]): Unit = {
    val text = stripComments(query)
    def kw(word: String): Boolean =
      java.util.regex.Pattern.compile("(?<![\\w\\-:?$])" + word + "\\b",
        java.util.regex.Pattern.CASE_INSENSITIVE).matcher(text).find()
    if (kw("MINUS"))
      throw new ValidationFailure("A SPARQL Constraint must not contain a MINUS clause.")
    if (kw("VALUES"))
      throw new ValidationFailure("A SPARQL Constraint must not contain a VALUES clause.")
    if (kw("SERVICE"))
      throw new ValidationFailure("A SPARQL Constraint must not contain a federated query (SERVICE).")
    val prebound = Set("this", "shapesGraph", "currentShape") ++
      (if (valueBound) Set("value") else Set.empty) ++ extraVars
    // nested SELECT projection rule (sparql_query_helper.py:268-299)
    val nested = java.util.regex.Pattern.compile(
      "SELECT[\\s\\(\\)\\$\\?a-z]*\\{[^\\}]*SELECT\\s+((?:(?:[\\?\\$]\\w+\\s+)|(?:\\*\\s+))+)",
      java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.MULTILINE).matcher(text)
    if (nested.find()) {
      val vars = nested.group(1).split("\\s+").toList.filter(_.nonEmpty)
        .map(_.stripPrefix("$").stripPrefix("?").trim)
      if (vars.isEmpty) throw new ValidationFailure("Ill-formed nested SELECT statement found.")
      if (vars == List("*"))
        throw new ValidationFailure(
          "Using 'SELECT *' in a nested SELECT query does not select potentially pre-bound variables.\n" +
            "See https://github.com/w3c/data-shapes/issues/84.")
      for (p <- prebound if !vars.contains(p)) {
        if (p == "shapesGraph" || p == "currentShape") ()
        else if (p == "this")
          throw new ValidationFailure(
            "All potentially pre-bound variables must be selected from a nested SELECT query.\n" +
              "Don't forget to include variable `$this` in your SELECT arguments.")
        else
          throw new ValidationFailure(
            "All potentially pre-bound variables must be selected from a nested SELECT query.\n" +
              s"Potentially pre-bound variables for this query are: ${prebound.mkString(", ")}.")
      }
    }
    val asVar = java.util.regex.Pattern.compile("[^\\w]+AS[\\s]+[\\$\\?](\\w+)",
      java.util.regex.Pattern.CASE_INSENSITIVE | java.util.regex.Pattern.MULTILINE).matcher(text)
    if (asVar.find()) {
      val v = asVar.group(1)
      if (prebound.contains(v))
        throw new ValidationFailure(
          s"Cannot use AS to re-bind potentially pre-bound variables such as $v")
    }
  }

  /** Does the raw text mention a pre-boundable variable? (bind_this_regex
    * et al., sparql_query_helper.py:30-34). */
  def mentionsVar(query: String, name: String): Boolean =
    java.util.regex.Pattern.compile("([\\s{}()])[\\$\\?]" + name + "\\b")
      .matcher(stripComments(query)).find()

  /** Strip '#' comments outside string literals and IRIs. Tracks both quote
    * characters, backslash escapes, and triple-quoted (multi-line) literals —
    * string state carries across lines so `"say \"hi\" #x"` or a '#' inside
    * a '''...''' block survives intact. */
  private def stripComments(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    var quote: Char = 0 // active string delimiter; 0 = outside strings
    var triple = false
    var inIri = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (c == '\\' && i + 1 < s.length) { sb.append(c).append(s.charAt(i + 1)); i += 2 }
        else if (c == quote &&
          (!triple || (i + 2 < s.length && s.charAt(i + 1) == quote && s.charAt(i + 2) == quote))) {
          if (triple) { sb.append(c).append(c).append(c); i += 3 }
          else { sb.append(c); i += 1 }
          quote = 0; triple = false
        } else { sb.append(c); i += 1 }
      } else if (inIri) {
        // inside <...>: apostrophes and '#' (fragments) are IRI content,
        // not string openers or comments
        if (c == '>' || c == '\n') inIri = false
        sb.append(c); i += 1
      } else if (c == '"' || c == '\'') {
        if (i + 2 < s.length && s.charAt(i + 1) == c && s.charAt(i + 2) == c) {
          quote = c; triple = true; sb.append(c).append(c).append(c); i += 3
        } else { quote = c; triple = false; sb.append(c); i += 1 }
      } else if (c == '<' && {
        // '<' only opens an IRIREF when a '>' follows with no intervening
        // whitespace (IRIREF cannot contain spaces) — same lookahead the
        // parser's looksLikeIri uses. Both `FILTER(?x < 5) # note` and the
        // unspaced `FILTER(?x<5) # note` keep their comments stripped
        // instead of treating the tail as IRI text.
        var j = i + 1
        while (j < s.length && s.charAt(j) != '>' && !s.charAt(j).isWhitespace) j += 1
        j < s.length && s.charAt(j) == '>'
      }) {
        inIri = true; sb.append(c); i += 1
      }
      else if (c == '>') { inIri = false; sb.append(c); i += 1 }
      else if (c == '\n') { inIri = false; sb.append(c); i += 1 }
      else if (c == '#' && !inIri) { while (i < s.length && s.charAt(i) != '\n') i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------- parser
  def parseQuery(query: String, prefixes: Map[String, String]): SqQuery =
    new P(stripComments(query), prefixes).query()

  private final class P(s: String, prefixes0: Map[String, String]) {
    private var pos = 0
    private var prefixes = prefixes0

    def query(): SqQuery = {
      prologue()
      ws()
      val q =
        if (takeKw("SELECT")) selectBody()
        else if (takeKw("ASK")) SqAsk(group())
        else if (takeKw("CONSTRUCT")) constructBody()
        else fail("expected SELECT, ASK or CONSTRUCT")
      ws()
      if (pos < s.length) fail(s"trailing input: ${s.substring(pos).take(40)}")
      q
    }

    private def prologue(): Unit = {
      var go = true
      while (go) {
        ws()
        if (takeKw("PREFIX")) {
          ws()
          val st = pos
          while (pos < s.length && s.charAt(pos) != ':') pos += 1
          val name = s.substring(st, pos).trim
          expect(':')
          ws()
          prefixes += (name -> iriRef())
        } else if (takeKw("BASE")) { ws(); iriRef(); () }
        else go = false
      }
    }

    private def selectBody(): SqSelect = {
      ws()
      val distinct = takeKw("DISTINCT")
      takeKw("REDUCED")
      val proj = scala.collection.mutable.ListBuffer.empty[SqProj]
      var go = true
      while (go) {
        ws()
        if (peek == '*') { pos += 1; proj += PStar }
        else if (peek == '?' || peek == '$') proj += PVar(varName())
        else if (peek == '(') {
          pos += 1
          val e = expr()
          ws()
          if (!takeKw("AS")) fail("expected AS in SELECT expression")
          ws()
          val v = varName()
          ws(); expect(')')
          proj += PExpr(e, v)
        } else go = false
      }
      if (proj.isEmpty) fail("empty SELECT projection")
      ws()
      takeKw("WHERE")
      val g = group()
      // solution modifiers
      val gb = scala.collection.mutable.ListBuffer.empty[String]
      var having: Option[SqExpr] = None
      ws()
      if (takeKw("GROUP")) {
        ws()
        if (!takeKw("BY")) fail("expected BY after GROUP")
        ws()
        while (peek == '?' || peek == '$') { gb += varName(); ws() }
        if (gb.isEmpty) fail("empty GROUP BY")
      }
      ws()
      if (takeKw("HAVING")) {
        ws(); expect('(')
        having = Some(expr())
        ws(); expect(')')
      }
      // OrderCondition ::= (ASC|DESC) BrackettedExpression
      //                  | Constraint (BrackettedExpression|BuiltInCall|FunctionCall)
      //                  | Var            — SPARQL 1.1 §18.2.4.4 / rdflib
      val ob = scala.collection.mutable.ListBuffer.empty[(SqExpr, Boolean)]
      ws()
      if (takeKw("ORDER")) {
        ws()
        if (!takeKw("BY")) fail("expected BY after ORDER")
        var more = true
        while (more) {
          ws()
          if (kwAt("LIMIT") || kwAt("OFFSET")) more = false
          else if (peek == '?' || peek == '$') ob += ((EVar(varName()), true))
          else if (takeKw("ASC")) { ws(); expect('('); val e = expr(); ws(); expect(')'); ob += ((e, true)) }
          else if (takeKw("DESC")) { ws(); expect('('); val e = expr(); ws(); expect(')'); ob += ((e, false)) }
          else if (peek == '(') { pos += 1; val e = expr(); ws(); expect(')'); ob += ((e, true)) }
          else if (pos < s.length && (isPnChar(peek) || peek == '<'))
            // builtin/function call key (e.g. STRLEN(?x), ex:fn(?x)); anything
            // unparseable here is a loud ParseError, never a silent loop exit
            ob += ((primary(), true))
          else more = false
        }
        if (ob.isEmpty) fail("empty ORDER BY")
      }
      // LIMIT/OFFSET may appear in either order (SPARQL LimitOffsetClauses)
      var lim: Option[Int] = None
      var off: Option[Int] = None
      var moreMods = true
      while (moreMods) {
        ws()
        if (lim.isEmpty && takeKw("LIMIT")) { ws(); lim = Some(integer()) }
        else if (off.isEmpty && takeKw("OFFSET")) { ws(); off = Some(integer()) }
        else moreMods = false
      }
      SqSelect(distinct, proj.toList, g, ob.toList, lim, gb.toList, having, off)
    }

    private def constructBody(): SqConstruct = {
      ws(); expect('{')
      val tmpl = scala.collection.mutable.ListBuffer.empty[SqTriple]
      ws()
      while (peek != '}') {
        tmpl ++= triplesSameSubject()
        ws()
        if (peek == '.') { pos += 1; ws() }
      }
      expect('}')
      ws()
      if (!takeKw("WHERE")) fail("expected WHERE in CONSTRUCT")
      SqConstruct(tmpl.toList, group())
    }

    private def group(): SqGroup = {
      ws(); expect('{')
      val elems = scala.collection.mutable.ListBuffer.empty[SqElem]
      var go = true
      while (go) {
        ws()
        if (peek == '}') { pos += 1; go = false }
        else if (peek == '{') {
          // group-or-union (possibly a nested sub-select)
          val first = groupOrSubSelect()
          var branches = List(first)
          ws()
          while (takeKw("UNION")) {
            branches = branches :+ groupAsGroup()
            ws()
          }
          first match {
            case Left(g) if branches.size == 1 => elems += SqUnion(List(g))
            case Left(g) => elems += SqUnion(g :: branches.tail.map(_.merge))
            case Right(sel) if branches.size == 1 => elems += SqSubSelect(sel)
            case Right(sel) => elems += SqUnion(SqGroup(List(SqSubSelect(sel))) :: branches.tail.map(_.merge))
          }
        } else if (takeKw("FILTER")) {
          ws()
          if (takeKw("NOT")) {
            ws()
            if (!takeKw("EXISTS")) fail("expected EXISTS after NOT")
            elems += SqFilter(EExists(group(), negated = true))
          } else if (takeKw("EXISTS")) {
            elems += SqFilter(EExists(group(), negated = false))
          } else {
            val needParen = peek == '('
            val e = if (needParen) { pos += 1; val x = expr(); ws(); expect(')'); x }
                    else expr() // e.g. FILTER bound($this)
            elems += SqFilter(e)
          }
        } else if (takeKw("BIND")) {
          ws(); expect('(')
          val e = expr()
          ws()
          if (!takeKw("AS")) fail("expected AS in BIND")
          ws()
          val v = varName()
          ws(); expect(')')
          elems += SqBind(e, v)
        } else if (takeKw("OPTIONAL")) {
          elems += SqOptional(group())
        } else if (takeKw("GRAPH")) {
          ws()
          val nm = if (peek == '?' || peek == '$') TVar(varName()) else TConst(Iri(iriOrPname()))
          elems += SqGraphPat(nm, group())
        } else if (takeKw("MINUS")) {
          elems += SqMinus(group())
        } else if (takeKw("VALUES")) {
          elems += valuesBlock()
        } else if (takeKw("SERVICE")) {
          throw new ValidationFailure("A SPARQL Constraint must not contain a federated query (SERVICE).")
        } else {
          elems ++= triplesSameSubject()
        }
        ws()
        if (go && peek == '.') { pos += 1 }
      }
      SqGroup(elems.toList)
    }

    /** DataBlock after VALUES (SPARQL grammar [62]-[65]): single-var or
      * full-row form; UNDEF leaves the position unbound. */
    private def valuesBlock(): SqValues = {
      ws()
      val vars = scala.collection.mutable.ListBuffer.empty[String]
      val multi = peek == '('
      if (multi) {
        pos += 1; ws()
        while (peek == '?' || peek == '$') { vars += varName(); ws() }
        expect(')')
      } else vars += varName()
      if (vars.isEmpty) fail("empty VALUES variable list")
      ws(); expect('{')
      val rows = scala.collection.mutable.ListBuffer.empty[List[Option[Node]]]
      ws()
      while (peek != '}' && pos < s.length) {
        if (multi) {
          expect('(')
          val row = scala.collection.mutable.ListBuffer.empty[Option[Node]]
          ws()
          while (peek != ')' && pos < s.length) { row += dataBlockValue(); ws() }
          expect(')')
          if (row.size != vars.size)
            fail(s"VALUES row arity ${row.size} != variable count ${vars.size}")
          rows += row.toList
        } else rows += List(dataBlockValue())
        ws()
      }
      expect('}')
      SqValues(vars.toList, rows.toList)
    }

    private def dataBlockValue(): Option[Node] = {
      ws()
      if (takeKw("UNDEF")) None
      else termOrVar("VALUES data") match {
        case TConst(n) => Some(n)
        case TVar(v) => fail(s"variable ?$v is not allowed in VALUES data")
      }
    }

    private def groupAsGroup(): Either[SqGroup, SqSelect] = groupOrSubSelect()

    private implicit class EitherMerge(e: Either[SqGroup, SqSelect]) {
      def merge: SqGroup = e match {
        case Left(g) => g
        case Right(sel) => SqGroup(List(SqSubSelect(sel)))
      }
    }

    private def groupOrSubSelect(): Either[SqGroup, SqSelect] = {
      ws()
      val save = pos // position of '{'
      expect('{')
      ws()
      if (takeKw("SELECT")) {
        val sel = selectBody()
        ws(); expect('}')
        Right(sel)
      } else {
        pos = save // rewind to '{' and parse as a normal group
        Left(group())
      }
    }

    private def triplesSameSubject(): List[SqTriple] = {
      val subj = termOrVar("subject")
      val out = scala.collection.mutable.ListBuffer.empty[SqTriple]
      var goVerb = true
      while (goVerb) {
        ws()
        val p = verb()
        var goObj = true
        while (goObj) {
          val o = termOrVar("object")
          out += SqTriple(subj, p, o)
          ws()
          if (peek == ',') { pos += 1 } else goObj = false
        }
        ws()
        if (peek == ';') {
          pos += 1; ws()
          // trailing ';' before '.' or '}' is legal
          if (peek == '.' || peek == '}') goVerb = false
        } else goVerb = false
      }
      out.toList
    }

    private def verb(): SqPred = {
      ws()
      if (peek == '?' || peek == '$') {
        val save = pos
        val v = varName()
        if (v == "PATH") PredShapePath
        else { pos = save; PredVar(varName()) }
      } else pathAlt() match {
        case PathIR.PPred(i) => PredIri(i)
        case other => PredPath(other)
      }
    }

    // SPARQL property-path grammar (predicate position)
    private def pathAlt(): PathIR = {
      val parts = scala.collection.mutable.ListBuffer(pathSeq())
      ws()
      while (peek == '|') { pos += 1; parts += pathSeq(); ws() }
      if (parts.size == 1) parts.head else PathIR.PAlt(parts.toList)
    }
    private def pathSeq(): PathIR = {
      val parts = scala.collection.mutable.ListBuffer(pathElt())
      ws()
      while (peek == '/') { pos += 1; parts += pathElt(); ws() }
      if (parts.size == 1) parts.head else PathIR.PSeq(parts.toList)
    }
    /** PathOneInPropertySet ::= iri | 'a' | '^' ( iri | 'a' ) */
    private def pathOneInSet(): (String, Boolean) = {
      ws()
      val inv = peek == '^'
      if (inv) pos += 1
      ws()
      val iri =
        if (peek == 'a' && (pos + 1 >= s.length ||
            (!isPnChar(s.charAt(pos + 1)) && s.charAt(pos + 1) != ':'))) {
          pos += 1; RDF.ty.value
        } else iriOrPname()
      (iri, inv)
    }

    /** '!' PathNegatedPropertySet (SPARQL 1.1 grammar [89]-[91]). */
    private def pathNegated(): PathIR = {
      ws()
      val items = scala.collection.mutable.ListBuffer.empty[(String, Boolean)]
      if (peek == '(') {
        pos += 1; ws()
        if (peek != ')') {
          items += pathOneInSet(); ws()
          while (peek == '|') { pos += 1; items += pathOneInSet(); ws() }
        }
        expect(')')
      } else items += pathOneInSet()
      val fwd = items.toList.filterNot(_._2).map(_._1)
      val inv = items.toList.filter(_._2).map(_._1)
      // no forward member at all (e.g. !^ex:p) means no forward matching;
      // `!()` excludes nothing, i.e. matches every forward edge
      PathIR.PNegSet(
        if (fwd.nonEmpty || items.isEmpty) Some(fwd) else None,
        if (inv.nonEmpty) Some(inv) else None)
    }

    private def pathElt(): PathIR = {
      ws()
      val inverted = peek == '^'
      if (inverted) pos += 1
      ws()
      val prim: PathIR =
        if (peek == '!') { pos += 1; pathNegated() }
        else if (peek == '(') { pos += 1; val p = pathAlt(); ws(); expect(')'); p }
        else if (peek == 'a' && (pos + 1 >= s.length ||
                 (!isPnChar(s.charAt(pos + 1)) && s.charAt(pos + 1) != ':'))) {
          pos += 1; PathIR.PPred(RDF.ty.value)
        }
        else PathIR.PPred(iriOrPname())
      val p = if (inverted) PathIR.invert(prim) else prim
      ws()
      peek match {
        case '*' => pos += 1; PathIR.PZeroOrMore(p)
        case '+' => pos += 1; PathIR.POneOrMore(p)
        // '?' is a modifier only when not immediately followed by a var name
        case '?' if pos + 1 >= s.length ||
            !(s.charAt(pos + 1).isLetterOrDigit || s.charAt(pos + 1) == '_') =>
          pos += 1; PathIR.PZeroOrOne(p)
        case _ => p
      }
    }

    private def termOrVar(what: String): SqTerm = {
      ws()
      if (peek == '?' || peek == '$') TVar(varName())
      else if (peek == '<') TConst(Iri(iriRef()))
      else if (peek == '"' || peek == '\'') TConst(literal())
      else if (peek == '_' && pos + 1 < s.length && s.charAt(pos + 1) == ':') {
        pos += 2
        val st = pos
        while (pos < s.length && isPnChar(s.charAt(pos))) pos += 1
        TConst(BNode(s.substring(st, pos)))
      } else if (peek.isDigit || peek == '+' || peek == '-') TConst(numericLiteral())
      else if (kwAt("true")) { pos += 4; TConst(Lit("true", XSD.boolean)) }
      else if (kwAt("false")) { pos += 5; TConst(Lit("false", XSD.boolean)) }
      else TConst(Iri(iriOrPname()))
    }

    // --------------------------------------------------------- expressions
    def expr(): SqExpr = orExpr()

    private def orExpr(): SqExpr = {
      var l = andExpr()
      var go = true
      while (go) {
        ws()
        if (s.regionMatches(pos, "||", 0, 2)) { pos += 2; l = EBin("||", l, andExpr()) }
        else go = false
      }
      l
    }
    private def andExpr(): SqExpr = {
      var l = cmpExpr()
      var go = true
      while (go) {
        ws()
        if (s.regionMatches(pos, "&&", 0, 2)) { pos += 2; l = EBin("&&", l, cmpExpr()) }
        else go = false
      }
      l
    }
    private def cmpExpr(): SqExpr = {
      val l = addExpr()
      ws()
      // `expr IN (a, b)` / `expr NOT IN (...)` desugar to chained value
      // equality (rdflib evaluates IN via '=' semantics); an empty list is
      // constant false / true. NOT EXISTS never reaches here — it is a
      // prefix form handled in primary().
      if (takeKw("IN")) return inList(l, negated = false)
      if (kwAt("NOT")) {
        val save = pos
        takeKw("NOT"); ws()
        if (takeKw("IN")) return inList(l, negated = true)
        pos = save
      }
      val ops = Seq("<=", ">=", "!=", "=", "<", ">")
      ops.find(o => s.regionMatches(pos, o, 0, o.length)) match {
        // a bare '<' that opens an IRI (no whitespace before '>') is not an
        // operator here; operands starting with IRIs are handled in primary()
        case Some("<") if looksLikeIri() => l
        case Some(o) => pos += o.length; EBin(o, l, addExpr())
        case None => l
      }
    }

    private def inList(l: SqExpr, negated: Boolean): SqExpr = {
      val args = argList()
      val or =
        if (args.isEmpty) EConst(Lit("false", XSD.boolean))
        else args.map(a => EBin("=", l, a): SqExpr).reduce((x, y) => EBin("||", x, y))
      if (negated) ENot(or) else or
    }
    private def looksLikeIri(): Boolean = {
      // at '<': IRI iff no whitespace before the closing '>'
      var i = pos + 1
      while (i < s.length && s.charAt(i) != '>' && !s.charAt(i).isWhitespace) i += 1
      i < s.length && s.charAt(i) == '>'
    }
    private def addExpr(): SqExpr = {
      var l = mulExpr()
      var go = true
      while (go) {
        ws()
        if (peek == '+') { pos += 1; l = EBin("+", l, mulExpr()) }
        else if (peek == '-' && !(pos + 1 < s.length && s.charAt(pos + 1).isDigit)) {
          pos += 1; l = EBin("-", l, mulExpr())
        } else go = false
      }
      l
    }
    private def mulExpr(): SqExpr = {
      var l = unary()
      var go = true
      while (go) {
        ws()
        if (peek == '*') { pos += 1; l = EBin("*", l, unary()) }
        else if (peek == '/') { pos += 1; l = EBin("/", l, unary()) }
        else go = false
      }
      l
    }
    private def unary(): SqExpr = {
      ws()
      if (peek == '!' && !(pos + 1 < s.length && s.charAt(pos + 1) == '=')) {
        pos += 1; ENot(unary())
      } else if (peek == '-' && !(pos + 1 < s.length && s.charAt(pos + 1).isDigit)) {
        pos += 1; ENeg(unary())
      } else if (peek == '+') { pos += 1; unary() }
      else primary()
    }
    private def primary(): SqExpr = {
      ws()
      if (peek == '(') { pos += 1; val e = expr(); ws(); expect(')'); e }
      else if (peek == '?' || peek == '$') EVar(varName())
      else if (peek == '"' || peek == '\'') EConst(literal())
      else if (peek == '<' && looksLikeIri()) EConst(Iri(iriRef()))
      else if (peek.isDigit || ((peek == '-' || peek == '+') &&
               pos + 1 < s.length && s.charAt(pos + 1).isDigit)) EConst(numericLiteral())
      else {
        // keyword call, boolean, EXISTS, or prefixed-name (constant or function)
        if (takeKw("NOT")) {
          ws()
          if (!takeKw("EXISTS")) fail("expected EXISTS after NOT in expression")
          return EExists(group(), negated = true)
        }
        if (takeKw("EXISTS")) return EExists(group(), negated = false)
        val st = pos
        while (pos < s.length && (isPnChar(s.charAt(pos)) || s.charAt(pos) == ':')) pos += 1
        while (pos > st && s.charAt(pos - 1) == '.') pos -= 1
        val word = s.substring(st, pos)
        if (word.isEmpty) fail(s"cannot parse expression at offset $pos")
        ws()
        if (word.contains(":")) {
          val iri = expandPname(word)
          if (peek == '(') EFnIri(iri, argList())
          else EConst(Iri(iri))
        } else if (peek == '(' &&
                   Set("COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT")
                     .contains(word.toUpperCase)) {
          pos += 1; ws()
          val dist = takeKw("DISTINCT")
          ws()
          val arg = if (peek == '*') { pos += 1; None } else Some(expr())
          ws()
          // GROUP_CONCAT(expr ; SEPARATOR = "sep")
          val sep =
            if (peek == ';') {
              pos += 1; ws()
              if (!takeKw("SEPARATOR")) fail("expected SEPARATOR in GROUP_CONCAT")
              ws(); expect('='); ws()
              Some(literal().lex)
            } else None
          ws(); expect(')')
          EAgg(word.toUpperCase, dist, arg, sep)
        } else if (peek == '(') {
          ECall(word.toUpperCase, argList())
        } else word.toLowerCase match {
          case "true" => EConst(Lit("true", XSD.boolean))
          case "false" => EConst(Lit("false", XSD.boolean))
          case other => fail(s"unknown identifier '$other' in expression")
        }
      }
    }
    private def argList(): List[SqExpr] = {
      expect('(')
      val args = scala.collection.mutable.ListBuffer.empty[SqExpr]
      ws()
      if (peek != ')') {
        args += expr()
        ws()
        while (peek == ',') { pos += 1; args += expr(); ws() }
      }
      expect(')')
      args.toList
    }

    // ------------------------------------------------------------- tokens
    private def ws(): Unit = {
      while (pos < s.length && s.charAt(pos).isWhitespace) pos += 1
    }
    private def peek: Char = if (pos < s.length) s.charAt(pos) else '\u0000'
    private def expect(c: Char): Unit = {
      ws()
      if (peek != c) fail(s"expected '$c'")
      pos += 1
    }
    private def kwAt(w: String): Boolean =
      s.regionMatches(true, pos, w, 0, w.length) &&
        (pos + w.length >= s.length || !isPnChar(s.charAt(pos + w.length)))
    private def takeKw(w: String): Boolean = {
      ws()
      if (kwAt(w) && !(pos + w.length < s.length && s.charAt(pos + w.length) == ':')) {
        pos += w.length; true
      } else false
    }
    private def varName(): String = {
      if (peek != '?' && peek != '$') fail("expected variable")
      pos += 1
      val st = pos
      while (pos < s.length && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
      if (pos == st) fail("empty variable name")
      s.substring(st, pos)
    }
    private def iriRef(): String = {
      ws()
      if (peek != '<') fail("expected <IRI>")
      pos += 1
      val st = pos
      while (pos < s.length && s.charAt(pos) != '>') pos += 1
      val v = s.substring(st, pos)
      expect('>')
      v
    }
    private def iriOrPname(): String = {
      ws()
      if (peek == '<') iriRef()
      else {
        val st = pos
        while (pos < s.length && (isPnChar(s.charAt(pos)) || s.charAt(pos) == ':')) pos += 1
        // a trailing '.' is the triple terminator, not part of the local name
        while (pos > st && s.charAt(pos - 1) == '.') pos -= 1
        val w = s.substring(st, pos)
        if (!w.contains(":")) fail(s"expected IRI or prefixed name, got '$w'")
        expandPname(w)
      }
    }
    private def expandPname(w: String): String = {
      val i = w.indexOf(':')
      val pfx = w.substring(0, i)
      val local = w.substring(i + 1)
      prefixes.get(pfx) match {
        case Some(ns) => ns + local
        case None => fail(s"undeclared prefix '$pfx:' in query")
      }
    }
    private def isPnChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '-' || c == '.'
    private def literal(): Lit = {
      val q = peek
      pos += 1
      val sb = new StringBuilder
      while (pos < s.length && s.charAt(pos) != q) {
        if (s.charAt(pos) == '\\' && pos + 1 < s.length) {
          pos += 1
          sb.append(s.charAt(pos) match {
            case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
            case '\\' => '\\'; case '"' => '"'; case '\'' => '\''
            case other => other
          })
        } else sb.append(s.charAt(pos))
        pos += 1
      }
      expect(q)
      val lex = sb.toString
      if (peek == '@') {
        pos += 1
        val st = pos
        while (pos < s.length && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '-')) pos += 1
        Lit(lex, "", s.substring(st, pos))
      } else if (pos + 1 < s.length && s.charAt(pos) == '^' && s.charAt(pos + 1) == '^') {
        pos += 2
        Lit(lex, iriOrPname())
      } else Lit(lex)
    }
    private def numericLiteral(): Lit = {
      val st = pos
      if (peek == '+' || peek == '-') pos += 1
      while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.' ||
        s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) pos += 1
      val lex = s.substring(st, pos)
      if (!lex.exists(_.isDigit)) fail("malformed numeric literal")
      if (lex.toLowerCase.contains('e')) Lit(lex, XSD.double)
      else if (lex.contains('.')) Lit(lex, XSD.decimal)
      else Lit(lex, XSD.integer)
    }
    private def integer(): Int = {
      ws()
      val st = pos
      while (pos < s.length && s.charAt(pos).isDigit) pos += 1
      // loud ParseError for a missing/oversized count (LIMIT/OFFSET), not
      // a bare NumberFormatException from "".toInt
      s.substring(st, pos).toIntOption.getOrElse(fail("expected integer"))
    }
    private def fail(msg: String): Nothing = {
      val ctx = s.substring(math.max(0, pos - 20), math.min(s.length, pos + 20))
      throw new ParseError(s"$msg at offset $pos near '...$ctx...'")
    }
  }

  // ----------------------------------------------- prefix declarations
  /** Collect sh:prefixes declarations for a query node
    * (sparql_query_helper.py:131-205). Simplification vs the reference:
    * declares are unioned globally across the shapes graph (ontology-scoped
    * and graph-name-scoped declares all land in one namespace map), which
    * matches every corpus fixture; rdf/rdfs/owl are always preset. */
  def collectPrefixes(sg: MemGraph, queryNode: Node): Map[String, String] = {
    val out = scala.collection.mutable.Map[String, String](
      "rdf" -> RDF.ns, "rdfs" -> RDFS.ns, "owl" -> "http://www.w3.org/2002/07/owl#")
    // the document's own namespace bindings (rdflib initNs injection)
    out ++= sg.nsPrefixes
    val declare = SH("declare")
    val declNodes =
      sg.objects(queryNode, SH("prefixes")).flatMap(pv => sg.objects(pv, declare)).toList ++
        sg.subjectObjects(declare).map(_._2).toList
    for (d <- declNodes.distinct) {
      (sg.value(d, SH("prefix")), sg.value(d, SH("namespace"))) match {
        case (Some(Lit(p, _, _)), Some(Lit(ns, _, _))) => out(p) = ns
        case _ =>
      }
    }
    out.toMap
  }
}
