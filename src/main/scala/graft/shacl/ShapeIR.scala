package graft.shacl

import graft.rdf._

/** Driver-side compiled shape IR — the Spark analogue of the reference's
  * Shape cache (/root/reference/pyshacl/shapes_graph.py:202-348 +
  * /root/reference/pyshacl/shape.py:52-127). Compiled once per validation
  * and closed over by the generated DataFrame plans.
  */
sealed trait PathIR
object PathIR {
  final case class PPred(p: String) extends PathIR
  final case class PInv(inner: PathIR) extends PathIR
  final case class PSeq(parts: List[PathIR]) extends PathIR
  final case class PAlt(alts: List[PathIR]) extends PathIR
  final case class PZeroOrMore(inner: PathIR) extends PathIR
  final case class POneOrMore(inner: PathIR) extends PathIR
  final case class PZeroOrOne(inner: PathIR) extends PathIR
  /** SPARQL negated property set `!(p1|…|^q1|…)` (SPARQL 1.1 §9.1; not part
    * of SHACL's path vocabulary — reachable only from query text). `fwd` =
    * Some(excluded forward predicates) when the set had any non-inverse
    * member (or was empty: `!()` matches every forward edge); `inv`
    * likewise for `^`-members. */
  final case class PNegSet(fwd: Option[List[String]], inv: Option[List[String]]) extends PathIR

  /** Push inversion down to predicates (inverse of inverse cancels —
    * /root/reference/pyshacl/helper/expression_helper.py:76-81). */
  def invert(p: PathIR): PathIR = p match {
    case PPred(_) => PInv(p)
    case PInv(inner) => inner
    case PSeq(parts) => PSeq(parts.reverse.map(invert))
    case PAlt(alts) => PAlt(alts.map(invert))
    case PZeroOrMore(i) => PZeroOrMore(invert(i))
    case POneOrMore(i) => POneOrMore(invert(i))
    case PZeroOrOne(i) => PZeroOrOne(invert(i))
    case PNegSet(f, i) => PNegSet(i, f) // ^!(p|^q) ≡ !(q|^p)
  }

  /** SPARQL-ish rendering for messages/debugging
    * (cf. /root/reference/pyshacl/helper/path_helper.py:12-104). */
  def render(p: PathIR): String = p match {
    case PPred(x) => s"<$x>"
    case PInv(i) => s"^${render(i)}"
    case PSeq(parts) => parts.map(render).mkString("/")
    case PAlt(alts) => "(" + alts.map(render).mkString("|") + ")"
    case PZeroOrMore(i) => s"${render(i)}*"
    case POneOrMore(i) => s"${render(i)}+"
    case PZeroOrOne(i) => s"${render(i)}?"
    case PNegSet(f, i) =>
      "!(" + (f.getOrElse(Nil).map(x => s"<$x>") ++
        i.getOrElse(Nil).map(x => s"^<$x>")).mkString("|") + ")"
  }
}

/** One constraint component instance on a shape. `Node` references into the
  * shapes graph are kept so the report builder can clone original structures
  * (paths, shape bnodes) into the report. */
sealed trait ConstraintIR
object ConstraintIR {
  final case class CClass(classes: List[Node]) extends ConstraintIR
  final case class CDatatype(dt: Iri) extends ConstraintIR
  final case class CNodeKind(kind: Iri) extends ConstraintIR
  final case class CMinCount(n: Int) extends ConstraintIR
  final case class CMaxCount(n: Int) extends ConstraintIR
  // op: -2 minExclusive, -1 minInclusive(violate if cmp<0), +1 maxInclusive, +2 maxExclusive
  final case class CRange(op: Int, bound: Lit, component: Iri) extends ConstraintIR
  final case class CMinLength(n: Int) extends ConstraintIR
  final case class CMaxLength(n: Int) extends ConstraintIR
  final case class CPattern(pattern: String, flags: Option[String]) extends ConstraintIR
  final case class CLanguageIn(langs: List[String]) extends ConstraintIR
  final case object CUniqueLang extends ConstraintIR
  final case class CEquals(props: List[Iri]) extends ConstraintIR
  final case class CDisjoint(props: List[Iri]) extends ConstraintIR
  final case class CLessThan(props: List[Iri], orEquals: Boolean) extends ConstraintIR
  final case class CNot(shapes: List[Node]) extends ConstraintIR
  final case class CAnd(lists: List[List[Node]]) extends ConstraintIR
  final case class COr(lists: List[List[Node]]) extends ConstraintIR
  final case class CXone(lists: List[List[Node]]) extends ConstraintIR
  final case class CNode(shapes: List[Node]) extends ConstraintIR
  final case class CProperty(shapes: List[Node]) extends ConstraintIR
  final case class CQualified(shape: Node, min: Option[Int], max: Option[Int],
                              disjoint: Boolean) extends ConstraintIR
  final case class CClosed(ignored: List[Node]) extends ConstraintIR
  final case class CHasValue(values: List[Node]) extends ConstraintIR
  final case class CIn(values: List[Node]) extends ConstraintIR
  final case class CExpression(exprs: List[Node]) extends ConstraintIR
  /** sh:sparql SELECT constraints (sparql_based_constraints.py:22-110). */
  final case class CSparql(cs: List[SparqlConstraintIR]) extends ConstraintIR
  /** A custom SPARQL constraint component bound to this shape
    * (sparql_based_constraint_components.py:26-424). */
  final case class CCustom(b: BoundValidatorIR) extends ConstraintIR
}

final case class SparqlConstraintIR(
  node: Node,                    // sh:sparql object → sh:sourceConstraint
  select: String,
  messages: List[Lit],
  deactivated: Boolean,
  prefixes: Map[String, String])

final case class ComponentParamIR(name: String, path: Iri, optional: Boolean)

final case class CustomComponentIR(
  node: Node,
  params: List[ComponentParamIR],
  validators: List[Node],
  nodeValidators: List[Node],
  propertyValidators: List[Node])

/** A component validator selected for one shape, with parameter values
  * bound (make_validator_for_shape,
  * sparql_based_constraint_components.py:390-424). */
final case class BoundValidatorIR(
  componentNode: Node,
  validatorNode: Node,
  isAsk: Boolean,
  query: String,
  messages: List[Lit],           // validator sh:message, params substituted
  prefixes: Map[String, String],
  paramBinds: Map[String, Node])

/** sh:target with a SPARQL SELECT body: either a direct sh:SPARQLTarget or
  * an instance of a sh:SPARQLTargetType with bound parameters
  * (shape.py:267-319 advanced_target + target.py:136-180). */
final case class SparqlTargetIR(
  node: Node,
  select: String,
  prefixes: Map[String, String],
  params: Map[String, Node])

final case class TargetsIR(
  nodes: List[Node],
  classes: List[Node],
  implicitClass: List[Node],
  subjectsOf: List[Iri],
  objectsOf: List[Iri],
  sparql: List[SparqlTargetIR] = Nil
) {
  def isEmpty: Boolean =
    nodes.isEmpty && classes.isEmpty && implicitClass.isEmpty &&
      subjectsOf.isEmpty && objectsOf.isEmpty && sparql.isEmpty
}

final case class ShapeIR(
  id: Node,
  isPropertyShape: Boolean,
  path: Option[PathIR],
  pathNode: Option[Node], // original sh:path object (for report cloning)
  targets: TargetsIR,
  constraints: List[ConstraintIR],
  severity: Iri,
  messages: List[Lit],
  deactivated: Boolean,
  order: BigDecimal
)

final class ShapeLoadException(msg: String) extends RuntimeException(msg)

/** Harvests shapes from a shapes graph into ShapeIR, mirroring the spec
  * rule implemented at /root/reference/pyshacl/shapes_graph.py:202-348. */
final class ShapeCompiler(g: MemGraph) {
  import ConstraintIR._

  private def err(m: String): Nothing = throw new ShapeLoadException(m)

  def compile(): Map[Node, ShapeIR] = {
    val definedNode = g.subjects(RDF.ty, SH.NodeShape).toSet
    val definedProp = g.subjects(RDF.ty, SH.PropertyShape).toSet
    for (s <- definedNode)
      if (g.objects(s, SH.path).nonEmpty)
        err("A shape defined as a NodeShape cannot be the subject of a 'sh:path' predicate.")
    for (s <- definedProp) {
      if (definedNode.contains(s))
        err("A shape defined as a NodeShape cannot also be defined as a PropertyShape.")
      val pv = g.objects(s, SH.path).toList
      if (pv.isEmpty) err("A shape defined as a PropertyShape must include one `sh:path` property.")
      if (pv.size > 1) err("A PropertyShape cannot have more than one 'sh:path' property.")
    }
    val subjectShapes =
      (g.subjects(SH.targetClass).toSet ++ g.subjects(SH.targetNode) ++
        g.subjects(SH.targetObjectsOf) ++ g.subjects(SH.targetSubjectsOf) ++
        g.subjects(SH.target) ++
        g.subjects(SH.property) ++ g.subjects(SH.node))
    val valueShapes =
      (g.subjectObjects(SH.property).map(_._2).toSet ++
        g.subjectObjects(SH.node).map(_._2) ++
        g.subjectObjects(SH.notP).map(_._2) ++
        g.subjectObjects(SH.qualifiedValueShape).map(_._2)) ++
        (g.subjectObjects(SH.andP).map(_._2).toSet ++
          g.subjectObjects(SH.orP).map(_._2) ++
          g.subjectObjects(SH.xone).map(_._2)).flatMap { lst =>
          val items = g.items(lst)
          if (items.isEmpty)
            err("A Shape-Expecting & List-Expecting predicate should get a well-formed RDF list with 1 or more members.")
          items
        }
    val all = definedNode ++ definedProp ++ subjectShapes ++ valueShapes
    all.iterator.map { s =>
      val pathVals = g.objects(s, SH.path).toList
      val isProp =
        if (definedProp.contains(s)) true
        else if (definedNode.contains(s)) false
        else pathVals.size match {
          case 0 => false
          case 1 => true
          case _ => err("An implicit PropertyShape cannot have more than one 'sh:path' predicate.")
        }
      s -> compileShape(s, isProp, pathVals.headOption)
    }.toMap
  }

  private def compileShape(id: Node, isProp: Boolean, pathNode: Option[Node]): ShapeIR = {
    val severity = g.value(id, SH.severity) match {
      case Some(i: Iri) => i
      case _ => SH.Violation
    }
    val messages = g.objects(id, SH.message).collect { case l: Lit => l }.toList
    // strict bool in shapes graphs: only "true" is truthy —
    // /root/reference/pyshacl/monkey/__init__.py:16-21
    val deactivated = g.value(id, SH.deactivated).exists {
      case Lit(lex, dt, _) => lex == "true" && (dt.isEmpty || dt == XSD.boolean)
      case _ => false
    }
    val order = g.value(id, SH.order) match {
      case Some(Lit(lex, dt, _)) if dt.isEmpty || XSD.numericTypes.contains(dt) =>
        try BigDecimal(lex) catch { case _: Throwable => BigDecimal(0) }
      case Some(_) => err("A SHACL Shape order must be a numeric literal.")
      case None => BigDecimal(0)
    }
    val targets = TargetsIR(
      nodes = g.objects(id, SH.targetNode).toList,
      classes = g.objects(id, SH.targetClass).toList,
      implicitClass = implicitClassTargets(id),
      subjectsOf = g.objects(id, SH.targetSubjectsOf).collect { case i: Iri => i }.toList,
      objectsOf = g.objects(id, SH.targetObjectsOf).collect { case i: Iri => i }.toList,
      sparql = g.objects(id, SH.target).toList.map(parseAdvancedTarget)
    )
    ShapeIR(id, isProp, pathNode.map(parsePath(_)), pathNode, targets,
      compileConstraints(id, isProp), severity, messages, deactivated, order)
  }

  /** sh:target object → SPARQL target IR (shape.py:267-319): a node with
    * sh:select (or typed sh:SPARQLTarget) is a direct target; otherwise one
    * of its rdf:types must be a sh:SPARQLTargetType whose parameters bind
    * from the declaration node (target.py:136-180). */
  private def parseAdvancedTarget(c: Node): SparqlTargetIR = {
    val types = g.objects(c, RDF.ty).toSet
    val direct = g.value(c, SH.select)
    if (direct.isDefined || types.contains(SH.SPARQLTarget)) {
      val sel = direct match {
        case Some(Lit(lex, _, _)) => lex
        case _ => err("SPARQLTarget must have exactly one sh:select.")
      }
      SparqlTargetIR(c, sel, Sparql.collectPrefixes(g, c), Map.empty)
    } else {
      val tt = types.find(t => g.objects(t, RDF.ty).contains(SH.SPARQLTargetType))
        .getOrElse(err(s"None of these types match a TargetType: ${types.mkString(" ")}"))
      val sel = g.value(tt, SH.select) match {
        case Some(Lit(lex, _, _)) => lex
        case _ => err("SPARQLTargetType must have a value for sh:select.")
      }
      val params = g.objects(tt, SH.parameter).toList.flatMap { p =>
        val path = g.value(p, SH.path) match {
          case Some(i: Iri) => i
          case _ => err("TargetType parameter must have an IRI sh:path.")
        }
        val name = path.value.split("[#/]").last
        val optional = g.value(p, SH.optionalP).exists {
          case Lit("true", _, _) => true; case _ => false
        }
        g.value(c, path) match {
          case Some(v) => Some(name -> v)
          case None if optional => None
          case None => err(s"sh:target does not have a value for $path")
        }
      }.toMap
      SparqlTargetIR(c, sel, Sparql.collectPrefixes(g, tt), params)
    }
  }

  /** Custom SPARQL constraint components declared in this shapes graph
    * (shapes_graph.py:106-119: instances of sh:ConstraintComponent or of
    * its declared subclasses, minus the built-in sh: namespace). */
  lazy val customComponents: List[CustomComponentIR] = {
    val direct = g.subjects(RDF.ty, SH.ConstraintComponent).toSet
    val subclasses = g.subjects(RDFS.subClassOf, SH.ConstraintComponent).toSet
    val viaSub = subclasses.flatMap(sc => g.subjects(RDF.ty, sc))
    (direct ++ viaSub).toList
      .filterNot { case Iri(v) => v.startsWith(SH.ns); case _ => false }
      .sortBy(_.key)
      .map { cnode =>
        val params = g.objects(cnode, SH.parameter).toList.map { p =>
          val path = g.value(p, SH.path) match {
            case Some(i: Iri) => i
            case _ => err(s"Constraint component parameter on $cnode must have an IRI sh:path.")
          }
          val name = path.value.split("[#/]").last
          if (Set("this", "shapesGraph", "currentShape", "path", "PATH", "value").contains(name))
            err(s"Parameter name $name cannot be used.")
          val optional = g.value(p, SH.optionalP).exists {
            case Lit("true", _, _) => true; case _ => false
          }
          ComponentParamIR(name, path, optional)
        }.sortBy(_.name)
        CustomComponentIR(cnode, params,
          g.objects(cnode, SH.validator).toList,
          g.objects(cnode, SH.nodeValidator).toList,
          g.objects(cnode, SH.propertyValidator).toList)
      }
      .filter(c => c.params.nonEmpty &&
        (c.validators.nonEmpty || c.nodeValidators.nonEmpty || c.propertyValidators.nonEmpty))
  }

  /** Bind a component's validator to one shape
    * (make_validator_for_shape, sparql_based_constraint_components.py:390-424):
    * property shapes prefer sh:propertyValidator (SELECT), node shapes
    * sh:nodeValidator (SELECT), both fall back to sh:validator (ASK). */
  private def bindComponent(comp: CustomComponentIR, shapeId: Node,
                            isProp: Boolean): Option[BoundValidatorIR] = {
    // the component applies iff every mandatory parameter has a value
    val binds = comp.params.flatMap(p => g.value(shapeId, p.path).map(v => p.name -> v)).toMap
    val mandatory = comp.params.filterNot(_.optional).map(_.name)
    if (binds.isEmpty || !mandatory.forall(binds.contains)) return None
    val (vnode, mustBeAsk) =
      if (isProp && comp.propertyValidators.nonEmpty) (comp.propertyValidators.head, false)
      else if (!isProp && comp.nodeValidators.nonEmpty) (comp.nodeValidators.head, false)
      else if (comp.validators.nonEmpty) (comp.validators.head, true)
      else err("Cannot select a validator to use, according to the rules.")
    val askText = g.value(vnode, SH.ask).collect { case Lit(lex, _, _) => lex }
    val selText = g.value(vnode, SH.select).collect { case Lit(lex, _, _) => lex }
    val (isAsk, query) =
      if (mustBeAsk)
        (true, askText.getOrElse(err("AskValidator must have exactly one value for sh:ask.")))
      else
        (false, selText.getOrElse(err("SelectValidator must have exactly one value for sh:select.")))
    val rawMsgs = g.objects(vnode, SH.message).collect { case l: Lit => l }.toList
    val msgs = rawMsgs.map(m => substituteParams(m, binds))
    Some(BoundValidatorIR(comp.node, vnode, isAsk, query, msgs,
      Sparql.collectPrefixes(g, vnode), binds))
  }

  /** {$param} / {?param} message substitution (bind_messages,
    * sparql_query_helper.py:104-129); first occurrence per variable, like
    * the reference. Dynamic this/value/path substitution is not performed
    * (the conformance comparator never inspects those messages). */
  private def substituteParams(m: Lit, binds: Map[String, Node]): Lit = {
    var lex = m.lex
    for ((name, v) <- binds) {
      val repl = v match {
        case Lit(l, _, _) => l
        case Iri(i) => i
        case b: BNode => b.id
      }
      lex = lex.replaceFirst(
        java.util.regex.Pattern.quote(s"{$$$name}"), java.util.regex.Matcher.quoteReplacement(repl))
      lex = lex.replaceFirst(
        java.util.regex.Pattern.quote(s"{?$name}"), java.util.regex.Matcher.quoteReplacement(repl))
    }
    Lit(lex, m.dt, m.lang)
  }

  /** Implicit class target: shape typed as rdfs:Class (or a shapes-graph
    * subclass of it) targets its own instances —
    * /root/reference/pyshacl/shape.py:237-244. The reference injects
    * system triples into every shapes graph (shapes_graph.py:38), notably
    * owl:Class ⊑ rdfs:Class — so `a owl:Class` shapes are implicit class
    * targets too (issue test_199 depends on this). */
  private def implicitClassTargets(id: Node): List[Node] = {
    val classLike = g.subjects(RDFS.subClassOf, RDFS.Class).toSet +
      RDFS.Class + Iri("http://www.w3.org/2002/07/owl#Class")
    if (g.objects(id, RDF.ty).exists(classLike.contains)) List(id) else Nil
  }

  /** Mirrors value_nodes_from_path dispatch order
    * (/root/reference/pyshacl/helper/expression_helper.py:31-155): an
    * rdf:first list wins over sh:inversePath etc. when both are present;
    * the two-member minimum applies only to the top-level sequence. */
  def parsePath(node: Node, depth: Int = 0): PathIR = node match {
    case Iri(v) => PathIR.PPred(v)
    case b: BNode if g.value(b, RDF.first).isDefined =>
      val items = g.items(b)
      if (depth == 0 && items.size < 2)
        err("A list of SHACL Paths must contain at least two path items.")
      PathIR.PSeq(items.map(parsePath(_, depth + 1)))
    case b: BNode =>
      g.value(b, SH.inversePath).map(inner => PathIR.invert(parsePath(inner, depth + 1)))
        .orElse(g.value(b, SH.alternativePath).map { lst =>
          val items = g.items(lst)
          if (items.size < 2) err("List of SHACL alternate paths must have at least two path items.")
          PathIR.PAlt(items.map(parsePath(_, depth + 1)))
        })
        .orElse(g.value(b, SH.zeroOrMorePath).map(i => PathIR.PZeroOrMore(parsePath(i, depth + 1))))
        .orElse(g.value(b, SH.oneOrMorePath).map(i => PathIR.POneOrMore(parsePath(i, depth + 1))))
        .orElse(g.value(b, SH.zeroOrOnePath).map(i => PathIR.PZeroOrOne(parsePath(i, depth + 1))))
        .getOrElse(err(s"Cannot parse SHACL path node $b"))
    case other => err(s"Cannot parse SHACL path node $other")
  }

  private def intParam(v: Node, what: String): Int = v match {
    case Lit(lex, _, _) =>
      try lex.trim.toInt catch { case _: Throwable => err(s"$what must be an integer literal") }
    case _ => err(s"$what must be an integer literal")
  }

  private def compileConstraints(id: Node, isProp: Boolean): List[ConstraintIR] = {
    val out = scala.collection.mutable.ListBuffer.empty[ConstraintIR]
    def objs(p: Iri): List[Node] = g.objects(id, p).toList

    val classes = objs(SH.classP)
    if (classes.nonEmpty) out += CClass(classes)

    objs(SH.datatype) match {
      case Nil =>
      case List(i: Iri) => out += CDatatype(i)
      case List(_) => err("sh:datatype value must be an IRI")
      case _ => err("DatatypeConstraintComponent must have at most one sh:datatype predicate.")
    }
    objs(SH.nodeKind) match {
      case Nil =>
      case List(i: Iri) => out += CNodeKind(i)
      case _ => err("NodeKindConstraintComponent must have at most one sh:nodeKind predicate.")
    }
    objs(SH.minCount).foreach(v => out += CMinCount(intParam(v, "sh:minCount")))
    objs(SH.maxCount).foreach(v => out += CMaxCount(intParam(v, "sh:maxCount")))

    def range(p: Iri, op: Int, comp: Iri): Unit = objs(p).foreach {
      case l: Lit => out += CRange(op, l, comp)
      case _ => err(s"${p.value} must have a literal value")
    }
    range(SH.minExclusive, -2, SH.MinExclusiveConstraintComponent)
    range(SH.minInclusive, -1, SH.MinInclusiveConstraintComponent)
    range(SH.maxInclusive, 1, SH.MaxInclusiveConstraintComponent)
    range(SH.maxExclusive, 2, SH.MaxExclusiveConstraintComponent)

    objs(SH.minLength) match {
      case Nil =>
      case List(v) => out += CMinLength(intParam(v, "sh:minLength"))
      case _ => err("MinLengthConstraintComponent must have at most one sh:minLength predicate.")
    }
    objs(SH.maxLength) match {
      case Nil =>
      case List(v) => out += CMaxLength(intParam(v, "sh:maxLength"))
      case _ => err("MaxLengthConstraintComponent must have at most one sh:maxLength predicate.")
    }
    val pats = objs(SH.pattern)
    if (pats.nonEmpty) {
      val flags = objs(SH.flags).collectFirst { case Lit(lex, _, _) => lex }
      pats.foreach {
        case Lit(lex, _, _) => out += CPattern(lex, flags)
        case _ => err("PatternConstraintComponent sh:pattern must be a literal")
      }
    }
    objs(SH.languageIn) match {
      case Nil =>
      case List(lst) =>
        out += CLanguageIn(g.items(lst).collect { case Lit(lex, _, _) => lex })
      case _ => err("LanguageInConstraintComponent must have at most one sh:languageIn predicate.")
    }
    objs(SH.uniqueLang) match {
      case Nil =>
      case List(Lit("true", dt, _)) if dt.isEmpty || dt == XSD.boolean => out += CUniqueLang
      case List(Lit(_, dt, _)) if dt.isEmpty || dt == XSD.boolean => // false: no-op
      case List(_) => err("UniqueLangConstraintComponent must have an RDF Literal of type boolean as its sh:uniqueLang.")
      case _ => err("UniqueLangConstraintComponent must have at most one sh:uniqueLang predicate.")
    }
    val eqs = objs(SH.equalsP).map {
      case i: Iri => i
      case _ => err("Value of sh:equals MUST be a URI Identifier")
    }
    if (eqs.nonEmpty) out += CEquals(eqs)
    val disj = objs(SH.disjoint).map {
      case i: Iri => i
      case _ => err("Value of sh:disjoint MUST be a URI Identifier")
    }
    if (disj.nonEmpty) out += CDisjoint(disj)
    val lts = objs(SH.lessThan).map {
      case i: Iri => i
      case _ => err("Value of sh:lessThan MUST be a URI Identifier.")
    }
    if (lts.nonEmpty) out += CLessThan(lts, orEquals = false)
    val ltes = objs(SH.lessThanOrEquals).map {
      case i: Iri => i
      case _ => err("Value of sh:lessThanOrEquals MUST be a URI Identifier.")
    }
    if (ltes.nonEmpty) out += CLessThan(ltes, orEquals = true)

    val nots = objs(SH.notP)
    if (nots.nonEmpty) out += CNot(nots)
    val ands = objs(SH.andP).map(g.items)
    if (ands.nonEmpty) out += CAnd(ands)
    val ors = objs(SH.orP).map(g.items)
    if (ors.nonEmpty) out += COr(ors)
    val xones = objs(SH.xone).map(g.items)
    if (xones.nonEmpty) out += CXone(xones)
    val nodes = objs(SH.node)
    if (nodes.nonEmpty) out += CNode(nodes)
    val props = objs(SH.property)
    if (props.nonEmpty) out += CProperty(props)

    val qvs = objs(SH.qualifiedValueShape)
    if (qvs.nonEmpty) {
      val min = objs(SH.qualifiedMinCount).headOption.map(intParam(_, "sh:qualifiedMinCount"))
      val max = objs(SH.qualifiedMaxCount).headOption.map(intParam(_, "sh:qualifiedMaxCount"))
      val dj = objs(SH.qualifiedValueShapesDisjoint).exists {
        case Lit("true", _, _) => true
        case _ => false
      }
      if (min.isEmpty && max.isEmpty)
        err("QualifiedValueShape must have at least one of sh:qualifiedMinCount or sh:qualifiedMaxCount")
      qvs.foreach(v => out += CQualified(v, min, max, dj))
    }

    objs(SH.closed) match {
      case Nil =>
        // other_constraints.py:117-121: ignoredProperties without closed
        if (objs(SH.ignoredProperties).nonEmpty)
          err("ClosedConstraintComponent: You can only use sh:ignoredProperties on a Closed Shape (sh:closed).")
      case List(Lit("true", dt, _)) if dt.isEmpty || dt == XSD.boolean =>
        val ignored = objs(SH.ignoredProperties).flatMap(g.items)
        out += CClosed(ignored)
      case List(Lit(_, dt, _)) if dt.isEmpty || dt == XSD.boolean => // false: no-op
      case _ => err("sh:closed must be a boolean literal")
    }
    val hvs = objs(SH.hasValue)
    if (hvs.nonEmpty) out += CHasValue(hvs)
    objs(SH.inP) match {
      case Nil =>
      case List(lst) => out += CIn(g.items(lst))
      case _ => err("InConstraintComponent must have at most one sh:in predicate.")
    }
    val exprs = objs(SH.expression)
    if (exprs.nonEmpty) out += CExpression(exprs)

    // sh:sparql constraints (sparql_based_constraints.py:33-88)
    val sparqls = objs(SH.sparql)
    if (sparqls.nonEmpty) {
      val irs = sparqls.map { sn =>
        val sel = g.objects(sn, SH.select).toList match {
          case List(Lit(lex, _, _)) => lex
          case Nil => err("SPARQLConstraintComponent value for sh:select must have at least one sh:select predicate.")
          case List(_) => err("SPARQLConstraintComponent value for sh:select must be a Literal with type xsd:string.")
          case _ => err("SPARQLConstraintComponent value for sh:select must have at most one sh:select predicate.")
        }
        val msgs = g.objects(sn, SH.message).collect { case l: Lit => l }.toList
        val deact = g.value(sn, SH.deactivated).exists {
          case Lit("true", _, _) => true; case _ => false
        }
        SparqlConstraintIR(sn, sel, msgs, deact, Sparql.collectPrefixes(g, sn))
      }
      out += CSparql(irs)
    }

    // custom SPARQL constraint components bound to this shape
    for (comp <- customComponents; bound <- bindComponent(comp, id, isProp))
      out += CCustom(bound)
    out.toList
  }
}
