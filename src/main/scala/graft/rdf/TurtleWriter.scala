package graft.rdf

/** Turtle serializer with prefixes — report/graph output parity surface
  * (reference: report serialization, pyshacl/entrypoints.py:251-255).
  * Deterministic: subjects and predicates render sorted; bnode property
  * structure stays flat (ids printed) so round-trips are exact. */
object TurtleWriter {

  val defaultPrefixes: Map[String, String] = Map(
    "rdf" -> RDF.ns, "rdfs" -> RDFS.ns, "xsd" -> XSD.ns,
    "sh" -> "http://www.w3.org/ns/shacl#")

  private val localOk = "[A-Za-z_][A-Za-z0-9_-]*".r

  def write(g: MemGraph, prefixes: Map[String, String] = defaultPrefixes): String = {
    val used = scala.collection.mutable.Set.empty[String]
    def curie(iri: String): Option[String] =
      prefixes.collectFirst {
        case (p, ns) if iri.startsWith(ns) && localOk.matches(iri.stripPrefix(ns)) =>
          used += p
          s"$p:${iri.stripPrefix(ns)}"
      }
    def node(n: Node): String = n match {
      case Iri(v) =>
        if (v == RDF.ty.value) "a" // only in predicate position; handled below
        else curie(v).getOrElse(s"<$v>")
      case BNode(id) => s"_:$id"
      case Lit(lex, dt, lang) =>
        val b = "\"" + NTriplesWriter.escape(lex) + "\""
        if (lang.nonEmpty) s"$b@$lang"
        else if (dt.isEmpty) b
        else if (dt == XSD.integer && lex.matches("[+-]?[0-9]+")) lex
        else if (dt == XSD.boolean && (lex == "true" || lex == "false")) lex
        else if (dt == XSD.decimal && lex.matches("[+-]?[0-9]*\\.[0-9]+")) lex
        else s"$b^^${curie(dt).getOrElse(s"<$dt>")}"
    }
    def objNode(n: Node): String = n match {
      case Iri(v) => curie(v).getOrElse(s"<$v>")
      case other => node(other)
    }
    val body = new StringBuilder
    val subjects = g.allSubjects.toSeq.sortBy(_.key)
    for (s <- subjects) {
      val pos = g.predicateObjects(s).toSeq
        .groupBy(_._1).toSeq.sortBy(_._1.value)
      if (pos.nonEmpty) {
        body.append(objNode(s)).append(" ")
        val rendered = pos.map { case (p, os) =>
          val pStr = if (p == RDF.ty) "a" else objNode(p)
          val oStr = os.map(x => objNode(x._2)).sorted.mkString(", ")
          s"$pStr $oStr"
        }
        body.append(rendered.mkString(" ;\n    ")).append(" .\n")
      }
    }
    val header = prefixes.toSeq.filter(x => used.contains(x._1)).sortBy(_._1)
      .map { case (p, ns) => s"@prefix $p: <$ns> ." }.mkString("\n")
    (if (header.nonEmpty) header + "\n\n" else "") + body.toString
  }
}
