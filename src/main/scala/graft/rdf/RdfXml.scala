package graft.rdf

import scala.xml.{Elem, Node => XNode, Text, PCData}

/** RDF/XML reader — the striped-syntax subset real documents use (the
  * reference reads RDF/XML through rdflib's plugin; load.py:370-386 sniffs
  * `<?xml`/`<rdf:RDF`):
  *
  *   node elements: rdf:Description or typed elements, rdf:about / rdf:ID
  *   / rdf:nodeID / anonymous blank nodes, property attributes
  *   property elements: rdf:resource / rdf:nodeID objects, text literals
  *   with rdf:datatype / xml:lang, nested node elements,
  *   parseType="Resource" | "Literal" | "Collection", rdf:li containers
  *
  * Out of scope (rare in the wild): rdf:aboutEach/bagID (obsolete),
  * reification attributes (rdf:ID on property elements). */
object RdfXml {
  private val rdfNs = RDF.ns
  final class RdfXmlError(msg: String) extends RuntimeException(msg)

  def parseGraph(content: String, base: String = "", bnodePrefix: String = "x"): MemGraph = {
    val g = new MemGraph
    var bn = 0
    def fresh(): BNode = { bn += 1; BNode(s"$bnodePrefix$bn") }

    def xmlBase(e: Elem, inherited: String): String =
      e.attributes.collectFirst {
        case a if a.prefixedKey == "xml:base" => a.value.text
      }.getOrElse(inherited)

    def resolve(iri: String, b: String): String =
      if (iri.isEmpty) b
      else if (iri.contains(":") && !iri.startsWith("#")) iri
      else if (iri.startsWith("#")) b.takeWhile(_ != '#') + iri
      else if (b.endsWith("/") || b.endsWith("#")) b + iri
      else b + "/" + iri

    def attr(e: Elem, local: String): Option[String] =
      e.attributes.collectFirst {
        case a: scala.xml.PrefixedAttribute
          if e.getNamespace(a.pre) == rdfNs && a.key == local => a.value.text
      }

    def qnameIri(e: Elem): String = {
      val ns = e.namespace
      if (ns == null) throw new RdfXmlError(s"element ${e.label} has no namespace")
      ns + e.label
    }

    def langOf(e: Elem, inherited: String): String =
      e.attributes.collectFirst {
        case a if a.prefixedKey == "xml:lang" => a.value.text
      }.getOrElse(inherited)

    def childElems(e: XNode): Seq[Elem] = e.child.collect { case c: Elem => c }

    /** A node element → its subject; emits its triples. */
    def nodeElement(e: Elem, b0: String, lang0: String): Node = {
      val b = xmlBase(e, b0)
      val lang = langOf(e, lang0)
      val subj: Node =
        attr(e, "about").map(a => Iri(resolve(a, b)))
          .orElse(attr(e, "ID").map(id => Iri(resolve("#" + id, b))))
          .orElse(attr(e, "nodeID").map(BNode(_)))
          .getOrElse(fresh())
      // typed node element
      val qn = qnameIri(e)
      if (qn != rdfNs + "Description") g.add(subj, RDF.ty, Iri(qn))
      // property attributes (non-rdf, non-xml attrs = literal statements)
      for (a <- e.attributes) a match {
        case pa: scala.xml.PrefixedAttribute if !pa.pre.startsWith("xml") =>
          val ns = e.getNamespace(pa.pre)
          if (ns != null && !(ns == rdfNs &&
              Set("about", "ID", "nodeID", "parseType", "resource", "datatype").contains(pa.key))) {
            if (ns == rdfNs && pa.key == "type")
              g.add(subj, RDF.ty, Iri(resolve(pa.value.text, b)))
            else
              g.add(subj, Iri(ns + pa.key), Lit(pa.value.text, "", lang))
          }
        case _ => // unprefixed / xml: attributes carry no statements here
      }
      propertyElements(subj, e, b, lang)
      subj
    }

    /** The property elements of `e` asserted about `subj`. */
    def propertyElements(subj: Node, e: Elem, b: String, lang: String): Unit = {
      var liCounter = 0
      for (pe <- childElems(e)) {
        val peB = xmlBase(pe, b)
        val peLang = langOf(pe, lang)
        val predIri =
          if (qnameIri(pe) == rdfNs + "li") { liCounter += 1; rdfNs + s"_$liCounter" }
          else qnameIri(pe)
        val pred = Iri(predIri)
        val parseType = attr(pe, "parseType")
        val kids = childElems(pe)
        (attr(pe, "resource"), attr(pe, "nodeID"), parseType) match {
          case (Some(r), _, _) => g.add(subj, pred, Iri(resolve(r, peB)))
          case (_, Some(nid), _) => g.add(subj, pred, BNode(nid))
          case (_, _, Some("Resource")) =>
            // anonymous node whose property elements are pe's children
            val anon = fresh()
            g.add(subj, pred, anon)
            propertyElements(anon, pe, peB, peLang)
          case (_, _, Some("Literal")) =>
            val xml = pe.child.map(_.buildString(stripComments = true)).mkString
            g.add(subj, pred, Lit(xml, rdfNs + "XMLLiteral"))
          case (_, _, Some("Collection")) =>
            val items = kids.map(k => nodeElement(k, peB, peLang))
            val head = items.foldRight[Node](RDF.nil) { (item, rest) =>
              val cell = fresh()
              g.add(cell, RDF.first, item)
              g.add(cell, RDF.rest, rest)
              cell
            }
            g.add(subj, pred, head)
          case _ if kids.nonEmpty =>
            kids.foreach(k => g.add(subj, pred, nodeElement(k, peB, peLang)))
          case _ =>
            val text = pe.child.collect {
              case t: Text => t.data
              case p: PCData => p.data
            }.mkString
            val dt = attr(pe, "datatype").getOrElse("")
            g.add(subj, pred, Lit(text, dt, if (dt.isEmpty) peLang else ""))
        }
      }
    }

    val root = scala.xml.XML.loadString(content)
    val b0 = xmlBase(root, base)
    if (qnameIri(root) == rdfNs + "RDF")
      childElems(root).foreach(nodeElement(_, b0, ""))
    else nodeElement(root, b0, "")
    g
  }
}

/** RDF/XML serializer — the sink counterpart of [[RdfXml]] (the reference's
  * `-f xml` report format, cli.py:187). One rdf:Description per subject
  * (rdf:about / rdf:nodeID), property elements with rdf:resource /
  * rdf:nodeID / rdf:datatype / xml:lang; predicate namespaces are declared
  * once on the rdf:RDF root. Deterministic (sorted subjects/predicates).
  * Predicates whose IRI cannot split into a namespace + XML NCName local
  * part are not expressible in RDF/XML and raise an error. */
object RdfXmlWriter {
  final class RdfXmlWriteError(msg: String) extends RuntimeException(msg)

  private val ncName = "[A-Za-z_][A-Za-z0-9_.-]*"

  private def split(iri: String): (String, String) = {
    val i = math.max(iri.lastIndexOf('#'), iri.lastIndexOf('/'))
    if (i < 0 || i == iri.length - 1)
      throw new RdfXmlWriteError(s"predicate IRI not QName-splittable: $iri")
    val local = iri.substring(i + 1)
    if (!local.matches(ncName))
      throw new RdfXmlWriteError(s"predicate local name is not an XML NCName: $iri")
    (iri.substring(0, i + 1), local)
  }

  private def esc(s: String, inAttr: Boolean): String = {
    val b = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if (inAttr) b.replace("\"", "&quot;") else b
  }

  def write(g: MemGraph): String = {
    val triples = g.triples().toSeq
    val nss = triples.map(t => split(t.p.value)._1).distinct.sorted.zipWithIndex
      .map { case (ns, i) => ns -> s"n$i" }.toMap
    val sb = new StringBuilder("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n")
    sb.append("<rdf:RDF xmlns:rdf=\"http://www.w3.org/1999/02/22-rdf-syntax-ns#\"")
    for ((ns, p) <- nss.toSeq.sortBy(_._2))
      sb.append(s"""\n    xmlns:$p="${esc(ns, inAttr = true)}"""")
    sb.append(">\n")
    for (s <- g.allSubjects.toSeq.sortBy(_.key)) {
      val subjAttr = s match {
        case Iri(v) => s"""rdf:about="${esc(v, inAttr = true)}""""
        case BNode(id) => s"""rdf:nodeID="${esc(id, inAttr = true)}""""
        case l: Lit => throw new RdfXmlWriteError(s"literal subject: $l")
      }
      sb.append(s"  <rdf:Description $subjAttr>\n")
      for ((p, o) <- g.predicateObjects(s).toSeq.sortBy(x => (x._1.value, x._2.key))) {
        val (ns, local) = split(p.value)
        val tag = s"${nss(ns)}:$local"
        o match {
          case Iri(v) =>
            sb.append(s"""    <$tag rdf:resource="${esc(v, inAttr = true)}"/>\n""")
          case BNode(id) =>
            sb.append(s"""    <$tag rdf:nodeID="${esc(id, inAttr = true)}"/>\n""")
          case Lit(lex, dt, lang) =>
            val attrs =
              if (lang.nonEmpty) s""" xml:lang="${esc(lang, inAttr = true)}""""
              else if (dt.nonEmpty && dt != XSD.string)
                s""" rdf:datatype="${esc(dt, inAttr = true)}""""
              else ""
            sb.append(s"    <$tag$attrs>${esc(lex, inAttr = false)}</$tag>\n")
        }
      }
      sb.append("  </rdf:Description>\n")
    }
    sb.append("</rdf:RDF>\n")
    sb.toString
  }
}
