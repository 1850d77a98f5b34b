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
