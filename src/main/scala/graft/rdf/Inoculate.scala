package graft.rdf

/** pySHACL "inoculation": the ont_graph mixin copies ONLY RDFS/OWL axioms
  * into the data graph — not arbitrary instance assertions
  * (/root/reference/pyshacl/rdfutil/inoculate.py:19-110):
  *  - subjects typed as a known RDFS/OWL class get that type triple copied
  *    (shallow), EXCEPT owl:NamedIndividual subjects which are deep-cloned
  *    whole (all their triples, recursively through blank nodes);
  *  - every (s, o) pair of a known RDFS/OWL predicate is copied (blank
  *    endpoints cloned with their structure);
  *  - finally, triples pointing AT a copied NamedIndividual are copied.
  * Issue test_170 turns exactly on this: dropping owl:NamedIndividual from
  * an ontology resource stops its vcard details from reaching the data
  * graph, flipping conformance. */
object Inoculate {
  private val owl = "http://www.w3.org/2002/07/owl#"
  private def O(l: String) = Iri(owl + l)
  private def R(l: String) = Iri(RDFS.ns + l)

  val NamedIndividual: Iri = O("NamedIndividual")

  val owlProperties: List[Iri] = List(
    "allValuesFrom", "annotatedProperty", "annotatedSource", "annotatedTarget",
    "assertionProperty", "cardinality", "complementOf", "datatypeComplementOf",
    "differentFrom", "disjointUnionOf", "disjointWith", "distinctMembers",
    "equivalentClass", "equivalentProperty", "hasKey", "hasSelf", "hasValue",
    "intersectionOf", "inverseOf", "maxCardinality", "maxQualifiedCardinality",
    "members", "minCardinality", "minQualifiedCardinality", "onClass",
    "onDataRange", "onDatatype", "onProperties", "onProperty", "oneOf",
    "propertyChainAxiom", "propertyDisjointWith", "qualifiedCardinality",
    "sameAs", "someValuesFrom", "sourceIndividual", "targetIndividual",
    "targetValue", "unionOf", "withRestrictions", "backwardCompatibleWith",
    "deprecated", "incompatibleWith", "priorVersion", "versionInfo",
    "bottomDataProperty", "topDataProperty", "bottomObjectProperty",
    "topObjectProperty", "imports", "versionIRI").map(O)

  val owlClasses: List[Iri] = List(
    "AllDifferent", "AllDisjointClasses", "AllDisjointProperties", "Annotation",
    "AnnotationProperty", "AsymmetricProperty", "Axiom", "Class", "DataRange",
    "DatatypeProperty", "DeprecatedClass", "DeprecatedProperty",
    "FunctionalProperty", "InverseFunctionalProperty", "IrreflexiveProperty",
    "NamedIndividual", "NegativePropertyAssertion", "ObjectProperty",
    "Ontology", "OntologyProperty", "ReflexiveProperty", "Restriction",
    "SymmetricProperty", "TransitiveProperty").map(O)

  val rdfsProperties: List[Iri] = List(
    "comment", "domain", "isDefinedBy", "label", "member", "range", "seeAlso",
    "subClassOf", "subPropertyOf").map(R)

  val rdfsClasses: List[Iri] = List(
    "Class", "Container", "ContainerMembershipProperty", "Datatype",
    "Literal", "Resource").map(R)

  /** data ∪ axioms(ont), leaving both inputs untouched. */
  def mix(data: MemGraph, ont: MemGraph): MemGraph = {
    val out = data.copyGraph()
    // bind any missing ontology prefixes (inoculate.py:38-43)
    out.nsPrefixes = ont.nsPrefixes ++ data.nsPrefixes
    val namedIndividuals = scala.collection.mutable.Set.empty[Node]
    for (cls <- rdfsClasses ++ owlClasses; s <- ont.subjects(RDF.ty, cls).toList) {
      s match {
        case b: BNode =>
          out.addAll(ont.cbd(b))
          out.add(b, RDF.ty, cls)
        case _ if cls == NamedIndividual =>
          out.addAll(ont.cbd(s)) // deep clone of the whole node
          namedIndividuals += s
          out.add(s, RDF.ty, cls)
        case _ =>
          out.add(s, RDF.ty, cls) // shallow: just the type triple
      }
    }
    for (p <- rdfsProperties ++ owlProperties; (s, o) <- ont.subjectObjects(p).toList) {
      s match { case b: BNode => out.addAll(ont.cbd(b)); case _ => }
      o match { case b: BNode => out.addAll(ont.cbd(b)); case _ => }
      out.add(s, p, o)
    }
    for (ni <- namedIndividuals; t <- ont.triples(None, None, Some(ni)).toList) {
      t.s match { case b: BNode => out.addAll(ont.cbd(b)); case _ => }
      out.add(t)
    }
    out
  }
}
