package graft.rdf

import scala.collection.mutable

/** Driver-side in-memory triple store with SPO/POS/OSP-style indexes.
  *
  * Used only where the reference's graphs are genuinely small: the shapes
  * graph (compiled once per run), expected-report fixtures, and report
  * assembly. Bulk data lives in DataFrames ([[TriplesDF]]).
  *
  * API mirrors the accessor surface of the reference's DataGraph
  * abstraction (/root/reference/pyshacl/graph_abstraction.py:82-176):
  * triples/subjects/objects/predicates/items (RDF lists) / cbd.
  */
final class MemGraph extends Serializable {
  /** Namespace bindings of the source document (rdflib keeps the parsed
    * graph's prefix map and injects it into queries over the graph as
    * initNs; SHACL-SPARQL prefix collection mirrors that). */
  var nsPrefixes: Map[String, String] = Map.empty

  private val bySubj = mutable.LinkedHashMap.empty[Node, mutable.LinkedHashMap[Iri, mutable.LinkedHashSet[Node]]]
  private val byPred = mutable.LinkedHashMap.empty[Iri, mutable.LinkedHashSet[(Node, Node)]]
  private val byObj = mutable.LinkedHashMap.empty[Node, mutable.LinkedHashSet[(Node, Iri)]]
  private var _size = 0

  def size: Int = _size

  def add(t: Triple): Boolean = {
    val po = bySubj.getOrElseUpdate(t.s, mutable.LinkedHashMap.empty)
    val os = po.getOrElseUpdate(t.p, mutable.LinkedHashSet.empty)
    if (os.add(t.o)) {
      byPred.getOrElseUpdate(t.p, mutable.LinkedHashSet.empty).add((t.s, t.o))
      byObj.getOrElseUpdate(t.o, mutable.LinkedHashSet.empty).add((t.s, t.p))
      _size += 1
      true
    } else false
  }
  def add(s: Node, p: Iri, o: Node): Boolean = add(Triple(s, p, o))
  def addAll(ts: IterableOnce[Triple]): Unit = ts.iterator.foreach(add)

  def remove(s: Option[Node], p: Option[Iri], o: Option[Node]): Unit =
    triples(s, p, o).toList.foreach { t =>
      bySubj.get(t.s).foreach { po =>
        po.get(t.p).foreach { os =>
          if (os.remove(t.o)) {
            _size -= 1
            byPred.get(t.p).foreach(_.remove((t.s, t.o)))
            byObj.get(t.o).foreach(_.remove((t.s, t.p)))
          }
          // drop empty buckets so predicates()/triples() don't report
          // stale keys (this broke report-message cleaning)
          if (os.isEmpty) po.remove(t.p)
        }
        if (po.isEmpty) bySubj.remove(t.s)
      }
    }

  def contains(s: Node, p: Iri, o: Node): Boolean =
    bySubj.get(s).exists(_.get(p).exists(_.contains(o)))

  def triples(s: Option[Node] = None, p: Option[Iri] = None, o: Option[Node] = None): Iterator[Triple] =
    (s, p, o) match {
      case (Some(sv), Some(pv), Some(ov)) =>
        if (contains(sv, pv, ov)) Iterator(Triple(sv, pv, ov)) else Iterator.empty
      case (Some(sv), Some(pv), None) =>
        bySubj.get(sv).flatMap(_.get(pv)).map(_.iterator.map(Triple(sv, pv, _))).getOrElse(Iterator.empty)
      case (Some(sv), None, ov) =>
        bySubj.get(sv).iterator.flatMap(_.iterator.flatMap { case (pv, os) =>
          os.iterator.filter(x => ov.forall(_ == x)).map(Triple(sv, pv, _))
        })
      case (None, Some(pv), ov) =>
        byPred.get(pv).iterator.flatMap(_.iterator.filter(x => ov.forall(_ == x._2))
          .map { case (sv, x) => Triple(sv, pv, x) })
      case (None, None, Some(ov)) =>
        byObj.get(ov).iterator.flatMap(_.iterator.map { case (sv, pv) => Triple(sv, pv, ov) })
      case (None, None, None) =>
        bySubj.iterator.flatMap { case (sv, po) =>
          po.iterator.flatMap { case (pv, os) => os.iterator.map(Triple(sv, pv, _)) }
        }
    }

  def objects(s: Node, p: Iri): Iterator[Node] =
    bySubj.get(s).flatMap(_.get(p)).map(_.iterator).getOrElse(Iterator.empty)
  def subjects(p: Iri, o: Node): Iterator[Node] =
    byPred.get(p).iterator.flatMap(_.iterator.filter(_._2 == o).map(_._1))
  def subjects(p: Iri): Iterator[Node] = byPred.get(p).iterator.flatMap(_.iterator.map(_._1))
  def subjectObjects(p: Iri): Iterator[(Node, Node)] = byPred.get(p).iterator.flatMap(_.iterator)
  def predicates(s: Node): Iterator[Iri] = bySubj.get(s).iterator.flatMap(_.keysIterator)
  def predicateObjects(s: Node): Iterator[(Iri, Node)] =
    bySubj.get(s).iterator.flatMap(_.iterator.flatMap { case (p, os) => os.iterator.map((p, _)) })
  def value(s: Node, p: Iri): Option[Node] = objects(s, p).nextOption()
  def subjectsOfType(c: Node): Iterator[Node] = subjects(RDF.ty, c)
  def allSubjects: Iterator[Node] = bySubj.keysIterator

  /** Walk an rdf:first/rdf:rest list — graph_abstraction.py:458-467. */
  def items(head: Node): List[Node] = {
    val buf = mutable.ListBuffer.empty[Node]
    var cur = head
    val seen = mutable.Set.empty[Node]
    while (cur != RDF.nil && seen.add(cur)) {
      value(cur, RDF.first).foreach(buf += _)
      cur = value(cur, RDF.rest).getOrElse(RDF.nil)
    }
    buf.toList
  }

  def isList(n: Node): Boolean = n == RDF.nil || value(n, RDF.first).isDefined

  /** Concise bounded description: all triples reachable from n through
    * blank-node objects (used for bnode cloning into the report graph —
    * /root/reference/pyshacl/rdfutil/clone.py:264-297). */
  def cbd(n: Node, out: mutable.Buffer[Triple] = mutable.Buffer.empty,
          seen: mutable.Set[Node] = mutable.Set.empty): Seq[Triple] = {
    if (seen.add(n)) {
      predicateObjects(n).foreach { case (p, o) =>
        out += Triple(n, p, o)
        o match {
          case b: BNode => cbd(b, out, seen)
          case _ =>
        }
      }
    }
    out.toSeq
  }

  def ++(other: MemGraph): MemGraph = {
    val g = new MemGraph
    g.nsPrefixes = nsPrefixes ++ other.nsPrefixes
    g.addAll(triples())
    g.addAll(other.triples())
    g
  }

  def copyGraph(): MemGraph = {
    val g = new MemGraph
    g.nsPrefixes = nsPrefixes
    g.addAll(triples())
    g
  }

  def toSeq: Seq[Triple] = triples().toSeq
}

object MemGraph {
  def apply(ts: IterableOnce[Triple]): MemGraph = { val g = new MemGraph; g.addAll(ts); g }
}
