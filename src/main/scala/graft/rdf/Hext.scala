package graft.rdf

/** Hextuples (NDJSON) reader — the `.hext` format the reference loads via
  * rdflib's hext plugin (/root/reference/pyshacl/rdfutil/load.py:386).
  *
  * One JSON array per line: [subject, predicate, value, datatype, language,
  * graph] where datatype is "globalId" (IRI object), "localId" (bnode
  * object), or a literal datatype IRI; language is "" or a BCP47 tag;
  * graph is "" or a named-graph IRI. Subjects starting with "_:" are
  * bnodes. Line-delimited JSON splits trivially per partition, so the
  * at-scale path is `spark.read.text` + this row parser; the driver-side
  * MemGraph entry below serves fixtures and the sniffing loader. */
object Hext {
  import Json._

  final class HextError(msg: String) extends RuntimeException(msg)

  def parseQuad(line: String, bnodePrefix: String): Option[Quad] = {
    val trimmed = line.trim
    if (trimmed.isEmpty) return None
    val arr = Json.parse(trimmed) match {
      case JArr(a) => a
      case _ => throw new HextError(s"hext line is not a JSON array: $trimmed")
    }
    def str(j: J): String = j match {
      case JStr(s) => s
      case JNum(_, raw) => raw
      case JBool(b) => b.toString
      case other => throw new HextError(s"unexpected hext field $other")
    }
    if (arr.size < 6) throw new HextError(s"hext line has ${arr.size} fields (need 6)")
    val Seq(sS, pS, vS, dtS, langS, gS) = arr.take(6).map(str)
    def node(id: String): Node =
      if (id.startsWith("_:")) BNode(bnodePrefix + "-" + id.drop(2)) else Iri(id)
    val s = node(sS)
    val o: Node = dtS match {
      case "globalId" => Iri(vS)
      case "localId" => BNode(bnodePrefix + "-" + vS.stripPrefix("_:"))
      case RDF.langString => Lit(vS, "", langS)
      case dt => if (langS.nonEmpty) Lit(vS, "", langS)
        else Lit(vS, if (dt == XSD.string) "" else dt)
    }
    // blank-node graph labels are legal in hext; Quad models graph names as
    // IRIs, so they skolemize to a per-file stable IRI (bnode graph names
    // have no cross-document identity anyway — the bnodePrefix scopes them)
    val g =
      if (gS.isEmpty) None
      else if (gS.startsWith("_:"))
        Some(Iri(s"urn:graft:bnode-graph:$bnodePrefix-${gS.drop(2)}"))
      else Some(Iri(gS))
    Some(Quad(s, Iri(pS), o, g))
  }

  def parseQuads(content: String, bnodePrefix: String = "b"): Seq[Quad] =
    content.linesIterator.zipWithIndex.flatMap { case (line, i) =>
      try parseQuad(line, bnodePrefix)
      catch {
        case e: HextError => throw new HextError(s"line ${i + 1}: ${e.getMessage}")
        case e: Json.JsonError => throw new HextError(s"line ${i + 1}: ${e.getMessage}")
      }
    }.toSeq

  /** Default-union MemGraph (what validation consumes). */
  def parseGraph(content: String, bnodePrefix: String = "b"): MemGraph = {
    val g = new MemGraph
    parseQuads(content, bnodePrefix).foreach(q => g.add(q.s, q.p, q.o))
    g
  }

  /** Distributed hext scan: NDJSON lines parse independently per file
    * split, so ingest parallelizes like readNTriples/readNQuads. Returns a
    * quads frame (s,p,o,g; "" = default graph). */
  def readHext(spark: org.apache.spark.sql.SparkSession, path: String)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import TriplesDF.{QuadRow, TermRow}
    spark.read.textFile(path).flatMap { line =>
      parseQuad(line, "hx").map(q => QuadRow(TermRow.of(q.s), q.p.value,
        TermRow.of(q.o), q.g.map(_.value).getOrElse("")))
    }.toDF("s", "p", "o", "g")
  }
}
