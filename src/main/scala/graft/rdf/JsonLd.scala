package graft.rdf

import Json._

/** JSON-LD reader — the expansion subset the reference corpus exercises
  * (the reference loads JSON-LD through rdflib's plugin;
  * rdfutil/load.py:370-386 sniffs the format):
  *
  *   - inline @context: prefix/term → IRI strings, expanded term
  *     definitions ({@id, @type}, incl. "@type": "@id" IRI coercion),
  *     @vocab, @base
  *   - node objects: @id (IRI/CURIE; absent → fresh blank node), @type
  *     (string or array), nested node objects, arrays as multi-values
  *   - value objects: {@value, @type/@language}; plain JSON strings,
  *     numbers (integer vs double like rdflib), booleans
  *   - @graph: named graph when the carrying object has @id, default
  *     graph otherwise
  *
  * Remote @context IRIs raise (zero egress — the reference fetches them). */
object JsonLd {
  final class JsonLdError(msg: String) extends RuntimeException(msg)

  private final case class Ctx(
    terms: Map[String, (String, Option[String])], // term -> (iri, coercion)
    vocab: Option[String],
    base: Option[String]) {

    def expandIri(s: String, vocabFallback: Boolean): Option[String] = {
      if (s.startsWith("@")) return None
      val colon = s.indexOf(':')
      if (colon > 0) {
        val pfx = s.substring(0, colon)
        terms.get(pfx) match {
          case Some((ns, _)) if !s.startsWith("//", colon + 1) =>
            Some(ns + s.substring(colon + 1))
          case _ => Some(s) // absolute IRI (http:, urn:, …)
        }
      } else terms.get(s) match {
        case Some((iri, _)) => Some(iri)
        case None if vocabFallback && vocab.isDefined => Some(vocab.get + s)
        case None if !vocabFallback && base.isDefined => Some(base.get + s)
        case None if !vocabFallback => Some(s) // relative-ish id, keep as-is
        case None => None // vocab-less term: dropped (JSON-LD expansion rule)
      }
    }

    def coercion(term: String): Option[String] = terms.get(term).flatMap(_._2)
  }

  def parseQuads(content: String, bnodePrefix: String = "jb"): Seq[Quad] = {
    val root = Json.parse(content)
    val out = scala.collection.mutable.ListBuffer.empty[Quad]
    var bn = 0
    def freshBnode(): BNode = { bn += 1; BNode(s"$bnodePrefix$bn") }

    def parseCtx(j: J, outer: Ctx): Ctx = j match {
      case JStr(url) =>
        throw new JsonLdError(s"remote @context <$url> is not supported (zero egress)")
      case JArr(items) => items.foldLeft(outer)((c, i) => parseCtx(i, c))
      case JObj(m) =>
        var vocab = outer.vocab
        var base = outer.base
        val terms = scala.collection.mutable.Map.empty[String, (String, Option[String])]
        terms ++= outer.terms
        for ((k, v) <- m) k match {
          case "@vocab" => v match { case JStr(s) => vocab = Some(s); case _ => }
          case "@base" => v match { case JStr(s) => base = Some(s); case _ => }
          case "@version" | "@language" =>
          case term => v match {
            case JStr(iri) => terms(term) = (iri, None)
            case JObj(d) =>
              val id = d.get("@id").collect { case JStr(s) => s }.getOrElse(term)
              val ty = d.get("@type").collect { case JStr(s) => s }
              terms(term) = (id, ty)
            case _ =>
          }
        }
        // second pass: expand CURIEs in term definitions against the map
        val tmp = Ctx(terms.toMap, vocab, base)
        val expanded = terms.map { case (t, (iri, ty)) =>
          t -> (tmp.expandIri(iri, vocabFallback = false).getOrElse(iri),
            ty.map(x => if (x == "@id") "@id"
              else tmp.expandIri(x, vocabFallback = false).getOrElse(x)))
        }
        Ctx(expanded.toMap, vocab, base)
      case _ => outer
    }

    def valueNode(v: J, coerce: Option[String], ctx: Ctx, g: Option[Iri]): Option[Node] =
      v match {
        case JStr(s) =>
          coerce match {
            case Some("@id") if s.startsWith("_:") =>
              Some(BNode(s"$bnodePrefix-${s.drop(2)}"))
            case Some("@id") => Some(ctx.expandIri(s, vocabFallback = false).map(Iri)
              .getOrElse(Iri(s)))
            case Some(dt) => Some(Lit(s, dt))
            case None => Some(Lit(s))
          }
        case JNum(n, raw) =>
          if (raw.contains('.') || raw.toLowerCase.contains('e'))
            Some(Lit(raw, XSD.double))
          else Some(Lit(n.toBigInt.toString, XSD.integer))
        case JBool(b) => Some(Lit(b.toString, XSD.boolean))
        case JObj(m) if m.contains("@value") =>
          val lex = m("@value") match {
            case JStr(s) => s
            case JNum(_, raw) => raw
            case JBool(b) => b.toString
            case _ => throw new JsonLdError("unsupported @value")
          }
          val dt = m.get("@type").collect { case JStr(s) =>
            ctx.expandIri(s, vocabFallback = false).getOrElse(s) }
          val lang = m.get("@language").collect { case JStr(s) => s }
          Some(Lit(lex, dt.getOrElse(""), lang.getOrElse("")))
        case o: JObj => Some(nodeObject(o, ctx, g))
        case JNull => None
        case JArr(_) => throw new JsonLdError("nested arrays are not supported")
      }

    /** Emit a node object's triples into graph g; returns its subject. */
    def nodeObject(o: JObj, outerCtx: Ctx, g: Option[Iri]): Node = {
      val ctx = o.m.get("@context").map(parseCtx(_, outerCtx)).getOrElse(outerCtx)
      // "_:"-prefixed ids are blank node identifiers (JSON-LD 1.1 §3.3),
      // scoped per document via the bnode prefix — not IRIs
      val subj: Node = o.m.get("@id").collect { case JStr(s) => s } match {
        case Some(s) if s.startsWith("_:") => BNode(s"$bnodePrefix-${s.drop(2)}")
        case Some(s) => ctx.expandIri(s, vocabFallback = false).map(Iri)
          .getOrElse(freshBnode())
        case None => freshBnode()
      }
      for ((k, v) <- o.m if !k.startsWith("@")) {
        ctx.expandIri(k, vocabFallback = true).foreach { predIri =>
          val coerce = ctx.coercion(k)
          val vals = v match { case JArr(items) => items; case single => List(single) }
          for (item <- vals; node <- valueNode(item, coerce, ctx, g))
            out += Quad(subj, Iri(predIri), node, g)
        }
      }
      o.m.get("@type").foreach { tv =>
        val types = tv match { case JArr(is) => is; case x => List(x) }
        for (JStr(t) <- types; iri <- ctx.expandIri(t, vocabFallback = true))
          out += Quad(subj, RDF.ty, Iri(iri), g)
      }
      o.m.get("@graph").foreach { gv =>
        // @graph under a node with @id = named graph; anonymous = default
        val gname = o.m.get("@id").collect { case JStr(s) => s }
          .flatMap(ctx.expandIri(_, vocabFallback = false)).map(Iri)
        val items = gv match { case JArr(is) => is; case x => List(x) }
        for (item <- items) item match {
          case io: JObj => nodeObject(io, ctx, gname.orElse(g))
          case _ =>
        }
      }
      subj
    }

    root match {
      case o: JObj => nodeObject(o, Ctx(Map.empty, None, None), None)
      case JArr(items) =>
        items.foreach {
          case o: JObj => nodeObject(o, Ctx(Map.empty, None, None), None)
          case _ =>
        }
      case _ => throw new JsonLdError("JSON-LD document must be an object or array")
    }
    out.toSeq
  }

  /** Default-union MemGraph (what validation consumes). */
  def parseGraph(content: String, bnodePrefix: String = "jb"): MemGraph = {
    val g = new MemGraph
    parseQuads(content, bnodePrefix).foreach(q => g.add(q.s, q.p, q.o))
    g
  }
}

/** JSON-LD serializer (expanded form, JSON-LD 1.1 §4): a top-level array of
  * node objects — one per subject, predicates as absolute IRIs, objects as
  * `{"@id": ...}` / `{"@value": ..., "@type"/"@language": ...}`. Expanded
  * form needs no @context, so round-trips through [[JsonLd]] are exact.
  * Deterministic: subjects, predicates and objects render sorted. */
object JsonLdWriter {

  private def jstr(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append("\"").toString
  }

  private def idOf(n: Node): String = n match {
    case Iri(v) => v
    case BNode(id) => s"_:$id"
    case l: Lit => throw new JsonLd.JsonLdError(s"literal in subject position: $l")
  }

  private def objJson(n: Node): String = n match {
    case Iri(v) => s"""{"@id":${jstr(v)}}"""
    case BNode(id) => s"""{"@id":${jstr("_:" + id)}}"""
    case Lit(lex, dt, lang) =>
      if (lang.nonEmpty) s"""{"@value":${jstr(lex)},"@language":${jstr(lang)}}"""
      else if (dt.nonEmpty && dt != XSD.string)
        s"""{"@value":${jstr(lex)},"@type":${jstr(dt)}}"""
      else s"""{"@value":${jstr(lex)}}"""
  }

  def write(g: MemGraph): String = {
    val nodes = g.allSubjects.toSeq.sortBy(_.key).map { s =>
      val preds = g.predicateObjects(s).toSeq.groupBy(_._1).toSeq.sortBy(_._1.value)
        .map { case (p, os) =>
          s"${jstr(p.value)}:[${os.map(x => objJson(x._2)).sorted.mkString(",")}]"
        }
      s"""{"@id":${jstr(idOf(s))},${preds.mkString(",")}}"""
    }
    nodes.mkString("[\n", ",\n", "\n]\n")
  }
}
