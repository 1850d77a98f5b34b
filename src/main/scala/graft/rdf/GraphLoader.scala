package graft.rdf

/** Graph loading with owl:imports chasing
  * (/root/reference/pyshacl/rdfutil/load.py:580-679): after parsing a
  * document, every owl:imports object is resolved and merged, recursively,
  * with a seen-set and a depth cap. This build runs with zero network
  * egress, so only file: IRIs and plain local paths are followed; http(s)
  * imports are recorded as skipped (the reference fetches them from the
  * web or its baked-in vocab assets). */
object GraphLoader {
  private val owlImports = Iri("http://www.w3.org/2002/07/owl#imports")

  /** Format-sniffing parse (load.py:370-386): JSON-LD by a leading '{'/'[',
    * RDF/XML by an XML prolog or rdf:RDF root, Turtle otherwise — with a
    * TriG retry when Turtle fails and the document has graph blocks. */
  def parseContent(content: String, base: String, bnodePrefix: String = "b",
                   format: Option[String] = None): MemGraph = {
    val head = content.dropWhile(_.isWhitespace)
    format.map(_.toLowerCase) match {
      case Some("json-ld") | Some("jsonld") => JsonLd.parseGraph(content, bnodePrefix)
      case Some("trig") => TrigParser.parseGraph(content, base, bnodePrefix)
      case Some("xml") | Some("rdf-xml") | Some("application/rdf+xml") =>
        RdfXml.parseGraph(content, base, bnodePrefix)
      case Some("turtle") | Some("ttl") | Some("nt") | Some("ntriples") =>
        TurtleParser.parseGraph(content, base, bnodePrefix)
      case Some("hext") => Hext.parseGraph(content, bnodePrefix)
      case _ =>
        // a hext doc is NDJSON arrays-of-strings (possibly with whitespace
        // after the bracket); a JSON-LD array is [{...}]
        val hextish = head.startsWith("[") &&
          head.drop(1).dropWhile(_.isWhitespace).startsWith("\"")
        if (hextish) Hext.parseGraph(content, bnodePrefix)
        else if (head.startsWith("{") || head.startsWith("[")) JsonLd.parseGraph(content, bnodePrefix)
        else if (head.startsWith("<?xml") || head.startsWith("<rdf:RDF") ||
                 head.startsWith("<RDF")) RdfXml.parseGraph(content, base, bnodePrefix)
        else
          try TurtleParser.parseGraph(content, base, bnodePrefix)
          catch {
            case e: Throwable if content.contains("{") =>
              try TrigParser.parseGraph(content, base, bnodePrefix)
              catch { case _: Throwable => throw e }
          }
    }
  }

  /** Sniffing file load (extension hints the format). */
  def parseFile(path: String, bnodePrefix: String = "b"): MemGraph = {
    val content = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val ext = path.split('.').last.toLowerCase
    val fmt = ext match {
      case "jsonld" | "json" => Some("json-ld")
      case "hext" => Some("hext")
      case "trig" => Some("trig")
      case "rdf" | "xml" | "owl" => Some("xml")
      case "ttl" | "nt" => Some("turtle")
      case _ => None
    }
    parseContent(content, "file://" + path, bnodePrefix, fmt)
  }

  final case class Loaded(graph: MemGraph, followed: List[String], skipped: List[String])

  def loadWithImports(path: String, maxDepth: Int = 3): Loaded = {
    val seen = scala.collection.mutable.Set.empty[String]
    val followed = scala.collection.mutable.ListBuffer.empty[String]
    val skipped = scala.collection.mutable.ListBuffer.empty[String]

    def localPath(iri: String, baseDir: String): Option[String] = {
      if (iri.startsWith("file://")) Some(iri.stripPrefix("file://"))
      else if (iri.startsWith("http://") || iri.startsWith("https://") ||
               iri.startsWith("urn:")) None
      else Some(new java.io.File(baseDir, iri).getPath) // relative path
    }

    def load(p: String, depth: Int, bnodePrefix: String): MemGraph = {
      val canonical = new java.io.File(p).getCanonicalPath
      val g = TurtleParser.parseFile(canonical, bnodePrefix)
      if (depth >= maxDepth) return g
      val dir = new java.io.File(canonical).getParent
      val imports = g.subjectObjects(owlImports).collect { case (_, Iri(v)) => v }.toList.distinct
      imports.zipWithIndex.foldLeft(g) { case (acc, (imp, i)) =>
        localPath(imp, dir) match {
          case Some(ip) if new java.io.File(ip).isFile =>
            if (seen.add(new java.io.File(ip).getCanonicalPath)) {
              followed += imp
              acc ++ load(ip, depth + 1, s"$bnodePrefix-i$i")
            } else acc
          case _ =>
            skipped += imp
            acc
        }
      }
    }

    seen += new java.io.File(path).getCanonicalPath
    Loaded(load(path, 0, "b"), followed.toList, skipped.toList)
  }
}
