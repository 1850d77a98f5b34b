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
