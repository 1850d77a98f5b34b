package graft.tools

import graft.rdf.{NTriplesWriter, TurtleParser}

/** CLI: parse a Turtle file, emit canonical sorted N-Triples on stdout.
  * Analogue of the reference's format-conversion entry points
  * (/root/reference/pyshacl/rdfutil/load.py:157-500 loaders + serializers).
  *
  * Usage: runMain graft.tools.RdfCat <file.ttl> [baseIri]
  */
object RdfCat {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: RdfCat <file.ttl> [baseIri]"); sys.exit(2) }
    val content = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8")
    val base = if (args.length > 1) args(1) else "file://" + args(0)
    val g = TurtleParser.parseGraph(content, base)
    println(NTriplesWriter.write(g))
    System.err.println(s"# ${g.size} triples")
  }
}
