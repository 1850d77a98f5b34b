package graft.rdf

import org.scalatest.funsuite.AnyFunSuite

class GraphLoaderSpec extends AnyFunSuite {
  test("owl:imports chases local files recursively, skips web IRIs, breaks cycles") {
    val dir = java.nio.file.Files.createTempDirectory("imports").toFile
    def w(name: String, body: String): String = {
      val f = new java.io.File(dir, name)
      java.nio.file.Files.writeString(f.toPath, body)
      f.getPath
    }
    val c = w("c.ttl",
      """@prefix ex: <http://ex.org/> .
        |ex:fromC ex:p ex:v .
        |""".stripMargin)
    w("b.ttl",
      s"""@prefix owl: <http://www.w3.org/2002/07/owl#> .
         |@prefix ex: <http://ex.org/> .
         |<http://ex.org/ontB> a owl:Ontology ;
         |  owl:imports <file://$c> ;
         |  owl:imports <file://${dir.getPath}/a.ttl> . # cycle back to a
         |ex:fromB ex:p ex:v .
         |""".stripMargin)
    val a = w("a.ttl",
      """@prefix owl: <http://www.w3.org/2002/07/owl#> .
        |@prefix ex: <http://ex.org/> .
        |<http://ex.org/ontA> a owl:Ontology ;
        |  owl:imports <b.ttl> ;
        |  owl:imports <http://datashapes.org/dash> .
        |ex:fromA ex:p ex:v .
        |""".stripMargin)
    val loaded = GraphLoader.loadWithImports(a)
    def has(s: String) = loaded.graph.contains(Iri("http://ex.org/" + s),
      Iri("http://ex.org/p"), Iri("http://ex.org/v"))
    assert(has("fromA") && has("fromB") && has("fromC"))
    assert(loaded.skipped.contains("http://datashapes.org/dash"))
    assert(loaded.followed.size == 2) // b and c; the a-cycle is not refollowed
  }
}
