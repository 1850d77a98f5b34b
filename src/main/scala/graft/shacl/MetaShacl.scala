package graft.shacl

import graft.rdf._
import org.apache.spark.sql.SparkSession

/** Meta-SHACL: validate a shapes graph against the "SHACL for SHACL"
  * shapes (entrypoints.py:137-143 + validator.py:344-358). The reference
  * bakes shacl-shacl.ttl into its assets; this library takes the file as a
  * parameter so it stays standalone — callers point it at any copy of
  * https://www.w3.org/ns/shacl-shacl. A non-conforming shapes graph aborts
  * the run with the reference's error text. */
object MetaShacl {

  def validate(spark: SparkSession, shapesGraph: MemGraph,
               shaclShaclFile: String): Validator.Outcome = {
    val shsh = TurtleParser.parseFile(shaclShaclFile, bnodePrefix = "shsh")
    Validator.validateGraph(spark, shapesGraph, Some(shsh),
      ValidationOptions(inference = "rdfs"))
  }

  /** Raise (like the reference's ReportableRuntimeError) unless the shapes
    * graph conforms to shacl-shacl. */
  def check(spark: SparkSession, shapesGraph: MemGraph, shaclShaclFile: String): Unit = {
    val out = validate(spark, shapesGraph, shaclShaclFile)
    if (!out.conforms)
      throw new ReportableError(
        "SHACL File does not validate against the SHACL Shapes SHACL (MetaSHACL) file.\n" +
          out.reportText)
  }
}
