package graft.shacl

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** W3C SHACL core conformance — the parity gate vs the reference
  * (BASELINE.md: identical verdicts + report triples, keyed per
  * /root/reference/pyshacl/validator_conformance.py:80-189; excluded
  * known reference failure: datatype-ill-formed, FEATURES.md:199-203). */
class ShtConformanceSpec extends AnyFunSuite {
  val suiteDir = "/root/reference/test/resources/sht_tests/core"

  test("W3C SHACL core suite passes end to end") {
    val results = ShtSuite.runAll(TestSpark.spark, suiteDir)
    val failures = results.filterNot(_.passed)
    assert(results.size >= 97, s"expected >=97 cases, found ${results.size}")
    assert(failures.isEmpty, failures.map(f =>
      s"${f.file} [${f.entry}]: ${f.detail.linesIterator.take(2).mkString(" | ")}").mkString("\n"))
  }

  /** SHACL-SPARQL suite (sh:sparql, components, pre-binding legality).
    * shapesGraph-001 is excluded exactly like the reference's own CI
    * (test_sht_validate.py ALLOWABLE_FAILURES: $shapesGraph binding is
    * unsupported there too). */
  test("W3C SHACL sparql suite passes end to end") {
    val results = ShtSuite.runAll(TestSpark.spark,
      "/root/reference/test/resources/sht_tests/sparql",
      exclude = Seq("shapesGraph-001"))
    val failures = results.filterNot(_.passed)
    assert(results.size >= 22, s"expected >=22 cases, found ${results.size}")
    assert(failures.isEmpty, failures.map(f =>
      s"${f.file} [${f.entry}]: ${f.detail.linesIterator.take(3).mkString(" | ")}").mkString("\n"))
  }
}

/** DASH core suite (dash:GraphValidationTestCase fixtures) — broader than
  * the reference's own CI, which enables only one of these files. */
class DashConformanceSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("DASH expression suite passes (sh:expression + compiled SHACLFunctions)") {
    val results = ShtSuite.runAllDash(graft.TestSpark.spark,
      "/root/reference/test/resources/dash_tests/expression")
    assert(results.nonEmpty && results.forall(_.passed),
      results.filterNot(_.passed).map(_.detail).mkString("\n"))
  }

  test("DASH core suite passes end to end") {
    val results = ShtSuite.runAllDash(graft.TestSpark.spark,
      "/root/reference/test/resources/dash_tests/core")
    val failures = results.filterNot(_.passed)
    assert(results.size >= 85, s"expected >=85 cases, found ${results.size}")
    assert(failures.isEmpty, failures.map(f =>
      s"${f.file}: ${f.detail.linesIterator.take(1).mkString}").mkString("\n"))
  }
}
