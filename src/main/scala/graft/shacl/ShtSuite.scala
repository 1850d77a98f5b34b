package graft.shacl

import graft.rdf._
import org.apache.spark.sql.SparkSession

/** W3C SHACL test-suite (SHT) harness: loads manifest-bearing fixture files
  * (mf:entries -> sht:Validate with mf:action {sht:dataGraph,
  * sht:shapesGraph} and an inline mf:result sh:ValidationReport), runs the
  * engine with the reference's parity settings (inference='rdfs',
  * /root/reference/test/test_sht_validate.py:43), and compares with the
  * reference's conformance keying (ReportCompare). */
object ShtSuite {
  val MF = "http://www.w3.org/2001/sw/DataAccess/tests/test-manifest#"
  val SHT = "http://www.w3.org/ns/shacl-test#"

  final case class CaseResult(file: String, entry: String, passed: Boolean, detail: String)

  def findFixtures(rootDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(rootDir))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".ttl")).toList.sorted
      .filter { f =>
        val content = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8")
        content.contains("sht:Validate")
      }
  }

  def runFile(spark: SparkSession, file: String): Seq[CaseResult] = {
    val base = "file://" + file
    val g = TurtleParser.parseFile(file)
    val entries = g.subjects(RDF.ty, Iri(SHT + "Validate")).toList
    entries.flatMap { entry =>
      val entryName = entry match { case Iri(v) => v; case other => other.key }
      try {
        val action = g.value(entry, Iri(MF + "action"))
          .getOrElse(throw new ReportableError("no mf:action"))
        val dataRef = g.value(action, Iri(SHT + "dataGraph"))
        val shapesRef = g.value(action, Iri(SHT + "shapesGraph"))
        def resolveGraph(ref: Option[Node], role: String): MemGraph = ref match {
          case Some(Iri(v)) if v == base => g
          case Some(Iri(v)) if v.startsWith("file://") =>
            TurtleParser.parseFile(v.stripPrefix("file://"), bnodePrefix = role)
          case None => g
          case other => throw new ReportableError(s"unsupported graph ref $other")
        }
        val dataG = resolveGraph(dataRef, "d")
        val shapesG = resolveGraph(shapesRef, "s")
        val expectedReport = g.value(entry, Iri(MF + "result"))
          .getOrElse(throw new ReportableError("no mf:result"))
        if (expectedReport == Iri(SHT + "Failure")) {
          // sht:Failure: the run must abort with a ValidationFailure
          // (check_sht_result, validator_conformance.py:551-576)
          val res =
            try {
              Validator.validateGraph(spark, dataG, Some(shapesG),
                ValidationOptions(inference = "rdfs"))
              CaseResult(file, entryName, passed = false,
                "expected a ValidationFailure but validation completed")
            } catch {
              case _: Sparql.ValidationFailure => CaseResult(file, entryName, passed = true, "")
              case e: Throwable => CaseResult(file, entryName, passed = false,
                s"expected ValidationFailure, got ${e.getClass.getSimpleName}: ${e.getMessage}")
            }
          Some(res)
        } else {
          val outcome = Validator.validateGraph(spark, dataG, Some(shapesG),
            ValidationOptions(inference = "rdfs"))
          val log = new StringBuilder
          val ok = ReportCompare.compare(outcome.reportGraph.copyGraph(), g.copyGraph(), expectedReport, log)
          Some(CaseResult(file, entryName, ok, log.toString))
        }
      } catch {
        case e: Throwable =>
          Some(CaseResult(file, entryName, passed = false,
            s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }

  def runAll(spark: SparkSession, rootDir: String,
             exclude: Seq[String] = Seq("datatype-ill-formed")): Seq[CaseResult] = {
    val files = findFixtures(rootDir).filterNot(f => exclude.exists(f.contains))
    parMap(files)(runFile(spark, _))
  }

  /** Fixtures are independent; Spark schedules concurrent jobs from
    * multiple driver threads, so a small pool cuts suite wall time ~3x. */
  private def parMap[A](files: Seq[String])(f: String => Seq[A]): Seq[A] = {
    import java.util.concurrent.Executors
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = files.map(file => Future(f(file)))
      futs.flatMap(Await.result(_, Duration.Inf))
    } finally pool.shutdown()
  }

  // -------------------------------------------------------------------
  // DASH dash:GraphValidationTestCase fixtures (the whole file is both
  // data and shapes graph; expected report inline via dash:expectedResult
  // — /root/reference/pyshacl/validator_conformance.py:396-434). Note the
  // reference's own CI only enables one of these core files; we run the
  // full set and track the pass list explicitly.
  // -------------------------------------------------------------------
  val DASHNS = "http://datashapes.org/dash#"

  def findDashFixtures(rootDir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(rootDir))
      .iterator().asScala.map(_.toString).filter(_.endsWith(".test.ttl")).toList.sorted
      .filter { f =>
        val content = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)), "UTF-8")
        content.contains("dash:GraphValidationTestCase")
      }
  }

  def runDashFile(spark: SparkSession, file: String): Seq[CaseResult] = {
    val g = TurtleParser.parseFile(file)
    val cases = g.subjects(RDF.ty, Iri(DASHNS + "GraphValidationTestCase")).toList
    cases.flatMap { tc =>
      try {
        val expected = g.value(tc, Iri(DASHNS + "expectedResult"))
          .getOrElse(throw new ReportableError("no dash:expectedResult"))
        val outcome = Validator.validateGraph(spark, g, Some(g),
          ValidationOptions(inference = "rdfs"))
        val log = new StringBuilder
        val ok = ReportCompare.compare(outcome.reportGraph.copyGraph(), g.copyGraph(), expected, log)
        Some(CaseResult(file, tc.key, ok, log.toString))
      } catch {
        case e: Throwable =>
          Some(CaseResult(file, tc.key, passed = false,
            s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    }
  }

  def runAllDash(spark: SparkSession, rootDir: String,
                 exclude: Seq[String] = Nil): Seq[CaseResult] =
    parMap(findDashFixtures(rootDir).filterNot(f => exclude.exists(f.contains)))(
      runDashFile(spark, _))
}
