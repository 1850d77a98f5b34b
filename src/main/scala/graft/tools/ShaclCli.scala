package graft.tools

import graft.rdf._
import graft.shacl._
import org.apache.spark.sql.SparkSession

/** CLI validator, pySHACL-CLI-shaped (/root/reference/pyshacl/cli.py:243-420):
  * exit 0 conforms / 1 not / 2 error; prints the report text and, with -f
  * ttl, the report triples.
  *
  * Usage: runMain graft.tools.ShaclCli <data.ttl> [shapes.ttl] [--inference rdfs] [--ttl]
  */
object ShaclCli {

  /** Parse CLI args to (positional files, options, print-ttl). Split out so
    * the flag surface is testable without exiting a JVM. */
  def parseArgs(args: Array[String]): (List[String], ValidationOptions, Boolean) = {
    val valueFlags = Set("--inference", "--focus", "--use-shapes")
    val pos = args.toList.zipWithIndex.filterNot { case (a, i) =>
      a.startsWith("--") || (i > 0 && valueFlags.contains(args(i - 1)))
    }.map(_._1)
    def valueOf(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    def setOf(flag: String): Option[Set[String]] =
      valueOf(flag).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    val opts = ValidationOptions(
      inference = valueOf("--inference").getOrElse("none"),
      advanced = args.contains("--advanced"),
      iterateRules = args.contains("--iterate-rules"),
      allowInfos = args.contains("--allow-infos"),
      allowWarnings = args.contains("--allow-warnings"),
      abortOnFirst = args.contains("--abort-first"),
      // pySHACL -f / --focus and --use-shapes (validator.py:237-255,
      // shape.py:670-684): comma-separated IRI lists
      focusNodes = setOf("--focus"),
      useShapes = setOf("--use-shapes"))
    (pos, opts, args.contains("--ttl"))
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: ShaclCli <data.ttl> [shapes.ttl] [--inference rdfs] [--ttl] [--advanced] [--iterate-rules] [--allow-infos] [--allow-warnings] [--abort-first] [--focus <iri,iri>] [--use-shapes <iri,iri>]"); sys.exit(2) }
    val (pos, opts, asTtl) = parseArgs(args)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-shacl")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val dataG = GraphLoader.parseFile(pos.head, bnodePrefix = "d") // format-sniffing loader
      val shapesG = pos.lift(1).map(GraphLoader.parseFile(_, bnodePrefix = "s"))
      val out = Validator.validateGraph(spark, dataG, shapesG, opts)
      println(out.reportText)
      if (asTtl) println(TurtleWriter.write(out.reportGraph))
      spark.stop()
      sys.exit(if (out.conforms) 0 else 1)
    } catch {
      case e: Throwable =>
        System.err.println(s"error: ${e.getMessage}")
        spark.stop()
        sys.exit(2)
    }
  }
}

/** Batch SHT-suite runner: prints per-case pass/fail + totals.
  * Usage: runMain graft.tools.ShtCli [suiteDir] */
object ShtCli {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/reference/test/resources/sht_tests/core")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-sht")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val results =
      if (args.contains("--dash")) ShtSuite.runAllDash(spark, dir)
      else ShtSuite.runAll(spark, dir)
    results.foreach { r =>
      val mark = if (r.passed) "PASS" else "FAIL"
      println(f"$mark ${r.file.stripPrefix(dir)}%-60s ${if (r.passed) "" else r.detail.linesIterator.mkString(" | ")}")
    }
    val pass = results.count(_.passed)
    println(s"TOTAL: $pass/${results.size} passed")
    spark.stop()
    if (pass < results.size) sys.exit(1)
  }
}
