package graft.tools

import graft.kg.KgPipeline
import org.apache.spark.sql.SparkSession

/** CLI for the KG-construction pipeline: synthesize docs, run all stages
  * with lineage/resume, print stage counts + conformance.
  *
  * Usage: runMain graft.tools.KgCli <outDir> [nDocs] [runId]
  */
object KgCli {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-kg")
    val n = args.lift(1).map(_.toLong).getOrElse(1000L)
    val runId = args.lift(2).getOrElse("run1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-kg")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val c = KgPipeline.run(spark, out, n, partitions = cpus.toInt, runId = runId)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"docs=${c.docs} spans=${c.spans} mentions=${c.mentions} links=${c.links} " +
      f"entities=${c.entities} components=${c.components} triples=${c.triples} " +
      f"conforms=${c.conforms} seconds=$dt%.1f triples_per_sec=${c.triples / dt}%.0f")
    spark.stop()
  }
}
