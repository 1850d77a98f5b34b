package graft.tools

import graft.shacl._
import org.apache.spark.sql.SparkSession

/** Debug: run every fixture of an SHT directory sequentially with per-file
  * wall time, to spot pathological plans. */
object SparqlSuiteProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/reference/test/resources/sht_tests/sparql"
    val exclude = args.drop(1)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var pass = 0; var fail = 0
    for (f <- ShtSuite.findFixtures(dir) if !exclude.exists(f.contains)) {
      val t0 = System.nanoTime()
      val rs = ShtSuite.runFile(spark, f)
      val ms = (System.nanoTime() - t0) / 1000000
      for (r <- rs) {
        if (r.passed) pass += 1 else fail += 1
        println(f"[probe] ${ms}%6d ms ${if (r.passed) "PASS" else "FAIL"} ${r.entry} " +
          (if (r.passed) "" else r.detail.linesIterator.take(2).mkString(" | ")))
      }
    }
    println(s"[probe] pass=$pass fail=$fail")
    spark.stop()
  }
}
