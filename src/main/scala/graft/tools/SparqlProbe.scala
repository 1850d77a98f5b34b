package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-side decomposition of one SPARQL registry query: how much of the
  * wall is plan construction (SparqlFrame eval) vs Spark execution. */
object SparqlProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "q_sparql_join"
    val reps = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 16).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = graft.Queries.all(name)(spark, dir)
      val t1 = System.nanoTime()
      val rows = df.count()
      val t2 = System.nanoTime()
      println(f"[sparqlprobe] $name rep $r: build ${(t1 - t0) / 1e9}%.3f s, execute ${(t2 - t1) / 1e9}%.3f s, rows=$rows")
    }
    spark.stop()
  }
}
