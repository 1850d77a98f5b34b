package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Branch-level timing of materializeTriples (diagnostic, not the bench). */
object MatProbe {
  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[matprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s -> $a")
    a
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(40000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.max(cpus * 4, 16).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.kg.{DocSynth, KgPipeline}

    val docs = DocSynth.docs(spark, nDocs, 42, cpus)
    val links = KgPipeline.linkEntities(spark,
      KgPipeline.mentions(KgPipeline.tagSpans(docs))).toDF().persist()
    val nLinks = links.count()
    val comps = KgPipeline.canonicalize(spark, links).persist()
    comps.count()
    // warm
    KgPipeline.materializeTriples(links, comps, Some(nLinks)).count()

    timed("pairs.distinct")(
      links.select(col("doc_id"), col("entity_id")).distinct().count())
    timed("comp.distinct")(
      comps.select(col("id"), col("component")).distinct().count())
    val m = KgPipeline.materializeTriples(links, comps, Some(nLinks))
    timed("full union count")(m.count())
    timed("full union count again")(m.count())
    timed("full union noop")(m.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
