package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level timing of the bench KG pipeline (guide §1.4: noop-sink
  * isolation) — NOT the official bench; Bench.scala stays the frozen
  * harness. Each stage is timed cumulatively (lazy plans: a stage's time
  * includes its upstream), plus one end-to-end pass that mirrors
  * Bench.pipelineOnce exactly.
  * Usage: runMain graft.tools.PipeProbe [nDocs] [fat]
  */
object PipeProbe {
  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    println(f"[pipeprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    a
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(40000L)
    val fat = if (args.length > 1) args(1).toInt else 1
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

    def pipelineOnce(n: Long, parts: Int): Long = {
      val docs = DocSynth.docs(spark, n, 42, parts, fat)
      val spans = KgPipeline.tagSpans(docs)
      val ments = KgPipeline.mentions(spans)
      val links = KgPipeline.linkEntities(spark, ments).toDF().persist()
      try {
        val nLinks = links.count()
        val comps = KgPipeline.canonicalize(spark, links).persist()
        try {
          comps.count()
          KgPipeline.materializeTriples(links, comps, Some(nLinks)).count()
        } finally comps.unpersist(false)
      } finally links.unpersist(false)
    }

    // JIT warmup (mirrors Bench)
    pipelineOnce(5000, 64)

    spark.sparkContext.setJobDescription("stage: docs")
    val docs = DocSynth.docs(spark, nDocs, 42, cpus, fat)
    timed("docs (gen only)")(noop(docs.toDF()))
    spark.sparkContext.setJobDescription("stage: spans")
    timed("spans (cum)")(noop(KgPipeline.tagSpans(docs)))
    spark.sparkContext.setJobDescription("stage: mentions")
    timed("mentions (cum)")(noop(KgPipeline.mentions(KgPipeline.tagSpans(docs))))
    spark.sparkContext.setJobDescription("stage: links")
    val linksPlan = KgPipeline.linkEntities(spark,
      KgPipeline.mentions(KgPipeline.tagSpans(docs))).toDF()
    timed("links (cum)")(noop(linksPlan))
    spark.sparkContext.setJobDescription("stage: cc")
    val links = linksPlan.persist()
    val nLinks = timed("links persist+count")(links.count())
    val comps = timed("canonicalize (CC)")(
      { val c = KgPipeline.canonicalize(spark, links).persist(); c.count(); c })
    spark.sparkContext.setJobDescription("stage: triples")
    val nTriples = timed("materializeTriples")(
      KgPipeline.materializeTriples(links, comps, Some(nLinks)).count())
    comps.unpersist(false); links.unpersist(false)
    spark.sparkContext.setJobDescription("end-to-end")
    val total = timed("pipelineOnce end-to-end")(pipelineOnce(nDocs, cpus))
    println(s"[pipeprobe] nLinks=$nLinks nTriples=$nTriples e2eTriples=$total")
    spark.stop()
  }
}
