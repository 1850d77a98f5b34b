package graft.tools

import org.apache.spark.sql.SparkSession

/** Pipeline scaling probe: JIT-warmed end-to-end KG pipeline wall time at a
  * given parallelism. Usage: ScaleProbe <cpus> [nDocs] */
object ScaleProbe {
  def pipeline(spark: SparkSession, nDocs: Long, parts: Int, fat: Int = 1): Long = {
    val docs = graft.kg.DocSynth.docs(spark, nDocs, 42, parts, fat)
    val links = graft.kg.KgPipeline.linkEntities(spark,
      graft.kg.KgPipeline.mentions(graft.kg.KgPipeline.tagSpans(docs))).toDF().persist()
    try {
      links.count()
      val comps = graft.kg.KgPipeline.canonicalize(spark, links).persist()
      try {
        comps.count()
        graft.kg.KgPipeline.materializeTriples(links, comps).count()
      } finally comps.unpersist(false)
    } finally links.unpersist(false)
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val nDocs = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      // shuffle parallelism scales with cores (2-4x slots, standard cluster
      // sizing): a fixed partition count lets one straggler partition idle
      // the extra cores of the larger config at every wave boundary, which
      // reads as a serial fraction in the N -> 4N scaling evidence
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", math.max(cpus * 4, 16).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fat = args.lift(2).map(_.toInt).getOrElse(20)
    pipeline(spark, 5000, 64, fat) // JIT warmup
    val t0 = System.nanoTime()
    val n = pipeline(spark, nDocs, 128, fat)
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"SCALE cpus=$cpus docs=$nDocs fat=$fat triples=$n sec=$dt%.2f tps=${n / dt}%.0f")
    spark.stop()
  }
}
