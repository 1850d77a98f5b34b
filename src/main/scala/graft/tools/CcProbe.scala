package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round timing of the CC fixpoint over the bench link graph
  * (diagnostic only — mirrors ConnectedComponents.run's STAR loop; note
  * production converge() takes the single-partition local-finish endgame
  * instead whenever the checkpointed edge set has coalesced to one
  * partition, so the rounds timed here are the multi-partition fallback
  * cost, not necessarily what the bench pays). */
object CcProbe {
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
    import spark.implicits._
    import graft.kg.{DocSynth, KgPipeline}

    val docs = DocSynth.docs(spark, nDocs, 42, if (args.length > 1) 128 else cpus, if (args.length > 1) args(1).toInt else 1)
    val links = KgPipeline.linkEntities(spark,
      KgPipeline.mentions(KgPipeline.tagSpans(docs))).toDF().persist()
    links.count()
    // warm one full run
    KgPipeline.canonicalize(spark, links).count()

    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[ccprobe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }

    val edges0 = KgPipeline.entityEdges(links)
    // mirrors converge(): canonical projection (no multiset distinct —
    // union-find tolerates duplicates) -> partition-local union-find
    // contraction -> distinct over the contracted set -> lazy checkpoint
    var edges = timed("init contract+ckpt") {
      val canon = edges0.select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
        .filter($"a" =!= $"b")
      val e = graft.kg.ConnectedComponents.contractLocal(spark, canon)
        .distinct().localCheckpoint(false)
      e.count(); e
    }
    println(s"[ccprobe] contracted_edges=${edges.count()}")
    def digest(df: org.apache.spark.sql.DataFrame): (Long, String) = {
      val r = df.agg(count(lit(1)), sum(xxhash64($"a", $"b").cast("decimal(38,0)"))).head()
      (r.getLong(0), if (r.isNullAt(1)) "0" else r.getDecimal(1).toPlainString)
    }
    var edgesDigest = timed("init digest")(digest(edges))
    var iter = 0
    var converged = false
    while (!converged && iter < 50) {
      val next = timed(s"round $iter build") {
        val nbrs = edges.select($"a".as("u"), $"b".as("v"))
          .unionByName(edges.select($"b".as("u"), $"a".as("v")))
        val mins = nbrs.groupBy($"u").agg(
          min($"v").as("m0"), min(when($"v" < $"u", $"v")).as("ms"))
        val j = nbrs.join(mins, "u")
        val large = j.filter($"v" > $"u")
          .select(least($"v", least($"u", $"m0")).as("a"),
            greatest($"v", least($"u", $"m0")).as("b"))
          .filter($"a" =!= $"b")
        val small = j.filter($"v" < $"u")
          .select(least($"v", $"ms").as("a"), greatest($"v", $"ms").as("b"))
          .unionByName(mins.filter($"ms".isNotNull).select($"ms".as("a"), $"u".as("b")))
          .filter($"a" =!= $"b")
        large.unionByName(small).distinct().localCheckpoint(false)
      }
      val nextDigest = timed(s"round $iter digest")(digest(next))
      converged = nextDigest == edgesDigest
      edges = next
      edgesDigest = nextDigest
      iter += 1
    }
    println(s"[ccprobe] rounds=$iter edges=${edgesDigest._1}")
    spark.stop()
  }
}
