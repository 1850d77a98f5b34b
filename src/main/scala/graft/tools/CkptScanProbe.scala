package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-probe: cost of aggregating over a localCheckpoint'd (long, long)
  * frame vs the same data from parquet — isolates the ExistingRDD-scan
  * anomaly the r8 stage audits kept seeing. */
object CkptScanProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(260000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("CKPT_PROBE_PARTS", math.max(cpus * 4, 16).toString))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("CKPT_PROBE_BYPASS", "200"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ckptprobe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s -> $r")
    }
    val base = spark.range(0, n, 1, 32)
      .select(col("id"), pmod(xxhash64(col("id")), lit(27000L)).as("s"))
    val ck = base.localCheckpoint()
    val pq = "/tmp/ckptprobe_pq"
    base.write.mode("overwrite").parquet(pq)
    val fromPq = spark.read.parquet(pq)
    for (r <- 1 to 3) {
      timed(s"rep $r groupBy over checkpoint")(
        ck.groupBy(col("s")).agg(count(lit(1))).count())
      timed(s"rep $r groupBy over parquet")(
        fromPq.groupBy(col("s")).agg(count(lit(1))).count())
      timed(s"rep $r plain count over checkpoint")(ck.count())
    }
    spark.stop()
  }
}
