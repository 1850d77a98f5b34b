package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the formatted physical plans of the signature/tally SUBPLANS the
  * r8 one-pass codegen expressions replaced — q_simhash / q_minhash_* /
  * q_ngram_jaccard / q_substring_* / q_decontaminate* truncate their
  * query-level plans at a localCheckpoint boundary, so the plan evidence
  * for those operators is the pre-checkpoint frame this probe explains.
  * Usage: runMain graft.tools.SigPlanProbe [sfDir] */
object SigPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

    println("========== simhash signature table (feeds q_simhash) ==========")
    graft.ops.Dedup.simhashSigPortable(docs, "doc_id", "text").explain("formatted")

    println("========== minhash signature table (feeds q_minhash_lsh / q_minhash_cluster) ==========")
    graft.ops.Dedup.minhashSigPortable(docs, "doc_id", "text").explain("formatted")

    println("========== rhp signature table (feeds q_ann_lsh) ==========")
    graft.ops.Similarity.rhpSigTablePortable(emb, "vec_id", "embedding", 12, 4)
      .explain("formatted")

    println("========== ngram per-doc shingle-hash arrays (feeds q_ngram_jaccard) ==========")
    graft.ops.ShingleHashes.ensure(spark)
    docs.select(col("doc_id").as("id"),
      call_function("graft_shingle_hashes",
        split(lower(trim(col("text"))), "\\s+"), lit(3)).as("sh"))
      .explain("formatted")

    println("========== substring/decontaminate window-fp rows (feeds q_substring_* / q_decontaminate*) ==========")
    graft.ops.WindowFps.ensure(spark)
    docs.select(col("doc_id").as("id"),
      posexplode(call_function("graft_window_fps",
        split(lower(trim(col("text"))), "\\s+"), lit(20))))
      .select(col("id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("fp"))
      .explain("formatted")

    spark.stop()
  }
}
