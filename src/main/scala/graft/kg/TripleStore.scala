package graft.kg

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped partitioned triple store over parquet (no Iceberg jars
  * ship with this image — SURVEY §7): snapshot ids, append /
  * overwrite-by-partition, predicate partition spec, snapshot read
  * (time-travel-lite), and a snapshot log. At 100 TB the predicate
  * partitioning means every SHACL target/path/constraint filter on `p`
  * prunes whole directories before any row is read.
  *
  * Layout:
  *   root/data/p_part=<pred>/snap=<id>/part-*.parquet
  *   root/_snapshots/  (snapshot log: id, op, ts, rows)
  */
final class TripleStore(spark: SparkSession, root: String) {
  import spark.implicits._
  private val dataPath = s"$root/data"
  private val snapPath = s"$root/_snapshots"

  private def log(): Seq[(Long, String, Long, Long)] =
    try spark.read.parquet(snapPath).as[(Long, String, Long, Long)].collect().toSeq.sortBy(_._1)
    catch { case _: Throwable => Nil }

  def snapshots(): Seq[Long] = log().map(_._1)
  def currentSnapshot(): Option[Long] = {
    val l = log()
    if (l.isEmpty) None else Some(l.map(_._1).max)
  }

  private def appendLog(id: Long, op: String, rows: Long): Unit =
    Seq((id, op, System.currentTimeMillis(), rows))
      .toDF("snapshot_id", "op", "committed_at", "rows")
      .write.mode(SaveMode.Append).parquet(snapPath)

  /** Partition value: predicate local name (bounded vocabulary). */
  private def withPart(df: DataFrame): DataFrame =
    df.withColumn("p_part", regexp_extract(col("p"), "[#/]([A-Za-z0-9_]+)$", 1))

  /** Append (s,p,o) rows as a new snapshot. */
  def append(df: DataFrame): Long = {
    val id = currentSnapshot().getOrElse(0L) + 1L
    val out = withPart(df).withColumn("snap", lit(id))
    out.write.mode(SaveMode.Append).partitionBy("p_part", "snap").parquet(dataPath)
    appendLog(id, "append", df.count())
    id
  }

  /** Overwrite the given predicate partitions with `df` (other partitions
    * untouched) — Iceberg's overwrite-by-partition-expression. */
  def overwritePartitions(df: DataFrame, preds: Seq[String]): Long = {
    val id = currentSnapshot().getOrElse(0L) + 1L
    val parts = preds.map(p => p.split("[#/]").last)
    // drop old files for those partitions by rewriting their live rows to
    // the new snapshot as tombstone-free replacement
    val out = withPart(df).filter(col("p_part").isin(parts: _*)).withColumn("snap", lit(id))
    parts.foreach { pp =>
      val dir = java.nio.file.Paths.get(s"$dataPath/p_part=$pp")
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(java.nio.file.Files.delete)
      }
    }
    out.write.mode(SaveMode.Append).partitionBy("p_part", "snap").parquet(dataPath)
    appendLog(id, s"overwrite:${parts.mkString(",")}", out.count())
    id
  }

  /** Read the current table (all snapshots still on disk). */
  def read(): DataFrame = spark.read.parquet(dataPath).drop("snap", "p_part")

  /** Snapshot read: rows committed at or before snapshot `id`. */
  def readAt(id: Long): DataFrame =
    spark.read.parquet(dataPath).filter(col("snap") <= id).drop("snap", "p_part")

  /** Predicate-pruned scan — the hot path for SHACL targets/paths: the
    * filter lands on the partition column, so only matching directories
    * are listed/read. */
  def scanPredicate(pred: String): DataFrame = {
    val pp = pred.split("[#/]").last
    spark.read.parquet(dataPath).filter(col("p_part") === pp && col("p") === pred)
      .drop("snap", "p_part")
  }
}
