package graft.kg

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint-resume bookkeeping: each pipeline stage persists its output
  * to `<root>/<stage>/` plus a row in the lineage table
  * (runId, stage, status, rowsOut, inputChecksum, updatedAt) and per-stage
  * metrics. On restart, a stage whose lineage row is `done` with an
  * identical input checksum is *not* recomputed — its persisted output is
  * read back (per-partition skipping falls out of the stage granularity +
  * parquet partition layout). FIXTURES.md §5 shape.
  */
final case class LineageEntry(runId: String, stage: String, status: String,
                              rowsOut: Long, inputChecksum: String, updatedAt: Long)

final class Lineage(spark: SparkSession, root: String, runId: String) {
  import spark.implicits._
  private val lineagePath = s"$root/_lineage"
  private val metricsPath = s"$root/_metrics"
  private type Entry = LineageEntry
  private def Entry(runId: String, stage: String, status: String,
                    rowsOut: Long, inputChecksum: String, updatedAt: Long): LineageEntry =
    LineageEntry(runId, stage, status, rowsOut, inputChecksum, updatedAt)

  private def readLineage(): Seq[LineageEntry] =
    try spark.read.parquet(lineagePath).as[LineageEntry].collect().toSeq
    catch { case _: Throwable => Nil }

  private def append(e: LineageEntry): Unit =
    Seq(e).toDF().write.mode(SaveMode.Append).parquet(lineagePath)

  def metric(stage: String, name: String, value: Double): Unit =
    Seq((runId, stage, name, value, System.currentTimeMillis()))
      .toDF("runId", "stage", "metric", "value", "recordedAt")
      .write.mode(SaveMode.Append).parquet(metricsPath)

  def metrics(): DataFrame = spark.read.parquet(metricsPath)
  def entries(): DataFrame = spark.read.parquet(lineagePath)

  /** Latest done entry per stage wins. */
  private def doneEntry(stage: String): Option[LineageEntry] =
    readLineage().filter(e => e.stage == stage && e.status == "done")
      .sortBy(_.updatedAt).lastOption

  /** Row count the lineage recorded for a completed stage — lets callers
    * reuse an already-paid count instead of re-running the stage plan. */
  def rowsOf(stage: String): Option[Long] = doneEntry(stage).map(_.rowsOut)

  /** Whether a stage is already complete for this input — lets callers
    * gate their own side metrics so a resume doesn't re-append them. */
  def isDone(stage: String, inputChecksum: String): Boolean =
    doneEntry(stage).exists(_.inputChecksum == inputChecksum)

  /** Run a side-effecting step at most once per input checksum (e.g. a
    * store snapshot commit); replays are skipped on resume. */
  def marker(name: String, inputChecksum: String)(action: => Long): Unit =
    doneEntry(name) match {
      case Some(e) if e.inputChecksum == inputChecksum => metric(name, "resumed", 1.0)
      case _ =>
        val rows = action
        append(Entry(runId, name, "done", rows, inputChecksum, System.currentTimeMillis()))
    }

  /** Run (or resume) a stage: skip compute when a done entry with the same
    * input checksum exists and the persisted output is readable. */
  def stage(name: String, inputChecksum: String)(compute: => DataFrame): DataFrame = {
    val outPath = s"$root/$name"
    doneEntry(name) match {
      case Some(e) if e.inputChecksum == inputChecksum =>
        try {
          val df = spark.read.parquet(outPath)
          metric(name, "resumed", 1.0)
          return df
        } catch { case _: Throwable => /* output missing: recompute */ }
      case _ =>
    }
    val t0 = System.nanoTime()
    val df = compute
    df.write.mode(SaveMode.Overwrite).parquet(outPath)
    val out = spark.read.parquet(outPath)
    val rows = out.count()
    append(Entry(runId, name, "done", rows, inputChecksum, System.currentTimeMillis()))
    metric(name, "rowsOut", rows.toDouble)
    metric(name, "seconds", (System.nanoTime() - t0) / 1e9)
    out
  }
}
